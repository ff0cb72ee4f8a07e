"""Input-parallelism guard (guide §2.5 "input skew").

A table that arrives as one small file / one parquet row group yields a
single scan partition, and every downstream narrow stage — including Arrow
UDF passes and broadcast-join probes — then runs in ONE task regardless of
cluster size. ``spread_input`` repartitions such inputs up to the session's
default parallelism; inputs that are already parallel enough pass through
untouched, so cluster-scale multi-file scans never pay the extra shuffle.
Round-robin repartition is deterministic under retries (Spark sorts before
round-robin partitioning — SPARK-23207), and no operator here depends on
input partitioning or order: every result is re-established by explicit
keys downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``min_parts`` (default: the session's default
    parallelism) when its physical plan would yield fewer partitions —
    a no-op for inputs that already scan in parallel."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
