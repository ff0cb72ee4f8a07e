"""SparkSession factory with scale-appropriate defaults.

Single place for the engine's Spark configuration so tests, bench, and the
driver entry agree: AQE on (runtime re-plan + skew-join splitting), Arrow
transfers on (all our UDFs are pandas UDFs), shuffle partitions sized with
cores (local mode) — at cluster scale these come from spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "warc2zim_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.filterPushdown", "true")
        # date_format/X-ContentDate must agree with the (naive-timestamp)
        # DuckDB oracles regardless of host TZ
        .config("spark.sql.session.timeZone", "UTC")
        # local bench tier: tables are a few hundred MB in single files, so
        # the 128m default gives 1-2 scan partitions and serializes every
        # pre-shuffle UDF stage; 16m ≈ cores×(file/16m) tasks. At cluster
        # scale with thousands of files, set this back via spark-submit conf.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        # floor scan parallelism at the core count (r06): the hot tables are
        # single ~100 MB parquet files, so even 16m splits give only ~6-7
        # scan tasks and every scan-stage Arrow UDF pass (surt over pages,
        # posturl over records, html link extraction) ran at a fifth of the
        # machine. Derived from the core count, not a constant — a cluster
        # deployment with thousands of input files is already above this
        # floor and is unaffected.
        .config("spark.sql.files.minPartitionNum", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
