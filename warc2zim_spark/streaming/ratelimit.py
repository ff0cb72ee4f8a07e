"""Stateful streaming per-host fetch gate — the politeness budget's
Structured-Streaming twin (§2.9; no reference equivalent — warc2zim
consumes finished crawls, but a live fetcher needs exactly this shape).

``applyInPandasWithState`` keyed by host: state = how many fetches this
host has consumed across ALL micro-batches; each incoming candidate either
claims the next slot (emitted with its cumulative ``fetch_seq``) or is
dropped once the host's total budget is exhausted. This is the stateful
operator the iterative-batch crawl loop implements per wave
(frontier/politeness.py), re-expressed for a continuous ingest where waves
don't exist — state lives in the streaming state store, checkpointed and
restart-safe like every other Structured-Streaming stateful op.

Determinism contract: within a micro-batch, candidates are ranked by the
same (hops asc, score desc, surt asc) priority order the batch operator
uses, so a replayed batch claims slots identically.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("surt_key", StringType()),
        StructField("hops", IntegerType()),
        StructField("score", DoubleType()),
        StructField("fetch_seq", LongType()),
    ]
)
STATE_SCHEMA = StructType([StructField("used", LongType())])


def host_budget_gate(
    candidates: DataFrame, host_budget: int = 8
) -> DataFrame:
    """Streaming DataFrame of (host, surt_key, hops, score) → rows that
    claim a budget slot, with their cumulative per-host ``fetch_seq``.
    Rows beyond the host's lifetime budget are dropped (a production
    fetcher would route them to a retry topic instead — same operator,
    different sink)."""

    def gate(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        used = state.get[0] if state.exists else 0
        # applyInPandasWithState may deliver one host's micro-batch rows as
        # several Arrow chunks (~10k rows each). Slots must be claimed in
        # ONE priority order over the whole group — sorting chunk-by-chunk
        # would let a low-priority row in an early chunk outrank a
        # higher-priority row in a later chunk, making the claimed set
        # depend on chunk boundaries (advisor r03 finding). The group is
        # bounded by the micro-batch, and budgets are small, so a full
        # concat is the batch operator's own materialization shape.
        if used < host_budget:
            chunks = [pdf for pdf in pdfs if len(pdf)]
            if chunks:
                whole = pd.concat(chunks, ignore_index=True).sort_values(
                    ["hops", "score", "surt_key"],
                    ascending=[True, False, True],
                    kind="mergesort",
                )
                take = min(host_budget - used, len(whole))
                if take > 0:
                    out = whole.iloc[:take].copy()
                    out["fetch_seq"] = range(used + 1, used + take + 1)
                    used += take
                    yield out[["host", "surt_key", "hops", "score", "fetch_seq"]]
        state.update((used,))

    return candidates.groupBy("host").applyInPandasWithState(
        gate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_host_gate(
    spark,
    candidates_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    host_budget: int = 8,
    max_files_per_trigger: int | None = None,
) -> int:
    """Drive the gate over a growing parquet directory of candidates;
    returns micro-batch count. State (per-host used-budget) persists in the
    stream checkpoint: re-invocation after more files land (or a crash)
    continues the SAME budgets — the restart-safe form of the crawl loop's
    politeness accounting."""
    schema = spark.read.parquet(candidates_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(candidates_dir)
    gated = host_budget_gate(stream, host_budget=host_budget)
    n_batches = {"n": 0}

    def sink(batch_df, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)
        n_batches["n"] += 1

    query = (
        gated.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return n_batches["n"]
