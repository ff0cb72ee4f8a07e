"""Incremental items ingest over a growing record directory.

Semantics vs the batch pipeline: identical output when record files arrive
in (file_seq) order — which is how a crawler appends them. Within a
micro-batch, first-wins dedup is the A2 window; across batches, a path that
already reached the sink wins over any later arrival (anti-join against the
sink's key projection — the sink itself is the dedup state, so there is no
state store to size and restart is free). A truly out-of-order tail would
need ``dropDuplicatesWithinWatermark`` on surt_key plus an event-time bound;
the crawl source has no such reordering.

Scale: the anti-join's right side is a parquet key scan of the sink (narrow
column pruning, no payloads); at 10^10 items this becomes the partitioned
bloom from frontier/seenfilter — same seam as the rewrite path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from warc2zim_spark.operators.items import items_table
from warc2zim_spark.operators.records import content_records


def stream_items(
    spark: SparkSession,
    records_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    include_domains: list[str] | None = None,
) -> int:
    """Drain all currently-available record files into the items sink;
    returns the number of micro-batches processed. Re-invoking after more
    files land (or after a crash — checkpointed offsets) continues where it
    left off."""
    schema = spark.read.parquet(records_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(records_dir)

    n_batches = {"n": 0}

    def process_batch(batch_df, batch_id: int) -> None:
        items = items_table(content_records(batch_df), include_domains)
        try:
            existing = spark.read.parquet(out_dir).select("zim_path")
            items = items.join(existing, "zim_path", "left_anti")
        except Exception:
            pass  # first batch: sink doesn't exist yet
        items.write.mode("append").parquet(out_dir)
        n_batches["n"] += 1

    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return n_batches["n"]
