"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

    python bench.py                  # driver mode: one JSON line
    python bench.py --scaling       # two-parallelism scaling run (local[8]
                                     # vs local[32]) → updates BENCH notes

Headline metric (BASELINE.json): frontier URLs scheduled + WARC records
converted per second. ``value`` is total wall seconds over the headline
queries (driver contract); ``throughput_rows_per_s`` carries the
BASELINE-metric view of the same run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline queries: the crawl/convert pipeline + the heaviest training ops
HEADLINE = [
    "w_items",          # full record pipeline: pairing, urlkey, surt, dedup
    "w_text_extract",   # decode + byte-identical text extraction (UDF-heavy)
    "w_rewrite_mode",   # pure-Catalyst classifier over the record stream
    "d_minhash_pairs",  # minhash-LSH near-dedup with jaccard verify
    "e_ann_brute",      # exact cosine top-k baseline
    "t_pricing_summary",  # scan-heavy JVM aggregation
    "w_frontier",       # BFS waves: robots, politeness, priority, seen (last:
                        # its checkpoint/cache churn must not skew the others)
]


def _heavy_frontier(spark, sf_dir: str):
    """Bench-scale crawl: budgets sized so scheduling/link-extraction work
    dominates fixed per-wave overhead (the scaling measurement needs real
    work at both parallelism levels; the driver-facing q_w_frontier keeps the
    oracle-pinned small budgets)."""
    import shutil
    import tempfile

    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from warc2zim_spark.frontier.crawl import run_crawl

    web = entry._web(sf_dir)
    robots = spark.read.parquet(f"{web}/robots.parquet")
    pages = spark.read.parquet(f"{web}/pages.parquet")
    # bench seeds: a wide slice of the page table so per-wave scheduling and
    # link-extraction work dominates fixed per-wave job overhead (5 organic
    # seeds only reach ~10^2 URLs — all overhead, no signal). Two heavy waves
    # beat four light ones for the same reason.
    seeds = pages.limit(20_000).select(
        "url", F.lit(1.0).alias("score"), F.lit(0).alias("hops")
    )
    ckpt = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        schedule = run_crawl(
            spark, seeds, pages, robots, ckpt, max_waves=2,
            host_budget=500, wave_budget=100_000,
        )
        out = schedule.cache()
        out.count()
        return out
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def run_bench(cpus: int, sf_dir: str) -> dict:
    import __spark_entry__ as entry
    from warc2zim_spark.session import get_spark

    # pre-generate webdata outside the timed region (one-time, disk-cached)
    entry._web(sf_dir)
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = dict(entry.queries())
    queries["w_frontier"] = lambda s, d: _heavy_frontier(s, d)
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    # warm the JVM + python workers once with a cheap query
    queries["t_pricing_summary"](spark, sf_dir).collect()
    for name in HEADLINE:
        best = None
        n = 0
        iters = 2 if name == "w_frontier" else 3  # min-of-N: python-worker
        # fork storms and JIT warmup make single-shot timings noisy on this VM
        for _ in range(iters):
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            # cache().count() materializes EVERY column — a bare count() would
            # let Catalyst prune the UDF outputs and time an empty plan
            df = df.cache()
            n = df.count()
            elapsed = round(time.time() - t0, 3)
            best = elapsed if best is None else min(best, elapsed)
            df.unpersist()
            spark.catalog.clearCache()  # no cross-query cache pollution
        timings[name] = best
        rows[name] = n
    total = round(sum(timings.values()), 3)
    converted = rows.get("w_items", 0) + rows.get("w_text_extract", 0)
    scheduled = rows.get("w_frontier", 0)
    pipeline_secs = timings.get("w_items", 0) + timings.get("w_text_extract", 0) + timings.get("w_frontier", 0)
    throughput = round((converted + scheduled) / pipeline_secs, 1) if pipeline_secs else 0.0
    spark.stop()
    return {
        "metric": "headline query wall time (frontier+convert+dedup+ann)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")),
        "cpus": cpus,
        "rows": rows,
        "throughput_rows_per_s": throughput,
    }


def main() -> None:
    if "--scaling" in sys.argv:
        # subprocess per parallelism level: fresh JVM each, identical input
        results = {}
        for cpus in (8, 32):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
            )
            results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        r8, r32 = results[8]["throughput_rows_per_s"], results[32]["throughput_rows_per_s"]
        efficiency = round((r32 / r8) / 4.0, 3) if r8 else 0.0
        print(json.dumps({
            "scaling": {
                "local8": results[8],
                "local32": results[32],
                "R8": r8,
                "R32": r32,
                "efficiency": efficiency,
                "pass": efficiency >= 0.8,
            }
        }))
        return
    result = run_bench(CPUS, SF_DIR)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
