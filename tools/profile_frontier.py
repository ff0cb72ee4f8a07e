"""Per-stage profiler for the bench's _heavy_frontier path (guide §1:
measure first). Mimics run_crawl wave-by-wave, timing each operator with a
noop materialization, so the w_frontier seconds decompose into: page_lookup
build, per-wave dedup/seen/robots/politeness/prioritize, link extraction,
and the checkpoint/write barriers.

Usage: python tools/profile_frontier.py [--plan]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def force(df, label):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"  {label:<38s} {dt:7.3f}s")
    return dt


def main() -> None:
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from warc2zim_spark.session import get_spark
    from warc2zim_spark.frontier.crawl import (
        _normalize_cols, _valid, crawl_wave, page_lookup,
    )
    from warc2zim_spark.frontier.politeness import (
        politeness_budget, prioritize, robots_allowed,
    )
    from warc2zim_spark.frontier.seenfilter import unseen_exact

    show_plan = "--plan" in sys.argv
    web = entry._web(SF_DIR)
    spark = get_spark("profile-frontier", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    robots = spark.read.parquet(f"{web}/robots.parquet")
    pages = spark.read.parquet(f"{web}/pages.parquet")
    seeds = pages.limit(20_000).select(
        "url", F.lit(1.0).alias("score"), F.lit(0).alias("hops")
    )
    host_budget, wave_budget = 500, 100_000

    total = 0.0
    t0 = time.time()
    pages_keyed = page_lookup(pages).cache()
    pages_keyed.count()
    dt = time.time() - t0
    print(f"  {'page_lookup build+cache':<38s} {dt:7.3f}s")
    total += dt

    t0 = time.time()
    frontier = _normalize_cols(seeds).localCheckpoint(eager=True).filter(_valid())
    dt = time.time() - t0
    print(f"  {'seed normalize+checkpoint':<38s} {dt:7.3f}s")
    total += dt

    seen = spark.createDataFrame([], "surt_key string")
    for wave in range(2):
        print(f"wave {wave}: frontier rows = {frontier.count()}")
        best = (
            frontier.groupBy("surt_key")
            .agg(F.min("hops").alias("hops"), F.max("score").alias("score"),
                 F.min("url").alias("url"))
            .withColumn("host", __import__("warc2zim_spark.functions.udfs",
                                           fromlist=["udfs"]).host_of(F.col("url")))
        )
        total += force(best, "dedup groupBy(surt)+host")
        unseen = unseen_exact(best, seen)
        total += force(unseen, "(+) unseen anti-join")
        allowed = robots_allowed(unseen, robots)
        total += force(allowed, "(+) robots gate")
        polite = politeness_budget(allowed, robots, host_budget=host_budget,
                                   salt_partitions=0)
        total += force(polite, "(+) politeness window")
        sched_plan = prioritize(polite, wave_budget=wave_budget,
                                salt_partitions=0)
        total += force(sched_plan, "(+) prioritize top-k")
        if show_plan and wave == 1:
            sched_plan.explain("formatted")
        t0 = time.time()
        scheduled = sched_plan.localCheckpoint(eager=True)
        dt = time.time() - t0
        print(f"  {'schedule localCheckpoint':<38s} {dt:7.3f}s")
        total += dt

        fetched = scheduled.join(pages_keyed, "surt_key", "left")
        from warc2zim_spark.functions import udfs
        html_str = udfs.decode_payload(F.col("html"), F.lit(None).cast("string"),
                                       F.lit("html"))
        links = (
            fetched.filter(F.col("html").isNotNull())
            .select("surt_key", "url", "hops", "score",
                    F.explode_outer(udfs.extract_meta(html_str)["links"]).alias("href"))
            .withColumn("dst_url", udfs.resolve_url(F.col("url"), F.col("href")))
            .select(F.col("dst_url").alias("url"),
                    (F.col("hops") + 1).alias("hops"),
                    (F.col("score") * 0.5).alias("score"))
        )
        total += force(links, "fetch join + link extraction")
        t0 = time.time()
        nf = _normalize_cols(links).localCheckpoint(eager=True)
        dt = time.time() - t0
        print(f"  {'next frontier surt/host+checkpoint':<38s} {dt:7.3f}s")
        total += dt
        t0 = time.time()
        seen = seen.union(scheduled.select("surt_key")).distinct().localCheckpoint(eager=True)
        dt = time.time() - t0
        print(f"  {'seen union distinct+checkpoint':<38s} {dt:7.3f}s")
        total += dt
        frontier = nf.filter(_valid())
    print(f"TOTAL (ex write/read) {total:7.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
