"""spark-submit entry (north_rule launch contract):

    spark-submit --py-files warc2zim_spark.zip scripts/run_pipeline.py \
        --webdata /root/repo/webdata/sf0.01 --out /tmp/zim_out \
        [--crawl --max-waves 4]

Packs both pipelines: the WARC→ZIM two-pass convert and the BFS crawl
frontier (resumable from --out/crawl checkpoints).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--webdata", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--include-domains", nargs="*", default=None)
    parser.add_argument("--crawl", action="store_true")
    parser.add_argument("--max-waves", type=int, default=4)
    parser.add_argument("--host-budget", type=int, default=8)
    parser.add_argument("--wave-budget", type=int, default=1000)
    args = parser.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("warc2zim_spark").getOrCreate()
    from warc2zim_spark.plans.pipeline import run_pipeline

    metrics = run_pipeline(spark, args.webdata, args.out, args.include_domains)
    print(json.dumps({"pipeline": metrics}))

    if args.crawl:
        from warc2zim_spark.frontier.crawl import resume_crawl

        seeds = spark.read.parquet(f"{args.webdata}/seeds.parquet")
        robots = spark.read.parquet(f"{args.webdata}/robots.parquet")
        pages = spark.read.parquet(f"{args.webdata}/pages.parquet")
        schedule = resume_crawl(
            spark, seeds, pages, robots, f"{args.out}/crawl",
            max_waves=args.max_waves,
            host_budget=args.host_budget,
            wave_budget=args.wave_budget,
        )
        print(json.dumps({"crawl_scheduled": schedule.count()}))
    spark.stop()


if __name__ == "__main__":
    main()
