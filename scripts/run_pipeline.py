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
import os
import sys

# under spark-submit the package arrives via --py-files; for a direct
# `python scripts/run_pipeline.py` run, the repo root works too
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--webdata", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--include-domains", nargs="*", default=None)
    # reference CLI metadata flags (converter.py:121-127)
    parser.add_argument("--name", default="warc2zim-spark-output")
    parser.add_argument("--title", default=None)
    parser.add_argument("--description", default="-")
    parser.add_argument("--long-description", default=None)
    parser.add_argument("--lang", default=None)
    parser.add_argument("--tags", default=None)
    parser.add_argument("--creator", default="-")
    parser.add_argument("--publisher", default="openZIM")
    parser.add_argument("--custom-css", default=None, help="path to a css file")
    # reference main.py:26 — the user-chosen main page URL; redirect-followed
    # and existence-checked before Main-Path is written
    parser.add_argument("--url", default=None, dest="main_url")
    # reference main.py:40 — favicon URL overriding icon discovery
    parser.add_argument("--favicon", default=None, dest="favicon_url")
    # reference main.py:92-103 — skip failing records instead of aborting
    parser.add_argument("--continue-on-error", action="store_true")
    # reference main.py:144-158 — per-run charset alias rows, alias=encoding
    parser.add_argument("--encoding-aliases", nargs="*", default=None,
                        metavar="ALIAS=ENCODING")
    parser.add_argument("--crawl", action="store_true")
    parser.add_argument("--max-waves", type=int, default=4)
    parser.add_argument("--host-budget", type=int, default=8)
    parser.add_argument("--wave-budget", type=int, default=1000)
    args = parser.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("warc2zim_spark").getOrCreate()
    from warc2zim_spark.plans.pipeline import run_pipeline

    custom_css = None
    if args.custom_css:
        with open(args.custom_css, "rb") as fh:
            custom_css = fh.read()
    metrics = run_pipeline(
        spark, args.webdata, args.out, args.include_domains,
        name=args.name, custom_css=custom_css,
        main_url=args.main_url, favicon_url=args.favicon_url,
        continue_on_error=args.continue_on_error,
        encoding_aliases=(
            dict(p.split("=", 1) for p in args.encoding_aliases)
            if args.encoding_aliases else None
        ),
        metadata_args={
            "title": args.title, "description": args.description,
            "long_description": args.long_description, "language": args.lang,
            "tags": args.tags, "creator": args.creator,
            "publisher": args.publisher,
        },
    )
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
