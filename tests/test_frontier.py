"""Frontier: determinism vs the sequential oracle, parallelism invariance,
and checkpoint resume (north_rule requirements)."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from warc2zim_spark.frontier.crawl import last_committed_wave, resume_crawl, run_crawl


@pytest.fixture(scope="module")
def web_tables(spark, webdata):
    seeds = spark.read.parquet(f"{webdata}/seeds.parquet").cache()
    robots = spark.read.parquet(f"{webdata}/robots.parquet").cache()
    pages = spark.read.parquet(f"{webdata}/pages.parquet").cache()
    return seeds, robots, pages


def schedule_key(rows):
    return sorted((r.wave, r.surt_key, r.hops, round(r.score, 9)) for r in rows)


class TestDeterminism:
    def test_matches_sequential_oracle(self, spark, webdata, web_tables, tmp_path):
        seeds, robots, pages = web_tables
        got = run_crawl(
            spark, seeds, pages, robots, str(tmp_path / "ckpt"),
            max_waves=3, host_budget=4, wave_budget=50,
        ).collect()
        from warc2zim_spark.sources.datagen import sequential_crawl

        golden = sequential_crawl(
            pq.read_table(f"{webdata}/pages.parquet"),
            pq.read_table(f"{webdata}/robots.parquet"),
            pq.read_table(f"{webdata}/seeds.parquet"),
            max_waves=3, host_budget=4, wave_budget=50,
        )
        expected = sorted(
            zip(
                golden.column("wave").to_pylist(),
                golden.column("surt_key").to_pylist(),
                golden.column("hops").to_pylist(),
                [round(s, 9) for s in golden.column("score").to_pylist()],
            )
        )
        assert schedule_key(got) == expected

    def test_parallelism_invariance(self, spark, web_tables, tmp_path):
        """Same schedule with 2 vs 8 shuffle partitions (the sandbox proxy for
        N vs 4N executors at the correctness level)."""
        seeds, robots, pages = web_tables
        a = run_crawl(
            spark, seeds, pages.repartition(2), robots, str(tmp_path / "a"),
            max_waves=2, host_budget=4, wave_budget=50,
        ).collect()
        b = run_crawl(
            spark, seeds, pages.repartition(8), robots, str(tmp_path / "b"),
            max_waves=2, host_budget=4, wave_budget=50,
        ).collect()
        assert schedule_key(a) == schedule_key(b)


class TestResume:
    def test_resume_completes_identically(self, spark, web_tables, tmp_path):
        seeds, robots, pages = web_tables
        full = run_crawl(
            spark, seeds, pages, robots, str(tmp_path / "full"),
            max_waves=3, host_budget=4, wave_budget=50,
        ).collect()
        # partial run: 2 waves, then resume to 3
        run_crawl(
            spark, seeds, pages, robots, str(tmp_path / "partial"),
            max_waves=2, host_budget=4, wave_budget=50,
        )
        assert last_committed_wave(str(tmp_path / "partial")) == 1
        resumed = resume_crawl(
            spark, seeds, pages, robots, str(tmp_path / "partial"),
            max_waves=3, host_budget=4, wave_budget=50,
        ).collect()
        assert schedule_key(resumed) == schedule_key(full)

    def test_metrics_written(self, spark, web_tables, tmp_path):
        import json

        seeds, robots, pages = web_tables
        run_crawl(
            spark, seeds, pages, robots, str(tmp_path / "m"),
            max_waves=2, host_budget=4, wave_budget=50,
        )
        metrics = json.loads((tmp_path / "m" / "wave=0._metrics.json").read_text())
        assert metrics["scheduled"] > 0 and metrics["hosts"] > 0


class TestSaltedPoliteness:
    def test_salted_equals_unsalted(self, spark, webdata):
        """Hot-host salting is a pure physical rewrite: results identical."""
        from warc2zim_spark.frontier.politeness import politeness_budget
        from warc2zim_spark.functions import udfs

        pages = spark.read.parquet(f"{webdata}/pages.parquet")
        robots = spark.read.parquet(f"{webdata}/robots.parquet")
        cands = (
            pages.select(
                udfs.surt_key(F.col("url")).alias("surt_key"),
                udfs.host_of(F.col("url")).alias("host"),
            )
            .filter(F.col("surt_key").isNotNull())
            .withColumn("hops", (F.xxhash64("surt_key") % 3).cast("int"))
            .withColumn("score", (F.pmod(F.xxhash64("host", "surt_key"), F.lit(100)) / 100.0))
            .distinct()
        )
        plain = politeness_budget(cands, robots, host_budget=5)
        salted = politeness_budget(cands, robots, host_budget=5, salt_partitions=4)
        key = lambda r: (r.host, r.surt_key)
        assert sorted(map(key, plain.collect())) == sorted(map(key, salted.collect()))

    def test_salted_prioritize_equals_unsalted(self, spark, webdata):
        """Two-phase global top-k is a pure physical rewrite too."""
        from warc2zim_spark.frontier.politeness import prioritize
        from warc2zim_spark.functions import udfs

        pages = spark.read.parquet(f"{webdata}/pages.parquet")
        cands = (
            pages.select(
                udfs.surt_key(F.col("url")).alias("surt_key"),
                udfs.host_of(F.col("url")).alias("host"),
            )
            .filter(F.col("surt_key").isNotNull())
            .withColumn("hops", (F.xxhash64("surt_key") % 3).cast("int"))
            .withColumn("score", (F.pmod(F.xxhash64("host", "surt_key"), F.lit(100)) / 100.0))
            .distinct()
        )
        plain = prioritize(cands, wave_budget=37)
        salted = prioritize(cands, wave_budget=37, salt_partitions=4)
        key = lambda r: (r.host, r.surt_key)
        assert sorted(map(key, plain.collect())) == sorted(map(key, salted.collect()))


class TestPoliteness:
    def test_host_budget_enforced(self, spark, web_tables, tmp_path):
        seeds, robots, pages = web_tables
        schedule = run_crawl(
            spark, seeds, pages, robots, str(tmp_path / "pb"),
            max_waves=3, host_budget=2, wave_budget=1000,
        )
        over = (
            schedule.groupBy("wave", "host")
            .count()
            .filter(F.col("count") > 2)
            .count()
        )
        assert over == 0

    def test_denied_host_never_scheduled(self, spark, webdata, web_tables, tmp_path):
        seeds, robots, pages = web_tables
        deny_hosts = {
            r.host
            for r in robots.filter(
                (F.col("rule_type") == "disallow") & (F.col("path_prefix") == "/")
            ).collect()
        }
        if not deny_hosts:
            pytest.skip("no deny-all hosts at this scale")
        schedule = run_crawl(
            spark, seeds, pages, robots, str(tmp_path / "deny"),
            max_waves=3, host_budget=8, wave_budget=1000,
        )
        scheduled_hosts = {r.host for r in schedule.select("host").distinct().collect()}
        assert not (deny_hosts & scheduled_hosts)


class TestCuckooFilter:
    """north_rule names bloom/cuckoo: the cuckoo variant adds DELETION
    (recrawl/expiry) that blooms cannot express."""

    def _seen(self, spark, webdata):
        from warc2zim_spark.functions import udfs

        pages = spark.read.parquet(f"{webdata}/pages.parquet")
        return (
            pages.select(udfs.surt_key(F.col("url")).alias("surt_key"))
            .filter(F.col("surt_key").isNotNull())
            .distinct()
        )

    def test_no_false_negatives_and_fp_budget(self, spark, webdata):
        from warc2zim_spark.frontier.seenfilter import build_cuckoo, probe_cuckoo

        seen = self._seen(spark, webdata)
        filt = build_cuckoo(seen)
        hits = probe_cuckoo(seen, filt, keep="hit")
        assert hits.count() == seen.count()  # zero false negatives
        absent = spark.range(2000).select(
            F.concat(F.lit("never-seen.example/"), F.col("id")).alias("surt_key")
        )
        fp = probe_cuckoo(absent, filt, keep="hit").count()
        assert fp <= 2000 * 0.05  # 1-byte fingerprints: ~3% budget

    def test_delete_reopens_urls(self, spark, webdata):
        from warc2zim_spark.frontier.seenfilter import (
            build_cuckoo,
            cuckoo_delete_keys,
            probe_cuckoo,
        )

        seen = self._seen(spark, webdata)
        filt = build_cuckoo(seen)
        stale = seen.orderBy("surt_key").limit(50)
        filt2 = cuckoo_delete_keys(filt, stale)
        reopened = probe_cuckoo(stale, filt2, keep="miss").count()
        # deleted keys become crawlable again (minus fingerprint collisions
        # with still-present keys)
        assert reopened >= 45
        # everything else stays present: no false negatives introduced
        rest = seen.join(stale, "surt_key", "left_anti")
        assert probe_cuckoo(rest, filt2, keep="hit").count() == rest.count()


class TestBloomModeCrawl:
    def test_bloom_schedule_equals_exact(self, spark, web_tables, tmp_path):
        """The bloom-driven crawl (north_star headline mode) schedules the
        same set as exact membership at this scale (deterministic hashing:
        a divergence would be a bloom FP dropping one URL — none at this
        fp budget/key count, and the run is reproducible)."""
        seeds, robots, pages = web_tables
        exact = run_crawl(
            spark, seeds, pages, robots, str(tmp_path / "ex"),
            max_waves=3, host_budget=4, wave_budget=50,
        ).collect()
        bloom = run_crawl(
            spark, seeds, pages, robots, str(tmp_path / "bl"),
            max_waves=3, host_budget=4, wave_budget=50, seen_mode="bloom",
        ).collect()
        assert schedule_key(bloom) == schedule_key(exact)
        # and the filter itself was persisted for resume
        assert any((tmp_path / "bl").glob("seen_bloom_wave=*"))

    def test_bloom_resume_from_persisted_filter(self, spark, web_tables, tmp_path):
        """north_rule resumability in the headline mode: restart picks up
        the persisted bloom parquet, not a key rebuild."""
        seeds, robots, pages = web_tables
        full = run_crawl(
            spark, seeds, pages, robots, str(tmp_path / "bf"),
            max_waves=3, host_budget=4, wave_budget=50, seen_mode="bloom",
        ).collect()
        run_crawl(
            spark, seeds, pages, robots, str(tmp_path / "bp"),
            max_waves=2, host_budget=4, wave_budget=50, seen_mode="bloom",
        )
        resumed = resume_crawl(
            spark, seeds, pages, robots, str(tmp_path / "bp"),
            max_waves=3, host_budget=4, wave_budget=50, seen_mode="bloom",
        ).collect()
        assert schedule_key(resumed) == schedule_key(full)
