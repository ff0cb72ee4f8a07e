"""BFS crawl-wave loop: the north-star frontier driver.

Iterative batch (NOT Structured Streaming — SURVEY §2.8): each wave
  1. candidates = frontier rows (url, surt_key, host, hops, score)
  2. robots gate → politeness budget → global priority + wave budget
  3. "fetch" = join scheduled URLs against the page table (the sandbox's
     stand-in for HTTP; at production scale this is the fetcher boundary)
  4. transform: extract links from fetched pages → new candidates
     (hops+1, inherited score decayed)
  5. seen-filter update: scheduled keys enter the seen set (exact mode) or
     the partitioned bloom (scale mode)
  6. checkpoint wave output + metrics to parquet (Iceberg-shaped layout) —
     resumable: ``resume_crawl`` restarts from the last committed wave.

Determinism contract (north_rule): the scheduled set + ordering per wave is
a pure function of (seed list, politeness budget, page table) — independent
of parallelism. Everything order-sensitive goes through explicit sort keys;
ties broken by surt_key.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warc2zim_spark.frontier.politeness import (
    DEFAULT_SALT_PARTITIONS,
    politeness_budget,
    prioritize,
    robots_allowed,
)
from warc2zim_spark.frontier.seenfilter import unseen_exact
from warc2zim_spark.functions import udfs

SCORE_DECAY = 0.5


# rows whose url failed canonicalization or host extraction (UDFs return
# null) — applied AFTER each frontier checkpoint so the filter reads the
# materialized columns: a Filter directly over a UDF Project makes Catalyst
# evaluate the UDF once for the predicate and once for the projection
def _valid():
    return F.col("surt_key").isNotNull() & F.col("host").isNotNull()


def _normalize_cols(frontier: DataFrame) -> DataFrame:
    """Attach surt_key + host (one UDF pass each, NO null filter — callers
    filter ``_VALID`` after a materialization barrier)."""
    return frontier.withColumn("surt_key", udfs.surt_key(F.col("url"))).withColumn(
        "host", udfs.host_of(F.col("url"))
    )


def _normalize(frontier: DataFrame) -> DataFrame:
    return _normalize_cols(frontier).filter(_valid())


def page_lookup(pages: DataFrame) -> DataFrame:
    """(surt_key, html) with exactly one page per canonical key — the
    lexicographically-first url wins (first-wins analogue of A2, needed
    because fuzzy rules/cache-busters fold several urls onto one key).
    Compute ONCE per crawl and cache: at sf0.1 this is a 200k-row surt-UDF
    pass + a window — recomputing it inside every wave dominated the bench."""
    from pyspark.sql import Window

    page_w = Window.partitionBy("surt_key").orderBy("page_url")
    return (
        pages.select(
            udfs.surt_key(F.col("url")).alias("surt_key"),
            F.col("url").alias("page_url"),
            F.col("html"),
        )
        # deliberately NO surt_key null filter: the frame's only consumer is
        # an equi-join on surt_key, which never matches null keys, and any
        # placement of the predicate gets pushed below the window onto the
        # raw UDF Project — doubling the surt pass over the page table
        # (partition-key predicates push through Window legally)
        .withColumn("_rn", F.row_number().over(page_w))
        .filter(F.col("_rn") == 1)
        .select("surt_key", "html")
    )


def crawl_wave(
    frontier: DataFrame,
    seen: DataFrame,
    pages: DataFrame,
    robots: DataFrame,
    host_budget: int = 8,
    wave_budget: int = 1000,
    pages_keyed: DataFrame | None = None,
    salt_partitions: int = DEFAULT_SALT_PARTITIONS,
    seen_bloom: DataFrame | None = None,
    bloom_partitions: int = 32,
) -> tuple[DataFrame, DataFrame]:
    """One wave → (scheduled, next_frontier_candidates).

    ``frontier``: (url, surt_key, host, hops, score) candidates.
    ``seen``: one column ``surt_key``.
    ``pages``: the web-page table (url, html, ...) standing in for fetches.
    ``pages_keyed``: optional pre-built ``page_lookup(pages)`` (cached by the
    crawl driver so the 200k-row key pass happens once, not per wave).
    ``bloom_partitions`` must match the partition count ``seen_bloom`` was
    built with (probe_bloom validates against the filter rows and raises on
    mismatch — a silent mismatch would pair candidates with the wrong
    bitmaps and re-crawl seen URLs every wave).
    """
    # dedup in-wave candidates: best (hops, score) per surt_key, then anti-join
    # seen. Deterministic everywhere: url = lexicographic min, host derived
    # from it (never F.first — parallelism must not change the result).
    best = (
        frontier.groupBy("surt_key")
        .agg(
            F.min("hops").alias("hops"),
            F.max("score").alias("score"),
            F.min("url").alias("url"),
        )
        # no host-null filter needed: every url in the group passed _VALID,
        # min(url) is one of them, and host_of is deterministic per url —
        # a filter here would just double the host UDF over the wave
        .withColumn("host", udfs.host_of(F.col("url")))
    )
    if seen_bloom is not None:
        # partitioned-bloom membership (the 10^10-key mode): candidates hash
        # to bitmap partitions, cogrouped probe, no exact key set anywhere.
        # A bloom FP drops an unseen URL — the crawl-safe direction.
        from warc2zim_spark.frontier.seenfilter import probe_bloom

        unseen = probe_bloom(
            best, seen_bloom, num_partitions=bloom_partitions, keep="miss"
        )
    else:
        unseen = unseen_exact(best, seen)
    allowed = robots_allowed(unseen, robots)
    # salted by default: the production path must survive zipf-hot hosts
    # (salted == unsalted proven in tests/test_frontier.py)
    polite = politeness_budget(
        allowed, robots, host_budget=host_budget, salt_partitions=salt_partitions
    )
    scheduled = prioritize(
        polite, wave_budget=wave_budget, salt_partitions=salt_partitions
    ).localCheckpoint(eager=False)
    # ^ checkpoint: the wave output is consumed twice — written/aggregated by
    # the crawl driver AND joined against the page table for link extraction
    # (whose result materializes one wave LATER, after the driver's cache is
    # long gone) — without the barrier every wave's scheduling windows
    # recompute inside the next wave's frontier checkpoint

    # "fetch": canonical-key join against the page table; extract links.
    page_keyed = pages_keyed if pages_keyed is not None else page_lookup(pages)
    fetched = scheduled.join(page_keyed, "surt_key", "left")
    html_str = udfs.decode_payload(
        F.col("html"), F.lit(None).cast("string"), F.lit("html")
    )
    links = (
        fetched.filter(F.col("html").isNotNull())
        .select(
            "surt_key", "url", "hops", "score",
            # *_outer: plain explode's implicit non-empty guard is a predicate
            # on the UDF output and made Catalyst run the decode+extract HTML
            # parse TWICE per page; null hrefs resolve to null urls and die in
            # the frontier's _VALID filter
            F.explode_outer(udfs.extract_meta(html_str)["links"]).alias("href"),
        )
        # no dst_url null filter here: it would double the resolve UDF, and
        # null urls canonicalize to null surt_key → dropped by _VALID anyway
        .withColumn("dst_url", udfs.resolve_url(F.col("url"), F.col("href")))
        .select(
            F.col("dst_url").alias("url"),
            (F.col("hops") + 1).alias("hops"),
            (F.col("score") * SCORE_DECAY).alias("score"),
        )
    )
    return scheduled, _normalize_cols(links)


def run_crawl(
    spark: SparkSession,
    seeds: DataFrame,
    pages: DataFrame,
    robots: DataFrame,
    checkpoint_dir: str,
    max_waves: int = 4,
    host_budget: int = 8,
    wave_budget: int = 1000,
    start_wave: int = 0,
    initial_seen: DataFrame | None = None,
    initial_frontier: DataFrame | None = None,
    seen_mode: str = "exact",
    bloom_partitions: int = 32,
    bloom_m_bits: int = 1 << 20,
    initial_bloom: DataFrame | None = None,
    salt_partitions: int = DEFAULT_SALT_PARTITIONS,
    salt_min_candidates: int = 1_000_000,
) -> DataFrame:
    """Run (or resume) the BFS crawl; returns the full schedule
    (wave, url, surt_key, host, hops, score) read back from the checkpoint
    directory — the durable artifact, matching what a restarted job sees.

    ``seen_mode="bloom"`` drives the seen-filter as the partitioned bloom
    (north_star headline): each wave's scheduled keys build a fixed-size
    per-partition bloom that OR-merges into the running filter; the filter
    rows persist to parquet next to each wave (resume re-reads them). The
    exact key set never materializes. ``bloom_m_bits`` is the per-partition
    capacity plan: at 16 bits/key, 2^20 bits ≈ 65k keys/partition — size it
    to (expected keys) × 16 / partitions at production scale.

    Salting is SKEW-CONDITIONAL: the salted pre-windows in politeness/top-k
    are a pure physical rewrite (identical results, proven in tests) whose
    extra shuffle only pays off on big skewed waves. Each wave counts its
    (checkpoint-materialized) frontier and salts only at
    ≥ ``salt_min_candidates`` rows — production 10^8-URL waves get the skew
    kill, sandbox 10^4-row waves skip two full candidate shuffles (the
    BENCH_r02 w_frontier regression)."""
    if seen_mode not in ("exact", "bloom"):
        raise ValueError(f"seen_mode must be 'exact' or 'bloom', got {seen_mode!r}")
    from warc2zim_spark.frontier.seenfilter import build_bloom, merge_blooms

    ckpt = Path(checkpoint_dir)
    ckpt.mkdir(parents=True, exist_ok=True)
    frontier = (
        (initial_frontier if initial_frontier is not None else _normalize_cols(seeds))
        .localCheckpoint(eager=True)
        .filter(_valid())
    )
    seen = (
        initial_seen
        if initial_seen is not None
        else spark.createDataFrame([], "surt_key string")
    )
    seen_bloom = None
    if seen_mode == "bloom":
        # resume fast-path: the persisted filter itself (no key rebuild)
        seen_bloom = (
            initial_bloom
            if initial_bloom is not None
            else build_bloom(
                seen, num_partitions=bloom_partitions, m_bits=bloom_m_bits
            )
        ).localCheckpoint(eager=True)
    pages_keyed = page_lookup(pages).cache()
    for wave in range(start_wave, max_waves):
        # frontier is checkpoint-materialized → count is a cheap block scan;
        # it decides whether this wave's salted pre-windows are worth their
        # extra candidate shuffle (skew-conditional salting)
        wave_salt = (
            salt_partitions if frontier.count() >= salt_min_candidates else 0
        )
        scheduled, next_frontier = crawl_wave(
            frontier, seen, pages, robots,
            host_budget=host_budget, wave_budget=wave_budget,
            pages_keyed=pages_keyed, seen_bloom=seen_bloom,
            salt_partitions=wave_salt, bloom_partitions=bloom_partitions,
        )
        out = scheduled.select(
            F.lit(wave).alias("wave"), "url", "surt_key", "host", "hops",
            F.round("score", 9).alias("score"),
        ).cache()
        # idempotent wave write (overwrite → safe re-run after partial failure)
        out.write.mode("overwrite").parquet(str(ckpt / f"wave={wave}"))
        # one aggregation job for all wave metrics (not a job per stat)
        stats = out.agg(
            F.count("*").alias("n"), F.countDistinct("host").alias("hosts")
        ).collect()[0]
        n_scheduled = stats["n"]
        metrics = {
            "wave": wave,
            "scheduled": n_scheduled,
            "hosts": stats["hosts"],
        }
        (ckpt / f"wave={wave}._metrics.json").write_text(json.dumps(metrics))
        (ckpt / f"wave={wave}._SUCCESS_WAVE").write_text("ok")
        if n_scheduled == 0:
            break
        if seen_mode == "bloom":
            wave_bloom = build_bloom(
                out.select("surt_key"),
                num_partitions=bloom_partitions, m_bits=bloom_m_bits,
            )
            seen_bloom = merge_blooms(seen_bloom, wave_bloom).localCheckpoint(
                eager=True
            )
            # persist the filter itself (north_rule: seen-filter resumable
            # from checkpoint without re-reading every wave's keys)
            seen_bloom.write.mode("overwrite").parquet(
                str(ckpt / f"seen_bloom_wave={wave}")
            )
        else:
            seen = (
                seen.union(out.select("surt_key"))
                .distinct()
                .localCheckpoint(eager=True)
            )
        frontier = next_frontier.localCheckpoint(eager=True).filter(_valid())
    pages_keyed.unpersist()
    waves = sorted(int(p.name.split("=")[1]) for p in ckpt.glob("wave=*") if p.is_dir())
    return (
        spark.read.parquet(*[str(ckpt / f"wave={w}") for w in waves])
        if waves
        else spark.createDataFrame([], "wave int, url string, surt_key string, host string, hops int, score double")
    )


def last_committed_wave(checkpoint_dir: str) -> int:
    """Resume point: highest wave with a success marker, or -1."""
    ckpt = Path(checkpoint_dir)
    done = [
        int(p.name.split("=")[1].split(".")[0])
        for p in ckpt.glob("wave=*._SUCCESS_WAVE")
    ]
    return max(done) if done else -1


def resume_crawl(
    spark: SparkSession,
    seeds: DataFrame,
    pages: DataFrame,
    robots: DataFrame,
    checkpoint_dir: str,
    max_waves: int = 4,
    **kwargs,
) -> DataFrame:
    """Restart after interruption: rebuild seen-set + frontier from committed
    waves, continue from the next wave (north_rule resumability)."""
    last = last_committed_wave(checkpoint_dir)
    if last < 0:
        return run_crawl(spark, seeds, pages, robots, checkpoint_dir,
                         max_waves=max_waves, **kwargs)
    ckpt = Path(checkpoint_dir)
    done = spark.read.parquet(*[str(ckpt / f"wave={w}") for w in range(last + 1)])
    seen = done.select("surt_key").distinct()
    # bloom mode: resume from the persisted FILTER (written after each wave)
    # instead of rebuilding it from every committed wave's keys
    if kwargs.get("seen_mode") == "bloom":
        bloom_path = ckpt / f"seen_bloom_wave={last}"
        if bloom_path.exists():
            kwargs = {**kwargs, "initial_bloom": spark.read.parquet(str(bloom_path))}
    # recompute the frontier produced by the last committed wave
    _, frontier = crawl_wave(
        done.filter(F.col("wave") == last).select("url", "surt_key", "host", "hops", "score"),
        seen.join(done.filter(F.col("wave") == last).select("surt_key"), "surt_key", "left_anti"),
        pages, robots, **{k: v for k, v in kwargs.items() if k in ("host_budget", "wave_budget")},
    )
    return run_crawl(
        spark, seeds, pages, robots, checkpoint_dir, max_waves=max_waves,
        start_wave=last + 1, initial_seen=seen, initial_frontier=frontier, **kwargs,
    )
