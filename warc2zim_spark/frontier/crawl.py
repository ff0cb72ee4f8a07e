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
import os
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

# scale guards for the broadcast fast paths (r06). Wave schedules and
# exact-mode seen sets are broadcast-joined while they provably fit (keys
# only, ~100 B/row → ≤ a few hundred MB at these caps); beyond them the
# plain shuffle joins (and, for seen, the partitioned-bloom mode — the
# actual 10^10-key design point) take over. Env-overridable for cluster
# tiers with more executor memory.
_FETCH_BROADCAST_MAX = int(os.environ.get("W2ZS_FETCH_BROADCAST_MAX", "2000000"))
_SEEN_BROADCAST_MAX = int(os.environ.get("W2ZS_SEEN_BROADCAST_MAX", "2000000"))


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
    """(surt_key, page_url) with exactly one page per canonical key — the
    lexicographically-first url wins (first-wins analogue of A2, needed
    because fuzzy rules/cache-busters fold several urls onto one key).
    Compute ONCE per crawl and cache.

    NARROW (r06, guide §8): the lookup is a *decision* table of keys only —
    ``min(page_url)`` over a map-side-aggregating groupBy is exactly the
    former window's first-wins pick, but the dedup shuffle and the per-crawl
    cache now carry ~100 B/row instead of the whole html payload.
    ``crawl_wave`` re-attaches html at fetch time by streaming the page
    table through a broadcast probe of the scheduled keys, so the heavy
    bytes are never shuffled or cached at all."""
    return (
        pages.select(
            udfs.surt_key(F.col("url")).alias("surt_key"),
            F.col("url").alias("page_url"),
        )
        .groupBy("surt_key")
        .agg(F.min("page_url").alias("page_url"))
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
    ``pages_keyed``: optional pre-built ``page_lookup(pages)`` — the NARROW
    (surt_key, page_url) decision table (cached by the crawl driver so the
    surt pass over the page table happens once, not per wave).
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
    # The scheduled keys pick their winning page_url on the NARROW lookup,
    # then html is attached by streaming the page table through a hash probe
    # of that (small) hit set: the html bytes move ZERO times — they stay in
    # the scan stage that feeds the link-extraction UDFs, at the scan's own
    # parallelism (the former left join against a (surt_key, html) lookup
    # either broadcast ~100 MB of html per wave or probed it from the
    # single-partition schedule side, serializing the whole HTML parse into
    # one task — guide §8: decide with small rows, move big rows once).
    page_keyed = pages_keyed if pages_keyed is not None else page_lookup(pages)
    hits = scheduled.join(page_keyed, "surt_key")
    if wave_budget is not None and wave_budget <= _FETCH_BROADCAST_MAX:
        hits = F.broadcast(hits)
    fetched = hits.join(
        pages.select(F.col("url").alias("page_url"), "html"), "page_url"
    )
    links = (
        fetched.filter(F.col("html").isNotNull())
        .select(
            "hops", "score",
            # decode + extract + resolve + canonicalize fused into ONE Arrow
            # stage over the raw bytes (extract_wave_links) — the former
            # chain round-tripped the page through Python for decode, again
            # for the parse, and the exploded link frame twice more (Spark
            # plans even chained pandas UDFs as separate eval nodes).
            # *_outer: plain explode's implicit non-empty guard is a
            # predicate on the UDF output and made Catalyst run the parse
            # TWICE per page; a linkless page yields one null row that dies
            # in the frontier's _VALID filter.
            F.explode_outer(
                udfs.extract_wave_links(F.col("html"), F.col("url"))
            ).alias("l"),
        )
        .select(
            F.col("l.url").alias("url"),
            (F.col("hops") + 1).alias("hops"),
            (F.col("score") * SCORE_DECAY).alias("score"),
            F.col("l.surt_key").alias("surt_key"),
            F.col("l.host").alias("host"),
        )
    )
    return scheduled, links


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
    # spread the seed pass: seeds routinely arrive as ONE partition (a limit,
    # a collected list, a tiny file), which would run the surt/host UDF pass
    # — and everything until the first exchange — in a single task. A
    # round-robin repartition of the (tiny, urls-only) seed rows costs
    # nothing and restores wave-0 parallelism (r06; set identical, order
    # explicitly re-established by every downstream sort key).
    n_parts = spark.sparkContext.defaultParallelism
    frontier_ckpt = (
        initial_frontier
        if initial_frontier is not None
        else _normalize_cols(seeds.repartition(n_parts))
    ).localCheckpoint(eager=False)
    # one job materializes the (lazy) checkpoint AND returns the candidate
    # count the salt heuristic needs (r06 — was an eager-checkpoint job plus
    # a separate count job per wave). The count is now pre-_valid-filter;
    # it only gates the skew-conditional salting, whose salted and unsalted
    # paths are result-identical (pinned in tests), so the schedule cannot
    # depend on which side of the threshold a wave lands.
    frontier_count = frontier_ckpt.count()
    frontier = frontier_ckpt.filter(_valid())
    seen = (
        initial_seen
        if initial_seen is not None
        else spark.createDataFrame([], "surt_key string")
    )
    # exact-mode seen keys are counted as they accumulate (each wave adds
    # exactly n_scheduled NEW keys — the anti-join guarantees disjointness),
    # so the wave can broadcast the probe side while it provably fits
    seen_count = initial_seen.count() if initial_seen is not None else 0
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
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import Observation

    # overlap independent driver-submitted jobs (guide §2.6): actions are
    # only sequential because the driver calls them sequentially. Per wave,
    # the schedule's parquet write and the next frontier's checkpoint
    # consume the SAME materialized schedule and depend on nothing else of
    # each other — running the write in a worker thread lets the link
    # extraction back-fill the executor slots the write's tail leaves idle.
    # The lookup-cache build likewise overlaps wave-0's scheduling chain
    # (it is first needed only at the mid-wave fetch join).
    with ThreadPoolExecutor(max_workers=2) as pool:
        warm_lookup = pool.submit(pages_keyed.count)
        for wave in range(start_wave, max_waves):
            # candidate count decides whether this wave's salted pre-windows
            # are worth their extra shuffle (skew-conditional salting);
            # collected for free by the checkpoint-materializing job above
            wave_salt = (
                salt_partitions if frontier_count >= salt_min_candidates else 0
            )
            seen_for_wave = (
                F.broadcast(seen) if seen_count <= _SEEN_BROADCAST_MAX else seen
            )
            scheduled, next_frontier = crawl_wave(
                frontier, seen_for_wave, pages, robots,
                host_budget=host_budget, wave_budget=wave_budget,
                pages_keyed=pages_keyed, seen_bloom=seen_bloom,
                salt_partitions=wave_salt, bloom_partitions=bloom_partitions,
            )
            out = scheduled.select(
                F.lit(wave).alias("wave"), "url", "surt_key", "host", "hops",
                F.round("score", 9).alias("score"),
            )
            # wave metrics ride the write job as an Observation (r06): count
            # + distinct hosts (size(collect_set) ≡ countDistinct) are
            # collected while the rows stream to parquet, replacing the
            # separate aggregation job per wave; out needs no cache — its
            # only other consumer (the seen union) is a column projection of
            # the already-checkpointed schedule
            obs = Observation(f"wave={wave}")
            observed = out.observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.size(F.collect_set("host")).alias("hosts"),
            )
            # idempotent wave write (overwrite → safe re-run after partial
            # failure), submitted to the pool so the next-frontier
            # checkpoint below runs concurrently
            write_fut = pool.submit(
                lambda df=observed, w=wave: df.write.mode("overwrite").parquet(
                    str(ckpt / f"wave={w}")
                )
            )
            # lazy checkpoint + count in one job (also feeds next wave's
            # salt heuristic), concurrent with the write above
            frontier_ckpt = next_frontier.localCheckpoint(eager=False)
            frontier_count = frontier_ckpt.count()
            write_fut.result()
            stats = obs.get
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
                # persist the filter itself (north_rule: seen-filter
                # resumable from checkpoint without re-reading every wave's
                # keys)
                seen_bloom.write.mode("overwrite").parquet(
                    str(ckpt / f"seen_bloom_wave={wave}")
                )
            else:
                # no distinct (r06): this wave's keys are disjoint from seen
                # by construction (they survived the anti-join) and unique
                # within the wave (dedup groupBy), so the union IS the exact
                # seen set — the distinct was one full seen-set shuffle per
                # wave for nothing
                seen = seen.union(out.select("surt_key")).localCheckpoint(
                    eager=True
                )
                seen_count += n_scheduled
            frontier = frontier_ckpt.filter(_valid())
        warm_lookup.result()
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
