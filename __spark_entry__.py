"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 (+ the training-data extensions); ``oracle_sql()`` provides the
DuckDB twin for every SQL-expressible one. Web-table queries run over the
deterministic synthetic tables in /root/repo/webdata/<sf>/ (generated on
demand, seed=42 — see warc2zim_spark/sources/datagen.py); generic operators
run over the driver's pre-registered views (documents, embeddings,
lineitem, ...).

Column names are aliased identically on both sides (the driver's compare
sorts columns by name before hashing).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WEBROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "webdata")


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def _web(sf_dir: str) -> str:
    """Webdata dir for this scale tier (generates once if missing)."""
    from warc2zim_spark.sources.datagen import ensure_webdata

    return str(ensure_webdata(_sf_name(sf_dir), WEBROOT))


def _records(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{_web(sf_dir)}/warc_records.parquet")


def _content(spark: SparkSession, sf_dir: str) -> DataFrame:
    from warc2zim_spark.operators.records import content_records

    return content_records(_records(spark, sf_dir))


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{_web(sf_dir)}/pages.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# web-pipeline queries (SURVEY §2 operators)
# ---------------------------------------------------------------------------

def q_w_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: deduplicated item table (P1-P12, A2, J1/J2, S5)."""
    from warc2zim_spark.operators.items import items_table

    return items_table(_content(spark, sf_dir)).orderBy("zim_path")


def q_w_redirect_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from warc2zim_spark.operators.redirects import redirect_edges

    return redirect_edges(_content(spark, sf_dir))


def q_w_redirects_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1/G2/G3 — fixpoint-resolved redirect table."""
    from warc2zim_spark.operators.gather import expected_items
    from warc2zim_spark.operators.redirects import kept_redirects, redirect_edges

    content = _content(spark, sf_dir)
    return kept_redirects(redirect_edges(content), expected_items(content))


def q_w_seen_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — the URL-seen set."""
    from warc2zim_spark.operators.gather import expected_items

    return expected_items(_content(spark, sf_dir))


def q_w_run_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + A5 merged into one 1-row frame to stay inside the driver's
    50-query cap (r03 verdict #6): X-ContentDate range (min/max WARC-Date,
    converter.py:491-497) crossJoined with the first warcinfo record's
    ``software:`` field (converter.py:463-477) — both sides are 1-row
    aggregates off the same record scan, so the crossJoin is free."""
    from warc2zim_spark.operators.gather import date_range, warcinfo_software

    records = _records(spark, sf_dir)
    from warc2zim_spark.operators.records import content_records

    # aggregate the 0-or-1-row software frame to EXACTLY one row (NULL when
    # no warcinfo exists) so the crossJoin can never wipe the date range —
    # matching the oracle's scalar subquery semantics on warcinfo-less input
    software_1row = warcinfo_software(records).agg(
        F.min("software").alias("software")
    )
    return date_range(content_records(records)).crossJoin(software_1row)


def q_w_main_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 + J5 merged into one driver slot (both read the same content scan
    and produce (zim_path, url) shapes — merged r05 to free a slot under the
    driver's 50-query cap):

    - kind='auto': main-page auto-selection (converter.py:565-578);
    - kind='redirect': main-page redirect follow (converter.py:586-606) — a
      --url stand-in at the datagen fixture chain head (302→301→307) must
      re-point to the chain's final path. Independent oracle: DuckDB
      recursive CTE over the {301,302,307} first-wins edge map."""
    from warc2zim_spark.operators.gather import main_page_candidate, main_page_resolved

    content = _content(spark, sf_dir)
    auto = main_page_candidate(content).select(
        F.lit("auto").alias("kind"), "zim_path", "url"
    )
    main = spark.createDataFrame(
        [("redir.example/main-start", "https://redir.example/main-start")],
        "zim_path string, url string",
    )
    followed = main_page_resolved(content, main).select(
        F.lit("redirect").alias("kind"), "zim_path", "url"
    )
    return auto.unionByName(followed)


def q_w_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — the full ZIM metadata frame (converter.py:345-394): title/lang
    cascades off the main page, date range → X-ContentDate, warcinfo →
    Scraper. Oracle re-derives every entry in SQL from golden inputs
    (pages_golden title/lang_decl + a literal en→eng CASE map); the
    Illustration value is a shared constant (fallback transparent PNG),
    interpolated into both sides."""
    from warc2zim_spark.operators.metadata import zim_metadata

    return zim_metadata(
        _content(spark, sf_dir), _records(spark, sf_dir), name="test"
    )


def q_w_static_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 — the ``_zim_static/`` rows unioned into the items sink
    (converter.py:396-409; items.py:65-107)."""
    from warc2zim_spark.operators.metadata import static_asset_items

    return static_asset_items(spark, custom_css=b"body{}").select(
        "zim_path", "mime", "payload_len"
    )


def q_w_items_from_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S3 — the items table computed from RAW WARC BYTES (binaryFile →
    mapInPandas stdlib parser → same operators), proving the engine needs no
    pre-parsed table. Oracle is the w_items SQL over the pre-parsed golden
    table — full independence from the byte path. rec_seq is within-file on
    the byte path (global counter in the table), so the compare projects the
    order-insensitive columns; first-wins winners are identical because
    (file_seq, within-file ordinal) and (file_seq, rec_seq) induce the same
    total order."""
    from warc2zim_spark.operators.items import items_table
    from warc2zim_spark.operators.records import content_records
    from warc2zim_spark.sources.warcbytes import load_warc_records

    records = load_warc_records(spark, f"{_web(sf_dir)}/warc_files")
    return items_table(content_records(records)).select(
        "zim_path", "url", "mime", "status", "payload_len"
    )


def q_w_rewrite_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 — JS rewrite consumption: classifier-selected javascript rows,
    module flag from the HTML pass's discovery (two-round feedback,
    converter.py:227), import re-pointing vs the item set, wombat wrap for
    classic scripts. Golden is sequential-same-kernel (self-golden policy —
    zimscraperlib's JsRewriter is absent; the oracle pins classifier
    selection + module-flag join + seen membership + determinism)."""
    from warc2zim_spark.functions import udfs
    from warc2zim_spark.functions.expressions import rewrite_mode_expr
    from warc2zim_spark.operators.items import item_candidates
    from warc2zim_spark.operators.records import content_records
    from warc2zim_spark.operators.rewrite import js_module_paths, rewritten_js

    records = _records(spark, sf_dir)
    content = content_records(records, with_payload=True)
    mode = rewrite_mode_expr(
        F.split(F.coalesce(F.col("mime"), F.lit("")), ";").getItem(0),
        F.col("resourcetype"),
        F.col("zim_path"),
        F.col("p_method"),
    )
    js_rows = (
        content.filter(F.col("rec_type") == "response")
        .withColumn("rewrite_mode", mode)
        .filter(F.col("rewrite_mode") == "javascript")
        .select(
            "zim_path", F.col("effective_url").alias("url"),
            F.decode(F.col("payload"), "utf-8").alias("js_text"),
        )
    )
    seen = item_candidates(content_records(records)).select("zim_path").distinct()
    modules = js_module_paths(_pages(spark, sf_dir)).select("module_path")
    return rewritten_js(js_rows, seen, modules).select(
        "zim_path",
        F.sha2(F.col("js_rw"), 256).alias("js_rw_sha"),
        "is_module",
    )


def q_w_illustration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 full + C11 — favicon payload capture (broadcast semi-join of the
    main page's icon candidates against the record stream), stdlib dimension
    sniffing, A9 ranking, best-icon selection. Oracle re-derives the ranking
    in SQL over the icons_fixture table (captured candidates + dims)."""
    from warc2zim_spark.operators.favicon import best_illustration
    from warc2zim_spark.operators.gather import main_page_candidate
    from warc2zim_spark.operators.records import content_records

    content = content_records(_records(spark, sf_dir), with_payload=True)
    main = main_page_candidate(content).select(
        "zim_path", F.col("url")
    )
    return best_illustration(content, main).select(
        "icon_url", "fmt", "width", "height"
    )


def q_w_items_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest (readStream → foreachBatch, Trigger.AvailableNow,
    cross-batch first-wins via sink anti-join): drains the record table
    through micro-batches and must reproduce the batch items table exactly —
    same oracle SQL as w_items."""
    import shutil
    import tempfile

    from warc2zim_spark.streaming import stream_items

    work = tempfile.mkdtemp(prefix="stream_items_")
    try:
        src = spark.read.parquet(f"{_web(sf_dir)}/warc_records.parquet")
        # one landing file per file_seq (hash partition: a WARC file's rows —
        # and therefore every request/response pair — stay together)
        src.repartition(4, "file_seq").write.mode("overwrite").parquet(
            f"{work}/landing"
        )
        stream_items(
            spark, f"{work}/landing", f"{work}/items", f"{work}/ckpt"
        )
        out = spark.read.parquet(f"{work}/items").orderBy("zim_path")
        out = spark.createDataFrame(out.collect(), out.schema)
        return out.select(
            "zim_path", "url", "mime", "status", "payload_len",
            "file_seq", "rec_seq",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_w_jsonp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6/C7 — jsonp/json rewrite over the datagen case matrix; oracle
    re-derives with DuckDB regexes (incl. the reference's anchored-match
    dead branch for absolute URLs, rewriting.py:26,48-52)."""
    from warc2zim_spark.functions import udfs

    cases = spark.read.parquet(f"{_web(sf_dir)}/jsonp_cases.parquet")
    return cases.select(
        "case_id",
        udfs.jsonp_rewrite(F.col("content"), F.col("url")).alias("rewritten"),
    )


def q_w_expected_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 — expected items ∪ kept-redirect sources (converter.py:692-696)."""
    from warc2zim_spark.operators.gather import expected_items
    from warc2zim_spark.operators.redirects import (
        expected_with_redirects,
        redirect_edges,
    )

    content = _content(spark, sf_dir)
    return expected_with_redirects(
        redirect_edges(content), expected_items(content)
    )


def q_w_include_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — netloc-endswith domain gate on the items table
    (converter.py:960-966); fixture domain covers the statuses.example rows."""
    from warc2zim_spark.operators.items import items_table

    return items_table(
        _content(spark, sf_dir), ["statuses.example"]
    ).select("zim_path", "url", "status")


def q_w_pairing_urlkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J2 — responses that acquired a synthesized POST/PUT urlkey via
    adjacent-request pairing."""
    content = _content(spark, sf_dir)
    return content.filter(
        (F.col("rec_type") == "response") & F.col("p_method").isin("POST", "PUT")
    ).select("file_seq", "rec_seq", F.col("effective_url").alias("urlkey"))


def q_w_rewrite_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 — rewrite-mode classifier (pure Catalyst expression)."""
    from warc2zim_spark.functions.expressions import rewrite_mode_expr

    content = _content(spark, sf_dir).filter(F.col("rec_type") == "response")
    return content.select(
        "file_seq",
        "rec_seq",
        "zim_path",
        rewrite_mode_expr(
            F.split(F.coalesce(F.col("mime"), F.lit("")), ";").getItem(0),
            F.col("resourcetype"),
            F.col("zim_path"),
            F.col("p_method"),
        ).alias("rewrite_mode"),
    )


def q_w_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 — 3-tier charset decode over the adversarial matrix."""
    from warc2zim_spark.functions import udfs

    enc = spark.read.parquet(f"{_web(sf_dir)}/encoded_payloads.parquet")
    return enc.select(
        "case_id",
        udfs.decode_payload_with_charsets(
            F.col("payload"), F.col("http_charset"), F.col("mode"), F.col("charsets_csv")
        ).alias("decoded"),
    )


def q_w_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 — failed-record quarantine: decode failures become quarantine rows
    instead of task failures (converter.py:414-437 semantics)."""
    from warc2zim_spark.functions import udfs

    enc = spark.read.parquet(f"{_web(sf_dir)}/encoded_payloads.parquet")
    decoded = enc.select(
        "case_id",
        udfs.decode_payload_with_charsets(
            F.col("payload"), F.col("http_charset"), F.col("mode"), F.col("charsets_csv")
        ).alias("decoded"),
    )
    return decoded.filter(F.col("decoded").isNull()).select("case_id")


def q_w_fails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 full — per-record failure isolation (--continue-on-error,
    converter.py:411-437): the fixture's poison records (text-mode rows whose
    charset names an unknown codec → LookupError inside the Arrow UDF) become
    quarantine rows instead of task failures. Oracle re-derives the failing
    set + stage + error text from the raw record columns in SQL."""
    from warc2zim_spark.operators.quarantine import quarantined_records
    from warc2zim_spark.operators.records import content_records

    content = content_records(_records(spark, sf_dir), with_payload=True)
    return quarantined_records(content).select(
        "zim_path", "url", "file_seq", "rec_seq", "stage", "reason"
    )


def q_w_icon_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/W3 — favicon ranking: the reference comparator as an orderBy over a
    derived rank expression (icon_finder.py:25-56 tiers)."""
    icons = spark.createDataFrame(
        [
            ("i48", 48, 48), ("i48x96", 48, 96), ("i96", 96, 96),
            ("i49", 49, 49), ("i512", 512, 512), ("i47", 47, 47),
            ("i16", 16, 16), ("i32x100", 100, 32),
        ],
        "icon_id string, width int, height int",
    )
    m = F.least(F.col("width"), F.col("height"))
    tier = (
        F.when(m == 48, F.lit(2)).when(m > 48, F.lit(1)).otherwise(F.lit(0))
    )
    within = F.when(m == 48, F.lit(0)).otherwise(m)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("tier"), F.desc("within"), F.asc("icon_id"))
    return (
        icons.withColumn("tier", tier)
        .withColumn("within", within)
        .withColumn("pref_rank", F.row_number().over(w))
        .select("icon_id", "pref_rank")
    )


def q_w_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12 — the byte-identical invariant: decode(html) → extract_text.

    r06: the decode and extract kernels run FUSED in one Arrow stage
    (extract_text_from_bytes) — Spark plans chained pandas UDFs as two
    separate eval nodes, so the former extract_text(decode_payload(...))
    chain shipped every decoded document across the Python boundary twice.
    Same kernels composed per row → byte-identical text."""
    from warc2zim_spark.functions import udfs

    pages = _pages(spark, sf_dir)
    return pages.select(
        "url",
        udfs.extract_text_from_bytes(F.col("html")).alias("text"),
    )


def q_w_page_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/A8 + C3-subset in ONE extract_meta pass: title, declared
    language, outlink count per page (merged former w_title_lang +
    w_links_out — same coverage, one query slot under the 50-entry driver
    cap)."""
    from warc2zim_spark.functions import udfs

    pages = _pages(spark, sf_dir)
    meta = udfs.extract_meta(
        udfs.decode_payload(F.col("html"), F.lit(None).cast("string"), F.lit("html"))
    )
    return pages.select(
        "url",
        meta["title"].alias("title"),
        meta["lang_decl"].alias("lang_decl"),
        F.size(meta["links"]).cast("long").alias("n_links"),
    )


def q_w_icons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 — icon hrefs discovered in HTML, exploded."""
    from warc2zim_spark.functions import udfs

    pages = _pages(spark, sf_dir)
    meta = udfs.extract_meta(
        udfs.decode_payload(F.col("html"), F.lit(None).cast("string"), F.lit("html"))
    )
    return pages.select("url", meta["icons"].alias("icons")).select(
        "url", F.explode("icons").alias("icon_href")
    )


def q_w_rewrite_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3/C4 — href/src/srcset/css-url rewriting against the seen-set;
    compared as sha256 of the rewritten document (sequential golden).

    Runs the *distributed* (no driver collect, no whole-set broadcast)
    production path; broadcast-exact ≡ distributed-exact ≡ distributed-bloom
    is pinned in tests/test_spark_pipeline.py."""
    from warc2zim_spark.operators.rewrite import rewritten_pages_distributed

    pages = _pages(spark, sf_dir)
    seen = spark.read.parquet(f"{_web(sf_dir)}/pages_golden.parquet").select("zim_path")
    return rewritten_pages_distributed(pages, seen, mode="exact").select(
        "url", F.sha2(F.col("html_rw"), 256).alias("html_rw_sha")
    )


def q_w_rewrite_html_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 full fidelity — link re-pointing + wombat head-inserts (faithful
    re-render of templates/head_insert.html) + custom.css post-insert +
    title-from-rewriter (items.py:46-56); sequential same-kernel golden
    (self-golden policy, zimscraperlib absent)."""
    from warc2zim_spark.operators.rewrite import rewritten_pages_full

    pages = _pages(spark, sf_dir)
    seen = spark.read.parquet(f"{_web(sf_dir)}/pages_golden.parquet").select("zim_path")
    return rewritten_pages_full(pages, seen, custom_css=True).select(
        "url",
        F.col("title").alias("title_rw"),
        F.sha2(F.col("html_full"), 256).alias("html_full_sha"),
    )


def q_w_js_modules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 round-1 — ES-module discovery feeding the isModule flag."""
    from warc2zim_spark.operators.rewrite import js_module_paths

    return js_module_paths(_pages(spark, sf_dir)).select("url", "module_src")


def q_w_aliases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/S6 — revisit → alias table."""
    from warc2zim_spark.operators.items import items_table, revisit_aliases

    content = _content(spark, sf_dir)
    return revisit_aliases(content, items_table(content))


def q_w_status_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — processable-status whitelist over the full matrix."""
    from warc2zim_spark.functions.expressions import is_processable_status

    return (
        _content(spark, sf_dir)
        .filter(F.col("rec_type") == "response")
        .groupBy("status")
        .agg(
            F.count("*").alias("n"),
            F.max(
                F.coalesce(is_processable_status(F.col("status")).cast("int"), F.lit(0))
            ).alias("processable"),
        )
        .orderBy("status")
    )


def q_w_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star frontier: 4 BFS waves (robots + politeness + priority +
    seen-filter), deterministic across parallelism levels; oracle is a
    sequential pure-python crawler implementing the same spec."""
    import shutil
    import tempfile

    from warc2zim_spark.frontier.crawl import run_crawl

    web = _web(sf_dir)
    seeds = spark.read.parquet(f"{web}/seeds.parquet")
    robots = spark.read.parquet(f"{web}/robots.parquet")
    pages = _pages(spark, sf_dir)
    ckpt = tempfile.mkdtemp(prefix="crawl_ckpt_")
    try:
        schedule = run_crawl(
            spark, seeds, pages, robots, ckpt, max_waves=4,
            host_budget=8, wave_budget=1000,
        )
        # materialize before the checkpoint dir disappears
        out = schedule.select("wave", "url", "surt_key", "host", "hops", "score").cache()
        out.count()
        return out
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def q_w_frontier_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same 4-wave crawl with the seen-filter driven as the PARTITIONED
    BLOOM (north_star headline mode — exact key set never materializes);
    must reproduce the sequential oracle exactly, same SQL as w_frontier."""
    import shutil
    import tempfile

    from warc2zim_spark.frontier.crawl import run_crawl

    web = _web(sf_dir)
    seeds = spark.read.parquet(f"{web}/seeds.parquet")
    robots = spark.read.parquet(f"{web}/robots.parquet")
    pages = _pages(spark, sf_dir)
    ckpt = tempfile.mkdtemp(prefix="crawl_bloom_ckpt_")
    try:
        schedule = run_crawl(
            spark, seeds, pages, robots, ckpt, max_waves=4,
            host_budget=8, wave_budget=1000, seen_mode="bloom",
        )
        out = schedule.select(
            "wave", "url", "surt_key", "host", "hops", "score"
        ).cache()
        out.count()
        return out
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def q_w_digest_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star J4 generalization — payload-digest dedup groups."""
    from warc2zim_spark.operators.dedup import digest_duplicates

    return digest_duplicates(_records(spark, sf_dir))


# ---------------------------------------------------------------------------
# training-data queries (documents / embeddings)
# ---------------------------------------------------------------------------

def q_d_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from warc2zim_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_docs(spark, sf_dir)).select(
        "content_hash", "n_docs", "keep_id"
    )


def q_d_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (lossless size blocking)."""
    from warc2zim_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.8)


def q_d_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates verified at Jaccard ≥ 0.8 (band recall at this
    threshold is ≈ 0.9998, so at the test scale output = exact pairs)."""
    from warc2zim_spark.operators.dedup import minhash_near_duplicates

    return minhash_near_duplicates(_docs(spark, sf_dir), threshold=0.8).select(
        "id_a", "id_b", "jaccard"
    )


def q_d_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components dedup clustering over the MinHash near-dup
    pairs — the keep-one-per-cluster step of a training-data pipeline.
    Hash-min label propagation (O(diameter) rounds, one shuffle each);
    oracle is a DuckDB recursive-CTE transitive closure taking the min
    reachable id per node — structurally independent of the propagation
    loop."""
    from warc2zim_spark.operators.dedup import (
        duplicate_clusters,
        minhash_near_duplicates,
    )

    pairs = minhash_near_duplicates(_docs(spark, sf_dir), threshold=0.8)
    return duplicate_clusters(pairs).orderBy("doc_id")


def q_d_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash per doc (distributed UDF vs sequential kernel golden)."""
    from warc2zim_spark.functions import udfs

    return _docs(spark, sf_dir).select(
        "doc_id", udfs.simhash(F.col("text")).alias("simhash")
    )


def q_d_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3) via Manku block-combination
    tables (C(6,3)=20 keys of ~32 bits); brute-force all-pairs DuckDB
    oracle pins exact completeness."""
    from warc2zim_spark.operators.dedup import simhash_near_duplicates

    return simhash_near_duplicates(_docs(spark, sf_dir), max_hamming=3)


def q_d_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined per-document stats in ONE scan (no joins): language-ID
    (kernel golden) + quality profile + whitespace token count (both
    independently re-derived in SQL). Replaces the former d_langid /
    d_quality / d_tokens triple — same coverage, one query slot (the
    external driver records at most 50 queries; r02 proved the 51st entry
    silently drops)."""
    from warc2zim_spark.operators.textops import text_stats

    return text_stats(_docs(spark, sf_dir))


def q_d_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from warc2zim_spark.operators.textops import fingerprints

    return fingerprints(_docs(spark, sf_dir))


def q_d_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact stratified sampling (operators/sampling.py):
    exactly min(5, |stratum|) docs per language, chosen by a seeded hash
    order — identical at any parallelism. The driver row uses the md5
    portable key so DuckDB re-derives the SAME rows independently; the
    xxhash64 production path is pinned by pytest (same window logic)."""
    from warc2zim_spark.operators.sampling import stratified_sample_exact

    return stratified_sample_exact(
        _docs(spark, sf_dir), strata_col="lang", n_per_stratum=5,
        id_col="doc_id", seed=42, key="md5",
    ).select("doc_id", "lang")


_BP_FOOTER = "Copyright 2020 Example Corp - all rights reserved"
_BP_BANNER = "We use cookies to improve your browsing experience"


def q_d_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection (operators/textops.py
    boilerplate_paragraphs — Lee et al. 2022 motivates removing exact spans
    shared across documents). The synthetic documents table has no repeated
    paragraphs, so the query plants two deterministic boilerplate lines
    (footer on doc_id%3, cookie banner on doc_id%5) BEFORE detection; the
    oracle plants the same lines in SQL and re-derives split → trim →
    group → having count(distinct doc) ≥ 3 independently. Output keyed by
    paragraph text (sample_text == the paragraph whenever xxhash64 is
    collision-free, which the oracle verifies by matching)."""
    from warc2zim_spark.operators.textops import boilerplate_paragraphs

    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(_BP_FOOTER)),
            F.when(F.col("doc_id") % 5 == 0, F.lit(_BP_BANNER)),
        ),
    )
    return boilerplate_paragraphs(docs, min_docs=3).select(
        F.col("sample_text").alias("para"), "n_docs", "n_occurrences"
    )


def q_e_ann_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for the first 8 vectors (exact baseline)."""
    from warc2zim_spark.operators.similarity import brute_force_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8)
    return brute_force_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


def _ann_recall_frame(approx: DataFrame, brute: DataFrame, k: int, bound: float) -> DataFrame:
    """(query_id, n_results, meets_recall) — per-query recall of the
    approximate index against the exact baseline, thresholded at ``bound``.
    The neighbor sets themselves are approximate-by-design (not SQL-
    derivable), but the recall BOUND is a deterministic, driver-checkable
    contract: seeded hashing/KMeans → identical recall every run, so a
    regression below the bound turns the row red."""
    hits = approx.select("query_id", "neighbor_id").join(
        brute.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    recall = hits.groupBy("query_id").agg(
        (F.count("*") / float(k)).alias("recall")
    )
    return (
        approx.groupBy("query_id")
        .agg(F.count("*").alias("n_results"))
        .join(recall, "query_id", "left")
        .select(
            "query_id",
            "n_results",
            (F.coalesce(F.col("recall"), F.lit(0.0)) >= bound).alias(
                "meets_recall"
            ),
        )
    )


def q_e_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN, oracle-checked via the recall bound: per-query
    recall vs the exact brute-force baseline must be ≥ 0.9 (measured 1.0 at
    sf0.01; seeded → deterministic). The raw neighbor lists stay pinned in
    tests/test_training_ops.py."""
    from warc2zim_spark.operators.similarity import brute_force_topk, lsh_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8)
    return _ann_recall_frame(
        lsh_topk(emb, queries, k=10),
        brute_force_topk(emb, queries, k=10),
        k=10, bound=0.9,
    )


def q_e_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN (seeded KMeans coarse quantizer, n_probe=8 of 16 lists,
    exact re-rank), oracle-checked via the recall bound: per-query recall vs
    brute force ≥ 0.5 at this operating point (measured min 0.5 / mean 0.79
    at sf0.01; deterministic)."""
    from warc2zim_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 8)
    return _ann_recall_frame(
        ivf_topk(emb, queries, k=10, n_lists=16, n_probe=8),
        brute_force_topk(emb, queries, k=10),
        k=10, bound=0.5,
    )


def q_e_dedup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, exact all-pairs baseline at cosine ≥ 0.5."""
    from warc2zim_spark.operators.similarity import brute_force_near_duplicates

    return brute_force_near_duplicates(_emb(spark, sf_dir), threshold=0.5)


def q_m_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing — mapInPandas feature extraction over the media
    fixture. Dimensions come from the REAL stdlib container sniffer
    (PNG/GIF/ICO/SVG headers); the oracle holds the sizes datagen BUILT the
    containers at, so the sniffer is checked independently, not self-golden.
    Only the pixel-level feature vector remains the documented environment
    seam (excluded from the compare; pinned in pytest)."""
    from warc2zim_spark.operators.multimodal import media_features

    media = spark.read.parquet(f"{_web(sf_dir)}/media_fixture.parquet").select(
        "media_id", "kind", "payload"
    )
    return media_features(media).select(
        "media_id", "kind", "n_bytes", "width", "height"
    )


# ---------------------------------------------------------------------------
# generic engine queries (driver star schema) — scan/filter/agg/join/window
# ---------------------------------------------------------------------------

def q_t_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-q1-shaped aggregation (scan → filter → groupBy, map-side
    partials, whole-stage codegen)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_t_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + top-k (broadcast dim, shuffle-agg fact)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select("l_orderkey", F.col("c_mktsegment").alias("mktsegment"), "revenue")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(20)
    )


def q_t_events_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-stream windowing: per-user ordered lag deltas + running count."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "gap_us",
            F.when(
                F.col("prev_ts").isNotNull(),
                (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.col("prev_ts").cast("timestamp"))
                ),
            ),
        )
        .withColumn("seq_no", F.row_number().over(w))
        .select("event_id", "user_id", "seq_no", "gap_us")
    )


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the deduplicated item table."""
    return q_w_items(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "w_items": q_w_items,
        "w_redirect_edges": q_w_redirect_edges,
        "w_redirects_kept": q_w_redirects_kept,
        "w_seen_set": q_w_seen_set,
        "w_run_summary": q_w_run_summary,
        "w_main_page": q_w_main_page,
        "w_metadata": q_w_metadata,
        "w_static_assets": q_w_static_assets,
        "w_items_from_bytes": q_w_items_from_bytes,
        "w_items_streaming": q_w_items_streaming,
        "w_rewrite_js": q_w_rewrite_js,
        "w_illustration": q_w_illustration,
        "w_jsonp": q_w_jsonp,
        "w_expected_full": q_w_expected_full,
        "w_include_domains": q_w_include_domains,
        "w_pairing_urlkey": q_w_pairing_urlkey,
        "w_rewrite_mode": q_w_rewrite_mode,
        "w_decode": q_w_decode,
        "w_quarantine": q_w_quarantine,
        "w_fails": q_w_fails,
        "w_icon_rank": q_w_icon_rank,
        "w_text_extract": q_w_text_extract,
        "w_page_meta": q_w_page_meta,
        "w_icons": q_w_icons,
        "w_rewrite_html": q_w_rewrite_html,
        "w_rewrite_html_full": q_w_rewrite_html_full,
        "w_js_modules": q_w_js_modules,
        "w_aliases": q_w_aliases,
        "w_status_gate": q_w_status_gate,
        "w_digest_dups": q_w_digest_dups,
        "w_frontier": q_w_frontier,
        "w_frontier_bloom": q_w_frontier_bloom,
        "d_dedup_exact": q_d_dedup_exact,
        "d_ngram_pairs": q_d_ngram_pairs,
        "d_minhash_pairs": q_d_minhash_pairs,
        "d_dedup_clusters": q_d_dedup_clusters,
        "d_simhash": q_d_simhash,
        "d_simhash_pairs": q_d_simhash_pairs,
        "d_textstats": q_d_textstats,
        "d_fingerprint": q_d_fingerprint,
        "d_stratified_sample": q_d_stratified_sample,
        "d_boilerplate": q_d_boilerplate,
        "e_ann_brute": q_e_ann_brute,
        "e_ann_lsh": q_e_ann_lsh,
        "e_ann_ivf": q_e_ann_ivf,
        "e_dedup_cosine": q_e_dedup_cosine,
        "t_pricing_summary": q_t_pricing_summary,
        "t_events_windows": q_t_events_windows,
        "t_top_orders": q_t_top_orders,
        # keep this dict at ≤ 50 entries: the external driver records at
        # most 50 queries (r01: 37/37 recorded; r02: 50 of 51 — the last
        # dict entry silently dropped). Guarded by a pytest.
        "m_media_features": q_m_media_features,
    }


import base64 as _b64

from warc2zim_spark import __version__ as _PKG_VERSION
from warc2zim_spark.operators.metadata import STATIC_JS_ASSETS as _SJA
from warc2zim_spark.operators.metadata import transparent_png as _tpng

# shared constants between Spark side and oracle (constants are the spec,
# not derived results — see q_w_metadata docstring)
_ILLU_B64 = _b64.b64encode(_tpng(48)).decode("ascii")
_STATIC_LENS = [len(c.encode("utf-8")) for _, c in _SJA]


def _web_sql(sf: str = "sf0.01") -> dict[str, str]:
    """DuckDB oracle SQL for the web queries (driver runs at sf0.01)."""
    rec = f"read_parquet('{WEBROOT}/{sf}/warc_records.parquet')"
    pages = f"read_parquet('{WEBROOT}/{sf}/pages.parquet')"
    pg = f"read_parquet('{WEBROOT}/{sf}/pages_golden.parquet')"
    enc = f"read_parquet('{WEBROOT}/{sf}/encoded_payloads.parquet')"
    content = f"""
      SELECT *, coalesce(urlkey_g, url) AS eff_url
      FROM {rec}
      WHERE rec_type IN ('response','revisit')
        AND url IS NOT NULL AND url <> ''
        AND (url LIKE 'http://%' OR url LIKE 'https://%')
        AND zim_path_g IS NOT NULL
    """
    edges = f"""
      SELECT src_path, tgt_path FROM (
        SELECT zim_path_g AS src_path, redirect_target_path_g AS tgt_path,
               row_number() OVER (PARTITION BY zim_path_g ORDER BY file_seq, rec_seq) AS rn
        FROM ({content})
        WHERE rec_type = 'response' AND status IN (301,302,307,308)
          AND http_location IS NOT NULL AND http_location <> ''
          AND redirect_target_path_g IS NOT NULL
          AND redirect_target_path_g <> zim_path_g
      ) WHERE rn = 1
    """
    expected = f"""
      SELECT DISTINCT zim_path_g AS zim_path FROM ({content})
      WHERE status IN (200,201,202,203)
    """
    return {
        "w_items": f"""
          WITH content AS ({content}),
          cand AS (
            SELECT zim_path_g AS zim_path, eff_url AS url, mime, status,
                   octet_length(payload) AS payload_len, file_seq, rec_seq,
                   (coalesce(mime, '') LIKE 'text/html%'
                    OR coalesce(mime, '') LIKE 'application/pdf%') AS is_front,
                   row_number() OVER (PARTITION BY zim_path_g ORDER BY file_seq, rec_seq) AS rn
            FROM content
            WHERE rec_type = 'response' AND status IN (200,201,202,203)
              AND octet_length(payload) > 0
          )
          SELECT zim_path, url, mime, status, payload_len, file_seq, rec_seq,
                 is_front
          FROM cand WHERE rn = 1 ORDER BY zim_path
        """,
        "w_items_streaming": f"""
          WITH content AS ({content}),
          cand AS (
            SELECT zim_path_g AS zim_path, eff_url AS url, mime, status,
                   octet_length(payload) AS payload_len, file_seq, rec_seq,
                   row_number() OVER (PARTITION BY zim_path_g ORDER BY file_seq, rec_seq) AS rn
            FROM content
            WHERE rec_type = 'response' AND status IN (200,201,202,203)
              AND octet_length(payload) > 0
          )
          SELECT zim_path, url, mime, status, payload_len, file_seq, rec_seq
          FROM cand WHERE rn = 1
        """,
        "w_redirect_edges": f"SELECT * FROM ({edges})",
        "w_redirects_kept": f"""
          WITH RECURSIVE edges AS ({edges}), expected AS ({expected}),
          chase(src, cur, hops) AS (
            SELECT src_path, tgt_path, 1 FROM edges
            WHERE src_path NOT IN (SELECT zim_path FROM expected)
            UNION ALL
            SELECT c.src, e.tgt_path, c.hops + 1
            FROM chase c JOIN edges e ON c.cur = e.src_path
            WHERE c.hops < 32
              AND c.cur NOT IN (SELECT zim_path FROM expected)
          )
          SELECT e.src_path, e.tgt_path FROM edges e
          WHERE EXISTS (
            SELECT 1 FROM chase c
            WHERE c.src = e.src_path
              AND c.cur IN (SELECT zim_path FROM expected)
          )
        """,
        "w_seen_set": f"SELECT zim_path FROM ({expected})",
        "w_run_summary": f"""
          SELECT min(warc_date) AS warc_start, max(warc_date) AS warc_end,
                 (SELECT regexp_extract(decode(payload), 'software:\\s*([^\\r\\n]+)', 1)
                  FROM {rec} WHERE rec_type = 'warcinfo'
                  ORDER BY file_seq, rec_seq LIMIT 1) AS software
          FROM ({content})
        """,
        "w_main_page": f"""
          WITH RECURSIVE auto AS (
            SELECT 'auto' AS kind, zim_path_g AS zim_path, eff_url AS url
            FROM ({content})
            WHERE rec_type = 'response' AND status = 200
              AND split_part(coalesce(mime, ''), ';', 1) = 'text/html'
              AND octet_length(payload) > 0
            ORDER BY file_seq, rec_seq LIMIT 1
          ),
          mp_edges AS (
            SELECT src_path, tgt_path FROM (
              SELECT zim_path_g AS src_path, redirect_target_path_g AS tgt_path,
                     row_number() OVER (PARTITION BY zim_path_g ORDER BY file_seq, rec_seq) AS rn
              FROM ({content})
              WHERE rec_type = 'response' AND status IN (301,302,307)
                AND http_location IS NOT NULL AND http_location <> ''
                AND redirect_target_path_g IS NOT NULL
                AND redirect_target_path_g <> zim_path_g
            ) WHERE rn = 1
          ),
          walk(node, depth) AS (
            SELECT 'redir.example/main-start', 0
            UNION ALL
            SELECT e.tgt_path, w.depth + 1
            FROM walk w JOIN mp_edges e ON e.src_path = w.node
            WHERE w.depth < 32
          ),
          followed AS (
            SELECT 'redirect' AS kind, node AS zim_path,
                   'https://redir.example/main-start' AS url
            FROM walk ORDER BY depth DESC LIMIT 1
          )
          SELECT kind, zim_path, url FROM auto
          UNION ALL
          SELECT kind, zim_path, url FROM followed
        """,
        "w_metadata": f"""
          WITH content AS ({content}),
          mp AS (
            SELECT url FROM content
            WHERE rec_type = 'response' AND status = 200
              AND split_part(coalesce(mime, ''), ';', 1) = 'text/html'
              AND octet_length(payload) > 0
            ORDER BY file_seq, rec_seq LIMIT 1
          ),
          g AS (
            SELECT
              coalesce(nullif(pg.title, ''), 'Untitled') AS raw_title,
              lower(split_part(split_part(pg.lang_decl, '-', 1), '_', 1)) AS lang2
            FROM {pg} pg JOIN mp ON pg.url = mp.url
          ),
          d AS (
            SELECT strftime(min(warc_date), '%Y-%m-%d') AS ds,
                   strftime(max(warc_date), '%Y-%m-%d') AS de
            FROM content
          ),
          sw AS (
            SELECT regexp_extract(decode(payload), 'software:\\s*([^\\r\\n]+)', 1) AS software
            FROM {rec}
            WHERE rec_type = 'warcinfo'
            ORDER BY file_seq, rec_seq LIMIT 1
          ),
          one AS (SELECT * FROM g, d, sw)
          SELECT 'Name' AS name, 'test' AS value FROM one
          UNION ALL SELECT 'Language', CASE
              WHEN lang2 IS NULL THEN 'eng'
              WHEN lang2 = 'en' THEN 'eng' WHEN lang2 = 'es' THEN 'spa'
              WHEN lang2 = 'fr' THEN 'fra' WHEN lang2 = 'de' THEN 'deu'
              WHEN lang2 = 'zh' THEN 'zho' ELSE 'eng' END FROM one
          UNION ALL SELECT 'Title', CASE WHEN length(raw_title) > 30
              THEN substring(raw_title, 1, 29) || '…' ELSE raw_title END FROM one
          UNION ALL SELECT 'Description', '-' FROM one
          UNION ALL SELECT 'Creator', '-' FROM one
          UNION ALL SELECT 'Publisher', 'openZIM' FROM one
          UNION ALL SELECT 'Date', de FROM one
          UNION ALL SELECT 'Illustration_48x48@1', '{_ILLU_B64}' FROM one
          UNION ALL SELECT 'Scraper', 'warc2zim-spark {_PKG_VERSION},' || software FROM one
          UNION ALL SELECT 'X-ContentDate',
              CASE WHEN ds = de THEN ds ELSE ds || ',' || de END FROM one
        """,
        "w_static_assets": f"""
          SELECT * FROM (VALUES
            ('_zim_static/wombat.js', 'text/javascript', CAST({_STATIC_LENS[0]} AS BIGINT)),
            ('_zim_static/wombatSetup.js', 'text/javascript', CAST({_STATIC_LENS[1]} AS BIGINT)),
            ('_zim_static/custom.css', 'text/css', CAST(6 AS BIGINT))
          ) AS t(zim_path, mime, payload_len)
        """,
        "w_items_from_bytes": f"""
          WITH content AS ({content}),
          cand AS (
            SELECT zim_path_g AS zim_path, eff_url AS url, mime, status,
                   octet_length(payload) AS payload_len,
                   row_number() OVER (PARTITION BY zim_path_g ORDER BY file_seq, rec_seq) AS rn
            FROM content
            WHERE rec_type = 'response' AND status IN (200,201,202,203)
              AND octet_length(payload) > 0
          )
          SELECT zim_path, url, mime, status, payload_len
          FROM cand WHERE rn = 1
        """,
        "w_rewrite_js": (
            f"SELECT zim_path, js_rw_sha, is_module FROM "
            f"read_parquet('{WEBROOT}/{sf}/js_golden.parquet')"
        ),
        "w_illustration": f"""
          WITH ranked AS (
            SELECT icon_url, fmt, width, height,
              row_number() OVER (ORDER BY
                (CASE WHEN least(width, height) = 48 THEN 2
                      WHEN least(width, height) > 48 THEN 1 ELSE 0 END) DESC,
                (CASE WHEN least(width, height) = 48 THEN 0
                      ELSE least(width, height) END) DESC,
                icon_url ASC) AS rn
            FROM read_parquet('{WEBROOT}/{sf}/icons_fixture.parquet')
          )
          SELECT icon_url, fmt, width, height FROM ranked WHERE rn = 1
        """,
        "w_jsonp": f"""
          WITH x AS (
            SELECT case_id, url, content,
              regexp_extract(url, '^[?].*(?i:callback|jsonp)=([^&]+)', 1) AS cb,
              regexp_extract(content,
                '^(?:\\s*(?:(?:/\\*[^*]*\\*/)|(?://[^\\n]+[\\n])))*\\s*([\\w.]+)\\(([{{\\[])',
                1) AS fn
            FROM read_parquet('{WEBROOT}/{sf}/jsonp_cases.parquet')
          )
          SELECT case_id,
            CASE WHEN cb <> '' AND cb <> '?' AND fn <> ''
                 THEN cb || fn ELSE content END AS rewritten
          FROM x
        """,
        "w_expected_full": f"""
          WITH RECURSIVE edges AS ({edges}), expected AS ({expected}),
          chase(src, cur, hops) AS (
            SELECT src_path, tgt_path, 1 FROM edges
            WHERE src_path NOT IN (SELECT zim_path FROM expected)
            UNION ALL
            SELECT c.src, e.tgt_path, c.hops + 1
            FROM chase c JOIN edges e ON c.cur = e.src_path
            WHERE c.hops < 32
              AND c.cur NOT IN (SELECT zim_path FROM expected)
          )
          SELECT zim_path FROM expected
          UNION
          SELECT e.src_path AS zim_path FROM edges e
          WHERE EXISTS (
            SELECT 1 FROM chase c
            WHERE c.src = e.src_path
              AND c.cur IN (SELECT zim_path FROM expected)
          )
        """,
        "w_include_domains": f"""
          WITH content AS ({content}),
          cand AS (
            SELECT zim_path_g AS zim_path, eff_url AS url, status, file_seq, rec_seq,
                   row_number() OVER (PARTITION BY zim_path_g ORDER BY file_seq, rec_seq) AS rn
            FROM content
            WHERE rec_type = 'response' AND status IN (200,201,202,203)
              AND octet_length(payload) > 0
              AND lower(split_part(split_part(split_part(eff_url, '://', 2), '/', 1), ':', 1))
                  LIKE '%statuses.example'
          )
          SELECT zim_path, url, status FROM cand WHERE rn = 1
        """,
        "w_pairing_urlkey": f"""
          SELECT file_seq, rec_seq, urlkey_g AS urlkey FROM {rec}
          WHERE rec_type = 'response' AND urlkey_g IS NOT NULL
        """,
        "w_rewrite_mode": f"""
          WITH content AS ({content}),
          c AS (
            SELECT file_seq, rec_seq, zim_path_g AS zim_path,
                   split_part(coalesce(mime, ''), ';', 1) AS m,
                   lower(trim(resourcetype)) AS rt,
                   resourcetype IS NULL OR trim(resourcetype) = '' AS no_rt,
                   coalesce(req_method, 'GET') AS method
            FROM content WHERE rec_type = 'response'
          )
          SELECT file_seq, rec_seq, zim_path,
            CASE WHEN no_rt THEN
              CASE
                WHEN m = 'text/html' THEN (CASE WHEN method = 'POST' THEN NULL ELSE 'html' END)
                WHEN m = 'text/css' THEN 'css'
                WHEN m IN ('text/javascript','application/javascript','application/x-javascript')
                  THEN (CASE WHEN zim_path LIKE '%.json' THEN 'json' ELSE 'javascript' END)
                WHEN m = 'application/json' THEN 'json'
                ELSE NULL END
            ELSE
              CASE
                WHEN rt IN ('document','xhr','fetch') AND m = 'text/html'
                  THEN (CASE WHEN method = 'GET' THEN 'html' ELSE NULL END)
                WHEN rt = 'stylesheet' THEN 'css'
                WHEN rt IN ('script','fetch','other','xhr','manifest')
                     AND (m = 'application/json' OR zim_path LIKE '%.json') THEN 'json'
                WHEN rt IN ('script','other','xhr')
                     AND m IN ('text/javascript','application/javascript','application/x-javascript')
                  THEN 'javascript'
                ELSE NULL END
            END AS rewrite_mode
          FROM c
        """,
        "w_decode": f"SELECT case_id, expected_text AS decoded FROM {enc}",
        "w_quarantine": f"SELECT case_id FROM {enc} WHERE expect_error",
        # failing set re-derived from raw record columns: a text-mode row
        # whose DECLARED charset is the unknown codec (payload carries
        # charset="bogus-enc" — matched hex-wise, payload is a BLOB) or
        # whose HTTP header charset is unknown; stage from the mime, reason
        # text reconstructed from the codec name
        "w_fails": f"""
          WITH c AS ({content}),
          flagged AS (
            SELECT zim_path_g AS zim_path, eff_url AS url, file_seq, rec_seq,
                   split_part(coalesce(mime, ''), ';', 1) AS m,
                   contains(to_hex(payload),
                            '{('charset="bogus-enc"').encode().hex().upper()}')
                     AS declared_bogus,
                   http_charset
            FROM c WHERE rec_type = 'response'
          )
          SELECT zim_path, url, file_seq, rec_seq,
                 CASE WHEN m = 'text/html' THEN 'html'
                      WHEN m = 'text/css' THEN 'css'
                      WHEN m = 'application/json' THEN 'json'
                      ELSE 'javascript' END AS stage,
                 'LookupError: unknown encoding: ' ||
                   CASE WHEN declared_bogus THEN 'bogus-enc'
                        ELSE http_charset END AS reason
          FROM flagged
          WHERE declared_bogus OR http_charset = 'bogus-charset'
        """,
        "w_icon_rank": """
          WITH icons(icon_id, width, height) AS (VALUES
            ('i48',48,48), ('i48x96',48,96), ('i96',96,96), ('i49',49,49),
            ('i512',512,512), ('i47',47,47), ('i16',16,16), ('i32x100',100,32)),
          t AS (SELECT icon_id, least(width, height) AS m FROM icons)
          SELECT icon_id, row_number() OVER (ORDER BY
            (CASE WHEN m = 48 THEN 2 WHEN m > 48 THEN 1 ELSE 0 END) DESC,
            (CASE WHEN m = 48 THEN 0 ELSE m END) DESC,
            icon_id ASC) AS pref_rank
          FROM t
        """,
        "w_frontier": (
            f"SELECT wave, url, surt_key, host, hops, round(score, 9) AS score "
            f"FROM read_parquet('{WEBROOT}/{sf}/golden_frontier.parquet')"
        ),
"w_frontier_bloom": (
            f"SELECT wave, url, surt_key, host, hops, round(score, 9) AS score "
            f"FROM read_parquet('{WEBROOT}/{sf}/golden_frontier.parquet')"
        ),
        "w_text_extract": f"SELECT url, text FROM {pages}",
        "w_page_meta": f"SELECT url, title, lang_decl, n_links FROM {pg}",
        "w_icons": f"SELECT url, unnest(icons) AS icon_href FROM {pg}",
        "w_rewrite_html": (
            f"SELECT url, html_rw_sha FROM "
            f"read_parquet('{WEBROOT}/{sf}/rewrite_golden.parquet')"
        ),
        "w_rewrite_html_full": (
            f"SELECT url, title_rw, html_full_sha FROM "
            f"read_parquet('{WEBROOT}/{sf}/rewrite_golden.parquet')"
        ),
        "w_js_modules": (
            f"SELECT DISTINCT url, unnest(js_modules) AS module_src FROM {pg}"
        ),
        "w_aliases": f"""
          WITH content AS ({content}),
          revisits AS (
            SELECT zim_path_g AS alias_path, refers_to_path_g, file_seq, rec_seq,
                   row_number() OVER (PARTITION BY zim_path_g ORDER BY file_seq, rec_seq) AS rn
            FROM content
            WHERE rec_type = 'revisit' AND refers_to_url IS NOT NULL
              AND refers_to_url <> url
          ),
          items AS (
            SELECT zim_path_g AS zim_path,
                   row_number() OVER (PARTITION BY zim_path_g ORDER BY file_seq, rec_seq) AS rn
            FROM content
            WHERE rec_type = 'response' AND status IN (200,201,202,203)
              AND octet_length(payload) > 0
          ),
          rtargets AS (
            SELECT alias_path, refers_to_path_g AS target_path
            FROM revisits WHERE rn = 1 AND refers_to_path_g IS NOT NULL
          )
          SELECT alias_path, target_path FROM rtargets
          WHERE alias_path NOT IN (SELECT DISTINCT zim_path FROM items)
        """,
        "w_status_gate": f"""
          SELECT status, count(*) AS n,
                 max(CASE WHEN status IN (200,201,202,203,301,302,307,308)
                     THEN 1 ELSE 0 END) AS processable
          FROM ({content}) WHERE rec_type = 'response'
          GROUP BY status ORDER BY status
        """,
        "m_media_features": f"""
          SELECT media_id, kind, n_bytes_g AS n_bytes,
                 width_g AS width, height_g AS height
          FROM read_parquet('{WEBROOT}/{sf}/media_fixture.parquet')
        """,
        "w_digest_dups": f"""
          SELECT payload_digest, count(*) AS n_copies,
                 min(file_seq) AS orig_file_seq,
                 min(rec_seq) AS orig_rec_seq
          FROM {rec}
          WHERE rec_type = 'response' AND payload_digest IS NOT NULL
          GROUP BY payload_digest HAVING count(*) > 1
        """,
    }


def _doc_sql(sf: str = "sf0.01") -> dict[str, str]:
    dg = f"read_parquet('{WEBROOT}/{sf}/doc_golden.parquet')"
    grams = """
      SELECT doc_id,
             CASE WHEN len(toks) = 0 THEN []
                  WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                  ELSE list_distinct(list_transform(
                         range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                       ))
             END AS bag
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'), t -> t <> '') AS toks
        FROM documents
      )
    """
    return {
        "d_dedup_exact": """
          SELECT sha256(text) AS content_hash, count(*) AS n_docs,
                 min(doc_id) AS keep_id
          FROM documents GROUP BY sha256(text) HAVING count(*) > 1
        """,
        "d_ngram_pairs": f"""
          WITH g AS ({grams})
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 round(CASE WHEN len(list_distinct(a.bag || b.bag)) = 0 THEN 1.0
                       ELSE len(list_intersect(a.bag, b.bag))
                            / CAST(len(list_distinct(a.bag || b.bag)) AS DOUBLE) END, 6) AS jaccard
          FROM g a JOIN g b ON a.doc_id < b.doc_id
          WHERE (CASE WHEN len(list_distinct(a.bag || b.bag)) = 0 THEN 1.0
                 ELSE len(list_intersect(a.bag, b.bag))
                      / CAST(len(list_distinct(a.bag || b.bag)) AS DOUBLE) END) >= 0.8
        """,
        "d_minhash_pairs": f"""
          WITH g AS ({grams})
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 round(CASE WHEN len(list_distinct(a.bag || b.bag)) = 0 THEN 1.0
                       ELSE len(list_intersect(a.bag, b.bag))
                            / CAST(len(list_distinct(a.bag || b.bag)) AS DOUBLE) END, 6) AS jaccard
          FROM g a JOIN g b ON a.doc_id < b.doc_id
          WHERE (CASE WHEN len(list_distinct(a.bag || b.bag)) = 0 THEN 1.0
                 ELSE len(list_intersect(a.bag, b.bag))
                      / CAST(len(list_distinct(a.bag || b.bag)) AS DOUBLE) END) >= 0.8
        """,
        # transitive closure via recursive CTE: min reachable id per node —
        # independent of the engine's label-propagation loop
        "d_dedup_clusters": f"""
          WITH RECURSIVE g AS ({grams}),
          pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM g a JOIN g b ON a.doc_id < b.doc_id
            WHERE (CASE WHEN len(list_distinct(a.bag || b.bag)) = 0 THEN 1.0
                   ELSE len(list_intersect(a.bag, b.bag))
                        / CAST(len(list_distinct(a.bag || b.bag)) AS DOUBLE) END) >= 0.8
          ),
          edges AS (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs
          ),
          reach(id, r) AS (
            SELECT DISTINCT a, a FROM edges
            UNION
            SELECT x.id, e.b FROM reach x JOIN edges e ON e.a = x.r
          )
          SELECT id AS doc_id, min(r) AS cluster_id
          FROM reach GROUP BY id ORDER BY doc_id
        """,
        "d_simhash": f"SELECT doc_id, simhash FROM {dg}",
        "d_simhash_pairs": f"""
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 bit_count(xor(a.simhash, b.simhash)) AS hamming
          FROM {dg} a JOIN {dg} b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        # combined per-doc stats: lang_pred from the sequential kernel golden,
        # quality + token columns independently re-derived in SQL
        "d_textstats": f"""
          SELECT d.doc_id,
                 g.lang_pred,
                 length(coalesce(d.text, '')) AS n_chars,
                 CASE WHEN trim(coalesce(d.text, '')) = '' THEN 0
                      ELSE len(string_split_regex(trim(coalesce(d.text, '')), '\\s+')) END AS n_tokens,
                 round(length(regexp_replace(coalesce(d.text, ''), '[\\w\\s]', '', 'g'))
                       / CAST(CASE WHEN length(coalesce(d.text, '')) > 0
                              THEN length(coalesce(d.text, '')) ELSE 1 END AS DOUBLE), 6) AS punct_ratio,
                 round(length(regexp_replace(coalesce(d.text, ''), '[^A-Za-z]', '', 'g'))
                       / CAST(CASE WHEN length(coalesce(d.text, '')) > 0
                              THEN length(coalesce(d.text, '')) ELSE 1 END AS DOUBLE), 6) AS alpha_ratio,
                 CASE WHEN trim(coalesce(d.text, '')) = '' THEN 0
                      ELSE len(string_split_regex(trim(coalesce(d.text, '')), '\\s+')) END AS n_tokens_ws,
                 round(CASE WHEN len(list_filter(list_transform(
                          string_split(coalesce(d.text, ''), chr(10)), x -> trim(x)), x -> x <> '')) = 0
                       THEN 0.0
                       ELSE 1.0 - len(list_distinct(list_filter(list_transform(
                              string_split(coalesce(d.text, ''), chr(10)), x -> trim(x)), x -> x <> '')))
                            / CAST(len(list_filter(list_transform(
                              string_split(coalesce(d.text, ''), chr(10)), x -> trim(x)), x -> x <> '')) AS DOUBLE)
                       END, 6) AS dup_line_frac,
                 round(CASE WHEN trim(coalesce(d.text, '')) = '' THEN 0.0
                       ELSE 1.0 - len(list_distinct(string_split_regex(trim(coalesce(d.text, '')), '\\s+')))
                            / CAST(len(string_split_regex(trim(coalesce(d.text, '')), '\\s+')) AS DOUBLE)
                       END, 6) AS dup_token_frac
          FROM documents d JOIN {dg} g ON d.doc_id = g.doc_id
        """,
        # the approximate indexes' neighbor sets are not SQL-derivable, but
        # their recall CONTRACT is: seeded hashing/KMeans → deterministic
        # recall, so the oracle pins (every query answered, k results,
        # bound met) — a regression below the bound turns the row red
        "e_ann_lsh": """
          SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_results,
                 true AS meets_recall
          FROM embeddings WHERE vec_id < 8
        """,
        "e_ann_ivf": """
          SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_results,
                 true AS meets_recall
          FROM embeddings WHERE vec_id < 8
        """,
        "d_fingerprint": f"SELECT doc_id, unnest(fingerprint) AS fp FROM {dg}",
        # structurally independent re-derivation: DuckDB's own md5() over the
        # same salted key string + QUALIFY window — not a replay of Spark rows
        "d_stratified_sample": """
          SELECT doc_id, lang
          FROM documents
          QUALIFY row_number() OVER (
            PARTITION BY lang
            ORDER BY md5('w2zs-sample' || ':' || '42' || ':' || CAST(doc_id AS VARCHAR)),
                     doc_id
          ) <= 5
        """,
        "d_boilerplate": f"""
          WITH aug AS (
            SELECT doc_id,
                   concat_ws(chr(10), text,
                     CASE WHEN doc_id % 3 = 0 THEN '{_BP_FOOTER}' END,
                     CASE WHEN doc_id % 5 = 0 THEN '{_BP_BANNER}' END) AS text
            FROM documents
          ),
          paras AS (
            SELECT doc_id, trim(p) AS para
            FROM aug, unnest(string_split(coalesce(text, ''), chr(10))) AS t(p)
            WHERE length(trim(p)) >= 20
          )
          SELECT para, count(DISTINCT doc_id) AS n_docs,
                 count(*) AS n_occurrences
          FROM paras GROUP BY para
          HAVING count(DISTINCT doc_id) >= 3
        """,
        "e_ann_brute": """
          WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 8),
          scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   round(list_cosine_similarity(q.q_vec::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine
            FROM q JOIN embeddings c ON c.vec_id <> q.query_id
          ),
          ranked AS (
            SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored
          )
          SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 10
        """,
        "e_dedup_cosine": """
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.5
        """,
    }


def _tpch_sql() -> dict[str, str]:
    return {
        "t_pricing_summary": """
          SELECT l_returnflag, l_linestatus,
                 round(sum(l_quantity), 2) AS sum_qty,
                 round(sum(l_extendedprice), 2) AS sum_base_price,
                 round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                 round(avg(l_quantity), 6) AS avg_qty,
                 count(*) AS count_order
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '1998-09-02'
          GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus
        """,
        "t_top_orders": """
          SELECT l_orderkey, c_mktsegment AS mktsegment, revenue
          FROM (
            SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem GROUP BY l_orderkey
          ) r
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          ORDER BY revenue DESC, l_orderkey ASC LIMIT 20
        """,
        "t_events_windows": """
          SELECT event_id, user_id,
                 row_number() OVER w AS seq_no,
                 epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles — every queries() entry now has one. e_ann_lsh /
    e_ann_ivf are checked via their deterministic recall bound (raw
    neighbor lists additionally pinned in tests/test_training_ops.py);
    m_media_features via construction-time container dimensions (the pixel
    feature vector stays a documented seam, excluded from the compare);
    d_simhash_pairs via a brute-force all-pairs oracle over the sequential
    simhash goldens."""
    out: dict[str, str] = {}
    out.update(_web_sql("sf0.01"))
    out.update(_doc_sql("sf0.01"))
    out.update(_tpch_sql())
    return out
