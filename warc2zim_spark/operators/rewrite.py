"""Content-rewriting stage (pass 2's transform): HTML/CSS URL re-pointing
against the pass-1 seen-set, plus ES-module discovery (C3/C4/C5 feedback).

The seen-set rides to executors as a broadcast frozenset in exact mode (test
scale). At 10^10 paths the exact set cannot broadcast — the partitioned
bloom (frontier/seenfilter.py) replaces it: candidates hash-partition by key
and probe partition-local bitmaps; a bloom false positive rewrites a link to
a path that won't exist, the same failure class the reference tolerates via
``missing_zim_paths`` (rewriting.py:81), so the FP budget is set there.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from warc2zim_spark.functions import udfs
from warc2zim_spark.kernels import urlrewrite as _urlrewrite


def make_rewrite_html_udf(spark: SparkSession, seen: DataFrame):
    """→ pandas UDF (html_str, base_url) → rewritten html, closed over a
    broadcast of the seen ZimPath set (exact mode)."""
    keys = frozenset(r[0] for r in seen.select("zim_path").collect())
    bc = spark.sparkContext.broadcast(keys)

    @pandas_udf(StringType())
    def rewrite_html(htmls: pd.Series, base_urls: pd.Series) -> pd.Series:
        seen_keys = bc.value
        out = []
        for h, u in zip(htmls, base_urls):
            if h is None or u is None:
                out.append(None)
                continue
            try:
                out.append(_urlrewrite.rewrite_html_links(h, u, seen_keys))
            except Exception:  # noqa: BLE001 — S10: row fails, task survives
                out.append(None)
        return pd.Series(out)

    return rewrite_html


def rewritten_pages(spark: SparkSession, pages: DataFrame, seen: DataFrame) -> DataFrame:
    """(url, html_rw) — decoded page HTML with internal links re-pointed.

    Exact broadcast mode: test scale / ≲10^7 paths where the key set fits
    the driver. The production path at 10^10 paths is
    ``rewritten_pages_distributed`` below."""
    rewrite_udf = make_rewrite_html_udf(spark, seen)
    html_str = udfs.decode_payload(
        F.col("html"), F.lit(None).cast("string"), F.lit("html")
    )
    return pages.select(
        "url", rewrite_udf(html_str, F.col("url")).alias("html_rw")
    )


@pandas_udf(StringType())
def _rewrite_with_row_seen(
    htmls: pd.Series, base_urls: pd.Series, seen_lists: pd.Series
) -> pd.Series:
    """(html, base_url, row-local confirmed targets[]) → rewritten html."""
    out = []
    for h, u, s in zip(htmls, base_urls, seen_lists):
        if h is None or u is None:
            out.append(None)
        else:
            keys = frozenset(s) if s is not None else frozenset()
            try:
                out.append(_urlrewrite.rewrite_html_links(h, u, keys))
            except Exception:  # noqa: BLE001 — S10: row fails, task survives
                out.append(None)
    return pd.Series(out)


def rewritten_pages_distributed(
    pages: DataFrame,
    seen: DataFrame,
    mode: str = "exact",
    bloom: DataFrame | None = None,
    num_partitions: int = 32,
) -> DataFrame:
    """(url, html_rw) with **no driver collect and no whole-set broadcast** —
    the 10^10-path shape.

    Three relational passes:

    1. extract: each page emits the distinct canonical keys its links would
       probe (``extract_link_targets`` — provably the same keys
       ``rewrite_html_links`` checks), exploded to (url, target) rows.
    2. probe: membership against the seen set — ``mode="exact"`` is a
       semi-join (shuffles only the narrow key rows, never HTML);
       ``mode="bloom"`` probes the partitioned bitmap cogroup-side
       (seenfilter.probe_bloom, keep="hit") so the seen set never
       materializes as rows at all. A bloom FP re-points a link to a missing
       path — the reference's tolerated ``missing_zim_paths`` class.
    3. rewrite: per-page confirmed targets are collected into a row-local
       array and joined back; the UDF probes that tiny frozenset.

    The only wide exchange touching HTML bytes is the final join back to
    ``pages`` on url; pre-bucketing the page table by url makes it
    shuffle-free. Per-page link fan-out is bounded (~10^2), so the
    collect_set array stays small."""
    html_str = udfs.decode_payload(
        F.col("html"), F.lit(None).cast("string"), F.lit("html")
    )
    candidates = (
        pages.select(
            "url",
            F.explode(udfs.extract_link_targets(html_str, F.col("url"))).alias(
                "target"
            ),
        )
    )
    if mode == "exact":
        # no distinct on the probe set (r06): semi-join existence tests are
        # invariant to duplicate build keys; the dedup was one extra shuffle
        confirmed = candidates.join(
            seen.select(F.col("zim_path").alias("target")),
            "target",
            "left_semi",
        )
    elif mode == "bloom":
        from warc2zim_spark.frontier import seenfilter

        flt = bloom if bloom is not None else seenfilter.build_bloom(
            seen.select(F.col("zim_path")), key_col="zim_path",
            num_partitions=num_partitions,
        )
        confirmed = seenfilter.probe_bloom(
            candidates, flt, key_col="target",
            num_partitions=num_partitions, keep="hit",
        )
    else:
        raise ValueError(f"mode must be 'exact' or 'bloom', got {mode!r}")

    page_seen = confirmed.groupBy("url").agg(
        F.sort_array(F.collect_set("target")).alias("_seen_targets")
    )
    return (
        pages.join(page_seen, "url", "left")
        .select(
            "url",
            _rewrite_with_row_seen(
                html_str,
                F.col("url"),
                F.coalesce(
                    F.col("_seen_targets"), F.array().cast("array<string>")
                ),
            ).alias("html_rw"),
        )
    )


_FULL_SCHEMA = "title string, html_full string"


def _rewrite_full_with_row_seen(custom_css: bool):
    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf(_FULL_SCHEMA)
    def inner(
        htmls: pd.Series, base_urls: pd.Series, seen_lists: pd.Series
    ) -> pd.DataFrame:
        titles, outs = [], []
        for h, u, s in zip(htmls, base_urls, seen_lists):
            if h is None or u is None:
                titles.append(None)
                outs.append(None)
            else:
                keys = frozenset(s) if s is not None else frozenset()
                try:
                    t, o = _urlrewrite.rewrite_html_full(
                        h, u, keys, custom_css=custom_css
                    )
                except Exception:  # noqa: BLE001 — S10 guard
                    t, o = None, None
                titles.append(t)
                outs.append(o)
        return pd.DataFrame({"title": titles, "html_full": outs})

    return inner


def rewritten_pages_full(
    pages: DataFrame,
    seen: DataFrame,
    mode: str = "exact",
    custom_css: bool = False,
    num_partitions: int = 32,
) -> DataFrame:
    """C3 full fidelity, distributed: (url, title, html_full) — link
    re-pointing + wombat head-inserts + title-from-rewriter (items.py:46-56).
    Same no-broadcast membership shape as rewritten_pages_distributed."""
    html_str = udfs.decode_payload(
        F.col("html"), F.lit(None).cast("string"), F.lit("html")
    )
    candidates = pages.select(
        "url",
        F.explode(udfs.extract_link_targets(html_str, F.col("url"))).alias("target"),
    )
    if mode == "exact":
        # same semi-join duplicate-invariance: no distinct (r06)
        confirmed = candidates.join(
            seen.select(F.col("zim_path").alias("target")),
            "target", "left_semi",
        )
    else:
        from warc2zim_spark.frontier import seenfilter

        flt = seenfilter.build_bloom(
            seen.select(F.col("zim_path")), key_col="zim_path",
            num_partitions=num_partitions,
        )
        confirmed = seenfilter.probe_bloom(
            candidates, flt, key_col="target",
            num_partitions=num_partitions, keep="hit",
        )
    page_seen = confirmed.groupBy("url").agg(
        F.sort_array(F.collect_set("target")).alias("_seen_targets")
    )
    full = _rewrite_full_with_row_seen(custom_css)
    return (
        pages.join(page_seen, "url", "left")
        .select(
            "url",
            full(
                html_str,
                F.col("url"),
                F.coalesce(F.col("_seen_targets"), F.array().cast("array<string>")),
            ).alias("_r"),
        )
        .select("url", F.col("_r.title").alias("title"),
                F.col("_r.html_full").alias("html_full"))
    )


@pandas_udf(StringType())
def _rewrite_js_with_row_seen(
    contents: pd.Series, base_urls: pd.Series,
    seen_lists: pd.Series, is_modules: pd.Series,
) -> pd.Series:
    from warc2zim_spark.kernels import jsrewrite as _js

    out = []
    for c, u, s, m in zip(contents, base_urls, seen_lists, is_modules):
        if c is None or u is None:
            out.append(None)
        else:
            keys = frozenset(s) if s is not None else frozenset()
            try:
                out.append(_js.rewrite_js(c, u, keys, is_module=bool(m)))
            except Exception:  # noqa: BLE001 — S10 guard
                out.append(None)
    return pd.Series(out)


def rewritten_js(
    js_rows: DataFrame, seen: DataFrame, module_paths: DataFrame
) -> DataFrame:
    """C5 — JS rewrite consumption (rewriting.py:115-118, 255-262): rows
    classified ``javascript`` whose zim_path ∈ discovered modules get import
    re-pointing, the rest the wombat wrap.

    ``js_rows``: (zim_path, url, js_text). ``seen``: (zim_path) item set.
    ``module_paths``: (module_path) — js_module_paths output, the two-round
    feedback's set (converter.py:227).

    Shape: the module set is the join key side of a left_semi-derived flag
    (tiny vs corpus — only script tags referenced as type=module); per-row
    seen lists ride in via the same extract → semi-join → collect-back
    pattern as rewritten_pages_distributed, so nothing broadcasts the
    item set."""
    flagged = js_rows.join(
        module_paths.select(
            F.col("module_path").alias("zim_path"), F.lit(True).alias("is_module")
        ).distinct(),
        "zim_path",
        "left",
    ).withColumn("is_module", F.coalesce(F.col("is_module"), F.lit(False)))
    candidates = flagged.filter(F.col("is_module")).select(
        "zim_path",
        F.explode(
            udfs.extract_js_import_targets(F.col("js_text"), F.col("url"))
        ).alias("target"),
    )
    # semi-join: duplicate build keys cannot change the result — no distinct
    confirmed = candidates.join(
        seen.select(F.col("zim_path").alias("target")),
        "target",
        "left_semi",
    )
    row_seen = confirmed.groupBy("zim_path").agg(
        F.sort_array(F.collect_set("target")).alias("_seen_targets")
    )
    return (
        flagged.join(row_seen, "zim_path", "left")
        .select(
            "zim_path",
            "url",
            _rewrite_js_with_row_seen(
                F.col("js_text"),
                F.col("url"),
                F.coalesce(F.col("_seen_targets"), F.array().cast("array<string>")),
                F.col("is_module"),
            ).alias("js_rw"),
            "is_module",
        )
    )


def js_module_paths(pages: DataFrame) -> DataFrame:
    """C5 round-1 discovery: ES-module srcs found during the HTML pass,
    resolved + canonicalized — the ``js_modules`` set that flags the JS
    rewrite's isModule option (converter.py:227, rewriting.py:115-118)."""
    html_str = udfs.decode_payload(
        F.col("html"), F.lit(None).cast("string"), F.lit("html")
    )
    meta = udfs.extract_meta(html_str)
    return (
        # *_outer: plain explode's implicit non-empty guard doubles the
        # decode+extract HTML parse over the full page scan; null module_src
        # rows resolve to null module_url and die in the existing filter
        pages.select("url", F.explode_outer(meta["js_modules"]).alias("module_src"))
        .withColumn("module_url", udfs.resolve_url(F.col("url"), F.col("module_src")))
        .filter(F.col("module_url").isNotNull())
        .withColumn("module_path", udfs.surt_key(F.col("module_url")))
        .filter(F.col("module_path").isNotNull())
        .select("url", "module_src", "module_path")
        .distinct()
    )
