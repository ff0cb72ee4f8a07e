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
        return pd.Series(
            [
                _urlrewrite.rewrite_html_links(h, u, seen_keys)
                if h is not None and u is not None
                else None
                for h, u in zip(htmls, base_urls)
            ]
        )

    return rewrite_html


def rewritten_pages(spark: SparkSession, pages: DataFrame, seen: DataFrame) -> DataFrame:
    """(url, html_rw) — decoded page HTML with internal links re-pointed."""
    rewrite_udf = make_rewrite_html_udf(spark, seen)
    html_str = udfs.decode_payload(
        F.col("html"), F.lit(None).cast("string"), F.lit("html")
    )
    return pages.select(
        "url", rewrite_udf(html_str, F.col("url")).alias("html_rw")
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
        pages.select("url", F.explode(meta["js_modules"]).alias("module_src"))
        .withColumn("module_url", udfs.resolve_url(F.col("url"), F.col("module_src")))
        .filter(F.col("module_url").isNotNull())
        .withColumn("module_path", udfs.surt_key(F.col("module_url")))
        .filter(F.col("module_path").isNotNull())
        .select("url", "module_src", "module_path")
        .distinct()
    )
