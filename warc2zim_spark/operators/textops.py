"""Text-analysis operators over document tables: language-ID, quality
scoring, token counting, fingerprinting — the per-document stage of a
training-data pipeline. Quality/token-count are pure JVM expressions
(expressions.py); language-ID and fingerprints are Arrow UDFs over the
frozen kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warc2zim_spark.functions import udfs
from warc2zim_spark.functions.expressions import quality_columns, token_count_ws


def text_profile(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, punct_ratio, alpha_ratio) — JVM-only."""
    q = quality_columns(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        q["n_chars"].alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        q["punct_ratio"].alias("punct_ratio"),
        q["alpha_ratio"].alias("alpha_ratio"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        token_count_ws(F.col(text_col)).cast("long").alias("n_tokens_ws"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        udfs.langid(F.col(text_col)).alias("lang_pred"),
    )


def text_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass combined per-document stats: language-ID + quality profile +
    whitespace token count — a single narrow projection (no joins, one scan;
    the langid Arrow UDF is the only Python piece, everything else stays in
    whole-stage codegen)."""
    q = quality_columns(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        udfs.langid(F.col(text_col)).alias("lang_pred"),
        q["n_chars"].alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        q["punct_ratio"].alias("punct_ratio"),
        q["alpha_ratio"].alias("alpha_ratio"),
        token_count_ws(F.col(text_col)).cast("long").alias("n_tokens_ws"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Winnowing fingerprints, exploded to (doc_id, fp) for join-based
    containment detection."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(udfs.fingerprint(F.col(text_col))).alias("fp"),
    )
