"""S10 full — per-record failure isolation (``--continue-on-error``).

Reference semantics (converter.py:411-437, main.py:92-103): every record
flows through a try/except; a failure logs the record URL, optionally dumps
the payload to a fails directory, and either skips just that record
(``--continue-on-error``) or aborts the whole run.

Engine shape: a poisoned record must NEVER fail a Spark task — one bad row
would kill a 10^10-record job and a retry would deterministically hit it
again. Kernels raise inside a per-row guard in the Arrow UDF; the captured
error becomes a quarantine row ``(zim_path, url, file_seq, rec_seq, stage,
reason)``; the abort-vs-continue policy is applied driver-side after the
fails sink is written (plans/pipeline.py). The concrete raising class in
this environment is a declared/HTTP charset naming an unknown codec —
``LookupError`` through the decode cascade, the same exception the
reference's errors=replace decode raises (utils.py:155-219).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from warc2zim_spark.functions.expressions import rewrite_mode_expr
from warc2zim_spark.kernels import decode as _decode


def make_decode_error_udf(extra_aliases: dict[str, str] | None = None):
    """Per-row failure capture for the decode stage: null on success, else
    ``ExceptionClass: message`` (truncated). The guard is ``except
    Exception`` on purpose — ANY kernel failure must become data, not a
    task failure. ``extra_aliases`` is the per-run user alias table
    (``--encoding-aliases``, reference main.py:144-158): an alias the user
    maps turns a would-be failure into a successful decode."""

    @pandas_udf(StringType())
    def decode_error(
        payloads: pd.Series, http_charsets: pd.Series, modes: pd.Series
    ) -> pd.Series:
        out = []
        for payload, charset, mode in zip(payloads, http_charsets, modes):
            if payload is None:
                out.append(None)
                continue
            try:
                _decode.to_string(
                    bytes(payload),
                    charset if charset is not None else None,
                    ignore_content_header_charsets=(mode != "html"),
                    extra_aliases=extra_aliases,
                )
                out.append(None)
            except Exception as exc:  # noqa: BLE001 — the guard IS the feature
                out.append(f"{type(exc).__name__}: {exc}"[:200])
        return pd.Series(out)

    return decode_error


decode_error = make_decode_error_udf()


def quarantined_records(
    content_with_payload: DataFrame,
    encoding_aliases: dict[str, str] | None = None,
) -> DataFrame:
    """(zim_path, url, file_seq, rec_seq, stage, reason) — response records
    whose text-rewrite stage fails. ``stage`` is the C1 rewrite mode (only
    text modes decode; binary passthrough records cannot fail here)."""
    mode = rewrite_mode_expr(
        F.split(F.coalesce(F.col("mime"), F.lit("")), ";").getItem(0),
        F.col("resourcetype"),
        F.col("zim_path"),
        F.col("p_method"),
    )
    err_udf = (
        decode_error
        if encoding_aliases is None
        else make_decode_error_udf(encoding_aliases)
    )
    return (
        content_with_payload.filter(F.col("rec_type") == "response")
        .withColumn("stage", mode)
        .filter(F.col("stage").isNotNull())
        .withColumn(
            "reason",
            err_udf(F.col("payload"), F.col("http_charset"), F.col("stage")),
        )
        .filter(F.col("reason").isNotNull())
        .select(
            "zim_path",
            F.col("effective_url").alias("url"),
            "file_seq",
            "rec_seq",
            "stage",
            "reason",
        )
    )


def items_excluding_fails(items: DataFrame, fails: DataFrame) -> DataFrame:
    """Drop items whose WINNING record is quarantined (the reference skips
    exactly the failing record: a path whose first-wins winner failed never
    reaches the ZIM; a different path's failure doesn't touch it). Keyed on
    (zim_path, file_seq, rec_seq) so only the winner's failure excludes."""
    return items.join(
        fails.select("zim_path", "file_seq", "rec_seq"),
        ["zim_path", "file_seq", "rec_seq"],
        "left_anti",
    )
