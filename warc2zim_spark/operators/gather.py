"""Pass-1 aggregates (the reference's gather pass, converter.py:480-714).

All pure DataFrame aggregations over the narrow (payload-free) projection:
A1 date range, A3 expected/seen set, A4 main-page selection, A5 warcinfo
software. Pass-1's product — the expected-item set — feeds both the redirect
fixpoint (operators/redirects.py) and the URL-rewriting seen-filter
(frontier/seenfilter.py holds the at-scale bloom variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warc2zim_spark.functions.expressions import (
    is_processable_status,
    is_redirect_status,
)
from warc2zim_spark.kernels.status import MAIN_PAGE_REDIRECT_STATUSES


def date_range(content: DataFrame) -> DataFrame:
    """A1 — min/max WARC-Date over response/revisit rows (converter.py:491-497
    runs right after the rec_type check, before url/status filters — but our
    ``content`` stream already applies P6/P12; the reference's X-ContentDate
    uses the same gather loop, so we pin to the content stream)."""
    return content.agg(
        F.min("warc_date").alias("warc_start"),
        F.max("warc_date").alias("warc_end"),
    )


def expected_items(content: DataFrame) -> DataFrame:
    """A3 — the URL-seen / will-exist set: processable, non-redirect paths
    (converter.py:544-545; redirects excluded — they go to the redirections
    map instead, converter.py:518-543)."""
    return (
        content.filter(is_processable_status(F.col("status")))
        .filter(~is_redirect_status(F.col("status")))
        .select("zim_path")
        .distinct()
    )


def main_page_candidate(content: DataFrame) -> DataFrame:
    """A4 — first text/html, status-200, non-empty response in stream order
    (converter.py:565-578 auto-selection when --url is absent)."""
    return (
        content.filter(F.col("rec_type") == "response")
        .filter(F.col("status") == 200)
        .filter(F.split(F.coalesce(F.col("mime"), F.lit("")), ";").getItem(0) == "text/html")
        .filter(F.col("payload_len") > 0)
        .orderBy("file_seq", "rec_seq")
        .limit(1)
        .select("zim_path", F.col("effective_url").alias("url"), "file_seq", "rec_seq")
    )


def main_page_resolved(
    content: DataFrame, main: DataFrame | None = None
) -> DataFrame:
    """J5 — main-page redirect follow (converter.py:586-606): when the record
    at the main path answers 301/302/307, re-point the main path to
    ``normalize(urljoin(record_url, Location))`` and repeat until the path's
    record is not a redirect.

    ``main``: optional 1-row (zim_path, url, ...) override standing in for
    the reference's ``--url`` flag; defaults to A4 auto-selection (which
    picks a status-200 record, so the follow only fires when the same path
    ALSO carries an earlier first-wins redirect record, or when a caller
    supplies the path explicitly).

    Distributed shape: the {301,302,307} first-wins edge map is chased to
    its last node with pointer doubling (redirects.chase_chain) — no
    driver-side loop; the main row then left-joins the (node → final) map.
    Output: (zim_path, url) with zim_path re-pointed when a chain applies."""
    from warc2zim_spark.operators.redirects import chase_chain, redirect_edges

    if main is None:
        main = main_page_candidate(content)
    edges = redirect_edges(
        content,
        status_filter=lambda s: s.isin(list(MAIN_PAGE_REDIRECT_STATUSES)),
    )
    final = chase_chain(edges)
    return (
        main.join(final, main.zim_path == final.node, "left")
        .select(
            F.coalesce(F.col("final_path"), F.col("zim_path")).alias("zim_path"),
            "url",
        )
    )


def warcinfo_software(records: DataFrame) -> DataFrame:
    """A5 — first warcinfo record's ``software:`` field (converter.py:463-477);
    the payload is warc-fields text."""
    return (
        records.filter(F.col("rec_type") == "warcinfo")
        .orderBy("file_seq", "rec_seq")
        .limit(1)
        .select(
            F.regexp_extract(
                F.decode(F.col("payload"), "utf-8"), r"software:\s*([^\r\n]+)", 1
            ).alias("software")
        )
    )
