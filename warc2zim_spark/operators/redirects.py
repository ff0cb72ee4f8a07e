"""Redirect extraction + distributed transitive fixpoint (G1/G2/G3, P10).

Reference algorithm: converter.py:519-543 builds the ``redirections`` map
(first Location per source ZimPath, same-path redirects dropped);
converter.py:646-710 sequentially chases chains, dropping loops and chains
whose final target is not an expected item, and adding kept sources to the
expected set. Pinned by tests/test_warc_to_zim.py:717-750 (loops A↔B, self
loops, targets-of-dead-chains all dropped).

Distributed design: each source resolves its chain *independently* via an
iterative self-join (chains are short; iterations bounded). Independent
resolution is equivalent to the reference's sequential mutation: a source
kept by the reference has its final target expected, so any chain passing
through it also terminates expected; cycle members each discover their own
cycle. No driver-side collect of the edge set — at 10^10-URL scale redirect
edges are billions of rows; every step is a hash join on ``current`` key,
and the frontier shrinks each round (only unresolved chains join again).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warc2zim_spark.functions import udfs
from warc2zim_spark.functions.expressions import is_redirect_status

MAX_CHAIN = 32  # chains longer than this are treated as loops and dropped


def redirect_edges(content_records: DataFrame, status_filter=None) -> DataFrame:
    """(src_path, tgt_path) edges: redirect-status responses with a Location
    that resolves to a *different* ZimPath (converter.py:519-543, P10 self-
    redirect drop); first occurrence per source wins (dict-insert semantics,
    'if zim_path not in self.redirections').

    ``status_filter``: optional Column predicate builder replacing the
    default P9 whitelist — the main-page follow (J5) uses the narrower
    {301, 302, 307} set (converter.py:588-592 lists MOVED_PERMANENTLY,
    TEMPORARY_REDIRECT, FOUND — no 308)."""
    pred = status_filter if status_filter is not None else is_redirect_status
    edges = (
        content_records.filter(F.col("rec_type") == "response")
        .filter(pred(F.col("status")))
        .filter(F.col("http_location").isNotNull() & (F.col("http_location") != ""))
        .withColumn(
            "tgt_path",
            udfs.resolve_redirect_key(F.col("effective_url"), F.col("http_location")),
        )
        .filter(F.col("tgt_path").isNotNull())
        .filter(F.col("tgt_path") != F.col("zim_path"))
        .select(
            F.col("zim_path").alias("src_path"),
            "tgt_path", "file_seq", "rec_seq",
        )
    )
    w = Window.partitionBy("src_path").orderBy("file_seq", "rec_seq")
    return (
        edges.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("src_path", "tgt_path")
    )


def resolve_fixpoint(edges: DataFrame, expected: DataFrame) -> DataFrame:
    """→ (src_path, final_path, kept) — the reference fixpoint, distributed
    via **pointer doubling** (O(log MAX_CHAIN) self-joins, no per-step driver
    round-trips, bounded partition counts — the scale-correct shape for
    billions of edges).

    Define the step function on chain nodes:
        f(x) = x            if x ∈ expected   (absorbing — chains stop at the
                                               first expected node, matching
                                               the reference's while-condition)
               edges[x]     if x is a redirect source
               x            otherwise         (absorbing — dangling target)
    Doubling composes f with itself K times (2^K ≥ MAX_CHAIN), which is valid
    precisely because absorbing states are fixed points of f. Verdicts
    (converter.py:646-710):
      kept=false when src itself expected (converter.py:655-657)
      kept=false when the chain loops / exceeds MAX_CHAIN (final still movable)
      kept=true  when the chain's final node is expected
      kept=false otherwise (dangling final target)
    """
    expected = expected.select(F.col("zim_path").alias("exp_path")).distinct()
    exp_marked = expected.withColumn("is_exp", F.lit(True))

    # node universe: every chain node is an edge src or an edge tgt
    nodes = (
        edges.select(F.col("src_path").alias("node"))
        .union(edges.select(F.col("tgt_path").alias("node")))
        .distinct()
    )
    mapping = (
        nodes.join(exp_marked, nodes.node == exp_marked.exp_path, "left")
        .join(
            edges.select(F.col("src_path").alias("e_src"), "tgt_path"),
            F.col("node") == F.col("e_src"),
            "left",
        )
        .select(
            "node",
            F.when(F.col("is_exp").isNotNull(), F.col("node"))
            .when(F.col("tgt_path").isNotNull(), F.col("tgt_path"))
            .otherwise(F.col("node"))
            .alias("next"),
        )
        .localCheckpoint(eager=False)
    )
    rounds = max(1, math.ceil(math.log2(MAX_CHAIN)))
    for _ in range(rounds):
        hop2 = mapping.select(
            F.col("node").alias("j_node"), F.col("next").alias("j_next")
        )
        mapping = (
            mapping.join(hop2, mapping.next == hop2.j_node, "left")
            .select(
                "node",
                F.coalesce(F.col("j_next"), F.col("next")).alias("next"),
            )
            .localCheckpoint(eager=False)
        )
    final_of = mapping.select(
        F.col("node").alias("f_node"), F.col("next").alias("final_path")
    )
    # movable(final) ⇔ f(final) != final ⇔ chain still in a cycle after 2^K steps
    step1 = (
        nodes.join(exp_marked, nodes.node == exp_marked.exp_path, "left")
        .join(
            edges.select(F.col("src_path").alias("e_src"), "tgt_path"),
            F.col("node") == F.col("e_src"),
            "left",
        )
        .select(
            F.col("node").alias("m_node"),
            (
                F.col("is_exp").isNull()
                & F.col("tgt_path").isNotNull()
                & (F.col("tgt_path") != F.col("node"))
            ).alias("movable"),
        )
    )
    return (
        edges.join(exp_marked, edges.src_path == exp_marked.exp_path, "left")
        .withColumn("src_expected", F.col("is_exp").isNotNull())
        .select("src_path", "src_expected")
        .join(final_of, F.col("src_path") == F.col("f_node"), "left")
        .join(step1, F.col("final_path") == F.col("m_node"), "left")
        .withColumn("looped", F.coalesce(F.col("movable"), F.lit(False)))
        .join(
            exp_marked.select(F.col("exp_path").alias("fin_exp")),
            F.col("final_path") == F.col("fin_exp"),
            "left",
        )
        .select(
            "src_path",
            "final_path",
            (
                ~F.col("src_expected")
                & ~F.col("looped")
                & F.col("fin_exp").isNotNull()
            ).alias("kept"),
        )
    )


def chase_chain(edges: DataFrame) -> DataFrame:
    """(node, final_path) — follow edges to their last reachable node via
    pointer doubling, absorbing at nodes with no outgoing edge. No
    expected-set absorption: this is the raw chain-follow the main-page
    redirect needs (converter.py:586-606 loops until the record at the path
    is not a redirect). Cycles: after 2^K ≥ MAX_CHAIN doublings the walk
    lands somewhere inside the cycle; callers that must detect loops join
    ``final_path`` back against edge sources."""
    nodes = (
        edges.select(F.col("src_path").alias("node"))
        .union(edges.select(F.col("tgt_path").alias("node")))
        .distinct()
    )
    mapping = (
        nodes.join(
            edges.select(F.col("src_path").alias("e_src"), "tgt_path"),
            F.col("node") == F.col("e_src"),
            "left",
        )
        .select(
            "node",
            F.coalesce(F.col("tgt_path"), F.col("node")).alias("next"),
        )
        .localCheckpoint(eager=False)
    )
    rounds = max(1, math.ceil(math.log2(MAX_CHAIN)))
    for _ in range(rounds):
        hop2 = mapping.select(
            F.col("node").alias("j_node"), F.col("next").alias("j_next")
        )
        mapping = (
            mapping.join(hop2, mapping.next == hop2.j_node, "left")
            .select(
                "node",
                F.coalesce(F.col("j_next"), F.col("next")).alias("next"),
            )
            .localCheckpoint(eager=False)
        )
    return mapping.select("node", F.col("next").alias("final_path"))


def kept_redirects(edges: DataFrame, expected: DataFrame) -> DataFrame:
    """(src_path, tgt_path) of redirects to materialize (S6), i.e. the
    reference's post-fixpoint ``self.redirections``."""
    verdicts = resolve_fixpoint(edges, expected)
    return (
        edges.join(verdicts.filter(F.col("kept")), "src_path", "left_semi")
        .select("src_path", "tgt_path")
    )


def expected_with_redirects(edges: DataFrame, expected: DataFrame) -> DataFrame:
    """G3 — expected ∪ kept-redirect sources (converter.py:692-696)."""
    kept_sources = (
        resolve_fixpoint(edges, expected)
        .filter(F.col("kept"))
        .select(F.col("src_path").alias("zim_path"))
    )
    return expected.select("zim_path").union(kept_sources).distinct()
