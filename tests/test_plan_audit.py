"""Plan audits: pin the single-Arrow-eval property of UDF-bearing operators.

Catalyst evaluates a Python UDF once per referencing operator: a Filter
directly over a UDF Project (including plain explode's implicit non-empty
guard) runs the UDF for the predicate AND the projection, and fan-out
consumers each re-run it because per-consumer column pruning makes the
subtrees canonically distinct (ReusedExchange never fires). Round 5 fixed
every such site with pre-explode checkpoints / explode_outer / post-shuffle
filters; these tests pin the executed plans so the bug class cannot return
silently — a correctness-preserving refactor that reintroduces a duplicate
eval flips a count here, not a benchmark three rounds later.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def _arrow_evals(df) -> list[str]:
    """UDF names of the ArrowEvalPython nodes in the EXECUTED plan (the
    frame must have been materialized — lazy checkpoints hide their UDFs
    only after they actually ran)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return re.findall(r"ArrowEvalPython \[(?:pyUDF: )?([a-zA-Z_0-9]+)\(", plan)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"alpha beta gamma delta epsilon doc {i % 7} " * 4, "en")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def embeddings(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(32)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestSketchPlansSingleEval:
    def test_minhash_candidates_zero_residual_evals(self, docs):
        from warc2zim_spark.operators.dedup import minhash_candidates

        df = minhash_candidates(docs)
        df.count()
        # the one signature pass lives inside the pre-explode checkpoint;
        # the final plan over the materialized RDD carries no Python evals
        assert _arrow_evals(df) == []

    def test_minhash_pairs_zero_residual_evals(self, docs):
        from warc2zim_spark.operators.dedup import minhash_near_duplicates

        df = minhash_near_duplicates(docs)
        df.count()
        assert _arrow_evals(df) == []

    def test_ngram_pairs_zero_residual_evals(self, docs):
        from warc2zim_spark.operators.dedup import ngram_jaccard_pairs

        df = ngram_jaccard_pairs(docs)
        df.count()
        assert _arrow_evals(df) == []

    def test_simhash_pairs_zero_residual_evals(self, docs):
        from warc2zim_spark.operators.dedup import simhash_near_duplicates

        df = simhash_near_duplicates(docs)
        df.count()
        assert _arrow_evals(df) == []

    def test_fingerprints_single_eval(self, docs):
        from warc2zim_spark.operators.textops import fingerprints

        df = fingerprints(docs)
        df.count()
        assert _arrow_evals(df).count("fingerprint") == 1

    def test_lsh_topk_one_signature_pass_per_side(self, embeddings):
        from warc2zim_spark.operators.similarity import lsh_topk

        queries = embeddings.filter(F.col("vec_id") < 4)
        df = lsh_topk(embeddings, queries, k=3, dim=8)
        df.count()
        sigs = [e for e in _arrow_evals(df) if e == "sigs"]
        # corpus side + query side — and nothing more (plain posexplode's
        # implicit guard used to double each side)
        assert len(sigs) == 2


class TestFrontierPlanSingleEval:
    def test_wave_links_single_parse_and_resolve(self, spark):
        from warc2zim_spark.frontier.crawl import crawl_wave

        pages = spark.createDataFrame(
            [
                ("https://a.example/p1", "<html><a href='/p2'>x</a></html>"),
                ("https://a.example/p2", "<html></html>"),
            ],
            "url string, html string",
        ).withColumn("html", F.col("html").cast("binary"))
        seeds = spark.createDataFrame(
            [("https://a.example/p1", 0, 1.0)], "url string, hops int, score double"
        )
        from warc2zim_spark.frontier.crawl import _normalize

        robots = spark.createDataFrame(
            [], "host string, rule_type string, path_prefix string, crawl_delay_ms int"
        )
        # mirror run_crawl's materialization: frontier checkpointed per wave,
        # page_lookup cached once per crawl — so the only live UDFs in the
        # next-frontier plan are the link-extraction chain itself
        from warc2zim_spark.frontier.crawl import page_lookup

        frontier = _normalize(seeds).localCheckpoint(eager=True)
        pages_keyed = page_lookup(pages).cache()
        pages_keyed.count()
        scheduled, nxt = crawl_wave(
            frontier,
            spark.createDataFrame([], "surt_key string"),
            pages,
            robots,
            pages_keyed=pages_keyed,
        )
        nxt.count()
        evals = _arrow_evals(nxt)
        # r06: the whole link chain (decode + HTML parse + resolve + surt +
        # host) is ONE fused Arrow stage — exactly one extract_wave_links
        # eval, and none of the former per-stage UDFs may reappear (their
        # return would mean the exploded link frame round-trips through
        # Python again)
        assert evals.count("extract_wave_links") == 1, evals
        for name in ("extract_meta", "resolve_url", "decode_payload"):
            assert evals.count(name) == 0, (name, evals)
        # surt_key lives only inside the cached page_lookup build, whose
        # subtree the plan toString prints (not a live eval — same artifact
        # the old host_of bound documented); host_of survives only in the
        # wave-dedup best frame
        assert evals.count("surt_key") <= 2, evals
        assert evals.count("host_of") <= 1, evals
        pages_keyed.unpersist()

    def test_content_records_two_surt_evals_pinned(self, spark):
        """content_records' zim_path null filter over the surt Project is a
        KNOWN, A/B'd 2x-eval (records.py): asNondeterministic gives one eval
        but blocks consumer predicates from pushing through to the scan, and
        the measured bench delta is a wash because surt is a microsecond
        kernel next to the pairing window. Pin the count at exactly 2: a
        third eval means a new bug; a drop to 1 means the trade-off was
        silently re-decided. Re-A/B trigger: if the fuzzy-rule battery in
        kernels/surt.py grows materially, re-measure before keeping 2."""
        from warc2zim_spark.operators.records import content_records

        records = spark.createDataFrame(
            [
                (0, 0, "response", "https://a.example/p1", 200, "text/html",
                 None, None, None, None, None, None, 10),
            ],
            "file_seq int, rec_seq long, rec_type string, url string, "
            "status int, mime string, record_id string, concurrent_to string, "
            "req_method string, req_mime string, req_body binary, "
            "req_content_length long, payload_len long",
        )
        df = content_records(records)
        df.count()
        evals = _arrow_evals(df)
        assert evals.count("surt_key") == 2, evals

    def test_rewrite_distributed_single_eval_per_stage(self, spark):
        """rewritten_pages_distributed (the 10^10-path rewrite shape): the
        extract UDF and the rewrite UDF each run once; decode_payload runs
        once per page PASS (extract + rewrite = 2) — the two passes are the
        design (decide on narrow key rows, touch html only in its own scan
        stage), not a duplicate-eval bug."""
        from warc2zim_spark.operators.rewrite import rewritten_pages_distributed

        pages = spark.createDataFrame(
            [
                ("https://a.example/p1", b"<html><a href='/p2'>x</a></html>"),
                ("https://a.example/p2", b"<html></html>"),
            ],
            "url string, html binary",
        )
        seen = spark.createDataFrame([("a.example/p2",)], "zim_path string")
        df = rewritten_pages_distributed(pages, seen, mode="exact")
        df.count()
        evals = _arrow_evals(df)
        assert evals.count("extract_link_targets") == 1, evals
        assert evals.count("_rewrite_with_row_seen") == 1, evals
        assert evals.count("decode_payload") <= 2, evals

    def test_js_modules_single_parse(self, spark):
        from warc2zim_spark.operators.rewrite import js_module_paths

        pages = spark.createDataFrame(
            [
                ("https://a.example/p1", "<html><script type='module' src='/m.js'></script></html>"),
                ("https://a.example/p2", "<html></html>"),
            ],
            "url string, html string",
        ).withColumn("html", F.col("html").cast("binary"))
        df = js_module_paths(pages)
        df.count()
        evals = _arrow_evals(df)
        assert evals.count("extract_meta") <= 1, evals
