"""Distributed operators vs the sequential oracle (datagen golden columns +
the pure-python reference-shaped fixpoint). These are the order-dependent
semantics that parallelism most easily breaks (SURVEY §7 hard part (b))."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from warc2zim_spark.operators.gather import (
    date_range,
    expected_items,
    main_page_candidate,
    warcinfo_software,
)
from warc2zim_spark.operators.items import items_table, revisit_aliases
from warc2zim_spark.operators.records import content_records, load_records
from warc2zim_spark.operators.redirects import (
    kept_redirects,
    redirect_edges,
    resolve_fixpoint,
)
from warc2zim_spark.sources.datagen import sequential_redirect_fixpoint


@pytest.fixture(scope="module")
def content(spark, webdata):
    df = content_records(load_records(spark, webdata)).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def golden_records(webdata):
    return pq.read_table(f"{webdata}/warc_records.parquet").to_pandas()


class TestCanonicalization:
    def test_zim_path_matches_golden(self, content, golden_records):
        """Engine-computed zim_path (pairing → urlkey → surt UDF) must equal
        the generator's golden column on every content row."""
        got = {
            (r["file_seq"], r["rec_seq"]): r["zim_path"]
            for r in content.select("file_seq", "rec_seq", "zim_path").collect()
        }
        checked = 0
        for _, row in golden_records.iterrows():
            key = (row.file_seq, row.rec_seq)
            if key in got:
                assert got[key] == row.zim_path_g, (key, row.url)
                checked += 1
        assert checked == len(got) > 0

    def test_non_http_and_empty_filtered(self, content):
        urls = [r.url for r in content.select("url").collect()]
        assert all(u.startswith(("http://", "https://")) for u in urls)


class TestFirstWinsDedup:
    def test_no_duplicate_paths(self, spark, content):
        items = items_table(content)
        dup = items.groupBy("zim_path").count().filter(F.col("count") > 1).count()
        assert dup == 0

    def test_first_occurrence_wins(self, content):
        """Duplicate-url late rows (the generator's LATE DUPLICATE payloads)
        must lose: the kept row per path is the min (file_seq, rec_seq)."""
        items = items_table(content)
        firsts = (
            content.filter(F.col("rec_type") == "response")
            .filter(F.col("status").isin(200, 201, 202, 203))
            .filter(F.col("payload_len") > 0)
            .groupBy("zim_path")
            .agg(F.min(F.struct("file_seq", "rec_seq")).alias("first"))
            .select("zim_path", F.col("first.file_seq").alias("ffs"), F.col("first.rec_seq").alias("frs"))
        )
        joined = items.join(firsts, "zim_path")
        mismatches = joined.filter(
            (F.col("file_seq") != F.col("ffs")) | (F.col("rec_seq") != F.col("frs"))
        ).count()
        assert mismatches == 0

    def test_status_gate(self, content):
        items = items_table(content)
        statuses = {r["status"] for r in items.select("status").distinct().collect()}
        assert statuses <= {200, 201, 202, 203}
        paths = {r.zim_path for r in items.select("zim_path").collect()}
        assert "statuses.example/200-response" in paths
        for bad in (204, 206, 300, 303, 304, 305, 306, 400, 404, 500, 0):
            assert f"statuses.example/{bad}-response" not in paths


class TestRedirectFixpoint:
    def test_matches_sequential_reference_algorithm(self, spark, content):
        edges_df = redirect_edges(content).cache()
        expected_df = expected_items(content).cache()
        edges = {r.src_path: r.tgt_path for r in edges_df.collect()}
        expected = {r.zim_path for r in expected_df.collect()}
        kept_seq, expected_seq = sequential_redirect_fixpoint(edges, expected)

        verdicts = resolve_fixpoint(edges_df, expected_df).collect()
        kept_spark = {r.src_path for r in verdicts if r.kept}
        assert kept_spark == set(kept_seq.keys())

        kept_df = kept_redirects(edges_df, expected_df)
        assert {(r.src_path, r.tgt_path) for r in kept_df.collect()} == set(kept_seq.items())

    def test_known_cases(self, content):
        edges_df = redirect_edges(content)
        expected_df = expected_items(content)
        verdict = {r.src_path: r.kept for r in resolve_fixpoint(edges_df, expected_df).collect()}
        assert verdict["redir.example/ok-internal"] is True
        assert verdict["redir.example/chain-a"] is True
        assert verdict["redir.example/loop-a"] is False
        assert verdict["redir.example/loop-b"] is False
        assert verdict["redir.example/external-missing"] is False
        assert verdict["redir.example/also-item"] is False  # src already expected
        # self-redirects never enter the edge map
        assert "redir.example/loop-self" not in verdict
        assert "redir.example/http-to-https" not in verdict


class TestPairing:
    def test_post_urlkey_matches_golden(self, content, golden_records):
        """Responses paired with adjacent POST requests get the synthesized
        urlkey — engine pairing (lag window) vs generator golden."""
        golden_urlkeys = {
            (row.file_seq, row.rec_seq): row.urlkey_g
            for _, row in golden_records.iterrows()
            if row.urlkey_g is not None and row.rec_type == "response"
        }
        assert len(golden_urlkeys) > 0
        got = {
            (r["file_seq"], r["rec_seq"]): r["effective_url"]
            for r in content.select("file_seq", "rec_seq", "effective_url").collect()
        }
        for key, urlkey in golden_urlkeys.items():
            assert got.get(key) == urlkey, key


class TestAliases:
    def test_revisit_aliases(self, content):
        items = items_table(content)
        aliases = revisit_aliases(content, items)
        rows = aliases.collect()
        assert len(rows) > 0
        item_paths = {r.zim_path for r in items.select("zim_path").collect()}
        for r in rows:
            assert r.alias_path not in item_paths  # anti-join holds
            assert r.alias_path != r.target_path   # self-refs skipped


class TestGatherAggregates:
    def test_date_range_spans_days(self, content):
        row = date_range(content).collect()[0]
        assert (row.warc_end - row.warc_start).days >= 2

    def test_main_page(self, content):
        row = main_page_candidate(content).collect()[0]
        assert row.zim_path is not None

    def test_warcinfo_software(self, spark, webdata):
        records = load_records(spark, webdata)
        row = warcinfo_software(records).collect()[0]
        assert row.software == "synthetic-crawler 1.0"


class TestDistributedRewrite:
    """The no-broadcast rewrite path must equal the broadcast-exact one, in
    both membership modes (verdict r01 item 5)."""

    def _frames(self, spark, webdata):
        from warc2zim_spark.operators.rewrite import (
            rewritten_pages,
            rewritten_pages_distributed,
        )

        pages = spark.read.parquet(f"{webdata}/pages.parquet")
        seen = spark.read.parquet(f"{webdata}/pages_golden.parquet").select(
            "zim_path"
        )
        return pages, seen, rewritten_pages, rewritten_pages_distributed

    def test_distributed_exact_equals_broadcast(self, spark, webdata):
        pages, seen, broadcast_fn, dist_fn = self._frames(spark, webdata)
        a = {r.url: r.html_rw for r in broadcast_fn(spark, pages, seen).collect()}
        b = {r.url: r.html_rw for r in dist_fn(pages, seen, mode="exact").collect()}
        assert a == b

    def test_distributed_bloom_equals_exact(self, spark, webdata):
        # deterministic hashing: if this passes once it always passes (any
        # divergence would be a bloom FP re-pointing one extra link — the
        # reference-tolerated direction, asserted separately below)
        pages, seen, _, dist_fn = self._frames(spark, webdata)
        a = {r.url: r.html_rw for r in dist_fn(pages, seen, mode="exact").collect()}
        b = {r.url: r.html_rw for r in dist_fn(pages, seen, mode="bloom").collect()}
        assert a == b

    def test_bloom_hit_direction(self, spark, webdata):
        """No false negatives: every truly-seen key hits, so every internal
        link that should be rewritten IS rewritten; bloom error budget lives
        only on the rewrite-a-missing-path side (fp < 1% at 16 bits/key)."""
        from warc2zim_spark.frontier import seenfilter
        import pyspark.sql.functions as F

        seen = spark.read.parquet(f"{webdata}/pages_golden.parquet").select(
            "zim_path"
        ).distinct()
        flt = seenfilter.build_bloom(seen, key_col="zim_path")
        hits = seenfilter.probe_bloom(
            seen.withColumnRenamed("zim_path", "target"), flt,
            key_col="target", keep="hit",
        )
        assert hits.count() == seen.count()  # zero false negatives
        absent = spark.range(2000).select(
            F.concat(F.lit("never-seen.example/"), F.col("id")).alias("target")
        )
        fp = seenfilter.probe_bloom(absent, flt, key_col="target", keep="hit").count()
        assert fp <= 20  # <1% false-positive budget


class TestMainPageRedirect:
    """J5 — converter.py:586-606: main path re-points through 301/302/307
    Location chains; 308 and non-redirect paths don't fire."""

    def _content(self, spark):
        rows = [
            # (file_seq, rec_seq, rec_type, status, effective_url, zim_path, http_location)
            (0, 1, "response", 302, "https://m.example/start", "m.example/start", "/hop1"),
            (0, 2, "response", 301, "https://m.example/hop1", "m.example/hop1", "/hop2"),
            (0, 3, "response", 307, "https://m.example/hop2", "m.example/hop2", "/final"),
            (0, 4, "response", 200, "https://m.example/final", "m.example/final", None),
            # 308 must NOT participate in the main-page follow
            (0, 5, "response", 308, "https://m.example/perm", "m.example/perm", "/elsewhere"),
            (0, 6, "response", 200, "https://m.example/plain", "m.example/plain", None),
        ]
        return spark.createDataFrame(
            rows,
            "file_seq long, rec_seq long, rec_type string, status int, "
            "effective_url string, zim_path string, http_location string",
        )

    def _main(self, spark, path, url):
        return spark.createDataFrame([(path, url)], "zim_path string, url string")

    def test_chain_followed(self, spark):
        from warc2zim_spark.operators.gather import main_page_resolved

        out = main_page_resolved(
            self._content(spark),
            self._main(spark, "m.example/start", "https://m.example/start"),
        ).collect()
        assert len(out) == 1 and out[0].zim_path == "m.example/final"

    def test_308_not_followed(self, spark):
        from warc2zim_spark.operators.gather import main_page_resolved

        out = main_page_resolved(
            self._content(spark),
            self._main(spark, "m.example/perm", "https://m.example/perm"),
        ).collect()
        assert out[0].zim_path == "m.example/perm"

    def test_non_redirect_passthrough(self, spark):
        from warc2zim_spark.operators.gather import main_page_resolved

        out = main_page_resolved(
            self._content(spark),
            self._main(spark, "m.example/plain", "https://m.example/plain"),
        ).collect()
        assert out[0].zim_path == "m.example/plain"


class TestIllustration:
    """J3 payload capture + C11 selection (converter.py:548-556, 780-924)."""

    def test_best_illustration_picks_48(self, spark, webdata):
        from warc2zim_spark.operators.favicon import best_illustration
        from warc2zim_spark.operators.gather import main_page_candidate
        from warc2zim_spark.operators.records import content_records, load_records
        from warc2zim_spark.kernels.imagemeta import image_dims

        content = content_records(load_records(spark, webdata), with_payload=True)
        main = main_page_candidate(content).select("zim_path", "url")
        rows = best_illustration(content, main).collect()
        assert len(rows) == 1
        best = rows[0]
        # datagen fixture: favicon0.ico=96px, alt.ico=48px → exact-48 tier wins
        assert (best.width, best.height) == (48, 48)
        assert best.fmt == "PNG"
        # already PNG 48x48 → byte-identical passthrough of the record payload
        assert image_dims(bytes(best.illustration)) == ("PNG", 48, 48)

    def test_unparseable_payload_skipped(self, spark):
        from warc2zim_spark.operators.favicon import ranked_icons
        from warc2zim_spark.kernels.imagemeta import make_png

        captured = spark.createDataFrame(
            [
                ("https://x.example/a.png", "x.example/a.png", bytearray(make_png(96))),
                ("https://x.example/bad.png", "x.example/bad.png", bytearray(b"junk")),
            ],
            "icon_url string, icon_path string, payload binary",
        )
        rows = ranked_icons(captured).collect()
        assert [r.icon_url for r in rows] == ["https://x.example/a.png"]

    def test_svg_ranks_as_48(self, spark):
        from warc2zim_spark.operators.favicon import ranked_icons
        from warc2zim_spark.kernels.imagemeta import make_png

        captured = spark.createDataFrame(
            [
                ("https://x.example/big.png", "x.example/big.png", bytearray(make_png(96))),
                ("https://x.example/v.svg", "x.example/v.svg",
                 bytearray(b'<svg xmlns="http://www.w3.org/2000/svg" width="64" height="64"/>')),
            ],
            "icon_url string, icon_path string, payload binary",
        )
        rows = {r.icon_url: r for r in ranked_icons(captured).collect()}
        # SVG is size-perfect by definition (icon_finder semantics)
        assert rows["https://x.example/v.svg"].pref_rank == 1
        assert (rows["https://x.example/v.svg"].width,
                rows["https://x.example/v.svg"].height) == (48, 48)
