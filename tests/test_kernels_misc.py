"""Tests for status predicates, rewrite-mode classifier, language parsing,
icon ranking, html meta/text extraction, text stats, sketches."""

import pytest

from warc2zim_spark.kernels.htmlmeta import (
    extract_icons,
    extract_links,
    extract_meta,
    extract_title,
    truncated_title,
)
from warc2zim_spark.kernels.language import parse_language
from warc2zim_spark.kernels.rewritemode import (
    extract_jsonp_callback,
    icon_rank,
    rewrite_jsonp,
    rewrite_mode,
)
from warc2zim_spark.kernels.sketches import (
    hamming64,
    jaccard,
    minhash_bands,
    minhash_signature,
    simhash64,
    word_ngrams,
)
from warc2zim_spark.kernels.status import (
    PROCESSABLE_STATUSES,
    can_process_status_code,
    is_processable_redirect,
)
from warc2zim_spark.kernels.textextract import extract_text
from warc2zim_spark.kernels.textstats import (
    count_tokens_bpe,
    count_tokens_ws,
    detect_language,
    quality_score,
    rolling_fingerprint,
)


class TestStatus:
    """Matrix from reference tests/test_warc_to_zim.py:669-715."""

    @pytest.mark.parametrize("status", [200, 201, 202, 203, 301, 302, 307, 308])
    def test_processable(self, status):
        assert can_process_status_code(status)

    @pytest.mark.parametrize(
        "status",
        [204, 206, 300, 303, 304, 305, 306, 400, 401, 402, 403, 404, 500, 501, 502, 0, 100, None],
    )
    def test_not_processable(self, status):
        assert not can_process_status_code(status)

    def test_redirects(self):
        for s in (301, 302, 307, 308):
            assert is_processable_redirect(s)
        for s in (200, 300, 303, 304, None):
            assert not is_processable_redirect(s)
        assert PROCESSABLE_STATUSES == frozenset({200, 201, 202, 203, 301, 302, 307, 308})


class TestRewriteMode:
    """Decision tree pinned by reference tests/test_warc_to_zim.py:752-778 and
    rewriting.py:128-214."""

    def test_mime_only_html(self):
        assert rewrite_mode("text/html", None, "http://e.com/", "e.com/") == "html"
        assert rewrite_mode("text/html", None, "http://e.com/", "e.com/", "POST") is None

    def test_mime_only_css_js_json(self):
        assert rewrite_mode("text/css", None, "http://e.com/a.css", "e.com/a.css") == "css"
        assert rewrite_mode("text/javascript", None, "http://e.com/a.js", "e.com/a.js") == "javascript"
        assert rewrite_mode("application/x-javascript", None, "http://e.com/a.js", "e.com/a.js") == "javascript"
        assert rewrite_mode("application/json", None, "http://e.com/a", "e.com/a") == "json"
        assert rewrite_mode("image/png", None, "http://e.com/a.png", "e.com/a.png") is None

    def test_mime_js_with_jsonp_callback(self):
        # Reference quirk (rewriting.py:26,49): JSONP_CALLBACK_REGEX is used
        # with .match() and starts with [?], so an *absolute* URL never
        # matches — jsonp mode cannot trigger for WARC-Target-URI values.
        # We reproduce that literally.
        url = "http://e.com/api?callback=cb1"
        assert rewrite_mode("text/javascript", None, url, "e.com/api?callback=cb1") == "javascript"
        # a query-only "url" would match (the regex's literal semantics)
        assert extract_jsonp_callback("?callback=cb1") == "cb1"

    def test_mime_js_dot_json_path(self):
        assert rewrite_mode("text/javascript", None, "http://e.com/d.json", "e.com/d.json") == "json"

    def test_resourcetype_overrides(self):
        # stylesheet resourcetype forces css even for text/html mime
        assert rewrite_mode("text/html", "stylesheet", "http://e.com/", "e.com/") == "css"
        # document+text/html = html (GET)
        assert rewrite_mode("text/html", "document", "http://e.com/", "e.com/") == "html"
        assert rewrite_mode("text/html", "document", "http://e.com/", "e.com/", "POST") is None
        # xhr + json
        assert rewrite_mode("application/json", "xhr", "http://e.com/a", "e.com/a") == "json"
        # script + js mime
        assert rewrite_mode("text/javascript", "script", "http://e.com/a.js", "e.com/a.js") == "javascript"
        # manifest + .json path
        assert rewrite_mode("text/plain", "manifest", "http://e.com/m.json", "e.com/m.json") == "json"
        # unknown combos → None (passthrough)
        assert rewrite_mode("text/css", "script", "http://e.com/a.css", "e.com/a.css") is None
        assert rewrite_mode("text/html", "image", "http://e.com/", "e.com/") is None

    def test_case_insensitive_resourcetype(self):
        assert rewrite_mode("text/html", "  Document ", "http://e.com/", "e.com/") == "html"


class TestJsonp:
    def test_callback_extraction(self):
        # anchored match: absolute URLs never match (reference quirk)
        assert extract_jsonp_callback("http://e.com/x?callback=cb") is None
        assert extract_jsonp_callback("?callback=cb") == "cb"
        assert extract_jsonp_callback("?a=1&jsonp=fn2") == "fn2"
        assert extract_jsonp_callback("?callback=?") is None
        assert extract_jsonp_callback("http://e.com/x") is None

    def test_rewrite_jsonp_reference_quirk(self):
        # mirrors rewriting.py:264-276 literally: callback + group(1)
        content = "oldCb({\"a\": 1})"
        assert rewrite_jsonp(content, "?callback=newCb") == "newCboldCb"
        # comments allowed before callback
        content2 = "/* c */ old.Cb([1])"
        assert rewrite_jsonp(content2, "?callback=n") == "nold.Cb"
        # no callback in url → passthrough
        assert rewrite_jsonp(content, "http://e.com/x") == content
        # not jsonp-shaped → passthrough
        assert rewrite_jsonp("var x = 1;", "?callback=n") == "var x = 1;"


class TestLanguage:
    """Reference tests/test_language.py:6-27 shape."""

    @pytest.mark.parametrize(
        "value,expected",
        [
            ("en", "eng"),
            ("eng", "eng"),
            ("English", "eng"),
            ("fr", "fra"),
            ("fra", "fra"),
            ("en-US", "eng"),
            ("en,fr", "eng,fra"),
            ("en , fr", "eng,fra"),
            ("en,en,eng", "eng"),
            ("fr,en", "fra,eng"),
            ("zz", "eng"),
            ("", "eng"),
            (None, "eng"),
            ("zh", "zho"),
            ("pt,es", "por,spa"),
        ],
    )
    def test_parse(self, value, expected):
        assert parse_language(value) == expected


class TestIconRank:
    """All two-item comparator cases from reference tests/test_icon_finder.py
    ``test_get_sorted_icons`` (two_items_with_size1..14), ported verbatim:
    (a_dims, b_dims, winner) where winner is 'a', 'b', or 'tie' in the
    reference's *sorted-descending* output. A win means a higher icon_rank."""

    CASES = [
        # id, a=(w,h), b=(w,h), winner
        ("size1", (12, 12), (96, 96), "b"),
        ("size2", (128, 128), (96, 96), "a"),
        ("size3", (96, 96), (128, 128), "b"),
        ("size4", (12, 12), (26, 26), "b"),
        ("size5", (26, 26), (12, 12), "a"),
        ("size6", (48, 48), (12, 12), "a"),
        ("size7", (48, 48), (96, 96), "a"),
        ("size8", (12, 12), (48, 48), "b"),
        ("size9", (96, 96), (48, 48), "b"),
        ("size10", (48, 48), (48, 48), "tie"),
        ("size11", (96, 96), (96, 96), "tie"),
        ("size12", (32, 32), (96, 96), "b"),
        ("size13", (96, 96), (32, 32), "a"),
        ("size14", (26, 26), (26, 26), "tie"),
    ]

    @pytest.mark.parametrize("case_id,a,b,winner", CASES)
    def test_reference_comparator(self, case_id, a, b, winner):
        ra, rb = icon_rank(*a), icon_rank(*b)
        if winner == "a":
            assert ra > rb
        elif winner == "b":
            assert ra < rb
        else:
            assert ra == rb

    def test_above_48_bigger_wins(self):
        # icon_finder.py:36-43: among >48 icons, prefer biggest.
        assert icon_rank(96, 96) > icon_rank(64, 64)
        assert icon_rank(512, 512) > icon_rank(49, 49)

    def test_non_square_uses_min_dim(self):
        assert icon_rank(48, 96) == icon_rank(48, 48)
        assert icon_rank(100, 32) < icon_rank(47, 47)


class TestHtmlMeta:
    HTML = """<html lang="fr"><head>
      <title>  My   Title </title>
      <base href="/base/">
      <meta http-equiv="content-language" content="de">
      <meta name="language" content="Spanish">
      <link rel="shortcut icon" href="/fav.ico">
      <link rel="icon" href="/icon48.png">
      <link rel="stylesheet" href="/style.css">
      <script type="module" src="/app.mjs"></script>
      <style>.x { background: url('/bg.png'); }</style>
      </head><body>
      <a href="/page2">p2</a>
      <img src="/img.png" srcset="/img1x.png 1x, /img2x.png 2x">
      <div style="background-image: url(/inline.gif)"></div>
      </body></html>"""

    def test_title(self):
        assert extract_title(self.HTML) == "My Title"
        assert truncated_title("x" * 40) == "x" * 29 + "…"
        assert truncated_title("short") == "short"

    def test_lang_cascade_order(self):
        assert extract_meta(self.HTML)["lang_decl"] == "fr"
        no_html_lang = self.HTML.replace(' lang="fr"', "")
        assert extract_meta(no_html_lang)["lang_decl"] == "de"
        no_meta_httpequiv = no_html_lang.replace('http-equiv="content-language" ', "x=1 ")
        assert extract_meta(no_meta_httpequiv)["lang_decl"] == "Spanish"

    def test_icons_rel_token_list(self):
        icons = extract_icons(self.HTML)
        assert icons == ["/fav.ico", "/icon48.png"]

    def test_links(self):
        links = extract_links(self.HTML)
        for expected in ["/style.css", "/page2", "/img.png", "/img1x.png",
                         "/img2x.png", "/inline.gif", "/bg.png", "/app.mjs", "/fav.ico"]:
            assert expected in links, expected

    def test_js_modules(self):
        assert extract_meta(self.HTML)["js_modules"] == ["/app.mjs"]

    def test_base_href(self):
        assert extract_meta(self.HTML)["base_href"] == "/base/"

    def test_empty(self):
        meta = extract_meta(None)
        assert meta["title"] == "" and meta["links"] == []


class TestTextExtract:
    def test_basic(self):
        html = "<html><head><title>T</title><script>var x=1;</script></head>" \
               "<body><h1>Head</h1><p>Para  one.</p><p>Two &amp; three</p></body></html>"
        assert extract_text(html) == "T\nHead\nPara one.\nTwo & three"

    def test_skip_style_noscript(self):
        html = "<body><style>.a{}</style><noscript>NO</noscript>ok</body>"
        assert extract_text(html) == "ok"

    def test_inline_concat(self):
        assert extract_text("<p>a <b>b</b> c</p>") == "a b c"

    def test_empty(self):
        assert extract_text("") == ""
        assert extract_text(None) == ""

    def test_deterministic(self):
        html = "<div>x</div>" * 100
        assert extract_text(html) == extract_text(html)


class TestTextStats:
    def test_token_counts(self):
        assert count_tokens_ws("a b  c\nd") == 4
        assert count_tokens_ws("") == 0
        # hello | , | world | 123
        assert count_tokens_bpe("hello, world 123") == 4
        # 1234 splits into 123|4 (1-3 digit groups, GPT-2-style)
        assert count_tokens_bpe("1234") == 2

    def test_quality_monotonic(self):
        good = "The quick brown fox jumps over the lazy dog and runs far away. " * 5
        bad = "@#$% ^&*! ~~~"
        assert quality_score(good) > quality_score(bad)
        assert quality_score("") == 0.0

    def test_langid(self):
        assert detect_language("the cat and the dog are in the house with you") == "en"
        assert detect_language("los gatos y los perros que viven en una casa") == "es"
        assert detect_language("你好世界你好世界你好世界") == "zh"
        assert detect_language("") == "und"

    def test_fingerprint_stability(self):
        text = "one two three four five six seven eight nine ten eleven twelve"
        fp1 = rolling_fingerprint(text)
        fp2 = rolling_fingerprint(text)
        assert fp1 == fp2 and len(fp1) == 4
        assert rolling_fingerprint("") == []


class TestSketches:
    T1 = "the quick brown fox jumps over the lazy dog " * 4
    T2 = "the quick brown fox jumps over the lazy cat " * 4
    T3 = "completely different content about spark partitions and shuffles"

    def test_jaccard(self):
        assert jaccard(set("ab"), set("ab")) == 1.0
        assert jaccard(set(), set()) == 1.0
        assert jaccard(set("a"), set()) == 0.0

    def test_ngrams(self):
        assert word_ngrams("a b c d", 3) == {"a b c", "b c d"}
        assert word_ngrams("a b", 3) == {"a b"}

    def test_minhash_similarity_ordering(self):
        s1 = minhash_signature(self.T1)
        s1b = minhash_signature(self.T1)
        s2 = minhash_signature(self.T2)
        s3 = minhash_signature(self.T3)
        assert s1 == s1b
        sim12 = sum(a == b for a, b in zip(s1, s2)) / len(s1)
        sim13 = sum(a == b for a, b in zip(s1, s3)) / len(s1)
        assert sim12 > 0.5 > sim13

    def test_minhash_bands(self):
        s1 = minhash_signature(self.T1)
        s2 = minhash_signature(self.T2)
        b1, b2 = minhash_bands(s1), minhash_bands(s2)
        assert len(b1) == 16
        assert any(x == y for x, y in zip(b1, b2))  # near-dups share a band
        assert minhash_bands(minhash_signature(self.T3)) != b1

    def test_simhash(self):
        h1 = simhash64(self.T1)
        h2 = simhash64(self.T2)
        h3 = simhash64(self.T3)
        assert h1 == simhash64(self.T1)
        assert hamming64(h1, h2) < hamming64(h1, h3)
        assert simhash64("") == 0


class TestLanguageReferenceVerbatim:
    """ALL 15 cases from reference tests/test_language.py:6-27, ported
    verbatim (ids included) — the engine-shaped TestLanguage above keeps its
    own additional cases."""

    @pytest.mark.parametrize(
        "input_lang,expected_lang",
        [
            pytest.param("en", "eng", id="english_2_chars"),
            pytest.param("eng", "eng", id="english_3_chars"),
            pytest.param("English", "eng", id="english_full_1"),
            pytest.param("zh", "zho", id="chinese_2_chars"),
            pytest.param("zh-hans", "zho", id="chinese_variant"),
            pytest.param("zho", "zho", id="chinese_3_chars"),
            pytest.param("Chinese", "zho", id="chinese_full_1"),
            pytest.param("chinEse", "zho", id="chinese_full_2"),
            pytest.param("patois", "eng", id="unrecognized_bad_name"),
            pytest.param("unknown,fra,unknown", "fra", id="ignore_unknown"),
            pytest.param("eng,fra", "eng,fra", id="two_langs_1"),
            pytest.param("fra,eng", "fra,eng", id="two_langs_2"),
            pytest.param("  eng ,   fra    ", "eng,fra", id="two_langs_spaces"),
            pytest.param("eng,fra,English", "eng,fra", id="duplicates"),
            pytest.param("eng;fra", "eng", id="unrecognized_bad_separator"),
        ],
    )
    def test_parse_language(self, input_lang, expected_lang):
        assert parse_language(input_lang) == expected_lang
