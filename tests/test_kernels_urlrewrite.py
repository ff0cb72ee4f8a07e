"""URL-rewriting kernel tests (C3/C4 subset): relative-path math, seen-set
gating, srcset/css handling, byte-identity of untouched content."""

from warc2zim_spark.kernels.urlrewrite import (
    relative_path,
    rewrite_css_links,
    rewrite_html_links,
)


class TestRelativePath:
    def test_sibling(self):
        assert relative_path("example.com/x.html", "example.com/y.html") == "y.html"

    def test_up_one(self):
        assert relative_path("example.com/a/b.html", "example.com/c.css") == "../c.css"

    def test_down_one(self):
        assert relative_path("example.com/x.html", "example.com/a/y.html") == "a/y.html"

    def test_cross_host(self):
        assert (
            relative_path("example.com/x.html", "other.com/y.html")
            == "../other.com/y.html"
        )

    def test_deep_common(self):
        assert (
            relative_path("example.com/a/b/c.html", "example.com/a/d.css")
            == "../d.css"
        )


class TestHtmlRewrite:
    SEEN = frozenset({
        "example.com/page2.html",
        "example.com/style.css",
        "example.com/img/pic.png",
        "example.com/img/pic-2x.png",
        "cdn.example/lib.js",
    })

    def test_internal_href_rewritten(self):
        html = '<a href="/page2.html">x</a>'
        out = rewrite_html_links(html, "https://example.com/index.html", self.SEEN)
        assert out == '<a href="page2.html">x</a>'

    def test_absolute_internal(self):
        html = '<a href="https://example.com/page2.html">x</a>'
        out = rewrite_html_links(html, "https://example.com/a/deep.html", self.SEEN)
        assert out == '<a href="../page2.html">x</a>'

    def test_cross_host_in_zim(self):
        html = '<script src="https://cdn.example/lib.js"></script>'
        out = rewrite_html_links(html, "https://example.com/index.html", self.SEEN)
        assert out == '<script src="../cdn.example/lib.js"></script>'

    def test_external_untouched(self):
        html = '<a href="https://offsite.example/x">x</a>'
        out = rewrite_html_links(html, "https://example.com/index.html", self.SEEN)
        assert out == html

    def test_fragment_js_data_untouched(self):
        html = '<a href="#top">t</a><a href="javascript:void(0)">j</a><img src="data:image/png;base64,xx">'
        assert rewrite_html_links(html, "https://example.com/", self.SEEN) == html

    def test_srcset(self):
        html = '<img srcset="/img/pic.png 1x, /img/pic-2x.png 2x, https://off.example/o.png 3x">'
        out = rewrite_html_links(html, "https://example.com/index.html", self.SEEN)
        assert out == '<img srcset="img/pic.png 1x, img/pic-2x.png 2x, https://off.example/o.png 3x">'

    def test_inline_css_url(self):
        html = "<style>.a { background: url('/style.css'); }</style>"
        out = rewrite_html_links(html, "https://example.com/index.html", self.SEEN)
        assert out == "<style>.a { background: url('style.css'); }</style>"

    def test_single_quotes(self):
        html = "<a href='/page2.html'>x</a>"
        out = rewrite_html_links(html, "https://example.com/index.html", self.SEEN)
        assert out == "<a href='page2.html'>x</a>"

    def test_byte_identity_when_nothing_matches(self):
        html = '<div class="x">plain <b>content</b> &amp; entities</div>'
        assert rewrite_html_links(html, "https://example.com/", self.SEEN) == html

    def test_empty(self):
        assert rewrite_html_links(None, "https://example.com/", self.SEEN) == ""
        assert rewrite_html_links("", "https://example.com/", self.SEEN) == ""

    def test_deterministic(self):
        html = '<a href="/page2.html">x</a>' * 50
        a = rewrite_html_links(html, "https://example.com/d/e.html", self.SEEN)
        assert a == rewrite_html_links(html, "https://example.com/d/e.html", self.SEEN)


class TestCssRewrite:
    SEEN = frozenset({"example.com/img/bg.png"})

    def test_url_rewritten(self):
        css = 'body { background: url("/img/bg.png"); }'
        out = rewrite_css_links(css, "https://example.com/style.css", self.SEEN)
        assert out == 'body { background: url("img/bg.png"); }'

    def test_unquoted_url(self):
        css = "body { background: url(/img/bg.png); }"
        out = rewrite_css_links(css, "https://example.com/style.css", self.SEEN)
        assert out == "body { background: url(img/bg.png); }"

    def test_external_kept(self):
        css = "body { background: url(https://off.example/x.png); }"
        assert rewrite_css_links(css, "https://example.com/style.css", self.SEEN) == css


class TestCssImport:
    """C4 @import surface (reference CssRewriter, rewriting.py:251-253)."""

    SEEN = frozenset({"example.com/theme.css", "example.com/a/deep.css"})

    def test_import_string_seen(self):
        from warc2zim_spark.kernels.urlrewrite import rewrite_css_links

        out = rewrite_css_links(
            '@import "/theme.css";', "https://example.com/x.css", self.SEEN
        )
        assert out == '@import "theme.css";'

    def test_import_url_form(self):
        from warc2zim_spark.kernels.urlrewrite import rewrite_css_links

        out = rewrite_css_links(
            "@import url('/theme.css');", "https://example.com/x.css", self.SEEN
        )
        assert out == "@import url('theme.css');"

    def test_import_unseen_kept(self):
        from warc2zim_spark.kernels.urlrewrite import rewrite_css_links

        css = '@import "https://cdn.example/missing.css";'
        assert rewrite_css_links(css, "https://example.com/x.css", self.SEEN) == css

    def test_extract_includes_imports(self):
        from warc2zim_spark.kernels.urlrewrite import extract_link_targets

        t = extract_link_targets(
            '<style>@import "/theme.css";</style>', "https://example.com/x.html"
        )
        assert "example.com/theme.css" in t


class TestRewriteHtmlFull:
    """C3 full fidelity: head inserts + title-from-rewriter."""

    SEEN = frozenset({"example.com/a.css"})
    HTML = (
        '<html lang="en"><head><title>My Page</title>'
        '<link rel="stylesheet" href="/a.css"></head>'
        "<body><p>hi</p></body></html>"
    )

    def _full(self, **kw):
        from warc2zim_spark.kernels.urlrewrite import rewrite_html_full

        return rewrite_html_full(
            self.HTML, "https://example.com/x.html", self.SEEN, **kw
        )

    def test_title_extracted(self):
        title, _ = self._full()
        assert title == "My Page"

    def test_pre_insert_after_head_open(self):
        _, out = self._full()
        head_pos = out.lower().index("<head>")
        wb_pos = out.index("<!-- WB Insert -->")
        title_pos = out.index("<title>")
        assert head_pos < wb_pos < title_pos
        # doc lives at <root>/example.com/x.html → one level up to root
        assert 'src="../_zim_static/wombat.js"' in out
        assert 'src="../_zim_static/wombatSetup.js"' in out

    def test_links_still_rewritten(self):
        _, out = self._full()
        assert 'href="a.css"' in out

    def test_static_prefix_relative_to_depth(self):
        from warc2zim_spark.kernels.urlrewrite import rewrite_html_full

        _, out = rewrite_html_full(
            self.HTML, "https://example.com/deep/dir/x.html", self.SEEN
        )
        # <root>/example.com/deep/dir/x.html → three levels up
        assert 'src="../../../_zim_static/wombat.js"' in out

    def test_custom_css_before_head_close(self):
        _, out = self._full(custom_css=True)
        css_pos = out.index("custom.css")
        close_pos = out.lower().index("</head>")
        assert css_pos < close_pos

    def test_wbinfo_variables(self):
        _, out = self._full()
        assert '"example.com"' in out       # orig_host
        assert '"https"' in out              # orig_scheme
        assert '"https://example.com/x.html"' in out  # orig_url

    def test_no_head_falls_back_to_html_tag(self):
        from warc2zim_spark.kernels.urlrewrite import rewrite_html_full

        _, out = rewrite_html_full(
            "<html><body>x</body></html>", "https://example.com/y.html", self.SEEN
        )
        assert out.index("<html>") < out.index("<!-- WB Insert -->")

    def test_empty(self):
        from warc2zim_spark.kernels.urlrewrite import rewrite_html_full

        assert rewrite_html_full(None, "https://e.com/", self.SEEN) == (None, "")
