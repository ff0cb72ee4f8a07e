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
