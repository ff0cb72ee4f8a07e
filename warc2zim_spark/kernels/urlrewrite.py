"""HTML/CSS URL rewriting — the C3/C4 subset (SURVEY §2.7, slice 4).

Reference behavior (zimscraperlib HtmlRewriter/CssRewriter as driven by
rewriting.py:224-253; surface pinned in README.md:53-59): every href/src/
srcset/poster attribute and CSS ``url()``/``@import`` target is resolved
against the document URL, canonicalized (fuzzy rules included), and — when
the target is a known ZIM item (the *seen set*, rewriting.py:78-82) —
re-pointed to a **document-relative** path to the target's ZimPath; targets
not in the set keep their original form (they remain external links).

The relative-path rule matches the ZimPath key space: both document and
target live at scheme-less paths like ``example.com/a/b.html``; the link
becomes ``../`` × (depth of doc dir below the common prefix) + the target
remainder. Byte-determinism is the contract (same golden-output policy as
textextract.py).

ES-module discovery (C5's two-round feedback, converter.py:227): rewriting
reports each ``<script type="module" src>`` target so the driver can run the
JS pass with the accumulated module set.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from warc2zim_spark.kernels.surt import canonicalize

_ATTR_RE = re.compile(
    r"""(?P<prefix>\b(?:href|src|poster|data-src)\s*=\s*)(?P<q>["'])(?P<url>[^"']*)(?P=q)""",
    re.IGNORECASE,
)
_SRCSET_RE = re.compile(
    r"""(?P<prefix>\bsrcset\s*=\s*)(?P<q>["'])(?P<val>[^"']*)(?P=q)""",
    re.IGNORECASE,
)
_CSS_URL_RE = re.compile(
    r"""(?P<prefix>url\(\s*)(?P<q>["']?)(?P<url>[^"')]+)(?P=q)(?P<suffix>\s*\))""",
    re.IGNORECASE,
)
# @import with a bare string (the url() form is caught by _CSS_URL_RE);
# covers the CssRewriter @import surface (rewriting.py:251-253)
_CSS_IMPORT_RE = re.compile(
    r"""(?P<prefix>@import\s+)(?P<q>["'])(?P<url>[^"']+)(?P=q)""",
    re.IGNORECASE,
)
_SKIP_PREFIXES = ("#", "javascript:", "data:", "mailto:", "about:")


def relative_path(doc_path: str, target_path: str) -> str:
    """Document-relative link from ZimPath ``doc_path`` to ``target_path``.

    >>> relative_path("example.com/a/b.html", "example.com/c.css")
    '../c.css'
    >>> relative_path("example.com/x.html", "example.com/y.html")
    'y.html'
    """
    doc_dir = doc_path.rsplit("/", 1)[0] + "/" if "/" in doc_path else ""
    doc_segs = [s for s in doc_dir.split("/") if s]
    tgt_segs = target_path.split("/")
    common = 0
    while (
        common < len(doc_segs)
        and common < len(tgt_segs) - 1
        and doc_segs[common] == tgt_segs[common]
    ):
        common += 1
    ups = "../" * (len(doc_segs) - common)
    rel = ups + "/".join(tgt_segs[common:])
    return rel if rel else target_path


def _rewrite_one(
    raw_url: str, base_url: str, doc_path: str, seen: set[str] | frozenset[str]
) -> str | None:
    """→ rewritten link, or None to keep the original bytes."""
    url = raw_url.strip()
    if not url or url.startswith(_SKIP_PREFIXES):
        return None
    try:
        absolute = urljoin(base_url, url)
    except ValueError:
        return None
    target = canonicalize(absolute)
    if target is None or target not in seen:
        return None
    return relative_path(doc_path, target)


def _import_sub_factory(base_url, doc_path, seen):
    def import_sub(m: re.Match) -> str:
        new = _rewrite_one(m.group("url"), base_url, doc_path, seen)
        if new is None:
            return m.group(0)
        return f"{m.group('prefix')}{m.group('q')}{new}{m.group('q')}"
    return import_sub


def rewrite_html_links(
    html: str | None,
    base_url: str,
    seen: set[str] | frozenset[str],
    doc_path: str | None = None,
) -> str:
    """Rewrite href/src/poster/data-src, srcset candidates, and CSS url()
    targets whose canonical key ∈ ``seen``; leave everything else
    byte-identical."""
    if not html:
        return ""
    if doc_path is None:
        doc_path = canonicalize(base_url) or ""

    def attr_sub(m: re.Match) -> str:
        new = _rewrite_one(m.group("url"), base_url, doc_path, seen)
        if new is None:
            return m.group(0)
        return f"{m.group('prefix')}{m.group('q')}{new}{m.group('q')}"

    def srcset_sub(m: re.Match) -> str:
        parts = []
        changed = False
        for candidate in m.group("val").split(","):
            candidate = candidate.strip()
            if not candidate:
                continue
            bits = candidate.split(None, 1)
            new = _rewrite_one(bits[0], base_url, doc_path, seen)
            if new is not None:
                changed = True
                bits[0] = new
            parts.append(" ".join(bits))
        if not changed:
            return m.group(0)
        return f"{m.group('prefix')}{m.group('q')}{', '.join(parts)}{m.group('q')}"

    def css_sub(m: re.Match) -> str:
        new = _rewrite_one(m.group("url"), base_url, doc_path, seen)
        if new is None:
            return m.group(0)
        return f"{m.group('prefix')}{m.group('q')}{new}{m.group('q')}{m.group('suffix')}"

    out = _ATTR_RE.sub(attr_sub, html)
    out = _SRCSET_RE.sub(srcset_sub, out)
    out = _CSS_URL_RE.sub(css_sub, out)
    out = _CSS_IMPORT_RE.sub(_import_sub_factory(base_url, doc_path, seen), out)
    return out


def extract_link_targets(html: str | None, base_url: str) -> list[str]:
    """The distinct canonical candidate keys that ``rewrite_html_links``
    would probe against the seen set — same regexes, same skip rules, same
    canonicalization — so a relational membership pass (explode → join →
    collect back) is semantically identical to the broadcast-set probe.
    Sorted for determinism."""
    if not html:
        return []
    targets: set[str] = set()

    def add(raw: str) -> None:
        url = raw.strip()
        if not url or url.startswith(_SKIP_PREFIXES):
            return
        try:
            absolute = urljoin(base_url, url)
        except ValueError:
            return
        t = canonicalize(absolute)
        if t is not None:
            targets.add(t)

    for m in _ATTR_RE.finditer(html):
        add(m.group("url"))
    for m in _SRCSET_RE.finditer(html):
        for candidate in m.group("val").split(","):
            candidate = candidate.strip()
            if candidate:
                add(candidate.split(None, 1)[0])
    for m in _CSS_URL_RE.finditer(html):
        add(m.group("url"))
    for m in _CSS_IMPORT_RE.finditer(html):
        add(m.group("url"))
    return sorted(targets)


# faithful re-render of templates/head_insert.html:1-31 with str.format
# placeholders (jinja is absent; the template is static text + 5 variables —
# urlsplit filter → scheme/netloc, quote(path), relative static prefix)
HEAD_INSERT_TEMPLATE = """
<!-- WB Insert -->
<script src="{static_prefix}wombat.js"></script>
<script src="{static_prefix}wombatSetup.js"></script>
<script>
  // Get the current url we are serving from.
  // We cannot know it at zim creation as it depends of our server.
  const current_url = (function () {{
    var href = new URL(window.location.href);
    href.hash = "";

    return href.toString();
  }})();

  const wbinfo = wombatSetup.getWombatInfo(
    current_url,
    "{orig_host}",
    "{orig_scheme}",
    "{orig_url}",
    current_url.substring(0, current_url.length - "{path}".length)
  );

  if (window && window._WBWombatInit) {{
    window._WBWombatInit(wbinfo);
  }}
</script>

<!-- End WB Insert -->
"""

CUSTOM_CSS_INSERT = (
    '\n<link type="text/css" href="{static_prefix}custom.css"'
    ' rel="stylesheet" />\n'
)

_HEAD_OPEN_RE = re.compile(r"<head\b[^>]*>", re.IGNORECASE)
_HEAD_CLOSE_RE = re.compile(r"</head\s*>", re.IGNORECASE)
_HTML_OPEN_RE = re.compile(r"<html\b[^>]*>", re.IGNORECASE)


def static_prefix_for(doc_path: str) -> str:
    """Document-relative prefix to ``_zim_static/`` (the reference's
    ``url_rewriter.get_document_uri(ZimPath('_zim_static/'), '')``,
    rewriting.py:227-229)."""
    marker = "\x00"
    rel = relative_path(doc_path, f"_zim_static/{marker}")
    return rel[: -len(marker)]


def render_head_insert(doc_path: str, base_url: str) -> str:
    """rewrite_html's pre_head_insert (rewriting.py:224-240)."""
    from urllib.parse import quote, urlsplit

    parts = urlsplit(base_url)
    return HEAD_INSERT_TEMPLATE.format(
        static_prefix=static_prefix_for(doc_path),
        orig_host=parts.netloc,
        orig_scheme=parts.scheme,
        orig_url=base_url,
        path=quote(doc_path),
    )


def rewrite_html_full(
    html: str | None,
    base_url: str,
    seen: set[str] | frozenset[str],
    doc_path: str | None = None,
    custom_css: bool = False,
) -> tuple[str | None, str]:
    """C3 full fidelity: link re-pointing + wombat head-inserts + title
    extraction during the rewrite pass (the reference returns (title,
    content) from Rewriter.rewrite, items.py:46-56).

    Insert placement matches zimscraperlib's HtmlRewriter: pre-insert right
    after the opening ``<head>``, post-insert (custom.css link when
    configured) right before ``</head>``; documents without a head get the
    pre-insert after ``<html>`` or prepended — the degraded-document
    fallback."""
    if not html:
        return None, ""
    if doc_path is None:
        doc_path = canonicalize(base_url) or ""
    from warc2zim_spark.kernels.htmlmeta import extract_title

    title = extract_title(html) or None
    body = rewrite_html_links(html, base_url, seen, doc_path)
    pre = render_head_insert(doc_path, base_url)
    m = _HEAD_OPEN_RE.search(body)
    if m:
        body = body[: m.end()] + pre + body[m.end() :]
    else:
        m2 = _HTML_OPEN_RE.search(body)
        if m2:
            body = body[: m2.end()] + pre + body[m2.end() :]
        else:
            body = pre + body
    if custom_css:
        post = CUSTOM_CSS_INSERT.format(static_prefix=static_prefix_for(doc_path))
        mc = _HEAD_CLOSE_RE.search(body)
        if mc:
            body = body[: mc.start()] + post + body[mc.start() :]
        else:
            body = body + post
    return title, body


def rewrite_css_links(
    css: str | None, base_url: str, seen: set[str] | frozenset[str],
    doc_path: str | None = None,
) -> str:
    """C4 — CSS url()/@import re-pointing (tinycss2-free regex subset)."""
    if not css:
        return ""
    if doc_path is None:
        doc_path = canonicalize(base_url) or ""

    def css_sub(m: re.Match) -> str:
        new = _rewrite_one(m.group("url"), base_url, doc_path, seen)
        if new is None:
            return m.group(0)
        return f"{m.group('prefix')}{m.group('q')}{new}{m.group('q')}{m.group('suffix')}"

    out = _CSS_URL_RE.sub(css_sub, css)
    return _CSS_IMPORT_RE.sub(_import_sub_factory(base_url, doc_path, seen), out)
