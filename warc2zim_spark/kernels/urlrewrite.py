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
    return sorted(targets)


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

    return _CSS_URL_RE.sub(css_sub, css)
