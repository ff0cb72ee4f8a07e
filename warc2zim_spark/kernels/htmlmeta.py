"""HTML metadata extraction: title, language cascade, icon links, outlinks.

Reference semantics:
* title — first ``<title>`` text (utils.py:141-146 ``parse_title``), truncated
  for ZIM metadata to 29 chars + "…" when >30 (converter.py:317-319 via
  zimscraperlib recompress; pinned length behavior in reference metadata tests)
* language — in-HTML cascade ``<html lang>`` → ``<meta http-equiv=
  content-language>`` → ``<meta name=language>`` (converter.py:744-778)
* icons — hrefs of ``<link rel~="icon">`` (rel is a token list — bs4
  ``find_all("link", rel="icon")`` matches e.g. ``rel="shortcut icon"``),
  deduplicated (icon_finder.py:59-80)
* outlinks — href/src values plus srcset candidate URLs and CSS ``url()``
  targets (the rewriting surface of zimscraperlib's HtmlRewriter,
  README.md:53-59; subset per SURVEY.md §2 C3)
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_WS_RE = re.compile(r"\s+")
_CSS_URL_RE = re.compile(r"""url\(\s*['"]?([^'")]+)['"]?\s*\)""", re.IGNORECASE)
_LINK_ATTRS = frozenset({"href", "src", "poster", "data-src"})


def extract_title(html: str | None) -> str:
    if not html:
        return ""
    m = _TITLE_RE.search(html)
    if not m:
        return ""
    from html import unescape

    return _WS_RE.sub(" ", unescape(m.group(1))).strip()


def truncated_title(title: str, limit: int = 30) -> str:
    """ZIM Title metadata truncation (converter.py:317-319)."""
    if len(title) > limit:
        return title[: limit - 1] + "…"
    return title


class _MetaExtractor(HTMLParser):
    """Single pass for lang cascade, icons, links, srcset, inline CSS urls."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.html_lang: str | None = None
        self.meta_http_equiv_lang: str | None = None
        self.meta_name_lang: str | None = None
        self.icons: list[str] = []
        self.links: list[str] = []
        self.js_module_srcs: list[str] = []
        self._in_style = False
        self._style_chunks: list[str] = []
        self.base_href: str | None = None

    def handle_starttag(self, tag, attrs):
        attrs_dict = {k.lower(): (v if v is not None else "") for k, v in attrs}
        if tag == "html" and self.html_lang is None and attrs_dict.get("lang"):
            self.html_lang = attrs_dict["lang"].strip()
        elif tag == "meta":
            http_equiv = attrs_dict.get("http-equiv", "").lower()
            name = attrs_dict.get("name", "").lower()
            content = attrs_dict.get("content", "").strip()
            if http_equiv == "content-language" and content and self.meta_http_equiv_lang is None:
                self.meta_http_equiv_lang = content
            elif name == "language" and content and self.meta_name_lang is None:
                self.meta_name_lang = content
        elif tag == "base" and self.base_href is None and attrs_dict.get("href"):
            self.base_href = attrs_dict["href"].strip()
        elif tag == "link":
            rel_tokens = attrs_dict.get("rel", "").lower().split()
            href = attrs_dict.get("href", "").strip()
            if href:
                self.links.append(href)
                if "icon" in rel_tokens:
                    self.icons.append(href)
        elif tag == "style":
            self._in_style = True
        if tag == "script":
            src = attrs_dict.get("src", "").strip()
            if src and attrs_dict.get("type", "").lower() == "module":
                self.js_module_srcs.append(src)
        for attr in _LINK_ATTRS:
            if tag != "link" and attrs_dict.get(attr):
                self.links.append(attrs_dict[attr].strip())
        if attrs_dict.get("srcset"):
            for candidate in attrs_dict["srcset"].split(","):
                url = candidate.strip().split()[0] if candidate.strip() else ""
                if url:
                    self.links.append(url)
        if attrs_dict.get("style"):
            self.links.extend(_CSS_URL_RE.findall(attrs_dict["style"]))

    def handle_endtag(self, tag):
        if tag == "style":
            self._in_style = False

    def handle_data(self, data):
        if self._in_style and data:
            self._style_chunks.append(data)

    def finish(self):
        for chunk in self._style_chunks:
            self.links.extend(_CSS_URL_RE.findall(chunk))


def extract_meta(html: str | None) -> dict:
    """One-pass extraction. Returns dict with keys:
    title, lang_decl (first non-empty of the cascade or None), icons (deduped,
    document order), links (deduped, document order), js_modules, base_href.
    """
    result = {
        "title": "",
        "lang_decl": None,
        "icons": [],
        "links": [],
        "js_modules": [],
        "base_href": None,
    }
    if not html:
        return result
    parser = _MetaExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass
    parser.finish()
    result["title"] = extract_title(html)
    for lang in (parser.html_lang, parser.meta_http_equiv_lang, parser.meta_name_lang):
        if lang:
            result["lang_decl"] = lang
            break
    result["icons"] = list(dict.fromkeys(parser.icons))
    result["links"] = list(dict.fromkeys(parser.links))
    result["js_modules"] = list(dict.fromkeys(parser.js_module_srcs))
    result["base_href"] = parser.base_href
    return result


def extract_links(html: str | None) -> list[str]:
    return extract_meta(html)["links"]


def extract_icons(html: str | None) -> list[str]:
    return extract_meta(html)["icons"]
