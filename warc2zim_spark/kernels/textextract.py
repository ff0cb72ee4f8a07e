"""Frozen HTML → text extraction (the north-star byte-identical invariant).

The reference has no standalone text extractor — HtmlRewriter's HTML parse is
the underlying machinery (reference: rewriting.py:224-249). Per SURVEY.md §2
C12 and FIXTURES.md, *our* extractor is the frozen definition: golden outputs
are generated once from this kernel and every engine run must reproduce them
byte-identically per URL. Determinism is the contract, so the implementation
is pure stdlib ``html.parser`` with fixed whitespace rules:

* script/style/noscript/template/svg subtree text dropped
* character/entity refs decoded (html.parser convert_charrefs)
* block-level elements introduce a newline boundary; inline text concatenates
* runs of whitespace inside a line collapse to one space; lines are stripped;
  empty lines dropped; lines joined by "\n"
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_SKIP_SUBTREE = frozenset({"script", "style", "noscript", "template", "svg"})
_BLOCK_TAGS = frozenset({
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "details", "div", "dl", "dt", "fieldset", "figcaption", "figure",
    "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header",
    "hr", "html", "li", "main", "nav", "ol", "option", "p", "pre", "section",
    "select", "summary", "table", "tbody", "td", "tfoot", "th", "thead",
    "title", "tr", "ul",
})
_WS_RE = re.compile(r"[ \t\r\n\f\v ]+")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREE:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS and self._skip_depth == 0:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREE:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS and self._skip_depth == 0:
            self.parts.append("\n")

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS and self._skip_depth == 0:
            self.parts.append("\n")

    def handle_data(self, data):
        if self._skip_depth == 0 and data:
            self.parts.append(data)


def extract_text(html: str | None) -> str:
    """HTML string → frozen plain text. Empty/None → empty string."""
    if not html:
        return ""
    parser = _TextExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass  # salvage whatever was parsed; extraction must never raise
    raw = "".join(parser.parts)
    lines = []
    for line in raw.split("\n"):
        line = _WS_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)
