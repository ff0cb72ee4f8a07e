"""Rewrite-mode classifier + JSONP/JSON rewriting + icon ranking.

Reference semantics:
* classifier — rewriting.py:128-214 decision tree over (mimetype,
  WARC-Resource-Type, request method, path suffix, jsonp callback in URL);
  resource-type table *overrides* the mime table when the header is present;
  pinned by tests/test_warc_to_zim.py:752-778
* jsonp — rewriting.py:22-26, 264-276: splice the callback name from the
  request URL over the recorded callback
* icon rank — icon_finder.py:25-56 comparator: exactly-48px best; else any
  >48 beats any <48, and WITHIN each of those tiers BIGGER min-dimension
  wins (all 14 reference comparator cases ported in
  tests/test_kernels_misc.py)

The classifier is additionally exposed engine-side as a pure Spark Column
expression (functions/expressions.py) so the hot path stays JVM-side; this
Python twin is the generator/golden oracle.
"""

from __future__ import annotations

import re

JS_MIMES = frozenset({
    "text/javascript",
    "application/javascript",
    "application/x-javascript",
})
JSONP_CALLBACK_RE = re.compile(r"[?].*(?:callback|jsonp)=([^&]+)", re.I)
JSONP_BODY_RE = re.compile(
    r"^(?:\s*(?:(?:\/\*[^*]*\*\/)|(?:\/\/[^\n]+[\n])))*\s*([\w.]+)\([{[]"
)


def extract_jsonp_callback(url: str | None) -> str | None:
    if not url:
        return None
    m = JSONP_CALLBACK_RE.match(url)
    if not m or m.group(1) == "?":
        return None
    return m.group(1)


def mimetype_rewrite_mode(mimetype: str, url: str, zim_path: str, method: str) -> str | None:
    """rewriting.py:186-214."""
    if mimetype == "text/html":
        return None if method == "POST" else "html"
    if mimetype == "text/css":
        return "css"
    if mimetype in JS_MIMES:
        if extract_jsonp_callback(url):
            return "jsonp"
        if zim_path.endswith(".json"):
            return "json"
        return "javascript"
    if mimetype == "application/json":
        return "json"
    return None


def resourcetype_rewrite_mode(
    resourcetype: str, mimetype: str, url: str, zim_path: str, method: str
) -> str | None:
    """rewriting.py:156-184."""
    if resourcetype in ("document", "xhr", "fetch") and mimetype == "text/html":
        return "html" if method == "GET" else None
    if resourcetype == "stylesheet":
        return "css"
    if resourcetype in ("script", "fetch", "other", "xhr", "manifest") and (
        mimetype == "application/json" or zim_path.endswith(".json")
    ):
        return "json"
    if resourcetype in ("script", "other", "xhr") and mimetype in JS_MIMES:
        return "jsonp" if extract_jsonp_callback(url) else "javascript"
    return None


def rewrite_mode(
    mimetype: str | None,
    resourcetype: str | None,
    url: str | None,
    zim_path: str | None,
    method: str | None = "GET",
) -> str | None:
    """rewriting.py:128-154: resource-type result wins when the header exists."""
    mimetype = (mimetype or "").split(";")[0].strip()
    url = url or ""
    zim_path = zim_path or ""
    method = (method or "GET").upper()
    if not resourcetype:
        return mimetype_rewrite_mode(mimetype, url, zim_path, method)
    return resourcetype_rewrite_mode(
        resourcetype.lower().strip(), mimetype, url, zim_path, method
    )


def rewrite_jsonp(content: str | None, url: str | None) -> str:
    """rewriting.py:264-276 mirrored exactly, including the reference's literal
    ``callback + match.group(1)`` return (the output is the requested callback
    name concatenated with the recorded one — a reference quirk; unpinned by
    its tests but reproduced verbatim for parity). Passthrough when the body
    doesn't look like JSONP or the URL carries no callback parameter."""
    if content is None:
        return ""
    m = JSONP_BODY_RE.match(content)
    if not m:
        return content
    callback = extract_jsonp_callback(url)
    if not callback:
        return content
    return callback + m.group(1)


ZIM_ILLUSTRATION_SIZE = 48


def icon_rank(width: int, height: int) -> tuple[int, int]:
    """Sort key reproducing icon_finder.py:25-56 (descending preference when
    sorted descending): tier 2 = exactly 48, tier 1 = >48 (bigger better —
    ``elif a_min < b_min: return -1  # prefer biggest icon (b)``), tier 0 =
    <48 (bigger better). Pinned by the reference's tests/test_icon_finder.py
    ``two_items_with_size2/3`` where 128×128 sorts before 96×96."""
    m = min(width, height)
    if m == ZIM_ILLUSTRATION_SIZE:
        return (2, 0)
    if m > ZIM_ILLUSTRATION_SIZE:
        return (1, m)
    return (0, m)
