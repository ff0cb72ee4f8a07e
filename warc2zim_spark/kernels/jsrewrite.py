"""C5 — JavaScript rewriting (SURVEY §2.7 slice 5; r01 verdict item 10).

Reference surface (rewriting.py:115-118, 255-262): records classified
``javascript`` run zimscraperlib's JsRewriter with ``isModule`` set when the
record's ZimPath was discovered as an ES module during the HTML pass
(``<script type="module" src>`` → ``notify_js_module`` → converter.py:227
accumulates ``js_modules`` and re-queues content — the two-round feedback).

zimscraperlib's actual JsRewriter (a port of wabac.js's JSRewriter) is
unavailable in this environment, so this kernel reproduces its two public
behaviors with a deterministic, clearly-scoped implementation:

* **module JS** — static ``import``/``export … from`` and dynamic
  ``import(…)`` string-literal specifiers are resolved against the document
  URL, canonicalized, and re-pointed document-relative when the target is a
  known item (same seen-set contract as the HTML/CSS rewriters); bare module
  specifiers (no ``/`` ``./`` ``../`` http prefix) are untouched, matching
  the browser's module-resolution rules.
* **classic JS** — wrapped in a wombat-style prologue/epilogue that shadows
  the escaping globals (window, self, document, location, top, parent,
  frames, opener) with the proxy lookup function, the structure wabac.js's
  wrapper uses. The exact wrapper text is a stand-in (byte parity with
  zimscraperlib cannot be pinned here); the SEAM is this constant only.

Byte-determinism is the contract (same golden policy as textextract.py).
"""

from __future__ import annotations

import re

from warc2zim_spark.kernels.urlrewrite import _rewrite_one

# the globals wabac.js/wombat shadow inside the classic-script wrapper
WRAPPED_GLOBALS = (
    "window", "self", "document", "location", "top", "parent",
    "frames", "opener",
)

WOMBAT_PROLOGUE = (
    "var _____WB$wombat$assign$function_____ = function(name) "
    "{return (self._wb_wombat && self._wb_wombat.local_init && "
    "self._wb_wombat.local_init(name)) || self[name]; };\n"
    "{\n"
    + "".join(
        f"let {g} = _____WB$wombat$assign$function_____(\"{g}\");\n"
        for g in WRAPPED_GLOBALS
    )
)
WOMBAT_EPILOGUE = "\n}"

# import specifiers: static (import/export ... from 'x'), side-effect
# (import 'x'), and dynamic (import('x'))
_STATIC_IMPORT_RE = re.compile(
    r"""(?P<prefix>\b(?:import|export)\b[^'";]*?\bfrom\s*)(?P<q>["'])(?P<spec>[^"']+)(?P=q)"""
)
_BARE_IMPORT_RE = re.compile(
    r"""(?P<prefix>\bimport\s*)(?P<q>["'])(?P<spec>[^"']+)(?P=q)"""
)
_DYNAMIC_IMPORT_RE = re.compile(
    r"""(?P<prefix>\bimport\(\s*)(?P<q>["'])(?P<spec>[^"']+)(?P=q)"""
)


def _is_url_specifier(spec: str) -> bool:
    """Bare specifiers ('lodash') resolve via import maps, not URLs — only
    path/url-shaped specifiers are candidates (the rule browsers use)."""
    return spec.startswith(("/", "./", "../", "http://", "https://"))


def find_module_imports(content: str | None) -> list[str]:
    """URL-shaped import specifiers in document order, deduped — the
    two-round feedback's discovery half for nested modules
    (JsRewriter's notify_js_module on import statements)."""
    if not content:
        return []
    out: list[str] = []
    for rx in (_STATIC_IMPORT_RE, _DYNAMIC_IMPORT_RE, _BARE_IMPORT_RE):
        for m in rx.finditer(content):
            spec = m.group("spec")
            if _is_url_specifier(spec) and spec not in out:
                out.append(spec)
    return out


def rewrite_js(
    content: str | None,
    base_url: str,
    seen: set[str] | frozenset[str],
    doc_path: str | None = None,
    is_module: bool = False,
) -> str:
    """JsRewriter.rewrite re-expressed: module → import-specifier
    re-pointing; classic → wombat wrap. Deterministic on bytes."""
    if not content:
        return ""
    if not is_module:
        return WOMBAT_PROLOGUE + content + WOMBAT_EPILOGUE
    from warc2zim_spark.kernels.surt import canonicalize

    if doc_path is None:
        doc_path = canonicalize(base_url) or ""

    def sub(m: re.Match) -> str:
        spec = m.group("spec")
        if not _is_url_specifier(spec):
            return m.group(0)
        new = _rewrite_one(spec, base_url, doc_path, seen)
        if new is None:
            return m.group(0)
        return f"{m.group('prefix')}{m.group('q')}{new}{m.group('q')}"

    out = _STATIC_IMPORT_RE.sub(sub, content)
    out = _DYNAMIC_IMPORT_RE.sub(sub, out)
    out = _BARE_IMPORT_RE.sub(sub, out)
    return out
