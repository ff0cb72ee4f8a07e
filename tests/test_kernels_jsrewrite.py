"""C5 JS rewrite kernel — module import re-pointing + classic wombat wrap."""

from warc2zim_spark.kernels.jsrewrite import (
    WOMBAT_EPILOGUE,
    WOMBAT_PROLOGUE,
    find_module_imports,
    rewrite_js,
)

SEEN = frozenset(
    {
        "example.com/js/mod1.mjs",
        "example.com/js/mod2.mjs",
        "example.com/lib/util.js",
    }
)
BASE = "https://example.com/js/mod0.mjs"


class TestClassicWrap:
    def test_wraps_with_wombat_prologue(self):
        out = rewrite_js("var x = window.location;", BASE, SEEN, is_module=False)
        assert out.startswith(WOMBAT_PROLOGUE)
        assert out.endswith(WOMBAT_EPILOGUE)
        assert "var x = window.location;" in out

    def test_empty(self):
        assert rewrite_js(None, BASE, SEEN) == ""
        assert rewrite_js("", BASE, SEEN) == ""


class TestModuleImports:
    def test_static_relative_seen(self):
        out = rewrite_js(
            "import { a } from './mod1.mjs';", BASE, SEEN, is_module=True
        )
        assert out == "import { a } from 'mod1.mjs';"

    def test_static_absolute_path(self):
        out = rewrite_js(
            'import x from "/lib/util.js";', BASE, SEEN, is_module=True
        )
        assert out == 'import x from "../lib/util.js";'

    def test_dynamic_import(self):
        out = rewrite_js(
            "const p = import('./mod2.mjs');", BASE, SEEN, is_module=True
        )
        assert out == "const p = import('mod2.mjs');"

    def test_unseen_kept(self):
        src = "import z from 'https://cdn-missing.example/lib.js';"
        assert rewrite_js(src, BASE, SEEN, is_module=True) == src

    def test_bare_specifier_kept(self):
        src = "import 'lodash';\nimport { m } from 'lodash/map';"
        assert rewrite_js(src, BASE, SEEN, is_module=True) == src

    def test_export_from(self):
        out = rewrite_js(
            "export { a } from './mod1.mjs';", BASE, SEEN, is_module=True
        )
        assert out == "export { a } from 'mod1.mjs';"

    def test_module_not_wrapped(self):
        out = rewrite_js("export const x = 1;", BASE, SEEN, is_module=True)
        assert WOMBAT_PROLOGUE not in out


class TestFindModuleImports:
    def test_url_shaped_only_deduped(self):
        src = (
            "import { a } from './mod1.mjs';\n"
            "import('./mod1.mjs');\n"
            "import 'bare';\n"
            "import 'https://cdn.example/x.js';\n"
        )
        assert find_module_imports(src) == [
            "./mod1.mjs",
            "https://cdn.example/x.js",
        ]

    def test_empty(self):
        assert find_module_imports(None) == []
        assert find_module_imports("var x = 1;") == []
