"""Charset decode kernel tests — ported matrix from reference
tests/test_utils.py:28-290 (content-declared / http-header / try-list tiers,
alias table, error path)."""

from pathlib import Path

import pytest

from warc2zim_spark.kernels.decode import (
    extract_charset_from_content_type,
    resolve_encoding_alias,
    sniff_declared_charset,
    to_string,
    to_string_or_none,
)

CONTENTS = {
    "ascii": "abc",
    "latin1": "café",
    "latin2": "Bűvös",
    "chinese": "你好",
}


def make_html(content: str, declared: str | None, encode_as: str) -> bytes:
    decl = f'<meta charset="{declared}">' if declared else ""
    return f"<html><head>{decl}</head><body>{content}</body></html>".encode(encode_as)


class TestContentDeclaredTier:
    @pytest.mark.parametrize(
        "content,charset",
        [
            ("abc", "ascii"),
            ("café", "utf-8"),
            ("café", "latin1"),
            ("Bűvös", "latin2"),
            ("Bűvös", "utf-8"),
            ("你好", "gbk"),
            ("你好", "gb2312"),
            ("你好", "utf-8"),
        ],
    )
    def test_declared_charset_wins(self, content, charset):
        payload = make_html(content, charset, charset)
        assert to_string(payload, None, ["ascii"]) == payload.decode(charset)

    def test_declared_utf16(self):
        payload = make_html("café", "utf-16", "utf-16")
        assert "café" in to_string(payload, None, [])

    def test_misdeclared_charset_still_used_with_replace(self):
        # declared latin1 but encoded utf-8: decode with declared, errors=replace
        payload = make_html("café", "ascii", "utf-8")
        out = to_string(payload, None, [])
        assert "caf" in out  # é mangled by design (errors=replace)

    def test_declaration_beyond_window_ignored(self):
        payload = (b" " * 2000) + b'<meta charset="utf-8">caf\xc3\xa9'
        # tier (a) misses it; tier (c) utf-8 strict succeeds
        assert "café" in to_string(payload, None, ["utf-8"], 1024)

    def test_sniff_finds_quoted_and_unquoted(self):
        assert sniff_declared_charset(b'<meta charset=utf-8>') == "utf-8"
        assert sniff_declared_charset(b"<meta charset='gbk'>") == "gbk"
        assert sniff_declared_charset(b'encoding="latin1"') == "latin1"
        assert sniff_declared_charset(b"no declaration here") is None

    def test_ignore_content_header_flag(self):
        payload = make_html("café", "latin1", "latin1")
        out = to_string(payload, "utf-8", [], ignore_content_header_charsets=True)
        assert "caf" in out  # decoded as utf-8 (http tier), é replaced


class TestHttpHeaderTier:
    def test_http_charset_used(self):
        payload = "café".encode("latin1")
        assert to_string(payload, "latin1", []) == "café"

    @pytest.mark.parametrize(
        "alias,expected",
        [
            ("ansi", "windows-1252"),
            ("65001", "utf-8"),
            ("unicode", "utf-8"),
            ("utf-08", "utf-8"),
            ("UTF-8", "utf-8"),
            ("iso88591", "iso-8859-1"),
            ("windows-8859-1", "iso-8859-1"),
            ("unknown-charset", "unknown-charset"),
        ],
    )
    def test_aliases(self, alias, expected):
        assert resolve_encoding_alias(alias) == expected

    def test_http_alias_decode(self):
        payload = "café".encode("windows-1252")
        assert to_string(payload, "ansi", []) == "café"

    def test_http_bad_bytes_replaced(self):
        payload = b"caf\xe9"  # latin1 bytes
        out = to_string(payload, "utf-8", [])
        assert out == "caf�"


class TestTryListTier:
    def test_first_strict_success_wins(self):
        payload = "café".encode("utf-8")
        assert to_string(payload, None, ["ascii", "utf-8", "latin1"]) == "café"

    def test_strict_failure_falls_through(self):
        payload = "café".encode("latin1")
        assert to_string(payload, None, ["utf-8", "latin1"]) == "café"

    def test_exhaustion_raises(self):
        payload = b"\xff\xfe\xff invalid \xff"
        with pytest.raises(ValueError):
            to_string(payload, None, ["ascii", "utf-8"])
        assert to_string_or_none(payload, None, ["ascii", "utf-8"]) is None

    def test_unknown_codec_in_list_skipped(self):
        assert to_string(b"abc", None, ["not-a-codec", "ascii"]) == "abc"


class TestEdgeCases:
    def test_empty_and_none(self):
        assert to_string(b"", "utf-8", []) == ""
        assert to_string(None, None, []) == ""

    def test_str_passthrough(self):
        assert to_string("déjà", None, []) == "déjà"

    def test_content_type_charset_extraction(self):
        assert extract_charset_from_content_type("text/html; charset=utf-8") == "utf-8"
        assert extract_charset_from_content_type('text/html; charset="gbk"') == "gbk"
        assert extract_charset_from_content_type("text/html") is None
        assert extract_charset_from_content_type(None) is None


class TestReferenceEncodingMatrix:
    """Verbatim port of reference tests/test_rewriting.py
    test_generic_rewriting_encoding_handling: content in UTF-8 or ISO-8859-1,
    Content-Type with/without a declared charset, charsets_to_try
    ['UTF-8','ISO-8859-1'] — the decoded string must round-trip."""

    import itertools as _it

    CASES = [
        (enc, ct_base + declared)
        for enc in ("UTF-8", "ISO-8859-1")
        for ct_base in ("text/html", "text/css", "text/javascript", "youdontknowme")
        for declared in ("", "; charset={enc}")
    ]

    @pytest.mark.parametrize("encoding,ct_tmpl", CASES)
    def test_round_trip(self, encoding, ct_tmpl):
        from warc2zim_spark.kernels.decode import to_string_or_none

        content_str = "Bérénice"
        content_type = ct_tmpl.format(enc=encoding)
        payload = content_str.encode(encoding)
        # the reference splits the HTTP Content-Type into mime + charset
        http_charset = None
        if ";" in content_type:
            http_charset = content_type.split("charset=")[1]
        mime = content_type.split(";")[0]
        out = to_string_or_none(
            payload, http_charset, ["UTF-8", "ISO-8859-1"],
            ignore_content_header_charsets=(mime != "text/html"),
        )
        assert out == content_str, (encoding, content_type)


class TestProbeDecodeFailureParity:
    """The quarantine fast probe (header-bytes codec check, no full-payload
    decode) must agree exactly with to_string's raise behavior — it exists
    only as a cost optimization."""

    CASES = [
        # (payload, http_charset, mode)
        (b'<html><meta charset="bogus-enc"><body>x</body></html>', None, "html"),
        (b'<html><meta charset="bogus-enc"><body>x</body></html>', None, "css"),
        (b"body { color: red }", "bogus-charset", "css"),
        (b"body { color: red }", "utf-8", "css"),
        (b"<html><body>plain</body></html>", None, "html"),
        (b"\xff\xfe\x00bytes with no declaration", None, "html"),
        (b'<html><meta charset="utf-8"><body>ok</body></html>', None, "html"),
        (b'<html><meta charset="iso88591"><body>alias</body></html>', None, "html"),
        (b"", None, "html"),
    ]

    def test_parity_with_to_string(self):
        from warc2zim_spark.kernels.decode import to_string
        from warc2zim_spark.operators.quarantine import _probe_decode_failure

        for payload, charset, mode in self.CASES:
            try:
                to_string(
                    payload, charset,
                    ignore_content_header_charsets=(mode != "html"),
                )
                slow_fails = None
            except Exception as exc:  # noqa: BLE001
                slow_fails = f"{type(exc).__name__}: {exc}"[:200]
            fast = _probe_decode_failure(payload, charset, mode, None)
            assert fast == slow_fails, (payload, charset, mode, fast, slow_fails)

    def test_parity_with_aliases(self):
        from warc2zim_spark.operators.quarantine import _probe_decode_failure

        aliases = {"bogus-enc": "utf-8"}
        assert _probe_decode_failure(
            b'<html><meta charset="bogus-enc"><body>x</body></html>',
            None, "html", aliases,
        ) is None


class TestReferenceEncodingsCorpus:
    """The reference's real-world encodings corpus
    (tests/encodings/definition.json + 8 captured files, reference
    tests/test_utils.py:280-291 `test_decode_files`), run against the
    ENGINE's decode cascade by reading the reference's own data files in
    place (read-only; nothing copied). Every expected string must survive
    the 3-tier decode exactly as it does in the reference."""

    CORPUS = Path("/root/reference/tests/encodings")

    def _cases(self):
        import json

        data = json.loads((self.CORPUS / "definition.json").read_bytes())
        for f in data["files"]:
            yield (
                f["filename"],
                f.get("http_charset"),
                f.get("expected_strings", []),
            )

    @pytest.mark.skipif(
        not Path("/root/reference/tests/encodings/definition.json").exists(),
        reason="reference corpus not present",
    )
    def test_decode_files(self):
        from warc2zim_spark.kernels.decode import to_string

        checked = 0
        for filename, http_charset, expected in self._cases():
            result = to_string(
                (self.CORPUS / filename).read_bytes(),
                http_charset,
                ["UTF-8", "latin1"],
                1024,
            )
            for s in expected:
                assert s in result, (filename, s)
                checked += 1
        assert checked >= 10  # corpus actually exercised


class TestHeaderBytesWindow:
    """Reference tests/test_utils.py:293-365 — the content-declaration tier
    only sees the first ``header_bytes`` bytes; declarations beyond the
    window fall through to the try-list, and the per-run alias table
    resolves (or fails to resolve) a declared nonsense charset."""

    def test_too_far_away_without_fallback(self):
        content = '<html><meta charset="latin1"><body>content</body></html>'
        with pytest.raises(ValueError, match="No suitable charset"):
            to_string(content.encode("latin1"), None, [], 24)

    def test_too_far_away_with_fallback(self):
        content = '<html><meta charset="latin1"><body>content</body></html>'
        assert to_string(content.encode("latin1"), None, ["latin1"], 24) == content

    def test_far_away_but_inside_window(self):
        content = (
            f'<html>{"".join("-" for _ in range(1024))}<meta charset="latin1">'
            "<body>content</body></html>"
        )
        assert to_string(content.encode("latin1"), None, [], 1200) == content

    def test_unknown_declared_charset_with_alias(self):
        content = '<html><meta charset="foo"><body>content</body></html>'
        assert (
            to_string(
                content.encode("latin1"), None, [], 1024,
                extra_aliases={"foo": "latin1"},
            )
            == content
        )

    def test_unknown_declared_charset_without_proper_alias(self):
        content = '<html><meta charset="foo"><body>content</body></html>'
        with pytest.raises(LookupError, match="unknown encoding: foo"):
            to_string(
                content.encode("latin1"), None, [], 1024,
                extra_aliases={"bar": "latin1"},
            )


class TestAliasReferenceVerbatim:
    """Reference tests/test_utils.py:368-404, ported verbatim — the full
    builtin alias matrix incl. whitespace/case normalization, the unknown
    passthrough, and the user override (the engine's per-run
    ``extra_aliases`` is the reference's ``set_encoding_aliases``)."""

    @pytest.mark.parametrize(
        "alias,expected",
        [
            ("ansi", "windows-1252"),
            ("65001", "utf-8"),
            ("iso-utf-8", "utf-8"),
            ("u", "utf-8"),
            ("unicode", "utf-8"),
            ("utf-8", "utf-8"),
            ("utf-08", "utf-8"),
            ("utf-f", "utf-8"),
            ("utp-8", "utf-8"),
            ("windows-8859-1", "iso-8859-1"),
            ("iso88591", "iso-8859-1"),
            ("   uNiCoDe    ", "utf-8"),
            ("   U    ", "utf-8"),
            ("UNICODE", "utf-8"),
        ],
    )
    def test_default_encoding_aliases(self, alias, expected):
        assert resolve_encoding_alias(alias) == expected

    def test_get_unknown_encoding(self):
        assert resolve_encoding_alias("unKnown") == "unknown"

    @pytest.mark.parametrize("alias", ["Unicode", "unicode"])
    def test_override_default_encoding_alias(self, alias):
        assert resolve_encoding_alias(
            alias, extra={"unicode": "latin1"}
        ) == "latin1"

    def test_weird_encoding_not_declared_not_in_try_list(self):
        with pytest.raises(ValueError):
            to_string("Latin1 contént".encode("latin1"), None, ["UTF-8"], 1024)

    def test_weird_encoding_not_declared_in_try_list(self):
        content = "Latin1 contént"
        assert to_string(
            content.encode("latin1"), None, ["UTF-8", "latin1"], 1024
        ) == content
