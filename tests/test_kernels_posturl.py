"""POST/PUT canonicalization — exact port of reference
tests/cdxj_indexer/test_postappend.py:31-203."""

from warc2zim_spark.kernels.posturl import (
    append_method_query,
    canonical_request_url,
    query_extract,
)

POST_DATA = b"foo=bar&dir=%2Fbaz"
BINARY_POST_DATA = b"\x816l`L\xa04P\x0e\xe0r\x02\xb5\x89\x19\x00fP\xdb\x0e\xb0\x02,"


def appended(url, method, mime, body, length=None):
    return append_method_query(url, method, mime, body, length if length is not None else len(body or b""))


class TestPostQueryExtract:
    def test_post_extract_1(self):
        assert (
            appended("http://example.com/", "POST", "application/x-www-form-urlencoded", POST_DATA)
            == "http://example.com/?__wb_method=POST&foo=bar&dir=/baz"
        )
        assert (
            appended("http://example.com/?123=ABC", "POST", "application/x-www-form-urlencoded", POST_DATA)
            == "http://example.com/?123=ABC&__wb_method=POST&foo=bar&dir=/baz"
        )

    def test_post_extract_json(self):
        body = b'{"a": "b", "c": {"a": 2}, "d": "e"}'
        assert (
            appended("http://example.com/", "POST", "application/json", body)
            == "http://example.com/?__wb_method=POST&a=b&a.2_=2&d=e"
        )

    def test_post_extract_json_top_list(self):
        body = b'[{"a": "b", "c": {"a": 2}}, {"d": "e"}, "ignored", false, null, 0]'
        assert (
            appended("http://example.com/", "POST", "application/json", body)
            == "http://example.com/?__wb_method=POST&a=b&a.2_=2&d=e"
        )

    def test_post_extract_json_lines(self):
        body = b'{"a": "b"}\n{"c": {"a": 2}, "d": "e"}'
        assert (
            appended("http://example.com/", "POST", "application/json", body)
            == "http://example.com/?__wb_method=POST&a=b&a.2_=2&d=e"
        )

    def test_put_extract_method(self):
        assert (
            appended("http://example.com/", "PUT", "application/x-www-form-urlencoded", POST_DATA)
            == "http://example.com/?__wb_method=PUT&foo=bar&dir=/baz"
        )

    def test_post_extract_non_form_data_1(self):
        assert (
            appended("http://example.com/", "POST", "application/octet-stream", POST_DATA)
            == "http://example.com/?__wb_method=POST&__wb_post_data=Zm9vPWJhciZkaXI9JTJGYmF6"
        )

    def test_post_extract_non_form_data_2(self):
        assert (
            appended("http://example.com/pathbar?id=123", "POST", "text/plain", POST_DATA)
            == "http://example.com/pathbar?id=123&__wb_method=POST"
            "&__wb_post_data=Zm9vPWJhciZkaXI9JTJGYmF6"
        )

    def test_post_extract_length_invalid_ignore(self):
        assert (
            appended("http://example.com/", "POST", "application/x-www-form-urlencoded", POST_DATA, 0)
            == "http://example.com/?__wb_method=POST"
        )
        assert (
            append_method_query(
                "http://example.com/", "POST", "application/x-www-form-urlencoded", POST_DATA, "abc"
            )
            == "http://example.com/?__wb_method=POST"
        )

    def test_post_extract_length_too_short(self):
        assert (
            appended(
                "http://example.com/", "POST", "application/x-www-form-urlencoded",
                POST_DATA, len(POST_DATA) - 4,
            )
            == "http://example.com/?__wb_method=POST&foo=bar&dir=%2"
        )

    def test_post_extract_length_too_long(self):
        assert (
            appended(
                "http://example.com/", "POST", "application/x-www-form-urlencoded",
                POST_DATA, len(POST_DATA) + 4,
            )
            == "http://example.com/?__wb_method=POST&foo=bar&dir=/baz"
        )

    def test_post_extract_malformed_form_data(self):
        assert (
            appended(
                "http://example.com/", "POST", "application/x-www-form-urlencoded",
                BINARY_POST_DATA,
            )
            == "http://example.com/?__wb_method=POST"
            "&__wb_post_data=gTZsYEygNFAO4HICtYkZAGZQ2w6wAiw="
        )

    def test_post_extract_no_boundary_in_multipart_form_mimetype(self):
        assert (
            appended("http://example.com/", "POST", "multipart/form-data", POST_DATA)
            == "http://example.com/?__wb_method=POST&__wb_post_data=Zm9vPWJhciZkaXI9JTJGYmF6"
        )

    def test_options(self):
        assert (
            appended("http://example.com/", "OPTIONS", "", b"")
            == "http://example.com/?__wb_method=OPTIONS"
        )

    def test_head(self):
        assert (
            appended("http://example.com/", "HEAD", "", b"")
            == "http://example.com/?__wb_method=HEAD"
        )

    def test_multipart_with_boundary(self):
        body = (
            b"--XX\r\n"
            b'Content-Disposition: form-data; name="a"\r\n\r\n'
            b"b\r\n"
            b"--XX\r\n"
            b'Content-Disposition: form-data; name="c d"\r\n\r\n'
            b"e f\r\n"
            b"--XX--\r\n"
        )
        assert (
            appended("http://example.com/", "POST", "multipart/form-data; boundary=XX", body)
            == "http://example.com/?__wb_method=POST&a=b&c+d=e+f"
        )

    def test_query_truncated_at_4096(self):
        body = ("k=" + "v" * 5000).encode()
        q = query_extract("application/x-www-form-urlencoded", body, len(body))
        assert len(q) == 4096


class TestCanonicalRequestUrl:
    def test_get_untouched(self):
        assert canonical_request_url("http://e.com/", "GET") == "http://e.com/"
        assert canonical_request_url("http://e.com/", None) == "http://e.com/"

    def test_post_synthesized(self):
        assert (
            canonical_request_url(
                "http://e.com/", "POST", "application/x-www-form-urlencoded",
                POST_DATA, len(POST_DATA),
            )
            == "http://e.com/?__wb_method=POST&foo=bar&dir=/baz"
        )
