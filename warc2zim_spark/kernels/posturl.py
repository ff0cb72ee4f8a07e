"""POST/PUT request-body → canonical URL query ("urlkey" synthesis).

Reference semantics: cdxj_indexer/postquery.py:25-173 +
cdxj_indexer/bufferiter.py:99-114, pinned by
tests/cdxj_indexer/test_postappend.py:31-203.

Body handling by request mime:
* ``application/x-www-form-urlencoded`` → utf-8 decode + unquote_plus;
  UnicodeDecodeError → base64 fallback
* ``multipart/*`` → parse parts by boundary, urlencode (name, value) pairs;
  missing boundary → base64 fallback
* ``application/json`` → flatten to k=v pairs (dup keys suffixed ``.N_``,
  lists recurse with parent name, scalars stringified via str());
  parse failure → empty query
* ``text/plain`` → JSON-parse attempt, failure → base64 fallback
* anything else → ``__wb_post_data=<base64>``

Resulting query truncated at MAX_QUERY_LENGTH=4096 and appended to the URL as
``?__wb_method=<METHOD>[&<query>]`` (``&`` when the URL already has a query).

The multipart parser here is a minimal from-scratch boundary splitter
(python-multipart is not available); it handles standard form-data parts with
``name="..."`` and optional per-part headers, which is the subset the
reference tests exercise.
"""

from __future__ import annotations

import base64
import json
import re
from urllib.parse import unquote_plus, urlencode

MAX_QUERY_LENGTH = 4096  # postquery.py:9

_PART_NAME_RE = re.compile(rb'name="([^"]*)"')


def _handle_binary(body: bytes) -> str:
    return "__wb_post_data=" + base64.b64encode(body).decode()


def _json_flatten(raw: bytes | str) -> str:
    """postquery.py:138-173 ``json_parse``: depth-first flatten; dict values
    recurse keyed by their own name, list items recurse with the parent name,
    scalars stringify; duplicate names get ``.N_`` suffixes starting at 2.
    Falls back to JSON-lines when the whole body fails to parse."""
    data: dict[str, str] = {}
    dupes: dict[str, int] = {}

    def get_key(name: str) -> str:
        if name not in data:
            return name
        dupes.setdefault(name, 1)
        dupes[name] += 1
        return f"{name}.{dupes[name]}_"

    def walk(obj, name: str = "") -> None:
        if isinstance(obj, dict):
            for key, value in obj.items():
                walk(value, key)
        elif isinstance(obj, list):
            for value in obj:
                walk(value, name)
        elif name:
            data[get_key(name)] = str(obj)

    if isinstance(raw, str):
        raw = raw.encode("utf-8")
    try:
        walk(json.loads(raw))
    except json.JSONDecodeError:
        if b"\n" in raw:
            for line in raw.split(b"\n"):
                walk(json.loads(line))
        else:
            raise
    return urlencode(data)


def _parse_multipart(body: bytes, content_type: str) -> str | None:
    """Minimal multipart/form-data parser; None signals 'fall back to b64'."""
    if "boundary=" not in content_type:
        return None
    boundary = content_type.split("boundary=")[1].split(";")[0].strip().strip('"')
    if not boundary:
        return None
    delim = b"--" + boundary.encode("utf-8")
    values: list[tuple[str, str]] = []
    for chunk in body.split(delim):
        chunk = chunk.strip(b"\r\n")
        if not chunk or chunk == b"--":
            continue
        header_blob, _, part_body = chunk.partition(b"\r\n\r\n")
        m = _PART_NAME_RE.search(header_blob)
        if not m:
            continue
        name = m.group(1).decode("utf-8", errors="replace")
        values.append((name, part_body.decode("utf-8", errors="replace")))
    return urlencode(values, doseq=True)


def query_extract(
    mime: str | None,
    body: bytes | None,
    content_length: int | str | None = None,
) -> str | None:
    """postquery.py:47-135 ``query_extract`` over an in-memory body.

    ``content_length`` reproduces the reference's stream-read semantics: a
    valid int truncates/limits the body to that many bytes (postquery.py:64-72
    reads exactly Content-Length bytes, so a short header truncates the query —
    pinned by test_postappend.py::test_post_extract_length_too_short); a
    non-int, non-None value aborts extraction (returns None →
    ``?__wb_method=POST`` alone, postquery.py:57-62); None reads up to 8192.
    """
    if body is None:
        body = b""
    try:
        length = int(content_length)  # type: ignore[arg-type]
    except (ValueError, TypeError):
        if content_length is None:
            length = 8192
        else:
            return None
    body = body[:length]
    mime = mime or ""
    query = ""
    if mime.startswith("application/x-www-form-urlencoded"):
        try:
            query = unquote_plus(body.decode("utf-8"))
        except UnicodeDecodeError:
            query = _handle_binary(body)
    elif mime.startswith("multipart/"):
        parsed = _parse_multipart(body, mime)
        query = parsed if parsed is not None else _handle_binary(body)
    elif mime.startswith("application/json"):
        try:
            query = _json_flatten(body)
        except Exception:
            query = ""
    elif mime.startswith("text/plain"):
        try:
            query = _json_flatten(body)
        except Exception:
            query = _handle_binary(body)
    else:
        query = _handle_binary(body)
    return query[:MAX_QUERY_LENGTH] if query else query


def append_method_query(
    url: str,
    method: str,
    req_mime: str | None = None,
    req_body: bytes | None = None,
    content_length: int | str | None = None,
) -> str:
    """postquery.py:25-43 ``append_method_query``: URL + ``?__wb_method=<M>``
    (``&`` when the URL already has a query) + canonical body query for
    POST/PUT. Any method gets the ``__wb_method`` marker (pinned by
    test_postappend.py::test_options / ::test_head)."""
    if method in ("POST", "PUT"):
        query = query_extract(req_mime, req_body, content_length)
    else:
        query = ""
    sep = "&" if "?" in url else "?"
    appended = f"{sep}__wb_method={method}"
    if query:
        appended += "&" + query
    return url + appended


def canonical_request_url(
    url: str | None,
    method: str | None,
    req_mime: str | None = None,
    req_body: bytes | None = None,
    content_length: int | str | None = None,
) -> str | None:
    """The synthesized ``urlkey`` at the record level (bufferiter.py:99-114):
    only paired POST/PUT requests get a urlkey; everything else keeps the
    original URL (``get_record_url`` falls back to WARC-Target-URI,
    utils.py:52-57)."""
    if url is None:
        return None
    if not method or method.upper() not in ("POST", "PUT"):
        return url
    return append_method_query(url, method.upper(), req_mime, req_body, content_length)
