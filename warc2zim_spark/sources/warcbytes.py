"""S1/S3 — real WARC-byte ingest (closing the last source gap the sandbox
allows; r01 verdict item 9).

Reference shape: cdxj_indexer/main.py:3-17 iterates WARC files with warcio's
ArchiveIterator; bufferiter.py:11-58 walks records sequentially per file,
tracking (offset, length) and pairing adjacent request/response. The Spark
shape is the same unit of parallelism: **one task per WARC file** via the
``binaryFile`` source, with a ``mapInPandas`` parser emitting one row per
record. Record-level splits inside a .warc/.warc.gz are impossible without
an external index (gzip members aren't seekable) — per-file tasks are what
every production WARC pipeline (including the reference) uses; at 100 TB
that is ~10^5 files of ~1 GB, ample parallelism.

The parser is stdlib-only (warcio is absent here): WARC/1.x framing
(headers / CRLF CRLF / Content-Length body / CRLF CRLF), the embedded HTTP
message for request/response records, and gzip member-concatenation for
.warc.gz. The writer half serializes the synthetic record table back to
spec-shaped bytes so tests can prove table → bytes → parse → table is the
identity on every engine-consumed column.

Non-standard bits, documented: ``WARC-Resource-Type`` carries the
browsertrix resourcetype (real crawls put it in WARC-JSON-Metadata);
a missing HTTP status is serialized as ``HTTP/1.1 0 NONE`` (status 0 ↔
NULL) because the fixture matrix includes a no-status row.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import re
from datetime import datetime, timezone
from typing import Iterator

CRLF = "\r\n"
_WARC_DATE_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"
_FILE_SEQ_RE = re.compile(r"warc-(\d+)\.warc(?:\.gz)?$")

# columns the parser emits — the engine-consumed subset of the record table
# (golden *_g oracle columns are datagen-only by design)
PARSED_SCHEMA = (
    "file_seq long, rec_seq long, offset long, rec_type string, url string, "
    "warc_date timestamp, record_id string, concurrent_to string, "
    "status int, mime string, resourcetype string, http_location string, "
    "refers_to_url string, payload binary, payload_head binary, payload_len long, "
    "payload_digest string, http_charset string, req_method string, "
    "req_mime string, req_body binary, req_content_length long"
)


# ---------------------------------------------------------------------------
# writer (fixture side): record dicts → WARC bytes
# ---------------------------------------------------------------------------

def _http_block(row: dict) -> bytes:
    """The embedded HTTP message for a request/response record."""
    if row["rec_type"] == "request":
        method = row.get("req_method") or "GET"
        lines = [f"{method} / HTTP/1.1"]
        body = row.get("req_body") or b""
        if row.get("req_mime"):
            lines.append(f"Content-Type: {row['req_mime']}")
        if row.get("req_content_length") is not None:
            lines.append(f"Content-Length: {row['req_content_length']}")
        else:
            lines.append(f"Content-Length: {len(body)}")
        return (CRLF.join(lines) + CRLF + CRLF).encode("utf-8") + body
    # response / revisit
    status = row.get("status")
    status_line = f"HTTP/1.1 {status if status is not None else '0 NONE'}"
    if status is not None:
        status_line = f"HTTP/1.1 {status} X"
    lines = [status_line]
    mime = row.get("mime")
    if mime:
        ct = mime
        if row.get("http_charset"):
            ct = f"{mime}; charset={row['http_charset']}"
        lines.append(f"Content-Type: {ct}")
    if row.get("http_location"):
        lines.append(f"Location: {row['http_location']}")
    body = row.get("payload") or b""
    lines.append(f"Content-Length: {len(body)}")
    return (CRLF.join(lines) + CRLF + CRLF).encode("utf-8") + body


def record_to_warc_bytes(row: dict) -> bytes:
    """One record-table row → one WARC/1.1 record (spec framing)."""
    rec_type = row["rec_type"]
    headers: list[tuple[str, str]] = [("WARC-Type", rec_type)]
    if row.get("record_id"):
        headers.append(("WARC-Record-ID", row["record_id"]))
    date = row.get("warc_date")
    if date is not None:
        if isinstance(date, datetime):
            headers.append(("WARC-Date", date.strftime(_WARC_DATE_FMT)))
        else:
            headers.append(("WARC-Date", str(date)))
    if row.get("url") is not None:
        headers.append(("WARC-Target-URI", row["url"]))
    if row.get("concurrent_to"):
        headers.append(("WARC-Concurrent-To", row["concurrent_to"]))
    if row.get("refers_to_url"):
        headers.append(("WARC-Refers-To-Target-URI", row["refers_to_url"]))
    if row.get("resourcetype"):
        headers.append(("WARC-Resource-Type", row["resourcetype"]))

    if rec_type in ("response", "revisit"):
        block = _http_block(row)
        headers.append(("Content-Type", "application/http; msgtype=response"))
    elif rec_type == "request":
        block = _http_block(row)
        headers.append(("Content-Type", "application/http; msgtype=request"))
    elif rec_type == "warcinfo":
        block = row.get("payload") or b""
        headers.append(("Content-Type", "application/warc-fields"))
    else:  # resource and friends: raw payload, record-level Content-Type
        block = row.get("payload") or b""
        if row.get("mime"):
            headers.append(("Content-Type", row["mime"]))

    headers.append(("Content-Length", str(len(block))))
    head = "WARC/1.1" + CRLF + CRLF.join(f"{k}: {v}" for k, v in headers)
    return head.encode("utf-8") + CRLF.encode() * 2 + block + CRLF.encode() * 2


def records_to_warc_file(rows: list[dict], compress: bool = False) -> bytes:
    """Rows (already one file's worth, in rec_seq order) → .warc[.gz] bytes;
    gz = one gzip member per record (the standard wget/browsertrix layout)."""
    if not compress:
        return b"".join(record_to_warc_bytes(r) for r in rows)
    out = io.BytesIO()
    for r in rows:
        out.write(gzip.compress(record_to_warc_bytes(r)))
    return out.getvalue()


# ---------------------------------------------------------------------------
# parser (engine side): WARC bytes → record rows
# ---------------------------------------------------------------------------

def _parse_http(block: bytes, msgtype: str) -> dict:
    out: dict = {}
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return {"payload": block}
    head, body = block[:sep], block[sep + 4 :]
    lines = head.decode("iso-8859-1").split(CRLF)
    first = lines[0]
    hdrs = {}
    for line in lines[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            hdrs[k.strip().lower()] = v.strip()
    if msgtype == "request":
        out["req_method"] = first.split(" ", 1)[0] or None
        out["req_mime"] = hdrs.get("content-type")
        out["req_body"] = body
        cl = hdrs.get("content-length")
        out["req_content_length"] = int(cl) if cl is not None else len(body)
    else:
        parts = first.split(" ")
        status = None
        if len(parts) >= 2 and parts[0].startswith("HTTP/"):
            try:
                status = int(parts[1])
            except ValueError:
                status = None
        out["status"] = status if status != 0 else None
        ct = hdrs.get("content-type", "")
        if ";" in ct:
            mime, _, params = ct.partition(";")
            out["mime"] = mime.strip() or None
            m = re.search(r"charset=([^;\s]+)", params, re.IGNORECASE)
            out["http_charset"] = m.group(1) if m else None
        else:
            out["mime"] = ct.strip() or None
            out["http_charset"] = None
        out["http_location"] = hdrs.get("location")
        out["payload"] = body
    return out


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Iterate records in one WARC file's bytes (handles gzip member
    concatenation transparently). Yields dicts keyed like PARSED_SCHEMA
    minus file_seq/rec_seq (caller adds provenance)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # concatenated members decompress as one
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        head_lines = data[pos:head_end].decode("iso-8859-1").split(CRLF)
        if not head_lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC record header at offset {pos}")
        hdrs = {}
        for line in head_lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                hdrs[k.strip().lower()] = v.strip()
        length = int(hdrs.get("content-length", "0"))
        block = data[head_end + 4 : head_end + 4 + length]
        rec_type = hdrs.get("warc-type", "")
        row: dict = {
            "offset": pos,
            "rec_type": rec_type,
            "url": hdrs.get("warc-target-uri"),
            "record_id": hdrs.get("warc-record-id"),
            "concurrent_to": hdrs.get("warc-concurrent-to"),
            "refers_to_url": hdrs.get("warc-refers-to-target-uri"),
            "resourcetype": hdrs.get("warc-resource-type"),
            "status": None, "mime": None, "http_charset": None,
            "http_location": None, "payload": b"",
            "req_method": None, "req_mime": None, "req_body": None,
            "req_content_length": None,
        }
        date = hdrs.get("warc-date")
        if date:
            try:
                row["warc_date"] = datetime.strptime(date, _WARC_DATE_FMT)
            except ValueError:
                row["warc_date"] = datetime.strptime(
                    date, "%Y-%m-%dT%H:%M:%SZ"
                )
        else:
            row["warc_date"] = None
        ct = hdrs.get("content-type", "")
        if rec_type in ("response", "revisit") and "application/http" in ct:
            row.update(_parse_http(block, "response"))
        elif rec_type == "request" and "application/http" in ct:
            row.update(_parse_http(block, "request"))
        elif rec_type == "warcinfo":
            row["payload"] = block
            row["mime"] = ct or None
        else:
            row["payload"] = block
            row["mime"] = ct or None
        payload = row.get("payload") or b""
        row["payload_head"] = payload[:1024]  # sniff/probe column (1 KiB)
        row["payload_len"] = len(payload)
        row["payload_digest"] = "sha256:" + hashlib.sha256(payload).hexdigest()
        yield row
        pos = head_end + 4 + length


def load_warc_records(spark, warc_dir: str):
    """The distributed source: ``binaryFile`` scan of ``warc_dir`` →
    mapInPandas parse → the engine record schema. One task per file (the
    WARC unit of parallelism); rec_seq is the within-file ordinal (globally
    ordered by (file_seq, rec_seq) exactly like the pre-parsed table).

    file_seq contract: fixture files named ``warc-NNNNN.warc[.gz]`` carry
    their sequence in the name; anything else (real-world names like
    ``rec-<host>-<timestamp>-0.warc.gz``) gets its **basename sort rank** —
    the reference's input ordering (converter.py sorts inputs by file name
    regardless of directory; pinned by tests/test_converter.py
    ``two_not_sorted_in_random_unsorted_dirs``)."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # discovery parity with the reference's iter_file_or_dir
    # (cdxj_indexer/main.py:3-17): os.walk RECURSES into subdirectories and
    # keeps exactly ALLOWED_EXT = (.arc, .arc.gz, .warc, .warc.gz) — its
    # tests/data/empty-file fixture exists to prove stray files are skipped.
    # pathGlobFilter is a cheap listing-time prefilter; the rlike pins the
    # exact extension set (the glob alone would admit e.g. "x.march").
    scan = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.*arc*")
        .option("recursiveFileLookup", "true")
        .load(warc_dir)
        .filter(F.col("path").rlike(r"\.(arc|warc)(\.gz)?$"))
    )
    # rank on a PATHS-ONLY projection: binaryFile prunes `content` when only
    # `path` is selected, so the global sort window moves a few strings, not
    # every WARC file's bytes — the content scan below stays one task per
    # file instead of collapsing into the window's single partition
    ranks = (
        scan.select("path")
        .withColumn("_base", F.element_at(F.split(F.col("path"), "/"), -1))
        .withColumn(
            "_rank",
            F.row_number().over(Window.orderBy("_base", "path")) - 1,
        )
        .select("path", "_rank")
    )
    files = scan.select("path", "content").join(F.broadcast(ranks), "path")

    def parse(batches):
        for pdf in batches:
            out: list[dict] = []
            for path, content, rank in zip(
                pdf["path"], pdf["content"], pdf["_rank"]
            ):
                m = _FILE_SEQ_RE.search(path)
                file_seq = int(m.group(1)) if m else int(rank)
                for i, row in enumerate(parse_warc_bytes(bytes(content))):
                    row["file_seq"] = file_seq
                    row["rec_seq"] = i + 1
                    out.append(row)
            if out:
                yield pd.DataFrame(out)

    return files.mapInPandas(parse, schema=PARSED_SCHEMA)
