"""S1/S3 WARC-byte ingest: writer→parser round-trip + from-bytes engine
parity with the pre-parsed record table."""

from datetime import datetime

import pytest

from warc2zim_spark.sources.warcbytes import (
    parse_warc_bytes,
    records_to_warc_file,
)


def _rows():
    base = dict(
        concurrent_to=None, status=None, mime=None, resourcetype=None,
        http_location=None, refers_to_url=None, payload=b"", http_charset=None,
        req_method=None, req_mime=None, req_body=None, req_content_length=None,
        file_seq=0,
    )
    return [
        {**base, "rec_seq": 1, "rec_type": "warcinfo", "url": None,
         "warc_date": datetime(2025, 3, 1), "record_id": "<urn:uuid:1>",
         "mime": "application/warc-fields",
         "payload": b"software: synthetic-crawler 1.0\r\n"},
        {**base, "rec_seq": 2, "rec_type": "request", "url": "https://a.example/p",
         "warc_date": datetime(2025, 3, 1, 1, 2, 3), "record_id": "<urn:uuid:2>",
         "req_method": "POST", "req_mime": "application/json",
         "req_body": b'{"q": 1}', "req_content_length": 8},
        {**base, "rec_seq": 3, "rec_type": "response", "url": "https://a.example/p",
         "warc_date": datetime(2025, 3, 1, 1, 2, 3), "record_id": "<urn:uuid:3>",
         "concurrent_to": "<urn:uuid:2>", "status": 200, "mime": "text/html",
         "payload": b"<html>hi</html>", "http_charset": "utf-8"},
        {**base, "rec_seq": 4, "rec_type": "response", "url": "https://a.example/r",
         "warc_date": datetime(2025, 3, 1), "record_id": "<urn:uuid:4>",
         "status": 301, "mime": "text/html", "http_location": "/target",
         "payload": b"x"},
        {**base, "rec_seq": 5, "rec_type": "revisit", "url": "https://a.example/v",
         "warc_date": datetime(2025, 3, 1), "record_id": "<urn:uuid:5>",
         "status": 200, "refers_to_url": "https://a.example/p"},
        {**base, "rec_seq": 6, "rec_type": "response", "url": "https://a.example/ns",
         "warc_date": datetime(2025, 3, 1), "record_id": "<urn:uuid:6>",
         "status": None, "mime": "text/html", "payload": b"<html>n</html>"},
        {**base, "rec_seq": 7, "rec_type": "resource", "url": "https://a.example/res",
         "warc_date": datetime(2025, 3, 1), "record_id": "<urn:uuid:7>",
         "status": 200, "mime": "text/html", "resourcetype": "stylesheet",
         "payload": b".x{}"},
        {**base, "rec_seq": 8, "rec_type": "response", "url": "",
         "warc_date": datetime(2025, 3, 1), "record_id": "<urn:uuid:8>",
         "status": 200, "mime": "text/html", "payload": b"<html>e</html>"},
    ]


class TestRoundTrip:
    # fields that must survive bytes for every record type
    COMMON = (
        "rec_type", "url", "record_id", "concurrent_to", "refers_to_url",
        "resourcetype", "http_location", "http_charset",
        "req_method", "req_mime", "req_content_length",
    )

    @pytest.mark.parametrize("compress", [False, True], ids=["warc", "warc.gz"])
    def test_identity_on_engine_columns(self, compress):
        rows = _rows()
        data = records_to_warc_file(rows, compress=compress)
        parsed = list(parse_warc_bytes(data))
        assert len(parsed) == len(rows)
        for orig, p in zip(rows, parsed):
            for k in self.COMMON:
                assert p.get(k) == orig.get(k), (orig["rec_seq"], k)
            assert p["warc_date"] == orig["warc_date"]
            if orig["rec_type"] == "request":
                assert p["req_body"] == orig["req_body"]
            else:
                assert p["payload"] == (orig["payload"] or b"")
            if orig["rec_type"] in ("response", "revisit"):
                # status/mime live in the embedded HTTP message
                assert p["status"] == orig["status"]
                assert p["mime"] == orig["mime"]
            # resource/warcinfo records carry no HTTP block: status is not
            # representable in real WARC bytes (and content_records filters
            # those rec_types out anyway)

    def test_offsets_monotonic(self):
        parsed = list(parse_warc_bytes(records_to_warc_file(_rows())))
        offs = [p["offset"] for p in parsed]
        assert offs == sorted(offs) and offs[0] == 0


class TestFromBytesParity:
    def test_items_equal_table_items(self, spark, webdata, tmp_path):
        """The full proof: table → WARC bytes → binaryFile+mapInPandas parse
        → items_table gives the same items as the pre-parsed table."""
        import pyarrow.parquet as pq

        from warc2zim_spark.operators.items import items_table
        from warc2zim_spark.operators.records import content_records, load_records
        from warc2zim_spark.sources.datagen import write_warc_files
        from warc2zim_spark.sources.warcbytes import load_warc_records

        records_tbl = pq.read_table(f"{webdata}/warc_records.parquet")
        warc_dir = tmp_path / "warcs"
        write_warc_files(records_tbl, warc_dir)
        assert any(p.suffix == ".gz" for p in warc_dir.iterdir())

        from_bytes = items_table(
            content_records(load_warc_records(spark, str(warc_dir)))
        ).select("zim_path", "url", "mime", "status", "payload_len")
        from_table = items_table(
            content_records(load_records(spark, webdata))
        ).select("zim_path", "url", "mime", "status", "payload_len")
        a = sorted(map(tuple, from_bytes.collect()))
        b = sorted(map(tuple, from_table.collect()))
        assert a == b


class TestBasenameSortContract:
    def test_real_world_names_sorted_by_basename(self, spark, tmp_path):
        """Reference input ordering (tests/test_converter.py
        two_not_sorted_in_random_unsorted_dirs): files sort by file NAME
        regardless of directory."""
        from warc2zim_spark.sources.warcbytes import (
            load_warc_records,
            records_to_warc_file,
        )

        def rec(seq, url):
            from datetime import datetime

            return dict(
                file_seq=0, rec_seq=seq, rec_type="response", url=url,
                warc_date=datetime(2025, 3, 1), record_id=f"<urn:uuid:{seq}>",
                concurrent_to=None, status=200, mime="text/html",
                resourcetype=None, http_location=None, refers_to_url=None,
                payload=b"<html>x</html>", http_charset=None, req_method=None,
                req_mime=None, req_body=None, req_content_length=None,
            )

        (tmp_path / "aaaa").mkdir()
        (tmp_path / "bbb").mkdir()
        # later basename in the EARLIER directory
        (tmp_path / "aaaa" / "rec-h-20240724045846176-0.warc").write_bytes(
            records_to_warc_file([rec(1, "https://late.example/")])
        )
        (tmp_path / "bbb" / "rec-h-20240724035746176-0.warc").write_bytes(
            records_to_warc_file([rec(1, "https://early.example/")])
        )
        rows = (
            load_warc_records(spark, f"{tmp_path}/*")
            .orderBy("file_seq", "rec_seq")
            .select("file_seq", "url")
            .collect()
        )
        assert [(r.file_seq, r.url) for r in rows] == [
            (0, "https://early.example/"),
            (1, "https://late.example/"),
        ]
