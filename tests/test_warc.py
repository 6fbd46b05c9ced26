"""WARC source connector (warc.py): record parsing (per-member gzip /
whole-stream gzip / plain), HTTP envelope stripping, malformed-record
resync, and the writer↔reader roundtrip. The Spark integration test
lives in test_spark_integration.py (needs the shared session)."""

import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_trafilatura_spark.warc import (
    build_warc, iter_warc_records, warc_record_rows,
)

RECORDS = [
    ("https://ex.com/a", "2024-01-02T03:04:05Z", b"<html><body><p>A</p></body></html>"),
    ("https://ex.com/b", "2024-01-02T03:04:06Z", b"<html><body><p>B</p></body></html>"),
    ("https://ex.com/c", "2024-01-02T03:04:07Z", "<p>ümläut</p>".encode()),
]


def test_roundtrip_per_record_gzip():
    data = build_warc(RECORDS, per_record_gzip=True)
    assert data[:2] == b"\x1f\x8b"
    rows = warc_record_rows(data)
    assert [(u, t) for u, t, _ in rows] == [(u, t) for u, t, _ in RECORDS]
    assert rows[0][2] == RECORDS[0][2]
    assert rows[2][2] == RECORDS[2][2]


def test_roundtrip_plain_and_wholestream_gzip():
    plain = build_warc(RECORDS, per_record_gzip=False)
    assert warc_record_rows(plain) == warc_record_rows(
        build_warc(RECORDS, per_record_gzip=True))
    whole = gzip.compress(plain)
    assert warc_record_rows(whole) == warc_record_rows(plain)


def test_non_response_records_skipped():
    data = build_warc(RECORDS[:1], per_record_gzip=False)
    warcinfo = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                b"Content-Length: 4\r\n\r\ninfo\r\n\r\n")
    rows = warc_record_rows(warcinfo + data)
    assert len(rows) == 1 and rows[0][0] == "https://ex.com/a"


def test_non_2xx_and_missing_uri_skipped():
    html = b"<html></html>"
    http404 = (b"HTTP/1.1 404 Not Found\r\nContent-Length: "
               + str(len(html)).encode() + b"\r\n\r\n" + html)
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://ex.com/missing\r\n"
           b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           b"Content-Length: " + str(len(http404)).encode() + b"\r\n\r\n"
           + http404 + b"\r\n\r\n")
    assert warc_record_rows(rec) == []
    no_uri = (b"WARC/1.0\r\nWARC-Type: response\r\n"
              b"Content-Length: 2\r\n\r\nhi\r\n\r\n")
    assert warc_record_rows(no_uri) == []


def test_malformed_record_resync():
    good = build_warc(RECORDS[:1], per_record_gzip=False)
    garbage = b"WARC/1.0\r\nContent-Length: notanumber\r\n\r\nxx\r\n\r\n"
    rows = warc_record_rows(garbage + good)
    assert len(rows) == 1 and rows[0][0] == "https://ex.com/a"
    # truncated payload at EOF: dropped, earlier records survive
    truncated = good + good[: len(good) // 2]
    assert len(warc_record_rows(truncated)) == 1


def test_truncated_gzip_member_dropped():
    data = build_warc(RECORDS, per_record_gzip=True)
    # chop the final member mid-stream
    rows = warc_record_rows(data[: len(data) - 10])
    assert [r[0] for r in rows] == ["https://ex.com/a", "https://ex.com/b"]


def test_bare_document_payload():
    # some writers store the document without an HTTP envelope
    html = b"<html><body>bare</body></html>"
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://ex.com/bare\r\n"
           b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n"
           + html + b"\r\n\r\n")
    rows = warc_record_rows(rec)
    assert rows == [("https://ex.com/bare", "2024-01-01T00:00:00Z", html)]


def test_record_iterator_headers():
    data = build_warc(RECORDS[:1], per_record_gzip=True)
    (headers, payload), = list(iter_warc_records(data))
    assert headers["warc-type"] == "response"
    assert headers["warc-target-uri"] == "https://ex.com/a"
    assert payload.startswith(b"HTTP/1.1 200 OK")
