"""WARC source tests: round-trip write→parse→Spark load and the
byte-identical extraction invariant over the WARC path."""

from __future__ import annotations

from datetime import datetime

import pytest

from datasketches_java_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc,
)
from datasketches_java_spark.sources.webtext import generate_webtext


@pytest.fixture(scope="module")
def warc_file(tmp_path_factory):
    t = generate_webtext(200, seed=42)
    pages = t["pages"]
    records = [{"url": r.url, "warc_ts": r.warc_ts.to_pydatetime(),
                "html": r.html} for r in pages.itertuples()]
    path = str(tmp_path_factory.mktemp("warc") / "crawl-000.warc.gz")
    write_warc(records, path)
    return path, pages


def test_roundtrip_parse(warc_file):
    path, pages = warc_file
    with open(path, "rb") as f:
        recs = list(parse_warc_bytes(f.read()))
    assert len(recs) == len(pages)
    by_url = {r["url"]: r for r in recs}
    for row in pages.itertuples():
        rec = by_url[row.url]
        assert rec["html"] == row.html          # byte-identical payload
        assert rec["warc_ts"].replace(microsecond=0) == \
            row.warc_ts.to_pydatetime().replace(tzinfo=None, microsecond=0)


def test_http_envelope_stripped():
    body = b"<html>x</html>"
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://e.x/1\r\n"
           b"WARC-Date: 2025-01-01T00:00:00Z\r\n"
           + f"Content-Length: {len(http)}\r\n".encode()
           + b"\r\n" + http + b"\r\n\r\n")
    recs = list(parse_warc_bytes(raw))
    assert len(recs) == 1 and recs[0]["html"] == body


def test_non_response_records_skipped():
    raw = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
           b"Content-Length: 4\r\n\r\ninfo\r\n\r\n"
           b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://e.x/2\r\n"
           b"WARC-Date: 2025-01-01T00:00:00Z\r\n"
           b"Content-Length: 2\r\n\r\nhi\r\n\r\n")
    recs = list(parse_warc_bytes(raw))
    assert [r["url"] for r in recs] == ["https://e.x/2"]


def test_spark_read_and_extraction_invariant(spark, warc_file):
    from pyspark.sql import functions as F
    from datasketches_java_spark.sources.webtext import extract_text_column
    path, pages = warc_file
    df = read_warc(spark, path)
    assert df.count() == len(pages)
    # full pipeline input shape: extract text from html, check
    # byte-identity against the generator's text column
    ext = df.withColumn("text", extract_text_column()).select("url", "text")
    want = spark.createDataFrame(pages[["url", "text"]])
    assert ext.exceptAll(want).count() == 0
    assert want.exceptAll(ext).count() == 0
