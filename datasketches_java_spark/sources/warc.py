"""WARC (Web ARChive) source — the native Common-Crawl input format.

Pure-python WARC 1.0/1.1 parser (ISO 28500; no external libs) exposed
two ways:

  - ``read_warc(spark, paths)``: distributed load — one task per WARC
    file via ``spark.read.format("binaryFile")`` + an Arrow-batched
    record splitter, yielding the BASELINE.json input schema
    ``(url, warc_ts, html, lang, text)`` with ``lang``/``text`` left
    for the extraction stage (deterministic, so the byte-identical
    per-url invariant holds).
  - ``parse_warc_bytes(buf)``: the core record iterator, unit-testable
    without Spark.

Scale notes: Common Crawl ships ~1 GB gzipped WARCs; a 10^12-doc run
is ~10^7 files → file-granular parallelism is plenty (binaryFile
pushes down path globs and partition-prunes on crawl-date directory
layout).  Records stream through one Arrow batch per ~512 pages so a
1 GB archive never materializes as Python row objects.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, types as T

WARC_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("source_file", T.StringType()),
])


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = \
                v.strip().decode("latin-1")
    return headers


def parse_warc_bytes(buf: bytes) -> Iterator[dict]:
    """Yield response records from raw (optionally gzipped) WARC bytes:
    {url, warc_ts, html, record_id}."""
    if buf[:2] == b"\x1f\x8b":
        buf = gzip.decompress(buf)
    stream = io.BytesIO(buf)
    while True:
        # -- version line --
        line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            continue
        # -- headers until blank line --
        hdr_lines = []
        while True:
            ln = stream.readline()
            if ln in (b"\r\n", b"\n", b""):
                break
            hdr_lines.append(ln.rstrip(b"\r\n"))
        headers = _parse_headers(b"\r\n".join(hdr_lines))
        length = int(headers.get("content-length", "0"))
        body = stream.read(length)
        stream.readline()  # trailing \r\n
        stream.readline()  # record separator \r\n
        if headers.get("warc-type") != "response":
            continue
        # strip the HTTP response envelope if present
        if body[:5] in (b"HTTP/",):
            split = body.find(b"\r\n\r\n")
            if split >= 0:
                body = body[split + 4:]
        ts = headers.get("warc-date", "1970-01-01T00:00:00Z")
        yield {
            "url": headers.get("warc-target-uri", ""),
            "warc_ts": datetime.fromisoformat(ts.replace("Z", "+00:00"))
            .astimezone(timezone.utc).replace(tzinfo=None),
            "html": body,
            "record_id": headers.get("warc-record-id", ""),
        }


def write_warc(records: list[dict], path: str, compress: bool = True) -> None:
    """Write response records as a WARC file (fixture/testing side)."""
    out = io.BytesIO()
    for r in records:
        body = r["html"]
        hdr = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               + f"WARC-Target-URI: {r['url']}\r\n".encode()
               + f"WARC-Date: {r['warc_ts'].strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n".encode()
               + f"WARC-Record-ID: <urn:uuid:{abs(hash(r['url'])):032x}>\r\n".encode()
               + f"Content-Length: {len(body)}\r\n".encode()
               + b"Content-Type: application/http; msgtype=response\r\n"
               b"\r\n")
        out.write(hdr + body + b"\r\n\r\n")
    data = out.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)


def read_warc(spark: SparkSession, paths: str,
              batch_rows: int = 512) -> DataFrame:
    """Distributed WARC load → DataFrame(url, warc_ts, html, record_id,
    source_file).  One input file per task; records stream out in
    Arrow batches."""
    files = spark.read.format("binaryFile").load(paths) \
        .select("path", "content")

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                rows = []
                for rec in parse_warc_bytes(bytes(content)):
                    rec["source_file"] = path
                    rows.append(rec)
                    if len(rows) >= batch_rows:
                        yield pd.DataFrame(rows)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows)

    return files.mapInPandas(split, WARC_SCHEMA)
