"""From-scratch WARC/1.0 scan — the Common-Crawl wire format upstream of
the engine's pages table (input_hint: ``(url, warc_ts, html, ...)``).

A WARC file is a sequence of records::

    WARC/1.0\r\n
    <Name>: <value>\r\n ...        (must include Content-Length)
    \r\n
    <block: Content-Length bytes>  (for WARC-Type: response, an HTTP
    \r\n\r\n                        message whose body is the html)

Common Crawl ships each record as its OWN gzip member, concatenated into
~1 GB segment files — both that layout and plain uncompressed files are
handled (magic-byte detect + member-by-member ``zlib`` loop).

Scale shape: ``spark.read.format("binaryFile")`` hands ONE WARC file per
task — the natural parallel unit (a 100 TB crawl is ~10^5 segment files,
ample parallelism) — and the record scan is a single forward pass over
the bytes inside ``mapInPandas`` (Arrow batches of file splits, no
per-record Python round-trips through the JVM).  Malformed records raise
with their byte offset (loud-failure philosophy: a silently-skipped
truncated record is missing training data).

The writer half (``write_warc``) exists for fixtures and round-trip
tests, mirroring the PNG/WAV codec pattern (operators/multimodal.py).
"""
from __future__ import annotations

import datetime as dt
import io
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

_MAGIC_GZ = b"\x1f\x8b"


def write_warc_record(url: str, ts: dt.datetime, html: bytes,
                      rtype: str = "response") -> bytes:
    """One WARC/1.0 record; ``response`` records wrap the html in a
    minimal HTTP/1.1 200 message (the Common-Crawl payload shape)."""
    if rtype == "response":
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n"
                + html)
        block = http
    else:
        block = html
    headers = (f"WARC/1.0\r\n"
               f"WARC-Type: {rtype}\r\n"
               f"WARC-Target-URI: {url}\r\n"
               f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
               f"Content-Length: {len(block)}\r\n"
               f"\r\n").encode()
    return headers + block + b"\r\n\r\n"


def write_warc(records: list[tuple[str, dt.datetime, bytes]],
               gzip_members: bool = False,
               rtype: str = "response") -> bytes:
    """Serialize (url, ts, html) triples to WARC bytes; with
    ``gzip_members`` each record becomes its own gzip member (the
    Common-Crawl segment layout)."""
    out = io.BytesIO()
    for url, ts, html in records:
        rec = write_warc_record(url, ts, html, rtype)
        if gzip_members:
            co = zlib.compressobj(9, zlib.DEFLATED, 31)   # gzip wrapper
            out.write(co.compress(rec) + co.flush())
        else:
            out.write(rec)
    return out.getvalue()


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members -> concatenated plaintext."""
    out, pos = io.BytesIO(), 0
    while pos < len(data):
        d = zlib.decompressobj(31)
        out.write(d.decompress(data[pos:]))
        out.write(d.flush())
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError(f"corrupt gzip member at byte {pos}")
        pos += consumed
    return out.getvalue()


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield ``{"headers": {name_lower: value}, "block": bytes,
    "offset": int}`` per record — the pure parsing core (loud on
    malformed input)."""
    if data[:2] == _MAGIC_GZ:
        data = _gunzip_members(data)
    pos, n = 0, len(data)
    while pos < n:
        # tolerate inter-record CRLF padding
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not data[pos:pos + 5] == b"WARC/":
            raise ValueError(f"expected WARC record header at byte {pos}")
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError(f"unterminated WARC headers at byte {pos}")
        lines = data[pos:head_end].decode("utf-8", "replace").split("\r\n")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"missing/invalid Content-Length at byte {pos}")
        block_start = head_end + 4
        if block_start + length > n:
            raise ValueError(
                f"truncated record block at byte {pos} "
                f"(need {length} bytes, have {n - block_start})")
        yield {"headers": headers,
               "block": data[block_start:block_start + length],
               "offset": pos}
        pos = block_start + length


def _http_body(block: bytes) -> bytes:
    sep = block.find(b"\r\n\r\n")
    return block[sep + 4:] if sep >= 0 else block


def parse_warc_responses(data: bytes) -> list[tuple[str, dt.datetime, bytes]]:
    """(url, warc_ts, html) for every WARC-Type: response record; other
    record types (request, metadata, warcinfo) are skipped by SPEC, not
    silently — they are simply different record classes."""
    out = []
    for rec in iter_warc_records(data):
        h = rec["headers"]
        if h.get("warc-type") != "response":
            continue
        url = h.get("warc-target-uri")
        date = h.get("warc-date")
        if not url or not date:
            raise ValueError(
                f"response record at byte {rec['offset']} lacks "
                "WARC-Target-URI/WARC-Date")
        ts = dt.datetime.fromisoformat(date.replace("Z", "+00:00")) \
            .replace(tzinfo=None)
        out.append((url, ts, _http_body(rec["block"])))
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) -> DataFrame (url, warc_ts, html) — feed
    ``plans.pipeline.triples_from_pages(reextract=True)`` after tagging
    text/lang, or the curation pipeline after html->text extraction."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def parse(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(parse_warc_responses(bytes(content)))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html"])

    return files.mapInPandas(
        parse, "url string, warc_ts timestamp, html binary")
