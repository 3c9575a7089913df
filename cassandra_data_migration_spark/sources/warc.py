"""WARC (Web ARChive, ISO 28500) ingestion — the front door of a web-
scale training-data pipeline (Common Crawl ships ~100 TB/month as
`.warc.gz`).

Format notes (public spec): a WARC file is a concatenation of records;
each record is a `WARC/1.0` header block (CRLF-separated `Name: value`
lines, terminated by a blank line), exactly `Content-Length` bytes of
content, then `\\r\\n\\r\\n`.  In `.warc.gz`, each record is its OWN
gzip member, so the file is also a valid multi-member gzip stream —
Python's ``gzip`` reads it end to end.  For `response` records the
content is a full HTTP response (status line + headers + body).

Scale shape: one file = one task.  The ``binaryFile`` source lists
files distributed, each executor decompresses and parses ITS files
sequentially — parsing is a streaming single pass, and the shuffle-
free `mapInPandas` emits one row per record.  Common Crawl segments
are ~1 GB compressed, which bounds per-task memory at the file size
(the same bound every WARC reader accepts); at 100 TB the parallelism
is the file count (~100K files/crawl), far above any cluster's core
count.  No Python in the per-BYTE hot path beyond the header scan —
bodies are sliced, never iterated.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "file string, record_id string, warc_type string, target_uri string, "
    "warc_date string, http_status int, http_content_type string, "
    "payload binary"
)


def parse_warc_stream(data: bytes, strict: bool = False) -> Iterator[dict]:
    """Parse a decompressed WARC byte stream into record dicts.
    Streaming single pass; bodies are sliced by Content-Length.

    Real Common Crawl files routinely contain quirks (truncated
    records, stray bytes, missing Content-Length); one bad record must
    not poison a whole ~1 GB task.  On a malformed header the scan
    resyncs to the next ``WARC/`` magic and emits a synthetic
    ``warc_type='__malformed__'`` row covering the skipped bytes, so
    corruption is counted rather than silently dropped.  ``strict=True``
    restores raise-on-first-error for writers validating their own
    output.
    """
    pos = 0
    n = len(data)

    def _resync(start: int, why: str) -> tuple[int, dict]:
        nxt = data.find(b"WARC/", start + 1)
        end = nxt if nxt >= 0 else n
        rec = {
            "record_id": "",
            "warc_type": "__malformed__",
            "target_uri": why,
            "warc_date": "",
            "http_status": None,
            "http_content_type": None,
            "payload": data[start:end],
        }
        return end, rec

    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            if strict:
                raise ValueError(f"unterminated WARC header at offset {pos}")
            pos, rec = _resync(pos, f"unterminated header at {pos}")
            yield rec
            continue
        head = data[pos:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            if strict:
                raise ValueError(f"not a WARC record header at offset {pos}")
            pos, rec = _resync(pos, f"bad header magic at {pos}")
            yield rec
            continue
        fields: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            # missing/garbled Content-Length desyncs the slice — resync
            # past this header instead of trusting a guessed body size
            if strict:
                raise ValueError(f"missing Content-Length at offset {pos}")
            pos, rec = _resync(head_end + 4, f"no content-length at {pos}")
            yield rec
            continue
        content = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length

        rec = {
            "record_id": fields.get("warc-record-id", ""),
            "warc_type": fields.get("warc-type", ""),
            "target_uri": fields.get("warc-target-uri", ""),
            "warc_date": fields.get("warc-date", ""),
            "http_status": None,
            "http_content_type": None,
            "payload": content,
        }
        if rec["warc_type"] == "response" and content[:5] == b"HTTP/":
            http_end = content.find(b"\r\n\r\n")
            if http_end >= 0:
                http_head = content[:http_end].decode(
                    "utf-8", errors="replace"
                )
                hlines = http_head.split("\r\n")
                try:
                    rec["http_status"] = int(hlines[0].split(" ")[1])
                except (IndexError, ValueError):
                    rec["http_status"] = None
                for line in hlines[1:]:
                    k, _, v = line.partition(":")
                    if k.strip().lower() == "content-type":
                        rec["http_content_type"] = v.strip()
                rec["payload"] = content[http_end + 4 :]
        yield rec


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed WARC reader: (file, record_id, warc_type,
    target_uri, warc_date, http_status, http_content_type, payload).
    Accepts plain `.warc` and multi-member `.warc.gz`; for response
    records the payload is the HTTP BODY (headers parsed off)."""
    files = spark.read.format("binaryFile").load(path_glob)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "file": [], "record_id": [], "warc_type": [],
                "target_uri": [], "warc_date": [], "http_status": [],
                "http_content_type": [], "payload": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if raw[:2] == b"\x1f\x8b":
                    raw = gzip.GzipFile(fileobj=io.BytesIO(raw)).read()
                fname = str(path).rsplit("/", 1)[-1]
                for rec in parse_warc_stream(raw):
                    out["file"].append(fname)
                    out["record_id"].append(rec["record_id"])
                    out["warc_type"].append(rec["warc_type"])
                    out["target_uri"].append(rec["target_uri"])
                    out["warc_date"].append(rec["warc_date"])
                    out["http_status"].append(rec["http_status"])
                    out["http_content_type"].append(rec["http_content_type"])
                    out["payload"].append(rec["payload"])
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(run, WARC_SCHEMA)


def build_warc(records: list[dict], compress: bool = True) -> bytes:
    """Writer twin of :func:`read_warc` (what a fetch stage emits, and
    what the tests/contract synthesize): each record its own gzip
    member, per the `.warc.gz` convention.  ``records`` dicts carry
    (record_id, warc_type, target_uri, warc_date, payload) plus
    optional (http_status, http_content_type) for response records."""
    out = bytearray()
    for r in records:
        content = r["payload"]
        if r.get("http_status") is not None:
            http = (
                f"HTTP/1.1 {r['http_status']} OK\r\n"
                f"Content-Type: {r.get('http_content_type', 'text/html')}\r\n"
                f"Content-Length: {len(content)}\r\n\r\n"
            ).encode()
            content = http + content
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r['warc_type']}\r\n"
            f"WARC-Record-ID: {r['record_id']}\r\n"
            f"WARC-Target-URI: {r['target_uri']}\r\n"
            f"WARC-Date: {r.get('warc_date', '2024-01-01T00:00:00Z')}\r\n"
            f"Content-Length: {len(content)}\r\n\r\n"
        ).encode()
        record = head + content + b"\r\n\r\n"
        if compress:
            buf = io.BytesIO()
            # fixed mtime keeps the bytes deterministic
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(record)
            out += buf.getvalue()
        else:
            out += record
    return bytes(out)
