"""WARC (Web ARChive, ISO 28500) reading + writing with the stdlib.

The 100 TB corpora this engine targets mostly START as WARC — Common
Crawl alone publishes petabytes of ``.warc.gz``. The format is plain:
records of ``WARC/1.0\\r\\n`` + RFC-822-style headers + ``\\r\\n\\r\\n`` +
``Content-Length`` payload bytes + ``\\r\\n\\r\\n``, and a ``.warc.gz`` is
one gzip MEMBER per record concatenated (what makes per-record random
access possible); Python's gzip module reads concatenated members
natively. So ingestion needs no external library:

* ``parse_warc(data)``      — bytes (gzipped or raw) -> list of records
  (headers dict + payload bytes). ``response`` records carrying
  ``application/http`` payloads also get the HTTP body split out
  (status line + headers dropped), which is the part a text pipeline
  wants.
* ``build_warc(records)``   — the inverse writer (warcinfo +
  response records, correct Content-Length, one gzip member each),
  used for fixtures and the ingest roundtrip oracle.
* ``read_warc(spark, path)``— ``binaryFile`` scan -> ``mapInPandas``
  record generator -> one row per WARC record (url, type,
  content_type, http body). WARC files are non-splittable (like any
  gzip), so the parallel unit is the FILE — exactly how Common Crawl
  shards its dumps (1 GB segments, thousands per crawl), which makes a
  file-per-task scan the natural 100 TB plan; record parsing streams
  within the task.

Scope: WARC/1.0 and 1.1 record framing, gzip or plain, response /
request / warcinfo / resource / metadata types. Chunked
transfer-encoding inside archived HTTP payloads is NOT decoded (crawl
writers store payloads de-chunked; a raw chunked body passes through
verbatim, loudly visible in the body).
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

CRLF = b"\r\n"


def _decompress_if_gzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        # GzipFile reads ALL concatenated members (the .warc.gz layout)
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as f:
            return f.read()
    return data


def _split_http_payload(payload: bytes) -> bytes:
    """Archived application/http payload -> body (drop status line +
    headers). Returns the payload unchanged when no header block exists."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return payload
    return payload[sep + 4 :]


def parse_warc(data: bytes) -> list[dict]:
    """Parse WARC bytes into records: each a dict with lowercase header
    keys plus ``payload`` (raw bytes) and, for http payloads, ``body``."""
    raw = _decompress_if_gzip(data)
    records: list[dict] = []
    i, n = 0, len(raw)
    while i < n:
        # skip inter-record CRLFs
        while i < n and raw[i : i + 2] == CRLF:
            i += 2
        if i >= n:
            break
        if not raw.startswith(b"WARC/", i):
            raise ValueError(f"malformed WARC: expected record header at byte {i}")
        hdr_end = raw.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            raise ValueError("malformed WARC: unterminated header block")
        header_lines = raw[i:hdr_end].split(CRLF)
        headers: dict[str, str] = {}
        for line in header_lines[1:]:  # line 0 is the WARC/1.x version
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
        length = int(headers.get("content-length", "0"))
        payload_start = hdr_end + 4
        payload = raw[payload_start : payload_start + length]
        rec = {**headers, "payload": payload}
        if "application/http" in headers.get("content-type", ""):
            rec["body"] = _split_http_payload(payload)
        records.append(rec)
        i = payload_start + length
    return records


def build_warc(
    records: list[tuple[str, bytes, str]],
    compress: bool = True,
    warc_date: str = "2024-01-01T00:00:00Z",
) -> bytes:
    """Write (url, body bytes, mime) triples as WARC response records
    with archived HTTP payloads — one gzip member per record when
    ``compress`` (the standard .warc.gz layout). Deterministic: the
    record ids derive from the url, the date is fixed unless given."""
    import hashlib

    out = bytearray()

    def one_record(kind: str, url: str | None, payload: bytes, ctype: str) -> bytes:
        rid = hashlib.md5((url or kind).encode()).hexdigest()
        headers = [
            b"WARC/1.0",
            f"WARC-Type: {kind}".encode(),
            f"WARC-Record-ID: <urn:uuid:{rid}>".encode(),
            f"WARC-Date: {warc_date}".encode(),
            f"Content-Type: {ctype}".encode(),
            f"Content-Length: {len(payload)}".encode(),
        ]
        if url is not None:
            headers.insert(2, f"WARC-Target-URI: {url}".encode())
        rec = CRLF.join(headers) + CRLF + CRLF + payload + CRLF + CRLF
        return gzip.compress(rec) if compress else rec

    out += one_record("warcinfo", None, b"software: vectorflow-spark warcmini\r\n", "application/warc-fields")
    for url, body, mime in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: "
            + mime.encode()
            + f"\r\nContent-Length: {len(body)}".encode()
            + b"\r\n\r\n"
            + body
        )
        out += one_record("response", url, http, 'application/http; msgtype=response')
    return bytes(out)


_WARC_ROW_SCHEMA = (
    "warc_file string, url string, warc_type string, payload_type string, "
    "n_bytes long, body binary"
)


def read_warc(spark, path: str, glob: str | None = None):
    """One row per WARC record across every file under ``path``.

    Plan: binaryFile scan (one task per file — WARC's natural parallel
    unit, matching how crawls shard into ~1 GB segments) -> mapInPandas
    generator that parses records and yields (warc_file, url, warc_type,
    payload_type, n_bytes, body). Compose with ``strip_html_expr`` /
    ``extract_documents`` downstream to turn response bodies into the
    documents table."""
    import pandas as pd
    from vectorflow_spark.sources.readers import read_raw_files

    raw = read_raw_files(spark, path, glob=glob)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for rec in parse_warc(bytes(r["content"])):
                    body = rec.get("body", rec["payload"])
                    rows.append(
                        {
                            "warc_file": r["source"],
                            "url": rec.get("warc-target-uri"),
                            "warc_type": rec.get("warc-type"),
                            "payload_type": rec.get("content-type"),
                            "n_bytes": len(body),
                            "body": body,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["warc_file", "url", "warc_type", "payload_type", "n_bytes", "body"],
            )

    return raw.mapInPandas(gen, schema=_WARC_ROW_SCHEMA)
