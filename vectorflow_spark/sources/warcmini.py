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
* ``read_warc(spark, path)``— the ``vf_warc`` streaming Data Source
  (sources/warcsource.py) -> one row per WARC record (url, type,
  content_type, http body). WARC files are non-splittable (like any
  gzip), so the parallel unit is the FILE — exactly how Common Crawl
  shards its dumps (1 GB segments, thousands per crawl), which makes a
  file-per-partition scan the natural 100 TB plan; within a partition
  records STREAM off disk (``iter_warc_records``), so peak task memory
  is one record + a 64 KB chunk, never the file.

Scope: WARC/1.0 and 1.1 record framing, gzip or plain, response /
request / warcinfo / resource / metadata types. Chunked
transfer-encoding inside archived HTTP payloads is NOT decoded (crawl
writers store payloads de-chunked; a raw chunked body passes through
verbatim, loudly visible in the body).

Zstandard WARC (``.warc.zst``, increasingly emitted by Common Crawl
tooling) REFUSES loudly: this environment has no ``zstandard`` package
and Python 3.11's stdlib has no zstd codec (``compression.zstd``
arrives in 3.14), so the member framing could not be verified against
any reference — the same parse-correctly-or-refuse adjudication as MP3
sample decode (BASELINE.md). The refusal triggers on the zstd frame
magic (0x28 B5 2F FD) before any parsing, so a ``.warc.zst`` fed to any
entry point fails with the reason, not a framing error.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

CRLF = b"\r\n"

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"  # RFC 8878 frame magic, little-endian


def _refuse_zstd() -> None:
    raise NotImplementedError(
        "warc: zstd-compressed WARC (.warc.zst) is not supported — no "
        "zstandard package or stdlib zstd codec exists in this "
        "environment to verify a decoder against (module docstring); "
        "recompress to .warc.gz"
    )


def _decompress_if_gzip(data: bytes) -> bytes:
    if data[:4] == _ZSTD_MAGIC:
        _refuse_zstd()
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


def iter_warc_records(fileobj, chunk_size: int = 1 << 16) -> Iterator[dict]:
    """Incremental record iterator over an open binary stream: yields each
    record as soon as its framing completes, buffering at most one record
    (header block + ``Content-Length`` payload) plus one read chunk — the
    memory contract that lets a 1 GB Common Crawl segment stream through
    an executor task without ever existing as a single bytes value. The
    single source of framing truth: ``parse_warc`` (bytes in memory) and
    the ``vf_warc`` DataSource (files on disk) both delegate here."""
    # bytearray: += is amortized O(1); an immutable bytes buffer would
    # copy the whole accumulation per chunk — quadratic in record size
    # (a 100 MB payload at 64 KB chunks would memmove ~80 GB)
    buf = bytearray()
    consumed = 0  # bytes consumed before buf's start, for error offsets

    def fill() -> bool:
        chunk = fileobj.read(chunk_size)
        if not chunk:
            return False
        buf.extend(chunk)
        return True

    while True:
        # skip inter-record CRLFs
        while True:
            while len(buf) < 2 and fill():
                pass
            if buf[:2] == CRLF:
                buf = buf[2:]
                consumed += 2
            else:
                break
        if not buf and not fill():
            return
        while len(buf) < 5 and fill():
            pass
        if not buf.startswith(b"WARC/"):
            raise ValueError(f"malformed WARC: expected record header at byte {consumed}")
        while (hdr_end := buf.find(b"\r\n\r\n")) < 0:
            if not fill():
                raise ValueError("malformed WARC: unterminated header block")
        header_lines = buf[:hdr_end].split(CRLF)
        headers: dict[str, str] = {}
        for line in header_lines[1:]:  # line 0 is the WARC/1.x version
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
        length = int(headers.get("content-length", "0"))
        buf = buf[hdr_end + 4 :]
        consumed += hdr_end + 4
        while len(buf) < length and fill():
            pass
        if len(buf) < length:
            # plain-file truncation reaches EOF silently (gzip truncation
            # raises EOFError on its own); a short payload must never
            # flow downstream as valid data
            raise ValueError(
                f"truncated WARC: record at byte {consumed} declares "
                f"Content-Length {length} but only {len(buf)} bytes remain"
            )
        payload = bytes(buf[:length])
        buf = buf[length:]
        consumed += length
        rec = {**headers, "payload": payload}
        if "application/http" in headers.get("content-type", ""):
            rec["body"] = _split_http_payload(payload)
        yield rec


def iter_warc_stream(raw, chunk_size: int = 1 << 16) -> Iterator[dict]:
    """Stream records from an open seekable binary stream, sniffing gzip
    by magic — the shared entry for local files AND object-store streams
    (the ``vf_warc`` opener layer hands fsspec/mount file objects here).
    gzip decompression is itself streamed (GzipFile reads concatenated
    members incrementally off ``raw``), so peak memory stays
    record-bounded for ``.warc.gz`` too. The caller owns ``raw``'s
    lifetime; the gzip wrapper (when any) is closed here."""
    magic = raw.read(4)
    raw.seek(0)
    if magic == _ZSTD_MAGIC:
        _refuse_zstd()
    f = gzip.GzipFile(fileobj=raw) if magic[:2] == b"\x1f\x8b" else raw
    try:
        yield from iter_warc_records(f, chunk_size=chunk_size)
    finally:
        if f is not raw:
            f.close()


def iter_warc_file(path: str, chunk_size: int = 1 << 16) -> Iterator[dict]:
    """Stream records from a WARC file on disk, gzipped or plain."""
    with open(path, "rb") as raw:
        yield from iter_warc_stream(raw, chunk_size=chunk_size)


def parse_warc(data: bytes) -> list[dict]:
    """Parse WARC bytes into records: each a dict with lowercase header
    keys plus ``payload`` (raw bytes) and, for http payloads, ``body``."""
    raw = _decompress_if_gzip(data)
    return list(iter_warc_records(io.BytesIO(raw)))


def build_warc(
    records: list[tuple[str, bytes, str]],
    compress: bool = True,
    warc_date: str = "2024-01-01T00:00:00Z",
    record_type: str = "response",
    return_index: bool = False,
) -> bytes:
    """Write (url, body bytes, mime) triples as WARC records — one gzip
    member per record when ``compress`` (the standard .warc.gz layout).
    ``record_type='response'`` wraps bodies in archived HTTP payloads
    (the .warc crawl shape); ``'conversion'`` / ``'metadata'`` store the
    body verbatim with the given mime — the WET (extracted text) and WAT
    (JSON metadata sidecar) shapes Common Crawl publishes alongside each
    crawl. Deterministic: the record ids derive from the url+payload,
    the date is fixed unless given.

    ``return_index=True`` also returns ``[(offset, length), ...]`` per
    member (warcinfo included) — the CDX-shape record index that makes a
    segment RANDOM-ACCESS: with per-record gzip members (the .warc.gz
    layout), offset+length slices decompress independently, which is
    exactly how Common Crawl's CDX indexes drive ranged fetches."""
    import hashlib

    out = bytearray()
    index: list[tuple[int, int]] = []

    def push(member: bytes) -> None:
        index.append((len(out), len(member)))
        out.extend(member)

    def one_record(kind: str, url: str | None, payload: bytes, ctype: str) -> bytes:
        # id covers the payload too: two records sharing a url (re-crawls
        # of the same page) must not share a WARC-Record-ID
        rid = hashlib.md5((url or kind).encode() + b"\x00" + payload).hexdigest()
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
        # mtime=0: the gzip header embeds a timestamp by default, which
        # would make byte-identical reruns impossible (the sink's
        # determinism contract)
        return gzip.compress(rec, mtime=0) if compress else rec

    push(one_record("warcinfo", None, b"software: vectorflow-spark warcmini\r\n", "application/warc-fields"))
    for url, body, mime in records:
        if record_type == "response":
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: "
                + mime.encode()
                + f"\r\nContent-Length: {len(body)}".encode()
                + b"\r\n\r\n"
                + body
            )
            push(one_record("response", url, http, 'application/http; msgtype=response'))
        else:  # conversion (WET) / metadata (WAT): body stored verbatim
            push(one_record(record_type, url, body, mime))
    if return_index:
        return bytes(out), index
    return bytes(out)




def write_warc_corpus(
    docs,
    out_dir: str,
    url_col: str = "url",
    text_col: str = "text",
    mime: str = "text/plain",
    n_files: int = 16,
    compress: bool = True,
    record_type: str = "response",
    index: bool = False,
):
    """Distributed WARC SINK: write a corpus back out as ``n_files``
    ``.warc.gz`` segment files — the inverse of the ``vf_warc`` scan, and
    the export shape a crawl-processing pipeline hands downstream
    consumers. Returns the manifest DataFrame (segment, path, n_records,
    n_bytes); the files are written when the manifest materializes.

    Plan: segment = hash(url) mod n_files (uniform, deterministic), one
    shuffle on segment, then each task builds ITS file with the same
    deterministic ``build_warc`` the fixtures use (records sorted by url
    within the segment, so reruns are byte-identical) and commits it via
    write-temp + rename — a re-run or task retry can never leave a
    half-written segment visible. Sizing contract at 100 TB: one
    segment's records sit in one task's memory while its file builds, so
    pick ``n_files ~ corpus_bytes / 1 GiB`` (the Common Crawl segment
    size) exactly as you would size shuffle partitions.

    ``index=True`` also writes a ``_<segment>.cdx.json`` SIDECAR of
    per-record (offset, length) — the CDX shape Common Crawl publishes:
    each .warc.gz record is its OWN gzip member, so offset+length
    slices decompress independently, and the ``vf_warc`` scan's index
    mode turns one segment into many record-range partitions (seek
    reads) instead of one sequential walk."""
    import json
    import os
    import tempfile

    import pandas as pd
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)

    def one_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["_seg"].iloc[0])
        # sort on (url, text): url alone leaves duplicate-url rows in
        # shuffle arrival order and reruns would be byte-different
        pdf = pdf.sort_values([url_col, text_col], kind="mergesort")
        records = [
            (str(u), str(t).encode("utf-8"), mime)
            for u, t in zip(pdf[url_col], pdf[text_col])
        ]
        blob, rec_index = build_warc(
            records, compress=compress, record_type=record_type, return_index=True
        )
        name = f"segment-{seg:05d}.warc" + (".gz" if compress else "")
        path = os.path.join(out_dir, name)
        fd, tmp = tempfile.mkstemp(dir=out_dir, prefix=".tmp-seg-")
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        if index:
            # urls per member: warcinfo first (null), then the sorted
            # records — real CDX indexes carry the URL so lookups prune
            # at the INDEX, and the scan's url pushdown does the same
            urls = [None] + [u for u, _, _ in records]
            side = os.path.join(out_dir, f"_{name}.cdx.json")
            fd, tmp = tempfile.mkstemp(dir=out_dir, prefix=".tmp-cdx-")
            with os.fdopen(fd, "w") as f:
                json.dump(
                    {
                        "records": [
                            {"offset": o, "length": n, "url": u}
                            for (o, n), u in zip(rec_index, urls)
                        ]
                    },
                    f,
                )
            os.replace(tmp, side)
        return pd.DataFrame(
            [{"segment": seg, "path": path, "n_records": len(records), "n_bytes": len(blob)}]
        )

    return (
        docs.withColumn("_seg", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_files)))
        .groupBy("_seg")
        .applyInPandas(one_segment, "segment int, path string, n_records long, n_bytes long")
    )


def consolidate_cdx(spark, out_dir: str, n_files: int = 4):
    """Fold every per-segment ``_*.cdx.json`` sidecar into ONE partitioned
    parquet URL index at ``<out_dir>/_url_index`` — what real CDX
    collections are (Common Crawl publishes a consolidated cdx-index, not
    300k per-segment files). The ``vf_warc`` scan's URL pushdown plans
    wayback-style lookups from this index when present: one indexed
    dataset read at planning instead of one sidecar read PER SEGMENT,
    which at crawl scale (100k+ segments) would mean 100k driver-side
    reads per planned query.

    Distributed: sidecar paths are listed once on the driver, parsed on
    executors, range-partitioned and SORTED by url (row-group statistics
    then prune equality/prefix lookups inside each part file), and
    committed via write-temp + os.replace — a crash mid-install leaves
    either the old index or none, and planning falls back to the
    per-segment sidecars. warcinfo records (null url) are not lookup
    targets and are skipped. Returns the indexed record count."""
    import glob as _glob
    import os
    import shutil

    import pandas as pd

    sides = sorted(_glob.glob(os.path.join(out_dir, "_*.cdx.json")))
    if not sides:
        raise FileNotFoundError(f"consolidate_cdx: no _*.cdx.json sidecars under {out_dir}")

    def parse(pdfs):
        import json

        for pdf in pdfs:
            rows = []
            for side in pdf["side"]:
                name = os.path.basename(side)[1 : -len(".cdx.json")]
                with open(side) as f:
                    doc = json.load(f)
                rows.extend(
                    (r["url"], name, int(r["offset"]), int(r["length"]))
                    for r in doc["records"]
                    if r.get("url") is not None
                )
            yield pd.DataFrame(rows, columns=["url", "segment", "offset", "length"])

    rows_df = (
        spark.createDataFrame([(p,) for p in sides], "side string")
        .repartition(min(len(sides), 64))
        .mapInPandas(parse, "url string, segment string, offset long, length long")
    )
    tmp = os.path.join(out_dir, f".tmp_url_index_{os.getpid()}")
    shutil.rmtree(tmp, ignore_errors=True)
    (
        rows_df.repartitionByRange(n_files, "url")
        .sortWithinPartitions("url")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    # manifest of COVERED segments (all consolidated sidecars, including
    # url-less ones): vf_warc planning unions the index with per-segment
    # sidecars of segments APPENDED after consolidation — without this
    # set, a stale index would silently hide new segments from
    # url-constrained scans. Lands atomically with the parquet parts;
    # Spark ignores the underscore name when reading the dataset.
    import json

    segments = sorted(os.path.basename(s)[1 : -len(".cdx.json")] for s in sides)
    with open(os.path.join(tmp, "_segments.json"), "w") as f:
        json.dump({"segments": segments}, f)
    target = os.path.join(out_dir, "_url_index")
    shutil.rmtree(target, ignore_errors=True)
    os.replace(tmp, target)
    # count AFTER install: Spark ignores dot-prefixed paths, so reading
    # the temp dir directly would see no files
    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(os.path.join(target, f)).num_rows
        for f in os.listdir(target)
        if f.endswith(".parquet")
    )


def read_warc_binaryfile(spark, path: str, glob: str | None = None):
    """Object-store fallback for ``read_warc``: the ``binaryFile`` JVM
    source speaks every Hadoop filesystem (s3a://, gs://, hdfs://...),
    which the Python ``vf_warc`` DataSource cannot (its workers have no
    Hadoop client). Cost: each segment materializes as ONE whole-file row
    before parsing — file-bounded memory instead of record-bounded, fine
    for ~1 GB crawl segments on executors sized for them, and the reason
    the local-path scan prefers ``vf_warc``. Same output schema, and the
    same LISTING semantics as the vf_warc reader's ``_files()``:
    recursive (recursiveFileLookup, matching its os.walk), hidden
    ``.``/``_`` names excluded (binaryFile's default, mirrored there),
    and ``glob`` matching the BASENAME — stick to the ``*``/``?`` subset
    shared by Hadoop globs and fnmatch so both paths select identical
    file sets."""
    import pandas as pd

    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path).select(
        F.element_at(F.split("path", "/"), -1).alias("source"),
        F.col("content"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["warc_file", "url", "warc_type", "payload_type", "n_bytes", "body"]
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
            yield pd.DataFrame(rows, columns=cols)

    from vectorflow_spark.sources.warcsource import WARC_ROW_SCHEMA

    return raw.mapInPandas(gen, schema=WARC_ROW_SCHEMA)


def read_warc(
    spark,
    path: str,
    glob: str | None = None,
    on_corrupt: str = "row",
    io: str = "auto",
    io_register: str | None = None,
    index: str = "auto",
    records_per_task: int | None = None,
):
    """One row per WARC record across every file under ``path``,
    dispatching on the path's scheme and the installed IO stack:

    * local paths (no scheme or ``file://``) ride the ``vf_warc``
      streaming Data Source (sources/warcsource.py): one partition per
      file — WARC's natural parallel unit, matching how crawls shard
      into ~1 GB segments — and records stream off disk inside each
      task, so peak memory is record-bounded rather than file-bounded
      (the round-3 ``binaryFile`` scan materialized each file as a
      single bytes row first);
    * object-store schemes (s3://, gs://...) ALSO stream per-record
      through ``vf_warc`` when fsspec (+ the protocol driver) is
      importable, or when ``io`` names a backend explicitly
      (``'fsspec'``, ``'mount:<root>'`` for FUSE mounts — see
      sources/warcsource.py); ``io_register`` names a module imported
      in every task first (credentials / custom protocols);
    * with NO usable Python backend for the scheme, falls back to
      ``read_warc_binaryfile`` — the JVM binaryFile scan speaks every
      Hadoop filesystem — at the cost of whole-file rows (``on_corrupt``
      does not apply there; a malformed file fails its task).

    ``on_corrupt``: 'row' (default) marks a malformed segment with one
    error row, 'strict' fails the task. Compose with ``strip_html_expr``
    / ``extract_documents`` downstream to turn response bodies into the
    documents table."""
    scheme = path.split("://", 1)[0] if "://" in path else "file"
    if scheme != "file" and io == "auto":
        try:
            import fsspec  # noqa: F401
        except ImportError:
            return read_warc_binaryfile(spark, path, glob=glob)
    from vectorflow_spark.sources import warcsource

    warcsource.register(spark)
    reader = (
        spark.read.format("vf_warc")
        .option("onCorrupt", on_corrupt)
        .option("io", io)
        .option("index", index)
    )
    if glob:
        reader = reader.option("glob", glob)
    if io_register:
        reader = reader.option("io_register", io_register)
    if records_per_task is not None:
        reader = reader.option("recordsPerTask", str(records_per_task))
    return reader.load(path)
