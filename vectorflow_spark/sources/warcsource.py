"""``vf_warc``: a streaming WARC Data Source (Spark 4 Python API).

Replaces the round-3 ``binaryFile`` + ``mapInPandas`` WARC scan, whose
one-row-per-FILE input meant a 1 GB Common Crawl segment materialized as
a single 1 GB bytes value inside the task before parsing (fine at
local[32]/128 GiB, an OOM class at 100 TB). Here each file is an
``InputPartition`` and the reader streams records straight off disk via
``warcmini.iter_warc_records`` — peak task memory is one RECORD (header
+ Content-Length payload) plus a 64 KB read chunk, regardless of file
size, and gzip members decompress incrementally.

The parallel unit stays the FILE: WARC's per-record gzip members make
the format non-splittable (like any gzip), which is exactly how Common
Crawl shards its dumps — thousands of ~1 GB segments per crawl, so a
file-per-partition scan saturates a 1000-executor cluster with no
planning cleverness. Within a partition, records stream.

Object stores: a Python DataSource's ``partitions()``/``read()`` run in
Python workers with no Hadoop client, so ``s3a://``-style paths cannot
ride the JVM filesystems here. Instead the source takes an injectable
OPENER via ``.option("io", ...)`` (the same import-gate pattern as the
embed/sink clients):

* ``io=auto`` (default) — local filesystem for plain/``file://`` paths;
  for any other scheme, fsspec if importable, else a loud refusal
  naming the alternatives;
* ``io=fsspec`` — list+stream through ``fsspec`` (s3://, gs://,
  abfs://, memory://... — whatever protocols the installed fsspec
  stack provides). ``option("io_register", "my.module")`` names a
  module imported FIRST, in planning and in every task, the hook for
  registering credentials or custom protocols;
* ``io=mount:/mnt/root`` — map ``scheme://bucket/key`` to
  ``/mnt/root/bucket/key``: the FUSE-mount deployment pattern
  (s3fs-fuse/goofys/gcsfuse), zero extra dependencies, and the
  cross-process-testable stand-in for an object store.

Records stream through every opener: the partition reader pulls 64 KB
chunks off the opened stream, so peak task memory stays one record +
one chunk no matter the backend.

Scan pushdown (``pushFilters``, Spark 4.1 Python DataSource API):
``warc_file`` equality/IN/prefix filters prune whole segment PARTITIONS
at planning time (the Python-source analog of parquet partition
pruning), and ``warc_type`` equality/IN filters skip records inside the
parser before they become Arrow rows — a raw crawl WARC is ~half
request/metadata records a text pipeline drops immediately. Requires
``spark.sql.python.filterPushdown.enabled`` (register() sets it).

Reference parity: the reference ingests web corpora one downloaded file
at a time in its API process (src/api/app.py); this source is the
cluster-scale counterpart (SURVEY.md §2.1 S6 family).
"""

from __future__ import annotations

from vectorflow_spark.sources.openers import _resolve_io
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

WARC_ROW_SCHEMA = (
    "warc_file string, url string, warc_type string, payload_type string, "
    "n_bytes long, body binary"
)


# Crash-orphan GC + stale bound shared with the tar/WDS sink — one
# implementation in sinkgc.py (r9 verdict item 6). Re-exported under the
# private name the tests and older call sites use.
from vectorflow_spark.sources.sinkgc import stale_temp_seconds as _stale_temp_seconds


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _WarcRangePartition(InputPartition):
    """A slice of one segment's CDX index: (offset, length) per record;
    with per-record gzip members each slice decompresses independently."""

    def __init__(self, path: str, ranges: list):
        self.path = path
        self.ranges = ranges


class VfWarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("vf_warc requires a load path: .load('/dir/of/warcs')")
        self.glob = options.get("glob")
        self.chunk_size = int(options.get("chunksize", str(1 << 16)))
        self.io = options.get("io", "auto")
        self.io_register = options.get("io_register")
        # onCorrupt: what a malformed/truncated segment does to the scan.
        #   "row"  (default) — records parsed so far are kept and ONE
        #     error row (warc_type='error', payload_type=<message>,
        #     warc_file=<segment>) marks the file, so per-file error
        #     accounting composes downstream (the vf_docs policy: at
        #     100 TB a single corrupt segment must not fail a 6-hour job);
        #   "strict" — propagate the ValueError and fail the task.
        self.on_corrupt = options.get("oncorrupt", "row").lower()
        if self.on_corrupt not in ("row", "strict"):
            raise ValueError(f"onCorrupt must be 'row' or 'strict', got {self.on_corrupt!r}")
        # index: 'auto' (default) uses a _<segment>.cdx.json sidecar when
        # present to split the segment into record-range partitions
        # (random access via per-record gzip members — the Common Crawl
        # CDX pattern); 'never' always streams whole segments; 'require'
        # errors on a missing sidecar.
        self.index = options.get("index", "auto").lower()
        if self.index not in ("auto", "never", "require"):
            raise ValueError(f"index must be auto|never|require, got {self.index!r}")
        self.records_per_task = int(options.get("recordspertask", "4096"))

    def _fs(self):
        """Resolve the opener lazily (and cache per process): the reader
        is pickled to executors, so resolution — including the fsspec
        import gate and the io_register hook — must run wherever the
        call lands, not once on the driver. Errors raise ValueError, NOT
        NotImplementedError: the DataSource API treats
        NotImplementedError from partitions() as 'source is
        unpartitioned' and silently swallows the message."""
        fs = getattr(self, "_fs_cache", None)
        if fs is None:
            fs = self._fs_cache = _resolve_io(self.io, self.path, self.io_register)
        return fs

    def __getstate__(self):
        d = self.__dict__.copy()
        d.pop("_fs_cache", None)
        return d

    def pushFilters(self, filters):
        """Scan pushdown (Spark 4 Python DataSource API) — the two
        filters a crawl scan actually writes:

        * ``warc_file`` equality/IN/prefix prunes whole SEGMENT
          partitions at planning time — the Python-source analog of
          parquet partition pruning, and the difference between
          scheduling 80,000 Common Crawl segments and the three you
          asked for;
        * ``warc_type`` equality/IN skips records inside the parser
          before they ever become Arrow rows (a raw WARC is ~half
          request/metadata records a text pipeline immediately drops);
        * ``url`` equality/IN/prefix — the wayback-style lookup: with a
          URL-carrying CDX sidecar the matching RANGES are selected at
          planning time, so "all records for this domain prefix" seeks
          straight to them; without a sidecar (or with a pre-url
          sidecar) the filter is enforced after parsing each record.

        Everything else is returned for Spark to re-apply; accepted
        filters are enforced by the source in every mode (exact
        semantics — pushdown is work-avoidance, never approximation)."""
        from pyspark.sql.datasource import EqualTo, In, StringStartsWith

        # the filter list is a CONJUNCTION: value-set constraints on one
        # attribute INTERSECT (two different EqualTo = empty result)
        self.file_values: set[str] | None = None
        self.file_prefixes: list[str] = []
        self.type_values: set[str] | None = None
        self.url_values: set[str] | None = None
        self.url_prefixes: list[str] = []

        def narrow(current: set[str] | None, vals: set[str]) -> set[str]:
            return vals if current is None else current & vals

        remaining = []
        for f in filters:
            attr = getattr(f, "attribute", None)
            if isinstance(f, EqualTo) and attr == ("warc_file",) and isinstance(f.value, str):
                self.file_values = narrow(self.file_values, {f.value})
            elif isinstance(f, In) and attr == ("warc_file",) and all(
                isinstance(v, str) for v in f.value
            ):
                self.file_values = narrow(self.file_values, set(f.value))
            elif isinstance(f, StringStartsWith) and attr == ("warc_file",) and isinstance(f.value, str):
                self.file_prefixes.append(f.value)
            elif isinstance(f, EqualTo) and attr == ("warc_type",) and isinstance(f.value, str):
                self.type_values = narrow(self.type_values, {f.value})
            elif isinstance(f, In) and attr == ("warc_type",) and all(
                isinstance(v, str) for v in f.value
            ):
                self.type_values = narrow(self.type_values, set(f.value))
            elif isinstance(f, EqualTo) and attr == ("url",) and isinstance(f.value, str):
                self.url_values = narrow(self.url_values, {f.value})
            elif isinstance(f, In) and attr == ("url",) and all(
                isinstance(v, str) for v in f.value
            ):
                self.url_values = narrow(self.url_values, set(f.value))
            elif isinstance(f, StringStartsWith) and attr == ("url",) and isinstance(f.value, str):
                self.url_prefixes.append(f.value)
            else:
                remaining.append(f)
        return remaining

    def _url_constrained(self) -> bool:
        return getattr(self, "url_values", None) is not None or bool(
            getattr(self, "url_prefixes", [])
        )

    def _url_match(self, url: str | None) -> bool:
        """SQL semantics: any url predicate is false for NULL urls."""
        if not self._url_constrained():
            return True
        if url is None:
            return False
        values = getattr(self, "url_values", None)
        if values is not None and url not in values:
            return False
        return all(url.startswith(p) for p in getattr(self, "url_prefixes", []))

    def _keep_file(self, path: str) -> bool:
        name = path.rsplit("/", 1)[-1]
        values = getattr(self, "file_values", None)
        prefixes = getattr(self, "file_prefixes", [])
        if values is not None and name not in values:
            return False
        return all(name.startswith(p) for p in prefixes)

    def _files(self) -> list[str]:
        # Listing contract shared with read_warc_binaryfile (which sets
        # recursiveFileLookup to match): recursive, hidden ./_ basenames
        # excluded, glob matches the BASENAME (use the */? subset common
        # to fnmatch and Hadoop globs so both paths list identically).
        # (UNPRUNED: the streaming reader shares this; pushed warc_file
        # filters prune in the batch partitions() below.)
        return self._fs().list_files(self.path, self.glob)

    def _load_cdx(self, path: str) -> tuple[list, bool] | None:
        """(records, has_urls) from the CDX sidecar, or None. Each
        record is (offset, length, url_or_None); ``has_urls`` False for
        pre-url sidecars, where url pushdown must post-filter instead
        of pruning ranges."""
        import contextlib
        import json

        head, _, name = path.rpartition("/")
        side = (head + "/" if head else "") + f"_{name}.cdx.json"
        try:
            with contextlib.closing(self._fs().open(side)) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            return None
        recs = doc["records"]
        has_urls = bool(recs) and "url" in recs[0]
        return (
            [(int(r["offset"]), int(r["length"]), r.get("url")) for r in recs],
            has_urls,
        )

    def _consolidated_ranges(self):
        """(matching (segment_name, offset, length, url) rows, covered
        segment-name set or None) from the consolidated ``_url_index``
        parquet dataset (warcmini.consolidate_cdx), or None when no index
        exists. This is the crawl-scale wayback path: ONE indexed dataset
        read at planning — url-sorted part files, so equality/IN lookups
        prune row groups by statistics on local paths — instead of one
        sidecar read per segment (100k driver reads on a real crawl).
        ``covered`` comes from the index's ``_segments.json`` manifest and
        lets partitions() union the index with per-segment sidecars of
        segments appended AFTER consolidation (r6 ADVICE: a stale index
        must not silently hide new segments); None for a manifest-less
        legacy index."""
        import contextlib
        import json
        import posixpath

        idx_dir = posixpath.join(self.path.rstrip("/"), "_url_index")
        try:
            parts = self._fs().list_files(idx_dir, "*.parquet")
        except (OSError, ValueError, FileNotFoundError):
            return None
        if not parts:
            return None
        covered = None
        try:
            with contextlib.closing(
                self._fs().open(posixpath.join(idx_dir, "_segments.json"))
            ) as f:
                covered = set(json.load(f)["segments"])
        except (OSError, ValueError, KeyError):
            covered = None
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        values = getattr(self, "url_values", None)
        prefixes = getattr(self, "url_prefixes", [])
        out = []
        for p in parts:
            try:
                local = p if "://" not in p else None
                if local is not None:
                    filters = None
                    if values is not None:
                        filters = [("url", "in", sorted(values))]
                    elif len(prefixes) == 1:
                        filters = [
                            ("url", ">=", prefixes[0]),
                            ("url", "<", prefixes[0] + "\U0010ffff"),
                        ]
                    t = pq.read_table(local, filters=filters)
                else:  # mount / fsspec backends: open via the opener
                    with contextlib.closing(self._fs().open(p)) as f:
                        t = pq.read_table(f)
            except (OSError, ValueError) as e:
                raise ValueError(f"vf_warc: corrupt _url_index part {p}: {e}") from None
            mask = None
            if values is not None:
                mask = pc.is_in(t["url"], value_set=pa.array(sorted(values)))
            for pref in prefixes:
                m2 = pc.starts_with(t["url"], pref)
                mask = m2 if mask is None else pc.and_(mask, m2)
            if mask is not None:
                t = t.filter(mask)
            out.extend(
                zip(
                    t["segment"].to_pylist(),
                    t["offset"].to_pylist(),
                    t["length"].to_pylist(),
                    t["url"].to_pylist(),
                )
            )
        return out, covered

    def partitions(self):
        cons_parts = None
        covered = None
        if self._url_constrained() and self.index != "never":
            loaded = self._consolidated_ranges()
            if loaded is not None:
                import posixpath

                cons, covered = loaded
                by_seg: dict = {}
                for seg, off, ln, url in cons:
                    by_seg.setdefault(seg, []).append((off, ln, url))
                cons_parts = []
                for seg in sorted(by_seg):
                    seg_path = posixpath.join(self.path.rstrip("/"), seg)
                    if not self._keep_file(seg_path):
                        continue  # pushed warc_file filters compose
                    ranges = sorted(by_seg[seg])
                    for i in range(0, len(ranges), self.records_per_task):
                        cons_parts.append(
                            _WarcRangePartition(seg_path, ranges[i : i + self.records_per_task])
                        )
                if covered is None:
                    # manifest-less legacy index: cannot distinguish
                    # covered from later-appended segments, so the index
                    # wins unconditionally (pre-r7 behavior; re-run
                    # consolidate_cdx to get union freshness)
                    return cons_parts or [_WarcFilePartition(None)]
        files = self._files()
        if not files:
            raise FileNotFoundError(f"no WARC files under {self.path}")
        kept = [f for f in files if self._keep_file(f)]
        if cons_parts is not None:
            # index covers consolidated segments; segments appended after
            # consolidate_cdx ran keep their per-segment sidecars and flow
            # through the sidecar loop below — one listing plus one
            # sidecar read per NEW segment, never per covered segment
            kept = [p for p in kept if p.rsplit("/", 1)[-1] not in covered]
            if not kept:
                return cons_parts or [_WarcFilePartition(None)]
        elif not kept:
            # filters pruned every segment: a legitimately EMPTY scan
            # (distinct from the no-files-at-all error above)
            return [_WarcFilePartition(None)]
        parts = list(cons_parts or [])
        for p in kept:
            loaded = self._load_cdx(p) if self.index != "never" else None
            if loaded is None:
                if self.index == "require":
                    raise ValueError(f"vf_warc index=require: no CDX sidecar for {p}")
                parts.append(_WarcFilePartition(p))
                continue
            ranges, has_urls = loaded
            if has_urls and self._url_constrained():
                # the wayback lookup: only matching records get planned
                ranges = [r for r in ranges if self._url_match(r[2])]
            for i in range(0, len(ranges), self.records_per_task):
                parts.append(_WarcRangePartition(p, ranges[i : i + self.records_per_task]))
        # A pushed url filter can prune every range in every CDX-indexed
        # segment (wayback lookup for an absent URL). PySpark replaces an
        # empty partitions() list with [None] and calls read(None), so
        # return the same empty-scan sentinel the file-pruned case uses.
        return parts or [_WarcFilePartition(None)]

    def read(self, partition):
        """Rows ride ARROW RecordBatches (the Python DataSource fast
        path — per-batch transfer instead of per-row pickling), flushed
        at 256 rows or 16 MB of payload so 1 MB documents stay
        memory-bounded."""
        import pyarrow as pa

        from vectorflow_spark.sources.openers import arrow_record_batches

        schema = pa.schema(
            [
                ("warc_file", pa.string()),
                ("url", pa.string()),
                ("warc_type", pa.string()),
                ("payload_type", pa.string()),
                ("n_bytes", pa.int64()),
                ("body", pa.binary()),
            ]
        )
        return arrow_record_batches(self._rows(partition), schema, size_idx=4)

    def _rows(self, partition):
        # runs on the executor; records STREAM through whichever opener
        # resolved — peak memory is one record + one chunk for local,
        # mount and fsspec backends alike
        import contextlib
        import zlib

        from vectorflow_spark.sources.warcmini import iter_warc_stream

        if partition.path is None:  # every segment pruned by pushdown
            return

        source = partition.path.rsplit("/", 1)[-1]
        # pushed warc_type filter: matching is exact-semantics (we claim
        # the filter, so WE must enforce it), applied before a record
        # ever becomes an Arrow row — including error rows, whose
        # warc_type is 'error'
        types = getattr(self, "type_values", None)

        if isinstance(partition, _WarcRangePartition):
            # CDX random access: each (offset, length) slice is one
            # record (its own gzip member when compressed), so the task
            # seeks straight to its records — segment size no longer
            # bounds parallelism, and corruption isolates per record
            import gzip
            import io

            from vectorflow_spark.sources.warcmini import iter_warc_records

            with contextlib.closing(self._fs().open(partition.path)) as raw:
                for offset, length, _idx_url in partition.ranges:
                    try:
                        raw.seek(offset)
                        data = raw.read(length)
                        if len(data) != length:
                            raise ValueError(
                                f"short read at offset {offset} of {source}"
                            )
                        if data[:2] == b"\x1f\x8b":
                            data = gzip.decompress(data)
                        [rec] = list(iter_warc_records(io.BytesIO(data)))
                    except (ValueError, OSError, EOFError, zlib.error, NotImplementedError) as e:
                        if self.on_corrupt == "strict":
                            raise
                        if types is None or "error" in types:
                            yield (source, None, "error", str(e)[:500], 0, None)
                        continue
                    if types is not None and rec.get("warc-type") not in types:
                        continue
                    if not self._url_match(rec.get("warc-target-uri")):
                        continue  # belt over the index's braces
                    body = rec.get("body", rec["payload"])
                    yield (
                        source,
                        rec.get("warc-target-uri"),
                        rec.get("warc-type"),
                        rec.get("content-type"),
                        len(body),
                        body,
                    )
            return

        def records():
            with contextlib.closing(self._fs().open(partition.path)) as raw:
                yield from iter_warc_stream(raw, chunk_size=self.chunk_size)

        it = records()
        while True:
            try:
                rec = next(it)
            except StopIteration:
                return
            # gzip truncation surfaces as EOFError/zlib.error, framing as
            # ValueError, filesystem as OSError (BadGzipFile is OSError)
            except (ValueError, OSError, EOFError, zlib.error, NotImplementedError) as e:
                if self.on_corrupt == "strict":
                    raise
                # records already yielded stay; one error row marks the file
                if types is None or "error" in types:
                    yield (source, None, "error", str(e)[:500], 0, None)
                return
            if types is not None and rec.get("warc-type") not in types:
                continue
            if not self._url_match(rec.get("warc-target-uri")):
                continue  # accepted url filter: enforce in stream mode too
            body = rec.get("body", rec["payload"])
            yield (
                source,
                rec.get("warc-target-uri"),
                rec.get("warc-type"),
                rec.get("content-type"),
                len(body),
                body,
            )


class VfWarcStreamReader(DataSourceStreamReader):
    """Continuous crawl ingest: each micro-batch processes the WARC
    segment files that APPEARED since the last batch — the Common Crawl
    delivery model (a crawler keeps dropping ~1 GB segments into a
    prefix) as a Structured Streaming source. Offsets are the sorted
    list of file names already planned, so recovery from the checkpoint
    replans exactly the unprocessed files; records stream off disk
    inside each task exactly like the batch reader (one file = one
    partition = one InputPartition). A file must be dropped in COMPLETE
    (write-temp + rename, as write_warc_corpus does) — the discovery
    glob has no way to tell a half-written file from a finished one,
    which is the same contract Spark's own file source imposes.

    The offset carries the full seen-file list (not a high-watermark
    name) so files may arrive in any lexical order; at millions of
    segments you would switch to (mtime, name) watermarks — documented
    trade-off, same as spark.readStream.format('binaryFile')'s file log."""

    def __init__(self, options: dict):
        self._batch = VfWarcReader(options)

    def initialOffset(self) -> dict:
        return {"seen": []}

    def latestOffset(self) -> dict:
        # _files() returns [] for an empty/missing dir (os.walk yields
        # nothing); the no-files error lives in partitions(), so no
        # exception handling is needed here
        return {"seen": self._batch._files()}

    def partitions(self, start: dict, end: dict):
        new = sorted(set(end["seen"]) - set(start["seen"]))
        return [_WarcFilePartition(p) for p in new]

    def read(self, partition: _WarcFilePartition):
        return self._batch.read(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the streaming checkpoint


class _WarcCommitMsg(WriterCommitMessage):
    """Per-task result: [(tmp_name, final_name, n_records, n_bytes,
    cdx_records_or_None)]; visible only after the driver commit."""

    def __init__(self, files: list):
        self.files = files


class VfWarcWriter(DataSourceWriter):
    """Batch WARC sink with job-commit semantics (Spark 4 Python
    DataSource writer API): tasks write segments to ``.uncommitted-*``
    temp names; the driver's ``commit`` renames them in (and writes CDX
    sidecars), ``abort`` removes every temp — task retries and job
    failures can never publish or orphan a half-written segment, which
    warcmini.write_warc_corpus's per-task rename cannot guarantee
    across job failure.

    Input rows: ``segment`` (final file name), ``url``, ``body``
    (binary) — rows of one segment co-partitioned (repartition on
    segment first); records sort by (url, body) so equal row sets make
    byte-identical segments. Options: ``compress`` (per-record gzip
    members), ``index`` (CDX sidecars at commit), ``recordType``,
    ``mime``."""

    def __init__(self, options, overwrite: bool):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("vf_warc write: path required")
        self.compress = str(options.get("compress", "true")).lower() == "true"
        self.index = str(options.get("index", "false")).lower() == "true"
        self.record_type = options.get("recordtype", "response")
        self.mime = options.get("mime", "text/plain")
        self.overwrite = overwrite
        # job-scoped temps: see VfTarWriter (r6 ADVICE — concurrent
        # writers must not delete each other's in-flight files)
        self.job_id = uuid.uuid4().hex

    def write(self, rows):
        import os
        import uuid

        from vectorflow_spark.sources.warcmini import build_warc

        os.makedirs(self.path, exist_ok=True)
        by_seg: dict = {}
        for r in rows:
            by_seg.setdefault(r["segment"], []).append((r["url"], bytes(r["body"])))
        out = []
        for seg in sorted(by_seg):
            recs = sorted(by_seg[seg])
            records = [(u, b, self.mime) for u, b in recs]
            blob, rec_index = build_warc(
                records, compress=self.compress, record_type=self.record_type,
                return_index=True,
            )
            cdx = None
            if self.index:
                urls = [None] + [u for u, _ in recs]  # warcinfo first
                cdx = [
                    {"offset": o, "length": n, "url": u}
                    for (o, n), u in zip(rec_index, urls)
                ]
            tmp = f".uncommitted-{self.job_id}-{uuid.uuid4().hex}"
            with open(os.path.join(self.path, tmp), "wb") as f:
                f.write(blob)
            out.append((tmp, seg, len(records), len(blob), cdx))
        return _WarcCommitMsg(out)

    def _cleanup_uncommitted(self):
        import glob
        import os

        # only THIS job's temps (r6 ADVICE)
        for p in glob.glob(os.path.join(self.path, f".uncommitted-{self.job_id}-*")):
            try:
                os.remove(p)
            except OSError:
                pass


    def _gc_stale_uncommitted(self) -> None:
        """Crash-orphan GC — shared contract and implementation in
        sinkgc.gc_stale_uncommitted (7-day bound, overridable via
        VFS_SINK_STALE_TEMP_SECONDS)."""
        from vectorflow_spark.sources.sinkgc import gc_stale_uncommitted

        gc_stale_uncommitted(self.path)

    def _remove_previous_output(self) -> None:
        """mode('overwrite'): retire every previously-published segment
        and CDX sidecar (including a consolidated ``_url_index``) before
        installing the new set; dot-prefixed in-flight temps survive."""
        import os
        import shutil

        for entry in os.listdir(self.path):
            if entry.startswith("."):
                continue
            fp = os.path.join(self.path, entry)
            try:
                if os.path.isfile(fp):
                    os.remove(fp)
                elif entry == "_url_index":
                    shutil.rmtree(fp, ignore_errors=True)
            except OSError:
                pass

    def _install(self, messages, prefix: str = "") -> None:
        """Validate every message, then rename temps to ``prefix +
        final`` and write CDX sidecars (no partial publish)."""
        import json
        import os

        seen: set = set()
        for msg in messages:
            if msg is None:
                continue
            for _tmp, final, *_rest in msg.files:
                if final in seen:
                    self._cleanup_uncommitted()
                    raise ValueError(
                        f"vf_warc write: {final!r} produced by two tasks - "
                        "repartition rows by the file-name column before writing"
                    )
                seen.add(final)
        if self.overwrite and not prefix:
            self._remove_previous_output()
        for msg in messages:
            if msg is None:
                continue
            for tmp, final, _n, _b, cdx in msg.files:
                name = prefix + final
                os.replace(os.path.join(self.path, tmp), os.path.join(self.path, name))
                if cdx is not None:
                    side = os.path.join(self.path, f"_{name}.cdx.json")
                    with open(side + ".tmp", "w") as f:
                        json.dump({"records": cdx}, f)
                    os.replace(side + ".tmp", side)
        self._cleanup_uncommitted()
        self._gc_stale_uncommitted()

    def commit(self, messages):
        self._install(messages)

    def abort(self, messages):
        self._cleanup_uncommitted()


class VfWarcStreamWriter(DataSourceStreamWriter):
    """Streaming twin of VfWarcWriter: micro-batch segments land as
    ``b<batchId>-<segment>`` with the same temp/validate/rename
    discipline; replayed batches overwrite their own batch-keyed names,
    so at-least-once re-fires are idempotent."""

    def __init__(self, options):
        self._core = VfWarcWriter(options, overwrite=False)

    def write(self, iterator):
        return self._core.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        self._core._install(messages, prefix=f"b{batchId:09d}-")

    def abort(self, messages, batchId: int) -> None:
        self._core._cleanup_uncommitted()


class VfWarcDataSource(DataSource):
    """``spark.read.format("vf_warc").load(path)`` for batch,
    ``spark.readStream.format("vf_warc").load(path)`` for continuous
    segment ingest, ``df.write.format("vf_warc").save(path)`` for the
    job-committed sink; register once per session with
    ``spark.dataSource.register(VfWarcDataSource)`` (or use
    ``warcmini.read_warc`` which does both)."""

    @classmethod
    def name(cls) -> str:
        return "vf_warc"

    def schema(self) -> str | StructType:
        return WARC_ROW_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return VfWarcReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return VfWarcStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> VfWarcWriter:
        return VfWarcWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> VfWarcStreamWriter:
        return VfWarcStreamWriter(self.options)


def register(spark) -> None:
    # the reader implements pushFilters(); Spark refuses to plan a
    # pushdown-capable Python source while this conf is off (runtime
    # SQLConf, safe to set here — every vf_warc entry point registers)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VfWarcDataSource)
