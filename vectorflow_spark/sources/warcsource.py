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

Reference parity: the reference ingests web corpora one downloaded file
at a time in its API process (src/api/app.py); this source is the
cluster-scale counterpart (SURVEY.md §2.1 S6 family).
"""

from __future__ import annotations

import fnmatch
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

WARC_ROW_SCHEMA = (
    "warc_file string, url string, warc_type string, payload_type string, "
    "n_bytes long, body binary"
)


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class VfWarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("vf_warc requires a load path: .load('/dir/of/warcs')")
        self.glob = options.get("glob")
        self.chunk_size = int(options.get("chunksize", str(1 << 16)))
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

    def _files(self) -> list[str]:
        # Discovery walks the LOCAL filesystem: a Python DataSource's
        # partitions()/read() run in Python workers with no Hadoop
        # FileSystem client, so s3a://-style paths cannot be listed or
        # opened here. Refuse loudly and point at the fallback instead of
        # producing an empty scan (warcmini.read_warc_binaryfile rides
        # the JVM binaryFile source, which speaks every Hadoop scheme, at
        # the cost of whole-file rows).
        scheme = self.path.split("://", 1)[0] if "://" in self.path else "file"
        if scheme not in ("file",):
            # ValueError, deliberately NOT NotImplementedError: the
            # DataSource API treats NotImplementedError from partitions()
            # as "source is unpartitioned" and silently falls back to a
            # single None partition, swallowing the message.
            raise ValueError(
                f"vf_warc lists the local filesystem only (got scheme "
                f"'{scheme}'); for object stores use "
                "warcmini.read_warc_binaryfile (JVM binaryFile scan, "
                "whole-file rows) or stage segments locally"
            )
        local = self.path[len("file://"):] if self.path.startswith("file://") else self.path
        if os.path.isfile(local):
            return [local]
        # Listing contract shared with read_warc_binaryfile (which sets
        # recursiveFileLookup to match this walk): recursive, hidden
        # ./_ names excluded, glob matches the BASENAME (use the */?
        # subset common to fnmatch and Hadoop globs so both paths list
        # identically).
        out = []
        for root, _dirs, names in os.walk(local):
            for name in sorted(names):
                if name.startswith((".", "_")):
                    continue  # match binaryFile's hidden/metadata exclusion
                if self.glob and not fnmatch.fnmatch(name, self.glob):
                    continue
                out.append(os.path.join(root, name))
        return sorted(out)

    def partitions(self):
        files = self._files()
        if not files:
            raise FileNotFoundError(f"no WARC files under {self.path}")
        return [_WarcFilePartition(p) for p in files]

    def read(self, partition: _WarcFilePartition):
        # runs on the executor; stdlib-only
        import zlib

        from vectorflow_spark.sources.warcmini import iter_warc_file

        source = os.path.basename(partition.path)
        it = iter_warc_file(partition.path, chunk_size=self.chunk_size)
        while True:
            try:
                rec = next(it)
            except StopIteration:
                return
            # gzip truncation surfaces as EOFError/zlib.error, framing as
            # ValueError, filesystem as OSError (BadGzipFile is OSError)
            except (ValueError, OSError, EOFError, zlib.error) as e:
                if self.on_corrupt == "strict":
                    raise
                # records already yielded stay; one error row marks the file
                yield (source, None, "error", str(e)[:500], 0, None)
                return
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


class VfWarcDataSource(DataSource):
    """``spark.read.format("vf_warc").load(path)`` for batch,
    ``spark.readStream.format("vf_warc").load(path)`` for continuous
    segment ingest; register once per session with
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


def register(spark) -> None:
    spark.dataSource.register(VfWarcDataSource)
