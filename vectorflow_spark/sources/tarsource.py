"""``vf_tar``: a streaming TAR-shard Data Source (Spark 4 Python API) —
the WebDataset ingestion path.

Large-scale multimodal training data ships as TAR SHARDS (WebDataset:
thousands of ``shard-00042.tar`` files, each holding samples as adjacent
members ``<key>.jpg`` + ``<key>.json`` + ``<key>.txt``), because tar
preserves member adjacency and streams sequentially — the same
properties that make WARC the crawl container. The scan mirrors
``vf_warc`` exactly:

* one partition per shard file (tar has no random index when streamed,
  so the FILE is the parallel unit — WebDataset shards are sized
  ~100 MB-1 GB for exactly this reason);
* members STREAM via ``tarfile``'s pipe mode (``r|*``): peak task
  memory is one member + tarfile's 10 KB block buffer, never the shard;
* the same injectable IO layer (``io=auto|fsspec|mount:<root>``,
  ``io_register`` hook — sources/openers.py) lists and opens shards on
  local disk, FUSE mounts, or any fsspec protocol;
* scan pushdown: ``shard`` equality/IN/prefix prunes whole shard
  partitions at planning; ``ext`` equality/IN skips members inside the
  tar walk before they become Arrow rows (reading only the ``.txt``
  leg of an image-text corpus never deserializes the images).

Rows: ``shard, member, key, ext, n_bytes, data`` where WebDataset's
``key``/``ext`` split is the FIRST dot in the basename (so
``a/b/0001.seg.json`` -> key ``a/b/0001``, ext ``seg.json``), matching
the webdataset library's grouping rule. ``sources/wds.py`` builds the
sample-assembly and shard-writing layers on top.

Reference parity note: the reference ingests one uploaded file at a time
(src/api/app.py); tar-shard streaming is the cluster-scale counterpart
for the multimodal corpora the extension operators target (SURVEY.md
§2.13).
"""

from __future__ import annotations

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

from vectorflow_spark.sources.openers import _resolve_io

TAR_ROW_SCHEMA = (
    "shard string, member string, key string, ext string, n_bytes long, data binary"
)


# Crash-orphan GC + stale bound shared with the WARC sink — one
# implementation in sinkgc.py (r9 verdict item 6). Re-exported under the
# private name the tests and older call sites use.
from vectorflow_spark.sources.sinkgc import stale_temp_seconds as _stale_temp_seconds


class _TarShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _TarRangePartition(InputPartition):
    """A sample-aligned slice of one shard: (name, offset, size) member
    metas from the index sidecar; the reader seeks straight to each."""

    def __init__(self, path: str, members: list):
        self.path = path
        self.members = members


def split_member_name(name: str) -> tuple[str, str]:
    """WebDataset key/ext split: first dot in the BASENAME (directories
    may contain dots)."""
    slash = name.rfind("/")
    dot = name.find(".", slash + 1)
    if dot < 0:
        return name, ""
    return name[:dot], name[dot + 1 :]


class VfTarReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("vf_tar requires a load path: .load('/dir/of/shards')")
        self.glob = options.get("glob")
        self.io = options.get("io", "auto")
        self.io_register = options.get("io_register")
        # onCorrupt mirrors vf_warc: 'row' (default) keeps members parsed
        # so far and emits ONE error row (ext='error', member=<message>);
        # 'strict' fails the task.
        self.on_corrupt = options.get("oncorrupt", "row").lower()
        if self.on_corrupt not in ("row", "strict"):
            raise ValueError(f"onCorrupt must be 'row' or 'strict', got {self.on_corrupt!r}")
        # index: 'auto' (default) uses a _<shard>.tar.idx.json sidecar
        # when present to SPLIT the shard into sample-aligned byte-range
        # partitions (seek-based reads; ext pushdown then skips members
        # without even streaming past them); 'never' always walks whole
        # shards; 'require' errors on a missing sidecar.
        self.index = options.get("index", "auto").lower()
        if self.index not in ("auto", "never", "require"):
            raise ValueError(f"index must be auto|never|require, got {self.index!r}")
        self.samples_per_task = int(options.get("samplespertask", "2048"))
        # byte budget per range partition: with skewed member sizes (a
        # few 100 MB videos among 10 KB captions) a pure sample count
        # makes straggler tasks — a chunk closes when EITHER bound hits.
        self.bytes_per_task = int(options.get("bytespertask", str(128 << 20)))

    def _fs(self):
        fs = getattr(self, "_fs_cache", None)
        if fs is None:
            fs = self._fs_cache = _resolve_io(self.io, self.path, self.io_register)
        return fs

    def __getstate__(self):
        d = self.__dict__.copy()
        d.pop("_fs_cache", None)
        return d

    def pushFilters(self, filters):
        """``shard`` filters prune whole shard partitions; ``ext``
        equality/IN skips members during the tar walk (their bytes are
        still streamed past — tar is sequential — but never copied into
        rows). Conjunction semantics: same-attribute value sets
        intersect."""
        from pyspark.sql.datasource import EqualTo, In, StringStartsWith

        self.shard_values: set[str] | None = None
        self.shard_prefixes: list[str] = []
        self.ext_values: set[str] | None = None

        def narrow(current: set[str] | None, vals: set[str]) -> set[str]:
            return vals if current is None else current & vals

        remaining = []
        for f in filters:
            attr = getattr(f, "attribute", None)
            if isinstance(f, EqualTo) and attr == ("shard",) and isinstance(f.value, str):
                self.shard_values = narrow(self.shard_values, {f.value})
            elif isinstance(f, In) and attr == ("shard",) and all(
                isinstance(v, str) for v in f.value
            ):
                self.shard_values = narrow(self.shard_values, set(f.value))
            elif isinstance(f, StringStartsWith) and attr == ("shard",) and isinstance(f.value, str):
                self.shard_prefixes.append(f.value)
            elif isinstance(f, EqualTo) and attr == ("ext",) and isinstance(f.value, str):
                self.ext_values = narrow(self.ext_values, {f.value})
            elif isinstance(f, In) and attr == ("ext",) and all(
                isinstance(v, str) for v in f.value
            ):
                self.ext_values = narrow(self.ext_values, set(f.value))
            else:
                remaining.append(f)
        return remaining

    def _keep_shard(self, path: str) -> bool:
        name = path.rsplit("/", 1)[-1]
        values = getattr(self, "shard_values", None)
        prefixes = getattr(self, "shard_prefixes", [])
        if values is not None and name not in values:
            return False
        return all(name.startswith(p) for p in prefixes)

    def _load_index(self, path: str) -> list | None:
        """Member metas from the sidecar, or None when absent."""
        import contextlib
        import json

        head, _, name = path.rpartition("/")
        side = (head + "/" if head else "") + f"_{name}.idx.json"
        try:
            with contextlib.closing(self._fs().open(side)) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            return None
        return [(m["name"], int(m["offset"]), int(m["size"])) for m in doc["members"]]

    def partitions(self):
        files = self._fs().list_files(self.path, self.glob)
        if not files:
            raise FileNotFoundError(f"no tar shards under {self.path}")
        kept = [f for f in files if self._keep_shard(f)]
        if not kept:
            return [_TarShardPartition(None)]  # pruned-to-empty: legit empty scan
        parts = []
        for p in kept:
            metas = self._load_index(p) if self.index != "never" else None
            if metas is None:
                if self.index == "require":
                    raise ValueError(f"vf_tar index=require: no index sidecar for {p}")
                parts.append(_TarShardPartition(p))
                continue
            # split at SAMPLE boundaries (never inside a key) so the
            # zero-shuffle assembly stays correct under range partitions;
            # a chunk closes at samplesPerTask OR bytesPerTask, whichever
            # hits first, so byte-skewed shards stay balanced
            chunk: list = []
            n_samples = 0
            chunk_bytes = 0
            last_key = None
            for meta in metas:
                key = split_member_name(meta[0])[0]
                if key != last_key:
                    if chunk and (
                        n_samples >= self.samples_per_task
                        or chunk_bytes >= self.bytes_per_task
                    ):
                        parts.append(_TarRangePartition(p, chunk))
                        chunk = []
                        n_samples = 0
                        chunk_bytes = 0
                    n_samples += 1
                    last_key = key
                chunk.append(meta)
                chunk_bytes += meta[2]
            if chunk:
                parts.append(_TarRangePartition(p, chunk))
        # Empty index sidecars (or pushed filters pruning every member of
        # every shard) can leave parts empty; PySpark turns an empty list
        # into [None] and read(None) would crash, so hand back the same
        # empty-scan sentinel the shard-pruned case uses.
        return parts or [_TarShardPartition(None)]

    def read(self, partition):
        """Rows ride ARROW RecordBatches (per-batch transfer instead of
        per-row pickling), flushed at 256 rows / 16 MB of member bytes."""
        import pyarrow as pa

        from vectorflow_spark.sources.openers import arrow_record_batches

        schema = pa.schema(
            [
                ("shard", pa.string()),
                ("member", pa.string()),
                ("key", pa.string()),
                ("ext", pa.string()),
                ("n_bytes", pa.int64()),
                ("data", pa.binary()),
            ]
        )
        return arrow_record_batches(self._rows(partition), schema, size_idx=4)

    def _rows(self, partition):
        import contextlib
        import tarfile

        if partition.path is None:
            return
        shard = partition.path.rsplit("/", 1)[-1]
        exts = getattr(self, "ext_values", None)
        if isinstance(partition, _TarRangePartition):
            # seek-based range read: pushdown-skipped members are never
            # even streamed past, and a few huge shards no longer cap
            # parallelism (the point of the index sidecar)
            with contextlib.closing(self._fs().open(partition.path)) as raw:
                for name, offset, size in partition.members:
                    key, ext = split_member_name(name)
                    if exts is not None and ext not in exts:
                        continue
                    raw.seek(offset)
                    data = raw.read(size)
                    if len(data) != size:
                        raise ValueError(f"vf_tar: short read for member {name} of {shard}")
                    yield (shard, name, key, ext, size, data)
            return
        try:
            with contextlib.closing(self._fs().open(partition.path)) as raw:
                # 'r|*': pure forward streaming (plain or gzip tar) — no
                # seeks, so the opener only needs read(); members arrive
                # one at a time and extractfile reads member-bounded data
                with tarfile.open(fileobj=raw, mode="r|*") as tar:
                    for member in tar:
                        if not member.isfile():
                            continue
                        key, ext = split_member_name(member.name)
                        if exts is not None and ext not in exts:
                            continue  # skipped BEFORE materializing bytes
                        f = tar.extractfile(member)
                        data = f.read() if f is not None else b""
                        yield (shard, member.name, key, ext, len(data), data)
        except (tarfile.TarError, OSError, EOFError) as e:
            if self.on_corrupt == "strict":
                raise
            yield (shard, str(e)[:500], None, "error", 0, None)


class VfTarStreamReader(DataSourceStreamReader):
    """Continuous shard ingest: each micro-batch processes shard files
    that APPEARED since the last batch — identical offset model to
    ``vf_warc``'s stream reader (drop shards in complete via
    write-temp + rename)."""

    def __init__(self, options: dict):
        self._batch = VfTarReader(options)

    def initialOffset(self) -> dict:
        return {"seen": []}

    def latestOffset(self) -> dict:
        return {"seen": self._batch._fs().list_files(self._batch.path, self._batch.glob)}

    def partitions(self, start: dict, end: dict):
        new = sorted(set(end["seen"]) - set(start["seen"]))
        return [_TarShardPartition(p) for p in new]

    def read(self, partition: _TarShardPartition):
        return self._batch.read(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the streaming checkpoint


class _TarCommitMsg(WriterCommitMessage):
    """Per-task result: [(tmp_name, final_name, n_members, n_bytes,
    member_metas_or_None)] — nothing is visible until the DRIVER commit
    renames the temp files in."""

    def __init__(self, files: list):
        self.files = files


class VfTarWriter(DataSourceWriter):
    """Batch writer with REAL job-commit semantics (the Spark 4 Python
    DataSource writer API): every task writes its tar(s) to hidden
    ``.uncommitted-*`` temp names; only the driver's ``commit`` renames
    them to their final shard names (and writes index sidecars), and
    ``abort`` removes every temp — a failed or retried task can never
    leave a half-published or orphaned shard, which the hand-rolled
    per-task rename in wds.write_webdataset cannot guarantee across JOB
    failure.

    Input rows: ``shard`` (final file name), ``member`` (name inside the
    tar), ``data`` (binary), optional ``seq`` (string; members sort by
    (seq, member) within a shard, else by member) — rows for one shard
    must be co-partitioned (repartition on shard before writing). Tar
    metadata is zeroed so equal row sets produce byte-identical shards.
    Options: ``compress`` (gzip members NOT seekable -> no index),
    ``index`` (write ``_<shard>.tar.idx.json`` sidecars at commit)."""

    def __init__(self, options, overwrite: bool):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("vf_tar write: path required")
        self.compress = str(options.get("compress", "false")).lower() == "true"
        self.index = str(options.get("index", "false")).lower() == "true"
        if self.index and self.compress:
            raise ValueError("vf_tar write: index requires compress=false (gzip tars are not seekable)")
        self.overwrite = overwrite
        # temps are JOB-scoped: the id is chosen once on the driver and
        # rides serialization to every task, so commit/abort cleanup only
        # deletes THIS job's temps — two jobs (or streaming queries)
        # writing the same path can no longer delete each other's
        # in-flight files mid-commit (r6 ADVICE)
        self.job_id = uuid.uuid4().hex

    def write(self, rows):
        import io
        import os
        import tarfile
        import uuid

        os.makedirs(self.path, exist_ok=True)
        by_shard: dict = {}
        for r in rows:
            seq = r["seq"] if "seq" in r.__fields__ else None
            by_shard.setdefault(r["shard"], []).append((seq, r["member"], bytes(r["data"])))
        out = []
        for shard in sorted(by_shard):
            members = sorted(by_shard[shard], key=lambda t: (t[0] or "", t[1]))
            buf = io.BytesIO()
            if self.compress:
                import gzip

                gz = gzip.GzipFile(fileobj=buf, mode="wb", mtime=0)
                tar = tarfile.open(fileobj=gz, mode="w")
            else:
                gz = None
                tar = tarfile.open(fileobj=buf, mode="w")
            for _seq, name, data in members:
                info = tarfile.TarInfo(name=name)
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                info.mode = 0o644
                tar.addfile(info, io.BytesIO(data))
            tar.close()
            if gz is not None:
                gz.close()
            blob = buf.getvalue()
            metas = None
            if self.index:
                with tarfile.open(fileobj=io.BytesIO(blob), mode="r:") as t:
                    metas = [
                        {"name": m.name, "offset": m.offset_data, "size": m.size}
                        for m in t
                        if m.isfile()
                    ]
            tmp = f".uncommitted-{self.job_id}-{uuid.uuid4().hex}"
            with open(os.path.join(self.path, tmp), "wb") as f:
                f.write(blob)
            out.append((tmp, shard, len(members), len(blob), metas))
        return _TarCommitMsg(out)

    def _cleanup_uncommitted(self):
        import glob
        import os

        # only THIS job's temps: a concurrent writer's in-flight files
        # must survive our commit/abort (r6 ADVICE)
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
        """mode('overwrite'): retire EVERY previously-published shard and
        index sidecar before installing the new set — replacing only
        same-named files would silently mix stale and new output
        (r6 ADVICE). Dot-prefixed names (in-flight temps, this job's or
        another's) survive."""
        import os

        for entry in os.listdir(self.path):
            if entry.startswith("."):
                continue
            fp = os.path.join(self.path, entry)
            if os.path.isfile(fp):
                try:
                    os.remove(fp)
                except OSError:
                    pass

    def _install(self, messages, prefix: str = "") -> None:
        """Validate EVERYTHING before renaming ANYTHING (a commit that
        throws halfway would otherwise leave a partial publish), then
        rename temps to ``prefix + final`` and write sidecars."""
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
                        f"vf_tar write: {final!r} produced by two tasks - "
                        "repartition rows by the file-name column before writing"
                    )
                seen.add(final)
        if self.overwrite and not prefix:
            self._remove_previous_output()
        for msg in messages:
            if msg is None:
                continue
            for tmp, final, _n, _b, metas in msg.files:
                name = prefix + final
                os.replace(os.path.join(self.path, tmp), os.path.join(self.path, name))
                if metas is not None:
                    side = os.path.join(self.path, f"_{name}.idx.json")
                    with open(side + ".tmp", "w") as f:
                        json.dump({"members": metas}, f)
                    os.replace(side + ".tmp", side)
        # temp files from retried/failed attempts whose messages never
        # reached the driver
        self._cleanup_uncommitted()
        self._gc_stale_uncommitted()

    def commit(self, messages):
        self._install(messages)

    def abort(self, messages):
        self._cleanup_uncommitted()


class VfTarStreamWriter(DataSourceStreamWriter):
    """Streaming twin of VfTarWriter: each micro-batch's shards land as
    ``b<batchId>-<shard>`` via the same temp-write/validate/rename
    discipline — a REPLAYED batch re-renames onto its own batch-keyed
    names (os.replace overwrite), so at-least-once re-fires are
    idempotent exactly like the repo's batch_id=N parquet convention."""

    def __init__(self, options):
        self._core = VfTarWriter(options, overwrite=False)

    def write(self, iterator):
        return self._core.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        self._core._install(messages, prefix=f"b{batchId:09d}-")

    def abort(self, messages, batchId: int) -> None:
        self._core._cleanup_uncommitted()


class VfTarDataSource(DataSource):
    """``spark.read.format("vf_tar").load(path)`` for batch,
    ``spark.readStream.format("vf_tar").load(path)`` for continuous
    shard ingest, ``df.write.format("vf_tar").save(path)`` for the
    job-committed sink; register with ``tarsource.register(spark)``."""

    @classmethod
    def name(cls) -> str:
        return "vf_tar"

    def schema(self) -> str | StructType:
        return TAR_ROW_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return VfTarReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return VfTarStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> VfTarWriter:
        return VfTarWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> VfTarStreamWriter:
        return VfTarStreamWriter(self.options)


def register(spark) -> None:
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VfTarDataSource)
