"""Custom Python Data Source (Spark 4 API): bulk URL-manifest ingest.

The reference's S6 path accepts presigned URLs one per HTTP request and
downloads them in the API process (reference src/api/app.py:180-226);
``sources/readers.stage_presigned`` mirrors that driver-side shape. This
module is the BULK counterpart the reference roadmap implies but never
ships (Salesforce/GDrive-style connectors, README.md:290-299): a manifest
of N URLs becomes a first-class ``spark.read.format("vf_docs")`` source
whose fetches run ON THE EXECUTORS, partitioned like any other scan.

Why a real DataSource instead of a UDF over a manifest DataFrame:

* partition planning is explicit — ``partitions()`` splits the manifest
  into ``num_partitions`` slices, so 1M URLs fan out across the cluster
  with no driver loop and no single-task fetch stage;
* the scan IS the source: downstream ``.select``/``.filter`` prune and
  push as usual, and the rows never exist driver-side;
* the same MIME sniff used by the binaryFile path (%PDF / PK magic,
  utf-8 probe) classifies each payload so the extract dispatch (S1-S5)
  composes unchanged.

Scale features (mirroring ``vf_warc``/``vf_tar``):

* **Injectable IO** — ``.option("io", ...)`` routes non-HTTP URL schemes
  through the shared opener layer (sources/openers.py): ``io=auto``
  resolves ``file://`` locally and any other scheme via fsspec
  (import-gated; ``io_register`` hook for credentials), ``io=mount:<root>``
  maps ``scheme://bucket/key`` under a FUSE mount. http/https always go
  through stdlib urllib (the presigned-URL contract). The ``manifest``
  option itself may live on an object store and is opened the same way.
* **Arrow transfer** — rows ride RecordBatches (one Arrow transfer per
  batch instead of per-row pickling), flushed at 256 rows / 16 MB of
  payload so a batch of 1 MB documents stays memory-bounded.
* **Scan pushdown** (Spark 4.1 ``pushFilters``; the conf is set by
  ``register()``): ``url`` equality/IN/prefix and ``source`` equality/IN
  prune the manifest AT PLANNING — non-matching URLs are never fetched,
  which is the difference between a 40-request wayback-style lookup and
  a million GETs; ``kind`` equality/IN drops rows after the sniff so
  filtered payloads never become Arrow rows.

The scheme gate stays strict: a manifest is untrusted input, and fetches
run on executors inside the cluster network — object-store schemes must
be opted into via ``allowedSchemes`` exactly like ``file``.

Streaming: ``spark.readStream.format("vf_docs").option("manifestDir",
dir)`` turns the drop-a-manifest delivery model into a Structured
Streaming source (VfDocsStreamReader) — each micro-batch fetches exactly
the URLs of manifests that appeared since the last batch, exactly-once
via checkpointed seen-list offsets, each manifest fanned out at
``urlsPerTask`` URLs per partition.

Offline-testable with file:// URLs and the mount backend (stdlib only),
which is how tests/test_datasource.py exercises it. Failure policy
mirrors the reference's per-file accounting (A4): a fetch error yields a
row with kind='error' and the message in ``error`` instead of killing
the scan — at 100 TB a 1-in-a-million dead link must not fail a 6-hour
job.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from vectorflow_spark.sources.openers import _resolve_io, _strip_scheme

_SCHEMA = (
    "url string, source string, kind string, n_bytes long, text string, error string"
)


class _ManifestPartition(InputPartition):
    def __init__(self, urls: list[str]):
        self.urls = urls


def _basename(url: str) -> str:
    import pathlib
    import urllib.parse

    return pathlib.Path(urllib.parse.urlparse(url).path).name or url


def sniff_kind(payload: bytes) -> tuple[str, str | None]:
    """The shared MIME sniff: magic-byte prefixes, then a utf-8 probe."""
    if payload[:4] == b"%PDF":
        return "pdf", None
    if payload[:2] == b"PK":
        return "docx", None
    try:
        return "txt", payload.decode("utf-8")
    except UnicodeDecodeError:
        return "binary", None


class VfDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.io = options.get("io", "auto")
        self.io_register = options.get("io_register")
        manifest = options.get("manifest")
        if manifest:
            self.urls = [
                ln.strip() for ln in self._read_manifest(manifest).splitlines() if ln.strip()
            ]
        else:
            self.urls = json.loads(options.get("urls", "[]"))
        self.num_partitions = int(options.get("numpartitions", "8"))
        # SSRF guard: a manifest is untrusted input, and fetches run on
        # executors inside the cluster network — without a scheme gate a
        # hostile manifest line can read worker-local files (file://) or
        # probe internal endpoints. Default http/https; tests opt in to
        # file:// explicitly via .option("allowedSchemes", "...,file"),
        # and object-store schemes (s3, gs, ...) opt in the same way.
        self.allowed_schemes = frozenset(
            s.strip().lower()
            for s in options.get("allowedschemes", "http,https").split(",")
            if s.strip()
        )

    def _read_manifest(self, manifest: str) -> str:
        """The manifest file itself may sit on an object store — open it
        through the same io layer as the payload URLs. Driver-side, so a
        missing backend is a loud error, not a per-row one."""
        import contextlib

        scheme = _strip_scheme(manifest)[0]
        if scheme in ("file",) and "://" not in manifest:
            with open(manifest) as f:
                return f.read()
        with contextlib.closing(
            _resolve_io(self.io, manifest, self.io_register).open(manifest)
        ) as f:
            return f.read().decode("utf-8")

    def pushFilters(self, filters):
        """``url``/``source`` filters prune the manifest at PLANNING time
        (pruned URLs are never fetched); ``kind`` filters drop rows after
        the payload sniff. Conjunction semantics: same-attribute value
        sets intersect; accepted filters are fully enforced here, so they
        are consumed (not returned). Returned filters are the INPUT
        objects by reference, per the API contract."""
        from pyspark.sql.datasource import EqualTo, In, StringStartsWith

        self.kind_values: set[str] | None = None
        url_values: set[str] | None = None
        url_prefixes: list[str] = []
        source_values: set[str] | None = None

        def narrow(current: set[str] | None, vals: set[str]) -> set[str]:
            return vals if current is None else current & vals

        remaining = []
        for f in filters:
            attr = getattr(f, "attribute", None)
            if isinstance(f, EqualTo) and attr == ("url",) and isinstance(f.value, str):
                url_values = narrow(url_values, {f.value})
            elif isinstance(f, In) and attr == ("url",) and all(
                isinstance(v, str) for v in f.value
            ):
                url_values = narrow(url_values, set(f.value))
            elif isinstance(f, StringStartsWith) and attr == ("url",) and isinstance(
                f.value, str
            ):
                url_prefixes.append(f.value)
            elif isinstance(f, EqualTo) and attr == ("source",) and isinstance(f.value, str):
                source_values = narrow(source_values, {f.value})
            elif isinstance(f, In) and attr == ("source",) and all(
                isinstance(v, str) for v in f.value
            ):
                source_values = narrow(source_values, set(f.value))
            elif isinstance(f, EqualTo) and attr == ("kind",) and isinstance(f.value, str):
                self.kind_values = narrow(self.kind_values, {f.value})
            elif isinstance(f, In) and attr == ("kind",) and all(
                isinstance(v, str) for v in f.value
            ):
                self.kind_values = narrow(self.kind_values, set(f.value))
            else:
                remaining.append(f)

        def keep(url: str) -> bool:
            if url_values is not None and url not in url_values:
                return False
            if source_values is not None and _basename(url) not in source_values:
                return False
            return all(url.startswith(p) for p in url_prefixes)

        if url_values is not None or source_values is not None or url_prefixes:
            self.urls = [u for u in self.urls if keep(u)]
        return remaining

    def partitions(self):
        n = max(1, min(self.num_partitions, len(self.urls) or 1))
        slices = [self.urls[i::n] for i in range(n)]
        return [_ManifestPartition(s) for s in slices if s] or [_ManifestPartition([])]

    def _fetch(self, url: str, scheme: str) -> bytes:
        """One payload: stdlib urllib for http/https/file (the presigned
        contract), the injectable opener for everything else. Openers are
        cached per scheme so a mixed-scheme manifest resolves each
        backend once per task."""
        import contextlib
        import urllib.request

        if scheme in ("http", "https", "file"):
            with urllib.request.urlopen(url, timeout=30) as r:
                return r.read()
        openers = getattr(self, "_openers", None)
        if openers is None:
            openers = self._openers = {}
        fs = openers.get(scheme)
        if fs is None:
            fs = openers[scheme] = _resolve_io(self.io, url, self.io_register)
        with contextlib.closing(fs.open(url)) as f:
            return f.read()

    def __getstate__(self):
        d = self.__dict__.copy()
        d.pop("_openers", None)
        return d

    def read(self, partition: _ManifestPartition):
        """Rows ride ARROW RecordBatches, flushed at 256 rows / 16 MB of
        payload bytes (openers.arrow_record_batches)."""
        import pyarrow as pa

        from vectorflow_spark.sources.openers import arrow_record_batches

        schema = pa.schema(
            [
                ("url", pa.string()),
                ("source", pa.string()),
                ("kind", pa.string()),
                ("n_bytes", pa.int64()),
                ("text", pa.string()),
                ("error", pa.string()),
            ]
        )
        return arrow_record_batches(self._rows(partition), schema, size_idx=3)

    def _rows(self, partition: _ManifestPartition):
        # runs on the executor: stdlib-only unless an opener needs more
        import urllib.parse

        kinds = getattr(self, "kind_values", None)
        for url in partition.urls:
            scheme = urllib.parse.urlparse(url).scheme.lower()
            name = _basename(url)
            if scheme not in self.allowed_schemes:
                if kinds is not None and "error" not in kinds:
                    continue
                yield (
                    url,
                    name,
                    "error",
                    0,
                    None,
                    f"scheme '{scheme}' not in allowedSchemes "
                    f"({','.join(sorted(self.allowed_schemes))})",
                )
                continue
            try:
                payload = self._fetch(url, scheme)
            except Exception as e:  # noqa: BLE001 — per-file accounting, A4
                if kinds is not None and "error" not in kinds:
                    continue
                yield (url, name, "error", 0, None, str(e)[:500])
                continue
            kind, text = sniff_kind(payload)
            if kinds is not None and kind not in kinds:
                continue  # pushed kind filter: dropped before Arrow
            yield (url, name, kind, len(payload), text, None)


class VfDocsStreamReader(DataSourceStreamReader):
    """Continuous BULK-URL ingest — the drop-a-manifest delivery model:
    a producer keeps writing manifest files (one URL per line) into a
    directory, and each micro-batch fetches exactly the URLs of the
    manifests that APPEARED since the last batch. Offsets are the sorted
    seen-manifest list (the vf_warc/vf_tar model), so checkpoint
    recovery replans exactly the unprocessed manifests; a manifest must
    be dropped COMPLETE (write-temp + rename) and is treated as
    immutable — the same contract Spark's own file source imposes.
    Each manifest splits into ceil(n_urls / urlsPerTask) partitions
    (default 256 URLs/task) so one big manifest still fans out across
    the cluster. Scheme gate, io backends, Arrow batching and per-URL
    error rows are the batch reader's, shared via ``VfDocsReader``."""

    def __init__(self, options: dict):
        self.manifest_dir = options.get("manifestdir")
        if not self.manifest_dir:
            raise ValueError(
                "vf_docs stream requires .option('manifestDir', <dir of manifest files>)"
            )
        self.glob = options.get("glob")
        self.urls_per_task = max(1, int(options.get("urlspertask", "256")))
        proto_opts = {k: v for k, v in options.items() if k not in ("manifest", "urls")}
        proto_opts["urls"] = "[]"
        self._proto = VfDocsReader(proto_opts)

    def _fs(self):
        fs = getattr(self, "_fs_cache", None)
        if fs is None:
            fs = self._fs_cache = _resolve_io(
                self._proto.io, self.manifest_dir, self._proto.io_register
            )
        return fs

    def __getstate__(self):
        d = self.__dict__.copy()
        d.pop("_fs_cache", None)
        return d

    def initialOffset(self) -> dict:
        return {"seen": []}

    def latestOffset(self) -> dict:
        return {"seen": sorted(self._fs().list_files(self.manifest_dir, self.glob))}

    def partitions(self, start: dict, end: dict):
        parts = []
        for mf in sorted(set(end["seen"]) - set(start["seen"])):
            urls = [
                ln.strip()
                for ln in self._proto._read_manifest(mf).splitlines()
                if ln.strip()
            ]
            for i in range(0, len(urls), self.urls_per_task):
                parts.append(_ManifestPartition(urls[i : i + self.urls_per_task]))
        return parts or [_ManifestPartition([])]

    def read(self, partition: _ManifestPartition):
        return self._proto.read(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the streaming checkpoint


class VfDocsDataSource(DataSource):
    """``spark.read.format("vf_docs").option("manifest", path)`` or
    ``.option("urls", json_list)`` for batch;
    ``spark.readStream.format("vf_docs").option("manifestDir", dir)``
    for continuous manifest-drop ingest. Register once per session with
    ``datasource.register(spark)``."""

    @classmethod
    def name(cls) -> str:
        return "vf_docs"

    def schema(self) -> str | StructType:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return VfDocsReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return VfDocsStreamReader(self.options)


def register(spark) -> None:
    # the reader implements pushFilters(); Spark refuses to plan a
    # pushFilters-defining source unless the conf is on
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(VfDocsDataSource)
