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

Offline-testable with file:// URLs (stdlib urllib; no extra deps), which
is how tests/test_datasource.py exercises it. Failure policy mirrors the
reference's per-file accounting (A4): a fetch error yields a row with
kind='error' and the message in ``error`` instead of killing the scan —
at 100 TB a 1-in-a-million dead link must not fail a 6-hour job.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_SCHEMA = (
    "url string, source string, kind string, n_bytes long, text string, error string"
)


class _ManifestPartition(InputPartition):
    def __init__(self, urls: list[str]):
        self.urls = urls


class VfDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        manifest = options.get("manifest")
        if manifest:
            with open(manifest) as f:
                self.urls = [ln.strip() for ln in f if ln.strip()]
        else:
            self.urls = json.loads(options.get("urls", "[]"))
        self.num_partitions = int(options.get("numpartitions", "8"))
        # SSRF guard: a manifest is untrusted input, and fetches run on
        # executors inside the cluster network — without a scheme gate a
        # hostile manifest line can read worker-local files (file://) or
        # probe internal endpoints. Default http/https; tests opt in to
        # file:// explicitly via .option("allowedSchemes", "...,file").
        self.allowed_schemes = frozenset(
            s.strip().lower()
            for s in options.get("allowedschemes", "http,https").split(",")
            if s.strip()
        )

    def partitions(self):
        n = max(1, min(self.num_partitions, len(self.urls) or 1))
        slices = [self.urls[i::n] for i in range(n)]
        return [_ManifestPartition(s) for s in slices if s]

    def read(self, partition: _ManifestPartition):
        # runs on the executor: stdlib-only so no cluster deps
        import pathlib
        import urllib.parse
        import urllib.request

        for url in partition.urls:
            parsed = urllib.parse.urlparse(url)
            name = pathlib.Path(parsed.path).name or url
            if parsed.scheme.lower() not in self.allowed_schemes:
                yield (
                    url,
                    name,
                    "error",
                    0,
                    None,
                    f"scheme '{parsed.scheme}' not in allowedSchemes "
                    f"({','.join(sorted(self.allowed_schemes))})",
                )
                continue
            try:
                with urllib.request.urlopen(url, timeout=30) as r:
                    payload = r.read()
            except Exception as e:  # noqa: BLE001 — per-file accounting, A4
                yield (url, name, "error", 0, None, str(e)[:500])
                continue
            head = payload[:4]
            if head[:4] == b"%PDF":
                kind, text = "pdf", None
            elif head[:2] == b"PK":
                kind, text = "docx", None
            else:
                try:
                    text = payload.decode("utf-8")
                    kind = "txt"
                except UnicodeDecodeError:
                    kind, text = "binary", None
            yield (url, name, kind, len(payload), text, None)


class VfDocsDataSource(DataSource):
    """``spark.read.format("vf_docs").option("manifest", path)`` or
    ``.option("urls", json_list)``; register once per session with
    ``spark.dataSource.register(VfDocsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "vf_docs"

    def schema(self) -> str | StructType:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return VfDocsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(VfDocsDataSource)
