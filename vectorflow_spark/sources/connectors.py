"""Salesforce and Google Drive ingestion connectors (reference roadmap:
"Support for multi-file, directory data ingestion from sources such as
Salesforce, Google Drive" — /root/reference/README.md:290; the reference
never ships them, so this extends parity the same way writers.write_pgvector
does for the sink enum).

Shape: **the driver lists, the executors fetch.** Each connector splits
cleanly into

* a driver-side LISTING walk (SOQL ``nextRecordsUrl`` pagination /
  Drive ``files.list`` pageToken pagination) that materializes only ids
  and metadata — O(records) driver memory, never payload bytes; and
* an executor-side FETCH stage (``mapInPandas`` over the id list,
  repartitioned to ``num_partitions``) that pulls record bodies /
  file bytes in API-shaped batches (Salesforce composite retrieve =
  200 ids per call; Drive = one GET per file) and emits Arrow rows.

This mirrors how sources/datasource.py distributes presigned-URL
fetches, and is the same division Salesforce's own Bulk API 2.0 PK
chunking encodes: listing is cheap and sequential-by-protocol, payload
volume is the part that must scale out. At 100 TB the fetch stage is
embarrassingly parallel and the listing remains a metadata walk.

Failure policy mirrors the reference's per-file accounting (A4) and the
vf_docs source: a failed fetch yields a row with the message in
``error`` instead of killing the scan — a 1-in-a-million dead id must
not fail a long ingest. Transient HTTP statuses (429 incl. Retry-After,
5xx) retry with exponential backoff before being recorded as errors.

Everything network-shaped goes through an injectable ``transport``
callable ``(method, url, headers, body) -> (status, headers, bytes)``
— the seam the webhook validator (operators/filters.py) and the sink
writers established; the default is stdlib urllib. Auth is a static
bearer token or a zero-arg callable returning one (the refresh seam:
Salesforce session ids and Google OAuth tokens both expire mid-job, and
a callable is re-invoked per retry). Connectors are plain picklable
objects so the fetch methods ship to executors as-is.

Incremental sync: both connectors expose a watermark helper pair —
build a listing query bounded by the last cursor, and extract the next
cursor from the listed metadata (``SystemModstamp`` / ``modifiedTime``).
Nightly ingests list only the delta; the dedup family (incremental
MinHash index, uuid5 idempotent sinks) absorbs replays.

Offline-testable end to end: tests/test_connectors.py drives both
connectors through fake transports implementing the documented protocol
subsets (pagination, composite retrieve, Retry-After, exports).
"""

from __future__ import annotations

import json
import time
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator
from typing import Any

Transport = Callable[[str, str, dict, bytes | None], tuple[int, dict, bytes]]

_RETRYABLE = frozenset({429, 500, 502, 503, 504})


def http_transport(method: str, url: str, headers: dict, body: bytes | None) -> tuple[int, dict, bytes]:
    """Default stdlib transport. Only http(s) URLs; one call = one
    request, no redirects followed for non-GET (urllib default)."""
    if urllib.parse.urlsplit(url).scheme not in ("http", "https"):
        raise ValueError(f"transport only fetches http(s) URLs, got {url!r}")
    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req) as resp:  # noqa: S310 - scheme gated above
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:  # pragma: no cover - needs live server
        return e.code, dict(e.headers or {}), e.read() or b""


def _bearer(auth: str | Callable[[], str]) -> str:
    return auth() if callable(auth) else auth


def _request(
    transport: Transport,
    method: str,
    url: str,
    headers: dict,
    body: bytes | None = None,
    max_retries: int = 4,
    sleep: Callable[[float], None] = time.sleep,
) -> tuple[int, dict, bytes]:
    """Issue one request with exponential backoff on transient statuses.
    429 honors ``Retry-After`` (seconds form) when present and sane."""
    attempt = 0
    while True:
        status, resp_headers, payload = transport(method, url, headers, body)
        if status not in _RETRYABLE or attempt >= max_retries:
            return status, resp_headers, payload
        delay = 0.5 * (2**attempt)
        ra = {k.lower(): v for k, v in resp_headers.items()}.get("retry-after")
        if ra is not None:
            try:
                delay = min(float(ra), 120.0)
            except ValueError:
                pass
        sleep(delay)
        attempt += 1


class ConnectorError(RuntimeError):
    """Non-retryable API failure surfaced from a driver-side listing walk
    (executor-side fetches record errors as rows instead)."""


# ---------------------------------------------------------------------------
# Salesforce (REST API: query pagination + composite retrieve + file bodies)
# ---------------------------------------------------------------------------


class SalesforceConnector:
    """Salesforce REST ingestion.

    ``instance_url`` is the org base (``https://org.my.salesforce.com``),
    ``auth`` a bearer token or zero-arg refresher. Listing walks
    ``/services/data/{v}/query`` + ``nextRecordsUrl`` (the API's cursor
    contract — pages cannot be fetched out of order, so listing is
    driver-side by protocol); fetching uses the composite retrieve
    endpoint at 200 ids/call from executors."""

    COMPOSITE_BATCH = 200  # API maximum for /composite/sobjects

    def __init__(
        self,
        instance_url: str,
        auth: str | Callable[[], str],
        transport: Transport = http_transport,
        api_version: str = "v59.0",
        max_retries: int = 4,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.instance_url = instance_url.rstrip("/")
        self.auth = auth
        self.transport = transport
        self.api_version = api_version
        self.max_retries = max_retries
        self.sleep = sleep

    # -- plumbing ----------------------------------------------------------

    def _headers(self) -> dict:
        return {
            "Authorization": f"Bearer {_bearer(self.auth)}",
            "Accept": "application/json",
        }

    def _get_json(self, path_or_url: str) -> Any:
        url = (
            path_or_url
            if path_or_url.startswith("http")
            else f"{self.instance_url}{path_or_url}"
        )
        status, _h, payload = _request(
            self.transport, "GET", url, self._headers(),
            max_retries=self.max_retries, sleep=self.sleep,
        )
        if status != 200:
            raise ConnectorError(f"salesforce GET {url} -> {status}: {payload[:200]!r}")
        return json.loads(payload)

    # -- driver-side listing -----------------------------------------------

    def query(self, soql: str) -> Iterator[dict]:
        """Yield records for a SOQL query, walking every page. Driver
        memory stays one page at a time; callers keeping only ids hold
        O(ids)."""
        doc = self._get_json(
            f"/services/data/{self.api_version}/query?q={urllib.parse.quote(soql)}"
        )
        while True:
            for rec in doc.get("records", ()):
                yield rec
            if doc.get("done", True):
                return
            doc = self._get_json(doc["nextRecordsUrl"])

    def query_ids(self, soql: str) -> list[str]:
        """Listing reduced to the id column — the input of the
        distributed fetch stage."""
        return [r["Id"] for r in self.query(soql)]

    @staticmethod
    def incremental_soql(object_type: str, fields: list[str], cursor: str | None) -> str:
        """Delta listing bounded by the last sync watermark.
        ``SystemModstamp`` is Salesforce's replication-safe modified
        stamp (covers formula/rollup recalcs that skip LastModifiedDate);
        ordering by it makes the walk resumable."""
        base = f"SELECT {', '.join(fields)} FROM {object_type}"
        if cursor:
            base += f" WHERE SystemModstamp > {cursor}"
        return base + " ORDER BY SystemModstamp"

    @staticmethod
    def next_cursor(records: list[dict], prev: str | None = None) -> str | None:
        """The next watermark = max SystemModstamp seen (records arrive
        ordered, so the last one; falls back to scanning)."""
        stamps = [r["SystemModstamp"] for r in records if r.get("SystemModstamp")]
        if not stamps:
            return prev
        top = max(stamps)
        return max(top, prev) if prev else top

    # -- executor-side fetch -----------------------------------------------

    def retrieve_chunk(
        self, object_type: str, chunk: list[str], fields: list[str]
    ) -> list[tuple[str, str | None, str | None]]:
        """One composite-retrieve call (<= COMPOSITE_BATCH ids) ->
        ``[(id, record_json | None, error | None), ...]`` with EVERY
        input id accounted for: failed calls, positional nulls, AND a
        response array whose length disagrees with the request (gateway
        truncation / API drift) all become error rows — an id may never
        silently vanish (the per-file accounting contract). Shared by
        the batch DataFrame path and the vf_sync stream provider."""
        if len(chunk) > self.COMPOSITE_BATCH:
            raise ValueError(f"composite retrieve accepts at most {self.COMPOSITE_BATCH} ids")
        url = (
            f"{self.instance_url}/services/data/{self.api_version}"
            f"/composite/sobjects/{object_type}"
            f"?ids={','.join(chunk)}&fields={','.join(fields)}"
        )
        try:
            status, _h, payload = _request(
                self.transport, "GET", url, self._headers(),
                max_retries=self.max_retries, sleep=self.sleep,
            )
            if status != 200:
                raise ConnectorError(f"composite retrieve -> {status}")
            docs = json.loads(payload)
            if not isinstance(docs, list) or len(docs) != len(chunk):
                raise ConnectorError(
                    f"composite retrieve returned {len(docs) if isinstance(docs, list) else type(docs).__name__} "
                    f"entries for {len(chunk)} ids (positional contract violated)"
                )
        except Exception as e:
            return [(i, None, f"{type(e).__name__}: {e}") for i in chunk]
        out: list[tuple[str, str | None, str | None]] = []
        for i, doc in zip(chunk, docs):
            if doc is None:
                out.append((i, None, "not retrieved"))
            else:
                doc = {k: v for k, v in doc.items() if k != "attributes"}
                out.append((i, json.dumps(doc, sort_keys=True), None))
        return out

    def read_records(
        self,
        spark,
        object_type: str,
        ids: list[str],
        fields: list[str],
        num_partitions: int = 32,
    ):
        """ids (from a driver listing) -> DataFrame(id, record, error):
        executors call composite retrieve at 200 ids per request;
        ``record`` is the JSON object string (attributes stripped),
        a missing/failed id gets an ``error`` row."""
        import pandas as pd
        from pyspark.sql.types import StringType, StructField, StructType

        schema = StructType(
            [
                StructField("id", StringType()),
                StructField("record", StringType()),
                StructField("error", StringType()),
            ]
        )
        conn = self  # picklable; ships to executors

        def fetch(pdfs):
            for pdf in pdfs:
                batch_ids = [str(x) for x in pdf["id"]]
                rows = []
                for j in range(0, len(batch_ids), conn.COMPOSITE_BATCH):
                    rows.extend(
                        conn.retrieve_chunk(
                            object_type, batch_ids[j : j + conn.COMPOSITE_BATCH], fields
                        )
                    )
                yield pd.DataFrame(rows, columns=["id", "record", "error"])

        df = spark.createDataFrame([(i,) for i in ids], "id string")
        return df.repartition(min(num_partitions, max(1, len(ids)))).mapInPandas(fetch, schema)

    def read_files(self, spark, content_version_ids: list[str], num_partitions: int = 32):
        """ContentVersion binary bodies (the Salesforce file store) ->
        DataFrame(id, content, n_bytes, error); one VersionData GET per
        id, executor-side."""
        import pandas as pd
        from pyspark.sql.types import BinaryType, LongType, StringType, StructField, StructType

        schema = StructType(
            [
                StructField("id", StringType()),
                StructField("content", BinaryType()),
                StructField("n_bytes", LongType()),
                StructField("error", StringType()),
            ]
        )
        conn = self

        def fetch(pdfs):
            for pdf in pdfs:
                rows = []
                for vid in pdf["id"]:
                    vid = str(vid)
                    url = (
                        f"{conn.instance_url}/services/data/{conn.api_version}"
                        f"/sobjects/ContentVersion/{vid}/VersionData"
                    )
                    try:
                        status, _h, payload = _request(
                            conn.transport, "GET", url, conn._headers(),
                            max_retries=conn.max_retries, sleep=conn.sleep,
                        )
                        if status != 200:
                            raise ConnectorError(f"VersionData -> {status}")
                        rows.append((vid, payload, len(payload), None))
                    except Exception as e:
                        rows.append((vid, None, None, f"{type(e).__name__}: {e}"))
                yield pd.DataFrame(rows, columns=["id", "content", "n_bytes", "error"])

        df = spark.createDataFrame([(i,) for i in content_version_ids], "id string")
        return df.repartition(min(num_partitions, max(1, len(content_version_ids)))).mapInPandas(
            fetch, schema
        )


# ---------------------------------------------------------------------------
# Google Drive (v3: files.list pagination + media download / Docs export)
# ---------------------------------------------------------------------------

_GOOGLE_NATIVE_PREFIX = "application/vnd.google-apps."
# Docs-editor types export to a text form; anything else Google-native
# (forms, maps, shortcuts) has no byte stream and is recorded as an error.
_EXPORT_MIME = {
    "application/vnd.google-apps.document": "text/plain",
    "application/vnd.google-apps.spreadsheet": "text/csv",
    "application/vnd.google-apps.presentation": "text/plain",
}


class GDriveConnector:
    """Google Drive v3 ingestion. Listing walks ``files.list`` with
    pageToken (driver-side by protocol, metadata only); fetching
    downloads ``alt=media`` bytes — or the text export for Google-native
    editor files — from executors."""

    def __init__(
        self,
        auth: str | Callable[[], str],
        transport: Transport = http_transport,
        base_url: str = "https://www.googleapis.com/drive/v3",
        max_retries: int = 4,
        sleep: Callable[[float], None] = time.sleep,
        page_size: int = 1000,
    ):
        self.auth = auth
        self.transport = transport
        self.base_url = base_url.rstrip("/")
        self.max_retries = max_retries
        self.sleep = sleep
        self.page_size = page_size

    def _headers(self) -> dict:
        return {"Authorization": f"Bearer {_bearer(self.auth)}"}

    def _get(self, url: str) -> tuple[int, dict, bytes]:
        return _request(
            self.transport, "GET", url, self._headers(),
            max_retries=self.max_retries, sleep=self.sleep,
        )

    # -- driver-side listing -----------------------------------------------

    def list_files(
        self,
        q: str | None = None,
        fields: str = "id,name,mimeType,modifiedTime,size",
    ) -> Iterator[dict]:
        """Yield file metadata dicts across all pages."""
        token: str | None = None
        while True:
            params = {
                "pageSize": str(self.page_size),
                "fields": f"nextPageToken,files({fields})",
            }
            if q:
                params["q"] = q
            if token:
                params["pageToken"] = token
            status, _h, payload = self._get(
                f"{self.base_url}/files?{urllib.parse.urlencode(params)}"
            )
            if status != 200:
                raise ConnectorError(f"gdrive files.list -> {status}: {payload[:200]!r}")
            doc = json.loads(payload)
            yield from doc.get("files", ())
            token = doc.get("nextPageToken")
            if not token:
                return

    @staticmethod
    def incremental_query(folder_id: str | None, cursor: str | None) -> str:
        """Delta listing bounded by the modifiedTime watermark (RFC 3339,
        Drive's q syntax); scoped to a folder when given."""
        terms = ["trashed = false"]
        if folder_id:
            terms.append(f"'{folder_id}' in parents")
        if cursor:
            terms.append(f"modifiedTime > '{cursor}'")
        return " and ".join(terms)

    @staticmethod
    def next_cursor(files: list[dict], prev: str | None = None) -> str | None:
        stamps = [f["modifiedTime"] for f in files if f.get("modifiedTime")]
        if not stamps:
            return prev
        top = max(stamps)
        return max(top, prev) if prev else top

    # -- executor-side fetch -----------------------------------------------

    def fetch_file(self, file_id: str, mime_type: str) -> tuple[str, bytes]:
        """One file body: ``alt=media`` for regular files, the text
        export for Docs-editor natives -> (kind, payload). Raises
        ``ConnectorError`` on exportless native types and non-200s —
        callers turn that into an error row. Shared by the batch
        DataFrame path and the vf_sync stream provider."""
        if mime_type.startswith(_GOOGLE_NATIVE_PREFIX):
            export_as = _EXPORT_MIME.get(mime_type)
            if export_as is None:
                raise ConnectorError(f"google-native type {mime_type} has no byte stream/export")
            url = (
                f"{self.base_url}/files/{file_id}/export?"
                + urllib.parse.urlencode({"mimeType": export_as})
            )
            kind = "export"
        else:
            url = f"{self.base_url}/files/{file_id}?alt=media"
            kind = "media"
        status, _h, payload = self._get(url)
        if status != 200:
            raise ConnectorError(f"download -> {status}")
        return kind, payload

    def read_files(self, spark, files: list[dict], num_partitions: int = 32):
        """Listed metadata -> DataFrame(file_id, name, mime_type, kind,
        content, n_bytes, error). Regular files download ``alt=media``;
        Docs-editor natives export via their text form (kind='export');
        other Google-native types (no byte stream) become error rows."""
        import pandas as pd
        from pyspark.sql.types import BinaryType, LongType, StringType, StructField, StructType

        schema = StructType(
            [
                StructField("file_id", StringType()),
                StructField("name", StringType()),
                StructField("mime_type", StringType()),
                StructField("kind", StringType()),
                StructField("content", BinaryType()),
                StructField("n_bytes", LongType()),
                StructField("error", StringType()),
            ]
        )
        conn = self
        manifest = [
            (f["id"], f.get("name"), f.get("mimeType", "application/octet-stream"))
            for f in files
        ]

        def fetch(pdfs):
            for pdf in pdfs:
                rows = []
                for fid, name, mime in zip(pdf["file_id"], pdf["name"], pdf["mime_type"]):
                    fid, mime = str(fid), str(mime)
                    try:
                        kind, payload = conn.fetch_file(fid, mime)
                        rows.append((fid, name, mime, kind, payload, len(payload), None))
                    except Exception as e:
                        rows.append(
                            (fid, name, mime, None, None, None, f"{type(e).__name__}: {e}")
                        )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "file_id", "name", "mime_type", "kind", "content", "n_bytes", "error",
                    ],
                )

        df = spark.createDataFrame(manifest, "file_id string, name string, mime_type string")
        return df.repartition(min(num_partitions, max(1, len(manifest)))).mapInPandas(fetch, schema)
