"""Salesforce / Google Drive connector contracts (sources/connectors.py)
against fake transports implementing the documented protocol subsets —
pagination cursors, composite retrieve positioning, Retry-After backoff,
Docs exports, per-row error accounting in the distributed fetch stage.
"""

from __future__ import annotations

import json
import urllib.parse

import pytest

from vectorflow_spark.sources.connectors import (
    ConnectorError,
    GDriveConnector,
    SalesforceConnector,
    _request,
    http_transport,
)

# ---------------------------------------------------------------------------
# fake transports (module-level so Spark can pickle them to executors)
# ---------------------------------------------------------------------------

SF_BASE = "https://org.example.my.salesforce.com"
N_SF_RECORDS = 7


def _sf_record(i: int) -> dict:
    return {
        "attributes": {"type": "Doc", "url": f"/sobjects/Doc/{i:03d}"},
        "Id": f"{i:03d}",
        "SystemModstamp": f"2026-08-{10 + i:02d}T00:00:00.000+0000",
    }


def fake_sf_transport(method: str, url: str, headers: dict, body):
    """3-page SOQL walk + composite retrieve + VersionData bodies."""
    assert method == "GET"
    assert headers["Authorization"].startswith("Bearer ")
    split = urllib.parse.urlsplit(url)
    path, params = split.path, dict(urllib.parse.parse_qsl(split.query))
    if path.endswith("/query"):  # page 1
        assert "SELECT" in params["q"]
        doc = {
            "totalSize": N_SF_RECORDS,
            "done": False,
            "records": [_sf_record(i) for i in range(3)],
            "nextRecordsUrl": "/services/data/v59.0/query/cursor-2",
        }
    elif path.endswith("/query/cursor-2"):
        doc = {
            "done": False,
            "records": [_sf_record(i) for i in range(3, 6)],
            "nextRecordsUrl": "/services/data/v59.0/query/cursor-3",
        }
    elif path.endswith("/query/cursor-3"):
        doc = {"done": True, "records": [_sf_record(6)]}
    elif "/composite/sobjects/Doc" in path:
        ids = params["ids"].split(",")
        assert len(ids) <= SalesforceConnector.COMPOSITE_BATCH
        assert params["fields"] == "Id,Name"
        doc = [
            None
            if i == "404"
            else {"attributes": {"type": "Doc"}, "Id": i, "Name": f"doc-{i}"}
            for i in ids
        ]
    elif "/sobjects/ContentVersion/" in path and path.endswith("/VersionData"):
        vid = path.split("/")[-2]
        if vid == "missing":
            return 404, {}, b"NOT_FOUND"
        return 200, {}, f"file-bytes-{vid}".encode()
    else:
        return 404, {}, b"no route: " + url.encode()
    return 200, {}, json.dumps(doc).encode()


class FlakyOnce:
    """Wraps a transport: first call answers 429 + Retry-After, then
    delegates. Picklable (plain attrs)."""

    def __init__(self, inner, retry_after: str = "0"):
        self.inner = inner
        self.retry_after = retry_after
        self.fired = False

    def __call__(self, method, url, headers, body):
        if not self.fired:
            self.fired = True
            return 429, {"Retry-After": self.retry_after}, b"rate limited"
        return self.inner(method, url, headers, body)


def always_503(method, url, headers, body):
    return 503, {}, b"down"


GD_FILES = [
    {"id": "f1", "name": "a.txt", "mimeType": "text/plain", "modifiedTime": "2026-08-01T00:00:00Z"},
    {"id": "f2", "name": "b.bin", "mimeType": "application/octet-stream", "modifiedTime": "2026-08-03T00:00:00Z"},
    {"id": "gdoc", "name": "c", "mimeType": "application/vnd.google-apps.document", "modifiedTime": "2026-08-02T00:00:00Z"},
    {"id": "gform", "name": "d", "mimeType": "application/vnd.google-apps.form", "modifiedTime": "2026-08-04T00:00:00Z"},
    {"id": "gone", "name": "e.txt", "mimeType": "text/plain", "modifiedTime": "2026-08-05T00:00:00Z"},
]


def fake_gdrive_transport(method: str, url: str, headers: dict, body):
    assert method == "GET"
    assert headers["Authorization"] == "Bearer gd-token"
    split = urllib.parse.urlsplit(url)
    path, params = split.path, dict(urllib.parse.parse_qsl(split.query))
    if path.endswith("/files"):
        assert params["pageSize"] == "2"
        assert "files(" in params["fields"]
        if "q" in params:
            assert "trashed = false" in params["q"]
        start = {"": 0, "page-2": 2, "page-3": 4}[params.get("pageToken", "")]
        doc = {"files": GD_FILES[start : start + 2]}
        if start + 2 < len(GD_FILES):
            doc["nextPageToken"] = f"page-{start // 2 + 2}"
        return 200, {}, json.dumps(doc).encode()
    if "/files/" in path and path.endswith("/export"):
        fid = path.split("/")[-2]
        assert params["mimeType"] == "text/plain"
        return 200, {}, f"exported-{fid}".encode()
    if "/files/" in path:
        fid = path.split("/")[-1]
        if fid == "gone":
            return 404, {}, b"NOT_FOUND"
        assert params["alt"] == "media"
        return 200, {}, f"media-{fid}".encode()
    return 404, {}, b"no route"


# ---------------------------------------------------------------------------
# retry plumbing
# ---------------------------------------------------------------------------


def test_retry_honors_retry_after_then_succeeds():
    slept: list[float] = []
    t = FlakyOnce(fake_sf_transport, retry_after="7")
    status, _h, payload = _request(
        t, "GET", f"{SF_BASE}/services/data/v59.0/query/cursor-3",
        {"Authorization": "Bearer x", "Accept": "application/json"},
        sleep=slept.append,
    )
    assert status == 200 and b"records" in payload
    assert slept == [7.0]


def test_retry_gives_up_after_max_and_surfaces_status():
    slept: list[float] = []
    status, _h, _p = _request(
        always_503, "GET", "https://x/api", {}, max_retries=3, sleep=slept.append
    )
    assert status == 503
    assert slept == [0.5, 1.0, 2.0]  # exponential, no Retry-After header


def test_http_transport_refuses_non_http():
    with pytest.raises(ValueError, match="http"):
        http_transport("GET", "ftp://host/file", {}, None)


# ---------------------------------------------------------------------------
# Salesforce
# ---------------------------------------------------------------------------


def _sf() -> SalesforceConnector:
    return SalesforceConnector(SF_BASE, "sf-token", transport=fake_sf_transport, sleep=lambda s: None)


def test_sf_query_walks_all_pages_in_order():
    recs = list(_sf().query("SELECT Id FROM Doc"))
    assert [r["Id"] for r in recs] == [f"{i:03d}" for i in range(N_SF_RECORDS)]


def test_sf_incremental_cursor_round():
    sf = _sf()
    soql = sf.incremental_soql("Doc", ["Id", "SystemModstamp"], None)
    assert soql == "SELECT Id, SystemModstamp FROM Doc ORDER BY SystemModstamp"
    recs = list(sf.query(soql))
    cursor = sf.next_cursor(recs)
    assert cursor == "2026-08-16T00:00:00.000+0000"
    bounded = sf.incremental_soql("Doc", ["Id"], cursor)
    assert f"WHERE SystemModstamp > {cursor}" in bounded
    # no new records -> cursor unchanged
    assert sf.next_cursor([], cursor) == cursor


def test_sf_read_records_distributed(spark):
    ids = [f"{i:03d}" for i in range(5)] + ["404"]
    out = _sf().read_records(spark, "Doc", ids, ["Id", "Name"], num_partitions=3)
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 6
    assert rows["404"].error == "not retrieved" and rows["404"].record is None
    rec = json.loads(rows["002"].record)
    assert rec == {"Id": "002", "Name": "doc-002"}  # attributes stripped


def test_sf_read_records_failed_batch_becomes_error_rows(spark):
    sf = SalesforceConnector(
        SF_BASE, "sf-token", transport=always_503, max_retries=1, sleep=lambda s: None
    )
    out = sf.read_records(spark, "Doc", ["001", "002"], ["Id"], num_partitions=1)
    rows = out.collect()
    assert len(rows) == 2 and all("ConnectorError" in r.error for r in rows)


def test_sf_read_files_bodies_and_missing(spark):
    out = _sf().read_files(spark, ["v1", "v2", "missing"], num_partitions=2)
    rows = {r.id: r for r in out.collect()}
    assert bytes(rows["v1"].content) == b"file-bytes-v1" and rows["v1"].n_bytes == 13
    assert rows["missing"].content is None and "404" in rows["missing"].error


def test_sf_composite_batching_respects_api_limit():
    calls: list[int] = []

    def counting(method, url, headers, body):
        if "/composite/" in url:
            q = dict(urllib.parse.parse_qsl(urllib.parse.urlsplit(url).query))
            calls.append(len(q["ids"].split(",")))
        return fake_sf_transport(method, url, headers, body)

    # drive the fetch closure directly (single partition, no Spark needed)
    import pandas as pd

    sf = SalesforceConnector(SF_BASE, "sf-token", transport=counting, sleep=lambda s: None)
    ids = [f"{i:03d}" for i in range(450)]

    # reuse the executor code path via mapInPandas's contract shape
    class _FakeSpark:
        pass

    # simplest: call composite endpoint sizing through read_records's logic
    # by invoking the generator manually
    captured = {}

    def capture_mapInPandas(fetch, schema):
        captured["frames"] = list(fetch([pd.DataFrame({"id": ids})]))
        return None

    class _DF:
        def repartition(self, n):
            return self

        mapInPandas = staticmethod(capture_mapInPandas)

    class _Spark:
        def createDataFrame(self, data, schema):
            return _DF()

    sf.read_records(_Spark(), "Doc", ids, ["Id", "Name"])
    assert calls == [200, 200, 50]
    (frame,) = captured["frames"]
    assert len(frame) == 450
    # id "404" (a real member of range(450)) is the fake's missing record
    errs = frame[frame["error"].notna()]
    assert list(errs["id"]) == ["404"] and list(errs["error"]) == ["not retrieved"]


# ---------------------------------------------------------------------------
# Google Drive
# ---------------------------------------------------------------------------


def _gd() -> GDriveConnector:
    return GDriveConnector(
        "gd-token", transport=fake_gdrive_transport, sleep=lambda s: None, page_size=2
    )


def test_gdrive_list_walks_page_tokens():
    files = list(_gd().list_files(q="trashed = false"))
    assert [f["id"] for f in files] == ["f1", "f2", "gdoc", "gform", "gone"]


def test_gdrive_incremental_query_and_cursor():
    gd = _gd()
    q = gd.incremental_query("folder9", "2026-08-02T00:00:00Z")
    assert q == (
        "trashed = false and 'folder9' in parents "
        "and modifiedTime > '2026-08-02T00:00:00Z'"
    )
    files = list(gd.list_files())
    assert gd.next_cursor(files) == "2026-08-05T00:00:00Z"
    assert gd.next_cursor([], "keep") == "keep"


def test_gdrive_read_files_media_export_and_errors(spark):
    files = list(_gd().list_files())
    out = _gd().read_files(spark, files, num_partitions=2)
    rows = {r.file_id: r for r in out.collect()}
    assert bytes(rows["f1"].content) == b"media-f1" and rows["f1"].kind == "media"
    assert bytes(rows["gdoc"].content) == b"exported-gdoc" and rows["gdoc"].kind == "export"
    assert rows["gform"].content is None and "no byte stream" in rows["gform"].error
    assert rows["gone"].content is None and "404" in rows["gone"].error
    assert rows["f2"].name == "b.bin" and rows["f2"].mime_type == "application/octet-stream"


def test_gdrive_listing_error_raises_driver_side():
    gd = GDriveConnector("gd-token", transport=always_503, max_retries=0, sleep=lambda s: None)
    with pytest.raises(ConnectorError, match="503"):
        list(gd.list_files())


def test_composite_response_length_mismatch_becomes_error_rows():
    """A truncated/short positional response may never silently drop
    ids — every requested id gets a record OR an error row."""

    def truncating(method, url, headers, body):
        if "/composite/" in url:
            q = dict(urllib.parse.parse_qsl(urllib.parse.urlsplit(url).query))
            ids = q["ids"].split(",")
            docs = [{"attributes": {}, "Id": i, "Name": f"n-{i}"} for i in ids[:-1]]
            return 200, {}, json.dumps(docs).encode()
        return fake_sf_transport(method, url, headers, body)

    sf = SalesforceConnector(SF_BASE, "t", transport=truncating, sleep=lambda s: None)
    rows = sf.retrieve_chunk("Doc", ["001", "002", "003"], ["Id", "Name"])
    assert [r[0] for r in rows] == ["001", "002", "003"]
    assert all(r[1] is None and "positional" in r[2] for r in rows)


def test_retrieve_chunk_rejects_oversized_chunk():
    sf = SalesforceConnector(SF_BASE, "t", transport=fake_sf_transport, sleep=lambda s: None)
    with pytest.raises(ValueError, match="at most"):
        sf.retrieve_chunk("Doc", [f"{i}" for i in range(201)], ["Id"])


def test_gdrive_fetch_file_shared_helper():
    gd = GDriveConnector("gd-token", transport=fake_gdrive_transport, sleep=lambda s: None)
    kind, payload = gd.fetch_file("f1", "text/plain")
    assert (kind, payload) == ("media", b"media-f1")
    kind, payload = gd.fetch_file("gdoc", "application/vnd.google-apps.document")
    assert (kind, payload) == ("export", b"exported-gdoc")
    with pytest.raises(ConnectorError, match="no byte stream"):
        gd.fetch_file("gform", "application/vnd.google-apps.form")
