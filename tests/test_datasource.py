"""Custom Python Data Source (sources/datasource.py): bulk URL-manifest
ingest as spark.read.format("vf_docs").

Covers: manifest + inline-urls options, executor-side fetch via file://
URLs, MIME-sniff classification (%PDF / PK / utf-8 / binary), partition
fan-out, and the per-file error policy (dead link -> error row, scan
survives)."""

from __future__ import annotations

import json

import pytest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("vfdocs")
    (d / "a.txt").write_text("plain text alpha")
    (d / "b.txt").write_text("plain text beta")
    (d / "fake.pdf").write_bytes(b"%PDF-1.4 not really a pdf body")
    (d / "fake.docx").write_bytes(b"PK\x03\x04 zipish")
    (d / "blob.bin").write_bytes(bytes([0xFF, 0xFE, 0x01, 0x02, 0x99]))
    return d


@pytest.fixture(scope="module")
def registered(spark):
    from vectorflow_spark.sources.datasource import register

    register(spark)
    return spark


def _urls(corpus, names):
    return [f"file://{corpus}/{n}" for n in names]


def _read(registered):
    """file:// is opt-in (SSRF guard defaults to http,https)."""
    return registered.read.format("vf_docs").option("allowedSchemes", "http,https,file")


def test_manifest_fetch_and_sniff(registered, corpus, tmp_path):
    manifest = tmp_path / "manifest.txt"
    names = ["a.txt", "b.txt", "fake.pdf", "fake.docx", "blob.bin"]
    manifest.write_text("\n".join(_urls(corpus, names)))
    df = _read(registered).option("manifest", str(manifest)).load()
    rows = {r["source"]: r for r in df.collect()}
    assert set(rows) == set(names)
    assert rows["a.txt"]["kind"] == "txt" and rows["a.txt"]["text"] == "plain text alpha"
    assert rows["fake.pdf"]["kind"] == "pdf" and rows["fake.pdf"]["text"] is None
    assert rows["fake.docx"]["kind"] == "docx"
    assert rows["blob.bin"]["kind"] == "binary"
    assert all(r["error"] is None for r in rows.values())
    assert rows["b.txt"]["n_bytes"] == len("plain text beta")


def test_inline_urls_and_partition_fanout(registered, corpus):
    urls = _urls(corpus, ["a.txt", "b.txt", "fake.pdf", "fake.docx", "blob.bin"])
    df = (
        _read(registered)
        .option("urls", json.dumps(urls))
        .option("numPartitions", "3")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 5


def test_dead_link_yields_error_row_not_failure(registered, corpus):
    urls = _urls(corpus, ["a.txt"]) + [f"file://{corpus}/missing.txt"]
    df = _read(registered).option("urls", json.dumps(urls)).load()
    rows = {r["source"]: r for r in df.collect()}
    assert rows["a.txt"]["kind"] == "txt"
    err = rows["missing.txt"]
    assert err["kind"] == "error" and err["error"] and err["text"] is None


def test_composes_with_extract_dispatch(registered, corpus):
    """The sniffed kind drives the same downstream dispatch the binaryFile
    path uses: txt rows carry text, pdf/docx rows are routed to their
    extractors (import-gated here, so just verify the routing split)."""
    from pyspark.sql import functions as F

    urls = _urls(corpus, ["a.txt", "fake.pdf", "fake.docx"])
    df = _read(registered).option("urls", json.dumps(urls)).load()
    ready = df.filter(F.col("kind") == "txt").select("source", "text")
    needs_extract = df.filter(F.col("kind").isin("pdf", "docx"))
    assert ready.count() == 1
    assert needs_extract.count() == 2


def test_default_schemes_reject_file_urls(registered, corpus):
    """Without the explicit opt-in, a file:// manifest line yields an error
    row (never a local read on the executor) and the scan survives."""
    urls = _urls(corpus, ["a.txt"])
    df = registered.read.format("vf_docs").option("urls", json.dumps(urls)).load()
    [row] = df.collect()
    assert row["kind"] == "error" and "allowedSchemes" in row["error"]
    assert row["text"] is None and row["n_bytes"] == 0
