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


class TestDocsPushdown:
    """pushFilters (Spark 4.1): url/source filters prune the manifest at
    PLANNING — pruned URLs are never fetched — and kind filters drop rows
    after the sniff. Exact semantics: the source claims these filters, so
    it must enforce them fully in every mode."""

    def test_url_prefix_prunes_fetches(self, registered, corpus):
        """Partition count proves the prune happened at planning (one
        kept URL -> one partition), and the absence of error rows proves
        the DEAD links were never even fetched."""
        from pyspark.sql import functions as F

        urls = _urls(corpus, ["a.txt"]) + [
            f"file://{corpus}/dead/{i}.txt" for i in range(6)
        ]
        df = (
            _read(registered)
            .option("urls", json.dumps(urls))
            .option("numPartitions", "8")
            .load()
            .filter(F.col("url").startswith(f"file://{corpus}/a"))
        )
        assert df.rdd.getNumPartitions() == 1
        rows = df.collect()
        assert [r["source"] for r in rows] == ["a.txt"]
        assert rows[0]["kind"] == "txt"

    def test_source_isin_and_url_equality(self, registered, corpus):
        from pyspark.sql import functions as F

        urls = _urls(corpus, ["a.txt", "b.txt", "fake.pdf", "blob.bin"])
        by_src = (
            _read(registered)
            .option("urls", json.dumps(urls))
            .load()
            .filter(F.col("source").isin("a.txt", "fake.pdf"))
        )
        assert {r["source"] for r in by_src.collect()} == {"a.txt", "fake.pdf"}
        by_url = (
            _read(registered)
            .option("urls", json.dumps(urls))
            .load()
            .filter(F.col("url") == urls[1])
        )
        assert by_url.rdd.getNumPartitions() == 1
        assert [r["source"] for r in by_url.collect()] == ["b.txt"]

    def test_kind_filter_drops_after_sniff(self, registered, corpus):
        from pyspark.sql import functions as F

        urls = _urls(corpus, ["a.txt", "b.txt", "fake.pdf", "fake.docx", "blob.bin"])
        df = _read(registered).option("urls", json.dumps(urls)).load()
        assert df.filter(F.col("kind") == "txt").count() == 2
        assert df.filter(F.col("kind").isin("pdf", "docx")).count() == 2
        # conjunction of two different equalities = empty, never a union
        both = df.filter((F.col("kind") == "txt") & (F.col("kind") == "pdf"))
        assert both.count() == 0

    def test_pruned_to_empty_is_empty_scan(self, registered, corpus):
        from pyspark.sql import functions as F

        urls = _urls(corpus, ["a.txt"])
        df = (
            _read(registered)
            .option("urls", json.dumps(urls))
            .load()
            .filter(F.col("url").startswith("file:///nowhere"))
        )
        assert df.count() == 0

    def test_pushed_results_match_unpushed(self, registered, corpus):
        """Ground truth: pushdown is pure work-avoidance — the same
        filters applied to the full collect give identical rows."""
        from pyspark.sql import functions as F

        urls = _urls(corpus, ["a.txt", "b.txt", "fake.pdf", "fake.docx", "blob.bin"])
        base = _read(registered).option("urls", json.dumps(urls))
        full = {
            (r["source"], r["kind"])
            for r in base.load().collect()
            if r["kind"] in ("txt", "binary") and r["source"].startswith(("a", "b"))
        }
        pushed = {
            (r["source"], r["kind"])
            for r in base.load()
            .filter(F.col("kind").isin("txt", "binary"))
            .filter(F.col("source").isin("a.txt", "b.txt", "blob.bin"))
            .collect()
        }
        assert pushed == full == {("a.txt", "txt"), ("b.txt", "txt"), ("blob.bin", "binary")}


class TestDocsObjectStoreIO:
    """The injectable io layer on the fetch path: object-store URL
    schemes route through sources/openers.py (mount:<root> is the
    stdlib-testable twin of the fsspec backend), while http/https/file
    keep the stdlib urllib contract. Scheme gate still applies."""

    def test_mount_backend_fetches_bucket_urls(self, registered, tmp_path):
        bucket = tmp_path / "bucket" / "docs"
        bucket.mkdir(parents=True)
        (bucket / "m1.txt").write_text("mounted one")
        (bucket / "m2.pdf").write_bytes(b"%PDF-1.7 payload")
        urls = ["s3://bucket/docs/m1.txt", "s3://bucket/docs/m2.pdf"]
        df = (
            registered.read.format("vf_docs")
            .option("urls", json.dumps(urls))
            .option("allowedSchemes", "s3")
            .option("io", f"mount:{tmp_path}")
            .load()
        )
        rows = {r["source"]: r for r in df.collect()}
        assert rows["m1.txt"]["kind"] == "txt" and rows["m1.txt"]["text"] == "mounted one"
        assert rows["m2.pdf"]["kind"] == "pdf"
        assert rows["m1.txt"]["url"] == "s3://bucket/docs/m1.txt"

    def test_object_store_scheme_needs_optin(self, registered, tmp_path):
        """s3:// without allowedSchemes opt-in -> error row, no fetch."""
        df = (
            registered.read.format("vf_docs")
            .option("urls", json.dumps(["s3://bucket/docs/m1.txt"]))
            .option("io", f"mount:{tmp_path}")
            .load()
        )
        [row] = df.collect()
        assert row["kind"] == "error" and "allowedSchemes" in row["error"]

    def test_manifest_on_object_store(self, registered, tmp_path):
        """The manifest file itself opens through the io layer."""
        bucket = tmp_path / "bkt"
        bucket.mkdir()
        (bucket / "doc.txt").write_text("from mounted manifest")
        (bucket / "manifest.txt").write_text("s3://bkt/doc.txt\n")
        df = (
            registered.read.format("vf_docs")
            .option("manifest", "s3://bkt/manifest.txt")
            .option("allowedSchemes", "s3")
            .option("io", f"mount:{tmp_path}")
            .load()
        )
        [row] = df.collect()
        assert row["text"] == "from mounted manifest" and row["kind"] == "txt"

    def test_mixed_scheme_manifest(self, registered, corpus, tmp_path):
        """file:// via urllib and s3:// via the opener in ONE scan; a
        dead mounted key stays a per-row error."""
        bucket = tmp_path / "b2"
        bucket.mkdir()
        (bucket / "ok.txt").write_text("mounted ok")
        urls = _urls(corpus, ["a.txt"]) + ["s3://b2/ok.txt", "s3://b2/gone.txt"]
        df = (
            registered.read.format("vf_docs")
            .option("urls", json.dumps(urls))
            .option("allowedSchemes", "file,s3")
            .option("io", f"mount:{tmp_path}")
            .load()
        )
        rows = {r["source"]: r for r in df.collect()}
        assert rows["a.txt"]["text"] == "plain text alpha"
        assert rows["ok.txt"]["text"] == "mounted ok"
        assert rows["gone.txt"]["kind"] == "error" and rows["gone.txt"]["error"]


class TestDocsManifestStreaming:
    """readStream.format("vf_docs").option("manifestDir", dir): each
    micro-batch fetches exactly the URLs of manifests that appeared
    since the last batch — exactly-once by checkpointed seen-list
    offsets, manifests immutable once dropped (write-temp + rename)."""

    def test_manifests_stream_incrementally(self, registered, corpus, tmp_path):
        mdir = tmp_path / "manifests"
        mdir.mkdir()

        def drop(name, urls):
            tmp = mdir / f".{name}.tmp"
            tmp.write_text("\n".join(urls) + "\n")
            tmp.rename(mdir / name)

        drop("m-0.txt", _urls(corpus, ["a.txt", "fake.pdf"]))
        batches = []

        def sink(df, _bid):
            batches.append({(r.source, r.kind) for r in df.collect()})

        q = (
            registered.readStream.format("vf_docs")
            .option("manifestDir", str(mdir))
            .option("allowedSchemes", "file")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            drop("m-1.txt", _urls(corpus, ["b.txt"]) + [f"file://{corpus}/dead.txt"])
            q.processAllAvailable()
            q.processAllAvailable()  # no new manifests -> no re-fetch
        finally:
            q.stop()
        seen = [b for b in batches if b]
        assert seen[0] == {("a.txt", "txt"), ("fake.pdf", "pdf")}
        assert {s for s in seen[1] if s[1] != "error"} == {("b.txt", "txt")}
        assert sum(1 for s in seen[1] if s[1] == "error") == 1  # dead link row
        assert len(seen) == 2  # exactly-once: nothing re-fetched

    def test_urls_per_task_fans_out(self, registered, corpus, tmp_path):
        mdir = tmp_path / "m2"
        mdir.mkdir()
        (mdir / "big.txt").write_text(
            "\n".join(_urls(corpus, ["a.txt", "b.txt", "fake.pdf", "blob.bin"]))
        )
        parts = []

        def sink(df, _bid):
            if df.count():
                parts.append(df.rdd.getNumPartitions())

        q = (
            registered.readStream.format("vf_docs")
            .option("manifestDir", str(mdir))
            .option("allowedSchemes", "file")
            .option("urlsPerTask", "1")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert parts and parts[0] == 4  # one URL per partition

    def test_stream_requires_manifest_dir(self, registered):
        from pyspark.errors.exceptions.captured import StreamingQueryException

        with pytest.raises(Exception, match="manifestDir"):
            (
                registered.readStream.format("vf_docs")
                .load()
                .writeStream.format("noop")
                .start()
                .processAllAvailable()
            )
