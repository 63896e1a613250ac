"""WARC ingestion (sources/warcmini.py): the Common Crawl-shaped entry
point of a web-scale corpus pipeline. Pure-python framing roundtrips,
then the Spark scan: the vf_warc streaming DataSource -> record rows ->
HTML strip into the documents shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorflow_spark.sources.warcmini import (
    build_warc,
    iter_warc_records,
    parse_warc,
    read_warc,
)


class TestFraming:
    def test_roundtrip_gzip_and_plain(self):
        recs = [
            ("http://a.example/x", b"hello <b>world</b>", "text/html"),
            ("http://b.example/y", "unicode ✓ café".encode(), "text/plain"),
            ("http://c.example/empty", b"", "text/plain"),
        ]
        for compress in (True, False):
            parsed = parse_warc(build_warc(recs, compress=compress))
            assert parsed[0]["warc-type"] == "warcinfo"
            resp = [r for r in parsed if r["warc-type"] == "response"]
            assert [r["warc-target-uri"] for r in resp] == [u for u, _, _ in recs]
            assert [r["body"] for r in resp] == [b for _, b, _ in recs]

    def test_body_with_embedded_crlfcrlf_survives(self):
        """Content-Length framing, not delimiter scanning: a body that
        contains the header-terminator byte sequence must pass through."""
        tricky = b"part1\r\n\r\npart2"
        [rec] = [
            r
            for r in parse_warc(build_warc([("http://t/u", tricky, "text/plain")]))
            if r["warc-type"] == "response"
        ]
        assert rec["body"] == tricky

    def test_malformed_raises_loudly(self):
        with pytest.raises(ValueError, match="malformed WARC"):
            parse_warc(b"NOT A WARC FILE AT ALL")


def test_read_warc_scan_and_html_compose(spark, tmp_path):
    """Two .warc.gz segment files -> one row per record; response bodies
    strip to prose through the same HTML expression the S5 path uses —
    WARC in, documents out."""
    from vectorflow_spark.sources.readers import strip_html_expr

    seg1 = [
        ("http://site.a/page1", b"<html><body><p>alpha prose</p></body></html>", "text/html"),
        ("http://site.a/page2", b"<html><script>x=1</script><p>beta text</p></html>", "text/html"),
    ]
    seg2 = [("http://site.b/only", b"<p>gamma words</p>", "text/html")]
    (tmp_path / "seg1.warc.gz").write_bytes(build_warc(seg1))
    (tmp_path / "seg2.warc.gz").write_bytes(build_warc(seg2))

    rows = read_warc(spark, str(tmp_path))
    resp = rows.filter(F.col("warc_type") == "response")
    docs = resp.select(
        "url",
        strip_html_expr(
            F.expr("CASE WHEN is_valid_utf8(body) THEN decode(body, 'UTF-8') END")
        ).alias("text"),
    )
    got = {r.url: r.text for r in docs.collect()}
    assert got == {
        "http://site.a/page1": "alpha prose",
        "http://site.a/page2": "beta text",
        "http://site.b/only": "gamma words",
    }
    # the scan parallel unit is the file: record rows carry their segment
    per_file = {
        r.warc_file: r.n for r in rows.filter(F.col("warc_type") == "response")
        .groupBy("warc_file").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_file == {"seg1.warc.gz": 2, "seg2.warc.gz": 1}


class TestStreamingScan:
    """The vf_warc DataSource contract: records stream — peak memory is
    record-bounded, not file-bounded."""

    def test_first_record_yields_before_file_is_consumed(self, tmp_path):
        """On a many-record file the iterator must hand back record 1
        having read ~1 record's worth of bytes, not the whole file."""

        class CountingFile:
            def __init__(self, f):
                self._f = f
                self.bytes_read = 0

            def read(self, n=-1):
                data = self._f.read(n)
                self.bytes_read += len(data)
                return data

        body = b"x" * 100_000
        recs = [(f"http://h/{i}", body, "text/plain") for i in range(20)]
        blob = build_warc(recs, compress=False)
        p = tmp_path / "big.warc"
        p.write_bytes(blob)
        with open(p, "rb") as f:
            cf = CountingFile(f)
            it = iter_warc_records(cf, chunk_size=1 << 16)
            next(it)  # warcinfo
            next(it)  # first response
            # consumed ~2 records + one chunk, nowhere near the 2 MB file
            assert cf.bytes_read < 2 * (100_000 + 1024) + (1 << 16)
            assert len(blob) > 1_900_000
            rest = list(it)
            assert len(rest) == 19

    def test_max_buffer_is_record_bounded(self, tmp_path):
        """Track the parser's high-water buffer via read-call accounting:
        between yields it may hold at most one record + one chunk."""
        import vectorflow_spark.sources.warcmini as wm

        body = b"y" * 50_000
        recs = [(f"http://h/{i}", body, "text/plain") for i in range(10)]
        p = tmp_path / "seg.warc"
        p.write_bytes(build_warc(recs, compress=False))

        high_water = 0
        with open(p, "rb") as f:
            outstanding = 0  # bytes read but not yet yielded as payload

            class Meter:
                def read(self, n=-1):
                    nonlocal outstanding, high_water
                    data = f.read(n)
                    outstanding += len(data)
                    high_water = max(high_water, outstanding)
                    return data

            for rec in wm.iter_warc_records(Meter(), chunk_size=1 << 14):
                outstanding = 0  # record handed off; buffer credit resets
        record_bound = 50_000 + 1024 + (1 << 14)
        assert high_water <= 2 * record_bound  # ~1 record + skew, << file size

    def test_gzip_members_stream(self, tmp_path):
        """.warc.gz: per-member gzip must also stream through iter_warc_file."""
        from vectorflow_spark.sources.warcmini import iter_warc_file

        recs = [(f"http://h/{i}", f"body {i}".encode(), "text/plain") for i in range(5)]
        p = tmp_path / "seg.warc.gz"
        p.write_bytes(build_warc(recs, compress=True))
        got = [r for r in iter_warc_file(str(p)) if r["warc-type"] == "response"]
        assert [r["body"] for r in got] == [f"body {i}".encode() for i in range(5)]

    def test_datasource_partitions_one_per_file(self, spark, tmp_path):
        for i in range(3):
            (tmp_path / f"s{i}.warc.gz").write_bytes(
                build_warc([(f"http://h/{i}", b"hi", "text/plain")])
            )
        df = read_warc(spark, str(tmp_path))
        assert df.rdd.getNumPartitions() == 3
        assert df.filter(F.col("warc_type") == "response").count() == 3

    def test_glob_filter(self, spark, tmp_path):
        (tmp_path / "a.warc.gz").write_bytes(build_warc([("http://h/a", b"1", "text/plain")]))
        (tmp_path / "b.other").write_bytes(b"not a warc")
        df = read_warc(spark, str(tmp_path), glob="*.warc.gz")
        assert df.filter(F.col("warc_type") == "response").count() == 1


def test_object_store_paths_dispatch_and_refuse_correctly(spark, tmp_path):
    """read_warc dispatches on scheme: s3a:// routes to the binaryFile
    fallback (whole-file rows, every Hadoop FS), file:// works through
    vf_warc, and DIRECT vf_warc format usage on an object-store path
    still refuses loudly naming the fallback."""
    from vectorflow_spark.sources import warcsource
    from vectorflow_spark.sources.warcmini import read_warc_binaryfile

    # s3a path must dispatch to the binaryFile fallback (this sandbox has
    # no S3 filesystem jars, so assert the routing, not the S3 plan)
    import vectorflow_spark.sources.warcmini as wm

    orig = wm.read_warc_binaryfile
    calls = []
    wm.read_warc_binaryfile = lambda s, p, glob=None: calls.append(p) or "SENTINEL"
    try:
        assert read_warc(spark, "s3a://bucket/crawl/") == "SENTINEL"
        assert calls == ["s3a://bucket/crawl/"]
    finally:
        wm.read_warc_binaryfile = orig

    # direct format usage keeps the loud refusal
    warcsource.register(spark)
    strict = spark.read.format("vf_warc").load("s3a://bucket/crawl/")
    with pytest.raises(Exception, match="read_warc_binaryfile"):
        strict.collect()

    (tmp_path / "s.warc.gz").write_bytes(build_warc([("http://h/x", b"hello", "text/plain")]))
    a = read_warc(spark, str(tmp_path)).filter(F.col("warc_type") == "response").collect()
    b = read_warc_binaryfile(spark, str(tmp_path)).filter(
        F.col("warc_type") == "response"
    ).collect()
    assert [(r.url, bytes(r.body)) for r in a] == [(r.url, bytes(r.body)) for r in b]
    # file:// URI form lists the same directory through vf_warc
    c = read_warc(spark, f"file://{tmp_path}").filter(F.col("warc_type") == "response").collect()
    assert [(r.url, bytes(r.body)) for r in c] == [(r.url, bytes(r.body)) for r in a]


def test_build_warc_record_types_wet_wat(tmp_path):
    """record_type='conversion' (WET) and 'metadata' (WAT) store the
    body VERBATIM with the given mime — no HTTP envelope — and roundtrip
    through the production parser; the default stays the HTTP-wrapped
    response shape."""
    wat_body = b'{"Envelope": {"Links": [1, 2]}}'
    blob = build_warc(
        [("http://h/a", wat_body, "application/json")], record_type="metadata"
    )
    recs = parse_warc(blob)
    [rec] = [r for r in recs if r["warc-type"] == "metadata"]
    assert rec["payload"] == wat_body  # verbatim: no HTTP status line
    assert rec["content-type"] == "application/json"
    assert "body" not in rec  # body-splitting is the application/http path
    wet = build_warc([("http://h/a", b"plain text", "text/plain")], record_type="conversion")
    [rec] = [r for r in parse_warc(wet) if r["warc-type"] == "conversion"]
    assert rec["payload"] == b"plain text"


class TestObjectStoreOpeners:
    """The injectable IO layer (warcsource._resolve_io): object-store
    paths stream per-record through vf_warc instead of refusing. The
    mount backend is stdlib-only, so it doubles as the deterministic
    fake object store for proving the opener contract end to end."""

    def _bucket(self, tmp_path, n=2):
        d = tmp_path / "bucket" / "crawl"
        d.mkdir(parents=True)
        for i in range(n):
            (d / f"seg-{i}.warc.gz").write_bytes(
                build_warc([(f"http://h/{i}/{j}", f"body {i}-{j}".encode(), "text/plain") for j in range(3)])
            )
        (d / ".hidden.warc.gz").write_bytes(b"junk")  # excluded by listing
        return d

    def test_mount_opener_lists_and_streams_in_process(self, tmp_path):
        """partitions()/read() called directly (no Spark): s3:// paths
        list through the mount root, keep their object-store form, and
        records stream."""
        from vectorflow_spark.sources.warcsource import VfWarcReader

        self._bucket(tmp_path)
        r = VfWarcReader({"path": "s3://bucket/crawl", "io": f"mount:{tmp_path}"})
        parts = r.partitions()
        assert [p.path for p in parts] == [
            "s3://bucket/crawl/seg-0.warc.gz",
            "s3://bucket/crawl/seg-1.warc.gz",
        ]
        # _rows: the raw record generator (read() wraps it in Arrow batches)
        rows = [row for p in parts for row in r._rows(p)]
        resp = [row for row in rows if row[2] == "response"]
        assert len(resp) == 6
        assert resp[0][0] == "seg-0.warc.gz"  # warc_file = basename
        assert resp[0][5] == b"body 0-0"

    def test_mount_opener_end_to_end_spark(self, spark, tmp_path):
        """The cross-process proof: the io option string survives
        pickling to executors, which resolve their own _MountFS."""
        from vectorflow_spark.sources import warcsource

        self._bucket(tmp_path)
        warcsource.register(spark)
        df = (
            spark.read.format("vf_warc")
            .option("io", f"mount:{tmp_path}")
            .load("s3://bucket/crawl")
        )
        assert df.rdd.getNumPartitions() == 2
        got = sorted(
            (r.url, bytes(r.body).decode())
            for r in df.filter(F.col("warc_type") == "response").collect()
        )
        assert got == sorted(
            (f"http://h/{i}/{j}", f"body {i}-{j}") for i in range(2) for j in range(3)
        )

    def test_read_warc_routes_explicit_io_through_vf_warc(self, spark, tmp_path):
        """read_warc with io=mount must use the streaming source, not
        the binaryFile fallback, for an object-store path."""
        import vectorflow_spark.sources.warcmini as wm

        self._bucket(tmp_path)

        def boom(*a, **k):  # the fallback must NOT be taken
            raise AssertionError("binaryFile fallback taken despite explicit io")

        orig = wm.read_warc_binaryfile
        wm.read_warc_binaryfile = boom
        try:
            df = read_warc(spark, "s3://bucket/crawl", io=f"mount:{tmp_path}")
            assert df.filter(F.col("warc_type") == "response").count() == 6
        finally:
            wm.read_warc_binaryfile = orig

    def test_opener_streaming_is_record_bounded(self, tmp_path):
        """The peak-row-size contract holds THROUGH the opener layer:
        read() over a metered custom fs holds at most ~one record + one
        chunk between yields, never the file."""
        from vectorflow_spark.sources.warcsource import VfWarcReader, _WarcFilePartition

        body = b"z" * 50_000
        blob = build_warc(
            [(f"http://h/{i}", body, "text/plain") for i in range(20)], compress=False
        )
        p = tmp_path / "seg.warc"
        p.write_bytes(blob)
        high_water = 0
        outstanding = 0

        class MeterFS:
            def list_files(self, path, glob):
                return [path]

            def open(self, path):
                f = open(p, "rb")

                class Meter:
                    def read(self, n=-1):
                        nonlocal outstanding, high_water
                        data = f.read(n)
                        outstanding += len(data)
                        high_water = max(high_water, outstanding)
                        return data

                    def seek(self, pos):
                        nonlocal outstanding
                        f.seek(pos)
                        outstanding = 0

                    def close(self):
                        f.close()

                return Meter()

        r = VfWarcReader({"path": "s3://b/seg.warc", "io": "mount:/nonexistent"})
        r._fs_cache = MeterFS()  # inject: the contract is the opener PROTOCOL
        # _rows is where the record-bounded contract lives; read() adds a
        # BOUNDED (16 MB / 256-row) Arrow batch buffer on top by design
        for _ in r._rows(_WarcFilePartition("s3://b/seg.warc")):
            outstanding = 0  # record handed off; buffer credit resets
        record_bound = 50_000 + 1024 + (1 << 16)
        assert high_water <= 2 * record_bound
        assert len(blob) > 5 * record_bound

    def test_auto_without_fsspec_refuses_with_guidance(self):
        try:
            import fsspec  # noqa: F401

            pytest.skip("fsspec installed; the refusal path is unreachable")
        except ImportError:
            pass
        from vectorflow_spark.sources.warcsource import VfWarcReader

        r = VfWarcReader({"path": "s3://bucket/crawl"})
        with pytest.raises(ValueError) as ei:
            r.partitions()
        msg = str(ei.value)
        assert "fsspec" in msg and "mount:" in msg and "read_warc_binaryfile" in msg

    def test_fsspec_memory_opener(self, tmp_path):
        """Runs wherever fsspec IS installed (skips here): the memory://
        filesystem proves list+stream through the fsspec backend."""
        fsspec = pytest.importorskip("fsspec")
        from vectorflow_spark.sources.warcsource import VfWarcReader

        fs = fsspec.filesystem("memory")
        fs.pipe("/crawl/seg-0.warc.gz", build_warc([("http://h/m", b"mem body", "text/plain")]))
        r = VfWarcReader({"path": "memory://crawl", "io": "fsspec"})
        parts = r.partitions()
        assert len(parts) == 1
        rows = [row for row in r._rows(parts[0]) if row[2] == "response"]
        assert rows[0][1] == "http://h/m" and rows[0][5] == b"mem body"

    def test_mount_glob_and_corrupt_error_row(self, spark, tmp_path):
        """glob filtering and the onCorrupt=row contract both hold
        through the mount opener, end to end."""
        from vectorflow_spark.sources import warcsource

        d = self._bucket(tmp_path, n=1)
        (d / "bad.warc.gz").write_bytes(b"\x1f\x8b garbage not gzip really")
        (d / "notes.txt").write_bytes(b"not a warc")
        warcsource.register(spark)
        df = (
            spark.read.format("vf_warc")
            .option("io", f"mount:{tmp_path}")
            .option("glob", "*.warc.gz")
            .load("s3://bucket/crawl")
        )
        rows = df.collect()
        by_type = {}
        for r in rows:
            by_type.setdefault(r.warc_type, []).append(r)
        assert len(by_type["response"]) == 3  # seg-0 only; notes.txt globbed out
        assert len(by_type["error"]) == 1
        assert by_type["error"][0].warc_file == "bad.warc.gz"


class TestScanPushdown:
    """pushFilters: warc_file filters prune whole segment partitions;
    warc_type filters drop records inside the parser. Exact semantics —
    the source claims the filters, so it must enforce them fully."""

    def _dir(self, tmp_path, n=4):
        for i in range(n):
            (tmp_path / f"seg-{i}.warc.gz").write_bytes(
                build_warc([(f"http://h/{i}", f"b{i}".encode(), "text/plain")])
            )
        return str(tmp_path)

    def test_file_equality_prunes_partitions(self, spark, tmp_path):
        from vectorflow_spark.sources import warcsource

        d = self._dir(tmp_path)
        warcsource.register(spark)
        df = (
            spark.read.format("vf_warc").load(d)
            .filter(F.col("warc_file") == "seg-2.warc.gz")
        )
        assert df.rdd.getNumPartitions() == 1  # 3 of 4 segments never scheduled
        rows = df.collect()
        assert {r.warc_file for r in rows} == {"seg-2.warc.gz"}

    def test_file_isin_and_prefix(self, spark, tmp_path):
        from vectorflow_spark.sources import warcsource

        d = self._dir(tmp_path)
        warcsource.register(spark)
        df = (
            spark.read.format("vf_warc").load(d)
            .filter(F.col("warc_file").isin("seg-0.warc.gz", "seg-3.warc.gz"))
        )
        assert df.rdd.getNumPartitions() == 2
        assert {r.warc_file for r in df.collect()} == {"seg-0.warc.gz", "seg-3.warc.gz"}
        pre = (
            spark.read.format("vf_warc").load(d)
            .filter(F.col("warc_file").startswith("seg-1"))
        )
        assert pre.rdd.getNumPartitions() == 1

    def test_pruned_to_empty_is_empty_not_error(self, spark, tmp_path):
        from vectorflow_spark.sources import warcsource

        d = self._dir(tmp_path)
        warcsource.register(spark)
        df = spark.read.format("vf_warc").load(d).filter(F.col("warc_file") == "nope.gz")
        assert df.count() == 0
        # but a genuinely empty directory still errors loudly
        empty = tmp_path / "void"
        empty.mkdir()
        with pytest.raises(Exception, match="no WARC files"):
            spark.read.format("vf_warc").load(str(empty)).collect()

    def test_type_filter_drops_records_and_conjunction_intersects(self, spark, tmp_path):
        from vectorflow_spark.sources import warcsource

        d = self._dir(tmp_path, n=2)
        warcsource.register(spark)
        base = spark.read.format("vf_warc").load(d)
        assert base.filter(F.col("warc_type") == "response").count() == 2
        assert base.filter(F.col("warc_type").isin("warcinfo", "response")).count() == 4
        # conjunction of two different equalities = empty, never a union
        both = base.filter(
            (F.col("warc_type") == "response") & (F.col("warc_type") == "warcinfo")
        )
        assert both.count() == 0

    def test_pushed_results_match_unpushed(self, spark, tmp_path):
        """Ground truth: pushdown is pure work-avoidance — the same
        filters WITHOUT pushFilters (collect-then-filter in Spark) give
        identical rows."""
        d = self._dir(tmp_path)
        rows_pushed = sorted(
            (r.warc_file, r.warc_type, r.url)
            for r in read_warc(spark, d)
            .filter(F.col("warc_type") == "response")
            .filter(F.col("warc_file").startswith("seg-"))
            .collect()
        )
        all_rows = read_warc(spark, d).collect()  # no filter: nothing pushed
        rows_manual = sorted(
            (r.warc_file, r.warc_type, r.url)
            for r in all_rows
            if r.warc_type == "response" and r.warc_file.startswith("seg-")
        )
        assert rows_pushed == rows_manual and len(rows_pushed) == 4


class TestCdxIndexedScan:
    """The CDX random-access path: write_warc_corpus(index=True) emits
    per-record (offset, length) sidecars; each .warc.gz record is its
    own gzip member, so record-range partitions seek+decompress
    independently — segment size stops bounding parallelism (Common
    Crawl's own CDX pattern)."""

    def _corpus(self, spark, tmp_path, n=120, index=True, compress=True):
        from vectorflow_spark.sources.warcmini import write_warc_corpus

        docs = spark.range(0, n).select(
            F.concat(F.lit("http://h/"), F.col("id")).alias("url"),
            F.concat(F.lit("body "), F.col("id")).alias("text"),
        )
        write_warc_corpus(docs, str(tmp_path), n_files=2, index=index, compress=compress).count()

    def test_range_scan_matches_streamed(self, spark, tmp_path):
        self._corpus(spark, tmp_path)
        idx = read_warc(spark, str(tmp_path), records_per_task=20)
        assert idx.rdd.getNumPartitions() > 2
        st = read_warc(spark, str(tmp_path), index="never")
        assert st.rdd.getNumPartitions() == 2
        a = sorted((r.warc_file, r.warc_type, r.url, bytes(r.body or b"")) for r in idx.collect())
        b = sorted((r.warc_file, r.warc_type, r.url, bytes(r.body or b"")) for r in st.collect())
        assert a == b and len(a) == 122  # 120 responses + 2 warcinfo

    def test_uncompressed_segments_also_range_read(self, spark, tmp_path):
        self._corpus(spark, tmp_path, n=40, compress=False)
        idx = read_warc(spark, str(tmp_path), records_per_task=10)
        assert idx.filter(F.col("warc_type") == "response").count() == 40

    def test_index_require_errors_without_sidecar(self, spark, tmp_path):
        self._corpus(spark, tmp_path, n=10, index=False)
        with pytest.raises(Exception, match="CDX sidecar"):
            read_warc(spark, str(tmp_path), index="require").collect()

    def test_corrupt_record_isolates_not_whole_segment(self, spark, tmp_path):
        """Range mode's finer blast radius: zapping ONE record's bytes
        yields one error row while every other record still decodes —
        the streamed walk would lose the file's tail."""
        import json
        import os

        self._corpus(spark, tmp_path, n=30)
        seg = os.path.join(str(tmp_path), "segment-00000.warc.gz")
        side = json.load(open(os.path.join(str(tmp_path), "_segment-00000.warc.gz.cdx.json")))
        victim = side["records"][3]
        blob = bytearray(open(seg, "rb").read())
        for i in range(victim["offset"] + 4, victim["offset"] + victim["length"]):
            blob[i] ^= 0x5A
        open(seg, "wb").write(bytes(blob))
        rows = read_warc(spark, str(tmp_path), records_per_task=1000).collect()
        errs = [r for r in rows if r.warc_type == "error"]
        ok = [r for r in rows if r.warc_type == "response"]
        assert len(errs) == 1 and errs[0].warc_file == "segment-00000.warc.gz"
        assert len(ok) == 29  # every OTHER record in the zapped segment survives

    def test_url_pushdown_wayback_lookup(self, spark, tmp_path):
        """URL filters prune at the INDEX: a prefix lookup plans only
        the matching record ranges (the wayback-style access), and the
        rows equal the manually filtered full scan — in streamed mode
        too (post-parse enforcement, since the filter was accepted)."""
        self._corpus(spark, tmp_path, n=120)
        base = read_warc(spark, str(tmp_path), records_per_task=10)
        one = base.filter(F.col("url") == "http://h/17")
        rows = one.collect()
        assert [(r.url, bytes(r.body)) for r in rows] == [("http://h/17", b"body 17")]
        # the equality lookup planned a single record-range partition
        assert one.rdd.getNumPartitions() <= 2
        pre = read_warc(spark, str(tmp_path)).filter(F.col("url").startswith("http://h/1"))
        got = sorted(r.url for r in pre.collect())
        exp = sorted(
            f"http://h/{i}" for i in range(120) if str(i).startswith("1")
        )
        assert got == exp
        # streamed mode (no index): same rows via post-parse enforcement
        st = read_warc(spark, str(tmp_path), index="never").filter(
            F.col("url").startswith("http://h/1")
        )
        assert sorted(r.url for r in st.collect()) == exp

    def test_url_pruned_to_empty_is_empty_not_error(self, spark, tmp_path):
        """A wayback lookup for a URL absent from EVERY CDX-indexed
        segment prunes all ranges; partitions() must hand back the
        empty-scan sentinel (PySpark turns a bare empty list into
        read(None), which used to crash with AttributeError)."""
        self._corpus(spark, tmp_path, n=20)
        gone = read_warc(spark, str(tmp_path), records_per_task=10).filter(
            F.col("url") == "http://h/not-in-archive"
        )
        assert gone.count() == 0

    def test_consolidated_index_plans_without_sidecars(self, spark, tmp_path):
        """The crawl-scale wayback path: consolidate_cdx folds every
        per-segment sidecar into ONE parquet URL index; URL-pushdown
        planning then reads only the index — proven by DELETING all the
        per-segment sidecars before the lookup (planning cannot have
        touched them), while the unfiltered scan still streams segments
        and never lists the index dataset as a segment."""
        import os

        from vectorflow_spark.sources.warcmini import consolidate_cdx

        self._corpus(spark, tmp_path, n=120)
        n = consolidate_cdx(spark, str(tmp_path))
        assert n == 120  # responses only: warcinfo rows have no url
        for side in list(tmp_path.glob("_*.cdx.json")):
            os.remove(side)
        one = read_warc(spark, str(tmp_path), records_per_task=10).filter(
            F.col("url") == "http://h/17"
        )
        rows = one.collect()
        assert [(r.url, bytes(r.body)) for r in rows] == [("http://h/17", b"body 17")]
        assert one.rdd.getNumPartitions() <= 2
        pre = read_warc(spark, str(tmp_path)).filter(F.col("url").startswith("http://h/1"))
        exp = sorted(f"http://h/{i}" for i in range(120) if str(i).startswith("1"))
        assert sorted(r.url for r in pre.collect()) == exp
        # absent-url lookup through the index: empty scan, not a crash
        assert read_warc(spark, str(tmp_path)).filter(
            F.col("url") == "http://h/nope"
        ).count() == 0
        # unfiltered scan: segments stream whole (sidecars gone), and the
        # _url_index parquet files are never mistaken for segments
        full = read_warc(spark, str(tmp_path))
        assert full.filter(F.col("warc_type") == "response").count() == 120
        assert full.filter(F.col("warc_type") == "error").count() == 0

    def test_index_unions_segments_appended_after_consolidation(self, spark, tmp_path):
        """r6 ADVICE: a consolidated _url_index must not hide segments
        appended AFTER consolidate_cdx ran. The index's _segments.json
        manifest names the covered segments; url-constrained planning
        unions index ranges with per-segment sidecars of NEWER segments
        (one sidecar read per appended segment, never per covered one)."""
        import os

        from vectorflow_spark.sources import warcsource
        from vectorflow_spark.sources.warcmini import consolidate_cdx

        self._corpus(spark, tmp_path, n=40)
        consolidate_cdx(spark, str(tmp_path))
        assert (tmp_path / "_url_index" / "_segments.json").exists()
        for side in list(tmp_path.glob("_*.cdx.json")):
            os.remove(side)
        # append a NEW segment (own sidecar) after consolidation
        warcsource.register(spark)
        spark.createDataFrame(
            [("seg-new.warc.gz", "http://h/900", b"body 900"),
             ("seg-new.warc.gz", "http://h/901", b"body 901")],
            "segment string, url string, body binary",
        ).repartition(1, "segment").write.format("vf_warc").option(
            "index", "true"
        ).mode("append").save(str(tmp_path))

        # new segment's record is visible through a url-constrained scan
        got = read_warc(spark, str(tmp_path), records_per_task=10).filter(
            F.col("url") == "http://h/900"
        ).collect()
        assert [(r.url, bytes(r.body)) for r in got] == [("http://h/900", b"body 900")]
        # old records still plan from the index
        old = read_warc(spark, str(tmp_path), records_per_task=10).filter(
            F.col("url") == "http://h/17"
        ).collect()
        assert [(r.url, bytes(r.body)) for r in old] == [("http://h/17", b"body 17")]
        # prefix scans union both sides
        pre = read_warc(spark, str(tmp_path)).filter(F.col("url").startswith("http://h/9"))
        exp = sorted(["http://h/9", "http://h/900", "http://h/901"])
        assert sorted(r.url for r in pre.collect()) == exp

    def test_cdx_through_mount_opener(self, spark, tmp_path):
        d = tmp_path / "bucket" / "crawl"
        d.mkdir(parents=True)
        self._corpus(spark, d, n=30)
        rows = read_warc(
            spark, "s3://bucket/crawl", io=f"mount:{tmp_path}", records_per_task=10
        )
        assert rows.rdd.getNumPartitions() >= 3
        assert rows.filter(F.col("warc_type") == "response").count() == 30


def test_wet_conversion_records_pass_through(spark, tmp_path):
    """Common Crawl WET files are WARC whose records are
    WARC-Type: conversion with text/plain payloads (no HTTP envelope).
    The parser must hand the payload through as the body — the WET path
    needs no HTML strip and is the cheapest text-corpus entry."""
    from vectorflow_spark.sources.warcmini import CRLF

    import gzip

    def wet_record(url: str, text: bytes) -> bytes:
        headers = [
            b"WARC/1.0",
            b"WARC-Type: conversion",
            f"WARC-Target-URI: {url}".encode(),
            b"Content-Type: text/plain",
            f"Content-Length: {len(text)}".encode(),
        ]
        return gzip.compress(CRLF.join(headers) + CRLF + CRLF + text + CRLF + CRLF, mtime=0)

    blob = wet_record("http://h/a", b"extracted plain text a") + wet_record(
        "http://h/b", b"text b"
    )
    (tmp_path / "seg.warc.wet.gz").write_bytes(blob)
    rows = read_warc(spark, str(tmp_path)).filter(F.col("warc_type") == "conversion").collect()
    got = {r.url: bytes(r.body).decode() for r in rows}
    assert got == {"http://h/a": "extracted plain text a", "http://h/b": "text b"}
    # no HTTP envelope: body IS the payload, byte for byte
    assert all(r.n_bytes == len(bytes(r.body)) for r in rows)


class TestDistributedSink:
    def test_write_read_roundtrip_and_determinism(self, spark, tmp_path):
        from vectorflow_spark.sources.warcmini import read_warc, write_warc_corpus

        docs = spark.createDataFrame(
            [(i, f"http://h/{i}", f"body text {i}") for i in range(50)],
            "doc_id long, url string, text string",
        )
        out1, out2 = str(tmp_path / "w1"), str(tmp_path / "w2")
        m1 = write_warc_corpus(docs, out1, n_files=4).collect()
        assert sum(r.n_records for r in m1) == 50
        assert len(m1) <= 4
        got = {
            r.url: bytes(r.body).decode()
            for r in read_warc(spark, out1).filter(F.col("warc_type") == "response").collect()
        }
        assert got == {f"http://h/{i}": f"body text {i}" for i in range(50)}
        # reruns are byte-identical (deterministic segment content)
        write_warc_corpus(docs, out2, n_files=4).collect()
        import os

        for r in m1:
            name = os.path.basename(r.path)
            assert open(r.path, "rb").read() == open(os.path.join(out2, name), "rb").read()
        # no temp debris left behind
        assert not [f for f in os.listdir(out1) if f.startswith(".tmp-")]

    def test_duplicate_urls_stay_deterministic(self, spark, tmp_path):
        """Two rows sharing a url (re-crawl shape): segment bytes must
        still be rerun-identical (tiebreak on text) and the records get
        DISTINCT WARC-Record-IDs (id covers the payload)."""
        from vectorflow_spark.sources.warcmini import read_warc, write_warc_corpus

        rows = [(1, "http://h/same", "body one"), (2, "http://h/same", "body two")]
        docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
        out1, out2 = str(tmp_path / "w1"), str(tmp_path / "w2")
        m1 = write_warc_corpus(docs.repartition(4), out1, n_files=1).collect()
        write_warc_corpus(docs.repartition(2), out2, n_files=1).collect()
        import os

        [r] = m1
        name = os.path.basename(r.path)
        assert open(r.path, "rb").read() == open(os.path.join(out2, name), "rb").read()
        recs = read_warc(spark, out1).filter(F.col("warc_type") == "response").collect()
        assert len(recs) == 2
        # distinct record payloads survive; ids differ (checked at parse level)
        from vectorflow_spark.sources.warcmini import parse_warc

        parsed = [
            rec
            for rec in parse_warc(open(r.path, "rb").read())
            if rec["warc-type"] == "response"
        ]
        ids = {rec["warc-record-id"] for rec in parsed}
        assert len(ids) == 2


class TestCorruptSegments:
    def test_corrupt_file_yields_error_row_not_task_failure(self, spark, tmp_path):
        """Default onCorrupt='row': a truncated/garbage segment contributes
        one error row (records parsed before the corruption survive); good
        segments are unaffected — at 100 TB one bad file must not kill the
        job."""
        good = build_warc([("http://h/ok", b"fine", "text/plain")])
        (tmp_path / "good.warc.gz").write_bytes(good)
        (tmp_path / "bad.warc.gz").write_bytes(good[: len(good) - 7])  # truncated gzip
        (tmp_path / "junk.warc").write_bytes(b"NOT A WARC AT ALL")
        # PLAIN (uncompressed) truncation mid-payload: EOF arrives
        # silently, so the parser must detect the short payload itself
        plain = build_warc([("http://h/cut", b"x" * 500, "text/plain")], compress=False)
        (tmp_path / "cut.warc").write_bytes(plain[: len(plain) - 100])
        rows = read_warc(spark, str(tmp_path)).collect()
        ok = [r for r in rows if r.warc_type == "response"]
        errs = [r for r in rows if r.warc_type == "error"]
        assert {r.url for r in ok} == {"http://h/ok"}
        assert {r.warc_file for r in errs} == {"bad.warc.gz", "junk.warc", "cut.warc"}
        assert all(r.payload_type for r in errs)  # message carried
        assert any("truncated WARC" in r.payload_type for r in errs)

    def test_zstd_warc_refuses_with_reason(self, tmp_path):
        """.warc.zst (zstd frame magic 0x28B52FFD) refuses loudly with
        the documented environment reason — no zstandard package or
        stdlib zstd codec here to verify a decoder against (module
        docstring; the MP3 adjudication) — instead of a confusing
        framing error from the raw-WARC fallback."""
        import io

        from vectorflow_spark.sources.warcmini import (
            iter_warc_stream,
            parse_warc,
        )

        fake_zst = b"\x28\xb5\x2f\xfd" + b"\x00" * 64
        with pytest.raises(NotImplementedError, match="warc.zst"):
            parse_warc(fake_zst)
        with pytest.raises(NotImplementedError, match="zstandard"):
            list(iter_warc_stream(io.BytesIO(fake_zst)))
        # and the env precondition the refusal documents actually holds
        import importlib.util

        assert importlib.util.find_spec("zstandard") is None
        # stdlib compression.zstd arrives in 3.14; parent package absent here
        assert importlib.util.find_spec("compression") is None

    def test_zstd_segment_yields_error_row(self, spark, tmp_path):
        # through the scan: onCorrupt='row' turns the refusal into one
        # error row carrying the reason, same contract as truncation
        good = build_warc([("http://h/ok", b"fine", "text/plain")])
        (tmp_path / "good.warc.gz").write_bytes(good)
        (tmp_path / "s.warc.zst").write_bytes(b"\x28\xb5\x2f\xfd" + b"\x00" * 64)
        rows = read_warc(spark, str(tmp_path)).collect()
        errs = [r for r in rows if r.warc_type == "error"]
        assert {r.warc_file for r in errs} == {"s.warc.zst"}
        assert any("zst" in r.payload_type for r in errs)
        assert {r.url for r in rows if r.warc_type == "response"} == {"http://h/ok"}

    def test_strict_mode_fails(self, spark, tmp_path):
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PythonException

        from vectorflow_spark.sources import warcsource

        warcsource.register(spark)
        (tmp_path / "junk.warc").write_bytes(b"NOT A WARC AT ALL")
        df = (
            spark.read.format("vf_warc")
            .option("onCorrupt", "strict")
            .load(str(tmp_path))
        )
        with pytest.raises((PythonException, Py4JJavaError)):
            df.collect()


class TestStreamingSource:
    def test_new_segments_arrive_incrementally(self, spark, tmp_path):
        """readStream.format('vf_warc'): batch 1 sees the initial
        segments, a newly dropped segment arrives as its own micro-batch
        with ONLY its records (offset = seen-file set)."""
        from vectorflow_spark.sources import warcsource

        warcsource.register(spark)
        src = tmp_path / "stream"
        src.mkdir()
        for i in range(2):
            (src / f"s{i}.warc.gz").write_bytes(
                build_warc([(f"http://h/{i}", f"b{i}".encode(), "text/plain")])
            )
        batches: list[set[str]] = []

        def sink(df, _bid):
            batches.append({r.url for r in df.filter(F.col("warc_type") == "response").collect()})

        q = (
            spark.readStream.format("vf_warc")
            .load(str(src))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            (src / "s2.warc.gz").write_bytes(
                build_warc([("http://h/2", b"b2", "text/plain")])
            )
            q.processAllAvailable()
        finally:
            q.stop()
        seen = [b for b in batches if b]
        assert seen[0] == {"http://h/0", "http://h/1"}
        assert seen[1] == {"http://h/2"}  # ONLY the new segment's records

    def test_streaming_through_mount_opener(self, spark, tmp_path):
        """Continuous crawl ingest from an OBJECT-STORE-style path: the
        stream reader lists/opens through the same injectable IO layer,
        so s3://-shaped prefixes stream per-record too."""
        from vectorflow_spark.sources import warcsource

        warcsource.register(spark)
        src = tmp_path / "bucket" / "crawl"
        src.mkdir(parents=True)
        (src / "s0.warc.gz").write_bytes(build_warc([("http://h/0", b"b0", "text/plain")]))
        batches: list[set[str]] = []

        def sink(df, _bid):
            batches.append({r.url for r in df.filter(F.col("warc_type") == "response").collect()})

        q = (
            spark.readStream.format("vf_warc")
            .option("io", f"mount:{tmp_path}")
            .load("s3://bucket/crawl")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            (src / "s1.warc.gz").write_bytes(
                build_warc([("http://h/1", b"b1", "text/plain")])
            )
            q.processAllAvailable()
        finally:
            q.stop()
        seen = [b for b in batches if b]
        assert seen == [{"http://h/0"}, {"http://h/1"}]


def test_truncation_never_yields_wrong_records_fuzz():
    """Property: for ANY prefix of a valid plain WARC, the incremental
    parser yields only records that are byte-identical to the full
    parse's — a cut mid-stream raises ValueError, never a short/garbled
    record."""
    import io

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vectorflow_spark.sources.warcmini import iter_warc_records

    full_blob = build_warc(
        [(f"http://h/{i}", bytes([i]) * (20 + 13 * i), "text/plain") for i in range(6)],
        compress=False,
    )
    want = [(r.get("warc-target-uri"), r["payload"]) for r in parse_warc(full_blob)]

    @given(cut=st.integers(0, len(full_blob)))
    @settings(max_examples=120, deadline=None)
    def inner(cut):
        got = []
        try:
            for rec in iter_warc_records(io.BytesIO(full_blob[:cut]), chunk_size=7):
                got.append((rec.get("warc-target-uri"), rec["payload"]))
        except ValueError:
            pass  # loud failure is the contract for a mid-record cut
        assert got == want[: len(got)]  # yielded prefix is exact

    inner()


def test_warc_roundtrip_fuzz():
    """Hypothesis: arbitrary (url-ish, body-bytes) records survive the
    build->parse roundtrip under both compressions — Content-Length
    framing must never depend on body content."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    url_st = st.text(
        alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E), min_size=1, max_size=40
    ).map(lambda s: f"http://h/{s}")
    rec_st = st.tuples(url_st, st.binary(max_size=300), st.just("application/octet-stream"))

    @given(recs=st.lists(rec_st, min_size=1, max_size=5), compress=st.booleans())
    @settings(max_examples=120, deadline=None)
    def inner(recs, compress):
        parsed = parse_warc(build_warc(recs, compress=compress))
        resp = [r for r in parsed if r["warc-type"] == "response"]
        assert [r["body"] for r in resp] == [b for _, b, _ in recs]
        assert [r["warc-target-uri"] for r in resp] == [u for u, _, _ in recs]

    inner()
