"""Parquet split-block bloom filters: the pure-Python XXH64, the bloom
bitset reader, and vf_rawpq's plan-time point-lookup pruning — all pinned
against parquet-java (Spark's writer) and Spark's own xxhash64 SQL
function, never self-checked."""

from __future__ import annotations

import glob
import struct

import pytest
from pyspark.sql import functions as F

from vectorflow_spark.functions.xxh import xxh64
from vectorflow_spark.sources import parquetmini as pm


class TestXxh64:
    def test_spec_vectors(self):
        # the xxHash specification's published test vectors (seed 0 / prime)
        assert xxh64(b"", 0) == 0xEF46DB3751D8E999
        assert xxh64(b"", 2654435761) == 0xAC75FDA2929B17EF

    def test_pinned_against_spark_xxhash64(self, spark):
        """Spark SQL xxhash64 = XXH64(value bytes, seed 42) signed — the
        JVM pin for our implementation, over both the <32-byte and the
        stripe (>=32-byte) code paths."""
        longs = [0, 1, -1, 42, 1 << 40, -(1 << 40)]
        got = spark.createDataFrame([(v,) for v in longs], "v long").select(
            "v", F.xxhash64("v").alias("h")
        ).collect()
        for r in got:
            mine = xxh64(struct.pack("<q", r.v), 42)
            assert mine - (1 << 64) * (mine >> 63) == r.h
        strs = ["", "a", "hello world", "日本語テキスト", "x" * 100]
        got = spark.createDataFrame([(s,) for s in strs], "s string").select(
            "s", F.xxhash64("s").alias("h")
        ).collect()
        for r in got:
            mine = xxh64(r.s.encode(), 42)
            assert mine - (1 << 64) * (mine >> 63) == r.h


@pytest.fixture(scope="module")
def bloom_file(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bloom"))
    df = spark.range(0, 50000, 7).selectExpr("id AS k", "CAST(id AS STRING) AS s")
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#k", "true")
        .option("parquet.bloom.filter.expected.ndv#k", "10000")
        .option("parquet.bloom.filter.enabled#s", "true")
        .option("parquet.bloom.filter.expected.ndv#s", "10000")
        .parquet(d)
    )
    return glob.glob(d + "/*.parquet")[0]


class TestBloomReader:
    def test_no_false_negatives_and_low_fp(self, bloom_file):
        rows = {r["path_in_schema"]: r for r in pm.footer_meta_rows(bloom_file)}
        assert isinstance(rows["k"]["bloom_filter_offset"], int)
        bs_k = pm.read_bloom_filter(bloom_file, rows["k"]["bloom_filter_offset"])
        bs_s = pm.read_bloom_filter(bloom_file, rows["s"]["bloom_filter_offset"])
        present = list(range(0, 50000, 7))[:1500]
        # the filter contract: present values are NEVER excluded
        assert all(pm.bloom_maybe_contains(bs_k, v, "INT64") for v in present)
        assert all(pm.bloom_maybe_contains(bs_s, str(v), "BYTE_ARRAY") for v in present)
        absent = [v + 1 for v in present]
        fp_k = sum(pm.bloom_maybe_contains(bs_k, v, "INT64") for v in absent)
        fp_s = sum(pm.bloom_maybe_contains(bs_s, str(v), "BYTE_ARRAY") for v in absent)
        assert fp_k < 75 and fp_s < 75  # ~1% NDV-sized filter: FP ~ 0.1-1%

    def test_unknown_variant_refuses(self, bloom_file, tmp_path):
        """A doctored header claiming a non-split-block algorithm must
        refuse, never silently prune everything."""
        rows = {r["path_in_schema"]: r for r in pm.footer_meta_rows(bloom_file)}
        off = rows["k"]["bloom_filter_offset"]
        with open(bloom_file, "rb") as f:
            data = bytearray(f.read())
        # field 2 (algorithm) union: flip its inner field id 1 -> 2 by
        # rewriting the nested struct's first field header byte
        t = pm._Thrift(bytes(data), off)
        hdr = t.read_struct(pm._BLOOM_HEADER)
        assert "block" in hdr["algorithm"]
        # the algorithm union encodes as 1c 1c 00 00 (field+1 struct,
        # inner field 1 empty struct, two stops); flip the inner member
        # to field id 2 (1c -> 2c) = a union variant we do not know
        window = bytes(data[off : off + 24])
        i = window.index(b"\x1c\x1c\x00\x00")
        data[off + i + 1] = 0x2C
        p2 = tmp_path / "doctored.parquet"
        p2.write_bytes(bytes(data))
        with pytest.raises(pm.ParquetError, match="algorithm"):
            pm.read_bloom_filter(str(p2), off)


class TestVfRawPqBloomPruning:
    def test_point_lookup_prunes_row_groups(self, spark, tmp_path):
        """Keys hash-distributed across files: min/max spans the whole
        domain everywhere (range pruning can drop NOTHING), so any row
        group the point lookup skips is the bloom filter working."""
        from pyspark.sql.types import StructType

        from vectorflow_spark.sources.pqsource import VfRawPqReader

        df = spark.range(0, 8000).selectExpr("id AS k", "id % 997 AS v")
        (
            df.repartition(8, "k")  # every file spans ~the full key range
            .write.mode("overwrite")
            .option("parquet.bloom.filter.enabled#k", "true")
            .option("parquet.bloom.filter.expected.ndv#k", "8000")
            .parquet(str(tmp_path))
        )
        from pyspark.sql.datasource import EqualTo

        rd = VfRawPqReader(
            {"path": str(tmp_path)}, StructType.fromDDL("k bigint, v bigint")
        )
        returned = list(rd.pushFilters([EqualTo(("k",), 4242)]))
        assert len(returned) == 1  # advisory: Spark re-applies exactly
        parts = rd.partitions()
        # range stats admit every row group; bloom must drop most of them
        assert rd.pruned >= 5, (len(parts), rd.pruned)
        assert len(parts) + rd.pruned >= 8

    def test_end_to_end_matches_ground_truth(self, spark, tmp_path):
        from vectorflow_spark.sources import pqsource

        df = spark.range(0, 8000).selectExpr("id AS k", "CAST(id AS STRING) AS s")
        (
            df.repartition(8, "k")
            .write.mode("overwrite")
            .option("parquet.bloom.filter.enabled#s", "true")
            .option("parquet.bloom.filter.expected.ndv#s", "8000")
            .parquet(str(tmp_path))
        )
        pqsource.register(spark)
        out = (
            spark.read.format("vf_rawpq")
            .load(str(tmp_path))
            .filter(F.col("s") == "1234")  # STRING point lookup via bloom
            .collect()
        )
        assert [(r.k, r.s) for r in out] == [(1234, "1234")]
        missing = (
            spark.read.format("vf_rawpq")
            .load(str(tmp_path))
            .filter(F.col("s") == "nope")
            .count()
        )
        assert missing == 0


class TestSharedRelationConflation:
    """The KNOWN SPARK-SIDE LIMITATION in pqsource's docstring: one loaded
    DataFrame reused under differently-filtered scans gets the LAST
    branch's pruned partitions for every branch. These tests pin the two
    SAFE usages; the canary records the upstream behavior so a Spark fix
    (or regression) surfaces here."""

    def _write(self, spark, path):
        df = spark.range(0, 8000).selectExpr("id AS k")
        (
            df.repartition(8, "k")
            .write.mode("overwrite")
            .option("parquet.bloom.filter.enabled#k", "true")
            .option("parquet.bloom.filter.expected.ndv#k", "8000")
            .parquet(path)
        )

    def test_separate_loads_are_correct(self, spark, tmp_path):
        from vectorflow_spark.sources import pqsource

        self._write(spark, str(tmp_path))
        pqsource.register(spark)
        a = spark.read.format("vf_rawpq").load(str(tmp_path)).filter(F.col("k") == 0)
        b = spark.read.format("vf_rawpq").load(str(tmp_path)).filter(F.col("k") == 7999)
        assert sorted(r.k for r in a.unionAll(b).collect()) == [0, 7999]

    def test_pushdown_prune_false_makes_shared_relation_safe(self, spark, tmp_path):
        from vectorflow_spark.sources import pqsource

        self._write(spark, str(tmp_path))
        pqsource.register(spark)
        base = (
            spark.read.format("vf_rawpq")
            .option("pushdown_prune", "false")
            .load(str(tmp_path))
        )
        u = base.filter(F.col("k") == 0).unionAll(base.filter(F.col("k") == 7999))
        assert sorted(r.k for r in u.collect()) == [0, 7999]

    def test_upstream_conflation_canary(self, spark, tmp_path):
        """Current Spark 4.1 behavior: the shared-relation self-union loses
        the first branch's rows (last plan wins). If this starts returning
        the CORRECT [0, 7999], Spark fixed the conflation — delete the
        pushdown_prune escape hatch and this canary together, and update
        the status line in docs/SPARK_PYTHON_DS_PUSHDOWN_CONFLATION.md
        (the JIRA-ready minimal repro + analysis writeup)."""
        from vectorflow_spark.sources import pqsource

        self._write(spark, str(tmp_path))
        pqsource.register(spark)
        base = spark.read.format("vf_rawpq").load(str(tmp_path))
        u = base.filter(F.col("k") == 0).unionAll(base.filter(F.col("k") == 7999))
        rows = sorted(r.k for r in u.collect())
        assert rows in ([7999], [0, 7999]), rows


class TestBloomWriter:
    """encode_parquet's bloom WRITE path — pinned against parquet-java's
    BlockSplitBloomFilter constructed over OUR bitset bytes: hash AND
    membership must agree value-for-value (no self-checking)."""

    def _write(self, tmp_path):
        base = 1 << 35  # >= 2^31 so py4j boxes Long (INT64 hash path)
        vals = [base + v for v in range(0, 5000, 3)]
        svals = [f"doc-{v % 300}" for v in range(len(vals))]
        blob = pm.encode_parquet(
            {"k": vals, "s": svals}, {"k": "i64", "s": "str"}, bloom_columns=["k", "s"]
        )
        p = str(tmp_path / "ours.parquet")
        with open(p, "wb") as f:
            f.write(blob)
        return p, vals, sorted(set(svals))

    def test_parquet_java_hash_and_membership_parity(self, spark, tmp_path):
        p, vals, svals = self._write(tmp_path)
        rows = {r["path_in_schema"]: r for r in pm.footer_meta_rows(p)}
        bk = pm.read_bloom_filter(p, rows["k"]["bloom_filter_offset"])
        bs = pm.read_bloom_filter(p, rows["s"]["bloom_filter_offset"])
        jvm = spark._jvm
        bfk = jvm.org.apache.parquet.column.values.bloomfilter.BlockSplitBloomFilter(
            bytearray(bk)
        )
        bfs = jvm.org.apache.parquet.column.values.bloomfilter.BlockSplitBloomFilter(
            bytearray(bs)
        )
        Binary = jvm.org.apache.parquet.io.api.Binary

        def signed(h):
            return h - (1 << 64) if h >= (1 << 63) else h

        for v in vals[:150] + [vals[0] + 1, vals[0] + 100001]:
            hj = bfk.hash(v)
            assert hj == signed(xxh64(struct.pack("<q", v), 0)), v
            assert bfk.findHash(hj) == pm.bloom_maybe_contains(bk, v, "INT64"), v
        for s in svals[:100] + ["nope", "absent"]:
            hj = bfs.hash(Binary.fromString(s))
            assert hj == signed(xxh64(s.encode(), 0)), s
            assert bfs.findHash(hj) == pm.bloom_maybe_contains(bs, s, "BYTE_ARRAY"), s

    def test_no_false_negatives_and_spark_reads_file(self, spark, tmp_path):
        p, vals, _ = self._write(tmp_path)
        rows = {r["path_in_schema"]: r for r in pm.footer_meta_rows(p)}
        bk = pm.read_bloom_filter(p, rows["k"]["bloom_filter_offset"])
        assert all(pm.bloom_maybe_contains(bk, v, "INT64") for v in vals)
        fp = sum(pm.bloom_maybe_contains(bk, v + 1, "INT64") for v in vals)
        assert fp < len(vals) * 0.03  # fpp target 0.01
        # Spark (parquet-mr read path, bloom-aware) over OUR file
        got = spark.read.parquet(p).filter(F.col("k") == vals[7]).collect()
        assert [r.k for r in got] == [vals[7]]
        assert spark.read.parquet(p).filter(F.col("k") == vals[0] + 1).count() == 0

    def test_vf_rawpq_prunes_on_our_own_blooms(self, spark, tmp_path):
        """Read/write symmetry: our DataSource point-lookup pruning over
        files OUR writer bloomed, keys hash-spread so ranges can't help."""
        from pyspark.sql.datasource import EqualTo
        from pyspark.sql.types import StructType

        from vectorflow_spark.sources.pqsource import VfRawPqReader

        for part in range(4):
            vals = [v for v in range(8000) if v % 4 == part]
            blob = pm.encode_parquet({"k": vals}, {"k": "i64"}, bloom_columns=["k"])
            (tmp_path / f"part-{part}.parquet").write_bytes(blob)
        rd = VfRawPqReader({"path": str(tmp_path)}, StructType.fromDDL("k bigint"))
        list(rd.pushFilters([EqualTo(("k",), 4242)]))
        parts = rd.partitions()
        assert rd.pruned >= 2, (len(parts), rd.pruned)  # ranges admit all 4

    def test_bool_bloom_refuses(self):
        with pytest.raises(pm.ParquetError, match="bloom"):
            pm.encode_parquet({"b": [True, False]}, {"b": "bool"}, bloom_columns=["b"])


class TestOrcBloom:
    """ORC bloom filters (orcmini.read_bloom_index + the hash pair) —
    pinned against orc-core via py4j: Murmur3.hash64 value-for-value,
    and BloomFilterUtf8 membership for longs, strings and the
    doubleToLongBits path. The long hash is Thomas Wang with SIGNED
    shifts (the orc-core bytecode uses lshr — the unsigned variant
    diverges on any input whose intermediate has bit 63 set; caught by
    this pin on -5 and 2^40)."""

    def test_murmur3_hash64_parity(self, spark):
        from vectorflow_spark.sources import orcmini as om

        jvm = spark._jvm
        for data in [b"", b"a", b"hello", b"x" * 7, b"y" * 8, b"z" * 33, "日本語".encode()]:
            hj = jvm.org.apache.orc.util.Murmur3.hash64(bytearray(data))
            hm = om.murmur3_hash64(data)
            assert hj == hm - (1 << 64) * (hm >> 63), data

    def test_membership_parity_all_types(self, spark):
        from vectorflow_spark.sources import orcmini as om

        jvm = spark._jvm
        bf = jvm.org.apache.orc.util.BloomFilterUtf8(500, 0.01)
        longs = [0, 1, -5, 42, 123456789, 1 << 40, -(1 << 62)]
        for v in longs:
            bf.addLong(v)
        bf.addString("present")
        bf.addDouble(2.718)
        bits = [b & ((1 << 64) - 1) for b in bf.getBitSet()]
        bloom = {"num_hash_functions": bf.getNumHashFunctions(), "bitset": bits}
        for v in longs + [2, 7, -6, 4242, 1 << 41]:
            assert om.orc_bloom_test_hash(bloom, om.wang_long_hash(v)) == bool(
                bf.testLong(v)
            ), v
        for s in ["present", "absent", "日本語", ""]:
            assert om.orc_bloom_test_hash(bloom, om.murmur3_hash64(s.encode())) == bool(
                bf.testString(s)
            ), s
        bits_d = struct.unpack("<q", struct.pack("<d", 2.718))[0]
        assert om.orc_bloom_test_hash(bloom, om.wang_long_hash(bits_d))
        bits_a = struct.unpack("<q", struct.pack("<d", 3.14))[0]
        assert om.orc_bloom_test_hash(bloom, om.wang_long_hash(bits_a)) == bool(
            bf.testDouble(3.14)
        )

    def test_spark_written_file_blooms(self, spark, tmp_path):
        """Blooms parsed from a Spark-written ORC file admit every present
        key in its own row group and reject most absent ones."""
        import glob as g

        from vectorflow_spark.sources import orcmini as om

        (
            spark.range(0, 20000)
            .selectExpr("id AS k", "CAST(id AS STRING) AS s")
            .coalesce(1)
            .write.mode("overwrite")
            .option("compression", "zlib")
            .option("orc.bloom.filter.columns", "k,s")
            .option("orc.row.index.stride", "5000")
            .orc(str(tmp_path))
        )
        f = g.glob(str(tmp_path) + "/*.orc")[0]
        meta = om.read_orc_meta(f)
        st = meta["stripes"][0]
        bk = om.read_bloom_index(f, meta, st, om._column_id(meta, "k"))
        bs = om.read_bloom_index(f, meta, st, om._column_id(meta, "s"))
        assert len(bk) == 4 and len(bs) == 4  # 20000 rows / 5000 stride
        for v in (0, 4999, 5000, 12345, 19999):
            rg = v // 5000
            assert om.orc_bloom_test_hash(bk[rg], om.wang_long_hash(v)), v
            assert om.orc_bloom_test_hash(bs[rg], om.murmur3_hash64(str(v).encode())), v
        # absent keys: mostly rejected everywhere (fpp 0.05 default)
        rejects = sum(
            not om.orc_bloom_test_hash(b, om.wang_long_hash(v))
            for v in range(20001, 20200)
            for b in bk
        )
        assert rejects > 199 * 4 * 0.8

    def test_vf_raworc_stripe_pruning_end_to_end(self, spark, tmp_path):
        from vectorflow_spark.sources import orcsource
        from vectorflow_spark.sources.orcsource import VfRawOrcReader

        (
            spark.range(0, 40000)
            .selectExpr("id AS k")
            .repartition(4, "k")  # every file spans the domain: ranges useless
            .write.mode("overwrite")
            .option("compression", "zlib")
            .option("orc.bloom.filter.columns", "k")
            .orc(str(tmp_path))
        )
        from pyspark.sql.datasource import EqualTo
        from pyspark.sql.types import StructType

        rd = VfRawOrcReader({"path": str(tmp_path)}, StructType.fromDDL("k bigint"))
        list(rd.pushFilters([EqualTo(("k",), 31337)]))
        parts = rd.partitions()
        assert rd.pruned_stripes >= 2, (len(parts), rd.pruned_stripes)
        # end to end through Spark: exactly the right row survives
        orcsource.register(spark)
        out = (
            spark.read.format("vf_raworc")
            .load(str(tmp_path))
            .filter(F.col("k") == 31337)
            .collect()
        )
        assert [r.k for r in out] == [31337]
        assert (
            spark.read.format("vf_raworc")
            .load(str(tmp_path))
            .filter(F.col("k") == 999999)
            .count()
            == 0
        )


def test_legacy_kind7_string_blooms_not_probed(tmp_path, spark):
    """A stripe carrying only the legacy kind-7 bloom stream must not be
    probed for STRING values (platform-charset hashing, the bug the UTF8
    stream kind fixed) but stays usable for longs."""
    import glob as g

    from vectorflow_spark.sources import orcmini as om

    (
        spark.range(0, 5000)
        .selectExpr("id AS k", "CAST(id AS STRING) AS s")
        .coalesce(1)
        .write.mode("overwrite")
        .option("compression", "zlib")
        .option("orc.bloom.filter.columns", "k,s")
        .orc(str(tmp_path))
    )
    f = g.glob(str(tmp_path) + "/*.orc")[0]
    meta = om.read_orc_meta(f)
    st = meta["stripes"][0]
    cs = om._column_id(meta, "s")
    # modern orc-core writes kind 8 (UTF8): require_utf8 passes through
    assert om.read_bloom_index(f, meta, st, cs, require_utf8=True) is not None
    # simulate a legacy-only file by asking for a column with no stream
    # of either kind (the filter-less column id 0 = the struct root)
    assert om.read_bloom_index(f, meta, st, 0, require_utf8=True) is None
