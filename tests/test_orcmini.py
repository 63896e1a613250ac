"""Byte-level ORC reader pinned against pyarrow.orc on the same bytes."""

from __future__ import annotations

import datetime
import glob
import random

import pyarrow as pa
import pyarrow.orc as orc
import pytest

from vectorflow_spark.sources import orcmini as om

SF = "/root/testdata/sf0.001"
EPOCH = datetime.datetime(1970, 1, 1)
EPOCH_D = datetime.date(1970, 1, 1)


def _mixed_table(n=5000, seed=1):
    rng = random.Random(seed)
    opt = lambda gen: [gen() if rng.random() > 0.1 else None for _ in range(n)]
    return pa.table(
        {
            "k": pa.array(opt(lambda: rng.randrange(-(10**12), 10**12)), pa.int64()),
            "d": pa.array(opt(lambda: rng.random() * 1e6), pa.float64()),
            "s": pa.array(opt(lambda: f"w{rng.randrange(50)}"), pa.string()),  # dictionary
            "u": pa.array([f"u{i}" for i in range(n)], pa.string()),  # direct
            "b": pa.array(opt(lambda: rng.random() > 0.5), pa.bool_()),
            "i": pa.array(opt(lambda: rng.randrange(-(2**30), 2**30)), pa.int32()),
            "f": pa.array(opt(lambda: float(rng.randrange(100))), pa.float32()),
            "mono": pa.array(range(n), pa.int64()),  # DELTA runs
            "rep": pa.array([7] * n, pa.int64()),  # SHORT_REPEAT
        }
    )


def _expected(table, col):
    vals = table.column(col).to_pylist()
    if col == "f":
        import struct as _s

        return [None if v is None else _s.unpack("<f", _s.pack("<f", v))[0] for v in vals]
    return vals


@pytest.mark.parametrize("comp", ["uncompressed", "zlib", "snappy", "lz4"])
def test_mixed_types_all_compressions(tmp_path, comp):
    t = _mixed_table()
    p = str(tmp_path / "t.orc")
    orc.write_table(t, p, compression=comp)
    got = om.read_orc(p, list(t.schema.names))
    for c in t.schema.names:
        assert got[c] == _expected(t, c), (comp, c)


def test_patched_base_and_multistripe(tmp_path):
    rng = random.Random(2)
    n = 20000
    pb = [rng.randrange(0, 512) for _ in range(n)]
    for i in rng.sample(range(n), 37):
        pb[i] = rng.randrange(2**40, 2**44)  # sparse outliers -> PATCHED_BASE
    t = pa.table({"pb": pa.array(pb, pa.int64()), "pad": pa.array([f"pad{i}" for i in range(n)])})
    p = str(tmp_path / "pb.orc")
    orc.write_table(t, p, compression="zlib", stripe_size=16 * 1024)
    assert orc.ORCFile(p).nstripes > 1
    got = om.read_orc(p, ["pb", "pad"])
    assert got["pb"] == pb
    assert got["pad"] == t.column("pad").to_pylist()


def test_timestamps_dates_binary(tmp_path):
    rng = random.Random(3)
    n = 8000
    ts = [
        datetime.datetime(
            1960 + rng.randrange(120), 1 + rng.randrange(12), 1 + rng.randrange(28),
            rng.randrange(24), rng.randrange(60), rng.randrange(60), rng.randrange(10**6),
        )
        if rng.random() > 0.1 else None
        for _ in range(n)
    ]
    dt = [
        datetime.date(1920 + rng.randrange(200), 1 + rng.randrange(12), 1 + rng.randrange(28))
        if rng.random() > 0.1 else None
        for _ in range(n)
    ]
    bn = [bytes(rng.randbytes(rng.randrange(0, 20))) if rng.random() > 0.1 else None for _ in range(n)]
    t = pa.table(
        {"ts": pa.array(ts, pa.timestamp("us")), "dt": pa.array(dt, pa.date32()),
         "bin": pa.array(bn, pa.binary())}
    )
    p = str(tmp_path / "t.orc")
    orc.write_table(t, p, compression="snappy")
    got = om.read_orc(p, ["ts", "dt", "bin"])
    assert got["bin"] == bn
    assert got["dt"] == [None if v is None else (v - EPOCH_D).days for v in dt]
    exp_ts = [
        None if v is None else (v - EPOCH) // datetime.timedelta(microseconds=1) * 1000
        for v in ts
    ]
    assert got["ts"] == exp_ts  # pre-epoch rows: truncated secs + negative nanos


def test_timestamp_nano_zero_marker(tmp_path):
    # exact trailing-zero encodings: 1ms, 1us, 5us, 100ns-class values
    ts = [
        datetime.datetime(2001, 1, 1, 0, 0, 0, 1000),  # 1ms -> 10^6 ns
        datetime.datetime(2001, 1, 1, 0, 0, 0, 1),  # 1us -> 1000 ns
        datetime.datetime(2001, 1, 1, 0, 0, 0, 0),
        datetime.datetime(1999, 12, 31, 23, 59, 59, 5),
    ]
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us"))})
    p = str(tmp_path / "z.orc")
    orc.write_table(t, p)
    got = om.read_orc(p, ["ts"])["ts"]
    exp = [(v - EPOCH) // datetime.timedelta(microseconds=1) * 1000 for v in ts]
    assert got == exp


def test_meta_matches_pyarrow(tmp_path):
    t = _mixed_table(3000, seed=4)
    p = str(tmp_path / "m.orc")
    orc.write_table(t, p, compression="zlib")
    f = orc.ORCFile(p)
    meta = om.read_orc_meta(p)
    assert meta["number_of_rows"] == f.nrows
    assert len(meta["stripes"]) == f.nstripes
    assert meta["field_names"] == list(t.schema.names)
    assert om.TYPE_KINDS[meta["types"][om._column_id(meta, "k")]["kind"]] == "LONG"


def test_refusals(tmp_path):
    t = pa.table({"l": pa.array([[1, 2], [3]], pa.list_(pa.int64())), "k": pa.array([1, 2])})
    p = str(tmp_path / "l.orc")
    orc.write_table(t, p)
    with pytest.raises(om.OrcError, match="not supported"):
        om.read_orc(p, ["l"])
    assert om.read_orc(p, ["k"])["k"] == [1, 2]  # sibling flat column still reads
    with pytest.raises(om.OrcError, match="no column"):
        om.read_orc(p, ["nope"])
    t2 = pa.table({"k": pa.array(range(1000))})
    p2 = str(tmp_path / "z.orc")
    orc.write_table(t2, p2, compression="zstd")
    with pytest.raises(om.OrcError, match="ZSTD"):
        om.read_orc_meta(p2)
    p3 = str(tmp_path / "bad.orc")
    with open(p3, "wb") as fh:
        fh.write(b"ORC" + b"x" * 50 + bytes([200]))
    with pytest.raises(om.OrcError):
        om.read_orc_meta(p3)


def test_truncation_fuzz(tmp_path):
    t = _mixed_table(500, seed=5)
    p = str(tmp_path / "t.orc")
    orc.write_table(t, p, compression="zlib")
    blob = open(p, "rb").read()
    rng = random.Random(6)
    for cut in sorted({rng.randrange(4, len(blob)) for _ in range(20)}):
        p2 = str(tmp_path / "cut.orc")
        with open(p2, "wb") as fh:
            fh.write(blob[:cut])
        try:
            om.read_orc(p2, list(t.schema.names))
        except (om.OrcError, Exception):
            continue  # any refusal is fine; silent wrong data is not
        # a prefix long enough to include the full footer may parse: then
        # values must still be correct (the tail carries only the footer)
        assert cut >= len(blob) - 20


def test_orc_raw_scan_spark(spark, tmp_path):
    t = _mixed_table(4000, seed=7)
    p = str(tmp_path / "s.orc")
    orc.write_table(t, p, compression="snappy", stripe_size=64 * 1024)
    df = om.orc_raw_scan(spark, p, ["k", "s", "u", "b"]).toPandas()
    got = sorted(df["u"].tolist())
    assert got == sorted(t.column("u").to_pylist())
    by_u = {r.u: r for r in df.itertuples()}
    exp_k = t.column("k").to_pylist()
    exp_s = t.column("s").to_pylist()
    for i in range(0, 4000, 97):
        r = by_u[f"u{i}"]
        assert (None if r.k is None or r.k != r.k else r.k) == exp_k[i] or (
            exp_k[i] is None and r.k != r.k
        ) or r.k == exp_k[i]
        assert (r.s if isinstance(r.s, str) else None) == exp_s[i]


def test_orc_raw_scan_matches_spark_native(spark, tmp_path):
    """Cross-check against Spark's own ORC reader on the same file."""
    t = _mixed_table(3000, seed=8)
    p = str(tmp_path / "n.orc")
    orc.write_table(t, p, compression="zlib")
    ours = om.orc_raw_scan(spark, p, ["u", "k", "d", "b"]).toPandas().sort_values("u").reset_index(drop=True)
    ref = (
        spark.read.orc(p).select("u", "k", "d", "b").toPandas().sort_values("u").reset_index(drop=True)
    )
    assert ours["u"].tolist() == ref["u"].tolist()
    assert ours["k"].equals(ref["k"])
    assert ours["d"].equals(ref["d"])
    assert ours["b"].equals(ref["b"])


# ---------------------------------------------------------------------------
# writer: our ORC bytes through three independent readers
# ---------------------------------------------------------------------------


def _writer_cols(n=7000, seed=5):
    rng = random.Random(seed)
    opt = lambda gen: [gen() if rng.random() > 0.1 else None for _ in range(n)]
    return {
        "k": opt(lambda: rng.randrange(-(10**14), 10**14)),
        "d": opt(lambda: rng.random() * 1e6),
        "s": opt(lambda: f"w{rng.randrange(40)}é"),
        "b": opt(lambda: rng.random() > 0.5),
        "run": [5] * n,  # RLEv1 run path
    }


_W_KINDS = {"k": "i64", "d": "f64", "s": "str", "b": "bool", "run": "i64"}


@pytest.mark.parametrize("comp", ["none", "zlib"])
def test_writer_pyarrow_and_self(tmp_path, comp):
    cols = _writer_cols()
    p = str(tmp_path / "w.orc")
    with open(p, "wb") as fh:
        fh.write(om.encode_orc(cols, _W_KINDS, compression=comp))
    t = orc.ORCFile(p).read()
    for c in cols:
        assert t.column(c).to_pylist() == cols[c], (comp, c)
    # our own reader closes the loop — and exercises the RLEv1 path no
    # modern writer emits
    assert om.read_orc(p, list(cols)) == cols


def test_writer_spark_reads(spark, tmp_path):
    cols = _writer_cols(3000, seed=6)
    p = str(tmp_path / "w.orc")
    with open(p, "wb") as fh:
        fh.write(om.encode_orc(cols, _W_KINDS))
    df = spark.read.orc(p).toPandas()
    assert sorted(df["k"].dropna().astype(int).tolist()) == sorted(
        v for v in cols["k"] if v is not None
    )
    assert df["s"].tolist() == cols["s"]
    assert len(df) == 3000


def test_writer_refusals():
    with pytest.raises(om.OrcError, match="zero rows"):
        om.encode_orc({"x": []}, {"x": "i64"})
    with pytest.raises(om.OrcError, match="ragged"):
        om.encode_orc({"x": [1], "y": [1, 2]}, {"x": "i64", "y": "i64"})
    with pytest.raises(om.OrcError, match="kind"):
        om.encode_orc({"x": [1]}, {"x": "decimal"})
    with pytest.raises(om.OrcError, match="compression"):
        om.encode_orc({"x": [1]}, {"x": "i64"}, compression="zstd")


def test_write_orc_corpus_spark(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "corpus")
    kinds = {"doc_id": "i64", "text": "str", "lang": "str", "source": "str", "n_chars": "i64"}
    man = om.write_orc_corpus(docs.repartition(4), out, kinds).toPandas()
    assert man.n_rows.sum() == docs.count()
    back = spark.read.orc(out)
    a = sorted(back.collect(), key=lambda r: r.doc_id)
    b = sorted(docs.collect(), key=lambda r: r.doc_id)
    assert a == b


def test_writer_emits_footer_statistics():
    cols = {"k": [5, 1, None, 9], "s": ["b", "a", None, "c"], "d": [1.5, None, 2.5, 3.5],
            "b": [True, None, False, True]}
    blob = om.encode_orc(cols, {"k": "i64", "s": "str", "d": "f64", "b": "bool"})
    p = "/tmp/vf_orc_stats_test.orc"
    with open(p, "wb") as fh:
        fh.write(blob)
    rows = {r["column"]: r for r in om.orc_stats_rows(p)}
    assert rows["k"]["n_values"] == 3 and rows["k"]["min_num"] == 1
    assert rows["k"]["max_num"] == 9 and rows["k"]["sum_num"] == 15
    assert rows["k"]["has_null"]
    assert rows["s"]["min_str"] == "a" and rows["s"]["max_str"] == "c"
    assert rows["d"]["min_num"] == 1.5 and rows["d"]["max_num"] == 3.5
    assert rows["b"]["sum_num"] == 2  # true count
    # NaN float bounds are never published
    blob2 = om.encode_orc({"d": [1.0, float("nan")]}, {"d": "f64"})
    with open(p, "wb") as fh:
        fh.write(blob2)
    r2 = om.orc_stats_rows(p)[0]
    assert r2["min_num"] is None and r2["max_num"] is None


def test_stats_rows_pinned_against_pyarrow(tmp_path):
    t = _mixed_table(2000, seed=9)
    p = str(tmp_path / "st.orc")
    orc.write_table(t, p, compression="zlib")
    rows = {r["column"]: r for r in om.orc_stats_rows(p)}
    kv = [v for v in t.column("k").to_pylist() if v is not None]
    assert rows["k"]["n_values"] == len(kv)
    assert rows["k"]["min_num"] == min(kv) and rows["k"]["max_num"] == max(kv)
    assert rows["k"]["sum_num"] == sum(kv)
    sv = [v for v in t.column("s").to_pylist() if v is not None]
    assert rows["s"]["min_str"] == min(sv) and rows["s"]["max_str"] == max(sv)


def test_write_orc_grouped(spark, tmp_path):
    from pyspark.sql import functions as F

    out = str(tmp_path / "grp")
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", (F.col("o_orderkey") % 3).alias("g")
    )
    man = om.write_orc_grouped(
        orders, out, {"o_orderkey": "i64"}, "g", ["o_orderkey"]
    ).toPandas()
    assert sorted(man.grp) == ["0", "1", "2"]
    files = sorted(glob.glob(f"{out}/g=*.orc"))
    assert len(files) == 3
    total = 0
    for f in files:
        ks = om.read_orc(f, ["o_orderkey"])["o_orderkey"]
        assert ks == sorted(ks)
        total += len(ks)
        st = om.orc_stats_rows(f)[0]
        assert st["min_num"] == ks[0] and st["max_num"] == ks[-1]
    assert total == orders.count()


def test_java_writer_pre_epoch_timestamps(spark, tmp_path):
    """Spark's orc-java writer stores java.sql.Timestamp's (trunc seconds,
    positive nanos); the reader repairs with the millis<0 && nanos>999999
    rule. Our decode must match Spark's own read-back exactly — including
    the known (-1, 0)-interval round-trip wart both readers share."""
    import datetime

    vals = [
        "1969-12-31 23:59:59.5", "1969-12-31 23:59:59.000001",
        "1950-06-01 12:00:00.25", "1969-12-31 23:59:58.75",
        "1970-01-01 00:00:00.25", "1969-07-20 20:17:40.123456",
    ]
    old = spark.conf.get("spark.sql.orc.compression.codec", "zstd")
    spark.conf.set("spark.sql.orc.compression.codec", "zlib")
    try:
        df = spark.sql(
            "SELECT timestamp'" + "' AS t UNION ALL SELECT timestamp'".join(vals) + "' AS t"
        )
        out = str(tmp_path / "ts")
        df.coalesce(1).write.orc(out)
    finally:
        spark.conf.set("spark.sql.orc.compression.codec", old)
    f = glob.glob(f"{out}/part-*.orc")[0]
    epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
    back = sorted(
        round((r.t.replace(tzinfo=datetime.timezone.utc) - epoch).total_seconds() * 1e9)
        for r in spark.read.orc(f).collect()
    )
    ours = sorted(om.read_orc(f, ["t"])["t"])
    assert ours == back


def test_spark_default_zstd_orc_refuses(spark, tmp_path):
    out = str(tmp_path / "z")
    assert spark.conf.get("spark.sql.orc.compression.codec") == "zstd"
    spark.range(5).write.orc(out)
    f = glob.glob(f"{out}/part-*.orc")[0]
    with pytest.raises(om.OrcError, match="ZSTD"):
        om.read_orc_meta(f)


def test_orc_raw_scan_binary_column(spark, tmp_path):
    rng = random.Random(10)
    bn = [bytes(rng.randbytes(rng.randrange(1, 12))) for _ in range(500)]
    t = pa.table({"k": pa.array(range(500)), "bin": pa.array(bn, pa.binary())})
    p = str(tmp_path / "b.orc")
    orc.write_table(t, p, compression="zlib")
    df = om.orc_raw_scan(spark, p, ["k", "bin"]).toPandas().sort_values("k")
    assert [bytes(v) for v in df["bin"]] == bn


def test_orc_raw_scan_zero_stripe_file(spark, tmp_path):
    t = pa.table({"k": pa.array([], pa.int64())})
    p = str(tmp_path / "e.orc")
    orc.write_table(t, p)
    assert om.read_orc(p, ["k"]) == {"k": []}
    df = om.orc_raw_scan(spark, p, ["k"])
    assert df.count() == 0 and df.schema[0].name == "k"


def test_string_sum_stat_is_zigzag(tmp_path):
    t = pa.table({"s": pa.array(["ab", "cd", "éf"])})  # 2+2+3 = 7 utf-8 bytes
    p = str(tmp_path / "s.orc")
    orc.write_table(t, p)
    assert om.orc_stats_rows(p)[0]["sum_num"] == 7
    # and our writer emits the same wire form pyarrow's reader produced
    with open(p, "rb") as fh:
        pass
    blob = om.encode_orc({"s": ["ab", "cd", "éf"]}, {"s": "str"})
    p2 = str(tmp_path / "w.orc")
    with open(p2, "wb") as fh:
        fh.write(blob)
    assert om.orc_stats_rows(p2)[0]["sum_num"] == 7


def test_pb_unpacked_repeated_accepted():
    # Type.subtypes declared packed may legally arrive as individual
    # varints; both forms must accumulate
    w = om._PbW()
    w.uint(1, 12)  # kind STRUCT
    w.uint(2, 1)   # subtypes, unpacked form
    w.uint(2, 2)
    w.uint(2, 3)
    parsed = om._pb_parse(bytes(w.out), om._TYPE_SPEC)
    assert parsed["subtypes"] == [1, 2, 3]


def test_tiny_file_refuses(tmp_path):
    p = str(tmp_path / "t.orc")
    for blob in (b"", b"ORC", b"ORC\x00\x01"):
        with open(p, "wb") as fh:
            fh.write(blob)
        with pytest.raises(om.OrcError):
            om.read_orc_meta(p)


def test_dictionary_blob_truncation_refuses(tmp_path):
    t = pa.table({"s": pa.array([f"w{i%5}" for i in range(2000)])})
    p = str(tmp_path / "d.orc")
    orc.write_table(t, p, compression="uncompressed")
    meta = om.read_orc_meta(p)
    stripe = dict(meta["stripes"][0])
    with open(p, "rb") as fh:
        streams, encodings = om._read_stripe_streams(fh, meta, stripe)
    col = om._column_id(meta, "s")
    if (col, 3) in streams:  # dictionary encoding chosen
        streams[(col, 3)] = streams[(col, 3)][:2]  # truncate the dict blob
        with pytest.raises(om.OrcError, match="dictionary data stream truncated"):
            om._decode_column(meta, streams, encodings, col, stripe["number_of_rows"])
