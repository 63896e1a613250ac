"""Parquet byte-level stack: snappy codec + footer parser + page decoder.

Every layer is pinned against an independent implementation on the SAME
bytes: pyarrow's native snappy for the codec, pyarrow's ParquetFile
metadata for the footer walk, pyarrow.read_table for decoded values, and
DuckDB's DESCRIBE for the SQL type mapping. Refusal contracts cover the
unsupported-by-design surface (ZSTD pages, encrypted footers, DELTA
encodings, nested decode) and truncation fuzz proves parse-or-refuse.
"""

from __future__ import annotations

import glob
import os
import random
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.functions import col as F_col

from vectorflow_spark.operators import snappymini as sm
from vectorflow_spark.sources import parquetmini as pm

SF = "/root/testdata/sf0.001"
TABLES = sorted(glob.glob(f"{SF}/*.parquet"))


# ---------------------------------------------------------------------------
# snappy
# ---------------------------------------------------------------------------


def _native():
    return pa.Codec("snappy")


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"a",
        b"abc",
        b"a" * 100,
        b"ab" * 5000,
        bytes(range(256)) * 300,
        b"x" * 59 + b"y" * 60 + b"z" * 61,  # literal length escape boundaries
    ],
)
def test_snappy_roundtrip_pinned(payload):
    nat = bytes(_native().compress(payload))
    assert sm.decompress(nat) == payload
    ours = sm.compress(payload)
    assert bytes(_native().decompress(ours, decompressed_size=len(payload))) == payload
    assert sm.decompress(ours) == payload


def test_snappy_fuzz_pinned():
    rng = random.Random(42)
    for trial in range(40):
        n = rng.randrange(0, 50000)
        if trial % 3 == 0:
            data = os.urandom(n)
        elif trial % 3 == 1:
            data = bytes(rng.choices(b"abcd \n", k=n))
        else:  # long-range repeats exercise copy-4 offsets
            seed = os.urandom(200)
            data = (seed * (n // 200 + 1))[:n]
        nat = bytes(_native().compress(data))
        assert sm.decompress(nat) == data
        ours = sm.compress(data)
        assert bytes(_native().decompress(ours, decompressed_size=n)) == data


def test_snappy_overlapping_copy_rle():
    # offset < length: byte-at-a-time semantics. Build by hand:
    # literal "ab", then copy off=2 len=8 -> "abababab"
    block = bytes([10]) + bytes([(2 - 1) << 2]) + b"ab" + bytes([2 | ((8 - 1) << 2)]) + (2).to_bytes(2, "little")
    assert sm.decompress(block) == b"ab" * 5
    assert bytes(_native().decompress(block, decompressed_size=10)) == b"ab" * 5


@pytest.mark.parametrize(
    "bad",
    [
        b"",  # no preamble
        bytes([5]),  # declared 5, empty body
        bytes([3, (3 - 1) << 2, 65, 66]),  # literal runs past input
        bytes([4]) + bytes([(2 - 1) << 2]) + b"ab" + bytes([1 | (0 << 2), 5]),  # offset 5 > produced 2
        bytes([4]) + bytes([(2 - 1) << 2]) + b"ab" + bytes([1 | (0 << 2), 0]),  # offset 0
        bytes([2, (3 - 1) << 2]) + b"abc",  # output overruns declared length
        bytes([0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0x1F]),  # varint > 32 bits
    ],
)
def test_snappy_refusals(bad):
    with pytest.raises(sm.SnappyError):
        sm.decompress(bad)


# ---------------------------------------------------------------------------
# footer vs pyarrow + DuckDB
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("path", TABLES, ids=[os.path.basename(p) for p in TABLES])
def test_footer_pinned_against_pyarrow(path):
    meta = pm.read_file_meta(path)
    md = pq.ParquetFile(path).metadata
    assert meta["num_rows"] == md.num_rows
    assert len(meta["row_groups"]) == md.num_row_groups
    assert meta["created_by"] == md.created_by
    rows = {
        (r["row_group_id"], r["path_in_schema"]): r for r in pm.footer_meta_rows(path)
    }
    for rg_id in range(md.num_row_groups):
        rg = md.row_group(rg_id)
        for i in range(rg.num_columns):
            c = rg.column(i)
            o = rows[(rg_id, c.path_in_schema)]
            assert o["num_values"] == c.num_values
            assert o["compression"] == c.compression
            assert o["total_compressed_size"] == c.total_compressed_size
            assert o["total_uncompressed_size"] == c.total_uncompressed_size
            assert o["data_page_offset"] == c.data_page_offset
            assert o["dictionary_page_offset"] == c.dictionary_page_offset
            s = c.statistics
            if s is not None:
                assert o["stats_null_count"] == s.null_count
                if s.has_min_max and not isinstance(o["stats_min"], (bytes,)):
                    got_min, got_max = o["stats_min"], o["stats_max"]
                    import datetime

                    if isinstance(s.min, datetime.datetime):
                        # pyarrow presents TIMESTAMP_MICROS stats as datetimes;
                        # ours stay epoch micros (the storage representation)
                        epoch = datetime.datetime(1970, 1, 1)
                        assert got_min == int((s.min - epoch).total_seconds() * 1e6)
                        assert got_max == int((s.max - epoch).total_seconds() * 1e6)
                    else:
                        assert got_min == s.min
                        assert got_max == s.max


@pytest.mark.parametrize("path", TABLES, ids=[os.path.basename(p) for p in TABLES])
def test_duckdb_type_mapping(path):
    import duckdb

    meta = pm.read_file_meta(path)
    for name, dtype, *_ in duckdb.connect().execute(
        f"DESCRIBE SELECT * FROM read_parquet('{path}')"
    ).fetchall():
        assert pm.duckdb_type_of(meta, name) == dtype


# ---------------------------------------------------------------------------
# page decode vs pyarrow across writer shapes
# ---------------------------------------------------------------------------


def _roundtrip(tmp_path, table, **writer_kwargs):
    p = str(tmp_path / "t.parquet")
    pq.write_table(table, p, **writer_kwargs)
    meta = pm.read_file_meta(p)
    cols = [f.name for f in table.schema]
    out = {c: [] for c in cols}
    for rg in range(len(meta["row_groups"])):
        got = pm.read_row_group(p, meta, rg, cols)
        for c in cols:
            out[c].extend(got[c])
    return p, meta, out


def _sample_table(n=5000, with_nulls=True, seed=0):
    rng = random.Random(seed)
    ints = [rng.randrange(-(2**40), 2**40) if rng.random() > 0.1 or not with_nulls else None for _ in range(n)]
    i32 = [rng.randrange(-(2**30), 2**30) if rng.random() > 0.1 or not with_nulls else None for _ in range(n)]
    dbl = [rng.random() * 1e6 if rng.random() > 0.1 or not with_nulls else None for _ in range(n)]
    flt = [rng.random() if rng.random() > 0.1 or not with_nulls else None for _ in range(n)]
    txt = ["".join(rng.choices("abcdef ", k=rng.randrange(0, 30))) if rng.random() > 0.1 or not with_nulls else None for _ in range(n)]
    boo = [rng.random() > 0.5 if rng.random() > 0.1 or not with_nulls else None for _ in range(n)]
    return pa.table(
        {
            "i64": pa.array(ints, pa.int64()),
            "i32": pa.array(i32, pa.int32()),
            "dbl": pa.array(dbl, pa.float64()),
            "flt": pa.array(flt, pa.float32()),
            "txt": pa.array(txt, pa.string()),
            "boo": pa.array(boo, pa.bool_()),
        }
    )


def _expected(table):
    return {c: table.column(c).to_pylist() for c in table.schema.names}


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(compression="snappy"),
        dict(compression="none"),
        dict(compression="gzip"),
        dict(compression="snappy", use_dictionary=False),
        dict(compression="snappy", data_page_version="2.0"),
        dict(compression="none", data_page_version="2.0", use_dictionary=False),
        dict(compression="gzip", data_page_version="2.0"),
        dict(compression="snappy", row_group_size=700),
        dict(compression="snappy", data_page_size=1024),  # many pages per chunk
    ],
)
def test_decode_writer_matrix(tmp_path, kwargs):
    table = _sample_table()
    _, _, got = _roundtrip(tmp_path, table, **kwargs)
    exp = _expected(table)
    for c in exp:
        gv = [round(v, 6) if isinstance(v, float) else v for v in got[c]]
        ev = [round(v, 6) if isinstance(v, float) else v for v in exp[c]]
        assert gv == ev, c


def test_decode_no_nulls_required_levels(tmp_path):
    table = _sample_table(with_nulls=False)
    _, _, got = _roundtrip(tmp_path, table, compression="snappy")
    assert got == _expected(table)


def test_decode_fixed_len_byte_array(tmp_path):
    vals = [os.urandom(7) for _ in range(100)]
    table = pa.table({"f": pa.array(vals, pa.binary(7))})
    _, _, got = _roundtrip(tmp_path, table, compression="snappy", use_dictionary=False)
    assert got["f"] == vals


def test_decode_all_null_column(tmp_path):
    table = pa.table({"x": pa.array([None] * 50, pa.int64())})
    _, _, got = _roundtrip(tmp_path, table, compression="snappy")
    assert got["x"] == [None] * 50


def test_testdata_values_match_pyarrow():
    p = f"{SF}/lineitem.parquet"
    meta = pm.read_file_meta(p)
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate"]
    got = pm.read_row_group(p, meta, 0, cols)
    t = pq.read_table(p, columns=cols)
    for c in cols[:-1]:
        assert got[c] == t.column(c).to_pylist()
    assert got["l_shipdate"] == t.column("l_shipdate").combine_chunks().cast(pa.int64()).to_pylist()


# ---------------------------------------------------------------------------
# modern encodings: DELTA_* and BYTE_STREAM_SPLIT (pinned via pyarrow writer)
# ---------------------------------------------------------------------------


def _enc_roundtrip(tmp_path, arr, encoding, **extra):
    table = pa.table({"x": arr})
    p = str(tmp_path / "e.parquet")
    pq.write_table(
        table, p, use_dictionary=False, column_encoding={"x": encoding},
        compression=extra.pop("compression", "none"), **extra,
    )
    meta = pm.read_file_meta(p)
    out = []
    for rg in range(len(meta["row_groups"])):
        out.extend(pm.read_row_group(p, meta, rg, ["x"])["x"])
    assert out == table.column("x").to_pylist()
    # confirm the writer actually used the requested encoding
    md = pq.ParquetFile(p).metadata.row_group(0).column(0)
    assert encoding in md.encodings
    return p


def test_delta_binary_packed_int64(tmp_path):
    rng = random.Random(5)
    vals = [rng.randrange(-(2**62), 2**62) if rng.random() > 0.1 else None for _ in range(5000)]
    _enc_roundtrip(tmp_path, pa.array(vals, pa.int64()), "DELTA_BINARY_PACKED")


def test_delta_binary_packed_int32_multipage(tmp_path):
    rng = random.Random(6)
    vals = [rng.randrange(-(2**31), 2**31) for _ in range(20000)]
    _enc_roundtrip(
        tmp_path, pa.array(vals, pa.int32()), "DELTA_BINARY_PACKED",
        data_page_size=2048, compression="snappy",
    )


def test_delta_binary_packed_extremes(tmp_path):
    # alternating int64 extremes force max-width miniblocks and wraparound
    vals = [0, 2**63 - 1, -(2**63), 2**63 - 1, -(2**63), 7, -7] * 50
    _enc_roundtrip(tmp_path, pa.array(vals, pa.int64()), "DELTA_BINARY_PACKED")


def test_delta_binary_packed_monotonic(tmp_path):
    # sorted input: min_delta dominates, many zero-width miniblocks
    _enc_roundtrip(tmp_path, pa.array(range(10000), pa.int64()), "DELTA_BINARY_PACKED")


def test_delta_length_byte_array(tmp_path):
    rng = random.Random(7)
    vals = [
        "".join(rng.choices("abcdef", k=rng.randrange(0, 40))) if rng.random() > 0.1 else None
        for _ in range(3000)
    ]
    _enc_roundtrip(tmp_path, pa.array(vals, pa.string()), "DELTA_LENGTH_BYTE_ARRAY")


def test_delta_byte_array_shared_prefixes(tmp_path):
    rng = random.Random(8)
    vals = sorted(
        f"user/{rng.randrange(100)}/items/{rng.randrange(10000)}" for _ in range(4000)
    )
    _enc_roundtrip(tmp_path, pa.array(vals, pa.string()), "DELTA_BYTE_ARRAY", compression="gzip")


def test_byte_stream_split_float_double(tmp_path):
    rng = random.Random(9)
    fv = [rng.random() * 1e3 if rng.random() > 0.1 else None for _ in range(3000)]
    dv = [rng.random() * 1e9 if rng.random() > 0.1 else None for _ in range(3000)]
    _enc_roundtrip(tmp_path, pa.array(fv, pa.float32()), "BYTE_STREAM_SPLIT")
    _enc_roundtrip(tmp_path, pa.array(dv, pa.float64()), "BYTE_STREAM_SPLIT", compression="snappy")


def test_v2_default_delta_encodings(tmp_path):
    # data_page_version 2.0 + no dictionary: arrow picks DELTA encodings
    # on its own — decode must handle whatever it wrote
    table = _sample_table(3000, seed=11)
    p = str(tmp_path / "v2.parquet")
    pq.write_table(table, p, use_dictionary=False, data_page_version="2.0", compression="snappy")
    meta = pm.read_file_meta(p)
    got = pm.read_row_group(p, meta, 0, list(table.schema.names))
    exp = _expected(table)
    for c in exp:
        assert got[c] == exp[c], c


def test_delta_truncation_refuses(tmp_path):
    vals = list(range(1000))
    p = _enc_roundtrip(tmp_path, pa.array(vals, pa.int64()), "DELTA_BINARY_PACKED")
    meta = pm.read_file_meta(p)
    cm = meta["row_groups"][0]["columns"][0]["meta_data"]
    start, end = pm._chunk_byte_range(cm)
    with open(p, "rb") as fh:
        fh.seek(start)
        chunk = fh.read(end - start)
    leaf = pm.schema_leaves(meta)[0]
    for cut in (len(chunk) // 4, len(chunk) // 2, len(chunk) - 3):
        with pytest.raises(pm.ParquetError):
            pm.decode_column_chunk(chunk[:cut], cm, leaf)


# ---------------------------------------------------------------------------
# refusal contracts
# ---------------------------------------------------------------------------


def test_refuse_zstd_pages(tmp_path):
    table = _sample_table(200)
    p = str(tmp_path / "z.parquet")
    pq.write_table(table, p, compression="zstd")
    meta = pm.read_file_meta(p)
    with pytest.raises(pm.ParquetError, match="ZSTD"):
        pm.read_row_group(p, meta, 0, ["i64"])


def test_refuse_delta_on_wrong_type(tmp_path):
    # DELTA_BINARY_PACKED is integer-only; a forged encoding id on a
    # double column must refuse, not mis-decode
    table = pa.table({"x": pa.array(range(100), pa.int64())})
    p = str(tmp_path / "d.parquet")
    pq.write_table(
        table, p, use_dictionary=False, column_encoding={"x": "DELTA_BINARY_PACKED"},
        compression="none",
    )
    meta = pm.read_file_meta(p)
    leaf = pm.schema_leaves(meta)[0]
    leaf.physical_type = "DOUBLE"  # forge the type
    cm = meta["row_groups"][0]["columns"][0]["meta_data"]
    start, end = pm._chunk_byte_range(cm)
    with open(p, "rb") as fh:
        fh.seek(start)
        chunk = fh.read(end - start)
    with pytest.raises(pm.ParquetError, match="non-integer"):
        pm.decode_column_chunk(chunk, cm, leaf)


def test_refuse_nested_decode():
    p = f"{SF}/embeddings.parquet"
    meta = pm.read_file_meta(p)
    leaf_path = [lf.path for lf in pm.schema_leaves(meta) if lf.max_rep_level > 0][0]
    with pytest.raises(pm.ParquetError, match="repeated"):
        pm.read_row_group(p, meta, 0, [leaf_path])


def test_refuse_bad_magic(tmp_path):
    p = str(tmp_path / "bad.parquet")
    with open(p, "wb") as fh:
        fh.write(b"PAR1" + b"x" * 40 + struct.pack("<I", 10) + b"NOPE")
    with pytest.raises(pm.ParquetError, match="magic"):
        pm.read_file_meta(p)


def test_refuse_encrypted_magic(tmp_path):
    p = str(tmp_path / "enc.parquet")
    with open(p, "wb") as fh:
        fh.write(b"PAR1" + b"x" * 40 + struct.pack("<I", 10) + b"PARE")
    with pytest.raises(pm.ParquetError, match="encrypted"):
        pm.read_file_meta(p)


def test_refuse_footer_overrun(tmp_path):
    p = str(tmp_path / "o.parquet")
    with open(p, "wb") as fh:
        fh.write(b"PAR1" + b"x" * 20 + struct.pack("<I", 9999) + b"PAR1")
    with pytest.raises(pm.ParquetError, match="overruns"):
        pm.read_file_meta(p)


def test_refuse_unknown_column():
    p = f"{SF}/region.parquet"
    meta = pm.read_file_meta(p)
    with pytest.raises(pm.ParquetError, match="no column"):
        pm.read_row_group(p, meta, 0, ["nope"])


def test_footer_truncation_fuzz(tmp_path):
    """Any truncation of the footer blob parses to an error, never to a
    silently-wrong FileMetaData."""
    p = f"{SF}/nation.parquet"
    with open(p, "rb") as fh:
        data = fh.read()
    (mlen,) = struct.unpack("<I", data[-8:-4])
    blob = data[-8 - mlen : -8]
    rng = random.Random(1)
    cuts = {1, 2, mlen // 2, mlen - 1} | {rng.randrange(1, mlen) for _ in range(30)}
    for cut in cuts:
        with pytest.raises(pm.ParquetError):
            pm.parse_footer(blob[:cut])


def test_page_corruption_refuses(tmp_path):
    """Flipping the declared sizes inside a chunk raises, never mis-decodes."""
    table = _sample_table(500)
    p = str(tmp_path / "c.parquet")
    pq.write_table(table, p, compression="snappy")
    meta = pm.read_file_meta(p)
    cm = meta["row_groups"][0]["columns"][0]["meta_data"]
    cm2 = dict(cm, num_values=cm["num_values"] + 1)
    start, end = pm._chunk_byte_range(cm)
    with open(p, "rb") as fh:
        fh.seek(start)
        chunk = fh.read(end - start)
    leaf = [lf for lf in pm.schema_leaves(meta) if lf.path == "i64"][0]
    with pytest.raises(pm.ParquetError):
        pm.decode_column_chunk(chunk, cm2, leaf)
    with pytest.raises(pm.ParquetError):
        pm.decode_column_chunk(chunk[: len(chunk) // 2], cm, leaf)


def test_gzip_page_size_mismatch_refuses(tmp_path):
    table = pa.table({"x": pa.array(range(100), pa.int64())})
    p = str(tmp_path / "g.parquet")
    pq.write_table(table, p, compression="gzip")
    meta = pm.read_file_meta(p)
    cm = meta["row_groups"][0]["columns"][0]["meta_data"]
    start, end = pm._chunk_byte_range(cm)
    with open(p, "rb") as fh:
        fh.seek(start)
        chunk = fh.read(end - start)
    # re-decode with a wrong codec claim: snappy over gzip bytes must refuse
    leaf = pm.schema_leaves(meta)[0]
    with pytest.raises((pm.ParquetError, sm.SnappyError, zlib.error)):
        pm.decode_column_chunk(chunk, dict(cm, codec=1), leaf)


# ---------------------------------------------------------------------------
# writer: our bytes through four independent readers
# ---------------------------------------------------------------------------


def _writer_cols(n=3000, seed=13):
    rng = random.Random(seed)
    opt = lambda gen: [gen() if rng.random() > 0.1 else None for _ in range(n)]
    return {
        "k": opt(lambda: rng.randrange(-(2**50), 2**50)),
        "i": opt(lambda: rng.randrange(-(2**30), 2**30)),
        "d": opt(lambda: rng.random() * 1e6),
        "s": opt(lambda: "".join(rng.choices("abc defé", k=rng.randrange(0, 30)))),
        "b": opt(lambda: rng.random() > 0.5),
        "t": opt(lambda: rng.randrange(0, 2**44)),
    }


_WRITER_KINDS = {"k": "i64", "i": "i32", "d": "f64", "s": "str", "b": "bool", "t": "ts_us"}


@pytest.mark.parametrize("codec", ["snappy", "none", "gzip"])
def test_writer_pyarrow_and_self(tmp_path, codec):
    cols = _writer_cols()
    blob = pm.encode_parquet(cols, _WRITER_KINDS, codec=codec, rows_per_page=700)
    p = str(tmp_path / "w.parquet")
    with open(p, "wb") as fh:
        fh.write(blob)
    t = pq.read_table(p)
    for c in ("k", "i", "d", "s", "b"):
        assert t.column(c).to_pylist() == cols[c], c
    assert t.column("t").combine_chunks().cast(pa.int64()).to_pylist() == cols["t"]
    # typed stats visible to arrow (column_orders present)
    st = pq.ParquetFile(p).metadata.row_group(0).column(0).statistics
    kv = [v for v in cols["k"] if v is not None]
    assert st.has_min_max and st.min == min(kv) and st.max == max(kv)
    assert st.null_count == cols["k"].count(None)
    # our own reader closes the loop
    meta = pm.read_file_meta(p)
    got = pm.read_row_group(p, meta, 0, list(cols))
    for c in cols:
        assert got[c] == cols[c], c


def test_writer_duckdb(tmp_path):
    import duckdb

    cols = _writer_cols(seed=14)
    p = str(tmp_path / "w.parquet")
    with open(p, "wb") as fh:
        fh.write(pm.encode_parquet(cols, _WRITER_KINDS))
    con = duckdb.connect()
    r = con.execute(
        f"SELECT COUNT(*), SUM(k), MIN(typeof(t)), MIN(typeof(i)), COUNT(s)"
        f" FROM read_parquet('{p}')"
    ).fetchone()
    kv = [v for v in cols["k"] if v is not None]
    assert r[0] == len(cols["k"]) and r[1] == sum(kv)
    assert r[2] == "TIMESTAMP" and r[3] == "INTEGER"
    assert r[4] == sum(1 for v in cols["s"] if v is not None)


def test_writer_stats_prune_own_files(tmp_path):
    """Our pruning path consumes our own writer's stats."""
    p = str(tmp_path / "w.parquet")
    with open(p, "wb") as fh:
        fh.write(pm.encode_parquet({"x": [3, 1, 4, 1, 5]}, {"x": "i64"}))
    rows = pm.footer_meta_rows(p)
    assert rows[0]["stats_min"] == 1 and rows[0]["stats_max"] == 5
    assert rows[0]["stats_null_count"] == 0


def test_writer_refusals():
    with pytest.raises(pm.ParquetError, match="zero rows"):
        pm.encode_parquet({"x": []}, {"x": "i64"})
    with pytest.raises(pm.ParquetError, match="ragged"):
        pm.encode_parquet({"x": [1], "y": [1, 2]}, {"x": "i64", "y": "i64"})
    with pytest.raises(pm.ParquetError, match="unsupported writer kind"):
        pm.encode_parquet({"x": [1]}, {"x": "decimal"})
    with pytest.raises(pm.ParquetError, match="codec"):
        pm.encode_parquet({"x": [1]}, {"x": "i64"}, codec="zstd")
    with pytest.raises(pm.ParquetError, match="at least one column"):
        pm.encode_parquet({}, {})


def test_writer_all_null_and_unicode(tmp_path):
    cols = {"x": [None, None, None], "s": ["é中文", "", None]}
    p = str(tmp_path / "w.parquet")
    with open(p, "wb") as fh:
        fh.write(pm.encode_parquet(cols, {"x": "i64", "s": "str"}))
    t = pq.read_table(p)
    assert t.column("x").to_pylist() == cols["x"]
    assert t.column("s").to_pylist() == cols["s"]


def test_writer_dictionary_pages(tmp_path):
    import duckdb

    rng = random.Random(21)
    vocab = ["alpha", "beta", "gamma", "delta"]
    cols = {
        "cat": [rng.choice(vocab) if rng.random() > 0.1 else None for _ in range(8000)],
        "code": [rng.randrange(50) if rng.random() > 0.1 else None for _ in range(8000)],
        "uniq": list(range(8000)),  # all-distinct: must fall back to PLAIN
    }
    kinds = {"cat": "str", "code": "i64", "uniq": "i64"}
    p = str(tmp_path / "d.parquet")
    with open(p, "wb") as fh:
        fh.write(pm.encode_parquet(cols, kinds, rows_per_page=1000))
    md = pq.ParquetFile(p).metadata.row_group(0)
    encs = {md.column(i).path_in_schema: md.column(i).encodings for i in range(3)}
    assert "PLAIN_DICTIONARY" in encs["cat"] and "PLAIN_DICTIONARY" in encs["code"]
    assert "PLAIN_DICTIONARY" not in encs["uniq"]
    t = pq.read_table(p)
    for c in cols:
        assert t.column(c).to_pylist() == cols[c], c
    con = duckdb.connect()
    assert con.execute(f"SELECT COUNT(DISTINCT cat) FROM read_parquet('{p}')").fetchone()[0] == 4
    meta = pm.read_file_meta(p)
    got = pm.read_row_group(p, meta, 0, list(cols))
    assert got == cols
    # dictionary beats PLAIN on repetitive data
    plain = pm.encode_parquet(cols, kinds, use_dictionary=False, rows_per_page=1000)
    with open(p, "rb") as fh:
        assert len(fh.read()) < len(plain)


def test_writer_hybrid_def_levels_mixed_runs(tmp_path):
    # long null runs + scattered nulls: exercises RLE runs, boundary
    # top-up, and literal groups inside ONE def-level stream
    vals = ([None] * 40 + [1, None, 2, 3, None, None, 4] + [7] * 40 + [None, 9]) * 30
    p = str(tmp_path / "h.parquet")
    with open(p, "wb") as fh:
        fh.write(pm.encode_parquet({"x": vals}, {"x": "i64"}, rows_per_page=500))
    assert pq.read_table(p).column("x").to_pylist() == vals
    meta = pm.read_file_meta(p)
    assert pm.read_row_group(p, meta, 0, ["x"])["x"] == vals


def test_page_index_pinned_against_arrow(tmp_path):
    """Arrow-written ColumnIndex/OffsetIndex vs our own page decode: the
    index was computed by arrow's writer, the page slices by our reader —
    agreement pins both."""
    rng = random.Random(2)
    vals = [rng.randrange(-(10**9), 10**9) if rng.random() > 0.1 else None for _ in range(20000)]
    txt = ["".join(rng.choices("abcdef", k=8)) if rng.random() > 0.1 else None for _ in range(20000)]
    t = pa.table({"x": pa.array(vals, pa.int64()), "s": pa.array(txt, pa.string())})
    p = str(tmp_path / "pi.parquet")
    pq.write_table(t, p, write_page_index=True, data_page_size=4096, compression="snappy")
    meta = pm.read_file_meta(p)
    decoded = pm.read_row_group(p, meta, 0, ["x", "s"])
    for col in ("x", "s"):
        pages = pm.read_page_index(p, meta, 0, col)
        assert len(pages) > 3
        for pg in pages:
            sl = decoded[col][pg["first_row_index"] : pg["last_row_index"] + 1]
            present = [v for v in sl if v is not None]
            assert pg["min"] == min(present) and pg["max"] == max(present)
            assert pg["null_count"] == sl.count(None)


def test_page_index_roundtrip_own_writer(tmp_path):
    rng = random.Random(4)
    cols = {
        "k": sorted(rng.randrange(10**9) for _ in range(10000)),
        "s": ["".join(rng.choices("abcdef", k=6)) if rng.random() > 0.1 else None for _ in range(10000)],
    }
    p = str(tmp_path / "wpi.parquet")
    with open(p, "wb") as fh:
        fh.write(pm.encode_parquet(cols, {"k": "i64", "s": "str"}, rows_per_page=1000))
    meta = pm.read_file_meta(p)
    dec = pm.read_row_group(p, meta, 0, list(cols))
    for col in cols:
        pages = pm.read_page_index(p, meta, 0, col)
        assert len(pages) == 10
        for pg in pages:
            sl = dec[col][pg["first_row_index"] : pg["last_row_index"] + 1]
            present = [v for v in sl if v is not None]
            assert pg["min"] == min(present) and pg["max"] == max(present)
            assert pg["null_count"] == sl.count(None)
    # sorted int column advertises ASCENDING boundary order
    assert pm.read_page_index(p, meta, 0, "k")[0]["boundary_order"] == 1
    # arrow still reads the file with the index-bearing footer fields
    assert pq.read_table(p).column("k").to_pylist() == cols["k"]


def test_page_index_absent_refuses(tmp_path):
    p = str(tmp_path / "no.parquet")
    with open(p, "wb") as fh:
        fh.write(pm.encode_parquet({"x": [1, 2]}, {"x": "i64"}, write_page_index=False))
    meta = pm.read_file_meta(p)
    with pytest.raises(pm.ParquetError, match="no page index"):
        pm.read_page_index(p, meta, 0, "x")


def test_page_index_nan_column_dropped(tmp_path):
    p = str(tmp_path / "nan.parquet")
    cols = {"d": [1.0, float("nan"), 3.0], "k": [1, 2, 3]}
    with open(p, "wb") as fh:
        fh.write(pm.encode_parquet(cols, {"d": "f64", "k": "i64"}))
    meta = pm.read_file_meta(p)
    with pytest.raises(pm.ParquetError, match="no page index"):
        pm.read_page_index(p, meta, 0, "d")  # NaN bounds would lie
    assert pm.read_page_index(p, meta, 0, "k")[0]["min"] == 1  # others keep theirs


def test_write_parquet_grouped(spark, tmp_path):
    out = str(tmp_path / "grp")
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", (F_col("o_orderkey") % 3).alias("g")
    )
    man = pm.write_parquet_grouped(
        orders, out, {"o_orderkey": "i64", "o_custkey": "i64"}, "g", ["o_orderkey"],
        rows_per_page=100,
    ).toPandas()
    assert sorted(man.grp) == ["0", "1", "2"]
    files = sorted(glob.glob(f"{out}/g=*.parquet"))
    assert len(files) == 3
    total = 0
    for f in files:
        meta = pm.read_file_meta(f)
        ks = pm.read_row_group(f, meta, 0, ["o_orderkey"])["o_orderkey"]
        assert ks == sorted(ks)  # sorted within group
        total += len(ks)
        pages = pm.read_page_index(f, meta, 0, "o_orderkey")
        assert pages[0]["boundary_order"] == 1
    assert total == orders.count()


def test_write_parquet_corpus_spark_roundtrip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "corpus")
    kinds = {"doc_id": "i64", "text": "str", "lang": "str", "source": "str", "n_chars": "i64"}
    man = pm.write_parquet_corpus(docs.repartition(4), out, kinds).toPandas()
    assert man.n_rows.sum() == docs.count()
    assert len(man) <= 4
    back = spark.read.parquet(out)
    a = sorted(back.collect(), key=lambda r: r.doc_id)
    b = sorted(docs.collect(), key=lambda r: r.doc_id)
    assert a == b


def test_write_parquet_corpus_missing_kind(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(pm.ParquetError, match="no writer kind"):
        pm.write_parquet_corpus(docs, "/tmp/never", {"doc_id": "i64"})


# ---------------------------------------------------------------------------
# Spark-facing operators
# ---------------------------------------------------------------------------


def test_footer_meta_scan_spark(spark):
    df = pm.footer_meta_scan(spark, TABLES).toPandas()
    md = pq.ParquetFile(f"{SF}/lineitem.parquet").metadata
    li = df[df.file_name.str.endswith("lineitem.parquet")]
    assert len(li) == md.num_row_groups * md.row_group(0).num_columns
    row = li[li.path_in_schema == "l_orderkey"].iloc[0]
    c = md.row_group(0).column(0)
    assert row.num_values == c.num_values
    assert row.compression == c.compression
    assert row.stats_null_count == c.statistics.null_count


def test_raw_scan_spark_matches_builtin(spark):
    p = f"{SF}/orders.parquet"
    cols = ["o_orderkey", "o_totalprice", "o_orderstatus", "o_orderdate"]
    ours = pm.raw_scan(spark, p, cols).toPandas().sort_values("o_orderkey").reset_index(drop=True)
    ref = (
        spark.read.parquet(p)
        .select(*cols)
        .toPandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    assert ours["o_orderkey"].tolist() == ref["o_orderkey"].tolist()
    assert ours["o_totalprice"].tolist() == ref["o_totalprice"].tolist()
    assert ours["o_orderstatus"].tolist() == ref["o_orderstatus"].tolist()
    assert ours["o_orderdate"].astype("datetime64[us]").tolist() == ref["o_orderdate"].astype("datetime64[us]").tolist()


def test_raw_scan_multi_row_group(spark, tmp_path):
    table = _sample_table(4000, with_nulls=True, seed=3)
    p = str(tmp_path / "m.parquet")
    pq.write_table(table, p, compression="snappy", row_group_size=512)
    df = pm.raw_scan(spark, p, ["i64", "txt"]).toPandas()
    exp = table.to_pandas()
    assert sorted(df["i64"].dropna().tolist()) == sorted(exp["i64"].dropna().tolist())
    assert df["i64"].isna().sum() == exp["i64"].isna().sum()
    assert sorted(df["txt"].dropna().tolist()) == sorted(exp["txt"].dropna().tolist())


def test_int96_spark_default_timestamps(spark, tmp_path):
    """Spark writes INT96 timestamps by default; our decoder must read its
    own platform's default output. Pinned against Spark's reader."""
    out = str(tmp_path / "i96")
    # NTZ always writes INT64; the INT96 default applies to LTZ timestamps
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", F_col("ts").cast("timestamp").alias("ts")
    )
    assert spark.conf.get("spark.sql.parquet.outputTimestampType") == "INT96"
    ev.coalesce(1).write.parquet(out)
    f = glob.glob(f"{out}/part-*.parquet")[0]
    meta = pm.read_file_meta(f)
    leaf = {lf.path: lf for lf in pm.schema_leaves(meta)}["ts"]
    assert leaf.physical_type == "INT96"
    assert pm.duckdb_type_of(meta, "ts") == "TIMESTAMP"
    got = pm.read_row_group(f, meta, 0, ["event_id", "ts"])
    ref = {r.event_id: r.ts for r in spark.read.parquet(out).collect()}
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    for eid, us in zip(got["event_id"], got["ts"]):
        assert us == int((ref[eid] - epoch).total_seconds() * 1e6) or us == (
            (ref[eid] - epoch) // datetime.timedelta(microseconds=1)
        )
    # INT96 legacy stats present as absent, never as a lying bound
    rows = [r for r in pm.footer_meta_rows(f) if r["path_in_schema"] == "ts"]
    assert rows[0]["stats_min"] is None and rows[0]["stats_max"] is None
    # distributed raw_scan path with the timestamp presentation
    df = pm.raw_scan(spark, f, ["event_id", "ts"]).toPandas()
    assert len(df) == len(got["event_id"]) and str(df.dtypes["ts"]).startswith("datetime64")


# ---------------------------------------------------------------------------
# lz4 (block format) — the second page codec
# ---------------------------------------------------------------------------


def test_lz4_pinned_both_directions():
    from vectorflow_spark.operators import lz4mini as lz

    codec = pa.Codec("lz4_raw")
    rng = random.Random(11)
    seed = os.urandom(70000)
    cases = [
        b"", b"a", b"short", b"a" * 1000, b"ab" * 50000, os.urandom(80000),
        bytes(rng.choices(b"abcdef\n ", k=150000)),
        seed + seed,  # long-range repeat beyond the 64 KiB offset window
    ]
    for c in cases:
        nat = bytes(codec.compress(c))
        assert lz.decompress(nat, len(c)) == c
        ours = lz.compress(c)
        assert bytes(codec.decompress(ours, decompressed_size=len(c))) == c
        assert lz.decompress(ours, len(c)) == c


def test_lz4_refusals():
    from vectorflow_spark.operators import lz4mini as lz

    with pytest.raises(lz.Lz4Error):
        lz.decompress(bytes([0x10]))  # 1 literal declared, none present
    with pytest.raises(lz.Lz4Error):  # zero offset
        lz.decompress(bytes([0x12, 65, 0, 0]), 20)
    with pytest.raises(lz.Lz4Error):  # offset beyond produced output
        lz.decompress(bytes([0x12, 65, 9, 0]), 20)
    with pytest.raises(lz.Lz4Error):  # declared-size mismatch
        lz.decompress(bytes([0x20, 65, 66]), 3)
    ok = pa.Codec("lz4_raw").compress(b"hello world, hello world, hello")
    with pytest.raises(lz.Lz4Error):  # truncation fuzz
        lz.decompress(bytes(ok)[: len(bytes(ok)) // 2], 31)


def test_lz4_parquet_pages_both_ways(tmp_path):
    # arrow-written LZ4_RAW pages through OUR reader
    table = _sample_table(4000, seed=19)
    p = str(tmp_path / "a.parquet")
    pq.write_table(table, p, compression="lz4")
    meta = pm.read_file_meta(p)
    got = pm.read_row_group(p, meta, 0, list(table.schema.names))
    assert got == _expected(table)
    # OUR LZ4-written file through arrow + duckdb + self
    import duckdb

    cols = _writer_cols(seed=20)
    p2 = str(tmp_path / "b.parquet")
    with open(p2, "wb") as fh:
        fh.write(pm.encode_parquet(cols, _WRITER_KINDS, codec="lz4", rows_per_page=700))
    t = pq.read_table(p2)
    for c in ("k", "i", "s", "b"):
        assert t.column(c).to_pylist() == cols[c], c
    kv = [v for v in cols["k"] if v is not None]
    assert duckdb.connect().execute(
        f"SELECT SUM(k) FROM read_parquet('{p2}')"
    ).fetchone()[0] == sum(kv)
    meta2 = pm.read_file_meta(p2)
    assert pm.footer_meta_rows(p2)[0]["compression"] == "LZ4_RAW"
    assert pm.read_row_group(p2, meta2, 0, list(cols)) == cols


def test_page_crc_verified_and_written(tmp_path):
    # arrow-written checksummed pages decode; a flipped body byte refuses
    table = _sample_table(2000, seed=23)
    p = str(tmp_path / "crc.parquet")
    pq.write_table(table, p, write_page_checksum=True, compression="snappy")
    meta = pm.read_file_meta(p)
    assert pm.read_row_group(p, meta, 0, ["i64"])["i64"] == table.column("i64").to_pylist()
    cm = meta["row_groups"][0]["columns"][0]["meta_data"]
    start, end = pm._chunk_byte_range(cm)
    blob = bytearray(open(p, "rb").read())
    blob[end - 3] ^= 0x40  # flip a byte inside the last page body
    p2 = str(tmp_path / "bad.parquet")
    open(p2, "wb").write(bytes(blob))
    meta2 = pm.read_file_meta(p2)
    leaf = pm.schema_leaves(meta2)[0]
    with open(p2, "rb") as fh:
        fh.seek(start)
        chunk = fh.read(end - start)
    with pytest.raises(pm.ParquetError, match="CRC"):
        pm.decode_column_chunk(chunk, cm, leaf)
    # our writer emits CRCs that pyarrow's verification accepts
    cols = {"x": list(range(5000)), "s": [f"v{i%7}" for i in range(5000)]}
    p3 = str(tmp_path / "ours.parquet")
    open(p3, "wb").write(pm.encode_parquet(cols, {"x": "i64", "s": "str"}))
    t = pq.read_table(p3, page_checksum_verification=True)
    assert t.column("x").to_pylist() == cols["x"]
    # and a corrupted body fails BOTH verifiers the same way
    blob3 = bytearray(open(p3, "rb").read())
    m3 = pm.read_file_meta(p3)
    cm3 = m3["row_groups"][0]["columns"][0]["meta_data"]
    s3, e3 = pm._chunk_byte_range(cm3)
    blob3[e3 - 2] ^= 0x10
    p4 = str(tmp_path / "ours_bad.parquet")
    open(p4, "wb").write(bytes(blob3))
    with pytest.raises(Exception):
        pq.read_table(p4, page_checksum_verification=True)
    with pytest.raises(pm.ParquetError, match="CRC"):
        pm.read_row_group(p4, pm.read_file_meta(p4), 0, ["x"])


def test_raw_scan_timestamp_units(tmp_path, spark):
    """Parsed TimeUnit union values are empty (None) structs — unit
    detection must test key presence. ms/ns columns were previously all
    presented as micros (1000x off)."""
    import pandas as pd

    base = 1_700_000_000  # seconds
    t = pa.table(
        {
            "ms": pa.array([base * 1000, base * 1000 + 1], pa.timestamp("ms")),
            "us": pa.array([base * 10**6, base * 10**6 + 1], pa.timestamp("us")),
            "ns": pa.array([base * 10**9 + 1, base * 10**9 + 999], pa.timestamp("ns")),  # sub-us truncates
        }
    )
    p = str(tmp_path / "tu.parquet")
    pq.write_table(t, p)
    df = pm.raw_scan(spark, p, ["ms", "us", "ns"]).toPandas()
    want = pd.Timestamp(base, unit="s")
    for c in ("ms", "us", "ns"):
        assert df[c].iloc[0] == want, (c, df[c].iloc[0])


def test_writer_sink_nullable_int_columns(spark, tmp_path):
    """Arrow->pandas widens nullable ints to float64; the sinks must
    coerce back before PLAIN-encoding (previously struct.error)."""
    rows = [(1, 10), (2, None), (3, 30)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = str(tmp_path / "nullable")
    man = pm.write_parquet_corpus(df.coalesce(1), out, {"k": "i64", "v": "i64"}).toPandas()
    assert man.n_rows.sum() == 3
    back = spark.read.parquet(out)
    got = {r.k: r.v for r in back.collect()}
    assert got == {1: 10, 2: None, 3: 30}
    assert dict(back.dtypes)["v"] == "bigint"


def test_deprecated_stats_fallback_numeric_only(tmp_path):
    """Legacy v1 min/max used signed-byte ordering: trust them for
    numeric physical types only; byte-array legacy bounds stay absent."""
    meta = pm.read_file_meta(f"{SF}/nation.parquet")
    cm = meta["row_groups"][0]["columns"][0]["meta_data"]  # n_nationkey INT32
    st = dict(cm["statistics"])
    forged = {
        "min_deprecated": st["min_value"],
        "max_deprecated": st["max_value"],
        "null_count": st.get("null_count"),
    }
    cm2 = dict(cm, statistics=forged)
    meta2 = dict(meta, row_groups=[{**meta["row_groups"][0], "columns": [
        {**meta["row_groups"][0]["columns"][0], "meta_data": cm2}]}])
    # numeric: fallback applies
    import unittest.mock as mock

    with mock.patch.object(pm, "read_file_meta", return_value=meta2):
        rows = pm.footer_meta_rows(f"{SF}/nation.parquet")
    assert rows[0]["stats_min"] is not None
    # byte-array: same shape must present as absent
    cm_s = meta["row_groups"][0]["columns"][1]["meta_data"]  # n_name VARCHAR
    st_s = dict(cm_s["statistics"])
    cm_s2 = dict(cm_s, statistics={
        "min_deprecated": st_s["min_value"].encode() if isinstance(st_s["min_value"], str) else st_s["min_value"],
        "max_deprecated": st_s["max_value"].encode() if isinstance(st_s["max_value"], str) else st_s["max_value"],
    })
    meta3 = dict(meta, row_groups=[{**meta["row_groups"][0], "columns": [
        {**meta["row_groups"][0]["columns"][1], "meta_data": cm_s2}]}])
    with mock.patch.object(pm, "read_file_meta", return_value=meta3):
        rows = pm.footer_meta_rows(f"{SF}/nation.parquet")
    assert rows[0]["stats_min"] is None and rows[0]["stats_max"] is None


def test_float_nan_voids_chunk_stats(tmp_path):
    """r10 ADVICE (medium): a NaN in an f64/f32 column must VOID the
    chunk-level min/max (NaN is unordered; Python min/max would emit
    position-dependent bounds external readers prune on), matching the
    page-index and ORC-writer rule. null_count survives."""
    nan = float("nan")
    p = str(tmp_path / "nan.parquet")
    with open(p, "wb") as fh:
        fh.write(
            pm.encode_parquet(
                {"x": [nan, -5.0, 3.0, None], "y": [1.0, 2.0, 3.0, 4.0]},
                {"x": "f64", "y": "f64"},
            )
        )
    rows = {r["path_in_schema"]: r for r in pm.footer_meta_rows(p)}
    assert rows["x"]["stats_min"] is None and rows["x"]["stats_max"] is None
    assert rows["x"]["stats_null_count"] == 1
    # NaN-free sibling keeps exact bounds
    assert rows["y"]["stats_min"] == 1.0 and rows["y"]["stats_max"] == 4.0
    # and pyarrow agrees the NaN column carries no bounds
    md = pq.ParquetFile(p).metadata.row_group(0)
    for i in range(md.num_columns):
        col = md.column(i)
        if col.path_in_schema == "x":
            assert not col.statistics.has_min_max


class TestDeltaWriter:
    """The WRITE side of the DELTA encodings (r11): encode_parquet's
    delta_columns emits DATA_PAGE_V2 pages with DELTA_BINARY_PACKED /
    DELTA_BYTE_ARRAY, pinned against pyarrow, DuckDB AND our own decoder
    (q_parquet_delta_roundtrip pins Spark's parquet-java on top)."""

    def _cols(self, n=5000):
        return (
            {
                "k": list(range(1000, 1000 + n)),
                "j": [((i * 2654435761) % 100003) - 50000 for i in range(n)],
                "s": sorted(f"key-{i % 997:05d}-{i:07d}" for i in range(n)),
                "maybe": [None if i % 7 == 0 else i * 3 for i in range(n)],
            },
            {"k": "i64", "j": "i64", "s": "str", "maybe": "i64"},
        )

    def _write(self, tmp_path, codec="snappy", rows_per_page=600):
        cols, kinds = self._cols()
        blob = pm.encode_parquet(
            cols, kinds, codec=codec,
            delta_columns=["k", "j", "s", "maybe"], rows_per_page=rows_per_page,
        )
        p = str(tmp_path / "delta.parquet")
        with open(p, "wb") as f:
            f.write(blob)
        return p, cols

    def test_own_decoder_roundtrip(self, tmp_path):
        p, cols = self._write(tmp_path)
        meta = pm.read_file_meta(p)
        got = pm.read_row_group(p, meta, 0, list(cols))
        for c in cols:
            assert got[c] == cols[c], c

    def test_pyarrow_roundtrip_and_encodings(self, tmp_path):
        import pyarrow.parquet as pq

        p, cols = self._write(tmp_path)
        t = pq.read_table(p)
        for c in cols:
            assert t.column(c).to_pylist() == cols[c], c
        md = pq.ParquetFile(p).metadata.row_group(0)
        by_name = {md.column(i).path_in_schema: md.column(i).encodings for i in range(4)}
        assert "DELTA_BINARY_PACKED" in by_name["k"]
        assert "DELTA_BYTE_ARRAY" in by_name["s"]

    def test_duckdb_roundtrip(self, tmp_path):
        import duckdb

        p, cols = self._write(tmp_path)
        rows = duckdb.sql(f"SELECT k, j, s, maybe FROM '{p}' ORDER BY k").fetchall()
        assert [r[0] for r in rows] == cols["k"]
        assert [r[1] for r in rows] == cols["j"]
        assert [r[2] for r in rows] == cols["s"]
        assert [r[3] for r in rows] == cols["maybe"]

    def test_uncompressed_v2_pages(self, tmp_path):
        import pyarrow.parquet as pq

        p, cols = self._write(tmp_path, codec="none")
        t = pq.read_table(p)
        for c in cols:
            assert t.column(c).to_pylist() == cols[c], c

    def test_sorted_key_size_win_vs_plain(self, tmp_path):
        cols, kinds = self._cols()
        delta = pm.encode_parquet(cols, kinds, delta_columns=list(cols), rows_per_page=600)
        plain = pm.encode_parquet(cols, kinds, use_dictionary=False, rows_per_page=600)
        assert len(delta) * 2 < len(plain), (len(delta), len(plain))

    def test_edge_pages(self, tmp_path):
        import pyarrow.parquet as pq

        # single row, all-null page, negative extremes, empty strings
        cols = {
            "a": [-(1 << 62), (1 << 62), None, 0, None],
            "s": ["", "", "ab", "abc", ""],
        }
        kinds = {"a": "i64", "s": "str"}
        blob = pm.encode_parquet(cols, kinds, delta_columns=["a", "s"], rows_per_page=2)
        p = str(tmp_path / "edge.parquet")
        with open(p, "wb") as f:
            f.write(blob)
        t = pq.read_table(p)
        assert t.column("a").to_pylist() == cols["a"]
        assert t.column("s").to_pylist() == cols["s"]
        meta = pm.read_file_meta(p)
        got = pm.read_row_group(p, meta, 0, ["a", "s"])
        assert got["a"] == cols["a"] and got["s"] == cols["s"]

    def test_refuses_float_delta(self):
        with pytest.raises(pm.ParquetError, match="DELTA"):
            pm.encode_parquet(
                {"f": [1.0, 2.0]}, {"f": "f64"}, delta_columns=["f"]
            )

    def test_encoder_decoder_property(self):
        # wrap-around deltas at int64 extremes through our own pair
        vals = [0, (1 << 63) - 1, -(1 << 63), 17, -17] * 60
        enc = pm._encode_delta_binary_packed(vals)
        dec, _ = pm._decode_delta_binary_packed(enc, 0, len(enc), 64)
        assert dec == vals

    def test_spark_parquet_java_reads_delta_output(self, spark, tmp_path):
        p, cols = self._write(tmp_path)
        df = spark.read.parquet(p).orderBy("k")
        rows = df.collect()
        assert [r.k for r in rows] == cols["k"]
        assert [r.s for r in rows] == cols["s"]
        assert [r.maybe for r in rows] == cols["maybe"]
