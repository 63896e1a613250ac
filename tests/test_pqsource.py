"""vf_rawpq Python DataSource: byte-level decode behind spark.read.format,
with stats-based row-group pruning at planning time."""

from __future__ import annotations

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vectorflow_spark.sources import pqsource
from vectorflow_spark.sources.pqsource import VfRawPqReader

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rawpq(spark):
    pqsource.register(spark)
    return spark


def test_matches_native_reader(rawpq):
    df = rawpq.read.format("vf_rawpq").load(f"{SF}/orders.parquet")
    ref = rawpq.read.parquet(f"{SF}/orders.parquet").select(*df.columns)
    a = sorted(df.collect(), key=lambda r: r.o_orderkey)
    b = sorted(ref.collect(), key=lambda r: r.o_orderkey)
    assert a == b


def test_directory_load_and_filter(rawpq, tmp_path):
    rng_tables = []
    import random

    rng = random.Random(1)
    for part in range(4):
        vals = list(range(part * 1000, part * 1000 + 1000))
        rng.shuffle(vals)
        t = pa.table({"k": pa.array(vals, pa.int64()), "v": pa.array([f"s{v}" for v in vals])})
        pq.write_table(t, str(tmp_path / f"part-{part}.parquet"))
        rng_tables.append(t)
    df = rawpq.read.format("vf_rawpq").load(str(tmp_path))
    assert df.count() == 4000
    got = sorted(r.k for r in df.filter("k >= 2500 AND k < 2600").collect())
    assert got == list(range(2500, 2600))


def test_planning_prunes_row_groups(tmp_path):
    """The partition list must shrink when pushed ranges exclude row-group
    stats — the Python-source analog of parquet row-group skipping."""
    from pyspark.sql.datasource import EqualTo
    from pyspark.sql.types import StructType

    for part in range(4):
        vals = list(range(part * 1000, part * 1000 + 1000))
        t = pa.table({"k": pa.array(vals, pa.int64())})
        pq.write_table(t, str(tmp_path / f"part-{part}.parquet"), row_group_size=250)
    class _GreaterThanOrEqual:
        def __init__(self, attribute, value):
            self.attribute = attribute
            self.value = value
    GreaterThanOrEqual = type("GreaterThanOrEqual", (_GreaterThanOrEqual,), {})
    reader = VfRawPqReader({"path": str(tmp_path)}, StructType.fromDDL("k bigint"))
    assert len(reader.partitions()) == 16  # 4 files x 4 row groups
    reader2 = VfRawPqReader({"path": str(tmp_path)}, StructType.fromDDL("k bigint"))
    returned = list(reader2.pushFilters([GreaterThanOrEqual(("k",), 3600)]))
    assert len(returned) == 1  # advisory: every filter comes back to Spark
    parts = reader2.partitions()
    assert len(parts) == 2  # rows 3500-3749 (stats-overlap) + 3750-3999
    assert reader2.pruned == 14
    eq = VfRawPqReader({"path": str(tmp_path)}, StructType.fromDDL("k bigint"))
    list(eq.pushFilters([EqualTo(("k",), 1234)]))
    assert len(eq.partitions()) == 1


def test_pruning_is_superset_safe(rawpq, tmp_path):
    """End-to-end: pruned scan + Spark's re-applied filter == ground truth."""
    for part in range(4):
        vals = list(range(part * 1000, part * 1000 + 1000))
        t = pa.table({"k": pa.array(vals, pa.int64())})
        pq.write_table(t, str(tmp_path / f"p{part}.parquet"), row_group_size=250)
    df = rawpq.read.format("vf_rawpq").load(str(tmp_path)).filter("k >= 3600 AND k % 7 = 0")
    assert sorted(r.k for r in df.collect()) == [k for k in range(3600, 4000) if k % 7 == 0]


def test_refuses_nested_schema():
    src = pqsource.VfRawPqDataSource({"path": f"{SF}/embeddings.parquet"})
    with pytest.raises(Exception, match="nested"):
        src.schema()


def test_timestamp_column_roundtrip(rawpq):
    df = rawpq.read.format("vf_rawpq").load(f"{SF}/events.parquet").select("event_id", "ts")
    ref = rawpq.read.parquet(f"{SF}/events.parquet").select("event_id", "ts")
    a = {r.event_id: r.ts for r in df.collect()}
    b = {r.event_id: r.ts for r in ref.collect()}
    assert a == b


# ---------------------------------------------------------------------------
# vf_raworc — the ORC twin
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def raworc(spark):
    from vectorflow_spark.sources import orcsource

    orcsource.register(spark)
    return spark


def _orc_dir(tmp_path, n_files=4):
    import pyarrow.orc as orc

    for part in range(n_files):
        vals = list(range(part * 1000, part * 1000 + 1000))
        t = pa.table({"k": pa.array(vals, pa.int64()), "v": pa.array([f"s{v}" for v in vals])})
        orc.write_table(t, str(tmp_path / f"part-{part}.orc"), compression="zlib")
    return str(tmp_path)


def test_raworc_matches_native(raworc, tmp_path):
    d = _orc_dir(tmp_path)
    df = raworc.read.format("vf_raworc").load(d)
    ref = raworc.read.orc(d)
    assert sorted(r.k for r in df.collect()) == sorted(r.k for r in ref.collect())
    assert df.count() == 4000


def test_raworc_file_pruning(tmp_path):
    from pyspark.sql.types import StructType

    from vectorflow_spark.sources.orcsource import VfRawOrcReader

    d = _orc_dir(tmp_path)
    r = VfRawOrcReader({"path": d}, StructType.fromDDL("k bigint"))
    base = len(r.partitions())
    r2 = VfRawOrcReader({"path": d}, StructType.fromDDL("k bigint"))
    class GreaterThanOrEqual:
        def __init__(self, attribute, value):
            self.attribute = attribute
            self.value = value
    returned = list(r2.pushFilters([GreaterThanOrEqual(("k",), 3000)]))
    assert len(returned) == 1
    assert len(r2.partitions()) < base
    assert r2.pruned_files == 3  # files 0-2 entirely below the bound


def test_raworc_superset_safe(raworc, tmp_path):
    d = _orc_dir(tmp_path)
    got = sorted(
        r.k
        for r in raworc.read.format("vf_raworc")
        .load(d)
        .filter("k >= 2600 AND k % 11 = 0")
        .collect()
    )
    assert got == [k for k in range(2600, 4000) if k % 11 == 0]


def test_raworc_own_writer_files(raworc, tmp_path):
    from vectorflow_spark.sources import orcmini as om

    cols = {"k": list(range(500)), "s": [f"w{i%9}" for i in range(500)]}
    p = str(tmp_path / "ours.orc")
    with open(p, "wb") as fh:
        fh.write(om.encode_orc(cols, {"k": "i64", "s": "str"}))
    df = raworc.read.format("vf_raworc").load(p)
    assert sorted(r.k for r in df.collect()) == cols["k"]


def test_all_pruned_returns_empty_typed(rawpq, raworc, tmp_path):
    """A range excluding every file/row group must plan the sentinel empty
    partition, not crash."""
    import pyarrow.orc as orc

    t = pa.table({"k": pa.array(range(100), pa.int64())})
    pq.write_table(t, str(tmp_path / "a.parquet"))
    orc.write_table(t, str(tmp_path / "a.orc"))
    d1 = rawpq.read.format("vf_rawpq").load(str(tmp_path / "a.parquet")).filter("k > 10000")
    assert d1.count() == 0 and d1.schema[0].name == "k"
    d2 = raworc.read.format("vf_raworc").load(str(tmp_path / "a.orc")).filter("k > 10000")
    assert d2.count() == 0 and d2.schema[0].name == "k"


def test_partial_stats_do_not_break_planning(spark, tmp_path):
    """r10 ADVICE: a row group whose footer carries only ONE bound (or a
    NaN-voided pair, which our writer now emits for NaN floats) must be
    treated as prune-ineligible, not raise TypeError when a lower-bound
    filter is pushed."""
    from pyspark.sql.types import StructType

    from vectorflow_spark.sources import parquetmini as pm2
    from vectorflow_spark.sources.pqsource import VfRawPqReader

    nan = float("nan")
    with open(str(tmp_path / "a.parquet"), "wb") as fh:
        fh.write(pm2.encode_parquet({"x": [nan, 1.0, 2.0]}, {"x": "f64"}))

    class GreaterThan:
        def __init__(self, attribute, value):
            self.attribute = attribute
            self.value = value

    rd = VfRawPqReader({"path": str(tmp_path)}, StructType.fromDDL("x double"))
    list(rd.pushFilters([GreaterThan(("x",), 0.5)]))
    parts = rd.partitions()  # must not raise; NaN-voided stats can't prune
    assert len(parts) == 1 and rd.pruned == 0


def test_mixed_leaf_shape_refuses_at_plan_time(spark, tmp_path):
    """The docstring contract: a file whose leaf shape differs for the
    requested columns refuses in partitions(), not as a per-task error."""
    from pyspark.sql.types import StructType

    from vectorflow_spark.sources import parquetmini as pm2
    from vectorflow_spark.sources.pqsource import VfRawPqReader

    with open(str(tmp_path / "a.parquet"), "wb") as fh:
        fh.write(pm2.encode_parquet({"k": [1, 2]}, {"k": "i64"}))
    with open(str(tmp_path / "b.parquet"), "wb") as fh:
        fh.write(pm2.encode_parquet({"k": ["x", "y"]}, {"k": "str"}))
    rd = VfRawPqReader({"path": str(tmp_path)}, StructType.fromDDL("k bigint"))
    with pytest.raises(pm2.ParquetError, match="leaf shape"):
        rd.partitions()
