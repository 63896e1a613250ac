"""The _t schema cache returns the same schema and rows as a cold inferred
read, and invalidates when the file changes (keyed on mtime_ns + size)."""

import os
import shutil

from vectorflow_spark.queries import _core


def test_cached_read_matches_inferred(spark, sf_dir):
    _core._SCHEMA_CACHE.clear()
    _core._DF_CACHE.clear()
    cold = _core._t(spark, sf_dir, "orders")
    assert len(_core._SCHEMA_CACHE) == 1  # the cold read populated the cache
    warm = _core._t(spark, sf_dir, "orders")
    assert warm.schema == cold.schema
    a = sorted(map(tuple, cold.limit(50).collect()))
    b = sorted(map(tuple, warm.limit(50).collect()))
    assert a == b


def test_events_ts_cast_survives_cache(spark, sf_dir):
    _core._SCHEMA_CACHE.clear()
    _core._DF_CACHE.clear()
    cold = _core._t(spark, sf_dir, "events")
    warm = _core._t(spark, sf_dir, "events")
    assert dict(warm.dtypes)["ts"] == "bigint"
    assert warm.schema == cold.schema


def test_changed_file_is_not_served_stale(spark, sf_dir, tmp_path):
    _core._SCHEMA_CACHE.clear()
    _core._DF_CACHE.clear()
    d = tmp_path / "sfdir"
    d.mkdir()
    p = d / "nation.parquet"
    shutil.copy(os.path.join(sf_dir, "nation.parquet"), p)
    first = _core._t(spark, str(d), "nation")
    n1 = first.count()
    # replace the file with a DIFFERENT table (different schema + size)
    shutil.copy(os.path.join(sf_dir, "region.parquet"), p)
    os.utime(p, ns=(1, 1))
    second = _core._t(spark, str(d), "nation")
    assert second.schema != first.schema  # fresh inference, not the cache
    assert {f.name for f in second.schema.fields} >= {"r_regionkey"}
    assert n1 > 0


def test_directory_table_is_never_cached(spark, sf_dir, tmp_path):
    """Directory-of-part-files layout: an in-place part rewrite changes
    neither dir mtime nor size, so the cache must skip directories
    entirely (r11 ADVICE item 5)."""
    _core._SCHEMA_CACHE.clear()
    _core._DF_CACHE.clear()
    d = tmp_path / "sfdir2"
    d.mkdir()
    pdir = d / "nation.parquet"
    pdir.mkdir()
    shutil.copy(os.path.join(sf_dir, "nation.parquet"), pdir / "part-0.parquet")
    first = _core._t(spark, str(d), "nation")
    assert _core._SCHEMA_CACHE == {}  # directory: not cached
    assert first.count() > 0


def test_df_cache_serves_same_object_and_invalidates(spark, sf_dir, tmp_path):
    """r12: _t additionally caches the immutable base DataFrame object
    (plan handle only — rows still come from parquet at action time). The
    warm call returns the SAME object; a changed file invalidates it."""
    _core._SCHEMA_CACHE.clear()
    _core._DF_CACHE.clear()
    cold = _core._t(spark, sf_dir, "orders")
    warm = _core._t(spark, sf_dir, "orders")
    assert warm is cold
    # split=True must still return a FRESH repartition each call
    s1 = _core._t(spark, sf_dir, "orders", split=True)
    assert s1 is not cold
    # invalidation: replacing the file changes (mtime_ns, size) -> new df
    d = tmp_path / "sfdir3"
    d.mkdir()
    p = d / "nation.parquet"
    shutil.copy(os.path.join(sf_dir, "nation.parquet"), p)
    first = _core._t(spark, str(d), "nation")
    shutil.copy(os.path.join(sf_dir, "region.parquet"), p)
    os.utime(p, ns=(1, 1))
    second = _core._t(spark, str(d), "nation")
    assert second is not first
    assert second.schema != first.schema
