"""Temporal join operators (operators/joins.py) and rolling fingerprints."""

import pytest
from pyspark.sql import functions as F

from vectorflow_spark.operators.joins import anti_join, asof_join
from vectorflow_spark.operators.textstats import rolling_fingerprints


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, 100, "t1"), (1, 205, "t2"), (2, 50, "t3"), (3, 10, "t4")],
        "sym long, ts long, trade string",
    )
    quotes = spark.createDataFrame(
        [(1, 90, 1.0), (1, 100, 2.0), (1, 200, 3.0), (2, 60, 4.0)],
        "sym long, ts long, px double",
    )
    return trades, quotes


def test_asof_backward_picks_latest_at_or_before(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r["trade"]: (r["asof_ts"], r["asof_px"])
        for r in asof_join(trades, quotes, on="sym", right_cols=["px"]).collect()
    }
    assert out["t1"] == (100, 2.0)  # equal-ts quote matches
    assert out["t2"] == (200, 3.0)  # latest earlier, not first
    assert out["t3"] == (None, None)  # quote is later -> no match
    assert out["t4"] == (None, None)  # key with no quotes at all


def test_asof_keeps_all_left_rows_and_columns(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", right_cols=["px"])
    assert out.count() == trades.count()
    assert out.columns == ["sym", "ts", "trade", "asof_ts", "asof_px"]


def test_asof_forward_picks_earliest_at_or_after(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r["trade"]: (r["asof_ts"], r["asof_px"])
        for r in asof_join(
            trades, quotes, on="sym", right_cols=["px"], direction="forward"
        ).collect()
    }
    assert out["t1"] == (100, 2.0)  # equal-ts quote matches in both directions
    assert out["t2"] == (None, None)  # nothing after 205
    assert out["t3"] == (60, 4.0)  # the later quote now matches
    assert out["t4"] == (None, None)


def test_asof_tolerance_nulls_stale_matches(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r["trade"]: (r["asof_ts"], r["asof_px"])
        for r in asof_join(
            trades, quotes, on="sym", right_cols=["px"], tolerance=4
        ).collect()
    }
    assert out["t1"] == (100, 2.0)  # distance 0 <= 4
    assert out["t2"] == (None, None)  # nearest is 5 away -> too stale
    assert out["t3"] == (None, None)


def test_asof_right_ties_resolved_deterministically(spark):
    left = spark.createDataFrame([(1, 100)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 100, "a"), (1, 100, "b")], "k long, ts long, v string"
    )
    # pre-aggregated unique right side is the documented contract; verify
    # the raw-tie case still returns exactly one row
    out = asof_join(left, right, on="k", right_cols=["v"]).collect()
    assert len(out) == 1


def test_anti_join(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    right = spark.createDataFrame([(2, "x"), (2, "y")], "rk long, v string")
    got = sorted(r["k"] for r in anti_join(left, right, "k", "rk").collect())
    assert got == [1, 3]


def test_rolling_fingerprint_is_order_sensitive(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "epsilon delta gamma beta alpha")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fp_doc"] for r in rolling_fingerprints(docs).collect()}
    assert fps[1] != fps[2]


def test_rolling_fingerprint_deterministic_and_short_doc(spark):
    docs = spark.createDataFrame(
        [(1, "one two three"), (2, "one two three"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in rolling_fingerprints(docs, k=4).collect()}
    assert rows[1]["fp_doc"] == rows[2]["fp_doc"]
    # < k tokens: the min-kgram fingerprint degrades to the whole-doc hash
    assert rows[1]["fp_min_kgram"] == rows[1]["fp_doc"]
    # empty docs have no token sequence to fingerprint
    assert 3 not in rows


class TestCogroupedAsof:
    def _cmp(self, spark, trades_quotes, coarse=64, **kw):
        from vectorflow_spark.operators.joins import asof_join_cogrouped

        trades, quotes = trades_quotes
        a = sorted(map(tuple, asof_join(trades, quotes, "sym", **kw).collect()))
        b = sorted(
            map(
                tuple,
                asof_join_cogrouped(trades, quotes, "sym", coarse=coarse, **kw).collect(),
            )
        )
        assert a == b and a  # equivalence with the oracle-verified operator

    def test_backward_matches_window_form(self, spark, trades_quotes):
        self._cmp(spark, trades_quotes)

    def test_per_key_cogroup_matches_window_form(self, spark, trades_quotes):
        self._cmp(spark, trades_quotes, coarse=None)  # exact per-key cogroup

    def test_single_bucket_matches_window_form(self, spark, trades_quotes):
        self._cmp(spark, trades_quotes, coarse=1)  # all keys in one bucket

    def test_forward_matches_window_form(self, spark, trades_quotes):
        self._cmp(spark, trades_quotes, direction="forward")

    def test_tolerance_matches_window_form(self, spark, trades_quotes):
        self._cmp(spark, trades_quotes, tolerance=15)

    def test_integer_right_cols_null_on_no_match(self, spark):
        from vectorflow_spark.operators.joins import asof_join_cogrouped

        left = spark.createDataFrame([(1, 5, "x")], "k long, ts long, l string")
        right = spark.createDataFrame([(1, 50, 7)], "k long, ts long, n long")
        [row] = asof_join_cogrouped(left, right, "k").collect()
        assert row.asof_n is None  # Int64 interchange keeps the long schema


class TestSkewProfiledJoin:
    def _frames(self, spark):
        # key 1 is hot (60 rows), keys 2..9 are light (2 rows each)
        rows = [(1, i) for i in range(60)] + [(k, k * 100) for k in range(2, 10) for _ in range(2)]
        fact = spark.createDataFrame(rows, "k long, v long")
        dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 8)], "dk long, name string")
        return fact, dim

    def test_output_equals_plain_join(self, spark):
        from vectorflow_spark.operators.joins import skew_profiled_join

        fact, dim = self._frames(spark)
        got = skew_profiled_join(fact, dim, "k", "dk", heavy_threshold=10, num_salts=4)
        plain = fact.join(dim, fact.k == dim.dk)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))

    def test_left_join_preserves_unmatched_fact_rows(self, spark):
        from vectorflow_spark.operators.joins import skew_profiled_join

        fact, dim = self._frames(spark)
        got = skew_profiled_join(fact, dim, "k", "dk", heavy_threshold=10, num_salts=4, how="left")
        plain = fact.join(dim, fact.k == dim.dk, "left")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))
        # keys 8,9 have no dim match and must survive with nulls
        assert got.filter(F.col("name").isNull()).count() == 4

    def test_heavy_path_spreads_over_salts(self, spark):
        """The hot key's rows must actually land in several salt groups —
        the parallelism claim, not just result parity."""
        from vectorflow_spark.operators.joins import skew_profiled_join

        fact, dim = self._frames(spark)
        joined = skew_profiled_join(fact, dim, "k", "dk", heavy_threshold=10, num_salts=4)
        # re-derive the salt distribution the operator uses internally
        salted = fact.join(
            F.broadcast(spark.createDataFrame([(1,)], "_hk long")),
            fact.k == F.col("_hk"),
            "left_semi",
        ).withColumn(
            "_s",
            F.pmod(
                F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()), F.lit(4)
            ),
        )
        n_groups = salted.select("_s").distinct().count()
        assert n_groups >= 3  # 60 rows over 4 salts: all/most groups hit
        assert joined.count() == fact.join(dim, fact.k == dim.dk).count()

    def test_how_validated(self, spark):
        from vectorflow_spark.operators.joins import skew_profiled_join

        fact, dim = self._frames(spark)
        with pytest.raises(ValueError, match="inner/left"):
            skew_profiled_join(fact, dim, "k", "dk", how="full")

    def test_null_keys_routed_around_the_join(self, spark):
        """NULL fact keys — the literal null-ish-user skew — never match
        under SQL equality yet would all hash to ONE reducer; they must
        bypass the join: dropped for inner (like the plain join), kept
        with null dim columns for left."""
        from vectorflow_spark.operators.joins import skew_profiled_join

        rows = [(None, i) for i in range(50)] + [(1, 100), (2, 200)]
        fact = spark.createDataFrame(rows, "k long, v long")
        dim = spark.createDataFrame([(1, "d1")], "dk long, name string")
        inner = skew_profiled_join(fact, dim, "k", "dk", heavy_threshold=10)
        plain_inner = fact.join(dim, fact.k == dim.dk)
        assert sorted(map(tuple, inner.collect())) == sorted(map(tuple, plain_inner.collect()))
        left = skew_profiled_join(fact, dim, "k", "dk", heavy_threshold=10, how="left")
        plain_left = fact.join(dim, fact.k == dim.dk, "left")
        assert sorted(map(tuple, left.collect()), key=str) == sorted(
            map(tuple, plain_left.collect()), key=str
        )
        assert left.filter(F.col("k").isNull()).count() == 50

    def test_overlapping_column_names_refused(self, spark):
        """A shared fact/dim column name would let the left-join null
        path overwrite the FACT's column with NULL (withColumn on a
        duplicate name) — refuse up front instead of corrupting rows."""
        from vectorflow_spark.operators.joins import skew_profiled_join

        fact = spark.createDataFrame([(1, "f")], "k long, name string")
        dim = spark.createDataFrame([(1, "d")], "dk long, name string")
        with pytest.raises(ValueError, match="share column names.*name"):
            skew_profiled_join(fact, dim, "k", "dk")


def test_vacuum_versions_keeps_pointer_and_last_n(spark, tmp_path):
    from vectorflow_spark.sinks.writers import (
        read_latest_version,
        read_versioned,
        vacuum_versions,
        versioned_write,
    )

    root = str(tmp_path / "store")
    (tmp_path / "store").mkdir()
    for i in range(4):
        versioned_write(spark.range(i, i + 3).toDF("id"), root)
    assert read_latest_version(root) == 4
    removed = vacuum_versions(root, keep_last=2)
    assert removed == [1, 2]
    assert read_versioned(spark, root).count() == 3  # pointer still serves v4
    assert read_versioned(spark, root, version=3).count() == 3  # kept
    with pytest.raises(Exception):
        read_versioned(spark, root, version=1).count()  # vacuumed
    with pytest.raises(ValueError):
        vacuum_versions(root, keep_last=0)  # would otherwise keep everything
    assert read_versioned(spark, root, version=3).count() == 3  # untouched


def test_vacuum_wrong_prefix_refuses(spark, tmp_path):
    """A store laid out with a different directory prefix must make vacuum
    fail loudly BEFORE the manifest commit — not drop manifest entries
    while rmtree silently deletes nothing."""
    from vectorflow_spark.sinks.writers import (
        list_versions,
        vacuum_versions,
        versioned_write,
    )

    root = str(tmp_path / "store")
    (tmp_path / "store").mkdir()
    for i in range(4):
        versioned_write(spark.range(3).toDF("id"), root)
    import os

    for v in range(1, 5):  # relabel the layout as a version= store
        os.rename(f"{root}/v={v}", f"{root}/version={v}")
    with pytest.raises(ValueError, match="prefix"):
        vacuum_versions(root, keep_last=2)  # default prefix="v" mismatches
    assert list_versions(root) == [1, 2, 3, 4]  # manifest untouched
    removed = vacuum_versions(root, keep_last=2, prefix="version")
    assert removed == [1, 2]
    assert not os.path.isdir(f"{root}/version=1")
    assert os.path.isdir(f"{root}/version=3")


def test_versioned_write_refuses_concurrent_commit(spark, tmp_path):
    """Two writers racing from the same manifest: the second to commit
    must refuse rather than silently overwrite the first's committed
    version."""
    from vectorflow_spark.sinks.writers import read_versioned, versioned_write

    root = str(tmp_path / "store")
    (tmp_path / "store").mkdir()
    versioned_write(spark.range(3).toDF("id"), root)

    # Simulate the race with a df proxy whose .write access runs the
    # rival's full commit first — i.e. the rival lands version 2 between
    # our manifest read and our data write.
    class RaceDF:
        def __init__(self, df):
            self._df = df

        @property
        def write(self):
            versioned_write(spark.range(5).toDF("id"), root)
            return self._df.write

    with pytest.raises(RuntimeError, match="concurrent writer"):
        versioned_write(RaceDF(spark.range(7).toDF("id")), root)
    # the rival's committed data survives untouched
    assert read_versioned(spark, root, version=2).count() == 5


def test_versioned_merge_upsert_delete_timetravel(spark, tmp_path):
    """Delta-style MERGE on the manifest store: init from updates, then a
    merge that updates/deletes/inserts; the prior version still serves
    the pre-merge snapshot (time travel through copy-on-write)."""
    from vectorflow_spark.sinks.writers import read_versioned, versioned_merge

    root = str(tmp_path / "dim")
    (tmp_path / "dim").mkdir()
    init = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    ).withColumn("del", F.lit(False))
    assert versioned_merge(spark, root, init, ["k"], delete_col="del") == 1
    upd = spark.createDataFrame(
        [(2, "B", False), (3, "x", True), (4, "d", False)], "k long, v string, del boolean"
    )
    assert versioned_merge(spark, root, upd, ["k"], delete_col="del") == 2
    now = {r.k: r.v for r in read_versioned(spark, root).collect()}
    assert now == {1: "a", 2: "B", 4: "d"}  # updated, deleted, inserted
    before = {r.k: r.v for r in read_versioned(spark, root, version=1).collect()}
    assert before == {1: "a", 2: "b", 3: "c"}


def test_merge_upsert_requires_value_columns(spark):
    from vectorflow_spark.operators.diff import merge_upsert

    t = spark.createDataFrame([(1, "a")], "k long, v string")
    s = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="missing value columns"):
        merge_upsert(t, s, ["k"])


def test_manifest_commits_gate_visibility(spark, tmp_path):
    """The manifest is the source of truth: an orphan version directory
    from a crashed write is invisible to every reader and self-heals on
    the next write; legacy stores without a manifest still read via the
    glob fallback."""
    from vectorflow_spark.sinks.writers import (
        read_latest_version,
        read_versioned,
        versioned_write,
    )

    root = str(tmp_path / "store")
    (tmp_path / "store").mkdir()
    versioned_write(spark.range(0, 3).toDF("id"), root)
    versioned_write(spark.range(0, 5).toDF("id"), root)
    # simulate a crash AFTER the parquet write, BEFORE the manifest commit
    spark.range(0, 99).toDF("id").write.parquet(f"{root}/v=3")
    assert read_latest_version(root) == 2  # orphan not visible
    assert read_versioned(spark, root).count() == 5
    with pytest.raises(ValueError, match="not committed"):
        read_versioned(spark, root, version=3)
    # the next write claims v=3, overwriting the orphan
    assert versioned_write(spark.range(0, 7).toDF("id"), root) == 3
    assert read_versioned(spark, root, version=3).count() == 7
    # legacy store (no manifest): glob fallback still serves reads
    legacy = str(tmp_path / "legacy")
    spark.range(0, 4).toDF("id").write.parquet(f"{legacy}/v=1")
    from vectorflow_spark.sinks.writers import list_versions

    assert list_versions(legacy) == [1]
    assert read_versioned(spark, legacy, version=1).count() == 4
