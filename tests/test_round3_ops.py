"""Round-2 batch-B operators: funnel, gap-fill LOCF, SCD2 merge, triangle
count, equi-width histogram, word entropy, CMS heavy hitters, minhash
Jaccard estimates."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vectorflow_spark.operators.diff import scd2_apply
from vectorflow_spark.operators.events import funnel_conversion, gap_fill_locf
from vectorflow_spark.operators.graph import triangle_count
from vectorflow_spark.operators.rollup import width_bucket_histogram
from vectorflow_spark.operators.sketches import cms_heavy_hitters
from vectorflow_spark.operators.textstats import word_entropy


# --- funnel -----------------------------------------------------------------


def test_funnel_strict_order(spark):
    ev = spark.createDataFrame(
        [
            # u1 completes in order
            (1, 10, "signup"), (1, 20, "view"), (1, 30, "click"),
            # u2 clicks BEFORE viewing -> stops at view
            (2, 10, "signup"), (2, 30, "view"), (2, 20, "click"),
            # u3 never signs up -> counted nowhere
            (3, 10, "view"), (3, 20, "click"),
            # u4 signup only
            (4, 5, "signup"),
        ],
        "user_id long, ts long, event_type string",
    )
    got = {
        r.stage: r.n_users
        for r in funnel_conversion(ev, ["signup", "view", "click"]).collect()
    }
    assert got == {"signup": 3, "view": 2, "click": 1}


def test_funnel_equal_ts_not_counted(spark):
    """Strictly-after semantics: same-timestamp next-stage event does not
    convert."""
    ev = spark.createDataFrame(
        [(1, 10, "signup"), (1, 10, "view")],
        "user_id long, ts long, event_type string",
    )
    got = {r.stage: r.n_users for r in funnel_conversion(ev, ["signup", "view"]).collect()}
    assert got == {"signup": 1, "view": 0}


# --- gap fill ---------------------------------------------------------------


def test_gap_fill_locf_carries_and_flags(spark):
    ev = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 0, 2.0), ("a", 3, 5.0), ("b", 2, 7.0)],
        "event_type string, bucket long, value double",
    )
    out = gap_fill_locf(ev, F.col("bucket")).collect()
    rows = {(r.key, r.bucket_id): (r.filled_value, r.was_gap) for r in out}
    # dense spine 0..3 for both keys
    assert len(rows) == 8
    assert rows[("a", 0)] == (3.0, False)
    assert rows[("a", 1)] == (3.0, True)   # carried forward
    assert rows[("a", 2)] == (3.0, True)
    assert rows[("a", 3)] == (5.0, False)
    assert rows[("b", 0)] == (None, True)  # before first observation: NULL
    assert rows[("b", 2)] == (7.0, False)
    assert rows[("b", 3)] == (7.0, True)


# --- SCD2 -------------------------------------------------------------------


def test_scd2_apply_close_open_insert_unchanged(spark):
    cur = spark.createDataFrame(
        [
            (1, "A", "2020-01-01", None),          # will change -> close + open
            (2, "B", "2020-01-01", None),          # same value in updates -> untouched
            (3, "C", "2020-01-01", None),          # absent from updates -> untouched
            (1, "OLD", "2019-01-01", "2020-01-01"),  # closed history -> untouched
        ],
        "k long, seg string, valid_from string, valid_to string",
    ).select(
        "k", "seg",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    upd = spark.createDataFrame(
        [(1, "A2"), (2, "B"), (9, "NEW")], "k long, seg string"
    )
    out = scd2_apply(cur, upd, ["k"], ["seg"], "2021-06-01")
    rows = {(r.k, r.seg, str(r.valid_from)[:10], str(r.valid_to)[:10] if r.valid_to else None)
            for r in out.collect()}
    assert rows == {
        (1, "OLD", "2019-01-01", "2020-01-01"),
        (1, "A", "2020-01-01", "2021-06-01"),   # closed
        (1, "A2", "2021-06-01", None),          # new version
        (2, "B", "2020-01-01", None),           # unchanged
        (3, "C", "2020-01-01", None),           # unchanged
        (9, "NEW", "2021-06-01", None),         # insert
    }


def test_scd2_idempotent_reapply(spark):
    """Applying the same update batch twice changes nothing the second
    time (digest equality short-circuits)."""
    cur = spark.createDataFrame(
        [(1, "A", "2020-01-01", None)], "k long, seg string, valid_from string, valid_to string"
    ).select(
        "k", "seg",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    upd = spark.createDataFrame([(1, "A2")], "k long, seg string")
    once = scd2_apply(cur, upd, ["k"], ["seg"], "2021-06-01")
    twice = scd2_apply(once, upd, ["k"], ["seg"], "2022-06-01")
    assert sorted((r.k, r.seg, r.valid_to is None) for r in twice.collect()) == sorted(
        (r.k, r.seg, r.valid_to is None) for r in once.collect()
    )


# --- triangles --------------------------------------------------------------


def test_triangle_count_known_graph(spark):
    # K4 has 4 triangles; plus a pendant edge (no new triangle)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "a long, b long",
    )
    row = triangle_count(edges).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (5, 7, 4)


def test_triangle_count_no_triangles(spark):
    edges = spark.createDataFrame([(1, 2), (3, 4)], "a long, b long")
    row = triangle_count(edges).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (4, 2, 0)


def test_triangle_count_star_skew(spark):
    """A star (celebrity hub) has zero triangles; the degree orientation
    keeps the hub's out-degree at ~0 so no wedge explosion."""
    edges = spark.createDataFrame([(0, i) for i in range(1, 40)], "a long, b long")
    row = triangle_count(edges).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (40, 39, 0)


# --- histogram --------------------------------------------------------------


def test_width_bucket_histogram_clamps(spark):
    df = spark.createDataFrame([(x,) for x in [-5.0, 0.0, 9.9, 10.0, 25.0, 99.0, 150.0]], "v double")
    out = {r.bin: r.cnt for r in width_bucket_histogram(df, "v", 0.0, 100.0, 10).collect()}
    assert out[0] == 3   # -5 clamped, 0.0, 9.9
    assert out[1] == 1   # 10.0
    assert out[2] == 1   # 25.0
    assert out[9] == 2   # 99.0 and 150.0 clamped into top bin


# --- entropy ----------------------------------------------------------------


def test_word_entropy_values(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_tokens, r.entropy_bits) for r in word_entropy(docs).collect()}
    assert out[1] == (4, 0.0)                      # single token: zero entropy
    assert out[2] == (4, 2.0)                      # uniform over 4: log2(4)
    assert out[3][1] == round(1.0, 6)              # uniform over 2: 1 bit


def test_word_entropy_matches_math(spark):
    text = "x x x y y z"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = word_entropy(docs).collect()[0]
    n = 6
    want = -sum(c / n * math.log2(c / n) for c in (3, 2, 1))
    assert abs(row.entropy_bits - want) < 1e-6


# --- CMS heavy hitters ------------------------------------------------------


def test_cms_heavy_hitters_superset_of_truth(spark):
    rows = [(k,) for k in ["hot"] * 500 + ["warm"] * 120 + ["cold"] * 3 + ["tiny"] * 1]
    df = spark.createDataFrame(rows, "k string")
    hh = {r.k for r in cms_heavy_hitters(df, "k", threshold=100).collect()}
    # never-undercount: true heavy hitters are always present
    assert {"hot", "warm"} <= hh
    # sketch width 64 with 4 distinct keys: no collisions expected
    assert "tiny" not in hh


# --- streaming SCD2 ---------------------------------------------------------


def test_streaming_scd2_versions_and_history(spark, tmp_path):
    """Two update files -> two micro-batches: the dimension accumulates
    closed history rows; read_scd2 returns the latest version and can time
    -travel to the first."""
    import time

    from vectorflow_spark.streaming.pipeline import read_scd2, streaming_scd2

    src_dir = str(tmp_path / "updates")
    dim_dir = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, seg string, effective_ts timestamp"

    # batch 1: initial inserts
    spark.createDataFrame(
        [(1, "A", "2021-01-01"), (2, "B", "2021-01-01")],
        "k long, seg string, effective_ts string",
    ).select("k", "seg", F.col("effective_ts").cast("timestamp").alias("effective_ts")) \
        .coalesce(1).write.mode("append").parquet(src_dir)

    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = streaming_scd2(stream, dim_dir, ckpt, ["k"], ["seg"])
    q.awaitTermination(120)

    # batch 2: change k=1, insert k=3
    spark.createDataFrame(
        [(1, "A2", "2022-01-01"), (3, "C", "2022-01-01")],
        "k long, seg string, effective_ts string",
    ).select("k", "seg", F.col("effective_ts").cast("timestamp").alias("effective_ts")) \
        .coalesce(1).write.mode("append").parquet(src_dir)

    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = streaming_scd2(stream, dim_dir, ckpt, ["k"], ["seg"])
    q.awaitTermination(120)

    latest = {
        (r.k, r.seg, r.valid_to is None) for r in read_scd2(spark, dim_dir).collect()
    }
    assert latest == {
        (1, "A", False),   # closed at 2022-01-01
        (1, "A2", True),
        (2, "B", True),
        (3, "C", True),
    }
    first = {(r.k, r.seg) for r in read_scd2(spark, dim_dir, version=0).collect()}
    assert first == {(1, "A"), (2, "B")}
