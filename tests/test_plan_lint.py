"""Blanket plan-lint gate: EVERY registered query's physical plan is
checked for scale anti-patterns (vectorflow_spark/planlint.py) — no
CartesianProduct, no unbounded-broadcast nested-loop join, no
single-partition exchange / global sort / global window over a
non-aggregated input. tests/test_plans.py pins the *intended* shape of
~25 representative plans; this gate pins the *absence of incidents* for
all of them, so a new query (or an optimizer-version change) that
compiles to a scale-killer fails CI by name.

The lint is structural; plans whose safety rests on a statistical bound
the plan text cannot prove carry an ALLOWED entry documenting that bound.
An entry here is a reviewed design decision, not an escape hatch — each
finding code must be listed explicitly.
"""

from __future__ import annotations

import pytest

from vectorflow_spark.planlint import lint_plan

# query -> (allowed finding codes, documented bound making the plan safe)
ALLOWED: dict[str, tuple[set[str], str]] = {
    "q_knn_batch": (
        {"BNLJ_UNBOUNDED"},
        "broadcast side is the query batch (vec_id < 5 — k=5 vectors by "
        "construction); BNLJ IS the intended brute-force kNN baseline: "
        "O(n·k) dot products, zero shuffle of the corpus",
    ),
    "q_hard_negatives": (
        {"BNLJ_UNBOUNDED"},
        "broadcast side is the anchor batch (vec_id < 5); hard-negative "
        "mining scores corpus × k anchors, same bounded-k contract as "
        "q_knn_batch",
    ),
    "q_binary_hamming_topk": (
        {"BNLJ_UNBOUNDED"},
        "broadcast side is the query batch (vec_id < 4 — k codes by "
        "construction); BNLJ IS the binary-ANN candidate scan: O(n·k) "
        "bit_count(xor) folds, zero shuffle of the corpus — the "
        "q_knn_batch contract over 8-byte codes instead of 256-byte "
        "vectors",
    ),
    "q_binary_rerank": (
        {"BNLJ_UNBOUNDED"},
        "stage 1 is q_binary_hamming_topk's bounded scan (broadcast side "
        "= the vec_id < 3 query-code batch); stage 2's two broadcast "
        "sides are the top-24-per-query candidate list (WindowGroupLimit "
        "below the exchange) and the query-vector projection FILTERED to "
        "vec_id < 3 before the broadcast (r10 verdict item 1: the "
        "unfiltered form was a corpus-sized broadcast, now also caught "
        "structurally by OVERSIZED_BROADCAST) — the two-stage binary-ANN "
        "contract",
    ),
    "q_sq8_topk": (
        {"BNLJ_UNBOUNDED"},
        "broadcast side is the query batch (vec_id < 4 — k int8 code "
        "vectors by construction); BNLJ IS the SQ8 candidate scan: "
        "O(n·k) integer dot products + one double multiply per pair, "
        "zero shuffle of the corpus — the q_knn_batch contract over "
        "64-byte codes instead of 256-byte vectors",
    ),
    "q_maxsim_rerank": (
        {"BNLJ_UNBOUNDED"},
        "broadcast side is the query batch (vec_id < 4 — k multi-vector "
        "queries by construction); MaxSim rerank scores corpus × k "
        "queries with the corpus never shuffling, the q_knn_batch "
        "contract applied to late-interaction retrieval",
    ),
}


def _query_names():
    from vectorflow_spark.queries import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _query_names())
def test_plan_has_no_scale_antipatterns(spark, sf_dir, name):
    from vectorflow_spark.queries import QUERIES

    findings = set(lint_plan(QUERIES[name](spark, sf_dir)))
    allowed, _reason = ALLOWED.get(name, (set(), ""))
    assert findings <= allowed, (
        f"{name}: plan has scale anti-patterns {sorted(findings - allowed)} "
        f"(allowed here: {sorted(allowed) or 'none'}) — see "
        f"vectorflow_spark/planlint.py for what each code means"
    )


def test_allowlist_entries_still_needed(spark, sf_dir):
    """An ALLOWED entry whose query now lints clean is stale — remove it
    so the gate stays tight."""
    from vectorflow_spark.queries import QUERIES

    for name, (allowed, _reason) in ALLOWED.items():
        findings = set(lint_plan(QUERIES[name](spark, sf_dir)))
        assert findings & allowed, f"{name}: allow-list entry is stale ({allowed})"


def test_lint_catches_seeded_antipatterns(spark, sf_dir):
    """The gate must actually fire: seed each anti-pattern with a plan
    that exhibits it and assert the classifier reports it."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with_cross = spark.conf.get("spark.sql.crossJoin.enabled", "true")
    assert with_cross  # Spark 4 allows explicit crossJoin

    # global window over a raw table — the classic straggler
    w = Window.orderBy("doc_id")
    assert "GLOBAL_WINDOW_UNREDUCED" in lint_plan(
        docs.select("doc_id", F.row_number().over(w).alias("rn"))
    )

    # global sort of a non-aggregated input
    assert "GLOBAL_SORT_UNREDUCED" in lint_plan(docs.orderBy("doc_id"))

    # unbounded broadcast: force a nested-loop join whose build side is a
    # full table (no aggregate/limit below the broadcast)
    left = docs.select("doc_id")
    right = docs.select(F.col("doc_id").alias("other_id"))
    bnlj = left.join(
        F.broadcast(right), F.col("doc_id") < F.col("other_id"), "inner"
    )
    assert "BNLJ_UNBOUNDED" in lint_plan(bnlj)

    # and the clean counterparts stay clean
    assert lint_plan(docs.groupBy("lang").count().orderBy("lang")) == []
    assert lint_plan(docs.select("doc_id").limit(5).orderBy("doc_id")) == []


def test_lint_flags_oversized_broadcast(spark, sf_dir):
    """OVERSIZED_BROADCAST must fire on the r10 q_binary_rerank defect
    shape — broadcasting an UNFILTERED projection of the same relation
    the plan streams — and must stay silent for (a) a filtered build
    side, (b) an unfiltered broadcast of a *different* (dim) relation,
    and (c) an aggregated build side."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")

    # (defect) stream embeddings, broadcast the SAME table unfiltered
    qv = emb.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"))
    bad = emb.join(F.broadcast(qv), emb.vec_id == F.col("q_id"))
    assert "OVERSIZED_BROADCAST" in lint_plan(bad)

    # (a) the one-line fix: filter the build side first
    qv_f = qv.filter(F.col("q_id") < 3)
    good = emb.join(F.broadcast(qv_f), emb.vec_id == F.col("q_id"))
    assert "OVERSIZED_BROADCAST" not in lint_plan(good)

    # (b) an unfiltered small-dim broadcast against a different relation
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dim = docs.join(F.broadcast(nation), docs.doc_id % 25 == nation.n_nationkey)
    assert "OVERSIZED_BROADCAST" not in lint_plan(dim)

    # (c) an aggregated build side of the same relation is bounded
    agg = emb.groupBy((F.col("vec_id") % 8).alias("b")).count()
    ok = emb.join(F.broadcast(agg), emb.vec_id % 8 == F.col("b"))
    assert "OVERSIZED_BROADCAST" not in lint_plan(ok)


def test_lint_flags_row_at_a_time_python_udf(spark, sf_dir):
    """BatchEvalPython (pickled row-at-a-time UDF) must flag; the Arrow
    boundaries (ArrowEvalPython via pandas_udf, MapInPandas) must not."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    row_udf = F.udf(lambda s: len(s or ""), LongType(), useArrow=False)
    assert "PYTHON_ROW_UDF" in lint_plan(docs.select(row_udf("text").alias("n")))

    arrow_udf = F.pandas_udf(lambda s: s.str.len().astype("int64"), LongType())
    assert "PYTHON_ROW_UDF" not in lint_plan(docs.select(arrow_udf("text").alias("n")))

    def ident(batches):
        yield from batches

    assert "PYTHON_ROW_UDF" not in lint_plan(
        docs.select("doc_id").mapInPandas(ident, "doc_id long")
    )


def test_mapinpandas_no_longer_proves_bounded(spark, sf_dir):
    """A mapInPandas stage can EXPAND rows (read_warc: one row per record
    per file), so a global sort above one must still flag — MapInPandas
    was removed from BOUNDED_LEAVES."""

    def ident(batches):
        yield from batches

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expanded = docs.select("doc_id").mapInPandas(ident, "doc_id long")
    assert "GLOBAL_SORT_UNREDUCED" in lint_plan(expanded.orderBy("doc_id"))
