"""pagerank_quantized (operators/graph.py) invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorflow_spark.operators.graph import pagerank_quantized

M = 10**12


def _edges(spark, pairs):
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, ["src", "dst"])


def test_ring_is_uniform(spark):
    # undirected 5-ring: perfect symmetry -> identical rank, exactly
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)])
    r = pagerank_quantized(e, iterations=3).collect()
    vals = {row.r for row in r}
    assert len(r) == 5 and len(vals) == 1


def test_star_center_dominates(spark):
    e = _edges(spark, [(0, i) for i in range(1, 9)])
    r = {row.v: row.r for row in pagerank_quantized(e, iterations=3).collect()}
    assert r[0] > max(r[i] for i in range(1, 9)) * 3
    leaf_vals = {r[i] for i in range(1, 9)}
    assert len(leaf_vals) == 1  # leaves are symmetric


def test_mass_bounded_and_deterministic(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 2), (1, 3)])
    r1 = sorted(pagerank_quantized(e, iterations=3).collect())
    r2 = sorted(pagerank_quantized(e, iterations=3).collect())
    assert r1 == r2
    total = sum(row.r for row in r1)
    # integral DIV only truncates: mass never exceeds M, leaks a little
    assert total <= M
    assert total > M * 0.9


# --- kcore_peel ---


def _und(spark, pairs):
    return spark.createDataFrame(pairs, ["a", "b"])


def test_kcore_triangle_survives_tail_peels(spark):
    # triangle 0-1-2 plus a tail 2-3-4: the tail peels away under k=2,
    # and the peel must CASCADE (3 only drops after 4 does)
    from vectorflow_spark.operators.graph import kcore_peel

    e = _und(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)])
    got = {r.node: r.core_deg for r in kcore_peel(e, k=2, rounds=3).collect()}
    assert got == {0: 2, 1: 2, 2: 2}


def test_kcore_star_empties(spark):
    from vectorflow_spark.operators.graph import kcore_peel

    e = _und(spark, [(0, i) for i in range(1, 8)])
    assert kcore_peel(e, k=2, rounds=3).count() == 0


def test_kcore_k3_keeps_clique_drops_cycle(spark):
    from vectorflow_spark.operators.graph import kcore_peel

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    cycle = [(10, 11), (11, 12), (12, 13), (13, 10)]
    got = {r.node: r.core_deg for r in kcore_peel(_und(spark, k4 + cycle), k=3, rounds=3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_gate_is_at_fixpoint(spark, sf_dir):
    """The q_kcore_dedup gate runs 4 rounds; the result must already be
    the fixpoint — round 5 changes nothing at the driver sf."""
    from vectorflow_spark.operators.dedup import minhash_candidate_pairs
    from vectorflow_spark.operators.graph import kcore_peel

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(8)
    pairs = minhash_candidate_pairs(docs).select("a", "b").localCheckpoint()
    r4 = sorted(map(tuple, kcore_peel(pairs, k=3, rounds=4).collect()))
    r5 = sorted(map(tuple, kcore_peel(pairs, k=3, rounds=5).collect()))
    assert r4 == r5
    assert len(r4) > 0


def test_label_propagation_zero_iterations_is_identity(spark):
    # iterations=0 regressed to returning None in r11 (ADVICE item 1);
    # the contract is the identity label table over the src set.
    from vectorflow_spark.operators.graph import label_propagation

    e = _edges(spark, [(0, 1), (1, 2)])
    out = label_propagation(e, iterations=0)
    got = {(r.v, r.lbl) for r in out.collect()}
    assert got == {(0, 0), (1, 1), (2, 2)}
