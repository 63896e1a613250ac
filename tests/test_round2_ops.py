"""Round-2 operators: SimHash Hamming pairing, incremental ingest dedup,
BPE token stats on Spark, and corpus-rarity signals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorflow_spark.functions.bpe import BPETokenizer, train_ranks
from vectorflow_spark.operators.dedup import (
    incremental_dedup,
    lsh_band_buckets,
    minhash_signatures,
    simhash_candidate_pairs,
    simhash_expr_pipeline,
)
from vectorflow_spark.operators.textstats import bpe_token_stats, rare_token_stats


def test_simhash_pairs_exact_vs_bruteforce(spark, sf_dir):
    """Banded pairing must equal all-pairs hamming<=3 exactly (pigeonhole:
    3 differing bits cannot touch all 4 bands)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(40)
    )
    got = {
        (r.a, r.b, r.hamming)
        for r in simhash_candidate_pairs(docs, n_bands=4, max_hamming=3).collect()
    }
    fps = {r.doc_id: r.simhash for r in simhash_expr_pipeline(docs).collect()}
    ids = sorted(fps)
    want = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    assert got == want


def test_simhash_pairs_identical_docs_hamming_zero(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely unrelated legal boilerplate paragraph here")],
        "doc_id long, text string",
    )
    rows = simhash_candidate_pairs(docs).collect()
    assert [(r.a, r.b, r.hamming) for r in rows] == [(1, 2, 0)]


def test_simhash_pairs_rejects_loose_bands():
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_candidate_pairs(None, n_bands=4, max_hamming=4)


def test_incremental_dedup_drops_collisions_keeps_fresh(spark):
    corpus = spark.createDataFrame(
        [(2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
         (4, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(11, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # exact dup
         (13, "zq xv jw kd pf mg bh ln rt cy unique gibberish corpus miss")],
        "doc_id long, text string",
    )
    idx = lsh_band_buckets(minhash_signatures(corpus))
    out = incremental_dedup(new, idx)
    assert [r.doc_id for r in out.collect()] == [13]


def test_bpe_token_stats_matches_pure_python(spark):
    tok = BPETokenizer(train_ranks(["the cat sat on the mat"] * 3, 32))
    texts = ["the cat sat", "on the mat the cat", ""]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in bpe_token_stats(docs, tok).collect()}
    for i, t in enumerate(texts):
        assert rows[i].n_bpe_tokens == len(tok.encode(t))
        assert rows[i].n_chars == len(t)
    assert rows[2].chars_per_token is None  # empty text: no division by zero


def test_rare_token_stats_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in rare_token_stats(docs, rare_below=3).collect()}
    # corpus freqs: a=3, b=1, c=1
    assert (rows[1].n_tokens, rows[1].n_rare) == (3, 1)
    assert rows[1].mean_token_freq == round((3 + 3 + 1) / 3, 9)
    assert (rows[2].n_tokens, rows[2].n_rare) == (2, 1)
    assert rows[2].rare_ratio == 0.5
    assert rows[2].mean_token_freq == 2.0


def test_rare_token_stats_drops_empty_docs(spark):
    docs = spark.createDataFrame([(1, "only doc"), (2, "   ")], "doc_id long, text string")
    out = rare_token_stats(docs)
    assert [r.doc_id for r in out.collect()] == [1]


def test_pq_seed_vectors_encode_to_their_own_slices(spark, sf_dir):
    """A codebook-seed vector's code in each subspace must select a
    centroid whose subvector equals its own slice (distance 0)."""
    from vectorflow_spark.operators.similarity import pq_codebooks, pq_encode

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    cbs = pq_codebooks(emb, m=8, ksub=16)
    seeds = emb.orderBy("vec_id").limit(16).collect()
    codes = {
        r.vec_id: list(r.codes)
        for r in pq_encode(emb, cbs).filter(
            F.col("vec_id").isin([s.vec_id for s in seeds])
        ).collect()
    }
    for r in seeds:
        full = [float(x) for x in r.embedding]
        for s in range(8):
            code = codes[r.vec_id][s]
            assert cbs[s][code][1] == full[s * 8 : (s + 1) * 8]


def test_pq_adc_matches_python_reference(spark, sf_dir):
    import math

    from vectorflow_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    cbs = pq_codebooks(emb, m=8, ksub=16)
    codes_df = pq_encode(emb, cbs)
    query = [1.0] * 64
    got = {r.vec_id: r.adc_dist for r in pq_adc_topk(codes_df, cbs, query, k=5).collect()}
    # python twin: same quantized distance table, same lookups
    dt = []
    for s, cb in enumerate(cbs):
        qs = query[s * 8 : (s + 1) * 8]
        row = []
        for _, c in cb:
            acc = 0.0
            for x, y in zip(qs, c):
                acc += (x - y) * (x - y)
            row.append(int(math.floor(acc * 10**9 + 0.5)))
        dt.append(row)
    codes = {r.vec_id: list(r.codes) for r in codes_df.collect()}
    want_all = {
        vid: sum(dt[s][c] for s, c in enumerate(cs)) / 10**9 for vid, cs in codes.items()
    }
    top5 = sorted(want_all.items(), key=lambda kv: (kv[1], kv[0]))[:5]
    assert got == dict(top5)


def test_bloom_no_false_negatives_and_prunes(spark, sf_dir):
    """The bloom-pruned semi join must equal the plain semi join exactly
    (no false negatives), and the prefilter alone must pass every true
    member while rejecting most non-members."""
    from vectorflow_spark.operators.bloom import (
        bloom_might_contain,
        build_bloom_bits,
        bloom_pruned_anti_join,
        bloom_pruned_semi_join,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    plain_semi = {
        r.o_orderkey
        for r in orders.join(
            cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left_semi"
        ).collect()
    }
    got_semi = {
        r.o_orderkey
        for r in bloom_pruned_semi_join(orders, cust, "o_custkey", "c_custkey").collect()
    }
    assert got_semi == plain_semi

    all_keys = {r.o_orderkey for r in orders.collect()}
    got_anti = {
        r.o_orderkey
        for r in bloom_pruned_anti_join(orders, cust, "o_custkey", "c_custkey").collect()
    }
    assert got_anti == all_keys - plain_semi

    bits = build_bloom_bits(cust, "c_custkey")
    passed = orders.filter(
        bloom_might_contain(bits, F.col("o_custkey"))
    ).count()
    n = orders.count()
    assert passed >= len(plain_semi)          # every member survives
    assert passed < n                         # and the filter actually prunes


def test_ivfpq_scans_only_probed_clusters(spark, sf_dir):
    """IVF+PQ must consider exactly the vectors assigned to the nprobe
    probed clusters — never the whole corpus — and every returned id must
    come from a probed cluster."""
    from vectorflow_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        ivfpq_search,
        pq_codebooks,
        probe_clusters,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    cents = ivf_centroids(emb, n_centroids=16)
    cbs = pq_codebooks(emb, m=8, ksub=16)
    query = [1.0] * 64
    probes = set(probe_clusters(cents, query, 4))
    assert len(probes) == 4

    assigned = {r.vec_id: r.cluster for r in ivf_assign(emb, cents).collect()}
    in_probed = {v for v, c in assigned.items() if c in probes}
    assert 0 < len(in_probed) < len(assigned)  # pruning is real

    got = [r.vec_id for r in ivfpq_search(emb, cents, cbs, query, k=10, nprobe=4).collect()]
    assert len(got) == 10
    assert set(got) <= in_probed


def test_interval_overlap_join_equals_bruteforce(spark):
    """Binned equi-join must equal the brute-force inequality join exactly
    — including pairs spanning many bins emitted exactly once."""
    from vectorflow_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0, 250), (2, 90, 110), (3, 500, 501), (4, 700, 1000)],
        "l_id long, i_start long, i_end long",
    )
    right = spark.createDataFrame(
        [(10, 240, 260), (11, 0, 1000), (12, 100, 100), (13, 502, 600)],
        "r_id long, s_start long, s_end long",
    )
    got = sorted(
        (r.l_id, r.r_id)
        for r in interval_overlap_join(
            left, right, "i_start", "i_end", "s_start", "s_end", bin_size=100
        ).collect()
    )
    brute = sorted(
        (r.l_id, r.r_id)
        for r in left.crossJoin(right)
        .filter((F.col("i_start") <= F.col("s_end")) & (F.col("s_start") <= F.col("i_end")))
        .collect()
    )
    assert got == brute
    assert len(got) == len(set(got))  # exactly-once emission


def test_zorder_write_localizes_both_dims(spark, sf_dir, tmp_path):
    """Z-order layout must give BOTH key columns narrow per-file ranges;
    a single-column sort only localizes its own column."""
    from vectorflow_spark.operators.layout import zorder_write

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("c0"),
        F.datediff(F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))).alias("c1"),
    )
    glob = o.agg(
        (F.max("c0") - F.min("c0")).alias("s0"), (F.max("c1") - F.min("c1")).alias("s1")
    ).first()

    zpath = str(tmp_path / "zorder")
    zorder_write(o, zpath, ["c0", "c1"], bits=16, num_files=16)

    spans = (
        spark.read.parquet(zpath)
        .withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(
            (F.max("c0") - F.min("c0")).alias("s0"),
            (F.max("c1") - F.min("c1")).alias("s1"),
        )
        .agg(F.avg("s0").alias("a0"), F.avg("s1").alias("a1"))
        .first()
    )
    assert spans.a0 < 0.7 * glob.s0
    assert spans.a1 < 0.7 * glob.s1


def test_random_projection_preserves_distances(spark, sf_dir):
    """JL property: squared pairwise distances survive 64->16 projection
    up to bounded distortion (loose bounds — k=16 is a coarse sketch)."""
    from vectorflow_spark.operators.similarity import random_projection

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") < 20)
    )
    orig = {r.vec_id: list(r.embedding) for r in emb.collect()}
    proj: dict[int, list[float]] = {}
    for r in random_projection(emb).collect():
        proj.setdefault(r.vec_id, [0.0] * 16)[r.dim_id] = r.value

    ids = sorted(orig)
    ratios = []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            do = sum((x - y) ** 2 for x, y in zip(orig[ids[a]], orig[ids[b]]))
            dp = sum((x - y) ** 2 for x, y in zip(proj[ids[a]], proj[ids[b]]))
            if do > 0:
                ratios.append(dp / do)
    mean = sum(ratios) / len(ratios)
    assert 0.7 < mean < 1.3           # unbiased on average
    assert all(0.2 < r < 3.0 for r in ratios)


def test_cms_never_undercounts(spark, sf_dir):
    """Count-min property: estimate >= true count for every key, and a
    sketch built from unioned halves equals the whole-data sketch
    (mergeability)."""
    from vectorflow_spark.operators.sketches import cms_build, cms_estimate

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id")
    sketch = cms_build(ev, "user_id")
    truth = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    keys = ev.select("user_id").distinct()
    est = {r.user_id: r.est for r in cms_estimate(sketch, keys, "user_id").collect()}
    assert set(est) == set(truth)
    assert all(est[k] >= truth[k] for k in truth)

    h1 = ev.filter(F.col("user_id") % 2 == 0)
    h2 = ev.filter(F.col("user_id") % 2 == 1)
    merged = (
        cms_build(h1, "user_id").unionByName(cms_build(h2, "user_id"))
        .groupBy("row_id", "col_id").agg(F.sum("cnt").alias("cnt"))
    )
    whole = {(r.row_id, r.col_id): r.cnt for r in sketch.collect()}
    got = {(r.row_id, r.col_id): r.cnt for r in merged.collect()}
    assert got == whole


def test_snapshot_diff_classifies(spark):
    from vectorflow_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (3, "c", 30.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    got = {r.k: r.change for r in snapshot_diff(old, new, ["k"]).collect()}
    # 1 unchanged (absent), 2 changed (string), 3 changed (NULL -> value), 4 removed, 5 added
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}


def test_span_overlap_counts_equals_pair_join(spark):
    """The order-statistics overlap counter must match the materialized
    pair join exactly — including same-day vs cross-midnight windows, the
    double-count correction, and zero-overlap incidents being absent."""
    from pyspark.sql import functions as F

    from vectorflow_spark.operators.events import span_overlap_counts
    from vectorflow_spark.operators.joins import interval_overlap_join

    D = 1000  # toy "day"
    spans = spark.createDataFrame(
        [
            # (user, day, s_start, s_end)
            (1, 0, 100, 900),
            (1, 1, 1050, 1800),
            (2, 0, 400, 450),
            (3, 1, 1300, 1400),
            (4, 2, 2100, 2900),
        ],
        "user_id long, day_id long, s_start long, s_end long",
    )
    inc = spark.createDataFrame(
        [
            (10, 200, 350),    # same-day, overlaps u1 only
            (11, 880, 1100),   # cross-midnight: u1 both days (corrected), u3 no
            (12, 940, 990),    # same-day, overlaps nothing -> absent
            (13, 1350, 1990),  # same-day in day 1: u1, u3
            (14, 2950, 3050),  # cross-midnight with empty day 3: none... u4 s_end=2900 < 2950 -> absent
        ],
        "event_id long, i_start long, i_end long",
    )
    pairs = interval_overlap_join(
        inc, spans, "i_start", "i_end", "s_start", "s_end", bin_size=D
    )
    want = {
        r["event_id"]: (r["n_spans"], r["n_users"])
        for r in pairs.groupBy("event_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .collect()
    }
    got = {
        r["event_id"]: (r["n_spans"], r["n_users"])
        for r in span_overlap_counts(spans, inc, D).collect()
    }
    assert got == want
    assert got[11] == (2, 1)  # two spans, one user — the correction fired
    assert 12 not in got and 14 not in got


def test_sql_expr_paths_match_dsl_fallback(spark, monkeypatch):
    """r12: ivf_assign / pq_encode / random_projection compose their
    literal-folded expressions as ONE parsed SQL text; the py4j-built DSL
    form remains as the non-finite fallback. Both paths must produce
    bit-identical rows (same casts, same fold order)."""
    import vectorflow_spark.operators.similarity as sim

    emb = spark.range(0, 40).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 8), i -> CAST(((id + 1) * i % 17) - 8 AS FLOAT) / 4.0F)"
        " AS embedding",
    )
    cents = [(i, [((i + 2) * j % 7 - 3) / 3.0 for j in range(8)]) for i in range(4)]
    cbs = [
        [(c, [((s + c + 1) * j % 5 - 2) / 2.0 for j in range(4)]) for c in range(4)]
        for s in range(2)
    ]

    def run_all():
        a = sorted(map(tuple, sim.ivf_assign(emb, cents).select("vec_id", "cluster").collect()))
        p = sorted(map(tuple, sim.pq_encode(emb, cbs).collect()))
        r = sorted(map(tuple, sim.random_projection(emb, out_dim=3, in_dim=8).collect()))
        return a, p, r

    got_sql = run_all()
    monkeypatch.setattr(sim, "_const_vec_sql", lambda vals: None)
    monkeypatch.setattr(sim, "_dlit_sql", lambda v: None)
    got_dsl = run_all()
    assert got_sql == got_dsl
