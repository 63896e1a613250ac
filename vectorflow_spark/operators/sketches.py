"""Mergeable frequency sketches: count-min.

A count-min sketch is the scale answer to "how often does each of
billions of keys occur" when the key cardinality itself is too big to
materialize: a d x w grid of counters, each key incrementing one counter
per row (d hash functions), estimate = min over its d counters. Counters
only ever ADD, so the sketch is mergeable across partitions, days, and
corpora — the property exact histograms lose the moment two pipelines
must combine.

Spark-first construction: the sketch build IS a groupBy — explode each
key occurrence into its d (row, col) cells and sum per cell. Map-side
combine collapses each partition to at most d*w cell rows before the
shuffle, so the exchange is bounded by the SKETCH size, not the data
(the same reason a 100 TB build is one pass). Point estimates join the
queried keys against the d*w cell table (broadcast — the sketch is tiny
by construction).

Hashing is the repo's portable md5-substring construction
(dedup.shingle_hash_expr) with a per-row seed suffix, so every cell
value — and therefore every estimate — is integer-exact and reproducible
in ANSI SQL for the oracle. The count-min guarantee: estimates never
undercount, and overcount by more than 2N/w with probability at most
(1/2)^d.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cms_cell_expr",
    "cms_build",
    "cms_estimate",
    "cms_heavy_hitters",
    "kmv_hash_expr",
    "kmv_sketch",
    "kmv_distinct_estimate",
    "kmv_intersection_estimate",
    "hll_registers",
    "hll_estimate_from_registers",
    "hll_distinct_estimate",
    "log2_histogram",
    "histogram_quantiles",
]

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 64


def cms_cell_expr(key: Column, seed: int, width: int) -> Column:
    """Column index of ``key`` in sketch row ``seed``: 31-bit md5-substring
    hash of ``key || '|' || seed``, mod width. Same bits in DuckDB via
    ('0x' || substr(md5(...), 1, 7))::BIGINT % width."""
    salted = F.concat(key.cast("string"), F.lit(f"|{seed}"))
    h = F.conv(F.substring(F.md5(salted), 1, 7), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(width))


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build the sketch: (row_id, col_id, cnt) cell rows, one shuffle whose
    volume is min(d * distinct-keys-per-partition, d * w) per partition
    thanks to partial aggregation. Cells with zero hits are simply absent
    (estimates treat missing as 0)."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("row_id"),
                    cms_cell_expr(F.col(key_col), s, width).alias("col_id"),
                )
                for s in range(depth)
            ]
        )
    )
    return (
        df.select(cells.alias("c"))
        .groupBy(F.col("c.row_id").alias("row_id"), F.col("c.col_id").alias("col_id"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: explode each key
    into its d (row, col) addresses, broadcast-join the cell table, min
    over the d counters. Never undercounts."""
    addr = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("row_id"),
                    cms_cell_expr(F.col(key_col), s, width).alias("col_id"),
                )
                for s in range(depth)
            ]
        )
    )
    addressed = keys.select(key_col, addr.alias("a")).select(
        key_col, F.col("a.row_id").alias("row_id"), F.col("a.col_id").alias("col_id")
    )
    joined = addressed.join(F.broadcast(sketch), ["row_id", "col_id"], "left").fillna(
        0, subset=["cnt"]
    )
    return joined.groupBy(key_col).agg(F.min("cnt").alias("est"))


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Keys whose count-min ESTIMATE meets ``threshold`` — the sketch-side
    heavy-hitter report. Because estimates never undercount, this set is a
    SUPERSET of the true heavy hitters (no false negatives, bounded false
    positives: P[overcount > 2N/w] <= (1/2)^d per key); callers needing the
    exact set verify the survivors with one exact count over this usually
    tiny key list. Plan: sketch build (sketch-sized shuffle) + estimate of
    each distinct key (broadcast of the d*w cell table) + filter; the
    distinct-key aggregation is the only data-sized exchange and is
    map-side combined."""
    sketch = cms_build(df, key_col, depth, width)
    keys = df.select(key_col).distinct()
    est = cms_estimate(sketch, keys, key_col, depth, width)
    return est.filter(F.col("est") >= threshold)


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch
#
# The mergeable DISTINCT-count counterpart of count-min: hash every key to
# a uniform integer, keep only the k smallest distinct hash values per
# group. If the k-th smallest normalized hash is U_(k), the group has
# about (k-1)/U_(k) distinct keys (Bar-Yossef et al. 2002; Beyer et al.
# SIGMOD'07 for the unbiased form and set operations) with ~1/sqrt(k)
# relative error. Unlike approx_count_distinct's HLL — whose register
# layout Spark does not expose for cross-group set algebra — a KMV sketch
# supports INTERSECTION estimation: the k smallest of the union of two
# sketches is exactly the union's sketch, and the fraction of those that
# appear in both sketches estimates the Jaccard ratio. That gives
# |A ∩ B| without ever joining A against B — the 100 TB way to answer
# "how much does corpus A overlap corpus B" for every pair of sources
# (contamination / cross-source duplication screens) at sketch-sized cost.
#
# Hashing is the portable md5-substring integer (28 bits, normalized by
# 2^28) so every sketch member, rank, and estimate is integer-derived and
# bit-reproducible in DuckDB SQL.
# --------------------------------------------------------------------------

KMV_K = 128
KMV_SPACE = float(1 << 28)  # 7 hex chars of md5 -> [0, 2^28)


def kmv_hash_expr(key: Column, salt: str = "kmv") -> Column:
    """28-bit salted hash of ``key`` — uniform over [0, 2^28), identical in
    DuckDB via ('0x' || substr(md5(key || '|kmv'), 1, 7))::BIGINT."""
    salted = F.concat(key.cast("string"), F.lit(f"|{salt}"))
    return F.conv(F.substring(F.md5(salted), 1, 7), 16, 10).cast("bigint")


def kmv_sketch(df: DataFrame, group_col: str, key_col: str, k: int = KMV_K) -> DataFrame:
    """Per-group KMV sketch: (group, hs) where ``hs`` is the ascending array
    of the k smallest distinct key hashes (shorter if the group has fewer).

    The build caps state BEFORE the shuffle, the way an RDD
    ``aggregateByKey`` seqOp would: an Arrow-batched mapInPandas keeps only
    the bottom-k distinct hashes per group per batch (bottom-k of
    bottom-ks == global bottom-k, so the result is batching- and
    partitioning-invariant), then ONE merge aggregation per group finishes
    the sketch. The exchange therefore carries at most k hashes per
    (group, batch) — sketch-sized — where a plain
    ``collect_set`` + slice would ship every distinct hash of every group
    as untruncated partial buffers (the slice in an aggregate's result
    expression runs AFTER the exchange; verified in the physical plan).
    Hashing stays JVM-side; the Python stage only sorts int64 columns."""
    hashed = df.select(
        F.col(group_col).alias("grp"), kmv_hash_expr(F.col(key_col)).alias("h")
    )

    def bottom_k(batches):
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.drop_duplicates(["grp", "h"])
                    .sort_values("h", kind="mergesort")
                    .groupby("grp", sort=False, dropna=False)
                    .head(k)
                )

    capped = hashed.mapInPandas(bottom_k, schema=hashed.schema)
    return capped.groupBy("grp").agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("hs")
    )


def kmv_distinct_estimate(
    df: DataFrame, group_col: str, key_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-group distinct-key estimate from the KMV sketch: (k-1) * 2^28 /
    h_(k) when the sketch is full, the exact distinct-hash count when the
    group never filled it (a short sketch IS the whole hash set). The
    estimate is one double division of exact integers — deterministic and
    engine-portable (numerator < 2^53)."""
    sk = kmv_sketch(df, group_col, key_col, k)
    n = F.size("hs")
    est = F.when(n < k, n.cast("double")).otherwise(
        F.round(F.lit((k - 1) * KMV_SPACE) / F.element_at("hs", k), 3)
    )
    return sk.select(F.col("grp").alias(group_col), est.alias("est_distinct"))


def kmv_intersection_estimate(
    df: DataFrame, group_col: str, key_col: str, k: int = KMV_K
) -> DataFrame:
    """Estimated |A ∩ B| for every unordered pair of groups, computed purely
    on the sketches (Beyer et al.'s union-resketch rule): X = the k smallest
    of sketch(A) ∪ sketch(B) is exactly the union's KMV sketch, so
    U_est = (k-1) * 2^28 / max(X) estimates |A ∪ B| and the fraction of X
    present in BOTH sketches estimates Jaccard; their product estimates the
    intersection. When the combined sketch never fills (both groups fully
    observed), the exact intersection count is returned instead.

    Plan shape: the pair join touches only sketch rows — G groups of k
    8-byte hashes — so all-pairs over hundreds of sources is a broadcast
    join of kilobytes, with the raw data read exactly once to build the
    sketches (the sketch frame is localCheckpointed: both sides of the
    self-join reference it, and an uncheckpointed frame would re-run the
    hash + bottom-k pipeline per side). The per-pair arithmetic stays in
    exact integers until a single final division
    (numerator <= (k-1) * k * 2^28 < 2^53)."""
    sk = kmv_sketch(df, group_col, key_col, k).localCheckpoint()  # eager: r12 A/B'd lazy +0.10 s
    a, b = sk.alias("a"), sk.alias("b")
    paired = a.join(
        F.broadcast(b), F.col("a.grp") < F.col("b.grp"), "inner"
    ).select(
        F.col("a.grp").alias("grp_a"),
        F.col("b.grp").alias("grp_b"),
        F.col("a.hs").alias("ha"),
        F.col("b.hs").alias("hb"),
    )
    x = F.slice(F.array_sort(F.array_union("ha", "hb")), 1, k)
    withx = paired.select(
        "grp_a",
        "grp_b",
        x.alias("x"),
        F.size(x).alias("nx"),
        F.size(F.array_intersect(F.array_intersect("ha", "hb"), x)).alias("both"),
    )
    est = F.when(F.col("nx") < k, F.col("both").cast("double")).otherwise(
        F.round(
            (F.col("both") * F.lit((k - 1) * KMV_SPACE))
            / (F.lit(k) * F.element_at("x", k)),
            3,
        )
    )
    return withx.select("grp_a", "grp_b", est.alias("est_common"))


# --------------------------------------------------------------------------
# HyperLogLog: mergeable distinct-count sketch (Flajolet et al. 2007).
#
# m = 64 registers (p = 6); each key hashes once, lands in one register,
# and the register keeps the MAX of the rank statistic rho (leading-zero
# count + 1 of a 28-bit suffix). MAX-merge makes the sketch composable
# across partitions, files, and days — Spark's map-side combine collapses
# every partition to <= 64 rows per group before the shuffle, so a
# 100 TB build exchanges kilobytes per group.
#
# Portability: the hash is the repo's md5-substring construction; rho is
# computed from the UNPADDED binary string length (length(bin(v)) =
# floor(log2 v) + 1), which Spark's bin() and DuckDB's bin() agree on
# exactly. The harmonic sum is kept as an exact integer numerator over
# the common denominator 2^29 (max 64 * 2^29 = 2^35 < 2^53), so the
# estimate is ONE double division of exact integers — bit-reproducible
# in ANSI SQL.
# --------------------------------------------------------------------------

HLL_M = 64  # registers (p = 6); std error ~ 1.04/sqrt(64) = 13%
HLL_RHO_BITS = 28  # md5 hex chars 3..9 -> 28-bit rank suffix
_HLL_NUM = 1559107488186.368  # alpha_64 * m^2 * 2^29 = 0.709 * 4096 * 536870912


def hll_registers(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Per-group HLL register table: (grp, j, m_j) with j in [0, 64) and
    m_j = max rank over keys landing in register j. Absent registers mean
    rank 0. The groupBy is the merge: MAX is associative/commutative, so
    partial aggregation bounds the shuffle at 64 rows per group per map
    task regardless of input size."""
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit("|hll")))
    j = (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % HLL_M).alias("j")
    v = F.conv(F.substring(h, 3, 7), 16, 10).cast("bigint")
    rho = F.when(v == 0, F.lit(HLL_RHO_BITS + 1)).otherwise(
        F.lit(HLL_RHO_BITS + 1) - F.length(F.bin(v))
    )
    return (
        df.select(F.col(group_col).alias("grp"), j, rho.alias("rho"))
        .groupBy("grp", "j")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate_from_registers(regs: DataFrame, group_col: str) -> DataFrame:
    """Estimate from a (grp, j, m_j) register table — shared by the batch
    build and the streaming max-merge reader (streaming/pipeline.read_hll).

    The harmonic mean sum(2^-m_j) over all 64 registers is carried as the
    exact integer S = sum(2^(29 - m_j)) + absent * 2^29; the raw estimate
    alpha_64 * m^2 / (S / 2^29) is one double division. Small-range
    correction (linear counting, E <= 2.5m with empty registers) follows
    the paper; the oracle gates pin cardinalities where the raw branch is
    taken, so the ln() never has to be bit-matched across engines (it is
    covered by a tolerance unit test instead)."""
    agg = regs.groupBy("grp").agg(
        F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_BITS + 1} - m_j)")).alias("s_present"),
        F.count("*").alias("n_present"),
    )
    absent = F.lit(HLL_M) - F.col("n_present")
    s = (F.col("s_present") + absent * F.lit(1 << (HLL_RHO_BITS + 1))).cast("double")
    e_raw = F.lit(_HLL_NUM) / s
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (absent > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / absent.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        F.col("grp").alias(group_col), F.round(est, 4).alias("est_distinct")
    )


def hll_distinct_estimate(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Per-group HLL cardinality estimate: (grp, est_distinct). One
    register build (map-side-combined max groupBy) + the shared estimate
    step."""
    return hll_estimate_from_registers(hll_registers(df, group_col, key_col), group_col)


# --------------------------------------------------------------------------
# Log2-bucket histogram quantiles: the one-pass, fixed-memory, mergeable
# answer to "p50/p90/p99 of a positive measure over 100 TB". Exact
# quantiles need a global sort; a log2 histogram needs ~50 counters per
# group, merges by ADD, and bounds the relative error of the estimate by
# the bucket width (interpolation inside the bucket recovers most of it).
# Every count, cumulative sum, and rank target is an exact integer; the
# interpolated estimate is one double division — oracle-portable.
# --------------------------------------------------------------------------


def log2_histogram(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group log2 histogram: (grp, b, cnt) where bucket b covers
    [2^(b-1), 2^b) for b >= 1 and [0, 1) for b = 0. Values must be
    non-negative (the caller's contract; negatives would need a signed
    mirror). length(bin(floor(x))) = floor(log2 x) + 1 exactly, with no
    float log in the bucketing path."""
    x = F.col(value_col).cast("double")
    fl = F.floor(x).cast("bigint")
    b = F.when(fl <= 0, F.lit(0)).otherwise(F.length(F.bin(fl)))
    return (
        df.select(F.col(group_col).alias("grp"), b.alias("b"))
        .groupBy("grp", "b")
        .agg(F.count("*").alias("cnt"))
    )


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[tuple[int, int]] = ((50, 100), (90, 100), (99, 100)),
) -> DataFrame:
    """Per-group interpolated quantile estimates from the log2 histogram:
    (grp, q, est) with q the percent numerator (50, 90, 99).

    Quantile ranks are exact integers: target = ceil(num*n/den) computed
    as (num*n + den - 1) div den — no float multiply whose rounding could
    differ between engines' literal typing (a DuckDB 0.9 is DECIMAL, a
    Spark 0.9 is double; integer rationals sidestep the mismatch). The
    estimate linearly interpolates inside the selected bucket:
    lo + (hi-lo) * (target - cum_prev) / cnt, all-integer until the one
    division. The cumulative window partitions by group over <= ~50
    bucket rows — sketch-sized state, no single-partition window."""
    from pyspark.sql import Window

    hist = log2_histogram(df, group_col, value_col)
    w = Window.partitionBy("grp").orderBy("b")
    cum = hist.select(
        "grp",
        "b",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_prev"),
        F.sum("cnt").over(Window.partitionBy("grp")).alias("n"),
    )
    # fan out the quantile list as a literal-array explode — no join node
    # at all (a broadcast-true join here would be a BNLJ in the plan)
    qarr = F.array(
        *[
            F.struct(F.lit(int(n)).alias("q_num"), F.lit(int(d)).alias("q_den"))
            for n, d in quantiles
        ]
    )
    j = cum.select("*", F.explode(qarr).alias("_q")).select(
        "*", F.col("_q.q_num").alias("q_num"), F.col("_q.q_den").alias("q_den")
    )
    target = ((F.col("q_num").cast("bigint") * F.col("n") + F.col("q_den") - 1)
              / F.col("q_den")).cast("bigint")
    hit = j.where((F.col("cum") >= target) & (F.col("cum_prev") < target))
    # 1L shift: buckets past 31 must not wrap in int arithmetic
    lo = F.when(F.col("b") == 0, F.lit(0).cast("bigint")).otherwise(
        F.expr("shiftleft(1L, b - 1)")
    ).cast("double")
    hi = F.when(F.col("b") == 0, F.lit(1).cast("bigint")).otherwise(
        F.expr("shiftleft(1L, b)")
    ).cast("double")
    est = lo + (hi - lo) * (
        (target - F.col("cum_prev")).cast("double") / F.col("cnt").cast("double")
    )
    return hit.select(
        F.col("grp").alias(group_col),
        F.col("q_num").alias("q"),
        F.round(est, 6).alias("est"),
    )
