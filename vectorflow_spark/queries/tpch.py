"""TPC-H query-shape coverage (Q2..Q22 equivalents)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from vectorflow_spark.queries._core import _t, query


# ---------------------------------------------------------------------------
# R-group round 2: wider relational coverage (TPC-H Q7/Q8/Q10/Q13/Q15/Q22
# shapes adapted to the driver tables' columns)
# ---------------------------------------------------------------------------


@query(
    "q_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: nation-pair trade volume by ship year. Plan at
    scale: the only big shuffle is lineitem <-> orders on orderkey;
    supplier/customer/nation are broadcast dims and the nation-pair
    disjunction is evaluated after both broadcasts (Catalyst pushes each
    nation's name filter into its own broadcast side is NOT possible for a
    disjunction across sides, so the pair filter runs post-join on rows
    already thinned by the date pushdown)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)"))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q_market_share",
    """
    WITH rev AS (
        SELECT year(o_orderdate) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10)) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    )
    SELECT CAST(o_year AS INT) AS o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(28,10)) END)
                AS DOUBLE)
           / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM rev GROUP BY 1
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue sold into
    ASIA customers, per order year. Both numerator and denominator are
    exact decimal sums (identical on both engines); the single double
    division at the end is deterministic. Plan: lineitem<->orders is the
    one fact shuffle; part/supplier/customer/nation/region broadcast, and
    the region+p_type filters thin the broadcast sides before the join."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(28,10)")
    return rev.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(zero)).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@query(
    "q_returned_items",
    """
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS revenue,
           n_name
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1995-07-01'
      AND o_orderdate <  TIMESTAMP '1995-10-01'
    GROUP BY 1, 2, 4
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in one
    quarter. Decimal-exact revenue makes the DESC sort deterministic
    (ties broken by custkey). Plan: date filter pushed to the orders scan,
    returnflag filter pushed to lineitem, one orderkey shuffle, customer/
    nation broadcast, TakeOrderedAndProject for the limit."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-07-01") & (F.col("o_orderdate") < "1995-10-01")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)"))
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q_order_count_dist",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY 1
    )
    GROUP BY 1
    """,
)
def q_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    including zero-order customers via the left outer join (count(col)
    skips the nulls the outer join manufactures). Plan: one shuffle on
    custkey for the first agg; the second agg groups on the tiny count
    domain and is map-side-combinable to almost nothing."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q_top_supplier",
    """
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the max quarterly revenue.
    The max comparison happens in exact decimal space, so revenue ties are
    honored identically by both engines. Plan: one map-side-combinable agg
    on suppkey; the scalar max is a 1-row broadcast joined back onto the
    agg result (no single-partition global window, which would serialize
    a per-supplier table that can be millions of rows at a real scale
    factor); supplier is broadcast."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)"))
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    best = rev.join(F.broadcast(mx)).filter(F.col("total_revenue") == F.col("_mx"))
    return (
        best.join(F.broadcast(s), best.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue"))
    )


@query(
    "q_idle_rich_customers",
    """
    WITH avg_bal AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS a
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    """,
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balances and no
    RECENT orders (none since 2000 — the driver data is dense enough that
    every customer has some order, so recency is the meaningful inactivity
    predicate). The average is an exact decimal sum over an exact count,
    so the > threshold cannot drift between engines. Plan: the scalar
    average broadcasts as a 1-row side; the NOT EXISTS is a left-anti join
    on custkey against the date-filtered orders key projection (the only
    shuffle, and the date filter is pushed to the orders scan)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    avg_row = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("a")
        )
    )
    rich = c.join(F.broadcast(avg_row)).filter(F.col("c_acctbal") > F.col("a"))
    idle = rich.join(o.select("o_custkey"), rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
    )


@query(
    "q_acctbal_ranks",
    """
    SELECT s_suppkey, n_name,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           CAST(rank() OVER w AS BIGINT) AS rnk
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WINDOW w AS (PARTITION BY n_name ORDER BY s_acctbal, s_suppkey)
    """,
)
def q_acctbal_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family windows (percent_rank / cume_dist / rank) over supplier
    balances per nation. percent_rank and cume_dist are small-integer
    ratios ((rank-1)/(n-1), seen/n) — exact doubles on both engines. One
    shuffle on the partition key; the suppkey tiebreak makes every rank
    deterministic."""
    from pyspark.sql import Window

    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy("s_acctbal", "s_suppkey")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "s_suppkey",
            "n_name",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
            F.rank().over(w).cast("bigint").alias("rnk"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H remainder: the 12 query shapes not yet covered (Q2/Q4/Q6/Q9/Q11/Q12/
# Q14/Q16/Q17/Q19/Q20/Q21), adapted to the driver's reduced schema (no
# partsupp, no l_shipmode/l_commitdate/l_receiptdate). Each keeps the
# *plan shape* of the original — semi/anti joins, correlated aggregates,
# scalar-subquery thresholds, disjunctive pushdown — which is what matters
# for grading Spark strategy at scale.
# ---------------------------------------------------------------------------


@query(
    "q_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,10))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0
    """,
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-aggregate revenue forecast. All three
    predicates push to the parquet scan (PushedFilters on shipdate/
    discount/quantity); the sum is exact decimal so both engines agree to
    the last bit. At 100 TB this is the canonical min-stage query: scan →
    partial agg → 1-row final, no shuffle of data rows at all."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(28,10)"))
        .cast("double")
        .alias("revenue")
    )


@query(
    "q_priority_waiting",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1
    """,
)
def q_priority_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders per priority having at least one lineitem
    shipped >60 days after the order date (the reduced schema has no
    commit/receipt dates, so lateness-vs-orderdate supplies the EXISTS
    correlation). Plan: LEFT SEMI join on orderkey with the non-equi
    lateness predicate folded into the join condition — Spark dedups the
    probe side inside the semi join, so no distinct-on-lineitem blowup;
    the quarter filter is pushed to the orders scan."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    # Derived probe-side bound (r12, guide §3.2 shape): the EXISTS can only
    # fire when l_shipdate > o_orderdate + 60d with o_orderdate >= 1996-01-01,
    # so every qualifying lineitem has l_shipdate > 1996-03-01 (= 01-01 + 60,
    # 1996 is a leap year). Catalyst does not propagate constraints through
    # the non-equi join condition, so state it explicitly: it pushes into the
    # parquet scan (PushedFilters) and drops ~60% of lineitem BEFORE the
    # semi-join exchange — the regime fix for the non-broadcast scale where
    # the quarter's orders no longer fit under the broadcast threshold and
    # the plan shuffles the whole fact table (observed at sf1: SMJ over 60M
    # rows, 2.9 s; bounded scan 1.9 s). Strictness: rows with
    # l_shipdate <= 1996-03-01 satisfy l_shipdate <= o_orderdate + 60 for
    # every order in the quarter, so none can witness the EXISTS.
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .filter(F.col("l_shipdate") > F.expr("TIMESTAMP '1996-03-01 00:00:00'"))
    )
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q_nation_profit",
    """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))
                    - CAST(p_retailprice * l_quantity * 0.1 AS DECIMAL(28,10))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per order year, with
    p_retailprice*qty*0.1 standing in for the absent ps_supplycost. Both
    product terms are cast to decimal BEFORE the subtraction so the sum is
    exact on both engines. Plan: the p_name LIKE filter thins part before
    broadcast; lineitem<->orders on orderkey is the only fact shuffle;
    supplier/nation broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)") - (
        F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    ).cast("decimal(28,10)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


@query(
    "q_important_parts",
    """
    WITH val AS (
        SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS value
        FROM lineitem GROUP BY 1
    )
    SELECT l_partkey, CAST(value AS DOUBLE) AS value
    FROM val
    WHERE CAST(value AS DOUBLE) > (SELECT CAST(sum(value) AS DOUBLE) * 0.0006 FROM val)
    """,
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds a fraction of the
    corpus-wide total (scalar-subquery threshold; ps_supplycost replaced
    by extendedprice value). The per-part sums are exact decimal; both the
    threshold and the compared value go through the same decimal->double
    cast so the strict > cannot disagree between engines. Plan: ONE
    map-side-combinable agg on partkey; the global total re-aggregates the
    per-part result (no second scan) and broadcasts as a 1-row side."""
    li = _t(spark, sf_dir, "lineitem")
    val = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(28,10)")).alias("value")
    )
    thr = val.agg((F.sum("value").cast("double") * F.lit(0.0006)).alias("_thr"))
    return (
        val.join(F.broadcast(thr))
        .filter(F.col("value").cast("double") > F.col("_thr"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
    )


@query(
    "q_late_priority",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def q_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority mix of late shipments, grouped by
    returnflag standing in for the absent l_shipmode. The lateness
    predicate is a non-equi post-join filter (it references both sides);
    the year filter pushes to the lineitem scan. Plan: one orderkey
    shuffle, conditional-sum pivot in a single agg."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "q_promo_revenue",
    """
    SELECT CAST(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))
                     ELSE CAST(0 AS DECIMAL(28,10)) END) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE)
           AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO revenue share for one month. Numerator and
    denominator are exact decimal sums; the single 100*num/den double
    expression is evaluated in the same association order in both engines.
    Plan: month filter pushed to lineitem scan, part broadcast, 1-row
    result — no data-row shuffle."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)")
    zero = F.lit(0).cast("decimal(28,10)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "q_part_supplier_counts",
    """
    SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    GROUP BY 1, 2, 3
    """,
)
def q_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size),
    with lineitem supplying the part<->supplier relation in place of the
    absent partsupp. Plan: part filters evaluate before broadcast;
    count(DISTINCT) expands to a two-phase agg (partial distinct on
    (grp, suppkey), then count) — both phases map-side combinable, no
    row explosion."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_small_qty_revenue",
    """
    WITH pa AS (
        SELECT l_partkey AS pk,
               0.2 * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS thr
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN pa   ON l_partkey = pk
    WHERE p_brand = 'Brand#3' AND l_quantity < thr
    """,
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost by suppressing small-quantity orders
    — the correlated per-part average decorrelated into a groupBy +
    equi-join back onto lineitem. The threshold is (0.2 * exact-decimal
    sum as double) / exact count, bit-identical in both engines. Plan: the
    per-part agg is map-side combinable on partkey; the join back is on
    the same key (AQE may broadcast the thinned agg side); brand filter
    thins part before broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.2) * F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("thr")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == pa.pk)
        .filter(F.col("l_quantity") < F.col("thr"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(28,10)")).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


@query(
    "q_disjunctive_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive mixed-side predicates. Catalyst
    factors the common-side conjuncts: the part-only disjunction
    (brand/size) is pushed below the join onto the broadcast side, and
    the quantity bounds (1..30 overall) push to the lineitem scan, so the
    join probes only plausible rows — the scan does NOT read the whole
    fact table at scale."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    qty = F.col("l_quantity")
    sz = F.col("p_size")
    disj = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 5) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 10) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 15) & qty.between(20, 30))
    )
    return joined.filter(disj).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)"))
        .cast("double")
        .alias("revenue")
    )


@query(
    "q_promo_part_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > CAST(500 AS DECIMAL(18,2))
    )
    """,
)
def q_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved a material volume of PROMO
    parts in a year (aggregated IN-subquery; partsupp availability
    replaced by shipped quantity). The HAVING compares exact decimals.
    Plan: the subquery aggregates lineitem on suppkey (map-side
    combinable after the broadcast part filter), the qualifying key set
    is tiny and broadcast for a LEFT SEMI join against supplier — the
    decorrelation Spark's optimizer itself performs for IN (subquery)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = _t(spark, sf_dir, "supplier")
    qualifying = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_qty"))
        .filter(F.col("_qty") > F.lit(500).cast("decimal(18,2)"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(qualifying), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "q_waiting_suppliers",
    """
    WITH l1 AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    ),
    per_order AS (
        SELECT l_orderkey AS ok, count(DISTINCT l_suppkey) AS n_supp
        FROM lineitem GROUP BY 1
    ),
    late_per_order AS (
        SELECT l_orderkey AS ok2, count(DISTINCT l_suppkey) AS n_late_supp
        FROM l1 GROUP BY 1
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM l1
    JOIN per_order      ON l_orderkey = ok
    JOIN late_per_order ON l_orderkey = ok2
    JOIN supplier       ON l_suppkey = s_suppkey
    WHERE n_supp >= 2 AND n_late_supp = 1
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up multi-supplier
    finished orders (late = shipped >90 days after order date). The
    classic EXISTS / NOT-EXISTS pair decorrelates into per-order
    aggregates; n_supp>=2 encodes EXISTS(other supplier), n_late_supp=1
    encodes NOT EXISTS(other late supplier).

    ONE fact pass (guide §2.3/§1.1 first-principles): the old form
    scanned lineitem three times (l1, per-order countDistinct over ALL
    lineitem, late-per-order) and 3-way-joined the aggregates back on
    orderkey. Equivalences that collapse it: (a) every orderkey that
    survives the join is F-status (l1 only holds F orders, and an
    orderkey determines its order's status), so per_order may be
    computed over the F-joined rows; (b) when n_late_supp = 1 every
    late row of the order carries the SAME suppkey, so the final
    count(*) per supplier = sum of per-order late-row counts grouped by
    that one suppkey. Two stacked plain aggregations — (orderkey,
    suppkey) then orderkey, both map-side combinable, no countDistinct
    Expand, no join-back — replace the three passes; the orderkey
    exchange is established once and reused. Rows proven identical at
    sf0.1 and by the unchanged DuckDB oracle at both driver SFs."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).cast("int")
    pair = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("_late"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum("_late").alias("_n_late_rows"))
    )
    # NULL-key precondition (r11 ADVICE item 2): n_supp counts (orderkey,
    # suppkey) GROUPS, which — unlike countDistinct(l_suppkey) — would
    # count a NULL suppkey as one member. TPC-H l_suppkey is NOT NULL by
    # schema (and the driver fixtures honor it), so the two are equal; a
    # nullable fact table would need a suppkey IS NOT NULL pre-filter.
    per_order = pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum((F.col("_n_late_rows") > 0).cast("int")).alias("n_late_supp"),
        F.sum("_n_late_rows").alias("n_late_rows"),
        F.max(F.when(F.col("_n_late_rows") > 0, F.col("l_suppkey"))).alias("_late_supp"),
    )
    return (
        per_order.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("_late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        # coalesce keeps numwait non-nullable like the count() it replaces
        .agg(
            F.coalesce(F.sum("n_late_rows"), F.lit(0)).cast("bigint").alias("numwait")
        )
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@query(
    "q_min_cost_supplier",
    """
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE)
               / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS unit_cost
        FROM lineitem GROUP BY 1, 2
    ),
    best AS (
        SELECT l_partkey, l_suppkey, unit_cost,
               row_number() OVER (PARTITION BY l_partkey ORDER BY unit_cost, l_suppkey) AS rn
        FROM cost
    )
    SELECT p_partkey, p_brand, s_suppkey, s_name, unit_cost
    FROM best
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE rn = 1 AND p_size = 15
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each size-15 part, the supplier with the lowest
    observed unit cost (exact-decimal sums divided once in double — the
    correlated MIN subquery decorrelated into a window). Ties break on
    suppkey so row_number is deterministic. Plan: one (partkey,suppkey)
    agg, one window partitioned by partkey (same key → Spark reuses the
    hash partitioning, no second shuffle), part/supplier broadcast. The
    part filter applies after rn=1 — identical semantics to filtering
    first since the window is per-part, but keeps the agg reusable.
    split=True: the exact-decimal partial agg is the gate's dominant CPU
    and otherwise runs on the single scan partition (r11: 2.28->1.68 s,
    decimal sums are order-independent so the result is unchanged).
    The size-15 semi-join runs BEFORE the agg (guide §3.2): per-part
    costs and per-part windows are independent, so dropping non-size-15
    parts up front removes whole window partitions and is row-identical
    to filtering after rn=1 — while the dominant decimal agg now sees
    ~1/50th of lineitem (r11 third session: action 1.12 -> 0.33 s)."""
    li = _t(spark, sf_dir, "lineitem", split=True)
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = _t(spark, sf_dir, "supplier")
    li = li.join(
        F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"))),
        "l_partkey",
        "left_semi",
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(28,10)")).cast("double")
            / F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
        ).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    best = cost.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "unit_cost")
    )


