"""One-off probe (r11 verdict item 8): prove the r11 PageRank hoist
(divide rank by out-degree BEFORE the edge join) actually removes the
second edge-sized shuffle in the regime where the node tables are too
big to broadcast — forced here by disabling auto-broadcast, since at the
driver SFs AQE broadcasts both node tables and the plans degenerate.

Builds q_pagerank3's graph at the given sf dir, runs BOTH forms
(current hoisted; the r10 two-edge-join form reconstructed inline) with
spark.sql.autoBroadcastJoinThreshold=-1 and the AQE equivalent, and
reports per-form: edge-join count, Exchange count, SortMergeJoin count
from the executed plan, plus min-of-N action seconds.

This is a measurement tool, not a shipped config: the session conf
changes live and die inside this probe.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/pagerank_broadcast_probe.py [N]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.scaledata/sf1")

    from pyspark.sql import functions as F

    from vectorflow_spark.queries._core import _t
    from vectorflow_spark.session import get_spark

    spark = get_spark("pagerank_probe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    eo = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    edges = eo.select(F.col("c").alias("src"), (F.col("s") + 1000000).alias("dst")).union(
        eo.select((F.col("s") + 1000000).alias("src"), F.col("c").alias("dst"))
    )

    total_mass, iters = 10**12, 3

    def hoisted(e):
        from vectorflow_spark.operators.graph import pagerank_quantized

        return pagerank_quantized(e, iterations=iters)

    def two_join(e):
        # the r10 form: join edges onto ranks, THEN divide by out-degree —
        # a second edge-sized join per iteration
        e = e.select("src", "dst").localCheckpoint(eager=False)
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d")).localCheckpoint(eager=False)
        n_nodes = deg.agg(F.count(F.lit(1)).alias("nn"))
        r = deg.join(n_nodes).select(
            F.col("src").alias("v"), F.expr(f"{total_mass} div nn").alias("r")
        )
        for _ in range(iters):
            fanned = e.join(r.withColumnRenamed("v", "src"), "src")
            contribs = (
                fanned.join(deg, "src")
                .select("dst", F.expr("r div d").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("contrib"))
            )
            r = contribs.join(n_nodes).select(
                F.col("dst").alias("v"),
                (
                    F.expr(f"(15 * ({total_mass} div nn)) div 100")
                    + F.expr("(85 * contrib) div 100")
                ).alias("r"),
            )
        return r

    def probe(tag, fn):
        out = (
            fn(edges)
            .orderBy(F.col("r").desc(), "v")
            .limit(20)
            .select(F.col("v").cast("bigint"), F.col("r").cast("bigint"))
        )
        best = None
        for _ in range(n):
            t0 = time.time()
            out.write.format("noop").mode("overwrite").save()
            best = min(best or 9e9, time.time() - t0)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        stats = {
            "action_s": round(best, 3),
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "shj": len(re.findall(r"ShuffledHashJoin", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        }
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        pdir = os.path.join(repo, "plans", "r12")
        os.makedirs(pdir, exist_ok=True)
        with open(os.path.join(pdir, f"pagerank_probe_{tag}.txt"), "w") as f:
            f.write(plan)
        print(tag, json.dumps(stats))
        return stats

    h = probe("hoisted_noBroadcast", hoisted)
    t = probe("twojoin_noBroadcast", two_join)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "hoisted": h,
                "two_join": t,
                "edge_join_delta_per_iter": (t["smj"] + t["shj"]) - (h["smj"] + h["shj"]),
            }
        )
    )


if __name__ == "__main__":
    main()
