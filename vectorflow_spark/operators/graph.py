"""Graph shape statistics over candidate-pair edge sets.

The dedup family (operators/dedup.py) emits candidate-pair GRAPHS —
minhash/LSH edges, simhash Hamming-ball edges — and connected components
turns them into groups. Triangle count is the standard cohesion metric on
those graphs: near-dup clusters that are real duplicates triangulate
densely, while hash-collision noise produces stars with few triangles.

Algorithm: degree-ordered node-iterator (the MapReduce-standard scheme,
cf. Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
Reducer", WWW'11). Orient every undirected edge from its lower-ranked to
its higher-ranked endpoint under the total order (degree, id); each
triangle {u,v,w} then has EXACTLY ONE wedge (u->v, u->w) whose closing
edge v->w is also oriented forward, so a wedge self-join + one edge join
counts each triangle once. The orientation bounds the wedge explosion by
the graph's arboricity: every node's out-degree is O(sqrt(m)) regardless
of how skewed the raw degree distribution is — the property that makes
this safe on a 100 TB edge set where a celebrity node would otherwise
generate degree^2 wedges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["degree_table", "orient_edges", "triangle_count", "kcore_peel"]

# rank = degree * RANK_BASE + id gives a single comparable int64 for the
# (degree, id) total order; ids must be < RANK_BASE.
RANK_BASE = 1_000_000_000


def degree_table(edges: DataFrame, a_col: str = "a", b_col: str = "b") -> DataFrame:
    """(node, deg) over canonical (a < b, distinct) undirected edges —
    one map-side-combinable aggregation over the exploded endpoints."""
    return (
        edges.select(F.explode(F.array(a_col, b_col)).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def orient_edges(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    degrees: DataFrame | None = None,
) -> DataFrame:
    """Orient undirected (a, b) edges low-rank -> high-rank under the
    (degree, id) total order. Input must be canonical (a < b, distinct);
    output columns (src, dst, dst_rank).

    Degrees are one map-side-combinable aggregation over the exploded
    endpoints (pass a precomputed/checkpointed ``degree_table`` result
    via ``degrees`` to share it with other consumers); the two rank
    lookups join back on the endpoint id."""
    deg = (degrees if degrees is not None else degree_table(edges, a_col, b_col)).select(
        "node",
        (F.col("deg") * F.lit(RANK_BASE) + F.col("node")).alias("rank"),
    )
    ra = deg.select(F.col("node").alias("_na"), F.col("rank").alias("_ra"))
    rb = deg.select(F.col("node").alias("_nb"), F.col("rank").alias("_rb"))
    e = (
        edges.join(ra, F.col(a_col) == F.col("_na"))
        .join(rb, F.col(b_col) == F.col("_nb"))
    )
    fwd = F.col("_ra") < F.col("_rb")
    return e.select(
        F.when(fwd, F.col(a_col)).otherwise(F.col(b_col)).alias("src"),
        F.when(fwd, F.col(b_col)).otherwise(F.col(a_col)).alias("dst"),
        F.greatest(F.col("_ra"), F.col("_rb")).alias("dst_rank"),
    )


def triangle_count(edges: DataFrame, a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Count triangles in the undirected graph given by canonical (a, b)
    pairs. Returns one row: (n_nodes, n_edges, n_triangles).

    Plan: orient (two broadcast-able rank joins), wedge self-join on src
    (out-adjacency only — arboricity-bounded), then one join probing the
    wedge's closing edge; every shuffle keys on a node id. No driver-side
    iteration and no crossJoin anywhere.

    The edge set and the oriented edge set are localCheckpointed first:
    ``edges`` is typically an expensive candidate-generation pipeline
    (minhash -> bands -> posting lists) and this plan references it in SIX
    places (degrees, orientation, both wedge sides, closing probe, stats)
    — without the lineage cut Spark re-executes the generator per
    reference (the q_dedup_components lesson; 115 s -> ~3 s at sf0.1).
    Both checkpoints are edge-count-sized, far smaller than the data.

    The degree table is checkpointed separately (node-count-sized) and
    shared three ways: the orientation's rank lookups, and BOTH summary
    stats — n_nodes is its row count and n_edges is sum(deg) div 2, so
    neither stat re-scans the edge set (previously n_nodes was an
    explode + count_distinct over every endpoint and n_edges a second
    full scan; guide §2.2 — aggregate the node-sized table instead)."""
    # LAZY checkpoints: there is no intermediate driver action here, so
    # eager pins cost three extra jobs (and a rescan each) before the
    # gate's single real action. Lazily marked, the final action computes
    # each frame exactly once under the persist lock (whichever branch
    # arrives first populates it; the other branches read the pinned
    # copy) — same once-only execution, three fewer jobs (r12).
    edges = edges.localCheckpoint(eager=False)
    deg = degree_table(edges, a_col, b_col).localCheckpoint(eager=False)
    directed = orient_edges(edges, a_col, b_col, degrees=deg).localCheckpoint(eager=False)
    lo = directed.select(
        F.col("src").alias("w_src"), F.col("dst").alias("w_lo"), F.col("dst_rank").alias("_lo_rank")
    )
    hi = directed.select(
        F.col("src").alias("w_src"), F.col("dst").alias("w_hi"), F.col("dst_rank").alias("_hi_rank")
    )
    wedges = lo.join(hi, "w_src").filter(F.col("_lo_rank") < F.col("_hi_rank"))
    closing = directed.select(F.col("src").alias("w_lo"), F.col("dst").alias("w_hi"))
    tri = wedges.join(closing, ["w_lo", "w_hi"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    stats = deg.agg(F.expr("sum(deg) div 2").alias("n_edges"))
    nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        nodes.join(F.broadcast(stats))
        .join(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_triangles")
    )


def pagerank_quantized(
    edges: DataFrame,
    iterations: int = 3,
    total_mass: int = 10**12,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank in integer (quantized) mass units.

    Classic PageRank sums double contributions whose result depends on
    float fold order — unverifiable across engines. This variant keeps ALL
    mass in int64 micro-units and replaces every division with integral
    DIV: r0(v) = M div N; each round, contrib(u->v) = r(u) div outdeg(u)
    and r'(v) = (15 * (M div N)) div 100 + (85 * sum contribs) div 100.
    Truncation leaks a little mass (documented spec, identical everywhere)
    in exchange for bit-exact reproducibility on any engine and any
    partitioning — the same trade q_kmeans_step and q_unigram_logprob make.

    Input ``edges`` is DIRECTED (src, dst); pass both directions for an
    undirected graph. Nodes = every id appearing as a src (for an
    undirected input that is every node). Plan per iteration: one join of
    the rank table onto edges by src (both sides hash-partitioned on the
    same key — AQE reuses the exchange) + one map-side-combinable sum by
    dst. O(iterations) shuffles total, no driver-side state.

    The edge set and degree table are localCheckpointed ONCE up front:
    ``edges`` is typically an expensive derivation (here a fact-fact join
    + distinct), and since the unrolled loop references it every
    iteration, an uncut lineage re-executes that derivation
    O(iterations) times inside the single action — the same trap
    connected_components closes for its LSH candidate pipeline. For large
    iteration counts additionally cut the rank lineage every ~10 rounds.
    """
    # LAZY checkpoints (r12): no driver action before the caller's one
    # real action, so the eager pins only added two jobs + a rescan. The
    # lineage cut (each frame computed once, read O(iterations) times) is
    # preserved — the first consuming stage materializes under the
    # persist lock.
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).localCheckpoint(
        eager=False
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d")).localCheckpoint(eager=False)
    n_nodes = deg.agg(F.count(F.lit(1)).alias("nn"))
    base_unit = F.expr(f"{total_mass} div nn")
    r = deg.join(F.broadcast(n_nodes)).select(
        F.col("src").alias("v"), base_unit.alias("r")
    )
    for _ in range(iterations):
        # Per-SOURCE contribution first: r and deg are both node-count
        # tables, so r div d is one node x node join — then a single
        # edge-sized join fans it out to the destinations. The previous
        # form joined the edge set twice per round (e |x| r, then the
        # edge-sized result |x| deg); at 100 TB that second edge join is
        # a full extra shuffle of the fanned-out contribution stream
        # (guide §3 / §2.2: join the small sides first, touch the big
        # side once). Bit-identical: r div d per src is the same value
        # on every outgoing edge either way. Measured flat at sf0.1
        # (AQE broadcasts both node tables into the edge join locally).
        per_src = (
            r.withColumnRenamed("v", "src")
            .join(deg, "src")
            .select("src", F.expr("r div d").alias("c"))
        )
        contribs = (
            e.join(per_src, "src")
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        r = contribs.join(F.broadcast(n_nodes)).select(
            F.col("dst").alias("v"),
            (
                F.expr(f"(15 * ({total_mass} div nn)) div 100")
                + F.expr("(85 * contrib) div 100")
            ).alias("r"),
        )
    return r


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    undirected: bool = False,
) -> DataFrame:
    """Fixed-iteration synchronous label propagation (community detection),
    engine-exact.

    Classic LPA breaks ties randomly; this variant is fully deterministic:
    each round every node adopts the label with the highest neighbor count,
    ties to the SMALLEST label. The (count desc, label asc) argmin is
    encoded arithmetically — key = label - count * 2^42, take MIN(key),
    recover label = key mod 2^42 (positive mod) — so both engines compute
    the identical integer, no struct-ordering or min_by semantics to align
    (the q_pagerank3 trade: quantized integer math for bit-exact
    cross-engine parity).

    Input is DIRECTED (src, dst); pass both directions for an undirected
    graph. Nodes with no in-neighbors drop out (same join semantics both
    engines). Plan per iteration: one hash join of the label table onto
    edges by dst + two map-side-combinable aggregations keyed on (src,
    label) then src — O(iterations) shuffles, no driver state; the edge
    set is localCheckpointed once so the unrolled loop never re-derives
    it (the connected_components / pagerank_quantized lesson). Fixed
    iteration count keeps the plan O(k) deep — at 100 TB, synchronous
    rounds with a bounded k is the shape that survives (the same contract
    as q_pagerank3), and oscillation on bipartite graphs is irrelevant to
    a fixed-k snapshot."""
    m = 1 << 42
    # EAGER pin kept deliberately: the r12 lazy-checkpoint sweep A/B'd
    # eager=False here and it measured consistently SLOWER (action 1.61 ->
    # 1.95-2.39 s at sf0.1 while pagerank/triangle gained) — the round-1
    # aggregation plus two join iterations all race to materialize e
    # inside one action; eager materialization up front keeps the big
    # action's stages read-only.
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).localCheckpoint()
    # precondition guards (assert_true raises inside the job, never
    # corrupts): the arithmetic encoding needs ids in [0, 2^42) and
    # per-(node,label) neighbor counts below 2^21, else the packed key
    # wraps and elects a wrong label SILENTLY. xxhash-derived ids
    # (negative / 63-bit) must be densified first.
    e = e.select(
        "src",
        "dst",
        F.assert_true(
            (F.col("src") >= 0) & (F.col("src") < m) & (F.col("dst") >= 0) & (F.col("dst") < m),
            F.lit(f"label_propagation: node ids must be in [0, 2^42) for the packed argmin"),
        ).alias("_chk"),
    ).drop("_chk")
    # ``undirected=True`` is a caller ASSERTION that every dst value also
    # appears as a src (true for any symmetrized edge set): round 1 then
    # joins the edge set against the IDENTITY label table (label(x) = x
    # restricted to the src set), which is the identity mapping — the
    # distinct-src materialization and the round-1 join both vanish and
    # round 1 is a single (src, dst) aggregation (guide §2.1: remove the
    # shuffle outright). Directed inputs keep the join: a dst that never
    # appears as src must drop out in round 1, which only the join does.
    labels = None
    for it in range(iterations):
        if it == 0 and undirected:
            contribs = e.groupBy("src", F.col("dst").alias("lbl")).agg(
                F.count(F.lit(1)).alias("cnt")
            )
        else:
            if labels is None:
                labels = e.select("src").distinct().select(
                    F.col("src").alias("v"), F.col("src").alias("lbl")
                )
            contribs = (
                e.join(labels.withColumnRenamed("v", "dst"), "dst")
                .groupBy("src", "lbl")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
        contribs = contribs.select(
            "src",
            "lbl",
            "cnt",
            F.assert_true(
                F.col("cnt") < F.lit(1 << 21),
                F.lit("label_propagation: neighbor count overflows the packed argmin"),
            ).alias("_chk"),
        ).drop("_chk")
        keyed = contribs.select("src", (F.col("lbl") - F.col("cnt") * F.lit(m)).alias("key"))
        labels = (
            keyed.groupBy("src")
            .agg(F.min("key").alias("key"))
            .select(F.col("src").alias("v"), F.pmod(F.col("key"), F.lit(m)).alias("lbl"))
        )
    if labels is None:
        # iterations == 0: the contract (and the pre-r11 behavior) is the
        # identity label table over the src set — not None. Every current
        # caller passes iterations >= 1; this keeps the degenerate call
        # from crashing (r11 ADVICE item 1).
        labels = e.select("src").distinct().select(
            F.col("src").alias("v"), F.col("src").alias("lbl")
        )
    return labels


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int = 4,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """k-core decomposition by ``rounds`` synchronous peel iterations:
    repeatedly drop nodes of degree < k (and their edges), return the
    surviving nodes with their in-core degree — (node, core_deg).

    On a candidate-pair dedup graph the k-core separates DENSE duplicate
    communities (real near-dup clusters triangulate, so their nodes keep
    degree >= k under peeling) from hash-collision noise (stars and
    chains, whose leaves peel away in the first rounds and whose hubs
    follow). The round count is FIXED, not run-to-fixpoint: a fixed
    unroll is deterministic, oracle-expressible round-for-round in plain
    SQL (a peel DELETES rows, which a monotone recursive CTE cannot
    express), and the fixpoint claim is asserted separately (tests pin
    round R == round R+1 at the driver scale factors; at 100 TB the same
    assertion is one extra cheap round whose emptiness certifies
    convergence).

    Plan shape per round: one map-side-combined degree aggregation over
    the exploded endpoints, localCheckpointed (it is node-count-sized),
    then — only when the sub-``k`` DROP set is non-empty — two anti-joins
    of the edge set against that drop set (applied lazily: the drop sets
    are checkpointed-tiny, so they ride as broadcast filters on later
    rounds' scans; the edge set itself is re-checkpointed only when a
    round drops too many nodes to broadcast). Anti-join against the drop
    set is equivalent to
    semi-join against the keep set (every endpoint of ``e`` appears in
    the degree table, null endpoints are filtered up front) and joins
    against the SMALLER side: near fixpoint the drop set is a handful of
    nodes while the keep set is the whole graph, so the build side stays
    broadcast-tiny exactly when rounds repeat (guide §3). When a round's
    drop set is empty the peel is at fixpoint: all later rounds are the
    identity, the edge rewrite is skipped entirely, and the checkpointed
    degree table IS the final answer — no re-aggregation over the edges
    (at sf0.1 the peel deletes 94 of 1.23M edges and reaches fixpoint in
    round 3; at 100 TB a converged peel stops paying O(E) per leftover
    round). Work per round never exceeds the CURRENT edge set, which
    only shrinks; total cost <= rounds * E like the synchronous peel in
    distributed k-core literature."""
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    if rounds > 0:
        # A null endpoint never matches a semi-join, so the original form
        # dropped such edges in round one; filtering them up front keeps
        # the anti-join form identical on degenerate inputs.
        e = e.filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    # LAZY checkpoints, materialized by the round's own drop-count action:
    # one job per round (edge pipeline -> persist e -> degree agg ->
    # persist deg -> count) instead of three (eager e job, eager deg job,
    # count job) — the count is a full scan, so every partition is
    # persisted by the end of the action, the same pin as eager (r12;
    # guide §1.2 driver/job floors). Correctness is unchanged: nothing
    # consumes e or deg before that first action.
    e = e.localCheckpoint(eager=False)
    for _ in range(rounds):
        deg = (
            e.select(F.explode(F.array("a", "b")).alias("v"))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint(eager=False)
        )
        drop = deg.filter(F.col("c") < k)
        n_drop = drop.count()
        if n_drop == 0:
            # Fixpoint: deg is the degree table of the final edge set.
            return (
                deg.filter(F.col("c") >= k)
                .select(F.col("v").alias("node"), F.col("c").alias("core_deg"))
            )
        e = (
            e.join(drop.select(F.col("v").alias("a")), "a", "left_anti")
            .join(drop.select(F.col("v").alias("b")), "b", "left_anti")
            .select("a", "b")
        )
        # The drop set is already materialized (checkpointed deg), so the
        # anti-joins ride as broadcast filters on the NEXT round's degree
        # scan — re-materializing the full edge set to delete a handful
        # of edges costs more than both anti-joins together. Only when a
        # round's drop set is too big to broadcast (~8 MB of int64 keys)
        # does the rewrite pay for itself: checkpoint then, so no later
        # round re-runs a shuffled anti-join. Lineage depth stays bounded
        # by ``rounds`` either way.
        if n_drop > 1_000_000:
            e = e.localCheckpoint(eager=False)  # next round's count materializes it
    return (
        e.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("core_deg"))
        .filter(F.col("core_deg") >= k)
    )
