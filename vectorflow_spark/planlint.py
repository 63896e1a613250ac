"""Physical-plan lint: the 100×-scale contract, enforceable in CI.

Every query this engine ships must compile to a plan that survives a
1000-executor cluster reading 100 TB. Correctness tests at sf0.01 cannot
catch the failure modes that matter there, so this module walks the
compiled ``SparkPlan`` tree (via py4j) and classifies the patterns that
turn into incidents at scale:

* ``CARTESIAN``                        — ``CartesianProduct``: both sides
  big, O(n·m) rows materialized. Never acceptable; there is no allow-list
  for this one.
* ``BNLJ_UNBOUNDED``                   — ``BroadcastNestedLoopJoin`` whose
  broadcast side is not *provably* bounded by its own subtree (no
  aggregate/limit/top-k below the broadcast, not a driver-literal frame).
  A BNLJ is the right plan for k-vectors × corpus — but only when k is
  bounded by construction; broadcasting an unbounded table OOMs every
  executor at once.
* ``SINGLE_PARTITION_EXCHANGE_UNREDUCED`` — ``Exchange SinglePartition``
  above a subtree with no partial aggregate/limit: ships every surviving
  row to ONE task.
* ``GLOBAL_SORT_UNREDUCED``            — global ``Sort`` over a
  non-aggregated input (range-partitions the world; top-k should be
  ``TakeOrderedAndProject``, global ranks the repartitionByRange operator
  in operators/ranking.py).
* ``GLOBAL_WINDOW_UNREDUCED`` / ``GLOBAL_WINDOWGROUPLIMIT_UNREDUCED`` —
  a ``Window`` with an empty partition spec over non-aggregated input:
  the classic "works in tests, one straggler task at scale" bug.
* ``PYTHON_ROW_UDF``                   — ``BatchEvalPython``: a
  row-at-a-time (pickled, non-Arrow) Python UDF in the plan. This engine
  has zero of them by design — every Python boundary is Arrow-batched
  (``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``,
  10-100× faster) — and this finding keeps it that way.
* ``OVERSIZED_BROADCAST``              — an EXPLICIT broadcast hint
  (``F.broadcast`` / ``/*+ BROADCAST */``, read from the optimized
  logical plan's ``Join.hint``) whose hinted side is an UNFILTERED base
  relation (nothing but projection / null-rejection filters between the
  relation and the join) that the probe side ALSO streams. A hint forces
  the broadcast at every scale — unlike a stats-driven auto-broadcast,
  which self-corrects once the table outgrows the threshold — and
  hint-broadcasting the same relation you are streaming means the
  "small" side is corpus-sized by construction: an executor-OOM at 100×
  that is invisible at test sf (exactly the r10 q_binary_rerank defect
  this rule exists to catch). Broadcasting an unfiltered small dim into
  a DIFFERENT relation stays legal — dims are broadcast-by-design.

"Reduced" means some node below the boundary provably bounds the row
count crossing it: a (partial) aggregate, a limit, a WindowGroupLimit, a
TakeOrderedAndProject, a k-capping Python sketch stage (MapInPandas), or
a driver-literal/checkpointed constant-size frame (LocalTableScan,
ExistingRDD, Range).

The lint is structural, not statistical — it cannot see that a pushed
filter like ``vec_id < 5`` bounds a side to 5 rows. Such cases are
legitimate plans and carry a per-query allow-list entry with the
documented bound (tests/test_plan_lint.py::ALLOWED).
"""

from __future__ import annotations

# Nodes whose presence below a single-partition boundary proves the row
# count crossing that boundary is bounded (per-partition partials, limits,
# top-k prunes) rather than the full input. Matched by nodeName prefix.
REDUCING_NODES = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "TakeOrderedAndProject",
    "CollectLimit",
    "LocalLimit",
    "GlobalLimit",
    "WindowGroupLimit",
)

# Leaf/stage nodes that are constant-size or k-capped by construction:
# driver literals, checkpointed sketch/centroid frames, Range spines.
# MapInPandas is deliberately NOT here: a mapInPandas stage can expand
# rows arbitrarily (read_warc emits one row per record per file), so it
# proves nothing about the row count above it; queries whose Arrow sketch
# stage genuinely truncates to k per batch carry an explicit allow-list
# entry documenting that bound (tests/test_plan_lint.py::ALLOWED).
BOUNDED_LEAVES = ("LocalTableScan", "Scan ExistingRDD", "Range")


def iter_nodes(jnode):
    """Yield every SparkPlan node, descending through AQE wrappers and
    reused exchanges/subqueries so shared subtrees are still inspected."""
    name = jnode.nodeName()
    if name == "AdaptiveSparkPlan":
        yield from iter_nodes(jnode.initialPlan())
        return
    if name in ("ReusedExchange", "ReusedSubquery"):
        yield from iter_nodes(jnode.child())
        return
    yield jnode
    ch = jnode.children()
    for i in range(ch.size()):
        yield from iter_nodes(ch.apply(i))


def _subtree_reduces(jnode) -> bool:
    for n in iter_nodes(jnode):
        name = n.nodeName()
        if name.startswith(REDUCING_NODES) or name.startswith(BOUNDED_LEAVES):
            return True
    return False


def _bnlj_broadcast_is_bounded(jnode) -> bool:
    """The BNLJ build side must aggregate/limit down or be a driver-literal
    frame; the stream side stays partitioned either way."""
    build_right = "BuildRight" in str(jnode.buildSide())
    return _subtree_reduces(jnode.children().apply(1 if build_right else 0))


def _window_partition_is_empty(jnode) -> bool:
    try:
        return jnode.partitionSpec().size() == 0
    except Exception:
        return False


def _sort_is_global(jnode) -> bool:
    # SortExec.global is a Scala val; py4j exposes it as the accessor
    # method named 'global' (shadowed keyword — reach it via getattr).
    for acc in ("global_", "global"):
        try:
            return bool(getattr(jnode, acc)())
        except Exception:
            continue
    return False


import re as _re

# Null-rejection predicates inserted by equi-join planning select
# essentially every row of a real corpus — they prove nothing about size.
_NULL_ONLY_FILTER = _re.compile(r"isnotnull\([^()]*\)|IsNotNull\([^()]*\)|AND|\s|[(),]")


def _condition_is_null_only(cond: str) -> bool:
    return _NULL_ONLY_FILTER.sub("", cond) == ""


def _iter_logical(jnode):
    yield jnode
    ch = jnode.children()
    for i in range(ch.size()):
        yield from _iter_logical(ch.apply(i))


def _logical_relation_identity(jnode) -> str | None:
    """Stable identity for a logical base relation: its file root paths.
    None for non-file relations (LocalRelation, Python DataSources) —
    the OVERSIZED_BROADCAST rule then stays silent rather than
    false-positive."""
    try:
        return str(jnode.relation().location().rootPaths())
    except Exception:
        return None


def _logical_unfiltered_relation(jnode) -> str | None:
    """If a join side's optimized logical subtree is nothing but
    projection / null-rejection filters over one base relation, return
    that relation's identity; else None (a real Filter / Aggregate /
    Limit / LocalRelation anywhere on the path proves the side is smaller
    than the relation)."""
    node = jnode
    while True:
        name = node.nodeName()
        if name == "Filter":
            try:
                if not _condition_is_null_only(str(node.condition())):
                    return None
            except Exception:
                return None
        elif name in ("Relation", "LogicalRelation"):
            return _logical_relation_identity(node)
        elif name not in ("Project", "SubqueryAlias", "ResolvedHint"):
            return None  # aggregate/limit/join/Arrow stage — bounded or opaque
        ch = node.children()
        if ch.size() != 1:
            return None
        node = ch.apply(0)


def _streamed_relation_identities(jnode) -> set:
    """Relations actually STREAMED in this subtree: a relation sitting
    under a broadcast-hinted join side does not count (q_market_share
    broadcasts nation twice — neither copy streams)."""
    out: set = set()
    name = jnode.nodeName()
    if name in ("Relation", "LogicalRelation"):
        ident = _logical_relation_identity(jnode)
        if ident:
            out.add(ident)
        return out
    skip = set()
    if name == "Join":
        try:
            hint = jnode.hint()
            if _hint_is_broadcast(hint.leftHint()):
                skip.add(0)
            if _hint_is_broadcast(hint.rightHint()):
                skip.add(1)
        except Exception:
            pass
    ch = jnode.children()
    for i in range(ch.size()):
        if i not in skip:
            out |= _streamed_relation_identities(ch.apply(i))
    return out


def _hint_is_broadcast(opt_hint) -> bool:
    try:
        return (not opt_hint.isEmpty()) and "broadcast" in str(opt_hint.get()).lower()
    except Exception:
        return False


def _count_oversized_broadcasts(logical_root) -> int:
    """Count joins where an EXPLICIT broadcast hint covers an unfiltered
    base relation that the probe side also streams (see module doc)."""
    count = 0
    for n in _iter_logical(logical_root):
        if n.nodeName() != "Join":
            continue
        try:
            hint = n.hint()
            left, right = n.children().apply(0), n.children().apply(1)
            sides = (
                (hint.leftHint(), left, right),
                (hint.rightHint(), right, left),
            )
        except Exception:
            continue
        for side_hint, build, probe in sides:
            if not _hint_is_broadcast(side_hint):
                continue
            ident = _logical_unfiltered_relation(build)
            if ident and ident in _streamed_relation_identities(probe):
                count += 1
    return count


def lint_plan(df) -> list[str]:
    """Classify scale anti-patterns in ``df``'s compiled physical plan.
    Returns finding codes (possibly repeated); empty list = clean."""
    findings: list[str] = []
    root = df._jdf.queryExecution().executedPlan()
    findings.extend(
        ["OVERSIZED_BROADCAST"]
        * _count_oversized_broadcasts(df._jdf.queryExecution().optimizedPlan())
    )
    for n in iter_nodes(root):
        name = n.nodeName()
        if name == "CartesianProduct":
            findings.append("CARTESIAN")
        elif name == "BroadcastNestedLoopJoin":
            if not _bnlj_broadcast_is_bounded(n):
                findings.append("BNLJ_UNBOUNDED")
        elif name == "Exchange":
            if "SinglePartition" in n.simpleStringWithNodeId() and not _subtree_reduces(n):
                findings.append("SINGLE_PARTITION_EXCHANGE_UNREDUCED")
        elif name == "Sort":
            if _sort_is_global(n) and not _subtree_reduces(n):
                findings.append("GLOBAL_SORT_UNREDUCED")
        elif name in ("Window", "WindowGroupLimit"):
            if _window_partition_is_empty(n) and not _subtree_reduces(n):
                findings.append(f"GLOBAL_{name.upper()}_UNREDUCED")
        elif name == "BatchEvalPython":
            findings.append("PYTHON_ROW_UDF")
    return findings
