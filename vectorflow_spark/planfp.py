"""Plan fingerprints: a stable hash of a query's compiled physical plan,
used by the standing sf1 gate (scripts/bench_sf1.py --touched) to decide
which gates need re-measuring at sf1 — only the ones whose PLAN changed
since the committed fingerprint file (r9 verdict item 3 / r10 item 2:
the full sf1 suite is a ~25-minute run; the per-round delta is a handful
of gates).

The fingerprint must be identical across Spark sessions for unchanged
code, so everything session- or run-specific is normalized away:
expression ids (``#123``), object addresses (``0x7f...``), absolute file
paths/locations, plan ids, and collapsed whitespace. Plans are compiled
at a FIXED small sf dir (stats-driven strategy flips between sf dirs are
out of scope — this is a code-change detector, not a plan oracle; the
plan-shape gates live in tests/test_plans.py and tests/test_plan_lint.py).
"""

from __future__ import annotations

import hashlib
import re

_NORMALIZERS = (
    (re.compile(r"#\d+[A-Za-z]*"), "#"),            # expression ids  #123L
    (re.compile(r"0x[0-9a-fA-F]+"), "0x"),          # python object addrs
    (re.compile(r"plan_id=\d+"), "plan_id="),
    (re.compile(r"gid#? ?= ?\d+"), "gid="),         # distinct-agg group ids
    # HOF lambda variables carry a session-global counter (x_11, y_12)
    (re.compile(r"\b(lambda [A-Za-z]+)_\d+"), r"\1"),
    (re.compile(r"file:[^\s,\]\)]*"), "file:"),     # scan locations
    (re.compile(r"/[^\s,\]\)]*(?:parquet|avro|orc|testdata)[^\s,\]\)]*"), "<path>"),
    (re.compile(r"Statistics\([^)]*\)"), "Statistics()"),
    (re.compile(r"<(?:function|lambda)[^>]*>"), "<fn>"),
    (re.compile(r"\s+"), " "),
)

_INNER_BRACKET = re.compile(r"\[([^\[\]]*)\]")
_LONE_INT = re.compile(r"\d+")


def _canon_brackets(s: str) -> str:
    """Sort the comma-separated elements of every bracketed list (inner
    to outer) and blank lone-integer elements. Spark's
    RewriteDistinctAggregates rule orders the Expand projections and the
    per-group FILTER clauses by expression-id allocation, which advances
    with everything the session has planned before — so the same query
    compiles to a semantically-identical but textually PERMUTED plan
    (swapped group order, renumbered gid literals) depending on session
    history. Canonicalizing list order (and the gid literals riding in
    the Expand rows) makes the fingerprint a function of the plan, not
    of when it was compiled. Cost: a pure same-element reorder inside one
    node no longer changes the hash — acceptable for a re-measure
    trigger, the plan-SHAPE gates live in tests/test_plans.py."""

    def canon(m: re.Match) -> str:
        items = [x.strip() for x in m.group(1).split(",")]
        items = ["_" if _LONE_INT.fullmatch(x) else x for x in items]
        return "{" + ",".join(sorted(items)) + "}"

    prev = None
    while prev != s:
        prev = s
        s = _INNER_BRACKET.sub(canon, s)
    return s


_HASHPART = re.compile(r"hashpartitioning\(([^()]*)\)")


def normalize_plan_string(s: str) -> str:
    """Scrub session-specific tokens, then canonicalize list order."""
    for rx, repl in _NORMALIZERS:
        s = rx.sub(repl, s)
    # shuffle key order inside hashpartitioning() is semantically
    # irrelevant and permutes with the distinct-agg rewrite too
    s = _HASHPART.sub(
        lambda m: "hashpartitioning("
        + ",".join(sorted(x.strip() for x in m.group(1).split(",")))
        + ")",
        s,
    )
    return _canon_brackets(s).strip()


def normalized_plan(df) -> str:
    """The executedPlan string with session-specific tokens scrubbed.

    Scan-node metadata (PushedFilters, ReadSchema, Location) is truncated
    by Spark at ``spark.sql.maxMetadataStringLength`` (default 100) chars
    BEFORE this function scrubs expression ids — so the visible text, and
    therefore the fingerprint, shifted with the LENGTH of the session's
    expression ids (``ts#123`` vs ``ts#12345``), making gates with long
    pushed-filter strings flap between 'touched' and 'unchanged' across
    sessions. Raise the limit while rendering so no metadata is cut and
    the scrubbed string is id-length-invariant; restore it after.

    CONCURRENCY CAVEAT (r11 ADVICE item 4): the override is session-wide
    for the set/render/restore window. Every current caller (bench_sf1,
    dump_plans, tests) fingerprints single-threaded; if a parallel gate
    runner ever fingerprints concurrently, wrap this in a lock or use a
    cloned session per call."""
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, 10000)
    try:
        s = df._jdf.queryExecution().executedPlan().toString()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return normalize_plan_string(s)


def plan_fingerprint(df) -> str:
    return hashlib.sha256(normalized_plan(df).encode()).hexdigest()[:16]


def select_touched(
    current: dict[str, str],
    stored: dict[str, str],
    budgeted: set[str],
) -> dict[str, str]:
    """Which gates need an sf1 re-measure, and why. A gate is touched when
    its plan fingerprint changed ('plan-changed'), it has no stored
    fingerprint ('new-gate'), or it has no frozen sf1 budget yet
    ('no-budget'). Errors computing a fingerprint surface as
    'fingerprint-error:<name>' — never silently skipped."""
    out: dict[str, str] = {}
    for name, fp in current.items():
        old = stored.get(name)
        if old is None:
            out[name] = "new-gate"
        elif fp != old:
            out[name] = "plan-changed"
        elif name not in budgeted:
            out[name] = "no-budget"
    return out


def classify_sf1(
    name: str,
    sf1_s: float,
    sf01_s: float | None,
    budgets: dict,
    *,
    tol: float = 2.0,
    abs_slack: float = 0.75,
) -> list[str]:
    """Findings for one gate's sf1 measurement against the frozen sf1
    budget file (BENCH_sf1_budgets.json):

    * ``SUPERLINEAR`` — alpha(0.1 -> 1) > 1.0 (sf1 time worse than 10x
      the same-session sf0.1 time) without a recorded adjudication.
      Super-linear scaling is the one thing a 100 TB design cannot
      absorb, so this fails loudly.
    * ``SF1_BUDGET_BREACH`` — sf1 time above frozen_sf1_s * tol +
      abs_slack (same two-sided discipline as the sf0.1 budgets).
    """
    import math

    findings: list[str] = []
    entry = (budgets.get("queries") or {}).get(name) or {}
    adjudications = budgets.get("adjudications") or {}
    if sf01_s and sf01_s > 0:
        alpha = math.log10(max(sf1_s, 1e-3) / sf01_s)
        if alpha > 1.0 and name not in adjudications:
            findings.append("SUPERLINEAR")
    frozen = entry.get("sf1_s")
    if frozen is not None and sf1_s > frozen * tol + abs_slack:
        findings.append("SF1_BUDGET_BREACH")
    return findings
