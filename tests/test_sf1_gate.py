"""The standing sf1 gate's machinery (r9 item 3 / r10 item 2):
plan-fingerprint normalization, touched-gate selection, and the sf1
budget classifier — plus pins that the committed artifacts exist and
cover every gate."""

from __future__ import annotations

import json
import os

from vectorflow_spark.planfp import (
    classify_sf1,
    normalize_plan_string,
    select_touched,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestNormalization:
    def test_session_specific_tokens_scrubbed(self):
        a = normalize_plan_string(
            "HashAggregate(keys=[k#123L], functions=[sum(v#45)]) "
            "+- FileScan parquet [k#123L,v#45] Location: InMemoryFileIndex"
            "(1 paths)[file:/tmp/x.parquet], plan_id=77 <lambda at 0x7f3a2b>"
        )
        b = normalize_plan_string(
            "HashAggregate(keys=[k#9L], functions=[sum(v#2)]) "
            "+- FileScan parquet [k#9L,v#2] Location: InMemoryFileIndex"
            "(1 paths)[file:/other/y.parquet], plan_id=3 <lambda at 0xdeadbeef>"
        )
        assert a == b

    def test_distinct_agg_permutation_is_canonical(self):
        """Spark's RewriteDistinctAggregates orders Expand rows / gid
        literals by expression-id allocation — session history. The
        fingerprint must not change when the same query compiles with
        permuted groups and renumbered gids (the exact drift observed on
        q_distinct_agg / q_profile_table)."""
        a = normalize_plan_string(
            "HashAggregate(keys=[r#1], functions=[count(p#2) FILTER "
            "(WHERE (gid#9 = 1)), count(s#3) FILTER (WHERE (gid#9 = 2))]) "
            "+- Exchange hashpartitioning(r#1, p#2, s#3, gid#9, 32) "
            "+- Expand [[r#1, p#2, null, 1], [r#1, null, s#3, 2]]"
        )
        b = normalize_plan_string(
            "HashAggregate(keys=[r#4], functions=[count(s#6) FILTER "
            "(WHERE (gid#7 = 1)), count(p#5) FILTER (WHERE (gid#7 = 2))]) "
            "+- Exchange hashpartitioning(r#4, s#6, p#5, gid#7, 32) "
            "+- Expand [[r#4, null, s#6, 1], [r#4, p#5, null, 2]]"
        )
        assert a == b

    def test_hof_lambda_counter_is_canonical(self):
        """Higher-order-function lambda variables carry a session-global
        counter (lambda x_11#, y_12#) that advances with every lambda the
        session compiles — same query, different session history, same
        fingerprint required."""
        a = normalize_plan_string(
            "Project [aggregate(emb#1, lambdafunction((lambda x_11# + "
            "lambda y_12#), lambda x_11#, lambda y_12#)) AS s#2]"
        )
        b = normalize_plan_string(
            "Project [aggregate(emb#9, lambdafunction((lambda x_45# + "
            "lambda y_46#), lambda x_45#, lambda y_46#)) AS s#8]"
        )
        assert a == b

    def test_real_changes_still_differ(self):
        a = normalize_plan_string("SortMergeJoin [k#1], [k#2], Inner")
        b = normalize_plan_string("BroadcastHashJoin [k#1], [k#2], Inner")
        assert a != b
        c = normalize_plan_string("Filter (v#1 > 5)")
        d = normalize_plan_string("Filter (v#1 > 500)")
        assert c != d  # lone-int blanking applies inside brackets only


class TestSelectTouched:
    def test_reasons(self):
        current = {"q_a": "f1", "q_b": "f2", "q_c": "f3", "q_d": "f4"}
        stored = {"q_a": "f1", "q_b": "OLD", "q_d": "f4"}
        budgeted = {"q_a", "q_b", "q_c"}
        out = select_touched(current, stored, budgeted)
        assert out == {
            "q_b": "plan-changed",
            "q_c": "new-gate",
            "q_d": "no-budget",
        }

    def test_untouched_is_empty(self):
        fp = {"q_a": "x", "q_b": "y"}
        assert select_touched(fp, dict(fp), {"q_a", "q_b"}) == {}


class TestClassifySf1:
    BUDGETS = {
        "adjudications": {"q_known": "test-data artifact"},
        "queries": {"q_x": {"sf1_s": 2.0}, "q_known": {"sf1_s": 30.0}},
    }

    def test_clean_gate(self):
        assert classify_sf1("q_x", 2.1, 0.3, self.BUDGETS) == []

    def test_superlinear_fails(self):
        # sf1 = 15x the sf0.1 base -> alpha > 1
        assert "SUPERLINEAR" in classify_sf1("q_y", 4.5, 0.3, self.BUDGETS)

    def test_adjudicated_superlinear_passes(self):
        found = classify_sf1("q_known", 33.0, 2.9, self.BUDGETS)
        assert "SUPERLINEAR" not in found

    def test_budget_breach(self):
        # frozen 2.0 -> bound 2.0*2 + 0.75 = 4.75
        assert classify_sf1("q_x", 4.9, 1.0, self.BUDGETS) == ["SF1_BUDGET_BREACH"]
        assert classify_sf1("q_x", 4.6, 1.0, self.BUDGETS) == []

    def test_no_base_no_alpha_check(self):
        assert classify_sf1("q_y", 99.0, None, self.BUDGETS) == []


class TestCommittedArtifacts:
    """Every gate has a frozen sf1 budget and a stored plan fingerprint —
    the coverage pin that makes --touched a standing gate instead of a
    manual ritual (r9 item 3)."""

    def _gates(self):
        import __spark_entry__ as m

        return set(m.queries()) | {"e2e_pipeline"}

    def test_budgets_cover_every_gate(self):
        with open(os.path.join(REPO, "BENCH_sf1_budgets.json")) as f:
            budgets = json.load(f)
        missing = self._gates() - set(budgets["queries"])
        assert not missing, f"gates without frozen sf1 budgets: {sorted(missing)}"
        assert budgets["frozen_from_round"] >= 11

    def test_fingerprints_cover_every_gate(self):
        with open(os.path.join(REPO, "SF1_plan_fingerprints.json")) as f:
            fps = json.load(f)
        missing = self._gates() - set(fps)
        assert not missing, f"gates without stored fingerprints: {sorted(missing)}"

    def test_superlinear_budgets_all_adjudicated(self):
        with open(os.path.join(REPO, "BENCH_sf1_budgets.json")) as f:
            budgets = json.load(f)
        bad = {
            n: q["alpha"]
            for n, q in budgets["queries"].items()
            if q.get("alpha") is not None
            and q["alpha"] > 1.0
            and n not in budgets["adjudications"]
        }
        assert not bad, f"frozen super-linear gates without adjudication: {bad}"


class TestFingerprintStability:
    def test_fingerprint_invariant_to_expression_id_length(self, spark, sf_dir):
        """Scan metadata is truncated at spark.sql.maxMetadataStringLength
        BEFORE id scrubbing, so without the normalized_plan conf override a
        gate with >100-char pushed-filter text (q_funnel_conversion) shifted
        its truncation point — and its fingerprint — with the LENGTH of the
        session's expression ids, flapping the --touched selector. Three
        back-to-back builds (ids grow monotonically in-session) must agree,
        and the rendered scan metadata must be untruncated."""
        import __spark_entry__ as m

        from vectorflow_spark.planfp import normalized_plan, plan_fingerprint

        q = m.queries()["q_funnel_conversion"]
        fps = {plan_fingerprint(q(spark, sf_dir)) for _ in range(3)}
        assert len(fps) == 1, f"unstable fingerprints: {fps}"
        assert "..." not in normalized_plan(q(spark, sf_dir))
