"""Structural correctness-gate invariants.

Round-7 verdict: the driver has no rows-only mode — any ``queries()`` entry
without an ``oracle_sql()`` entry is an automatic ``err: no_oracle`` whenever
the sampler draws it. These tests pin the invariant that the lottery is
empty (every query is oracle-backed) and that the two round-8 constants
oracles re-derive from their engines, so a silent engine change fails here
loudly instead of mysteriously at the driver gate.
"""

from __future__ import annotations

import uuid


def test_every_query_has_an_oracle():
    from vectorflow_spark.queries import ORACLE, QUERIES

    missing = sorted(set(QUERIES) - set(ORACLE))
    assert missing == [], f"queries without oracle_sql (driver errs no_oracle): {missing}"


def test_uuid5_constants_rederive():
    from vectorflow_spark.functions.ids import VECTORFLOW_NAMESPACE
    from vectorflow_spark.queries.pipeline import _UUID5_EXPECTED

    assert len(_UUID5_EXPECTED) == 200
    for i, expect in _UUID5_EXPECTED:
        assert str(uuid.uuid5(VECTORFLOW_NAMESPACE, f"vf-{i}-doc")) == expect


def test_bpe_constants_rederive():
    from vectorflow_spark.functions.bpe import BPETokenizer, train_ranks
    from vectorflow_spark.queries.curation import _BPE_EXPECTED, _BPE_PROBE, _BPE_SEED

    tok = BPETokenizer(train_ranks(_BPE_SEED, n_merges=128))
    assert len(_BPE_PROBE) == 16
    assert len(set(_BPE_PROBE)) == 16
    for m, n_chars, n_tokens in _BPE_EXPECTED:
        s = _BPE_PROBE[m]
        assert len(s) == n_chars, (m, s)
        assert len(tok.encode(s)) == n_tokens, (m, s)
