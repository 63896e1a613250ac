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


def test_registry_names_unique_and_assert_armed():
    """A duplicate @query registration silently replaced the earlier gate
    for two rounds (q_weighted_subsample, r11 verdict item 1). The deco
    now asserts uniqueness; pin both the assert and the restored gate."""
    import pytest

    from vectorflow_spark.queries import QUERIES
    from vectorflow_spark.queries._core import query

    assert "q_weighted_subsample" in QUERIES
    assert "q_weighted_sample" in QUERIES
    existing = next(iter(QUERIES))
    with pytest.raises(AssertionError, match="duplicate query registration"):
        query(existing)(lambda spark, sf_dir: None)
    # the failed registration must not have clobbered the live gate
    assert QUERIES[existing] is not None


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


def test_adpcm_constants_rederive_from_audioop():
    """The q_adpcm_roundtrip VALUES table must re-derive from an
    independent WAV-IMA decoder built ONLY on stdlib audioop (nibble
    swap per block + header-seeded adpcm2lin) — never from aiffmini's
    own DP."""
    import struct
    import warnings

    import numpy as np

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    from vectorflow_spark.operators.aiffmini import encode_wav_ima_adpcm
    from vectorflow_spark.queries.audio import _ADPCM_EXPECTED

    def independent_decode(blob: bytes) -> np.ndarray:
        assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
        o, fmt, payload, n_total = 12, None, None, None
        end = 8 + struct.unpack_from("<I", blob, 4)[0]
        while o + 8 <= end:
            fourcc = blob[o : o + 4]
            (size,) = struct.unpack_from("<I", blob, o + 4)
            body = o + 8
            if fourcc == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", blob, body)
            elif fourcc == b"fact":
                (n_total,) = struct.unpack_from("<I", blob, body)
            elif fourcc == b"data":
                payload = blob[body : body + size]
            o = body + size + (size & 1)
        block_align = fmt[4]
        out: list[int] = []
        remaining = n_total
        for b0 in range(0, len(payload), block_align):
            block = payload[b0 : b0 + block_align]
            pred, idx = struct.unpack_from("<hB", block, 0)
            swapped = bytes(((b & 0x0F) << 4) | (b >> 4) for b in block[4:])
            lin, _ = audioop.adpcm2lin(swapped, 2, (pred, idx))
            samples = ([pred] + list(np.frombuffer(lin, "<i2")))[:remaining]
            remaining -= len(samples)
            out.extend(int(x) for x in samples)
            if remaining == 0:
                break
        return np.array(out, dtype=np.int64)

    assert len(_ADPCM_EXPECTED) == 160
    for i, n, total, lo, hi, first, last in _ADPCM_EXPECTED:
        s = np.array(
            [(((i + 3) * (k * k + 7 * k + 1)) % 6007) - 3003 for k in range(n)],
            dtype=np.int16,
        )
        v = independent_decode(encode_wav_ima_adpcm(s, 8000, block_frames=33))
        assert len(v) == n
        assert (int(v.sum()), int(v.min()), int(v.max()), int(v[0]), int(v[-1])) == (
            total,
            lo,
            hi,
            first,
            last,
        ), i
