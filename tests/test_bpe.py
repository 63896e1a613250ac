"""BPE engine tests (functions/bpe.py): merge-order semantics match the
published tiktoken algorithm (greedy lowest-RANK adjacent pair, not
left-to-right), round-trip invertibility over arbitrary unicode, the
.tiktoken file loader, deterministic training, pickling, and the
tokenizer.py env-var backend wiring (reference src/worker/worker.py:191
tokenizes with tiktoken cl100k_base — this engine is bit-identical given
the same ranks file)."""

from __future__ import annotations

import base64
import importlib
import pickle

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vectorflow_spark.functions import tokenizer
from vectorflow_spark.functions.bpe import (
    CL100K_PATTERN,
    BPETokenizer,
    byte_ranks,
    train_ranks,
)


def toy(merges: dict[bytes, int]) -> BPETokenizer:
    r = byte_ranks()
    r.update(merges)
    return BPETokenizer(r)


def test_merge_order_is_rank_order_not_position_order():
    # "abc": with ab ranked lower than bc, ab merges first -> [ab, c]
    t1 = toy({b"ab": 256, b"bc": 257})
    assert t1.encode("abc") == [256, ord("c")]
    # flip the ranks: bc merges first -> [a, bc]
    t2 = toy({b"bc": 256, b"ab": 257})
    assert t2.encode("abc") == [ord("a"), 256]


def test_cascading_merges():
    # ab -> 256, then (ab)+c -> 258 requires the table to key on the MERGED
    # bytes "abc"
    t = toy({b"ab": 256, b"abc": 258})
    assert t.encode("abc") == [258]
    assert t.decode([258]) == "abc"


def test_whole_piece_fast_path():
    t = toy({b"hello": 300, b"he": 256})
    assert t.encode("hello") == [300]


def test_single_byte_coverage_required():
    r = byte_ranks()
    del r[b"a"]
    with pytest.raises(ValueError, match="256 single bytes"):
        BPETokenizer(r)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_roundtrip_any_unicode(s):
    t = toy({b"ab": 256, b"th": 257, b"the": 258, b"  ": 259})
    assert t.decode(t.encode(s)) == s


def test_roundtrip_multibyte_and_newlines():
    t = toy({})
    for s in ["héllo wörld", "日本語のテキスト", "emoji 🎉🎊 mix", "a\r\nb\n\nc\t d"]:
        assert t.decode(t.encode(s)) == s


def test_cl100k_pretokenizer_shape():
    pytest.importorskip("regex")
    t = BPETokenizer(byte_ranks(), CL100K_PATTERN)
    pieces = t._pat.findall("Hello world123 it's\n\n")
    assert pieces == ["Hello", " world", "123", " it", "'s", "\n\n"]
    # digit runs cap at 3 — the cl100k rule that keeps big numbers multi-token
    assert t._pat.findall("12345") == ["123", "45"]


def test_tiktoken_file_loader(tmp_path):
    lines = [base64.b64encode(bytes([i])) + b" " + str(i).encode() for i in range(256)]
    lines.append(base64.b64encode(b"ab") + b" 256")
    p = tmp_path / "toy.tiktoken"
    p.write_bytes(b"\n".join(lines) + b"\n")
    t = BPETokenizer.from_tiktoken_file(str(p))
    assert t.encode("abab") == [256, 256]
    assert t.decode(t.encode("abab")) == "abab"


def test_train_ranks_deterministic_and_useful():
    corpus = ["the cat sat on the mat", "the bat and the rat"] * 3
    r1 = train_ranks(corpus, n_merges=20)
    r2 = train_ranks(corpus, n_merges=20)
    assert r1 == r2
    assert 256 < len(r1) <= 256 + 20
    t = BPETokenizer(r1)
    # "the" is the most frequent word: must compress below its byte length
    assert len(t.encode("the")) < 3
    for s in corpus:
        assert t.decode(t.encode(s)) == s


def test_pickle_roundtrip():
    t = toy({b"ab": 256})
    t.encode("abab")  # warm the lru cache — must not break pickling
    t2 = pickle.loads(pickle.dumps(t))
    assert t2.encode("abab") == [256, 256]


def test_tokenizer_env_backend_wiring(tmp_path, monkeypatch):
    """tokenizer.py selects the BPE backend at import when
    VECTORFLOW_SPARK_BPE_FILE is set — the same decision each Spark Python
    worker makes on module import, so no driver-side state needs shipping."""
    lines = [base64.b64encode(bytes([i])) + b" " + str(i).encode() for i in range(256)]
    lines.append(base64.b64encode(b"ab") + b" 256")
    p = tmp_path / "toy.tiktoken"
    p.write_bytes(b"\n".join(lines) + b"\n")
    monkeypatch.setenv(tokenizer.BPE_FILE_ENV, str(p))
    try:
        mod = importlib.reload(tokenizer)
        assert mod.BACKEND == "bpe"
        ids = mod.encode("abab xyz")
        assert all(isinstance(i, int) for i in ids)
        assert mod.decode(ids) == "abab xyz"
        assert mod.count_tokens("abab") == 2
    finally:
        monkeypatch.delenv(tokenizer.BPE_FILE_ENV)
        mod = importlib.reload(tokenizer)
        assert mod.BACKEND == "regex"
        # invertibility still holds on the fallback path
        assert mod.decode(mod.encode("abab xyz")) == "abab xyz"


def test_distributed_train_matches_inmemory(spark):
    """The cluster trainer must produce the IDENTICAL merges table (same
    merges, same order) as functions.bpe.train_ranks, and the resulting
    tokenizer must encode identically."""
    from vectorflow_spark.functions.bpe import BPETokenizer, train_ranks
    from vectorflow_spark.operators.textstats import distributed_train_ranks

    corpus = [
        "the cat sat on the mat. the cat sat again!",
        "low lower lowest, slow slower slowest",
        "banana bandana ananas",
        "numbers 12345 and 99 mix with words",
    ] * 3
    want = train_ranks(corpus, 25)
    docs = spark.createDataFrame([(t,) for t in corpus], ["text"])
    got = distributed_train_ranks(docs, 25)
    assert got == want
    probe = "the slowest banana numbers 99"
    assert BPETokenizer(got).encode(probe) == BPETokenizer(want).encode(probe)
