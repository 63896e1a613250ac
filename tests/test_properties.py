"""Property-based tests (hypothesis) for the pure chunker/batch kernels,
plus seeded-random Spark-vs-Python parity batches.

The pure-Python kernels (operators/chunkers.py py_*) are the executable
spec; hypothesis hammers their invariants cheaply. One Spark job per
parity test then checks the distributed implementation agrees with the
spec on a generated corpus — so the expensive path runs once, not once
per example.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vectorflow_spark.operators.chunkers import (
    py_chunk_exact_chars,
    py_chunk_sentence_chars,
)

TEXT = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
    min_size=0,
    max_size=400,
)


@given(text=TEXT, size=st.integers(2, 64), overlap_frac=st.floats(0.0, 0.9))
@settings(max_examples=200, deadline=None)
def test_exact_chars_invariants(text, size, overlap_frac):
    overlap = int(size * overlap_frac)
    stride = size - overlap
    chunks = py_chunk_exact_chars(text, size, overlap)
    if not text:
        assert chunks == []
        return
    # every chunk obeys the window contract
    for chunk_text, offset, tag in chunks:
        assert chunk_text == text[offset : offset + size]
        assert 1 <= len(chunk_text) <= size
        assert tag == "exact"
    # offsets are exactly the stride grid
    assert [o for _, o, _ in chunks] == list(range(0, len(text), stride))
    # the non-overlapping prefixes reconstruct the document
    rebuilt = "".join(c[:stride] for c, _, _ in chunks[:-1]) + chunks[-1][0]
    assert rebuilt == text


@given(text=TEXT, size=st.integers(4, 64))
@settings(max_examples=200, deadline=None)
def test_sentence_chars_invariants(text, size):
    overlap = size // 2
    chunks = py_chunk_sentence_chars(text, size, overlap)
    # whole sentences stay intact; oversized ones fall back to windows
    for chunk_text, _, tag in chunks:
        assert tag in ("sentence", "exact")
        if tag == "sentence":
            assert len(chunk_text) <= size
        else:
            assert len(chunk_text) <= size
    # every character of every sentence is covered by some chunk
    total = sum(len(c) for c, _, t in chunks if t == "sentence")
    assert total <= max(len(text), 1) or any(t == "exact" for _, _, t in chunks)


@given(
    lines=st.lists(st.text(alphabet="ab", max_size=5), min_size=0, max_size=50),
    trailing=st.booleans(),
    n=st.integers(1, 10),
)
@settings(max_examples=200, deadline=None)
def test_batch_count_matches_splitlines(lines, trailing, n):
    """ceil(splitlines/n) — including the trailing-newline edge the
    reference's split_file inherits from str.splitlines."""
    text = "\n".join(lines) + ("\n" if trailing and lines else "")
    expected_lines = len(text.splitlines())
    expected_batches = -(-expected_lines // n) if expected_lines else 0
    # mirror batch_counts' expression semantics in pure python
    if not text:
        got_lines = 0
    elif text.endswith("\n"):
        got_lines = len(text.split("\n")) - 1
    else:
        got_lines = len(text.split("\n"))
    assert got_lines == expected_lines
    assert -(-got_lines // n) == expected_batches


@pytest.fixture(scope="module")
def random_docs():
    rng = np.random.RandomState(0)
    words = ["alpha", "beta", "gamma", "delta", "x", "punct.", "q?", "end!"]
    docs = []
    for i in range(40):
        n = int(rng.randint(0, 60))
        docs.append((i, " ".join(rng.choice(words, n)) if n else ""))
    return docs


def test_spark_exact_chunker_matches_python_spec(spark, random_docs):
    from vectorflow_spark.config import ChunkStrategy, PipelineConfig
    from vectorflow_spark.operators.chunkers import chunk

    cfg = PipelineConfig(
        chunk_strategy=ChunkStrategy.EXACT_BY_CHARACTERS, chunk_size=24, chunk_overlap=8
    )
    df = spark.createDataFrame(random_docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_offset"]): r["text"]
        for r in chunk(df, cfg, with_ids=False).collect()
    }
    expected = {}
    for doc_id, text in random_docs:
        for chunk_text, offset, _ in py_chunk_exact_chars(text, 24, 8):
            expected[(doc_id, offset)] = chunk_text
    assert got == expected


def test_spark_sessionize_matches_python_spec(spark):
    from vectorflow_spark.streaming.pipeline import sessionize_batch

    rng = np.random.RandomState(1)
    rows = []
    for user in range(10):
        t = 0
        for _ in range(rng.randint(1, 40)):
            t += int(rng.choice([10, 100, 2000, 4000]))
            rows.append((user, t))
    df = spark.createDataFrame(rows, "user_id long, ts long")
    got = {
        (r["user_id"], r["session_id"]): (r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_batch(df, gap_seconds=1800).collect()
    }
    # python spec: gap > 1800 starts a new session
    expected = {}
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, t in rows:
        by_user[u].append(t)
    for u, ts in by_user.items():
        ts.sort()
        sid, start, last, n = 0, ts[0], ts[0], 0
        for t in ts:
            if t - last > 1800:
                expected[(u, sid)] = (start, last, n)
                sid, start, n = sid + 1, t, 0
            last, n = t, n + 1
        expected[(u, sid)] = (start, last, n)
    assert got == expected


def test_span_overlap_counts_matches_bruteforce_randomized(spark):
    """Property test for operators/events.span_overlap_counts: on random
    day-confined spans and sub-day windows (including exact-boundary ties
    and midnight crossings), the order-statistics counts must equal the
    O(n*m) python brute force."""
    import random

    rnd = random.Random(42)
    D = 100
    spans = []
    for u in range(1, 25):
        for d in range(0, 4):
            if rnd.random() < 0.7:
                a = rnd.randrange(d * D, (d + 1) * D)
                b = rnd.randrange(a, (d + 1) * D)
                spans.append((u, d, a, b))
    incidents = []
    for e in range(200):
        t0 = rnd.randrange(0, 4 * D)
        # window shorter than a day; bias some ends onto exact span bounds
        t1 = t0 + rnd.randrange(0, D - 1)
        if rnd.random() < 0.3 and spans:
            s = rnd.choice(spans)
            # bias the end onto an exact span bound, clamped to the
            # operator's sub-day window contract
            t1 = min(max(t0, rnd.choice([s[2], s[3]])), t0 + D - 1)
        incidents.append((e, t0, t1))

    want = {}
    for e, t0, t1 in incidents:
        hits = [(u, d) for (u, d, a, b) in spans if a <= t1 and t0 <= b]
        if hits:
            want[e] = (len(hits), len({u for u, _ in hits}))

    from vectorflow_spark.operators.events import span_overlap_counts

    sdf = spark.createDataFrame(
        spans, "user_id long, day_id long, s_start long, s_end long"
    )
    idf = spark.createDataFrame(incidents, "event_id long, i_start long, i_end long")
    got = {
        r["event_id"]: (r["n_spans"], r["n_users"])
        for r in span_overlap_counts(sdf, idf, D).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Round 3: stdlib container parsers — fuzz the encode->extract roundtrips.
# These run WITHOUT Spark (pure kernels), so hypothesis can hammer them.
# ---------------------------------------------------------------------------

# PDF literal strings normalize raw CR to LF per spec; the writer escapes
# CR as octal so the roundtrip is exact — include every escape-relevant
# character class plus unicode.
_pdf_text = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters=[]
    ),
    max_size=400,
)


@given(pages=st.lists(_pdf_text, min_size=1, max_size=4))
@settings(max_examples=150, deadline=None)
def test_pdf_roundtrip_fuzz(pages):
    from vectorflow_spark.sources.pdfmini import build_pdf, extract_pdf_text

    assert extract_pdf_text(build_pdf(pages)) == "".join(p + "\n" for p in pages)


# XML 1.0 cannot carry C0 controls other than \t \n \r (not even as
# entities) — build_docx refuses them loudly; fuzz the legal space.
_xml_text = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters=[c for c in map(chr, range(0x20)) if c not in "\t\n\r"]
        + ["￾", "￿"],  # CR itself is fine: the writer emits &#13;
    ),
    max_size=400,
)


@given(text=_xml_text)
@settings(max_examples=150, deadline=None)
def test_docx_roundtrip_fuzz(text):
    from vectorflow_spark.sources.docxmini import build_docx, extract_docx_text

    assert extract_docx_text(build_docx(text)) == text


def test_docx_refuses_xml_illegal_controls():
    import pytest as _pytest

    from vectorflow_spark.sources.docxmini import build_docx

    with _pytest.raises(ValueError, match="not representable"):
        build_docx("bell \x07 char")
    with _pytest.raises(ValueError, match="not representable"):
        build_docx("\x08")


def _reference_remove_spans(corpus: list[tuple[int, str]], w: int) -> dict[int, tuple[str, int]]:
    """Independent pure-Python model of remove_duplicate_spans: global
    keep-first by (doc, pos) on case-insensitive w-word span keys."""
    toks = {d: [t for t in text.split() if t] for d, text in corpus}
    first_seen: dict[tuple, tuple[int, int]] = {}
    removable: dict[int, set[int]] = {d: set() for d, _ in corpus}
    for d in sorted(toks):
        ts = toks[d]
        for i in range(len(ts) - w + 1):
            key = tuple(x.lower() for x in ts[i : i + w])
            if key in first_seen:
                removable[d].update(range(i, i + w))
            else:
                first_seen[key] = (d, i)
    out = {}
    for d, _ in corpus:
        kept = [t for j, t in enumerate(toks[d]) if j not in removable[d]]
        out[d] = (" ".join(kept), len(toks[d]) - len(kept))
    return out


def test_remove_spans_matches_reference_model(spark):
    """Engine vs independent pure-Python model on a collision-heavy
    corpus: 40 docs over a 6-word alphabet, so duplicated 4-word spans
    are everywhere, overlaps union, and keep-first ordering is exercised
    across documents. Seeded — deterministic."""
    import random

    from vectorflow_spark.operators.dedup import remove_duplicate_spans

    rng = random.Random(42)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    corpus = [
        (d, " ".join(rng.choice(words) for _ in range(rng.randint(2, 30))))
        for d in range(40)
    ]
    model = _reference_remove_spans(corpus, w=4)
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_removed_tokens)
        for r in remove_duplicate_spans(docs, window=4).collect()
    }
    assert got == model
