"""Chunker-oracle equivalence on ADVERSARIAL texts.

The driver corpus contains no '\\n\\n' and no sentence punctuation, so the
C3/C4/C5 oracle SQL passes the sf0.01 gate without ever exercising the
paragraph-merge, mid-window-cut, or sentence-split branches. These tests
close that hole: the pure-Python generators (which the Spark pandas UDFs
wrap verbatim — equivalence covered by test_chunkers.py) are compared
against the DuckDB oracle SQL on handcrafted boundary cases and
hypothesis-generated texts. Python <-> DuckDB here plus Spark <-> Python
there proves the full Spark <-> DuckDB claim on every branch.

Alphabet note: chr(1) is excluded — the C5 oracle uses it as its split
marker (a documented assumption about the corpus).
"""

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vectorflow_spark.operators.chunkers import (
    py_chunk_exact_tokens,
    py_chunk_paragraph_chars,
    py_chunk_paragraph_tokens,
    py_chunk_sentence_tokens,
)
from vectorflow_spark.queries import _C1_SQL, _C3_SQL, _C4_SQL, _C5_SQL

SIZE, OVERLAP = 64, 32

# texts that hit every branch: paragraph cuts landing before/inside/at the
# [start+48, start+64) search window, token fallbacks, unicode ellipsis
# sentence endings, >3-digit number token splits, multi-space runs,
# delimiter-adjacent-to-delimiter, trailing separators
CASES = [
    "",
    "word",
    "a. b! c? d… e",
    "a. . b",
    "one two three. " * 30,
    "p" * 47 + "\n\n" + "q" * 100,  # \n\n just BEFORE the search window
    "p" * 48 + "\n\n" + "q" * 100,  # \n\n at the window start
    "p" * 61 + "\n\n" + "q" * 100,  # \n\n ending exactly at start+size-1
    "p" * 62 + "\n\n" + "q" * 100,  # \n\n would end past start+size -> no cut
    "p" * 63 + "\n\n" + "q" * 100,
    ("para one with words\n\n" * 6) + "tail",
    "\n\n\n\nleading seps",
    "trailing seps\n\n\n\n",
    "word " * 200,  # forces C1 fallback in C3 and C5
    "12345 678901 tokens! and. more? sentences… " * 8,
    "short\n\n" + "word " * 120 + "\n\nshort2",
    "no separators here just a very long run " * 10,
    "a.  b.   c",  # multi-space delimiter runs
]


def _duck(sql: str, text: str) -> list[tuple]:
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": [1], "text": [text]}))
    rows = con.sql(sql).fetchall()
    con.close()
    # (doc_id, chunk_seq, chunk_offset, chunk_tag, text) sorted by seq
    return sorted([(r[1], r[2], r[3], r[4]) for r in rows])


def _py(fn, text: str) -> list[tuple]:
    return sorted(
        (seq, off, tag, t) for seq, (t, off, tag) in enumerate(fn(text, SIZE, OVERLAP))
    )


PAIRS = [
    (py_chunk_exact_tokens, _C1_SQL, "C1"),
    (py_chunk_paragraph_tokens, _C3_SQL, "C3"),
    (py_chunk_paragraph_chars, _C4_SQL, "C4"),
    (py_chunk_sentence_tokens, _C5_SQL, "C5"),
]


@pytest.mark.parametrize("fn,sql,tag", PAIRS, ids=[p[2] for p in PAIRS])
@pytest.mark.parametrize("text", CASES)
def test_oracle_matches_python_on_boundary_cases(fn, sql, tag, text):
    assert sql is not None, "oracle must be registered under the regex backend"
    assert _duck(sql, text) == _py(fn, text)


@settings(max_examples=60, deadline=None)
@given(
    st.text(
        alphabet="ab .!?…\n0123456789\té",
        min_size=0,
        max_size=400,
    )
)
def test_oracle_matches_python_on_random_texts(text):
    for fn, sql, _ in PAIRS:
        assert _duck(sql, text) == _py(fn, text), (fn.__name__, repr(text))
