"""Byte-level BPE engine — tiktoken-compatible by construction.

The reference tokenizes with tiktoken ``cl100k_base``
(reference src/worker/worker.py:191). tiktoken is unavailable in this
environment, but tiktoken is not magic: it is byte-level BPE driven by two
public artifacts — a pre-tokenizer regex and a mergeable-ranks table mapping
byte sequences to integer ranks (the ``.tiktoken`` file format: one
``base64(token) rank`` pair per line). This module implements that exact
algorithm (greedy lowest-rank adjacent-pair merging, published in the
tiktoken repo's educational implementation and the original BPE papers), so
given the real ``cl100k_base.tiktoken`` ranks file the encoding is
bit-identical to tiktoken for ordinary text (special tokens excluded — the
chunkers never feed those). Tests exercise it with a small handcrafted ranks
table; production users point ``VECTORFLOW_SPARK_BPE_FILE`` at the real
file (ship it to executors with ``SparkContext.addFile`` + ``SparkFiles`` on
a cluster; in local mode the driver path is directly readable).

Why per-piece BPE parallelizes perfectly on Spark: the pre-tokenizer splits
text into small independent pieces (words, number runs, punctuation), and
merging happens strictly within a piece — so tokenization is a pure per-row
map with no state, ideal for an Arrow-batched pandas UDF. The ranks table is
a few MB — broadcast once, not per task.
"""

from __future__ import annotations

import base64
from functools import lru_cache

try:  # pragma: no cover - exercised in environments with `regex`
    import regex as _re

    _HAVE_REGEX = True
except ImportError:  # pragma: no cover
    import re as _re

    _HAVE_REGEX = False

# The cl100k_base pre-tokenizer pattern, as published in the tiktoken source
# (tiktoken/tiktoken_ext/openai_public.py). Needs the `regex` module for
# \p{L}/\p{N} classes and possessive quantifiers.
CL100K_PATTERN = (
    r"""'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}"""
    r"""| ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+"""
)

# ASCII-safe approximation used only when `regex` is missing: same shape
# (contractions, space-prefixed words, short digit runs, punct runs).
_FALLBACK_PATTERN = (
    r"'(?:[sdmt]|ll|ve|re)|[^\r\n\w\d]?[A-Za-z]+|[0-9]{1,3}"
    r"| ?[^\sA-Za-z0-9]+[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+"
)


class BPETokenizer:
    """Greedy byte-pair encoder over a mergeable-ranks table.

    ``ranks`` must contain every single byte (``bytes([i])`` for 0..255) —
    true of every tiktoken vocabulary — so any UTF-8 input is encodable.
    """

    def __init__(self, ranks: dict[bytes, int], pattern: str | None = None):
        missing = [i for i in range(256) if bytes([i]) not in ranks]
        if missing:
            raise ValueError(
                f"ranks table must cover all 256 single bytes; missing {missing[:5]}..."
            )
        self.ranks = ranks
        self._pattern_str = pattern if pattern is not None else (
            CL100K_PATTERN if _HAVE_REGEX else _FALLBACK_PATTERN
        )
        self._pat = _re.compile(self._pattern_str)
        self._decoder = {rank: tok for tok, rank in ranks.items()}
        # Per-piece memo: natural text re-tokenizes the same words constantly;
        # bounded so a pathological corpus can't grow worker memory.
        self._merge_piece = lru_cache(maxsize=65536)(self._merge_piece_uncached)

    # Compiled regex + lru_cache wrappers don't pickle; the tokenizer rides
    # into pandas-UDF closures, so serialize just (ranks, pattern) and
    # rebuild worker-side.
    def __getstate__(self):
        return {"ranks": self.ranks, "pattern": self._pattern_str}

    def __setstate__(self, state):
        self.__init__(state["ranks"], state["pattern"])

    @classmethod
    def from_tiktoken_file(cls, path: str, pattern: str | None = None) -> "BPETokenizer":
        """Load a ``.tiktoken`` ranks file (``base64(token) rank`` lines)."""
        ranks: dict[bytes, int] = {}
        with open(path, "rb") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                tok_b64, rank = line.split()
                ranks[base64.b64decode(tok_b64)] = int(rank)
        return cls(ranks, pattern)

    def _merge_piece_uncached(self, piece: bytes) -> tuple[int, ...]:
        """BPE-merge one pre-tokenized piece: repeatedly fuse the adjacent
        pair whose concatenation has the LOWEST rank (tiktoken's rule —
        rank order, not left-to-right order), until no adjacent pair is in
        the table."""
        parts = [piece[i : i + 1] for i in range(len(piece))]
        while len(parts) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(parts) - 1):
                r = self.ranks.get(parts[i] + parts[i + 1])
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
        return tuple(self.ranks[p] for p in parts)

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        for piece in self._pat.findall(text):
            pb = piece.encode("utf-8")
            whole = self.ranks.get(pb)
            if whole is not None:  # piece is itself a vocab entry — fast path
                ids.append(whole)
            else:
                ids.extend(self._merge_piece(pb))
        return ids

    def decode(self, ids) -> str:
        return b"".join(self._decoder[i] for i in ids).decode("utf-8", errors="replace")

    def count(self, text: str) -> int:
        return len(self.encode(text))


def byte_ranks() -> dict[bytes, int]:
    """The trivial 256-entry base table (no merges) — every byte is its own
    token. Useful as a seed for toy vocabularies in tests."""
    return {bytes([i]): i for i in range(256)}


def train_ranks(corpus: list[str], n_merges: int, pattern: str | None = None) -> dict[bytes, int]:
    """Learn a small merges table from a corpus (classic BPE training:
    repeatedly merge the most frequent adjacent pair). Deterministic:
    frequency ties break on byte order. This exists so tests and demos can
    run the REAL encode path without the (absent) cl100k file — it is not a
    reimplementation of any specific published vocabulary."""
    ranks = byte_ranks()
    pat = _re.compile(pattern if pattern is not None else (
        CL100K_PATTERN if _HAVE_REGEX else _FALLBACK_PATTERN
    ))
    # Piece frequency table; each piece held as a tuple of current symbols.
    pieces: dict[tuple[bytes, ...], int] = {}
    for text in corpus:
        for piece in pat.findall(text):
            key = tuple(piece.encode("utf-8")[i : i + 1] for i in range(len(piece.encode("utf-8"))))
            if key:
                pieces[key] = pieces.get(key, 0) + 1
    for _ in range(n_merges):
        counts: dict[bytes, int] = {}
        for sym, n in pieces.items():
            for a, b in zip(sym, sym[1:]):
                counts[a + b] = counts.get(a + b, 0) + n
        candidates = {p: c for p, c in counts.items() if p not in ranks}
        if not candidates:
            break
        best = min(candidates, key=lambda p: (-candidates[p], p))
        ranks[best] = len(ranks)
        new_pieces: dict[tuple[bytes, ...], int] = {}
        for sym, n in pieces.items():
            out: list[bytes] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] + sym[i + 1] == best:
                    out.append(best)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_pieces[key] = new_pieces.get(key, 0) + n
        pieces = new_pieces
    return ranks
