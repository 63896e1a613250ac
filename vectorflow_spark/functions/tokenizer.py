"""Tokenizer used by the token-based chunkers (C1/C3/C5).

The reference tokenizes with tiktoken ``cl100k_base``
(reference src/worker/worker.py:191). Backend selection, best-first:

1. ``tiktoken`` if importable (absent in this build environment).
2. Our own byte-level BPE engine (functions/bpe.py) — the SAME algorithm
   tiktoken runs — when ``VECTORFLOW_SPARK_BPE_FILE`` points at a
   ``.tiktoken`` ranks file. With the real ``cl100k_base.tiktoken`` file
   this produces bit-identical token ids/boundaries to the reference. On a
   cluster, ship the file via ``SparkContext.addFile`` and set the env var
   in ``spark.executorEnv``; backend choice happens at module import on
   each Python worker, so workers pick it up without driver-side state.
3. A deterministic, *invertible* regex tokenizer: ``decode(encode(s)) == s``
   for every string, which is the only property the chunkers structurally
   rely on (token windows are decoded back to text). The regex mirrors the
   GPT-2/BPE pre-tokenizer shape (leading-space word units, digit runs,
   punctuation runs, whitespace runs).

All paths expose encode->list and decode->str with list-of-token semantics,
so chunker behavior (window counts, overlap structure) is identical in shape;
exact token boundaries differ from cl100k_base only on path 3, and that
difference is documented here rather than hidden.
"""

from __future__ import annotations

import os
import re
from collections.abc import Sequence

_TOKEN_RE = re.compile(r" ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\s]+|\s+")

BPE_FILE_ENV = "VECTORFLOW_SPARK_BPE_FILE"

try:  # pragma: no cover - tiktoken absent in the build environment
    import tiktoken

    _ENCODING = tiktoken.get_encoding("cl100k_base")
    HAVE_TIKTOKEN = True
except Exception:  # ImportError or network-gated data files
    _ENCODING = None
    HAVE_TIKTOKEN = False

_BPE = None
if not HAVE_TIKTOKEN:
    _bpe_path = os.environ.get(BPE_FILE_ENV, "")
    if _bpe_path and os.path.exists(_bpe_path):
        from vectorflow_spark.functions.bpe import BPETokenizer

        _BPE = BPETokenizer.from_tiktoken_file(_bpe_path)

BACKEND = "tiktoken" if HAVE_TIKTOKEN else ("bpe" if _BPE is not None else "regex")


def encode(text: str) -> list:
    """Text -> token list. Invertible: ``decode(encode(s)) == s``."""
    if HAVE_TIKTOKEN:
        return _ENCODING.encode(text)
    if _BPE is not None:
        return _BPE.encode(text)
    return _TOKEN_RE.findall(text)


def decode(tokens: Sequence) -> str:
    if HAVE_TIKTOKEN:
        return _ENCODING.decode(list(tokens))
    if _BPE is not None:
        return _BPE.decode(tokens)
    return "".join(tokens)


def count_tokens(text: str) -> int:
    return len(encode(text))
