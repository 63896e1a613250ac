"""Tokenizer used by the token-based chunkers (C1/C3/C5).

The reference tokenizes with tiktoken ``cl100k_base``
(reference src/worker/worker.py:191). tiktoken is not installed in this
environment, so we gate it behind an import-try and fall back to a
deterministic, *invertible* regex tokenizer: ``decode(encode(s)) == s`` for
every string, which is the only property the chunkers actually rely on
(token windows are decoded back to text). The regex mirrors the GPT-2/BPE
pre-tokenizer shape (leading-space word units, digit runs, punctuation runs,
whitespace runs).

Both paths expose encode->list and decode->str with list-of-token semantics,
so chunker behavior (window counts, overlap structure) is identical in shape;
exact token boundaries differ from cl100k_base when tiktoken is absent, and
that difference is documented here rather than hidden.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

_TOKEN_RE = re.compile(r" ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\s]+|\s+")

try:  # pragma: no cover - tiktoken absent in the build environment
    import tiktoken

    _ENCODING = tiktoken.get_encoding("cl100k_base")
    HAVE_TIKTOKEN = True
except Exception:  # ImportError or network-gated data files
    _ENCODING = None
    HAVE_TIKTOKEN = False


def encode(text: str) -> list:
    """Text -> token list. Invertible: ``decode(encode(s)) == s``."""
    if HAVE_TIKTOKEN:
        return _ENCODING.encode(text)
    return _TOKEN_RE.findall(text)


def decode(tokens: Sequence) -> str:
    if HAVE_TIKTOKEN:
        return _ENCODING.decode(list(tokens))
    return "".join(tokens)


def count_tokens(text: str) -> int:
    return len(encode(text))
