"""Minimal RTF 1.x reader + writer (pure stdlib) — the legacy
word-processing format still present in mail archives and document
dumps; rounds out the S-family after txt/pdf/docx/md/html/epub.

Reader scope (the text-extraction subset of the published RTF spec):

* group nesting ``{}`` with proper state save/restore;
* control words ``\\word`` with optional signed numeric parameter and
  the single space delimiter the spec says is PART of the control word;
* destination groups that hold no document text (``\\fonttbl``,
  ``\\colortbl``, ``\\stylesheet``, ``\\info``, ``\\pict`` ...) skipped
  wholesale, including the ``\\*`` ignorable-destination convention
  (an unknown ``{\\*\\...}`` group is dropped, exactly what the spec
  mandates for readers that do not understand a destination);
* text escapes: ``\\'hh`` (codepage byte, decoded per ``\\ansicpg``,
  default cp1252), ``\\uN`` unicode with the ``\\ucN`` skip-count
  protocol (the N "fallback" characters after \\uN are consumed, not
  emitted), and the literal escapes ``\\\\ \\{ \\}``;
* paragraph/line controls map to text: ``\\par``/``\\line`` -> newline,
  ``\\tab`` -> tab, ``\\emdash`` etc. to their characters;
* raw CR/LF inside the token stream are ignored per spec (only ``\\par``
  breaks paragraphs).

Parse-correctly-or-refuse: not-an-RTF header, unbalanced groups and a
truncated escape raise ``ValueError``; encrypted/object-embedding
documents are not a thing RTF marks at the header level, and unknown
control words are IGNORED (that is the spec's own forward-compatibility
rule, not a guess — unknown words are defined to be skippable).

The writer emits a deterministic minimal document (one ``\\par`` per
input line, ``\\'hh``/``\\uN`` escapes for non-ASCII) that reads back
through this parser and through Word/LibreOffice's dialect.
"""

from __future__ import annotations

# destinations whose content is metadata/objects, never document text
_SKIP_DESTINATIONS = frozenset(
    {
        "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
        "header", "footer", "headerl", "headerr", "headerf",
        "footerl", "footerr", "footerf", "ftnsep", "ftnsepc",
        "xmlnstbl", "themedata", "colorschememapping", "fchars", "lchars",
        "generator", "listtable", "listoverridetable", "revtbl",
    }
)

# control words that ARE text
_TEXT_WORDS = {
    "par": "\n",
    "line": "\n",
    "tab": "\t",
    "emdash": "\u2014",
    "endash": "\u2013",
    "lquote": "\u2018",
    "rquote": "\u2019",
    "ldblquote": "\u201c",
    "rdblquote": "\u201d",
    "bullet": "\u2022",
    "emspace": "\u2003",
    "enspace": "\u2002",
    "~": "\u00a0",  # non-breaking space (control symbol)
    "_": "\u2011",  # non-breaking hyphen
}


def extract_rtf_text(data: bytes) -> str:
    r"""RTF bytes -> extracted document text (paragraphs as newlines)."""
    if not data.startswith(b"{\\rtf"):
        raise ValueError("not an RTF document (missing {\\rtf header)")
    out: list[str] = []
    i, n = 0, len(data)
    depth = 0
    skip_until_depth: int | None = None  # inside a skipped destination
    uc_stack: list[int] = [1]  # \ucN per group
    codepage = "cp1252"
    pending_skip = 0  # \uN fallback bytes to consume
    high_surrogate: int | None = None  # held half of a \uN surrogate pair

    def emit(s: str) -> None:
        nonlocal high_surrogate
        if high_surrogate is not None:
            raise ValueError("RTF: unpaired high surrogate before document text")
        if skip_until_depth is None and depth > 0:
            out.append(s)

    while i < n:
        c = data[i : i + 1]
        if c == b"{":
            depth += 1
            uc_stack.append(uc_stack[-1])
            i += 1
            # the \*\dest ignorable-destination convention
            if skip_until_depth is None and data[i : i + 2] == b"\\*":
                skip_until_depth = depth
        elif c == b"}":
            if depth == 0:
                raise ValueError("RTF: unbalanced closing brace")
            if skip_until_depth is not None and depth == skip_until_depth:
                skip_until_depth = None
            depth -= 1
            uc_stack.pop()
            i += 1
        elif c == b"\\":
            if i + 1 >= n:
                raise ValueError("RTF: truncated control sequence at end of data")
            nxt = data[i + 1 : i + 2]
            if nxt in (b"\\", b"{", b"}"):
                if pending_skip:
                    pending_skip -= 1
                else:
                    emit(nxt.decode("ascii"))
                i += 2
            elif nxt == b"'":
                if i + 4 > n:
                    raise ValueError("RTF: truncated \\'hh escape")
                try:
                    byte = bytes([int(data[i + 2 : i + 4], 16)])
                except ValueError as e:
                    raise ValueError(f"RTF: bad hex escape {data[i:i + 4]!r}") from e
                if pending_skip:
                    pending_skip -= 1
                else:
                    emit(byte.decode(codepage, errors="replace"))
                i += 4
            elif nxt in (b"~", b"_"):
                if pending_skip:
                    pending_skip -= 1
                else:
                    emit(_TEXT_WORDS[nxt.decode("ascii")])
                i += 2
            elif nxt == b"*":
                i += 2  # handled at group-open; harmless elsewhere
            elif nxt.isalpha():
                j = i + 1
                while j < n and chr(data[j]).isalpha():
                    j += 1
                word = data[i + 1 : j].decode("ascii")
                param = None
                if j < n and (chr(data[j]).isdigit() or data[j : j + 1] == b"-"):
                    k = j + 1
                    while k < n and chr(data[k]).isdigit():
                        k += 1
                    param = int(data[j:k])
                    j = k
                if data[j : j + 1] == b" ":  # the delimiter space is consumed
                    j += 1
                i = j
                if word == "u" and param is not None:
                    if pending_skip:
                        pending_skip -= 1
                    else:
                        cp = param + 65536 if param < 0 else param
                        if 0xD800 <= cp <= 0xDBFF:
                            # Word writes astral chars as a UTF-16 surrogate
                            # PAIR of \uN tokens; hold the high half
                            if high_surrogate is not None:
                                raise ValueError("RTF: two high surrogates in a row")
                            high_surrogate = cp
                        elif 0xDC00 <= cp <= 0xDFFF:
                            if high_surrogate is None:
                                raise ValueError("RTF: low surrogate without a high surrogate")
                            hi, high_surrogate = high_surrogate, None
                            emit(chr(0x10000 + ((hi - 0xD800) << 10) + (cp - 0xDC00)))
                        else:
                            if high_surrogate is not None:
                                raise ValueError("RTF: unpaired high surrogate")
                            emit(chr(cp))
                        pending_skip = uc_stack[-1]
                    continue
                pending_skip = 0  # any other control word ends a \uN fallback run
                if word == "bin":
                    # \binN: the next N bytes are RAW BINARY, not tokens —
                    # they may contain braces, so they must be skipped here
                    # regardless of destination state
                    count = max(0, param or 0)
                    if i + count > n:
                        raise ValueError("RTF: truncated \\bin payload")
                    i += count
                elif word == "uc" and param is not None:
                    uc_stack[-1] = param
                elif word == "ansicpg" and param is not None:
                    try:
                        b"\x41".decode(f"cp{param}")
                        codepage = f"cp{param}"
                    except LookupError:
                        raise ValueError(f"RTF: unknown codepage \\ansicpg{param}")
                elif word in _SKIP_DESTINATIONS and skip_until_depth is None:
                    skip_until_depth = depth
                elif word in _TEXT_WORDS:
                    emit(_TEXT_WORDS[word])
                # all other control words: formatting — ignored per spec
            else:
                # control symbol we don't know: spec says skip it
                i += 2
        elif c in (b"\r", b"\n"):
            i += 1  # raw newlines are not document text
        else:
            if pending_skip:
                pending_skip -= 1
            else:
                emit(c.decode(codepage, errors="replace"))
            i += 1
    if depth != 0:
        raise ValueError(f"RTF: {depth} unclosed group(s)")
    if high_surrogate is not None:
        raise ValueError("RTF: unpaired high surrogate at end of document")
    return "".join(out)


def build_rtf(text: str, codepage: int = 1252) -> bytes:
    r"""Text -> a minimal deterministic RTF document: \par per input
    line, ASCII verbatim, non-ASCII as \uN with a '?' fallback
    (\uc1)."""
    body: list[str] = []
    for li, line in enumerate(text.split("\n")):
        if li:
            body.append("\\par\n")
        for ch in line:
            o = ord(ch)
            if ch in "\\{}":
                body.append("\\" + ch)
            elif ch == "\t":
                body.append("\\tab ")
            elif 32 <= o < 128:
                body.append(ch)
            elif 0xA0 <= o < 256:
                # the cp1252-agreeing byte range only; 0x80-0x9F map to
                # DIFFERENT characters under the declared codepage, so C1
                # code points go out as \uN like any other non-ANSI char
                body.append(f"\\'{o:02x}")
            elif 0xD800 <= o <= 0xDFFF:
                raise ValueError(f"lone surrogate U+{o:04X} in input text is not encodable")
            elif o > 0xFFFF:
                # astral plane: Word's convention is a UTF-16 surrogate
                # PAIR of \uN tokens, each with its own fallback char
                v = o - 0x10000
                hi, lo = 0xD800 + (v >> 10), 0xDC00 + (v & 0x3FF)
                body.append(f"\\u{hi - 65536}?\\u{lo - 65536}?")
            else:
                u = o - 65536 if o > 32767 else o
                body.append(f"\\u{u}?")
    return (
        f"{{\\rtf1\\ansi\\ansicpg{codepage}\\deff0\\uc1\n"
        "{\\fonttbl{\\f0\\fswiss Helvetica;}}\n\\f0\\fs24 "
        + "".join(body)
        + "}"
    ).encode("latin-1", errors="strict")
