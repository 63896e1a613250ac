"""Minimal pure-stdlib PDF text extraction + generation (operator S2).

The reference extracts PDFs with PyMuPDF and concatenates page texts
(reference src/extract/extract.py:93-97: ``"".join(page.get_text() for
page in doc)``). PyMuPDF is absent from this environment, so this module
de-gates the common case with a spec-subset reader built only on the
stdlib (``zlib`` + byte scanning of the public ISO 32000 format):

* content streams are located by ``stream``/``endstream`` scanning in
  file order (generated/simple PDFs store pages in order; no xref walk);
* ``/FlateDecode`` streams are zlib-inflated, unfiltered streams used
  raw; streams that don't inflate and contain no text operators simply
  contribute nothing (images, fonts);
* inside ``BT``/``ET`` blocks the text-showing operators are evaluated:
  ``Tj``, ``TJ`` (array form; kerning numbers ignored), ``'`` and ``"``
  (newline-then-show), with ``T*``/``Td``/``TD`` line moves becoming
  newlines — the same reading order a simple single-column page has;
* literal strings decode the full escape set (``\\n \\r \\t \\b \\f
  \\( \\) \\\\``, 1-3 digit octal, backslash-EOL continuation, raw EOL
  normalized to ``\\n`` per spec) and hex strings decode with whitespace
  and odd-length padding; collected bytes decode utf-8-first (latin-1
  fallback), which matches simple/generated PDFs that embed text bytes
  directly.

Out of scope, by design (these genuinely need a font machinery):
CID/Type0 composite fonts, per-font /Differences encodings, and
positional column reconstruction. ``sources/readers.py`` tries PyMuPDF
first and falls back here, so installing fitz upgrades fidelity without
a code change.

``build_pdf`` is the inverse: a well-formed (xref'd, viewable) one-font
PDF writer used for fixtures and the encode→extract roundtrip oracle
(q_pdf_roundtrip) — text written through it and read back through
``extract_pdf_text`` reproduces the input exactly, newline for newline.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")
_WS = b"\x00\t\n\x0c\r "


def _parse_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(...)`` literal string starting at ``data[i] == '('``.
    Returns (string bytes, index past the closing paren)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth > 0:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in b"nrtbf":
                out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b", 0x66: b"\f"}[e]
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:  # 1-3 octal digits
                oct_digits = bytearray()
                while i < n and 0x30 <= data[i] <= 0x37 and len(oct_digits) < 3:
                    oct_digits.append(data[i])
                    i += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in b"\r\n":  # line continuation: swallow the EOL
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char stands for itself
                out.append(e)
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth > 0:
                out.append(c)
            i += 1
        elif c == 0x0D:  # raw EOL inside a literal is recorded as \n
            out.append(0x0A)
            i += 1
            if i < n and data[i] == 0x0A:
                i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _parse_hex(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse ``<...>`` hex string at ``data[i] == '<'``."""
    j = data.find(b">", i + 1)
    if j < 0:
        j = len(data)
    digits = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : j])
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode()), j + 1


def _decode_text(raw: bytes) -> str:
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def _extract_stream_text(content: bytes) -> str | None:
    """Evaluate the text-showing operators of one content stream. Returns
    None when the stream shows no text at all (image/font/xobject
    streams); "" is a real page that showed an empty string."""
    lines: list[str] = []
    cur: list[str] = []
    saw_show = False
    in_bt = False
    str_operands: list[bytes] = []
    num_operands: list[float] = []

    def newline() -> None:
        lines.append("".join(cur))
        cur.clear()

    def show() -> None:
        nonlocal saw_show
        if str_operands:
            cur.append(_decode_text(b"".join(str_operands)))
        saw_show = True

    i, n = 0, len(content)
    while i < n:
        c = content[i]
        if c == 0x28:  # (
            s, i = _parse_literal(content, i)
            str_operands.append(s)
        elif c == 0x3C:  # < or <<
            if i + 1 < n and content[i + 1] == 0x3C:
                i += 2
            else:
                s, i = _parse_hex(content, i)
                str_operands.append(s)
        elif c == 0x25:  # % comment to EOL
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif (0x30 <= c <= 0x39) or c in b"+-.":
            m = _NUM_RE.match(content, i)
            if m:
                num_operands.append(float(m.group()))
                i = m.end()
            else:
                i += 1
        elif (0x41 <= c <= 0x5A) or (0x61 <= c <= 0x7A) or c in b"'\"*":
            m = _OP_RE.match(content, i)
            op = m.group()
            i = m.end()
            if op == b"BT":
                in_bt = True
            elif op == b"ET":
                in_bt = False
            elif in_bt:
                if op == b"Tj" or op == b"TJ":
                    show()
                elif op == b"'":
                    newline()
                    show()
                elif op == b'"':
                    newline()
                    show()
                elif op == b"T*":
                    newline()
                elif op in (b"Td", b"TD"):
                    if len(num_operands) >= 1 and num_operands[-1] != 0.0:
                        if saw_show or cur or lines:
                            newline()
            str_operands.clear()
            num_operands.clear()
        else:
            i += 1
    if cur:
        lines.append("".join(cur))
    if not saw_show and not any(lines):
        return None  # no text ops at all: image/font/xobject stream
    return "\n".join(lines)


def extract_pdf_text(data: bytes) -> str:
    """Concatenate the text of every content stream, page-concat style
    (each page's text gets a trailing newline, like PyMuPDF's get_text,
    then pages join directly — reference src/extract/extract.py:93-97)."""
    parts: list[str] = []
    for m in _STREAM_RE.finditer(data):
        seg = m.group(1)
        try:
            seg = zlib.decompress(seg)
        except zlib.error:
            # not Flate (or raw): strip the trailing EOL the writer put
            # before 'endstream' and scan as-is
            seg = seg.rstrip(b"\r\n")
        text = _extract_stream_text(seg)
        if text is not None:
            parts.append(text + "\n")
    return "".join(parts)


# ---------------------------------------------------------------------------
# Writer: a well-formed minimal PDF (fixtures + roundtrip oracle)
# ---------------------------------------------------------------------------


def _escape_literal(line: str) -> bytes:
    """Encode one line of text as a PDF literal string body (utf-8 bytes;
    backslash/parens escaped; CR escaped octal so no parser normalizes it)."""
    raw = line.encode("utf-8")
    raw = raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    return raw.replace(b"\r", b"\\015")


def build_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Write a valid one-font PDF: catalog, page tree, Helvetica, one
    FlateDecode content stream per page. Each page string may be
    multi-line; lines render as successive ``Tj`` shows separated by
    ``T*``, which is exactly what ``extract_pdf_text`` inverts — the
    roundtrip contract is ``extract(build([p])) == p + "\\n"`` per page."""
    objs: list[bytes] = []

    def content_stream(text: str) -> bytes:
        ops = [b"BT /F1 11 Tf 12 TL 72 720 Td"]
        for k, line in enumerate(text.split("\n")):
            if k > 0:
                ops.append(b"T*")
            ops.append(b"(" + _escape_literal(line) + b") Tj")
        ops.append(b"ET")
        body = b"\n".join(ops)
        filt = b""
        if compress:
            body = zlib.compress(body)
            filt = b" /Filter /FlateDecode"
        return (
            b"<< /Length %d%s >>\nstream\n" % (len(body), filt) + body + b"\nendstream"
        )

    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font, then (page, content)*
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages)
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i in range(n_pages):
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>" % (5 + 2 * i)
        )
        objs.append(content_stream(pages[i]))

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)
