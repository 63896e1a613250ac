"""Pure-Python LZ4 block-format codec (decode + encode), self-contained.

Companion to operators/snappymini.py: the second page codec of the
byte-level Parquet stack (sources/parquetmini.py) — parquet-format
``LZ4_RAW`` (codec 7) is exactly one LZ4 block per page. Only the BLOCK
format is implemented (no frame header/checksums — parquet never uses the
frame), from the public spec (lz4_Block_format.md).

Verification: both directions pinned against pyarrow's bundled native lz4
(``pyarrow.Codec('lz4_raw')``) plus overlap/boundary/truncation fuzz; the
parquet tests add arrow-written LZ4 pages through our reader and our
LZ4-written files through arrow/DuckDB.

Format recap: sequences of [token | literal-length ext | literals |
2-byte LE offset | match-length ext]; token high nibble = literal length
(15 escapes to 255-continued bytes), low nibble = match length - 4 (same
escape); the final sequence is literals-only. Encoder constraints honored
(the spec's actual end-of-block rules): every match STARTS >= 12 bytes
before the block end (match_limit = n - 12, so a 4-byte match anchored
near the limit may END up to 3 bytes past n - 12 — spec-legal, and all
decoders accept it), the last 5+ bytes are always literals, offsets
<= 65535.

Contract: parse-correctly-or-refuse — zero/oversized offsets, truncated
sequences and declared-size mismatches raise ``Lz4Error``.
"""

from __future__ import annotations


class Lz4Error(ValueError):
    """Malformed LZ4 block input (refuse-loudly contract)."""


def decompress(data: bytes, expected_size: int | None = None) -> bytes:
    """Decode one LZ4 block. The block format carries no length header;
    pass ``expected_size`` (e.g. the parquet page header's uncompressed
    size) to enforce it."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise TypeError("decompress expects bytes")
    data = bytes(data)
    n = len(data)
    if n == 0:
        if expected_size not in (None, 0):
            raise Lz4Error("lz4: empty input for non-empty expected size")
        return b""
    out = bytearray()
    pos = 0
    while True:
        if pos >= n:
            raise Lz4Error("lz4: truncated block (no final literal sequence)")
        token = data[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise Lz4Error("lz4: truncated literal length")
                b = data[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise Lz4Error("lz4: literals run past input")
        out += data[pos : pos + lit]
        pos += lit
        if pos == n:
            break  # last sequence is literals-only
        if pos + 2 > n:
            raise Lz4Error("lz4: truncated match offset")
        off = data[pos] | (data[pos + 1] << 8)
        pos += 2
        if off == 0:
            raise Lz4Error("lz4: zero match offset")
        if off > len(out):
            raise Lz4Error("lz4: match offset outside produced output")
        ml = (token & 0x0F) + 4
        if ml == 19:
            while True:
                if pos >= n:
                    raise Lz4Error("lz4: truncated match length")
                b = data[pos]
                pos += 1
                ml += b
                if b != 255:
                    break
        if off >= ml:
            start = len(out) - off
            out += out[start : start + ml]
        else:  # overlapping copy: byte-at-a-time semantics
            for _ in range(ml):
                out.append(out[-off])
        if expected_size is not None and len(out) > expected_size:
            raise Lz4Error("lz4: output overruns expected size")
    if expected_size is not None and len(out) != expected_size:
        raise Lz4Error(f"lz4: expected {expected_size} bytes, produced {len(out)}")
    return bytes(out)


def _emit_length(out: bytearray, v: int) -> None:
    while v >= 255:
        out.append(255)
        v -= 255
    out.append(v)


def _emit_sequence(out: bytearray, data: bytes, lit_start: int, lit_end: int, off: int, ml: int) -> None:
    lit = lit_end - lit_start
    tok_lit = 15 if lit >= 15 else lit
    tok_ml = 15 if ml - 4 >= 15 else ml - 4
    out.append((tok_lit << 4) | tok_ml)
    if tok_lit == 15:
        _emit_length(out, lit - 15)
    out += data[lit_start:lit_end]
    out.append(off & 0xFF)
    out.append(off >> 8)
    if tok_ml == 15:
        _emit_length(out, ml - 4 - 15)


def compress(data: bytes) -> bytes:
    """Greedy hash-table LZ4 block encoder over 4-byte anchors, honoring
    the spec's end-of-block rules (match end margin 12, literal tail 5,
    64 KiB offset window)."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise TypeError("compress expects bytes")
    data = bytes(data)
    n = len(data)
    out = bytearray()
    if n < 13:  # too short for any legal match: single literal sequence
        out.append((15 << 4) if n >= 15 else (n << 4))
        if n >= 15:
            _emit_length(out, n - 15)
        out += data
        return bytes(out)
    table: dict[int, int] = {}
    i = 0
    lit_start = 0
    match_limit = n - 12  # matches must END at least 12 bytes before the end
    limit = n - 4
    while i < match_limit and i < limit:
        key = int.from_bytes(data[i : i + 4], "little")
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 65535 and data[cand : cand + 4] == data[i : i + 4]:
            m = 4
            max_m = match_limit - i
            while m < max_m and data[cand + m] == data[i + m]:
                m += 1
            if m >= 4:
                _emit_sequence(out, data, lit_start, i, i - cand, m)
                i += m
                lit_start = i
                continue
        i += 1
    # final literals-only sequence (covers the mandatory 5-byte tail)
    lit = n - lit_start
    out.append((15 << 4) if lit >= 15 else (lit << 4))
    if lit >= 15:
        _emit_length(out, lit - 15)
    out += data[lit_start:]
    return bytes(out)
