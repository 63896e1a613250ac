"""Pure-Python Snappy raw-format codec (decode + encode), self-contained.

Why it exists: the engine's byte-level Parquet reader
(sources/parquetmini.py) must decompress SNAPPY column-chunk pages — the
default codec of arrow-written Parquet and of the driver's testdata files —
without shelling out to a native library. The format is public
(google/snappy ``format_description.txt``); this module implements the RAW
block format only (no framing/stream format), which is exactly what Parquet
pages use.

Verification: tests pin BOTH directions against pyarrow's bundled native
snappy (``pyarrow.Codec('snappy')``) — our decoder over native-compressed
buffers, native decode over our encoder's output — plus overlapping-copy,
boundary-length and truncation/corruption fuzz cases. The distributed gate
q_snappy_roundtrip round-trips the documents table through both halves
inside a pandas UDF; q_parquet_rawscan exercises the decoder on real
column-chunk bytes.

Format recap (raw block):
  varint uncompressed length, then tagged elements; tag & 3 selects
  00 literal (len-1 in tag>>2, 60..63 escape to 1-4 LE length bytes),
  01 copy len 4-11 / 11-bit offset, 10 copy len 1-64 / 16-bit LE offset,
  11 copy len 1-64 / 32-bit LE offset. Copies may self-overlap (RLE).

Contract: parse-correctly-or-refuse. Truncated input, zero/backward-invalid
offsets, output overrun or trailing garbage all raise ``SnappyError`` —
never silent truncation.

Scale shape: pure bytes->bytes kernels invoked inside Arrow-batched UDFs;
no driver-side work, no state. At 100 TB the unit of parallelism is the
Parquet row-group (see parquetmini), and this codec is CPU-local per task.
"""

from __future__ import annotations


class SnappyError(ValueError):
    """Raised on any malformed snappy input (refuse-loudly contract)."""


_MAX_ULEN = 1 << 32  # format carries a 32-bit uncompressed length


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        if pos >= len(data):
            raise SnappyError("snappy: truncated varint preamble")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 35:
            raise SnappyError("snappy: varint preamble overflows 32 bits")


def decompress(data: bytes) -> bytes:
    """Decode one raw snappy block. Strict: every malformed shape refuses."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise TypeError("decompress expects bytes")
    data = bytes(data)
    ulen, pos = _read_uvarint(data, 0)
    if ulen >= _MAX_ULEN:
        raise SnappyError("snappy: declared length exceeds 32-bit bound")
    out = bytearray()
    n = len(data)
    cur = 0  # == len(out), tracked to keep the tag loop local-only
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                if pos + nbytes > n:
                    raise SnappyError("snappy: truncated literal length")
                ln = int.from_bytes(data[pos : pos + nbytes], "little")
                pos += nbytes
            ln += 1
            if pos + ln > n:
                raise SnappyError("snappy: literal runs past input")
            out += data[pos : pos + ln]
            pos += ln
        else:
            if kind == 1:
                ln = 4 + ((tag >> 2) & 0x7)
                if pos >= n:
                    raise SnappyError("snappy: truncated copy-1 offset")
                off = ((tag >> 5) << 8) | data[pos]
                pos += 1
            elif kind == 2:
                ln = (tag >> 2) + 1
                if pos + 2 > n:
                    raise SnappyError("snappy: truncated copy-2 offset")
                off = data[pos] | (data[pos + 1] << 8)
                pos += 2
            else:
                ln = (tag >> 2) + 1
                if pos + 4 > n:
                    raise SnappyError("snappy: truncated copy-4 offset")
                off = int.from_bytes(data[pos : pos + 4], "little")
                pos += 4
            if off == 0 or off > cur:
                raise SnappyError("snappy: copy offset outside produced output")
            if cur + ln > ulen:
                raise SnappyError("snappy: copy overruns declared length")
            if off >= ln:
                start = cur - off
                out += out[start : start + ln]
            else:
                # overlapping copy (RLE): byte-at-a-time semantics ==
                # repeating the off-sized tail until ln bytes are written
                chunk = bytes(out[cur - off : cur])
                reps, rem = divmod(ln, off)
                out += chunk * reps
                if rem:
                    out += chunk[:rem]
        cur = len(out)
        if cur > ulen:
            raise SnappyError("snappy: output overruns declared length")
    if len(out) != ulen:
        raise SnappyError(
            f"snappy: declared {ulen} bytes, produced {len(out)} (truncated stream)"
        )
    return bytes(out)


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def _emit_literal(out: bytearray, data: bytes, start: int, end: int) -> None:
    while start < end:
        ln = min(end - start, 1 << 24)  # chunk: keep length field ≤3 bytes
        l1 = ln - 1
        if l1 < 60:
            out.append(l1 << 2)
        elif l1 < (1 << 8):
            out.append(60 << 2)
            out.append(l1)
        elif l1 < (1 << 16):
            out.append(61 << 2)
            out += l1.to_bytes(2, "little")
        else:
            out.append(62 << 2)
            out += l1.to_bytes(3, "little")
        out += data[start : start + ln]
        start += ln


def _emit_copy(out: bytearray, off: int, ln: int) -> None:
    # Split long matches into ≤64-byte copy ops (format bound); prefer the
    # compact copy-1 form when offset and length allow, like the C encoder.
    while ln > 0:
        if ln > 64:
            take = 60 if ln < 68 else 64  # never leave a sub-4 tail
        else:
            take = ln
        if 4 <= take <= 11 and off < 2048:
            out.append(1 | ((take - 4) << 2) | ((off >> 8) << 5))
            out.append(off & 0xFF)
        elif off < (1 << 16):
            out.append(2 | ((take - 1) << 2))
            out += off.to_bytes(2, "little")
        else:
            out.append(3 | ((take - 1) << 2))
            out += off.to_bytes(4, "little")
        ln -= take


def compress(data: bytes) -> bytes:
    """Greedy hash-table LZ encoder over 4-byte anchors — same family of
    strategy as the reference C encoder (one 16-bit-offset window is not
    enforced; offsets may use the 4-byte form past 64 KiB)."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise TypeError("compress expects bytes")
    data = bytes(data)
    n = len(data)
    out = bytearray(_uvarint(n))
    if n < 4:
        if n:
            _emit_literal(out, data, 0, n)
        return bytes(out)
    table: dict[int, int] = {}
    i = 0
    lit_start = 0
    limit = n - 3
    while i < limit:
        key = int.from_bytes(data[i : i + 4], "little")
        cand = table.get(key)
        table[key] = i
        if cand is not None and data[cand : cand + 4] == data[i : i + 4]:
            # extend the match
            m = 4
            max_m = n - i
            while m < max_m and data[cand + m] == data[i + m]:
                m += 1
            if lit_start < i:
                _emit_literal(out, data, lit_start, i)
            _emit_copy(out, i - cand, m)
            i += m
            lit_start = i
        else:
            i += 1
    if lit_start < n:
        _emit_literal(out, data, lit_start, n)
    return bytes(out)
