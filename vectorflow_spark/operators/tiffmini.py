"""Baseline TIFF 6.0 codec in numpy + stdlib.

TIFF is the container scanned-document and scientific training corpora
carry (multi-strip, LZW-compressed, either byte order) — and, like the
other formats here (jpegmini/webpmini/codecs), its baseline profile is a
fully public spec (Adobe TIFF 6.0) needing no external library:

* ``decode_tiff(data)`` — header (II little / MM big endian), IFD entry
  walk (inline vs offset values, SHORT/LONG types), strip assembly
  (StripOffsets/StripByteCounts/RowsPerStrip), three compressions:
  1 = none, 32773 = PackBits, 5 = TIFF-LZW (MSB-first codes, 9-bit
  start, ClearCode 256 / EOI 257, the spec's EARLY code-size change at
  next_code == (1 << size) - 1 — one code earlier than GIF's LZW),
  horizontal-differencing predictor (tag 317 = 2), photometric 0
  (white-is-zero, inverted), 1 (gray) and 2 (RGB) at 8 bits/sample,
  plus 1-bit bilevel and 4-bit gray (scanned-document depths; libtiff's
  x*255/maxval gray expansion) and photometric 3 palette-color with a
  16-bit ColorMap at 4 or 8 bits (r7; all pinned bit-exact against
  libtiff in tests/test_tiff_libtiff_parity.py).
  Returns (h, w, 3) uint8 (gray broadcast, matching the other codecs).
  Refuses loudly on: tiles (tag 322), planar=2, other bit depths,
  FillOrder 2, predictor on sub-8-bit data, unknown compressions —
  parse correctly or refuse, never guess.
* ``encode_tiff(px, compression=..., predictor=..., rows_per_strip=...,
  big_endian=...)`` — deterministic writer covering every decoder path
  (multi-strip layout, all three compressions, predictor, both byte
  orders, gray and RGB), used for fixtures; roundtrips are bit-exact.
* ``tiff_meta(data)`` — header-only (width, height, channels).

Reference parity note: the reference pipeline is a text ETL with no
image decode; this feeds the multimodal training-data family
(SURVEY.md §2.13) — document-scan corpora are overwhelmingly TIFF.
"""

from __future__ import annotations

import struct

import numpy as np

TIFF_MAGIC_LE = b"II*\x00"
TIFF_MAGIC_BE = b"MM\x00*"

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _read_ifd(data: bytes, order: str) -> dict[int, list[int]]:
    (ifd_off,) = struct.unpack(order + "I", data[4:8])
    (n,) = struct.unpack(order + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for k in range(n):
        e = ifd_off + 2 + 12 * k
        tag, typ, count = struct.unpack(order + "HHI", data[e : e + 8])
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown type: skip per spec
        total = size * count
        if total <= 4:
            raw = data[e + 8 : e + 8 + total]
        else:
            (off,) = struct.unpack(order + "I", data[e + 8 : e + 12])
            raw = data[off : off + total]
        if typ == 3:
            vals = list(struct.unpack(order + "H" * count, raw))
        elif typ == 4:
            vals = list(struct.unpack(order + "I" * count, raw))
        elif typ == 1:
            vals = list(raw)
        else:
            vals = [0] * count  # ASCII/RATIONAL: unused here
        tags[tag] = vals
    return tags


def _unpackbits(src: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < expected:
        n = src[i]
        i += 1
        if n < 128:
            out += src[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([src[i]]) * (257 - n)
            i += 1
        # 128: noop
    if len(out) < expected:
        raise ValueError("tiff: truncated PackBits strip")
    return bytes(out[:expected])


def _packbits(src: bytes) -> bytes:
    """Deterministic PackBits: runs of >= 3 become replicate packets."""
    out = bytearray()
    i, n = 0, len(src)
    lit_start = i
    while i < n:
        run = 1
        while i + run < n and src[i + run] == src[i] and run < 128:
            run += 1
        if run >= 3:
            j = lit_start
            while j < i:  # flush pending literals
                seg = min(128, i - j)
                out.append(seg - 1)
                out += src[j : j + seg]
                j += seg
            out.append(257 - run)
            out.append(src[i])
            i += run
            lit_start = i
        else:
            i += run
    j = lit_start
    while j < i:
        seg = min(128, i - j)
        out.append(seg - 1)
        out += src[j : j + seg]
        j += seg
    return bytes(out)


_CLEAR, _EOI, _FIRST = 256, 257, 258


def _lzw_decode(src: bytes, expected: int) -> bytes:
    """TIFF-LZW (spec section 13): MSB-first code packing, EARLY
    code-size change (at next_code == (1 << size) - 1)."""
    out = bytearray()
    table: list[bytes] = []
    size = 9
    acc = nbits = 0
    prev: bytes | None = None
    pos = 0

    def reset() -> None:
        nonlocal table, size, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        size = 9
        prev = None

    reset()
    while len(out) < expected:
        while nbits < size:
            if pos >= len(src):
                raise ValueError("tiff: truncated LZW strip")
            acc = (acc << 8) | src[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - size)) & ((1 << size) - 1)
        nbits -= size
        if code == _CLEAR:
            reset()
            continue
        if code == _EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("tiff: corrupt LZW code")
        out += entry
        prev = entry
        # EARLY change, decoder side: widen when the table reaches
        # (1 << size) - 1 entries — verified against genuine libtiff LZW
        # strips (tests/test_tiff_libtiff_parity.py); the round-5
        # roundtrip-derived (1 << size) - 2 was self-consistent with our
        # encoder but decoded real libtiff streams as corrupt
        if len(table) == (1 << size) - 1 and size < 12:
            size += 1
    if len(out) < expected:
        raise ValueError("tiff: LZW strip shorter than expected")
    return bytes(out[:expected])


def _lzw_encode(src: bytes) -> bytes:
    """TIFF-LZW writer with the same early-change rule; emits ClearCode
    first and at table-full, EOI last."""
    out_bits: list[tuple[int, int]] = []
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = _FIRST
    size = 9
    out_bits.append((_CLEAR, size))
    w = b""
    for ch in src:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        out_bits.append((table[w], size))
        table[w + c] = next_code
        next_code += 1
        # EARLY change, writer side: one insert after the decoder's
        # (1 << size) - 1 table point (its table lags ours by one);
        # libtiff clears one entry before the 12-bit table fills
        if next_code == (1 << size) and size < 12:
            size += 1
        elif next_code == (1 << 12) - 2:
            out_bits.append((_CLEAR, size))
            table = {bytes([i]): i for i in range(256)}
            next_code = _FIRST
            size = 9
        w = c
    if w:
        out_bits.append((table[w], size))
    out_bits.append((_EOI, size))
    # pack MSB-first
    acc = nbits = 0
    out = bytearray()
    for code, s in out_bits:
        acc = (acc << s) | code
        nbits += s
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def tiff_meta(data: bytes) -> tuple[int, int, int]:
    order = _order(data)
    tags = _read_ifd(data, order)
    return tags[256][0], tags[257][0], tags.get(277, [1])[0]


def _order(data: bytes) -> str:
    if data[:4] == TIFF_MAGIC_LE:
        return "<"
    if data[:4] == TIFF_MAGIC_BE:
        return ">"
    raise ValueError("not a TIFF (II*/MM* magic missing)")


def decode_tiff(data: bytes) -> np.ndarray:
    """Baseline TIFF bytes -> (h, w, 3) uint8 RGB."""
    order = _order(data)
    tags = _read_ifd(data, order)
    if 322 in tags or 323 in tags:
        raise ValueError("tiff: tiled layout not supported (strip TIFFs only)")
    w, h = tags[256][0], tags[257][0]
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8] * spp)
    bps = bits[0]
    if any(b != bps for b in bits) or bps not in (1, 4, 8):
        raise ValueError(f"tiff: bits/sample {bits} not supported (uniform 1, 4 or 8)")
    if bps != 8 and spp != 1:
        raise ValueError("tiff: sub-8-bit data with multiple samples not supported")
    if tags.get(266, [1])[0] != 1:
        raise ValueError("tiff: FillOrder 2 (LSB-first) not supported")
    if tags.get(284, [1])[0] != 1:
        raise ValueError("tiff: planar configuration 2 not supported")
    photo = tags.get(262, [1])[0]
    if photo == 3:
        if spp != 1 or bps not in (4, 8):
            raise ValueError("tiff: palette-color requires one 4- or 8-bit sample")
        if 320 not in tags:
            raise ValueError("tiff: palette-color image missing ColorMap")
    elif photo not in (0, 1, 2):
        raise ValueError(f"tiff: photometric {photo} not supported")
    comp = tags.get(259, [1])[0]
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise ValueError(f"tiff: predictor {predictor} not supported")
    if predictor == 2 and bps != 8:
        raise ValueError("tiff: horizontal predictor is only defined for 8-bit samples here")
    offsets = tags[273]
    counts = tags[279]
    rps = tags.get(278, [h])[0] or h
    if len(offsets) != len(counts):
        raise ValueError("tiff: StripOffsets/StripByteCounts mismatch")

    # rows are byte-aligned: sub-8-bit rows pad to whole bytes (spec §3)
    row_bytes = (w * spp * bps + 7) >> 3
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip_rows = min(rps, h - si * rps)
        expected = strip_rows * row_bytes
        chunk = data[off : off + cnt]
        if comp == 1:
            if len(chunk) < expected:
                raise ValueError("tiff: truncated uncompressed strip")
            raw += chunk[:expected]
        elif comp == 32773:
            raw += _unpackbits(chunk, expected)
        elif comp == 5:
            raw += _lzw_decode(chunk, expected)
        else:
            raise ValueError(f"tiff: compression {comp} not supported")
    arr = np.frombuffer(bytes(raw), dtype=np.uint8)
    if bps == 8:
        vals = arr.reshape(h, w, spp)
        if predictor == 2:
            vals = np.cumsum(vals.astype(np.int64), axis=1).astype(np.uint8)
        idx = vals[:, :, 0]
    else:
        rows = arr.reshape(h, row_bytes)
        if bps == 1:
            idx = np.unpackbits(rows, axis=1)[:, :w]  # MSB-first = FillOrder 1
        else:
            idx = np.stack([rows >> 4, rows & 0x0F], axis=2).reshape(h, -1)[:, :w]
        vals = None
    if photo == 3:
        # ColorMap: 3 * 2^bps SHORTs (all R, all G, all B), 16-bit range;
        # take the high byte (well-formed maps store v*257) — the same
        # expansion libtiff's RGBA reader applies to 16-bit maps
        ncolors = 1 << bps
        cm = tags[320]
        if len(cm) < 3 * ncolors:
            raise ValueError("tiff: ColorMap shorter than 3 * 2^bits")
        rgb = (np.array(cm[: 3 * ncolors], dtype=np.uint32).reshape(3, ncolors) >> 8).astype(
            np.uint8
        )
        return np.ascontiguousarray(np.stack([rgb[0][idx], rgb[1][idx], rgb[2][idx]], axis=2))
    if bps != 8:
        # grayscale expansion to full range (libtiff: x * 255 / maxval)
        px = (idx * (255 if bps == 1 else 17)).astype(np.uint8)[:, :, None]
    else:
        px = vals
    if photo == 0:
        px = 255 - px
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    elif px.shape[2] > 3:
        px = px[:, :, :3]  # drop extra samples (alpha)
    return np.ascontiguousarray(px)


def encode_tiff(
    px: np.ndarray,
    compression: str = "none",
    predictor: bool = False,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    bits: int = 8,
    palette: np.ndarray | None = None,
) -> bytes:
    """(h, w, 3|1) uint8 -> baseline TIFF bytes.

    ``compression``: 'none' | 'packbits' | 'lzw'; ``predictor`` applies
    horizontal differencing (tag 317 = 2, the standard LZW companion);
    ``rows_per_strip`` splits the image into multiple strips;
    ``big_endian`` writes the MM form. ``bits`` in (1, 4, 8) packs
    grayscale rows at that depth (input values must already fit;
    document-scan corpora are overwhelmingly 1-bit). ``palette`` is an
    (n<=256, 3) uint8 colormap making ``px`` (h, w) indices — written as
    a photometric-3 TIFF with a 16-bit ColorMap (v*257), 4-bit packed
    when n <= 16."""
    if palette is not None:
        palette = np.asarray(palette, dtype=np.uint8)
        idx = np.asarray(px)
        if idx.ndim != 2:
            raise ValueError("tiff: palette encoding expects (h, w) index input")
        n_colors = len(palette)
        if n_colors > 256 or palette.shape[1] != 3:
            raise ValueError("tiff: palette must be (n<=256, 3)")
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("tiff: palette index out of range")
        bits = 4 if n_colors <= 16 else 8
        px = idx.astype(np.uint8)
    if bits not in (1, 4, 8):
        raise ValueError("tiff: bits must be 1, 4 or 8")
    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    if gray:
        px = px[:, :, None]
    h, w, spp = px.shape
    if bits != 8:
        if spp != 1:
            raise ValueError("tiff: sub-8-bit encoding is single-sample only")
        if int(px.max(initial=0)) >= (1 << bits):
            raise ValueError(f"tiff: sample values exceed {bits}-bit range")
        if predictor:
            raise ValueError("tiff: predictor is 8-bit only")
    order = ">" if big_endian else "<"
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    if predictor and compression == "none":
        raise ValueError("tiff: predictor without compression is pointless; refuse")
    rps = rows_per_strip or h

    body = px
    if predictor:
        d = body.astype(np.int64)
        body = np.concatenate([d[:, :1], np.diff(d, axis=1)], axis=1).astype(np.uint8)
    if bits == 1:
        body = np.packbits(body[:, :, 0], axis=1)  # MSB-first, row-padded
    elif bits == 4:
        flat = body[:, :, 0]
        if w & 1:
            flat = np.concatenate([flat, np.zeros((h, 1), np.uint8)], axis=1)
        body = (flat[:, 0::2] << 4) | flat[:, 1::2]

    strips = []
    for y0 in range(0, h, rps):
        raw = body[y0 : y0 + rps].tobytes()
        if comp_id == 1:
            strips.append(raw)
        elif comp_id == 32773:
            strips.append(_packbits(raw))
        else:
            strips.append(_lzw_encode(raw))

    # layout: header(8) + IFD + tag overflow values + strip data
    entries: list[tuple[int, int, int, bytes | int]] = []  # tag, type, count, val

    def short(tag, *vals):
        entries.append((tag, 3, len(vals), vals))

    def long(tag, *vals):
        entries.append((tag, 4, len(vals), vals))

    short(256, w)
    short(257, h)
    short(258, *([bits] * spp))
    short(259, comp_id)
    if palette is not None:
        short(262, 3)
        ncolors = 1 << bits
        cm = np.zeros((3, ncolors), dtype=np.uint32)
        cm[:, : len(palette)] = palette.T.astype(np.uint32) * 257
        short(320, *[int(v) for v in cm.reshape(-1)])
    else:
        short(262, 1 if spp == 1 else 2)
    long(273, *([0] * len(strips)))  # patched below
    short(277, spp)
    short(278, rps)
    long(279, *[len(s) for s in strips])
    short(284, 1)
    if predictor:
        short(317, 2)
    entries.sort(key=lambda e: e[0])

    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4  # overflow area starts here
    overflow = bytearray()
    fixed = []
    for tag, typ, count, vals in entries:
        size = _TYPE_SIZES[typ] * count
        fmt = "H" if typ == 3 else "I"
        packed = struct.pack(order + fmt * count, *vals)
        if size <= 4:
            fixed.append((tag, typ, count, packed.ljust(4, b"\x00"), None))
        else:
            fixed.append((tag, typ, count, None, len(overflow)))
            overflow += packed
    strips_off = data_off + len(overflow)
    # patch strip offsets now that layout is known
    offs = []
    pos = strips_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    out = bytearray()
    out += (TIFF_MAGIC_BE if big_endian else TIFF_MAGIC_LE)
    out += struct.pack(order + "I", ifd_off)
    out += struct.pack(order + "H", n)
    for tag, typ, count, inline, ov_off in fixed:
        out += struct.pack(order + "HHI", tag, typ, count)
        if tag == 273:
            if len(strips) == 1:
                out += struct.pack(order + "I", offs[0])
            elif inline is not None and len(strips) * 4 <= 4:
                out += struct.pack(order + "I", offs[0])
            else:
                # 273 always lives in overflow when >1 strip
                out += struct.pack(order + "I", data_off + ov_off)
        elif inline is not None:
            out += inline
        else:
            out += struct.pack(order + "I", data_off + ov_off)
    out += struct.pack(order + "I", 0)  # next IFD
    out += overflow
    # patch the 273 overflow slot with real offsets
    if len(strips) > 1:
        for tag, typ, count, inline, ov_off in fixed:
            if tag == 273:
                struct.pack_into(order + "I" * len(offs), out, data_off + ov_off, *offs)
    for s in strips:
        out += s
    return bytes(out)
