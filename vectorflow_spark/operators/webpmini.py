"""WebP-lossless (VP8L) codec in numpy + stdlib.

WebP is the other major image container of real web corpora next to
JPEG/PNG/GIF (Common Crawl serves it for a large share of images), and
its LOSSLESS profile (RFC 9649 / the public VP8L bitstream spec) is —
like the formats already here — a fully public spec whose entropy stage
is canonical Huffman over an LZ77 token stream:

* ``decode_webp(data)`` — RIFF walk to the VP8L chunk, then the spec
  decode: transform list (PREDICTOR / COLOR / SUBTRACT_GREEN /
  COLOR_INDEXING), optional color cache, meta-Huffman entropy image,
  per-group Huffman codes (simple 1-2 symbol form and the full
  code-length-coded form incl. the 16/17/18 RLE symbols), LZ77
  literal/backward-reference/cache-hit pixel loop with the 120-entry 2D
  distance neighborhood map, then inverse transforms in reverse read
  order. Returns (h, w, 3) uint8 (alpha composited away is NOT done —
  alpha is dropped after an opacity check, matching decode_png's RGB
  contract). Refuses loudly (ValueError) on: lossy VP8/VP8X profiles,
  transform combinations the writer below never emits (color-indexing
  stacked with other transforms), and malformed streams.
* ``encode_webp(px, ...)`` — deterministic VP8L writer used for
  fixtures and roundtrips, with feature knobs that exercise each
  decoder path: ``use_lz77`` (horizontal dist-1 runs -> plane code 2,
  vertical dist-width runs -> plane code 1, plus the >120 plain
  distance form), ``cache_bits`` (color cache), ``transform``
  ('none' | 'subtract_green' | 'predictor' | 'color' | 'palette';
  palette auto-bundles <=16-color images 2/4/8 pixels per green byte),
  ``meta_groups`` (a checkerboard meta-Huffman entropy image with two
  per-group measured code sets — the spec's spatially-adaptive form).
  Lossless: decode(encode(px)) == px BIT-EXACTLY, asserted across all
  knob combinations in tests/test_webp.py.
* ``webp_meta(data)`` — header-only (width, height, channels).

Predictor modes 11-13 (Select / ClampAddSubtractFull / Half) follow the
RFC pseudocode; encoder and decoder share ONE ``_predict`` so the
roundtrip pins self-consistency, and hand-built streams in the tests pin
the bit-level conventions (LSB-first value bits, MSB-first canonical
Huffman code bits — the DEFLATE conventions the spec inherits).

Reference parity note: the reference pipeline has no image decode at all
(text ETL); this feeds the multimodal training-data family (SURVEY.md
§2.13) exactly like jpegmini — image dedup over real crawls must read
the containers crawls actually carry.
"""

from __future__ import annotations

import struct

import numpy as np

WEBP_RIFF_MAGIC = b"RIFF"
WEBP_FOURCC = b"WEBP"

# order in which code-length-code lengths are transmitted (spec 3.7.1.2)
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40

# The close-neighborhood distance map (spec 3.6.2.3): distance codes
# 1..120 address pixels by 2-D offset before falling back to plain
# scan-order distances (code - 120). Stored the way the spec's reference
# implementation keys it: an 8x16 grid — row = dy (0..7), column c
# encodes dx = 8 - c (c <= 8 exact; c > 8 wraps to the previous row's
# far-right, which the single formula below absorbs) — holding the
# 0-based plane code, 255 = unused. dist = dy*xsize + (8 - c), min 1.
# Codes 1-14 are additionally pinned geometrically by unit tests
# (above / left / diagonals) via hand-built streams.
_PLANE_TO_CODE = [
    96, 73, 55, 39, 23, 13, 5, 1, 255, 255, 255, 255, 255, 255, 255, 255,
    101, 78, 58, 42, 26, 16, 8, 2, 0, 3, 9, 17, 27, 43, 59, 79,
    102, 86, 62, 46, 32, 20, 10, 6, 4, 7, 11, 21, 33, 47, 63, 87,
    105, 90, 70, 52, 37, 28, 18, 14, 12, 15, 19, 29, 38, 53, 71, 91,
    110, 99, 82, 66, 48, 35, 30, 24, 22, 25, 31, 36, 49, 67, 83, 100,
    115, 108, 94, 76, 64, 50, 44, 40, 34, 41, 45, 51, 65, 77, 95, 109,
    118, 113, 103, 92, 80, 68, 60, 56, 54, 57, 61, 69, 81, 93, 104, 114,
    119, 116, 111, 106, 97, 88, 84, 74, 72, 75, 85, 89, 98, 107, 112, 117,
]
# code (1-based) -> (row, 8 - col): dist = row*xsize + (8 - col)
_CODE_TO_OFFSET: list[tuple[int, int]] = [(0, 0)] * 120
for _i, _p in enumerate(_PLANE_TO_CODE):
    if _p != 255:
        _CODE_TO_OFFSET[_p] = (_i >> 4, 8 - (_i & 15))


class _BitReader:
    """LSB-first bit reader (DEFLATE convention, which VP8L inherits)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("vp8l: truncated bitstream")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def read_bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("vp8l: truncated bitstream")
        b = (self.data[byte] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


# bit-reversal table for bytes: write_code emits a canonical code
# MSB-first into the LSB-first stream, i.e. appends reverse(code)
_REV8 = bytes(int(f"{i:08b}"[::-1], 2) for i in range(256))


class _BitWriter:
    """LSB-first value bits; Huffman codes written MSB-of-code first.

    Accumulates into (acc, nacc) and flushes whole bytes into a
    bytearray — the stream layout (bit i -> byte i>>3, position i&7) is
    byte-identical to the old one-list-element-per-bit form, ~10x
    cheaper (codes up to 16 bits append as one shift+or)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def _flush(self) -> None:
        acc, nacc, buf = self.acc, self.nacc, self.buf
        while nacc >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
        self.acc, self.nacc = acc, nacc

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nacc
        self.nacc += n
        if self.nacc >= 8:
            self._flush()

    def write_code(self, code: int, length: int) -> None:
        # reverse `length` bits of `code` (length <= 16 in VP8L)
        rev = (_REV8[code & 0xFF] << 8) | _REV8[(code >> 8) & 0xFF]
        self.acc |= (rev >> (16 - length)) << self.nacc
        self.nacc += length
        if self.nacc >= 8:
            self._flush()

    def tobytes(self) -> bytes:
        out = bytes(self.buf)
        if self.nacc:
            tail = self.acc.to_bytes((self.nacc + 7) // 8, "little")
            out += tail
        return out


class _HuffTree:
    """Canonical-code decoder: walk bits MSB-first through a (length,
    code) -> symbol dict. A zero-length 'tree' (single symbol) consumes
    no bits."""

    def __init__(self, lengths: dict[int, int]):
        nz = {s: ln for s, ln in lengths.items() if ln > 0}
        if not nz:
            raise ValueError("vp8l: empty huffman code")
        if len(nz) == 1:
            self.single = next(iter(nz))
            return
        self.single = None
        # canonical assignment: sort by (length, symbol); decode uses the
        # classic first/limit/base arrays — same codes, same symbols,
        # O(1) arithmetic per level instead of a dict probe
        cnt = [0] * 16
        syms: list[int] = []
        kraft = 0
        for sym, ln in sorted(nz.items(), key=lambda kv: (kv[1], kv[0])):
            if ln <= 15:
                cnt[ln] += 1
                kraft += 1 << (15 - ln)
            syms.append(sym)
        if any(ln > 15 for ln in nz.values()) or kraft != (1 << 15):
            raise ValueError("vp8l: invalid (incomplete or overfull) huffman code")
        first = [0] * 16
        limit = [0] * 16
        base = [0] * 16
        code = 0
        idx = 0
        for ln in range(1, 16):
            code <<= 1
            first[ln] = code
            base[ln] = idx
            code += cnt[ln]
            idx += cnt[ln]
            limit[ln] = code
        self.syms = syms
        self.first = first
        self.limit = limit
        self.base = base

    def read_symbol(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        data = br.data
        pos = br.pos
        nbits = len(data) << 3
        limit = self.limit
        code = 0
        for length in range(1, 16):
            if pos >= nbits:
                raise ValueError("vp8l: truncated bitstream")
            code = (code << 1) | ((data[pos >> 3] >> (pos & 7)) & 1)
            pos += 1
            if code < limit[length]:
                br.pos = pos
                return self.syms[self.base[length] + code - self.first[length]]
        raise ValueError("vp8l: bad huffman code in stream")


def _read_code_lengths(br: _BitReader, alphabet_size: int) -> dict[int, int]:
    """The full (non-simple) Huffman code form: code-length-code, then
    symbol lengths with the 16/17/18 repeat symbols (spec 3.7.1.2)."""
    num_clc = br.read(4) + 4
    clc_lengths = {}
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _HuffTree(clc_lengths)

    if br.read_bit():  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths: dict[int, int] = {}
    prev_nz = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = clc.read_symbol(br)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev_nz = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if symbol < alphabet_size:
                    lengths[symbol] = prev_nz
                    symbol += 1
        elif s == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 7 + br.read(7) + 4  # 11 + extra(7)
    return lengths


def _read_huffman_code(br: _BitReader, alphabet_size: int) -> _HuffTree:
    if br.read_bit():  # simple form
        num_symbols = br.read(1) + 1
        if br.read_bit():
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        if num_symbols == 1:
            return _single_tree(sym0)
        sym1 = br.read(8)
        # 2-symbol simple code: code 0 = sym0, code 1 = sym1 — canonical
        # assignment by (length, symbol) would reorder, so build directly
        t = _HuffTree.__new__(_HuffTree)
        t.single = None
        t.syms = [sym0, sym1]  # code 0 -> sym0, code 1 -> sym1, as read
        t.first = [0] * 16
        t.base = [0] * 16
        t.limit = [0] * 16
        t.limit[1] = 2
        return t
    lengths = _read_code_lengths(br, alphabet_size)
    return _HuffTree(lengths)


def _single_tree(sym: int) -> _HuffTree:
    t = _HuffTree.__new__(_HuffTree)
    t.single = sym
    return t


def _prefix_decode(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decoding (spec 3.6.2.2)."""
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _plane_code_to_dist(xsize: int, plane_code: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dy, dx = _CODE_TO_OFFSET[plane_code - 1]
    return max(dy * xsize + dx, 1)


def _color_cache_key(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _decode_pixels(br: _BitReader, w: int, h: int) -> np.ndarray:
    """One entropy-coded image (no transforms, no meta-Huffman): the
    shared machine for entropy subimages. Returns (h*w,) uint32 ARGB."""
    cache_bits = br.read(4) if br.read_bit() else 0
    cache = [0] * (1 << cache_bits) if cache_bits else None
    green = _read_huffman_code(br, 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0))
    red = _read_huffman_code(br, 256)
    blue = _read_huffman_code(br, 256)
    alpha = _read_huffman_code(br, 256)
    dist = _read_huffman_code(br, _NUM_DISTANCE_CODES)
    return _lz77_loop(br, w, h, (green, red, blue, alpha, dist), cache, cache_bits)


def _lz77_loop(br, w, h, trees, cache, cache_bits, meta=None, meta_bits=0) -> np.ndarray:
    npix = w * h
    out = np.zeros(npix, dtype=np.uint64)
    i = 0
    if meta is None:
        green_t, red_t, blue_t, alpha_t, dist_t = trees
    while i < npix:
        if meta is not None:
            gx, gy = (i % w) >> meta_bits, (i // w) >> meta_bits
            group = meta[gy * ((w + (1 << meta_bits) - 1) >> meta_bits) + gx]
            green_t, red_t, blue_t, alpha_t, dist_t = trees[group]
        s = green_t.read_symbol(br)
        if s < 256:
            g = s
            r = red_t.read_symbol(br)
            b = blue_t.read_symbol(br)
            a = alpha_t.read_symbol(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            out[i] = px
            if cache is not None:
                cache[_color_cache_key(px, cache_bits)] = px
            i += 1
        elif s < 256 + _NUM_LENGTH_CODES:
            length = _prefix_decode(s - 256, br)
            dcode = dist_t.read_symbol(br)
            d = _plane_code_to_dist(w, _prefix_decode(dcode, br))
            if d > i or i + length > npix:
                raise ValueError("vp8l: backward reference out of range")
            for _ in range(length):
                px = int(out[i - d])
                out[i] = px
                if cache is not None:
                    cache[_color_cache_key(px, cache_bits)] = px
                i += 1
        else:
            if cache is None:
                raise ValueError("vp8l: cache hit without color cache")
            px = cache[s - 256 - _NUM_LENGTH_CODES]
            out[i] = px
            i += 1
    return out.astype(np.uint32)


# ---------------------------------------------------------------------------
# Transforms (shared predict/color-delta so encode and decode cannot drift)
# ---------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    # per-channel byte average
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) // 2) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) // 2) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) // 2) << 8
        | ((((a) & 0xFF) + ((b) & 0xFF)) // 2)
    )


def _chan(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _select(l: int, t: int, tl: int) -> int:  # noqa: E741
    la, lr, lg, lb = _chan(l)
    ta, tr, tg, tb = _chan(t)
    ca, cr, cg, cb = _chan(tl)
    pa, pr, pg, pb = la + ta - ca, lr + tr - cr, lg + tg - cg, lb + tb - cb
    p_l = abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb)
    p_t = abs(pa - ta) + abs(pr - tr) + abs(pg - tg) + abs(pb - tb)
    return l if p_l < p_t else t


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp(((a >> sh) & 0xFF) + ((b >> sh) & 0xFF) - ((c >> sh) & 0xFF)) << sh
    return out


def _clamp_add_sub_half(ab: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        x = (ab >> sh) & 0xFF
        cc = (c >> sh) & 0xFF
        d = x - cc
        # C's / 2 truncates toward ZERO (libwebp AddSubtractComponentHalf);
        # Python // floors, which is off by one for negative deltas
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= _clamp(x + half) << sh
    return out


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:  # noqa: E741
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(l, t), tl)
    raise ValueError(f"vp8l: bad predictor mode {mode}")


def _predict_at(out: np.ndarray, w: int, x: int, y: int, mode: int) -> int:
    """Spec/libwebp border rules (overriding the block's mode): (0,0) is
    predicted black, the rest of row 0 uses L, the rest of column 0 uses
    T. Interior pixels dispatch on mode with TR = out[i-w+1] ALWAYS — at
    the right edge that scan-order wrap lands on the leftmost pixel of
    the SAME row (already reconstructed), exactly as libwebp reads its
    contiguous row buffer."""
    i = y * w + x
    if y == 0:
        return 0xFF000000 if x == 0 else int(out[i - 1])
    if x == 0:
        return int(out[i - w])
    return _predict(
        mode, int(out[i - 1]), int(out[i - w]), int(out[i - w - 1]), int(out[i - w + 1])
    )


def _apply_inverse_predictor(pix: np.ndarray, w: int, h: int, modes: np.ndarray, bits: int) -> None:
    bw = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        for x in range(w):
            mode = (int(modes[(y >> bits) * bw + (x >> bits)]) >> 8) & 0xFF
            p = _predict_at(pix, w, x, y, mode)
            i = y * w + x
            v = int(pix[i])
            pix[i] = (
                (((v >> 24) + (p >> 24)) & 0xFF) << 24
                | ((((v >> 16) & 0xFF) + ((p >> 16) & 0xFF)) & 0xFF) << 16
                | ((((v >> 8) & 0xFF) + ((p >> 8) & 0xFF)) & 0xFF) << 8
                | (((v & 0xFF) + (p & 0xFF)) & 0xFF)
            )


def _ct_delta(t: int, c: int) -> int:
    """Color-transform delta: (signed_t * signed_c) >> 5 (spec 3.5.3)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _apply_inverse_color_transform(pix: np.ndarray, w: int, h: int, elems: np.ndarray, bits: int) -> None:
    bw = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        for x in range(w):
            e = int(elems[(y >> bits) * bw + (x >> bits)])
            # element pixel layout (spec 3.5.3): blue=green_to_red,
            # green=green_to_blue, red=red_to_blue
            g2r, g2b, r2b = e & 0xFF, (e >> 8) & 0xFF, (e >> 16) & 0xFF
            i = y * w + x
            v = int(pix[i])
            a, r, g, b = _chan(v)
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            pix[i] = (a << 24) | (r << 16) | (g << 8) | b


def _apply_add_green(pix: np.ndarray) -> None:
    g = (pix >> np.uint32(8)) & np.uint32(0xFF)
    r = (((pix >> np.uint32(16)) & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    b = ((pix & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    pix &= np.uint32(0xFF00FF00)
    pix |= (r << np.uint32(16)) | b


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def webp_meta(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the VP8X, VP8L or VP8 header only."""
    x = vp8x_meta(bytes(data))
    if x is not None:
        # run the chunk walk so ANIMATION refuses here exactly like the
        # pixel path (it raises NotImplementedError on the ANIM flag)
        try:
            _vp8l_payload(bytes(data))
        except _LossyWebp:
            pass
        return x
    try:
        payload = _vp8l_payload(data)
    except _LossyWebp as lw:
        from vectorflow_spark.operators.vp8mini import vp8_dimensions

        w, h = vp8_dimensions(lw.payload)
        return w, h, 3
    br = _BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("vp8l: bad signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha = br.read(1)
    if br.read(3) != 0:
        raise ValueError("vp8l: unsupported version")
    return w, h, 4 if alpha else 3


def _vp8l_payload(data: bytes) -> bytes:
    """Chunk walk to the still-image payload. VP8X (extended) containers
    — which many real encoders emit even for plain stills, and which
    every alpha-carrying lossy file uses — are WALKED THROUGH to the
    inner VP8L/VP8 chunk; ALPH chunks are skipped (every decoder here
    returns RGB, alpha dropped — the BMP/PNG contract), and VP8X
    ANIMATION flags refuse loudly (ANMF frame decode is a different
    surface)."""
    if data[:4] != WEBP_RIFF_MAGIC or data[8:12] != WEBP_FOURCC:
        raise ValueError("not a WEBP RIFF container")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if fourcc == b"VP8L":
            return data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8 ":
            raise _LossyWebp(data[pos + 8 : pos + 8 + size])
        if fourcc == b"VP8X":
            flags = data[pos + 8]
            if flags & 0x02:  # ANIMATION
                raise NotImplementedError(
                    "webp: animated (ANIM/ANMF) VP8X not supported — "
                    "still VP8X images decode; use video surfaces for animation"
                )
            # fall through: keep walking to ALPH (skipped) / VP8 / VP8L
        pos += 8 + size + (size & 1)
    raise ValueError("webp: no VP8L chunk")


def vp8x_meta(data: bytes) -> tuple[int, int, int] | None:
    """(canvas_w, canvas_h, channels) from a VP8X header, or None when
    the container has no VP8X chunk."""
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if fourcc == b"VP8X":
            flags = data[pos + 8]
            w = 1 + int.from_bytes(data[pos + 12 : pos + 15], "little")
            h = 1 + int.from_bytes(data[pos + 15 : pos + 18], "little")
            return w, h, 4 if flags & 0x10 else 3
        pos += 8 + size + (size & 1)
    return None


class _LossyWebp(Exception):
    """Internal dispatch signal: the container holds a VP8 (lossy) chunk."""

    def __init__(self, payload: bytes):
        super().__init__("lossy")
        self.payload = payload


def decode_webp(data: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 3) uint8 RGB: VP8L lossless (this module) or
    VP8 lossy keyframes (operators/vp8mini), plain or VP8X-wrapped."""
    try:
        payload = _vp8l_payload(data)
    except _LossyWebp as lw:
        from vectorflow_spark.operators.vp8mini import decode_vp8, yuv420_to_rgb

        return yuv420_to_rgb(*decode_vp8(lw.payload))
    return decode_vp8l_stream(payload)


def decode_vp8l_stream(payload: bytes, require_opaque: bool = False) -> np.ndarray:
    """Raw VP8L bitstream (no RIFF framing) -> (h, w, 3) uint8 RGB —
    the payload form ANMF animation frames carry. ``require_opaque``
    raises NotImplementedError when any decoded pixel carries alpha
    != 255 (callers that composite, e.g. decode_webp_anim, must not
    silently drop alpha — the codec contract is parse correctly or
    refuse, never guess)."""
    br = _BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("vp8l: bad signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("vp8l: unsupported version")

    transforms = []  # (type, payload...) in READ order
    cur_w = w
    while br.read_bit():
        ttype = br.read(2)
        if any(t[0] == ttype for t in transforms):
            raise ValueError("vp8l: duplicate transform")
        if ttype == 2:  # SUBTRACT_GREEN
            transforms.append((2,))
        elif ttype == 0:  # PREDICTOR
            bits = br.read(3) + 2
            bw = (cur_w + (1 << bits) - 1) >> bits
            bh = (h + (1 << bits) - 1) >> bits
            sub = _decode_pixels(br, bw, bh)
            transforms.append((0, bits, sub))
        elif ttype == 1:  # COLOR
            bits = br.read(3) + 2
            bw = (cur_w + (1 << bits) - 1) >> bits
            bh = (h + (1 << bits) - 1) >> bits
            sub = _decode_pixels(br, bw, bh)
            transforms.append((1, bits, sub))
        else:  # COLOR_INDEXING
            n_colors = br.read(8) + 1
            pal_deltas = _decode_pixels(br, n_colors, 1)
            palette = np.cumsum(
                pal_deltas.astype(np.uint32).view(np.uint8).reshape(-1, 4).astype(np.uint32),
                axis=0,
                dtype=np.uint32,
            ).astype(np.uint8)  # per-BYTE delta accumulation mod 256
            if n_colors <= 2:
                xbits = 3
            elif n_colors <= 4:
                xbits = 2
            elif n_colors <= 16:
                xbits = 1
            else:
                xbits = 0
            cur_w = (cur_w + (1 << xbits) - 1) >> xbits
            transforms.append((3, xbits, palette, n_colors))
    if any(t[0] == 3 for t in transforms) and len(transforms) > 1:
        raise ValueError(
            "vp8l: color-indexing combined with other transforms is not "
            "supported by this decoder (our encoder never emits it)"
        )

    # main (ARGB) image: spec order is color-cache info FIRST, then the
    # optional meta-Huffman entropy image (sub-images read neither a meta
    # bit nor share this cache — _decode_pixels reads its own cache flag)
    cache_bits = br.read(4) if br.read_bit() else 0
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta = None
    meta_bits = 0
    n_groups = 1
    if br.read_bit():
        meta_bits = br.read(3) + 2
        mw = (cur_w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_pixels(br, mw, mh)
        meta = (((meta_img >> np.uint32(8)) & np.uint32(0xFFFF))).astype(np.int64)
        n_groups = int(meta.max()) + 1
    green_alpha = 256 + _NUM_LENGTH_CODES + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_huffman_code(br, green_alpha),
                _read_huffman_code(br, 256),
                _read_huffman_code(br, 256),
                _read_huffman_code(br, 256),
                _read_huffman_code(br, _NUM_DISTANCE_CODES),
            )
        )
    if meta is not None:
        pix = _lz77_loop(br, cur_w, h, groups, cache, cache_bits, meta=meta, meta_bits=meta_bits)
    else:
        pix = _lz77_loop(br, cur_w, h, groups[0], cache, cache_bits)

    # inverse transforms, reverse read order
    for t in reversed(transforms):
        if t[0] == 2:
            _apply_add_green(pix)
        elif t[0] == 0:
            _apply_inverse_predictor(pix, cur_w, h, t[2], t[1])
        elif t[0] == 1:
            _apply_inverse_color_transform(pix, cur_w, h, t[2], t[1])
        else:  # color indexing: unbundle + palette lookup
            _, xbits, palette, n_colors = t
            idx_g = ((pix >> np.uint32(8)) & np.uint32(0xFF)).reshape(h, cur_w)
            if xbits:
                per = 1 << xbits
                bits_pp = 8 >> xbits
                cols = []
                for p in range(per):
                    cols.append((idx_g >> np.uint32(p * bits_pp)) & np.uint32((1 << bits_pp) - 1))
                idx = np.stack(cols, axis=2).reshape(h, cur_w * per)[:, :w]
            else:
                idx = idx_g
            if int(idx.max(initial=0)) >= n_colors:
                raise ValueError("vp8l: palette index out of range")
            argb = palette[idx.reshape(-1)]  # (n, 4) uint8 b,g,r,a order? see below
            # palette rows are the raw ARGB uint32 little-endian bytes:
            # byte order b, g, r, a
            pix = (
                argb[:, 3].astype(np.uint32) << 24
                | argb[:, 2].astype(np.uint32) << 16
                | argb[:, 1].astype(np.uint32) << 8
                | argb[:, 0].astype(np.uint32)
            )
            cur_w = w

    if require_opaque and bool(np.any((pix >> np.uint32(24)) != np.uint32(0xFF))):
        raise NotImplementedError(
            "webp anim: VP8L frame carries non-opaque alpha — alpha "
            "compositing is not implemented; refusing rather than "
            "producing silently wrong blended frames"
        )
    rgb = np.zeros((h * cur_w, 3), dtype=np.uint8)
    rgb[:, 0] = (pix >> np.uint32(16)) & np.uint32(0xFF)
    rgb[:, 1] = (pix >> np.uint32(8)) & np.uint32(0xFF)
    rgb[:, 2] = pix & np.uint32(0xFF)
    return rgb.reshape(h, cur_w, 3)


# ---------------------------------------------------------------------------
# Encoder (deterministic fixture writer; lossless roundtrip)
# ---------------------------------------------------------------------------


def _huff_lengths(counts: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Symbol -> code length, complete code, lengths <= max_len. Same
    merge machinery as jpegmini.optimal_huffman_table minus the JPEG
    reserved-codeword rule (VP8L wants COMPLETE codes).

    The two smallest (freq, -i) candidates per merge come from a
    lazy-deletion heap instead of re-sorting every live frequency each
    round (the old form was O(n^2 log n) and dominated encode_webp at
    ~80% of its profile). The merge SEQUENCE is bit-identical: a
    symbol's freq only ever strictly increases (accumulating v2) or
    drops to zero (merged away), so a popped entry is stale iff it no
    longer equals the live freq, and no (freq, i) pair can recur."""
    import heapq

    syms = [s for s, c in counts.items() if c > 0]
    if len(syms) == 0:
        return {}
    if len(syms) == 1:
        return {syms[0]: 1}
    n = max(syms) + 1
    freq = [0] * n
    for s in syms:
        freq[s] = counts[s]
    codesize = [0] * n
    others = [-1] * n
    heap = [(freq[s], -s) for s in syms]
    heapq.heapify(heap)
    live = len(syms)

    def pop_live() -> int:
        while True:
            f, ni = heapq.heappop(heap)
            if freq[-ni] == f:
                return -ni

    while live >= 2:
        v1 = pop_live()
        v2 = pop_live()
        freq[v1] += freq[v2]
        freq[v2] = 0
        heapq.heappush(heap, (freq[v1], -v1))
        live -= 1
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 64
    for cs in codesize:
        if cs:
            bits[cs] += 1
    i = len(bits) - 1
    while i > max_len:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    # reassign lengths: most frequent symbol -> shortest code
    order = sorted(syms, key=lambda s: (-counts[s], s))
    out: dict[int, int] = {}
    k = 0
    for ln in range(1, max_len + 1):
        for _ in range(bits[ln]):
            out[order[k]] = ln
            k += 1
    return out


def _canonical_from_lengths(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical by (length, symbol)."""
    out = {}
    code = 0
    prev = 0
    for sym, ln in sorted(lengths.items(), key=lambda kv: (kv[1], kv[0])):
        code <<= ln - prev
        out[sym] = (code, ln)
        code += 1
        prev = ln
    return out


def _write_huffman_code(bw: _BitWriter, lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Emit a Huffman code (simple form when possible, else the full
    code-length-coded form without RLE), return the encode map."""
    nz = sorted(s for s, ln in lengths.items() if ln > 0)
    if 1 <= len(nz) <= 2 and all(s <= 255 for s in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        if nz[0] > 1:
            bw.write(1, 1)
            bw.write(nz[0], 8)
        else:
            bw.write(0, 1)
            bw.write(nz[0], 1)
        if len(nz) == 2:
            bw.write(nz[1], 8)
            return {nz[0]: (0, 1), nz[1]: (1, 1)}
        return {nz[0]: (0, 0)}
    # normal form
    if len(nz) < 2:
        # a >255 symbol alone: give symbol 0 a phantom 1-bit code too
        lengths = dict(lengths)
        lengths[nz[0]] = 1
        lengths[0 if nz[0] != 0 else 1] = 1
        nz = sorted(s for s, ln in lengths.items() if ln > 0)
    bw.write(0, 1)
    alphabet = max(nz) + 1
    sym_lengths = [lengths.get(s, 0) for s in range(alphabet)]
    clc_counts: dict[int, int] = {}
    for ln in sym_lengths:
        clc_counts[ln] = clc_counts.get(ln, 0) + 1
    clc_len = _huff_lengths(clc_counts, max_len=7)
    if len(clc_len) == 1:
        # single-symbol code-length code: the decoder's tree consumes
        # ZERO bits per entry — the encode map must match
        clc_codes = {next(iter(clc_len)): (0, 0)}
    else:
        clc_codes = _canonical_from_lengths(clc_len)
    # transmit all 19 code-length-code slots (3 bits each)
    bw.write(19 - 4, 4)
    for s in _CLC_ORDER:
        bw.write(clc_len.get(s, 0), 3)
    # use_max_symbol: emit the count so the reader stops exactly after
    # `alphabet` lengths even though the true alphabet may be larger
    # (distance/green alphabets): max_symbol counts LENGTHS READ.
    bw.write(1, 1)
    length_nbits = 14
    bw.write((length_nbits - 2) // 2, 3)
    bw.write(alphabet - 2, length_nbits)
    for ln in sym_lengths:
        code, n = clc_codes[ln]
        bw.write_code(code, n)
    return _canonical_from_lengths(lengths)


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """value >= 1 -> (prefix_code, extra_bits, extra_value)."""
    if v <= 4:
        return v - 1, 0, 0
    u = v - 1
    for eb in range(1, 20):
        for lo in (0, 1):
            offset = (2 + lo) << eb
            if offset <= u < offset + (1 << eb):
                return 2 * eb + 2 + lo, eb, u - offset
    raise ValueError(f"vp8l: value out of prefix range: {v}")


_LZ_MAX_LEN = 4096  # 24 length prefix codes: offset 3<<10 + 2^10 = 4096
_LZ_MAX_DIST = (1 << 20) - 121  # 40 dist codes cover dist+120 <= 3<<18 + 2^18


def _tokenize(
    argb: list[int], use_lz77: bool, cache_bits: int, width: int = 0, max_chain: int = 32
):
    """Pixel stream -> tokens: ('lit', px) | ('copy', length, dist) |
    ('cache', idx). Deterministic greedy LZ77 over the REAL window
    (r6 verdict item 7): structural candidates (left run dist 1,
    above run dist = width — the plane-code fast cases) plus a
    2-pixel-keyed HASH CHAIN walked up to ``max_chain`` links, so
    repeats anywhere in the prior ~1M pixels match (the decoder's full
    backref range, previously only dist 1/width were ever emitted).
    Longest match wins, nearest on ties (cheaper distance prefix)."""
    tokens = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    i, n = 0, len(argb)
    head: dict[int, int] = {}
    prev = [-1] * n if use_lz77 else []

    while i < n:
        if use_lz77 and i + 1 < n:
            best_run, best_d = 0, 0
            # structural candidates: left neighbor and pixel above
            for d in (1, width) if width > 1 else (1,):
                if i >= d and argb[i] == argb[i - d]:
                    run = 1
                    while i + run < n and run < _LZ_MAX_LEN and argb[i + run] == argb[i + run - d]:
                        run += 1
                    if run > best_run or (run == best_run and d < best_d):
                        best_run, best_d = run, d
            # hash-chain candidates across the full window
            key = ((argb[i] * 0x9E3779B1) ^ (argb[i + 1] * 0x85EBCA77)) & 0xFFFFFFFF
            p = head.get(key, -1)
            chain = 0
            while p >= 0 and chain < max_chain:
                d = i - p
                if d > _LZ_MAX_DIST:
                    break  # chains are recency-ordered: all older links are farther
                if argb[p] == argb[i] and argb[p + 1] == argb[i + 1]:
                    run = 2
                    # argb[p+run] == argb[i+run-d]: overlap-correct like the decoder
                    while i + run < n and run < _LZ_MAX_LEN and argb[i + run] == argb[p + run]:
                        run += 1
                    if run > best_run or (run == best_run and d < best_d):
                        best_run, best_d = run, d
                p = prev[p]
                chain += 1
            if best_run >= 2:
                end = min(i + best_run, n - 1)
                for q in range(i, end):  # index every covered position
                    kq = ((argb[q] * 0x9E3779B1) ^ (argb[q + 1] * 0x85EBCA77)) & 0xFFFFFFFF
                    prev[q] = head.get(kq, -1)
                    head[kq] = q
                if cache is not None:
                    for k in range(best_run):
                        cache[_color_cache_key(argb[i + k], cache_bits)] = argb[i + k]
                tokens.append(("copy", best_run, best_d))
                i += best_run
                continue
            prev[i] = head.get(key, -1)
            head[key] = i
        px = argb[i]
        if cache is not None:
            key = _color_cache_key(px, cache_bits)
            if cache[key] == px:
                tokens.append(("cache", key))
                i += 1
                continue
            cache[key] = px
        tokens.append(("lit", px))
        i += 1
    return tokens


def _dist_to_plane(width: int, dist: int) -> int:
    """Inverse of _plane_code_to_dist for the two offsets the tokenizer
    emits: left neighbor -> plane code 2, pixel above -> plane code 1
    (the map's first entries — pinned by roundtrips through the real
    decoder); anything else rides the plain dist+120 form."""
    if dist == 1 and width != 1:
        return 2
    if width > 1 and dist == width:
        return 1
    return dist + 120


def _emit_image(
    bw: _BitWriter, argb: list[int], use_lz77: bool, cache_bits: int, width: int = 0,
    main: bool = False,
) -> None:
    """One entropy-coded image: cache info, 5 Huffman codes, token stream.
    ``main=True`` emits the ARGB image's extra meta-Huffman-absent bit
    between the cache info and the codes (spec order; sub-images have no
    such bit)."""
    tokens = _tokenize(argb, use_lz77, cache_bits, width)
    g_counts: dict[int, int] = {}
    r_counts: dict[int, int] = {}
    b_counts: dict[int, int] = {}
    a_counts: dict[int, int] = {}
    d_counts: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = _chan(t[1])
            g_counts[g] = g_counts.get(g, 0) + 1
            r_counts[r] = r_counts.get(r, 0) + 1
            b_counts[b] = b_counts.get(b, 0) + 1
            a_counts[a] = a_counts.get(a, 0) + 1
        elif t[0] == "copy":
            code, _, _ = _prefix_encode(t[1])
            g_counts[256 + code] = g_counts.get(256 + code, 0) + 1
            dcode, _, _ = _prefix_encode(_dist_to_plane(width, t[2]))
            d_counts[dcode] = d_counts.get(dcode, 0) + 1
        else:
            g_counts[256 + _NUM_LENGTH_CODES + t[1]] = (
                g_counts.get(256 + _NUM_LENGTH_CODES + t[1], 0) + 1
            )
    for c in (r_counts, b_counts, a_counts, d_counts):
        if not c:
            c[0] = 1  # unused channel: 1-symbol code

    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if main:
        bw.write(0, 1)  # no meta-Huffman
    g_map = _write_huffman_code(bw, _huff_lengths(g_counts))
    r_map = _write_huffman_code(bw, _huff_lengths(r_counts))
    b_map = _write_huffman_code(bw, _huff_lengths(b_counts))
    a_map = _write_huffman_code(bw, _huff_lengths(a_counts))
    d_map = _write_huffman_code(bw, _huff_lengths(d_counts))

    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = _chan(t[1])
            for sym, m in ((g, g_map), (r, r_map), (b, b_map), (a, a_map)):
                code, n = m[sym]
                bw.write_code(code, n)
        elif t[0] == "copy":
            code, eb, ev = _prefix_encode(t[1])
            c, n = g_map[256 + code]
            bw.write_code(c, n)
            bw.write(ev, eb)
            dcode, deb, dev = _prefix_encode(_dist_to_plane(width, t[2]))
            c, n = d_map[dcode]
            bw.write_code(c, n)
            bw.write(dev, deb)
        else:
            c, n = g_map[256 + _NUM_LENGTH_CODES + t[1]]
            bw.write_code(c, n)


def _emit_main_grouped(
    bw: _BitWriter,
    argb: list[int],
    use_lz77: bool,
    cache_bits: int,
    width: int,
    height: int,
    meta_bits: int = 3,
) -> None:
    """The meta-Huffman main-image form: a checkerboard entropy image
    assigns each (1<<meta_bits)-square block to one of two Huffman
    groups, each with its own measured 5-code set; a token is coded with
    the group of its STARTING pixel (copies may run into other groups
    without re-selection — the spec's semantics, which the decoder's
    per-token group lookup mirrors). The color cache is shared."""
    bsz = 1 << meta_bits
    mw = (width + bsz - 1) >> meta_bits
    mh = (height + bsz - 1) >> meta_bits
    meta_px = [
        0xFF000000 | (((bx + by) & 1) << 8) for by in range(mh) for bx in range(mw)
    ]
    n_groups = (max(p >> 8 & 0xFFFF for p in meta_px)) + 1
    # spec order: the ARGB image's cache info precedes the meta bit
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    bw.write(1, 1)  # meta-Huffman present
    bw.write(meta_bits - 2, 3)
    _emit_image(bw, meta_px, use_lz77=False, cache_bits=0, width=mw)

    tokens = _tokenize(argb, use_lz77, cache_bits, width)

    def group_of(i: int) -> int:
        return (((i % width) >> meta_bits) + ((i // width) >> meta_bits)) & 1 if n_groups > 1 else 0

    counts = [
        {"g": {}, "r": {}, "b": {}, "a": {}, "d": {}} for _ in range(n_groups)
    ]
    i = 0
    for t in tokens:
        c = counts[group_of(i)]
        if t[0] == "lit":
            a, r, g, b = _chan(t[1])
            for ch, v in (("g", g), ("r", r), ("b", b), ("a", a)):
                c[ch][v] = c[ch].get(v, 0) + 1
            i += 1
        elif t[0] == "copy":
            code, _, _ = _prefix_encode(t[1])
            c["g"][256 + code] = c["g"].get(256 + code, 0) + 1
            dcode, _, _ = _prefix_encode(_dist_to_plane(width, t[2]))
            c["d"][dcode] = c["d"].get(dcode, 0) + 1
            i += t[1]
        else:
            sym = 256 + _NUM_LENGTH_CODES + t[1]
            c["g"][sym] = c["g"].get(sym, 0) + 1
            i += 1

    maps = []
    for g in range(n_groups):
        c = counts[g]
        for ch in ("g", "r", "b", "a", "d"):
            if not c[ch]:
                c[ch][0] = 1  # group never starts a token / unused channel
        maps.append(
            tuple(
                _write_huffman_code(bw, _huff_lengths(c[ch]))
                for ch in ("g", "r", "b", "a", "d")
            )
        )

    i = 0
    for t in tokens:
        g_map, r_map, b_map, a_map, d_map = maps[group_of(i)]
        if t[0] == "lit":
            a, r, g, b = _chan(t[1])
            for sym, m in ((g, g_map), (r, r_map), (b, b_map), (a, a_map)):
                code, n = m[sym]
                bw.write_code(code, n)
            i += 1
        elif t[0] == "copy":
            code, eb, ev = _prefix_encode(t[1])
            cd, n = g_map[256 + code]
            bw.write_code(cd, n)
            bw.write(ev, eb)
            dcode, deb, dev = _prefix_encode(_dist_to_plane(width, t[2]))
            cd, n = d_map[dcode]
            bw.write_code(cd, n)
            bw.write(dev, deb)
            i += t[1]
        else:
            cd, n = g_map[256 + _NUM_LENGTH_CODES + t[1]]
            bw.write_code(cd, n)
            i += 1


def encode_webp(
    px: np.ndarray,
    use_lz77: bool = True,
    cache_bits: int = 0,
    transform: str = "none",
    predictor_mode: int = 7,
    meta_groups: bool = False,
) -> bytes:
    """(h, w, 3|1) uint8 -> lossless WebP (VP8L) bytes.

    ``transform``: 'none' | 'subtract_green' | 'predictor' (uniform
    ``predictor_mode`` over 16x16 blocks) | 'palette' (requires <= 256
    distinct colors; <= 16 bundles indices into green bytes)."""
    px = np.asarray(px)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w = px.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("vp8l: dimensions out of range")
    argb_arr = (
        np.full((h, w), 0xFF000000, dtype=np.uint32)
        | px[:, :, 0].astype(np.uint32) << np.uint32(16)
        | px[:, :, 1].astype(np.uint32) << np.uint32(8)
        | px[:, :, 2].astype(np.uint32)
    )

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version

    cur_w = w
    flat: list[int]
    if transform == "subtract_green":
        bw.write(1, 1)
        bw.write(2, 2)
        g = (argb_arr >> np.uint32(8)) & np.uint32(0xFF)
        r = (((argb_arr >> np.uint32(16)) & np.uint32(0xFF)) - g) & np.uint32(0xFF)
        b = ((argb_arr & np.uint32(0xFF)) - g) & np.uint32(0xFF)
        arr = (argb_arr & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b
        bw.write(0, 1)  # end transforms
        flat = [int(v) for v in arr.reshape(-1)]
    elif transform == "predictor":
        bits = 4  # 16x16 blocks
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(bits - 2, 3)
        bwid = (w + 15) >> 4
        bhei = (h + 15) >> 4
        mode_px = [0xFF000000 | (predictor_mode << 8)] * (bwid * bhei)
        _emit_image(bw, mode_px, use_lz77=True, cache_bits=0, width=bwid)
        res = np.zeros(h * w, dtype=np.uint32)
        src = argb_arr.reshape(-1)
        for y in range(h):
            for x in range(w):
                p = _predict_at(src, w, x, y, predictor_mode)
                i = y * w + x
                v = int(src[i])
                res[i] = (
                    (((v >> 24) - (p >> 24)) & 0xFF) << 24
                    | ((((v >> 16) & 0xFF) - ((p >> 16) & 0xFF)) & 0xFF) << 16
                    | ((((v >> 8) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 8
                    | (((v & 0xFF) - (p & 0xFF)) & 0xFF)
                )
        bw.write(0, 1)
        flat = [int(v) for v in res]
    elif transform == "color":
        # uniform cross-color element over 16x16 blocks: fixed
        # green_to_red/green_to_blue/red_to_blue (signed 3.5) values —
        # enough to exercise the inverse path with real deltas
        bits = 4
        g2r, g2b, r2b = 0x10, 0xF0, 0x08  # +16, -16, +8 in signed bytes
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(bits - 2, 3)
        bwid = (w + 15) >> 4
        bhei = (h + 15) >> 4
        elem_px = [0xFF000000 | (r2b << 16) | (g2b << 8) | g2r] * (bwid * bhei)
        _emit_image(bw, elem_px, use_lz77=True, cache_bits=0, width=bwid)
        res = np.zeros(h * w, dtype=np.uint32)
        src = argb_arr.reshape(-1)
        for i in range(h * w):
            v = int(src[i])
            a, r, g, b = _chan(v)
            # inverse recovers red FIRST, then applies red_to_blue with
            # the recovered (= original) red — mirror that here
            nr = (r - _ct_delta(g2r, g)) & 0xFF
            nb = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
            res[i] = (a << 24) | (nr << 16) | (g << 8) | nb
        bw.write(0, 1)
        flat = [int(v) for v in res]
    elif transform == "palette":
        colors = sorted({int(v) for v in argb_arr.reshape(-1)})
        n_colors = len(colors)
        if n_colors > 256:
            raise ValueError("vp8l palette: more than 256 colors")
        lookup = {c: i for i, c in enumerate(colors)}
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(n_colors - 1, 8)
        # palette image: per-BYTE deltas of consecutive ARGB values
        deltas = []
        prev = 0
        for c in colors:
            d = 0
            for sh in (24, 16, 8, 0):
                d |= (((c >> sh) - (prev >> sh)) & 0xFF) << sh
            deltas.append(d)
            prev = c
        _emit_image(bw, deltas, use_lz77=False, cache_bits=0, width=n_colors)
        if n_colors <= 2:
            xbits = 3
        elif n_colors <= 4:
            xbits = 2
        elif n_colors <= 16:
            xbits = 1
        else:
            xbits = 0
        idx = np.vectorize(lookup.get)(argb_arr).astype(np.uint32)
        if xbits:
            per = 1 << xbits
            bits_pp = 8 >> xbits
            cur_w = (w + per - 1) >> xbits
            packed = np.zeros((h, cur_w), dtype=np.uint32)
            for p in range(per):
                col = idx[:, p::per]
                packed[:, : col.shape[1]] |= col << np.uint32(p * bits_pp)
            green = packed
        else:
            green = idx
        arr = np.full(green.shape, 0xFF000000, dtype=np.uint32) | (green << np.uint32(8))
        bw.write(0, 1)
        flat = [int(v) for v in arr.reshape(-1)]
    elif transform == "none":
        bw.write(0, 1)
        flat = [int(v) for v in argb_arr.reshape(-1)]
    else:
        raise ValueError(f"vp8l: unknown transform {transform!r}")

    if meta_groups:
        _emit_main_grouped(bw, flat, use_lz77, cache_bits, cur_w, h)
    else:
        _emit_image(bw, flat, use_lz77=use_lz77, cache_bits=cache_bits, width=cur_w, main=True)

    payload = bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = WEBP_RIFF_MAGIC + struct.pack("<I", 4 + len(chunk)) + WEBP_FOURCC + chunk
    return riff


# ---------------------------------------------------------------------------
# Animated WebP (VP8X + ANIM + ANMF): the third animation container next to
# GIF and MJPEG AVI. Frames are ordinary VP8/VP8L payloads (the codecs
# pinned against libwebp above), composited onto the VP8X canvas. The RGB
# contract is PROVEN, not assumed: files carrying alpha (VP8X ALPHA flag,
# an ANMF ALPH subchunk, or non-opaque VP8L pixels) REFUSE loudly —
# overwrite compositing is only correct for opaque frames, where the ANMF
# blend flag also degenerates to overwrite.
# ---------------------------------------------------------------------------


def decode_webp_anim(data: bytes) -> np.ndarray:
    """Animated WebP -> (n_frames, h, w, 3) uint8 composited frames."""
    data = bytes(data)
    if data[:4] != WEBP_RIFF_MAGIC or data[8:12] != WEBP_FOURCC:
        raise ValueError("not a WEBP RIFF container")
    x = vp8x_meta(data)
    if x is None:
        raise ValueError("webp: not an animated (VP8X/ANIM) file")
    cw, ch, channels = x
    if channels == 4:
        raise NotImplementedError(
            "webp anim: VP8X ALPHA flag set — alpha compositing is not "
            "implemented; refusing rather than blending wrong frames"
        )
    bg = np.zeros(3, np.uint8)
    frames = []
    canvas = None
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"ANIM":
            b, g, r, _a = body[0], body[1], body[2], body[3]  # BGRA background
            bg = np.array([r, g, b], np.uint8)
            canvas = np.tile(bg, (ch, cw, 1))
        elif fourcc == b"ANMF":
            if canvas is None:
                canvas = np.tile(bg, (ch, cw, 1))
            fx = 2 * int.from_bytes(body[0:3], "little")
            fy = 2 * int.from_bytes(body[3:6], "little")
            fw = 1 + int.from_bytes(body[6:9], "little")
            fh = 1 + int.from_bytes(body[9:12], "little")
            # flags bit 0x01 = dispose-to-background; bit 0x02 = no-blend.
            # Blend-vs-overwrite only differs for non-opaque pixels, and
            # every composited frame below is PROVEN opaque (VP8 has no
            # alpha; VP8L decodes with require_opaque) — so both flag
            # values composite identically and no refusal is needed here.
            flags = body[15]
            # frame data: optional ALPH subchunk then VP8/VP8L
            fpos = 16
            rgb = None
            while fpos + 8 <= len(body):
                fc = body[fpos : fpos + 4]
                (fsz,) = struct.unpack("<I", body[fpos + 4 : fpos + 8])
                payload = body[fpos + 8 : fpos + 8 + fsz]
                if fc == b"ALPH":
                    raise NotImplementedError(
                        "webp anim: ANMF frame carries an ALPH subchunk — "
                        "alpha compositing is not implemented; refusing "
                        "rather than dropping alpha into wrong frames"
                    )
                if fc == b"VP8L":
                    # opaque proven per-pixel: blend flag degenerates to
                    # overwrite only for fully-opaque frames
                    rgb = decode_vp8l_stream(payload, require_opaque=True)
                    break
                if fc == b"VP8 ":
                    from vectorflow_spark.operators.vp8mini import decode_vp8, yuv420_to_rgb

                    # VP8 without ALPH is inherently opaque
                    rgb = yuv420_to_rgb(*decode_vp8(payload))
                    break
                fpos += 8 + fsz + (fsz & 1)  # skip ICCP/EXIF-style metadata
            if rgb is None:
                raise ValueError("webp: ANMF frame without VP8/VP8L payload")
            if rgb.shape[:2] != (fh, fw):
                raise ValueError("webp: ANMF frame dims disagree with payload")
            if fy + fh > ch or fx + fw > cw:
                raise ValueError("webp: ANMF frame rect outside canvas")
            canvas[fy : fy + fh, fx : fx + fw] = rgb  # overwrite composite
            frames.append(canvas.copy())
            if flags & 0x01:  # dispose to background
                canvas[fy : fy + fh, fx : fx + fw] = bg
        pos += 8 + size + (size & 1)
    if not frames:
        raise ValueError("webp: animated file holds no ANMF frames")
    return np.stack(frames)


def encode_webp_anim(
    frames, durations_ms: int = 40, lossless: bool = True, offsets=None, disposals=None
) -> bytes:
    """Deterministic animated-WebP writer for fixtures: each (h, w, 3)
    frame becomes one ANMF holding a VP8L (lossless, default — frame
    pixels roundtrip EXACTLY) or VP8 (qi=4) payload; ``offsets`` places
    frames on the canvas ((0,0) default, must be even), ``disposals``
    marks dispose-to-background frames. Canvas = bounding box."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    offsets = offsets or [(0, 0)] * len(frames)
    disposals = disposals or [False] * len(frames)
    cw = max(x + f.shape[1] for f, (x, _y) in zip(frames, offsets))
    ch = max(y + f.shape[0] for f, (_x, y) in zip(frames, offsets))

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        out = fourcc + struct.pack("<I", len(body)) + body
        return out + (b"\x00" if len(body) & 1 else b"")

    vp8x = chunk(
        b"VP8X",
        bytes([0x02, 0, 0, 0])
        + (cw - 1).to_bytes(3, "little")
        + (ch - 1).to_bytes(3, "little"),
    )
    anim = chunk(b"ANIM", bytes([255, 255, 255, 255]) + struct.pack("<H", 0))
    body_chunks = [vp8x, anim]
    for f, (x, y), disp in zip(frames, offsets, disposals):
        if x % 2 or y % 2:
            raise ValueError("webp anim: frame offsets must be even")
        h, w = f.shape[:2]
        if lossless:
            full = encode_webp(f, transform="subtract_green", cache_bits=4)
            payload = _vp8l_payload(full)
            inner = chunk(b"VP8L", payload)
        else:
            from vectorflow_spark.operators.vp8mini import encode_webp_lossy

            full = encode_webp_lossy(f, qi=4)
            (n,) = struct.unpack_from("<I", full, 16)
            inner = chunk(b"VP8 ", full[20 : 20 + n])
        head = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little")
            + int(durations_ms).to_bytes(3, "little")
            + bytes([0x02 | (0x01 if disp else 0)])  # no-blend [+ dispose]
        )
        body_chunks.append(chunk(b"ANMF", head + inner))
    payload = b"".join(body_chunks)
    return WEBP_RIFF_MAGIC + struct.pack("<I", 4 + len(payload)) + WEBP_FOURCC + payload


def webp_anim_meta(data: bytes) -> dict:
    """Header-only: canvas dims + frame count of an animated WebP."""
    data = bytes(data)
    x = vp8x_meta(data)
    if x is None or not (data[20] & 0x02 if len(data) > 20 and data[12:16] == b"VP8X" else False):
        raise ValueError("webp: not an animated (VP8X ANIM) file")
    n = 0
    pos = 12
    while pos + 8 <= len(data):
        if data[pos : pos + 4] == b"ANMF":
            n += 1
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        pos += 8 + size + (size & 1)
    return {"width": x[0], "height": x[1], "n_frames": n}
