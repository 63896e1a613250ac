"""FLAC (Free Lossless Audio Codec) — pure stdlib/numpy implementation of
the PUBLIC format spec (RFC 9639 / xiph.org/flac/format.html): decoder for
the full frame surface a crawl corpus carries (constant/verbatim/fixed/LPC
subframes, all four stereo decorrelation modes, rice + rice2 residuals with
escape partitions, wasted bits) and a deterministic encoder for fixture
corpora and the lossless roundtrip contract.

Verification strategy (tests/test_flac.py): no libFLAC exists in this build
environment (unlike the raster codecs, which are pinned against system
libjpeg/libpng/libwebp/libtiff/giflib), so the pinning leans on the format's
OWN integrity machinery plus two-independent-paths losslessness:

  * STREAMINFO embeds the MD5 of the original unencoded PCM — the decoder
    recomputes it over its reconstruction and REFUSES on mismatch, which
    makes every real-world FLAC file its own reference vector;
  * every frame header carries a CRC-8 and every frame a CRC-16 (spec
    polynomials 0x07 / 0x8005), both verified on decode and any corruption
    refuses loudly;
  * encoder and decoder implement the prediction math independently
    (forward residual vs integer reconstruction), so a bit-exact roundtrip
    crosses two implementations — the same argument the VP8L/PNG lossless
    roundtrips rest on;
  * a ctypes libFLAC parity matrix in the style of tests/lib*_ref.py is
    skipif-gated on the library's presence and runs wherever it exists.

Reference parity note: the reference repo (dgarnitz/vectorflow) has no audio
code at all (client-side images only, README.md:319-345) — this is extension
scope for the 100 TB training-data pipeline (lossless-audio ingest + the
audio near-dup leg of q_audio_fingerprint_dedup).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

_BLOCKSIZE_CODES = {
    192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
    8192: 13, 16384: 14, 32768: 15,
}
_SAMPLE_RATE_CODES = {
    88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
    24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11,
}
_SAMPLE_SIZE_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_SIZE_FROM_CODE = {v: k for k, v in _SAMPLE_SIZE_CODES.items()}
_RATE_FROM_CODE = {v: k for k, v in _SAMPLE_RATE_CODES.items()}


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.zeros(256, dtype=np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tab[b] = r & mask
    return tab


# plain-list tables: numpy scalar indexing costs ~10x a list index in
# the per-byte loops below (same table values either way)
_CRC8_TAB = _crc_table(0x07, 8).tolist()
_CRC16_TAB = _crc_table(0x8005, 16).tolist()


def _crc8(data: bytes) -> int:
    r = 0
    tab = _CRC8_TAB
    for b in data:
        r = tab[r ^ b]
    return r


def _crc16(data: bytes) -> int:
    r = 0
    tab = _CRC16_TAB
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ tab[(r >> 8) ^ b]
    return r


# ---------------------------------------------------------------------------
# MSB-first bit IO (FLAC is big-endian at the bit level)
# ---------------------------------------------------------------------------


class _Bits:
    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.pos = byte_pos
        self.acc = 0
        self.n = 0

    def read(self, k: int) -> int:
        # refill 8 bytes at a time; align() rewinds whole over-read bytes,
        # so the logical bit position (8*pos - n) is unchanged
        while self.n < k:
            chunk = self.data[self.pos : self.pos + 8]
            if not chunk:
                raise ValueError("flac: bitstream truncated")
            self.acc = (self.acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
            self.pos += len(chunk)
            self.n += 8 * len(chunk)
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def read_signed(self, k: int) -> int:
        v = self.read(k)
        return v - (1 << k) if v >= (1 << (k - 1)) else v

    def read_signed_block(self, k: int, count: int) -> list[int]:
        """``count`` consecutive k-bit signed fields — the same bits in
        the same order as ``count`` read_signed() calls, consumed with ONE
        wide read and unpacked vectorized (numpy bit matrix)."""
        if count <= 0:
            return []
        if k > 62:  # keep the int64 weight vector exact (never hit: k<=33)
            return [self.read_signed(k) for _ in range(count)]
        total = k * count
        big = self.read(total)
        nbytes = (total + 7) >> 3
        raw = np.frombuffer(
            (big << (8 * nbytes - total)).to_bytes(nbytes, "big"), dtype=np.uint8
        )
        mat = np.unpackbits(raw)[:total].reshape(count, k).astype(np.int64)
        u = mat @ (np.int64(1) << np.arange(k - 1, -1, -1, dtype=np.int64))
        return np.where(u >= (1 << (k - 1)), u - (1 << k), u).tolist()

    def read_unary(self) -> int:
        """Count of 0-bits before the terminating 1-bit. Bounded: a sane
        rice quotient never exceeds ~blocksize*bps, so a multi-megabit
        run means a corrupt stream — refuse with ValueError instead of
        letting huge ints overflow downstream int64 math."""
        c = 0
        while True:
            if c > 1_000_000:
                raise ValueError("flac: unary run too long (corrupt stream)")
            if self.n == 0:
                chunk = self.data[self.pos : self.pos + 8]
                if not chunk:
                    raise ValueError("flac: bitstream truncated in unary code")
                self.acc = int.from_bytes(chunk, "big")
                self.pos += len(chunk)
                self.n = 8 * len(chunk)
            if self.acc == 0:
                c += self.n
                self.n = 0
                continue
            top = self.acc.bit_length()
            c += self.n - top
            self.n = top - 1
            self.acc &= (1 << self.n) - 1
            return c

    def align(self) -> None:
        """Drop padding bits to the next byte boundary (spec: zeros) and
        rewind any whole bytes the chunked refill over-read, so ``pos``
        lands exactly on the frame's trailing byte boundary."""
        pad = self.n & 7
        if pad and (self.acc >> (self.n - pad)) != 0:
            raise ValueError("flac: nonzero frame padding bits")
        self.pos -= (self.n - pad) >> 3
        self.acc = 0
        self.n = 0


class _BitW:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, k: int) -> None:
        # arbitrary-width: whole bytes flush via one to_bytes (FLAC has
        # no byte stuffing), only the sub-byte remainder stays in acc
        acc = (self.acc << k) | (int(v) & ((1 << k) - 1))  # int(): a numpy
        n = self.n + k  # scalar operand would wrap the shift at 64 bits
        if n >= 8:
            rem = n & 7
            self.buf += (acc >> rem).to_bytes(n >> 3, "big")
            acc &= (1 << rem) - 1
            n = rem
        self.acc = acc
        self.n = n

    def write_unary(self, q: int) -> None:
        self.write(1, q + 1)  # q zeros then the terminating 1, any width

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def tobytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# UTF-8-style coded frame numbers (the spec extends UTF-8 to 36-bit values)
# ---------------------------------------------------------------------------


def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    # k continuation bytes hold 6k bits; the lead byte holds 6 - k payload
    # bits behind a (k+1)-ones-then-zero prefix; smallest k that fits
    for k in range(1, 7):
        lead_bits = 6 - k if k < 6 else 0
        if n < (1 << (6 * k + lead_bits)):
            lead = 0xFE if k == 6 else ((0xFF << (7 - k)) & 0xFF) | (n >> (6 * k))
            out = [lead]
            for j in range(k - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * j)) & 0x3F))
            return bytes(out)
    raise ValueError("flac: frame number out of range")


def _utf8_decode(data: bytes, pos: int) -> tuple[int, int]:
    b0 = data[pos]
    if b0 < 0x80:
        return b0, pos + 1
    k = 0
    mask = 0x40
    while b0 & mask:
        k += 1
        mask >>= 1
    if k == 0 or k > 6:
        raise ValueError("flac: invalid UTF-8 coded number")
    n = b0 & (mask - 1)
    for j in range(1, k + 1):
        c = data[pos + j]
        if c & 0xC0 != 0x80:
            raise ValueError("flac: invalid UTF-8 continuation byte")
        n = (n << 6) | (c & 0x3F)
    return n, pos + k + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def looks_like_flac(data: bytes) -> bool:
    return bytes(data[:4]) == FLAC_MAGIC


def _parse_streaminfo(data: bytes) -> tuple[dict, int]:
    """-> (streaminfo dict, offset of first frame)."""
    if bytes(data[:4]) != FLAC_MAGIC:
        raise ValueError("flac: bad magic")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata block header")
        hdr = data[pos]
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if len(body) < length:
            raise ValueError("flac: truncated metadata block body")
        if hdr & 0x7F == 0:
            if length != 34:
                raise ValueError("flac: STREAMINFO must be 34 bytes")
            min_bs, max_bs = struct.unpack(">HH", body[0:4])
            packed = int.from_bytes(body[10:18], "big")
            info = {
                "min_blocksize": min_bs,
                "max_blocksize": max_bs,
                "sample_rate": packed >> 44,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bits_per_sample": ((packed >> 36) & 0x1F) + 1,
                "total_samples": packed & ((1 << 36) - 1),
                "md5": bytes(body[18:34]),
            }
        pos += 4 + length
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("flac: missing STREAMINFO block")
    return info, pos


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = bits.read(4)
    if blocksize % (1 << po):
        raise ValueError("flac: partition order does not divide blocksize")
    out: list[int] = []
    part_n = blocksize >> po
    for p in range(1 << po):
        n = part_n - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("flac: predictor order exceeds first partition")
        param = bits.read(plen)
        if param == escape:
            raw = bits.read(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                out.extend(bits.read_signed_block(raw, n))
        else:
            for _ in range(n):
                q = bits.read_unary()
                u = (q << param) | bits.read(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _reconstruct_fixed(order: int, warmup: list[int], residual: list[int]) -> np.ndarray:
    """k-fold integration: a fixed order-k predictor means the residual is
    the k-th finite difference of the signal, so reconstruction is k
    cumulative sums seeded from the warmup's difference pyramid — fully
    vectorized (no per-sample Python loop).

    Divergence-guarded like the LPC path: corrupt residuals (subframes
    decode BEFORE the frame CRC runs) could otherwise wrap int64 inside
    np.cumsum and come back as silently wrong samples. Each integration
    step adds one bounded value, so any overflow must first pass through
    the (2^40, 2^63) window the per-level check catches."""
    _LIM = 1 << 40
    w = np.asarray(warmup, dtype=np.int64)
    seq = np.asarray(residual, dtype=np.int64)
    if (len(w) and int(np.abs(w).max()) > _LIM) or (
        len(seq) and int(np.abs(seq).max()) > _LIM
    ):
        raise ValueError("flac: fixed-predictor input out of range (corrupt stream)")
    # difference pyramid of the warmup: level j holds Δ^j values
    pyramid = [w]
    for _ in range(order):
        pyramid.append(np.diff(pyramid[-1]))
    for j in range(order - 1, -1, -1):
        seed = pyramid[j][-1] if len(pyramid[j]) else 0
        seq = seed + np.cumsum(seq)
        if len(seq) and int(np.abs(seq).max()) > _LIM:
            raise ValueError("flac: fixed-predictor reconstruction out of range (corrupt stream)")
    return np.concatenate([w, seq]) if len(w) else seq


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("flac: subframe padding bit set")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("flac: wasted bits exceed sample size")
    if ftype == 0:  # CONSTANT
        v = bits.read_signed(eff)
        out = np.full(blocksize, v, dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        out = np.asarray(bits.read_signed_block(eff, blocksize), dtype=np.int64)
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warmup = [bits.read_signed(eff) for _ in range(order)]
        residual = _read_residual(bits, blocksize, order)
        out = _reconstruct_fixed(order, warmup, residual)
    elif ftype >= 32:  # LPC order 1-32
        order = ftype - 31
        warmup = [bits.read_signed(eff) for _ in range(order)]
        precision = bits.read(4) + 1
        if precision == 16:
            raise ValueError("flac: invalid LPC precision code 1111")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift is invalid")
        coefs = [bits.read_signed(precision) for _ in range(order)]
        residual = _read_residual(bits, blocksize, order)
        s = warmup + [0] * len(residual)
        for i, r in enumerate(residual):
            j = order + i
            acc = 0
            for c in range(order):
                acc += coefs[c] * s[j - 1 - c]
            v = r + (acc >> shift)
            if not -(1 << 40) < v < (1 << 40):
                # corrupt coefficients make the IIR diverge; subframes
                # decode before the frame CRC runs, so refuse here (a
                # valid stream's samples are bounded by bits_per_sample)
                raise ValueError("flac: LPC reconstruction out of range (corrupt stream)")
            s[j] = v
        out = np.asarray(s, dtype=np.int64)
    else:
        raise ValueError(f"flac: reserved subframe type {ftype}")
    if wasted:
        out = out << wasted
    return out


def _decode_frame(data: bytes, pos: int, info: dict) -> tuple[np.ndarray, int, int]:
    """-> ((blocksize, channels) int64 samples, sample_rate, next byte pos)."""
    start = pos
    if data[pos] != 0xFF or (data[pos + 1] & 0xFC) != 0xF8:
        raise ValueError(f"flac: bad frame sync at byte {pos}")
    if data[pos + 1] & 0x02:
        raise ValueError("flac: reserved bit set in frame header")
    bs_code = data[pos + 2] >> 4
    sr_code = data[pos + 2] & 0xF
    chan_code = data[pos + 3] >> 4
    size_code = (data[pos + 3] >> 1) & 0x7
    if data[pos + 3] & 1:
        raise ValueError("flac: reserved bit set in frame header")
    _num, pos = _utf8_decode(data, pos + 4)
    if bs_code == 0:
        raise ValueError("flac: reserved blocksize code 0000")
    if bs_code == 6:
        blocksize = data[pos] + 1
        pos += 1
    elif bs_code == 7:
        blocksize = int.from_bytes(data[pos : pos + 2], "big") + 1
        pos += 2
    elif bs_code == 1:
        blocksize = 192
    elif bs_code <= 5:
        blocksize = 576 << (bs_code - 2)
    else:
        blocksize = 256 << (bs_code - 8)
    if sr_code == 0:
        rate = info["sample_rate"]
    elif sr_code in _RATE_FROM_CODE:
        rate = _RATE_FROM_CODE[sr_code]
    elif sr_code == 12:
        rate = data[pos] * 1000
        pos += 1
    elif sr_code == 13:
        rate = int.from_bytes(data[pos : pos + 2], "big")
        pos += 2
    elif sr_code == 14:
        rate = int.from_bytes(data[pos : pos + 2], "big") * 10
        pos += 2
    else:
        raise ValueError("flac: invalid sample rate code 1111")
    if size_code == 0:
        bps = info["bits_per_sample"]
    elif size_code in _SIZE_FROM_CODE:
        bps = _SIZE_FROM_CODE[size_code]
    else:
        raise ValueError(f"flac: reserved sample size code {size_code}")
    if _crc8(data[start:pos]) != data[pos]:
        raise ValueError(f"flac: frame header CRC-8 mismatch at byte {start}")
    pos += 1

    if chan_code <= 7:
        n_ch = chan_code + 1
        side = None
    elif chan_code in (8, 9, 10):
        n_ch = 2
        side = {8: "left", 9: "right", 10: "mid"}[chan_code]
    else:
        raise ValueError(f"flac: reserved channel assignment {chan_code}")

    bits = _Bits(data, pos)
    chans = []
    for c in range(n_ch):
        ch_bps = bps
        if side == "left" and c == 1:
            ch_bps += 1  # side channel
        elif side == "right" and c == 0:
            ch_bps += 1
        elif side == "mid" and c == 1:
            ch_bps += 1
        chans.append(_decode_subframe(bits, blocksize, ch_bps))
    bits.align()
    end = bits.pos
    crc = int.from_bytes(data[end : end + 2], "big")
    if _crc16(data[start:end]) != crc:
        raise ValueError(f"flac: frame CRC-16 mismatch at byte {start}")

    if side == "left":
        left, s = chans
        chans = [left, left - s]
    elif side == "right":
        s, right = chans
        chans = [right + s, right]
    elif side == "mid":
        mid, s = chans
        mid2 = (mid << 1) | (s & 1)
        chans = [(mid2 + s) >> 1, (mid2 - s) >> 1]
    return np.stack(chans, axis=1), rate, end + 2


def decode_flac(data: bytes) -> tuple[np.ndarray, int, dict]:
    """FLAC bytes -> ((n_samples, channels) int32 PCM, sample_rate, meta).

    Refuses loudly on any integrity failure: frame header CRC-8, frame
    CRC-16, and — when STREAMINFO carries a nonzero MD5 — the MD5 of the
    reconstructed PCM (the format's own end-to-end reference)."""
    data = bytes(data)
    try:
        info, pos = _parse_streaminfo(data)
        frames = []
        rate = info["sample_rate"]
        n = len(data)
        while pos < n:
            if n - pos == 128 and data[pos : pos + 3] == b"TAG":
                # ID3v1 trailer: some taggers append the fixed 128-byte
                # 'TAG' block to FLAC files. A frame can never start with
                # 0x54, the stream itself is complete and MD5-verifiable,
                # so accept-and-skip; any OTHER trailing bytes still refuse.
                break
            if n - pos < 5:  # can't even hold a frame header
                raise ValueError("flac: trailing bytes after the last frame")
            block, rate, pos = _decode_frame(data, pos, info)
            frames.append(block)
    except (IndexError, struct.error) as e:
        # codec-layer contract (same as jpegmini): malformed input is
        # always ValueError, never a raw indexing/struct error escaping
        raise ValueError(f"flac: truncated or malformed stream ({e})") from None
    if not frames:
        raise ValueError("flac: no audio frames")
    pcm = np.concatenate(frames, axis=0)
    total = info["total_samples"]
    if total and len(pcm) != total:
        raise ValueError(f"flac: decoded {len(pcm)} samples, STREAMINFO says {total}")
    md5 = info["md5"]
    bps = info["bits_per_sample"]
    verified = False
    if any(md5) and bps % 8 == 0:
        got = hashlib.md5(_pcm_bytes(pcm, bps // 8)).digest()
        if got != md5:
            raise ValueError("flac: decoded PCM MD5 mismatch (corrupt or misdecoded stream)")
        verified = True
    meta = {k: info[k] for k in ("sample_rate", "channels", "bits_per_sample", "total_samples")}
    # True ONLY when the end-to-end check actually ran: a nonzero MD5 on
    # a non-byte-aligned bps is skipped, and reporting it as verified
    # would claim a reference check that never happened
    meta["md5_verified"] = verified
    return pcm.astype(np.int32), rate, meta


def _pcm_bytes(pcm: np.ndarray, width: int) -> bytes:
    """Channel-interleaved little-endian signed PCM — the byte stream
    STREAMINFO's MD5 is defined over."""
    flat = np.asarray(pcm, dtype=np.int64).reshape(-1)
    if width == 2:
        return flat.astype("<i2").tobytes()
    if width == 1:
        return flat.astype("i1").tobytes()
    if width == 3:
        b = flat.astype("<i4").view(np.uint8).reshape(-1, 4)
        return b[:, :3].tobytes()
    if width == 4:
        return flat.astype("<i4").tobytes()
    raise ValueError(f"flac: unsupported PCM width {width}")


def flac_frame_offsets(data: bytes) -> tuple[int, list[tuple[int, int, int]]]:
    """-> (first-frame offset, [(start, end, n_samples) per frame]).

    Walks (and fully CRC-verifies, by decoding) every frame of a native
    FLAC stream — the splitter the Ogg-FLAC mapping writer needs, since
    RFC 5334 packs exactly one FLAC frame per Ogg packet and granule
    positions need the true per-frame sample counts (NOT max_blocksize:
    variable-blocksize streams are legal). Trailing ID3v1 'TAG' blocks
    are skipped like decode_flac does."""
    data = bytes(data)
    try:
        info, pos = _parse_streaminfo(data)
        first = pos
        out: list[tuple[int, int, int]] = []
        n = len(data)
        while pos < n:
            if n - pos == 128 and data[pos : pos + 3] == b"TAG":
                break
            if n - pos < 5:
                raise ValueError("flac: trailing bytes after the last frame")
            start = pos
            block, _rate, pos = _decode_frame(data, pos, info)
            out.append((start, pos, len(block)))
    except (IndexError, struct.error) as e:
        raise ValueError(f"flac: truncated or malformed stream ({e})") from None
    if not out:
        raise ValueError("flac: no audio frames")
    return first, out


def flac_meta(data: bytes) -> dict:
    """Header-only FLAC metadata (STREAMINFO; no frame decode)."""
    info, _pos = _parse_streaminfo(bytes(data))
    return {
        "kind": "audio",
        "sample_rate": info["sample_rate"],
        "channels": info["channels"],
        "bits_per_sample": info["bits_per_sample"],
        "n_samples": info["total_samples"],
        "duration_s": info["total_samples"] / info["sample_rate"] if info["sample_rate"] else 0.0,
        "n_bytes": len(data),
    }


# ---------------------------------------------------------------------------
# Encoder (deterministic fixture writer; lossless by construction, verified
# by the decoder's independent reconstruction + MD5)
# ---------------------------------------------------------------------------


def _rice_cost(u: np.ndarray, param: int) -> int:
    return int(np.sum(u >> param)) + len(u) * (param + 1)


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    best_p, best_c = 0, _rice_cost(u, 0)
    for p in range(1, 15):
        c = _rice_cost(u, p)
        if c < best_c:
            best_p, best_c = p, c
    return best_p, best_c


def _signed_bits_needed(v: np.ndarray) -> int:
    if len(v) == 0:
        return 1
    lo, hi = int(v.min()), int(v.max())
    need = 1
    while not (-(1 << (need - 1)) <= lo and hi < (1 << (need - 1))):
        need += 1
    return need


def _write_residual(bw: _BitW, residual: np.ndarray, order: int, partition_order: int) -> None:
    blocksize = len(residual) + order
    # the partition order must divide the blocksize and leave the first
    # partition (which loses the warmup samples) non-negative — clamp for
    # short last frames / high predictor orders
    while blocksize % (1 << partition_order) or (blocksize >> partition_order) < order:
        partition_order -= 1
    bw.write(0, 2)  # 4-bit rice method
    bw.write(partition_order, 4)
    part_n = blocksize >> partition_order
    offset = 0
    for p in range(1 << partition_order):
        n = part_n - (order if p == 0 else 0)
        part = residual[offset : offset + n]
        offset += n
        v = part.astype(np.int64)
        u = (v << 1) ^ (v >> 63)
        param, rice_cost = _best_rice_param(u)
        raw = _signed_bits_needed(v)
        # accumulate the partition's bit string in locals and emit in
        # bounded chunks — identical bits, no per-sample method calls
        acc = 0
        nb = 0
        if 5 + n * raw < rice_cost:
            bw.write(0xF, 4)  # escape: raw signed samples
            bw.write(raw, 5)
            rmask = (1 << raw) - 1
            for x in v.tolist():
                acc = (acc << raw) | (x & rmask)
                nb += raw
                if nb >= 8192:
                    bw.write(acc, nb)
                    acc = 0
                    nb = 0
        else:
            bw.write(param, 4)
            pmask = (1 << param) - 1
            for x in u.tolist():
                q = x >> param
                acc = ((acc << (q + 1)) | 1) << param | (x & pmask)
                nb += q + 1 + param
                if nb >= 8192:
                    bw.write(acc, nb)
                    acc = 0
                    nb = 0
        if nb:
            bw.write(acc, nb)


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    d = s.astype(np.int64)
    for _ in range(order):
        d = np.diff(d)
    return d


def _lpc_quantize(s: np.ndarray, order: int, precision: int = 12) -> tuple[list[int], int] | None:
    """Deterministic LPC fit: autocorrelation + Levinson-Durbin, quantized
    to ``precision`` signed bits. Lossless regardless of fit quality (the
    residual is computed with the same integer predictor the decoder
    runs); None when the signal is degenerate."""
    x = s.astype(np.float64)
    n = len(x)
    if n <= order or order < 1 or order > 32:
        return None
    r = np.array([np.dot(x[: n - k], x[k:]) for k in range(order + 1)])
    if r[0] == 0:
        return None
    err = r[0]
    a = np.zeros(order)
    for i in range(order):
        acc = r[i + 1] - np.dot(a[:i], r[i:0:-1][:i])
        if err == 0:
            return None
        k = acc / err
        a[: i + 1] = np.concatenate([a[:i] - k * a[:i][::-1], [k]])
        err *= 1 - k * k
        if err <= 0:
            return None
    cmax = np.max(np.abs(a))
    if cmax == 0 or not np.isfinite(cmax):
        return None
    shift = precision - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    q = np.clip(np.rint(a * (1 << shift)), -(1 << (precision - 1)), (1 << (precision - 1)) - 1)
    q = q.astype(np.int64)
    if not q.any():
        return None
    return [int(c) for c in q], shift


def _lpc_residual(s: np.ndarray, coefs: list[int], shift: int) -> np.ndarray:
    order = len(coefs)
    x = s.astype(np.int64)
    pred = np.zeros(len(x) - order, dtype=np.int64)
    for c in range(order):
        pred += coefs[c] * x[order - 1 - c : len(x) - 1 - c]
    return x[order:] - (pred >> shift)


def _encode_subframe(
    bw: _BitW,
    s: np.ndarray,
    bps: int,
    lpc_order: int,
    partition_order: int,
    force: str | None,
) -> None:
    s = s.astype(np.int64)
    # wasted bits: common trailing zeros shrink every warmup/verbatim/
    # residual write; decoder shifts back
    wasted = 0
    if force != "verbatim" and s.any():
        ors = int(np.bitwise_or.reduce(s))
        wasted = (ors & -ors).bit_length() - 1
        wasted = max(0, min(wasted, bps - 1))
        if wasted:
            s = s >> wasted
    eff = bps - wasted

    def header(ftype: int) -> None:
        bw.write(0, 1)
        bw.write(ftype, 6)
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)
        else:
            bw.write(0, 1)

    if force != "verbatim" and np.all(s == s[0]):
        header(0)
        bw.write(int(s[0]), eff)
        return
    if force == "verbatim":
        header(1)
        for x in s:
            bw.write(int(x), eff)
        return
    if lpc_order:
        fit = _lpc_quantize(s, lpc_order)
        if fit is not None:
            coefs, shift = fit
            header(32 + lpc_order - 1)
            for x in s[:lpc_order]:
                bw.write(int(x), eff)
            bw.write(12 - 1, 4)  # precision 12
            bw.write(shift, 5)
            for c in coefs:
                bw.write(c, 12)
            _write_residual(bw, _lpc_residual(s, coefs, shift), lpc_order, partition_order)
            return
    # fixed predictor: smallest sum |residual| of orders 0..4
    best_order, best_res, best_cost = 0, s, None
    for order in range(0, 5):
        if order >= len(s):
            break
        res = _fixed_residual(s, order)
        cost = int(np.sum(np.abs(res)))
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    header(8 + best_order)
    for x in s[:best_order]:
        bw.write(int(x), eff)
    _write_residual(bw, best_res, best_order, partition_order)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 44100,
    block_size: int = 1024,
    stereo_mode: str = "auto",
    lpc_order: int = 0,
    partition_order: int = 0,
    force: str | None = None,
    bits: int = 16,
) -> bytes:
    """(n,) or (n, channels) integer PCM -> FLAC bytes (8/16/24-bit).

    Deterministic: no psychoacoustics, no search beyond the fixed-order
    pick and per-partition rice parameter. ``stereo_mode``: 'indep' |
    'mid' | 'left' | 'right' | 'auto' (mid-side for 2 channels);
    ``lpc_order`` > 0 encodes LPC subframes (decoder-identical integer
    predictor, so still lossless); ``force`` = 'verbatim' exercises that
    path; ``bits`` in (8, 16, 24) — the sample-size codes the frame
    header carries natively. Blocksize must divide by 2^partition_order."""
    if bits not in (8, 16, 24):
        raise ValueError("flac encode: bits must be 8, 16 or 24")
    if not 0 < sample_rate < (1 << 20):
        # STREAMINFO carries the rate in a 20-bit field; anything larger
        # would overflow the packed.to_bytes(8) write below with a raw
        # OverflowError instead of the codec-layer ValueError contract
        raise ValueError("flac encode: sample_rate must fit STREAMINFO's 20-bit field")
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if np.any(s > hi) or np.any(s < lo):
        raise ValueError(f"flac encode: samples out of int{bits} range")
    s = s.astype(np.int64)
    n, n_ch = s.shape
    if n == 0:
        raise ValueError("flac encode: empty signal")
    if n_ch > 8:
        raise ValueError("flac encode: more than 8 channels")
    if block_size % (1 << partition_order):
        raise ValueError("flac encode: partition order must divide block size")
    bps = bits
    if stereo_mode == "auto":
        stereo_mode = "mid" if n_ch == 2 else "indep"
    if n_ch != 2:
        stereo_mode = "indep"

    md5 = hashlib.md5(_pcm_bytes(s, bits // 8)).digest()
    packed = (
        (sample_rate << 44)
        | ((n_ch - 1) << 41)
        | ((bps - 1) << 36)
        | (n & ((1 << 36) - 1))
    )
    frames = bytearray()
    frame_sizes = []
    for fi, off in enumerate(range(0, n, block_size)):
        blk = s[off : off + block_size].astype(np.int64)
        bs = len(blk)
        hdr = bytearray([0xFF, 0xF8])
        bs_code = _BLOCKSIZE_CODES.get(bs)
        bs_extra = b""
        if bs_code is None:
            if bs - 1 < 256:
                bs_code, bs_extra = 6, bytes([bs - 1])
            else:
                bs_code, bs_extra = 7, struct.pack(">H", bs - 1)
        sr_code = _SAMPLE_RATE_CODES.get(sample_rate, 0)
        hdr.append((bs_code << 4) | sr_code)
        if stereo_mode == "indep":
            chan_code = n_ch - 1
        else:
            chan_code = {"left": 8, "right": 9, "mid": 10}[stereo_mode]
        hdr.append((chan_code << 4) | (_SAMPLE_SIZE_CODES[bps] << 1))
        hdr += _utf8_encode(fi)
        hdr += bs_extra
        hdr.append(_crc8(bytes(hdr)))

        bw = _BitW()
        if stereo_mode == "indep":
            chans = [(blk[:, c], bps) for c in range(n_ch)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if stereo_mode == "left":
                chans = [(left, bps), (side, bps + 1)]
            elif stereo_mode == "right":
                chans = [(side, bps + 1), (right, bps)]
            else:
                chans = [((left + right) >> 1, bps), (side, bps + 1)]
        for ch, ch_bps in chans:
            _encode_subframe(bw, ch, ch_bps, lpc_order, partition_order, force)
        bw.align()
        frame = bytes(hdr) + bw.tobytes()
        frame += struct.pack(">H", _crc16(frame))
        frames += frame
        frame_sizes.append(len(frame))

    # the last block may be short and is excluded from min/max blocksize
    # (libFLAC convention: fixed-blocksize streams report min == max)
    bs_nominal = block_size if n >= block_size else n
    streaminfo = (
        struct.pack(">HH", bs_nominal, bs_nominal)
        + min(frame_sizes).to_bytes(3, "big")
        + max(frame_sizes).to_bytes(3, "big")
        + packed.to_bytes(8, "big")
        + md5
    )
    return FLAC_MAGIC + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo + bytes(frames)
