"""AIFF / AIFF-C and Sun AU audio containers + an IMA-ADPCM codec core.

Why these three: after WAV/G.711 (codecs.py), FLAC (flacmini.py) and Ogg
(oggmini.py), the remaining uncompressed-audio containers a web crawl
actually yields are AIFF (Apple ecosystem exports), AU (Unix/Java
heritage, still the `audio/basic` MIME type) and IMA-ADPCM WAV (the 4:1
telephony/voicemail compression, WAVE format tag 0x0011).  All three are
fully decodable with no external library, and — uniquely in this
environment — every byte of behavior is pinnable against a REFERENCE
IMPLEMENTATION shipped in CPython 3.11's stdlib:

  * ``aifc``    — reads/writes AIFF and AIFF-C incl. 'sowt', 'ulaw',
                  'alaw' compression (tests/test_aiff_au.py pins both
                  directions: stdlib-authored bytes decode here, and
                  bytes authored here read back through ``aifc``);
  * ``sunau``   — same two-directional pin for AU;
  * ``audioop`` — the Intel/DVI IMA-ADPCM step codec
                  (``lin2adpcm``/``adpcm2lin``): the nibble DP core
                  below is bit-exact against it including carried
                  (predictor, index) state.

The parse-correctly-or-refuse contract from the image/audio codec family
applies: unsupported compression types (QuickTime 'ima4', 'MAC3'/'MAC6',
G.722, AU encodings we cannot verify) raise ``NotImplementedError`` with
the reason; malformed containers raise ``ValueError``.  Reference parity
note: dgarnitz/vectorflow treats all media as opaque bytes (src/api/app.py
accepts uploads without decoding); this module is part of the multimodal
extension surface (SURVEY.md "training-data pipeline" mandate), not a
translation of any reference code.

Scale shape (PLANS.md): every entry point is a pure ``bytes -> ndarray``
kernel used inside Arrow-batched ``mapInPandas`` projections — per-row
work, no shuffle, embarrassingly parallel; the 100-TB plan is the same
as the JPEG/FLAC decode family (alpha ~= 1 per-byte, executor-local).
"""

from __future__ import annotations

import struct

import numpy as np

from vectorflow_spark.operators.codecs import _ALAW_TABLE, _ULAW_TABLE, _pcm_samples

# ---------------------------------------------------------------------------
# 80-bit IEEE 754 extended float (the AIFF COMM sample-rate field)
# ---------------------------------------------------------------------------


def read_f80(b: bytes) -> float:
    """Decode the 10-byte big-endian extended float AIFF stores sample
    rates in (sign+15-bit exponent, 64-bit mantissa with explicit
    integer bit)."""
    if len(b) != 10:
        raise ValueError(f"extended float must be 10 bytes, got {len(b)}")
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("AIFF sample rate is inf/nan")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def write_f80(x: float) -> bytes:
    """Encode a positive rational sample rate as the 10-byte extended
    float (same bit layout ``aifc._write_float`` produces)."""
    if x < 0:
        raise ValueError("negative sample rate")
    if x == 0:
        return b"\x00" * 10
    import math

    mant, e = math.frexp(x)  # x = mant * 2**e, mant in [0.5, 1)
    exp = e + 16383 - 1
    if not 0 < exp < 0x7FFF:
        raise ValueError(f"sample rate {x} out of extended-float range")
    m = int(mant * (1 << 64))  # integer bit lands in the MSB
    return struct.pack(">HQ", exp, m)


# ---------------------------------------------------------------------------
# AIFF / AIFF-C (EA IFF 85 framing: FORM container, COMM + SSND chunks)
# ---------------------------------------------------------------------------

_AIFF_SUPPORTED = {b"NONE", b"sowt", b"ulaw", b"ULAW", b"alaw", b"ALAW", b"fl32", b"FL32", b"fl64", b"FL64"}
_AIFF_REFUSED = {
    b"ima4": "QuickTime ima4 framing has no reference implementation in this environment",
    b"MAC3": "MACE 3:1 is proprietary and unverifiable here",
    b"MAC6": "MACE 6:1 is proprietary and unverifiable here",
    b"G722": "G.722 SB-ADPC has no reference implementation in this environment",
}
_FVER_TIMESTAMP = 0xA2805140  # AIFC May 23 1990 version stamp


def _iff_chunks(data: bytes, start: int, end: int):
    """Walk even-padded IFF chunks: yields (fourcc, body_offset, size)."""
    o = start
    while o + 8 <= end:
        fourcc = data[o : o + 4]
        (size,) = struct.unpack_from(">I", data, o + 4)
        body = o + 8
        if body + size > end:
            raise ValueError(f"AIFF: chunk {fourcc!r} overruns container")
        yield fourcc, body, size
        o = body + size + (size & 1)


def aiff_meta(data: bytes) -> dict:
    """Parse FORM/AIFF | FORM/AIFC headers -> metadata dict (no sample
    decode).  Keys: form, n_channels, n_frames, bits, sample_rate,
    compression (4cc str), compression_name."""
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"FORM":
        raise ValueError("not an AIFF file (missing FORM)")
    (form_size,) = struct.unpack_from(">I", data, 4)
    form = data[8:12]
    if form not in (b"AIFF", b"AIFC"):
        raise ValueError(f"not an AIFF form: {form!r}")
    end = min(len(data), 8 + form_size)
    comm = None
    ssnd_size = None
    for fourcc, body, size in _iff_chunks(data, 12, end):
        if fourcc == b"COMM":
            min_size = 22 if form == b"AIFC" else 18
            if size < min_size:
                raise ValueError(f"AIFF: COMM chunk too small ({size})")
            n_ch, n_frames, bits = struct.unpack_from(">HIH", data, body)
            rate = read_f80(data[body + 8 : body + 18])
            if form == b"AIFC":
                comp = data[body + 18 : body + 22]
                name_len = data[body + 22] if size > 22 else 0
                if name_len and 23 + name_len > size:
                    raise ValueError(
                        f"AIFC: compressionName pstring ({name_len} bytes) overruns "
                        f"the COMM chunk (size {size})"
                    )
                comp_name = data[body + 23 : body + 23 + name_len].decode("latin-1")
            else:
                comp, comp_name = b"NONE", "not compressed"
            comm = (n_ch, n_frames, bits, rate, comp, comp_name)
        elif fourcc == b"SSND":
            ssnd_size = size
    if comm is None:
        raise ValueError("AIFF: missing COMM chunk")
    n_ch, n_frames, bits, rate, comp, comp_name = comm
    if n_ch < 1:
        raise ValueError("AIFF: zero channels")
    if not 1 <= bits <= 32:
        raise ValueError(f"AIFF: sample size {bits} out of range")
    return {
        "form": form.decode("ascii"),
        "n_channels": int(n_ch),
        "n_frames": int(n_frames),
        "bits": int(bits),
        "sample_rate": rate,
        "compression": comp.decode("latin-1"),
        "compression_name": comp_name,
        "ssnd_bytes": ssnd_size,
    }


def decode_aiff(data: bytes) -> tuple[np.ndarray, int, dict]:
    """AIFF/AIFC -> (samples (n_frames, n_channels), rate, meta).

    PCM ('NONE' big-endian, 'sowt' little-endian 16-bit) returns the raw
    integer values (int32); 'ulaw'/'alaw' return the G.711-expanded
    16-bit-scale integers (the same tables the WAV format-6/7 path
    uses); 'fl32'/'fl64' return float64 passthrough.  Unsupported
    compression refuses loudly (contract above)."""
    data = bytes(data)
    meta = aiff_meta(data)
    comp = meta["compression"].encode("latin-1")
    if comp in _AIFF_REFUSED:
        raise NotImplementedError(f"AIFC compression {comp!r}: {_AIFF_REFUSED[comp]}")
    if comp not in _AIFF_SUPPORTED:
        raise NotImplementedError(f"AIFC compression {comp!r} not supported")
    (form_size,) = struct.unpack_from(">I", data, 4)
    end = min(len(data), 8 + form_size)
    payload = None
    for fourcc, body, size in _iff_chunks(data, 12, end):
        if fourcc == b"SSND":
            if size < 8:
                raise ValueError("AIFF: SSND chunk too small")
            offset, _blocksize = struct.unpack_from(">II", data, body)
            payload = data[body + 8 + offset : body + size]
            break
    if payload is None:
        raise ValueError("AIFF: missing SSND chunk")
    n_ch, n_frames, bits = meta["n_channels"], meta["n_frames"], meta["bits"]
    rate = int(round(meta["sample_rate"]))

    if comp in (b"fl32", b"FL32", b"fl64", b"FL64"):
        width = 4 if comp in (b"fl32", b"FL32") else 8
        need = n_frames * n_ch * width
        if len(payload) < need:
            raise ValueError("AIFF: SSND shorter than COMM numSampleFrames")
        samples = np.frombuffer(payload, dtype=f">f{width}", count=n_frames * n_ch).astype(np.float64)
    elif comp in (b"ulaw", b"ULAW", b"alaw", b"ALAW"):
        # companded: one byte per sample regardless of COMM sampleSize
        need = n_frames * n_ch
        if len(payload) < need:
            raise ValueError("AIFF: SSND shorter than COMM numSampleFrames")
        codes = np.frombuffer(payload, dtype=np.uint8, count=need)
        table = _ULAW_TABLE if comp in (b"ulaw", b"ULAW") else _ALAW_TABLE
        samples = table[codes].astype(np.int32)
    else:  # integer PCM
        width = (bits + 7) // 8
        need = n_frames * n_ch * width
        if len(payload) < need:
            raise ValueError("AIFF: SSND shorter than COMM numSampleFrames")
        raw = payload[:need]
        if comp == b"sowt":  # AIFC little-endian shortcut (16-bit only per spec)
            if width != 2:
                raise ValueError("AIFC sowt requires 16-bit samples")
            samples = np.frombuffer(raw, dtype="<i2").astype(np.int32)
        elif width == 1:  # AIFF 8-bit is SIGNED (unlike WAV u8)
            samples = np.frombuffer(raw, dtype=np.int8).astype(np.int32)
        elif width == 2:
            samples = np.frombuffer(raw, dtype=">i2").astype(np.int32)
        elif width == 3:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
            v = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
            samples = (v ^ 0x800000) - 0x800000
        elif width == 4:
            samples = np.frombuffer(raw, dtype=">i4").astype(np.int32)
        else:
            raise NotImplementedError(f"AIFF {bits}-bit PCM not supported")
    return samples.reshape(n_frames, n_ch), rate, meta


def encode_aiff(
    samples: np.ndarray,
    sample_rate: int,
    sampwidth: int = 2,
    compression: str = "NONE",
) -> bytes:
    """Write AIFF ('NONE' + sampwidth 1/2/3/4) or AIFF-C ('sowt',
    'ulaw', 'alaw', 'fl32').  ``samples`` is (n_frames,) mono or
    (n_frames, n_channels); integer values for PCM/companded paths
    (companded input = 16-bit linear, companded on write), float for
    'fl32'.  Output reads back through stdlib ``aifc`` for every
    compression aifc supports (pinned in tests)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_ch = arr.shape
    comp = compression.encode("ascii")
    if comp == b"NONE":
        form = b"AIFF"
        bits = sampwidth * 8
        if sampwidth == 1:
            raw = arr.astype(np.int8).tobytes()
        elif sampwidth == 2:
            raw = arr.astype(">i2").tobytes()
        elif sampwidth == 3:
            v = arr.astype(">i4").view(np.uint8).reshape(-1, 4)
            raw = np.ascontiguousarray(v[:, 1:]).tobytes()
        elif sampwidth == 4:
            raw = arr.astype(">i4").tobytes()
        else:
            raise ValueError(f"sampwidth {sampwidth} not supported (1-4)")
        comp_tail = b""
    elif comp == b"sowt":
        form, bits = b"AIFC", 16
        raw = arr.astype("<i2").tobytes()
        comp_tail = b"sowt" + _pstring(b"not compressed")
    elif comp in (b"ulaw", b"alaw"):
        form, bits = b"AIFC", 16
        lin = arr.astype(np.int32).ravel()
        codes = _lin2ulaw(lin) if comp == b"ulaw" else _lin2alaw(lin)
        raw = codes.tobytes()
        comp_tail = comp + _pstring(b"CCITT G.711 " + (b"u-law" if comp == b"ulaw" else b"A-law"))
    elif comp == b"fl32":
        form, bits = b"AIFC", 32
        raw = arr.astype(">f4").tobytes()
        comp_tail = b"fl32" + _pstring(b"IEEE 32-bit float")
    else:
        raise NotImplementedError(f"encode_aiff does not write compression {compression!r}")

    comm = struct.pack(">HIH", n_ch, n_frames, bits) + write_f80(float(sample_rate)) + comp_tail
    chunks = b""
    if form == b"AIFC":
        chunks += b"FVER" + struct.pack(">II", 4, _FVER_TIMESTAMP)
    chunks += b"COMM" + struct.pack(">I", len(comm)) + comm + (b"\x00" if len(comm) & 1 else b"")
    ssnd = struct.pack(">II", 0, 0) + raw
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd + (b"\x00" if len(ssnd) & 1 else b"")
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + form + chunks


def _pstring(s: bytes) -> bytes:
    """IFF pascal string: length byte + bytes, padded to EVEN TOTAL."""
    out = bytes([len(s)]) + s
    return out + (b"\x00" if len(out) & 1 else b"")


# ---------------------------------------------------------------------------
# G.711 compressors (the inverse of codecs._g711_*_table) — needed by the
# AIFF/AU writers; bit-exact vs audioop.lin2ulaw/lin2alaw (pinned in tests).
# ---------------------------------------------------------------------------


_ULAW_SEG_END = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF], dtype=np.int64)
_ALAW_SEG_END = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int64)


def _lin2ulaw(v: np.ndarray) -> np.ndarray:
    """16-bit linear -> mu-law codes: the public-domain Sun g711.c
    `linear2ulaw` on the 14-bit pipeline (sample >> 2, CLIP 8159,
    BIAS>>2 = 33, segment search) — the exact arithmetic
    ``audioop.lin2ulaw`` runs, pinned in tests."""
    v = np.clip(np.asarray(v, dtype=np.int64), -32768, 32767)
    p = v >> 2
    mask = np.where(p < 0, 0x7F, 0xFF)
    p = np.where(p < 0, -p, p)
    p = np.minimum(p, 8159) + 33
    seg = np.searchsorted(_ULAW_SEG_END, p, side="left")
    uval = (seg << 4) | ((p >> (seg + 1)) & 0x0F)
    return (np.where(seg >= 8, 0x7F, uval) ^ mask).astype(np.uint8)


def _lin2alaw(v: np.ndarray) -> np.ndarray:
    """16-bit linear -> A-law codes: Sun g711.c `linear2alaw` on the
    13-bit pipeline (sample >> 3, 0x55/0xD5 toggle, segment search),
    bit-exact vs ``audioop.lin2alaw``."""
    v = np.clip(np.asarray(v, dtype=np.int64), -32768, 32767)
    p = v >> 3
    mask = np.where(p >= 0, 0xD5, 0x55)
    p = np.where(p >= 0, p, -p - 1)
    seg = np.searchsorted(_ALAW_SEG_END, p, side="left")
    segc = np.minimum(seg, 7)
    mant = np.where(segc < 2, (p >> 1) & 0x0F, (p >> segc) & 0x0F)
    aval = (segc << 4) | mant
    return (np.where(seg >= 8, 0x7F, aval) ^ mask).astype(np.uint8)


# ---------------------------------------------------------------------------
# Sun AU (.au / .snd — the `audio/basic` MIME type)
# ---------------------------------------------------------------------------

_AU_MAGIC = b".snd"
# encoding id -> (name, bytes per sample, kind)
_AU_ENCODINGS = {
    1: ("ulaw", 1, "g711"),
    2: ("pcm8", 1, "pcm"),
    3: ("pcm16", 2, "pcm"),
    4: ("pcm24", 3, "pcm"),
    5: ("pcm32", 4, "pcm"),
    6: ("float32", 4, "float"),
    7: ("float64", 8, "float"),
    27: ("alaw", 1, "g711"),
}


def au_meta(data: bytes) -> dict:
    """Parse the 24+-byte AU header -> metadata dict."""
    data = bytes(data)
    if len(data) < 24 or data[:4] != _AU_MAGIC:
        raise ValueError("not an AU file (missing .snd magic)")
    hdr_size, data_size, encoding, rate, n_ch = struct.unpack_from(">IIIII", data, 4)
    if hdr_size < 24:
        raise ValueError(f"AU: header size {hdr_size} < 24")
    if hdr_size > len(data):
        raise ValueError("AU: header overruns file")
    if n_ch < 1:
        raise ValueError("AU: zero channels")
    if encoding not in _AU_ENCODINGS:
        raise NotImplementedError(
            f"AU encoding {encoding} not supported (G.721/G.723 ADPCM and "
            "DSP formats have no reference implementation in this environment)"
        )
    name, width, kind = _AU_ENCODINGS[encoding]
    avail = len(data) - hdr_size
    size = avail if data_size == 0xFFFFFFFF else min(data_size, avail)
    return {
        "encoding": name,
        "encoding_id": int(encoding),
        "sample_rate": int(rate),
        "n_channels": int(n_ch),
        "data_bytes": int(size),
        "n_frames": int(size // (width * n_ch)),
        "annotation": data[24:hdr_size].split(b"\x00", 1)[0].decode("latin-1"),
    }


def decode_au(data: bytes) -> tuple[np.ndarray, int, dict]:
    """AU -> (samples (n_frames, n_channels), rate, meta).  mu/A-law
    expand through the shared G.711 tables; PCM is big-endian signed
    (including 8-bit, unlike WAV); floats pass through."""
    data = bytes(data)
    meta = au_meta(data)
    hdr_size = struct.unpack_from(">I", data, 4)[0]
    n_ch, width = meta["n_channels"], _AU_ENCODINGS[meta["encoding_id"]][1]
    n = meta["n_frames"] * n_ch
    payload = data[hdr_size : hdr_size + n * width]
    kind = _AU_ENCODINGS[meta["encoding_id"]][2]
    if kind == "g711":
        codes = np.frombuffer(payload, dtype=np.uint8, count=n)
        table = _ULAW_TABLE if meta["encoding"] == "ulaw" else _ALAW_TABLE
        samples = table[codes].astype(np.int32)
    elif kind == "float":
        samples = np.frombuffer(payload, dtype=f">f{width}", count=n).astype(np.float64)
    elif width == 1:
        samples = np.frombuffer(payload, dtype=np.int8, count=n).astype(np.int32)
    elif width == 3:
        b = np.frombuffer(payload, dtype=np.uint8, count=n * 3).reshape(-1, 3).astype(np.int32)
        v = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
        samples = (v ^ 0x800000) - 0x800000
    else:
        samples = np.frombuffer(payload, dtype=f">i{width}", count=n).astype(np.int32)
    return samples.reshape(meta["n_frames"], n_ch), meta["sample_rate"], meta


def encode_au(
    samples: np.ndarray,
    sample_rate: int,
    encoding: str = "pcm16",
    annotation: bytes = b"",
) -> bytes:
    """Write AU.  ``encoding`` in {ulaw, alaw, pcm8, pcm16, pcm24,
    pcm32, float32, float64}; companded input is 16-bit linear.
    Readable by stdlib ``sunau`` for every encoding sunau supports."""
    ids = {name: (eid, width, kind) for eid, (name, width, kind) in _AU_ENCODINGS.items()}
    if encoding not in ids:
        raise ValueError(f"unknown AU encoding {encoding!r}")
    eid, width, kind = ids[encoding]
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_ch = arr.shape[1]
    flat = arr.ravel()
    if kind == "g711":
        raw = (_lin2ulaw(flat) if encoding == "ulaw" else _lin2alaw(flat)).tobytes()
    elif kind == "float":
        raw = flat.astype(f">f{width}").tobytes()
    elif width == 1:
        raw = flat.astype(np.int8).tobytes()
    elif width == 3:
        v = flat.astype(">i4").view(np.uint8).reshape(-1, 4)
        raw = np.ascontiguousarray(v[:, 1:]).tobytes()
    else:
        raw = flat.astype(f">i{width}").tobytes()
    # info field: NUL-terminated, padded to a multiple of 4, min 4 bytes
    ann = annotation + b"\x00"
    ann += b"\x00" * (-len(ann) % 4)
    hdr = _AU_MAGIC + struct.pack(">IIIII", 24 + len(ann), len(raw), eid, sample_rate, n_ch)
    return hdr + ann + raw


def encode_au_g711_codes(codes: np.ndarray, sample_rate: int, law: str = "ulaw") -> bytes:
    """Mono AU writer over RAW companded bytes (encoding 1 = mu-law,
    27 = A-law) — the AU twin of ``codecs.encode_wav_g711``, fixture
    for proving the shared G.711 tables ride a second container."""
    eid = {"ulaw": 1, "alaw": 27}[law]
    raw = np.asarray(codes, dtype=np.uint8).tobytes()
    return _AU_MAGIC + struct.pack(">IIIII", 28, len(raw), eid, sample_rate, 1) + b"\x00" * 4 + raw


# ---------------------------------------------------------------------------
# IMA / DVI ADPCM — the nibble-DP core, bit-exact vs audioop, plus the
# WAVE_FORMAT_IMA_ADPCM (0x0011) block framing on top of it.
# ---------------------------------------------------------------------------

_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
_IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)


def ima_decode_nibbles(
    nibbles: np.ndarray, predictor: int, index: int
) -> tuple[np.ndarray, int, int]:
    """Run the IMA step DP over a 4-bit code stream: returns
    (int16 samples — one per nibble, final predictor, final index).
    Reconstruction uses the exact conditional-add form (step>>3 plus
    the three conditional step adds), the same arithmetic
    ``audioop.adpcm2lin`` implements — NOT the (2d+1)*step/8
    approximation some decoders use.  Sequential by nature (each
    nibble depends on the previous state); callers batch per
    block/file, which is the unit of parallelism."""
    steps = _IMA_STEP_TABLE
    idxt = _IMA_INDEX_TABLE
    out = np.empty(len(nibbles), dtype=np.int16)
    pred = int(predictor)
    idx = int(index)
    if not 0 <= idx <= 88:
        raise ValueError(f"IMA index {idx} out of range 0..88")
    for i, d in enumerate(nibbles):
        d = int(d)
        step = int(steps[idx])
        vpdiff = step >> 3
        if d & 4:
            vpdiff += step
        if d & 2:
            vpdiff += step >> 1
        if d & 1:
            vpdiff += step >> 2
        pred = pred - vpdiff if d & 8 else pred + vpdiff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(idxt[d & 7])))
        out[i] = pred
    return out, pred, idx


def ima_encode_samples(
    samples: np.ndarray, predictor: int = 0, index: int = 0
) -> tuple[np.ndarray, int, int]:
    """16-bit linear -> IMA 4-bit codes; returns (uint8 nibble values,
    final predictor, final index).  Bit-exact vs ``audioop.lin2adpcm``
    (same quantizer: three successive step halvings)."""
    steps = _IMA_STEP_TABLE
    idxt = _IMA_INDEX_TABLE
    vals = np.asarray(samples, dtype=np.int64)
    out = np.empty(len(vals), dtype=np.uint8)
    pred = int(predictor)
    idx = int(index)
    if not 0 <= idx <= 88:
        raise ValueError(f"IMA index {idx} out of range 0..88")
    for i, v in enumerate(vals):
        step = int(steps[idx])
        diff = int(v) - pred
        sign = 8 if diff < 0 else 0
        if sign:
            diff = -diff
        delta = 0
        vpdiff = step >> 3
        if diff >= step:
            delta = 4
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            delta |= 2
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            delta |= 1
            vpdiff += step
        pred = pred - vpdiff if sign else pred + vpdiff
        pred = max(-32768, min(32767, pred))
        delta |= sign
        idx = max(0, min(88, idx + int(idxt[delta & 7])))
        out[i] = delta
    return out, pred, idx


def adpcm_dvi_decode(
    data: bytes, state: tuple[int, int] | None = None
) -> tuple[np.ndarray, tuple[int, int]]:
    """Intel/DVI packed stream (HIGH nibble first — ``audioop``'s
    framing) -> (int16 samples, final (predictor, index) state)."""
    pred, idx = state if state is not None else (0, 0)
    b = np.frombuffer(bytes(data), dtype=np.uint8)
    nibbles = np.empty(len(b) * 2, dtype=np.uint8)
    nibbles[0::2] = b >> 4
    nibbles[1::2] = b & 0x0F
    out, pred, idx = ima_decode_nibbles(nibbles, pred, idx)
    return out, (pred, idx)


def adpcm_dvi_encode(
    samples: np.ndarray, state: tuple[int, int] | None = None
) -> tuple[bytes, tuple[int, int]]:
    """16-bit linear -> Intel/DVI packed stream (high nibble first),
    matching ``audioop.lin2adpcm`` byte-for-byte including the carried
    state."""
    pred, idx = state if state is not None else (0, 0)
    codes, pred, idx = ima_encode_samples(np.asarray(samples), pred, idx)
    if len(codes) & 1:
        codes = np.append(codes, 0)
    packed = ((codes[0::2] << 4) | codes[1::2]).astype(np.uint8)
    return packed.tobytes(), (pred, idx)


# -- WAVE_FORMAT_IMA_ADPCM (0x0011) block framing (mono) --------------------
#
# Per the Microsoft multimedia registration: each block_align-sized block
# opens with a 4-byte header (initial sample int16 LE — emitted verbatim
# as the block's first output sample — step index u8, reserved u8),
# followed by packed nibbles LOW NIBBLE FIRST (the opposite order from
# the DVI/audioop framing above; tests pin both against each other via a
# nibble swap).  samples_per_block = (block_align - 4) * 2 + 1.

WAVE_FORMAT_IMA_ADPCM = 0x0011


def decode_wav_ima_adpcm(data: bytes) -> tuple[np.ndarray, int]:
    """IMA-ADPCM WAV (format 0x0011, mono) -> (int16 samples, rate).
    The optional ``fact`` chunk's sample count truncates the final
    block (encoders emit it for exactly this reason); absent a fact
    chunk every nibble in every block decodes."""
    from vectorflow_spark.operators.codecs import RIFF_MAGIC, WAVE_FORM, _riff_chunks

    data = bytes(data)
    if data[:4] != RIFF_MAGIC or data[8:12] != WAVE_FORM:
        raise ValueError("not a WAV file")
    fmt = payload = None
    n_total = None
    end = min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    for fourcc, body, size in _riff_chunks(data, 12, end):
        if fourcc == b"fmt ":
            if size < 16 or body + 16 > len(data):
                raise ValueError("WAV: truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", data, body)
        elif fourcc == b"fact" and size >= 4 and body + 4 <= len(data):
            (n_total,) = struct.unpack_from("<I", data, body)
        elif fourcc == b"data":
            payload = data[body : body + size]
    if fmt is None or payload is None:
        raise ValueError("WAV: missing fmt or data chunk")
    audio_format, n_ch, rate, _bps, block_align, bits = fmt
    if audio_format != WAVE_FORMAT_IMA_ADPCM:
        raise ValueError(f"not an IMA-ADPCM WAV (format {audio_format})")
    if n_ch != 1:
        raise NotImplementedError(
            "multi-channel IMA-ADPCM WAV not supported (channel-interleaved "
            "8-byte groups; telephony corpora are mono — refuse loudly rather "
            "than de-interleave untested)"
        )
    if bits != 4:
        raise ValueError(f"IMA-ADPCM WAV must be 4-bit, got {bits}")
    if block_align < 5:
        raise ValueError(f"IMA-ADPCM block_align {block_align} too small")
    chunks_out = []
    remaining = n_total
    for o in range(0, len(payload), block_align):
        block = payload[o : o + block_align]
        if len(block) < 4:
            raise ValueError(f"IMA-ADPCM WAV: truncated block header at offset {o}")
        pred, idx = struct.unpack_from("<hB", block, 0)
        if idx > 88:
            raise ValueError(f"IMA-ADPCM block at {o}: step index {idx} > 88")
        b = np.frombuffer(block, dtype=np.uint8, offset=4)
        nibbles = np.empty(len(b) * 2, dtype=np.uint8)
        nibbles[0::2] = b & 0x0F  # LOW nibble first (WAV framing)
        nibbles[1::2] = b >> 4
        if remaining is not None:
            nibbles = nibbles[: max(0, remaining - 1)]
        decoded, _p, _i = ima_decode_nibbles(nibbles, pred, idx)
        chunk = np.concatenate(([np.int16(pred)], decoded))
        if remaining is not None:
            chunk = chunk[:remaining]
            remaining -= len(chunk)
        chunks_out.append(chunk)
        if remaining == 0:
            break
    if not chunks_out:
        raise ValueError("IMA-ADPCM WAV: no complete blocks in data chunk")
    return np.concatenate(chunks_out).astype(np.int16), rate


def encode_wav_ima_adpcm(
    samples: np.ndarray, sample_rate: int, block_frames: int = 505
) -> bytes:
    """16-bit linear mono -> IMA-ADPCM WAV (format 0x0011).
    ``block_frames`` = samples per block including the header sample;
    must be odd (the 4:1 nibble packing), default 505 -> the canonical
    256-byte block.  Writes the ``fact`` chunk so partial final blocks
    round-trip exactly."""
    if block_frames < 2 or block_frames % 2 == 0:
        raise ValueError("block_frames must be odd and >= 3")
    arr = np.asarray(samples, dtype=np.int16)
    n = len(arr)
    if n == 0:
        raise ValueError("empty sample stream")
    block_align = 4 + (block_frames - 1) // 2
    blocks = []
    idx = 0  # step index carries ACROSS blocks (predictor restarts per header)
    for o in range(0, n, block_frames):
        seg = arr[o : o + block_frames]
        pred = int(seg[0])
        idx0 = idx  # header carries the index the block DECODES from
        codes, _pred, idx = ima_encode_samples(seg[1:].astype(np.int64), pred, idx0)
        if len(codes) & 1:
            codes = np.append(codes, np.uint8(0))
        pad = (block_frames - 1) // 2 - len(codes) // 2
        packed = ((codes[1::2].astype(np.uint8) << 4) | codes[0::2]).astype(np.uint8)
        blocks.append(struct.pack("<hBB", pred, idx0, 0) + packed.tobytes() + b"\x00" * pad)
    raw = b"".join(blocks)
    avg_bps = (sample_rate * block_align + block_frames - 1) // block_frames
    fmt = struct.pack(
        "<HHIIHHHH", WAVE_FORMAT_IMA_ADPCM, 1, sample_rate, avg_bps, block_align, 4, 2, block_frames
    )
    from vectorflow_spark.operators.codecs import RIFF_MAGIC, WAVE_FORM

    body = (
        WAVE_FORM
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(raw)) + raw + (b"\x00" if len(raw) & 1 else b"")
    )
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body
