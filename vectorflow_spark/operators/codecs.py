"""Stdlib multimodal codecs: BMP images and WAV audio, plus the FAKE family.

The multimodal kernels (operators/multimodal.py) were container-gated in
round 2: the Arrow plumbing and pixel/sample math were real but only the
in-repo FAKE codec could feed them. BMP and PCM WAV are fully specified
public formats parseable with nothing beyond ``struct``/``numpy``/the
stdlib ``wave`` module, so this layer de-gates them:

* ``decode_image``  — FIMG (fake) or BMP (BITMAPINFOHEADER, uncompressed
  BI_RGB, 24/32-bit, bottom-up or top-down) -> (h, w, c) uint8 array.
* ``encode_bmp``    — the inverse writer (24-bit, bottom-up, row padding),
  so encode->decode roundtrips bit-exactly and fixtures are real files any
  image viewer opens.
* ``decode_audio``  — FAUD (fake) or RIFF/WAV PCM (8/16-bit via the
  stdlib ``wave`` module) -> (samples float64, sample_rate). 8-bit WAV is
  unsigned (matching the fake codec's u8 samples); 16-bit is signed.
* ``encode_wav``    — PCM writer for fixtures/roundtrips.
* ``probe_meta``    — header-only metadata for all five containers.

Formats that genuinely need external libraries (PNG/JPEG entropy coding,
MP3/AAC, MP4) still raise ``NotImplementedError`` loudly — the contract
is "parse correctly or refuse", never guess.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

FAKE_IMG_MAGIC, FAKE_AUD_MAGIC, FAKE_VID_MAGIC = b"FIMG", b"FAUD", b"FVID"
BMP_MAGIC = b"BM"
RIFF_MAGIC = b"RIFF"


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB -> (h, w, 3) uint8 RGB array."""
    if data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP file")
    (pixel_offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise NotImplementedError(f"BMP core-header size {hdr_size} not supported")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, compression={compression})"
        )
    top_down = h_raw < 0
    h = abs(h_raw)
    n_ch = bpp // 8
    row_bytes = (w * n_ch + 3) & ~3
    rows = np.frombuffer(
        data, dtype=np.uint8, count=row_bytes * h, offset=pixel_offset
    ).reshape(h, row_bytes)
    px = rows[:, : w * n_ch].reshape(h, w, n_ch)
    if not top_down:
        px = px[::-1]
    # BGR(A) -> RGB; alpha dropped (metadata keeps channels=3 for both)
    return np.ascontiguousarray(px[:, :, :3][:, :, ::-1])


def encode_bmp(px: np.ndarray) -> bytes:
    """(h, w, 3|1) uint8 RGB -> 24-bit bottom-up BMP bytes."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c == 1:
        px = np.repeat(px, 3, axis=2)
    elif c != 3:
        raise ValueError(f"expected 1 or 3 channels, got {c}")
    bgr = px[:, :, ::-1]
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    body = rows[::-1].tobytes()  # bottom-up
    pixel_offset = 14 + 40
    header = BMP_MAGIC + struct.pack("<IHHI", pixel_offset + len(body), 0, 0, pixel_offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + body


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (samples float64 [first channel], sample_rate). 8-bit is
    unsigned 0..255, 16-bit signed -32768..32767 — values pass through
    unscaled so feature stats are exact and testable."""
    with wave.open(io.BytesIO(data), "rb") as f:
        rate = f.getframerate()
        width = f.getsampwidth()
        n_ch = f.getnchannels()
        frames = f.readframes(f.getnframes())
    if width == 1:
        samples = np.frombuffer(frames, dtype=np.uint8)
    elif width == 2:
        samples = np.frombuffer(frames, dtype="<i2")
    else:
        raise NotImplementedError(f"{8 * width}-bit WAV not supported (8/16 only)")
    if n_ch > 1:
        samples = samples[::n_ch]  # first channel
    return samples.astype(np.float64), rate


def encode_wav(samples: np.ndarray, sample_rate: int, sampwidth: int = 1) -> bytes:
    """Mono PCM writer: sampwidth 1 -> u8, 2 -> i16."""
    arr = np.asarray(samples)
    raw = arr.astype(np.uint8 if sampwidth == 1 else "<i2").tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(sampwidth)
        f.setframerate(sample_rate)
        f.writeframes(raw)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Unified dispatch used by the multimodal kernels
# ---------------------------------------------------------------------------


def decode_image(data: bytes) -> np.ndarray:
    """FIMG or BMP -> (h, w, c) uint8. Raises loudly for other containers."""
    if data[:4] == FAKE_IMG_MAGIC:
        w, h, c = struct.unpack("<HHB", data[4:9])
        return np.frombuffer(data, dtype=np.uint8, offset=9).reshape(h, w, c)
    if data[:2] == BMP_MAGIC:
        return decode_bmp(data)
    raise NotImplementedError(
        "image decode supports the FAKE codec and BMP; PNG/JPEG need external "
        "libraries not installed in this environment"
    )


def encode_image_like(px: np.ndarray, container: bytes) -> bytes:
    """Re-encode pixels in the same container family as ``container``
    (resize and frame kernels return what they were given)."""
    if container[:4] == FAKE_IMG_MAGIC:
        px = np.asarray(px, dtype=np.uint8)
        h, w, c = px.shape
        return FAKE_IMG_MAGIC + struct.pack("<HHB", w, h, c) + px.tobytes()
    if container[:2] == BMP_MAGIC:
        return bytes(encode_bmp(px))
    raise NotImplementedError("unsupported image container")


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """FAUD or WAV -> (samples float64, sample_rate)."""
    if data[:4] == FAKE_AUD_MAGIC:
        (rate, n) = struct.unpack("<IH", data[4:10])
        return np.frombuffer(data, dtype=np.uint8, offset=10, count=n).astype(np.float64), rate
    if data[:4] == RIFF_MAGIC:
        return decode_wav(data)
    raise NotImplementedError(
        "audio decode supports the FAKE codec and PCM WAV; MP3/AAC need "
        "external libraries not installed in this environment"
    )
