"""AIFF/AIFF-C, Sun AU and IMA-ADPCM parity vs the CPython stdlib
reference implementations (``aifc``, ``sunau``, ``audioop``).

Two-directional pins, same discipline as the libjpeg/libpng suites:
stdlib-authored bytes must decode here to the stdlib's own sample
values, and bytes authored here must read back through the stdlib.

Byte-order quirks pinned deliberately (they are the part most worth a
reference): ``aifc``/``sunau`` compressed paths (ulaw/alaw) run audioop
on NATIVE little-endian input while their PCM paths expect big-endian
frames; AU PCM-8 is SIGNED unlike WAV's u8; the WAV IMA-ADPCM nibble
order (low first) is the OPPOSITE of audioop's DVI framing (high
first).
"""

from __future__ import annotations

import io
import struct
import warnings

import numpy as np
import pytest

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    import aifc
    import audioop
    import sunau

from vectorflow_spark.operators import aiffmini as A

RNG = np.random.default_rng(20260816)
X = RNG.integers(-32768, 32768, 2000).astype(np.int16)


def _keepopen() -> io.BytesIO:
    """aifc/sunau close the underlying file on .close(), which is when
    they patch the header — keep the buffer readable."""
    b = io.BytesIO()
    b.close = lambda: None  # type: ignore[method-assign]
    return b


def _aifc_author(comptype: bytes, data: bytes, nch=1, sw=2, rate=8000) -> bytes:
    buf = _keepopen()
    f = aifc.open(buf, "wb")
    f.setnchannels(nch)
    f.setsampwidth(sw)
    f.setframerate(rate)
    if comptype != b"NONE":
        f.setcomptype(comptype, b"x")
    f.writeframes(data)
    f.close()
    return buf.getvalue()


# ---------------------------------------------------------------------------
# G.711 compressors vs audioop (Sun g711.c arithmetic)
# ---------------------------------------------------------------------------


def test_lin2ulaw_bit_exact_vs_audioop():
    full = np.arange(-32768, 32768, dtype=np.int16)
    assert A._lin2ulaw(full).tobytes() == audioop.lin2ulaw(full.tobytes(), 2)


def test_lin2alaw_bit_exact_vs_audioop():
    full = np.arange(-32768, 32768, dtype=np.int16)
    assert A._lin2alaw(full).tobytes() == audioop.lin2alaw(full.tobytes(), 2)


# ---------------------------------------------------------------------------
# DVI ADPCM core vs audioop (stateless + carried state)
# ---------------------------------------------------------------------------


def test_adpcm_dvi_encode_decode_bit_exact():
    enc, st = A.adpcm_dvi_encode(X)
    ref, rst = audioop.lin2adpcm(X.tobytes(), 2, None)
    assert enc == ref and st == rst
    dec, dst = A.adpcm_dvi_decode(enc)
    rdec, rdst = audioop.adpcm2lin(enc, 2, None)
    assert dec.tobytes() == rdec and dst == rdst


def test_adpcm_dvi_state_carries_across_chunks():
    st_mine = st_ref = None
    out_mine, out_ref = [], []
    for i in range(0, len(X), 250):  # even chunks: audioop packs 2/byte
        seg = X[i : i + 250]
        b, st_mine = A.adpcm_dvi_encode(seg, st_mine)
        r, st_ref = audioop.lin2adpcm(seg.tobytes(), 2, st_ref)
        out_mine.append(b)
        out_ref.append(r)
    assert b"".join(out_mine) == b"".join(out_ref) and st_mine == st_ref


def test_ima_index_range_validated():
    with pytest.raises(ValueError, match="out of range"):
        A.ima_decode_nibbles(np.zeros(2, np.uint8), 0, 89)
    with pytest.raises(ValueError, match="out of range"):
        A.ima_encode_samples(np.zeros(2, np.int64), 0, -1)


# ---------------------------------------------------------------------------
# AIFF / AIFF-C
# ---------------------------------------------------------------------------


def test_aifc_authored_pcm_decodes():
    blob = _aifc_author(b"NONE", X.astype(">i2").tobytes(), rate=44100)
    s, rate, meta = A.decode_aiff(blob)
    assert rate == 44100 and meta["form"] == "AIFC"
    assert (s[:, 0] == X).all()


def test_aiff_form_plain_aiff_decodes():
    # aifc writes FORM/AIFF (not AIFC) when aiff=True
    buf = _keepopen()
    f = aifc.open(buf, "wb")
    f.aiff()
    f.setnchannels(2)
    f.setsampwidth(2)
    f.setframerate(22050)
    stereo = np.stack([X, X[::-1]], axis=1)
    f.writeframes(stereo.astype(">i2").tobytes())
    f.close()
    s, rate, meta = A.decode_aiff(buf.getvalue())
    assert meta["form"] == "AIFF" and meta["n_channels"] == 2
    assert (s == stereo).all()


@pytest.mark.parametrize("ctype", [b"ulaw", b"alaw"])
def test_aifc_authored_g711_decodes(ctype):
    # aifc's compressed write path feeds audioop NATIVE-LE samples
    blob = _aifc_author(ctype, X.tobytes())
    s, _rate, meta = A.decode_aiff(blob)
    law = audioop.ulaw2lin if ctype == b"ulaw" else audioop.alaw2lin
    comp = audioop.lin2ulaw if ctype == b"ulaw" else audioop.lin2alaw
    ref = np.frombuffer(law(comp(X.tobytes(), 2), 2), "<i2")
    assert meta["compression"] == ctype.decode()
    assert (s[:, 0] == ref).all()


def test_aifc_authored_sowt_decodes():
    blob = _aifc_author(b"sowt", X.astype(">i2").tobytes())
    s, _rate, _meta = A.decode_aiff(blob)
    assert (s[:, 0] == X).all()


@pytest.mark.parametrize("comp", ["NONE", "sowt", "ulaw", "alaw"])
def test_encode_aiff_reads_back_through_stdlib(comp):
    blob = A.encode_aiff(X, 8000, 2, comp)
    g = aifc.open(io.BytesIO(blob), "rb")
    assert g.getnframes() == len(X) and g.getframerate() == 8000
    frames = g.readframes(g.getnframes())
    if comp == "NONE":
        assert frames == X.astype(">i2").tobytes()
    elif comp == "sowt":
        # aifc normalizes sowt to its big-endian frame convention on read
        assert frames == X.astype(">i2").tobytes()
    else:
        law = audioop.ulaw2lin if comp == "ulaw" else audioop.alaw2lin
        cc = audioop.lin2ulaw if comp == "ulaw" else audioop.lin2alaw
        assert frames == law(cc(X.tobytes(), 2), 2)
    g.close()


def test_encode_aiff_fl32_roundtrips_here():
    # stdlib aifc cannot read fl32; our own decode is the check
    blob = A.encode_aiff(X.astype(np.float64), 48000, compression="fl32")
    s, rate, meta = A.decode_aiff(blob)
    assert rate == 48000 and meta["compression"] == "fl32"
    assert np.array_equal(s[:, 0], X.astype(np.float64))


@pytest.mark.parametrize("sw", [1, 2, 3, 4])
def test_aiff_pcm_widths_roundtrip(sw):
    lim = 1 << (8 * sw - 1)
    vals = RNG.integers(-lim, lim, 500).astype(np.int64)
    blob = A.encode_aiff(vals, 8000, sw, "NONE")
    s, _rate, meta = A.decode_aiff(blob)
    assert meta["bits"] == 8 * sw
    assert (s[:, 0] == vals).all()


def test_aiff_refusals():
    with pytest.raises(ValueError, match="FORM"):
        A.aiff_meta(b"RIFF" + b"\x00" * 20)
    blob = bytearray(A.encode_aiff(X[:64], 8000, 2, "sowt"))
    i = blob.index(b"sowt", 20)
    blob[i : i + 4] = b"ima4"
    with pytest.raises(NotImplementedError, match="ima4"):
        A.decode_aiff(bytes(blob))
    blob[i : i + 4] = b"MAC3"
    with pytest.raises(NotImplementedError, match="MAC3"):
        A.decode_aiff(bytes(blob))
    # truncated SSND vs COMM numSampleFrames
    good = A.encode_aiff(X[:64], 8000, 2, "NONE")
    with pytest.raises(ValueError):
        A.decode_aiff(good[:-40])


def test_f80_bit_exact_vs_aifc_writer():
    for r in (8000, 11025, 16000, 22050, 44056, 44100, 48000, 96000, 192000, 8012.8208):
        buf = _keepopen()
        aifc._write_float(buf, r)
        assert buf.getvalue() == A.write_f80(float(r)), r
        assert abs(A.read_f80(buf.getvalue()) - r) < 1e-6 * max(1.0, r)
    with pytest.raises(ValueError):
        A.read_f80(b"\x7f\xff" + b"\x00" * 8)  # inf/nan exponent
    with pytest.raises(ValueError):
        A.write_f80(-1.0)


# ---------------------------------------------------------------------------
# Sun AU
# ---------------------------------------------------------------------------


def _sunau_author(comptype: str, data: bytes, sw=2, rate=8000) -> bytes:
    buf = _keepopen()
    f = sunau.open(buf, "wb")
    f.setnchannels(1)
    f.setsampwidth(sw)
    f.setframerate(rate)
    f.setcomptype(comptype, "")  # sunau DEFAULTS to ULAW; always set
    f.writeframes(data)
    f.close()
    return buf.getvalue()


@pytest.mark.parametrize("sw", [1, 2, 4])
def test_sunau_authored_pcm_decodes(sw):
    lim = 1 << (8 * sw - 1)
    vals = RNG.integers(-lim, lim, 500).astype(np.int64)
    blob = _sunau_author("NONE", vals.astype(f">i{sw}").tobytes(), sw=sw)
    s, rate, meta = A.decode_au(blob)
    assert rate == 8000 and meta["encoding"] == f"pcm{8 * sw}"
    assert (s[:, 0] == vals).all()


def test_sunau_authored_ulaw_decodes():
    blob = _sunau_author("ULAW", X.tobytes())  # native-LE input, like aifc
    s, _rate, meta = A.decode_au(blob)
    ref = np.frombuffer(audioop.ulaw2lin(audioop.lin2ulaw(X.tobytes(), 2), 2), "<i2")
    assert meta["encoding"] == "ulaw"
    assert (s[:, 0] == ref).all()


@pytest.mark.parametrize(
    "enc,sw", [("ulaw", 1), ("alaw", 1), ("pcm8", 1), ("pcm16", 2), ("pcm32", 4)]
)
def test_encode_au_reads_back_through_sunau(enc, sw):
    inp = (X >> 8).astype(np.int16) if enc == "pcm8" else X
    blob = A.encode_au(inp, 8000, enc)
    g = sunau.open(io.BytesIO(blob))
    # sunau expands both G.711 laws to 16-bit on read
    assert g.getnframes() == len(X) and g.getsampwidth() == (2 if enc in ("ulaw", "alaw") else sw)
    frames = g.readframes(g.getnframes())
    if enc == "pcm16":
        assert frames == X.astype(">i2").tobytes()
    elif enc == "pcm32":
        assert frames == X.astype(">i4").tobytes()
    elif enc == "pcm8":
        assert frames == inp.astype(np.int8).tobytes()
    elif enc == "ulaw":
        # sunau expands ULAW to 16-bit on read
        assert frames == audioop.ulaw2lin(audioop.lin2ulaw(X.tobytes(), 2), 2)
    g.close()


def test_au_float_and_pcm24_roundtrip_here():
    # sunau reads neither float nor 24-bit; self-decode is the check
    for enc in ("float32", "float64"):
        blob = A.encode_au(X.astype(np.float64), 44100, enc)
        s, rate, meta = A.decode_au(blob)
        assert rate == 44100 and meta["encoding"] == enc
        assert np.array_equal(s[:, 0], X.astype(np.float64))
    v24 = RNG.integers(-(1 << 23), 1 << 23, 500).astype(np.int64)
    s, _r, meta = A.decode_au(A.encode_au(v24, 8000, "pcm24"))
    assert meta["encoding"] == "pcm24" and (s[:, 0] == v24).all()


def test_au_refusals():
    with pytest.raises(ValueError, match="magic"):
        A.au_meta(b"FORM" + b"\x00" * 24)
    hdr = b".snd" + struct.pack(">IIIII", 24, 4, 23, 8000, 1) + b"\x00" * 4
    with pytest.raises(NotImplementedError, match="G.72"):
        A.au_meta(hdr)  # encoding 23 = G.721 ADPCM
    bad = b".snd" + struct.pack(">IIIII", 16, 4, 1, 8000, 1)
    with pytest.raises(ValueError, match="header"):
        A.au_meta(bad)


# ---------------------------------------------------------------------------
# WAV IMA-ADPCM (format 0x0011)
# ---------------------------------------------------------------------------


def test_wav_ima_roundtrip_exact_length_and_bounded_error():
    blob = A.encode_wav_ima_adpcm(X, 8000, block_frames=505)
    dec, rate = A.decode_wav_ima_adpcm(blob)
    assert rate == 8000 and len(dec) == len(X)
    y = np.round(3000 * np.sin(np.arange(4000) * 0.05)).astype(np.int16)
    d2, _ = A.decode_wav_ima_adpcm(A.encode_wav_ima_adpcm(y, 8000))
    assert len(d2) == len(y)
    # smooth signals track closely once the step size has ramped up from
    # index 0 (the initial transient is inherent to the IMA state machine)
    assert np.abs(d2[200:].astype(int) - y[200:].astype(int)).max() < 64


def test_wav_ima_partial_final_block_truncates_via_fact():
    blob = A.encode_wav_ima_adpcm(X[:700], 16000, block_frames=129)
    dec, rate = A.decode_wav_ima_adpcm(blob)
    assert rate == 16000 and len(dec) == 700


def test_wav_ima_block_equals_audioop_after_nibble_swap():
    """The WAV block body (low nibble first) must decode to exactly what
    audioop's DVI decoder (high nibble first) produces on the
    nibble-swapped bytes, seeded with the block header state."""
    blob = A.encode_wav_ima_adpcm(X[:700], 16000, block_frames=129)
    payload = blob[blob.index(b"data") + 8 :]
    pred, idx = struct.unpack_from("<hB", payload, 0)
    body = payload[4 : 4 + (129 - 1) // 2]
    swapped = bytes(((b & 0x0F) << 4) | (b >> 4) for b in body)
    ref, _ = audioop.adpcm2lin(swapped, 2, (pred, idx))
    bb = np.frombuffer(body, np.uint8)
    nib = np.empty(len(body) * 2, np.uint8)
    nib[0::2] = bb & 0x0F
    nib[1::2] = bb >> 4
    mine, _, _ = A.ima_decode_nibbles(nib, pred, idx)
    assert mine.tobytes() == ref


def test_wav_ima_first_sample_is_header_predictor():
    blob = A.encode_wav_ima_adpcm(X, 8000)
    dec, _ = A.decode_wav_ima_adpcm(blob)
    assert dec[0] == X[0]


def test_wav_ima_refusals():
    with pytest.raises(ValueError, match="not a WAV"):
        A.decode_wav_ima_adpcm(b"FORM" + b"\x00" * 40)
    blob = bytearray(A.encode_wav_ima_adpcm(X[:100], 8000, block_frames=9))
    fmt_at = blob.index(b"fmt ") + 8
    struct.pack_into("<H", blob, fmt_at + 2, 2)  # channels = 2
    with pytest.raises(NotImplementedError, match="multi-channel"):
        A.decode_wav_ima_adpcm(bytes(blob))
    struct.pack_into("<H", blob, fmt_at + 2, 1)
    struct.pack_into("<H", blob, fmt_at + 14, 8)  # bits = 8
    with pytest.raises(ValueError, match="4-bit"):
        A.decode_wav_ima_adpcm(bytes(blob))
    with pytest.raises(ValueError, match="block_frames"):
        A.encode_wav_ima_adpcm(X, 8000, block_frames=10)
    with pytest.raises(ValueError, match="empty"):
        A.encode_wav_ima_adpcm(np.empty(0, np.int16), 8000)
    # corrupt block step index
    blob = bytearray(A.encode_wav_ima_adpcm(X[:100], 8000, block_frames=9))
    data_at = blob.index(b"data") + 8
    blob[data_at + 2] = 120  # index > 88
    with pytest.raises(ValueError, match="step index"):
        A.decode_wav_ima_adpcm(bytes(blob))


# ---------------------------------------------------------------------------
# unified decode_audio dispatch
# ---------------------------------------------------------------------------


def test_decode_audio_dispatches_aiff_au_and_ima():
    from vectorflow_spark.operators.codecs import decode_audio

    s, rate = decode_audio(A.encode_aiff(X, 8000, 2, "NONE"))
    assert rate == 8000 and np.array_equal(s, X.astype(np.float64))
    s, rate = decode_audio(A.encode_aiff(X, 8000, 2, "sowt"))
    assert np.array_equal(s, X.astype(np.float64))
    s, rate = decode_audio(A.encode_au(X, 11025, "pcm16"))
    assert rate == 11025 and np.array_equal(s, X.astype(np.float64))
    s, rate = decode_audio(A.encode_wav_ima_adpcm(X, 22050))
    assert rate == 22050 and len(s) == len(X)
    ref, _ = A.decode_wav_ima_adpcm(A.encode_wav_ima_adpcm(X, 22050))
    assert np.array_equal(s, ref.astype(np.float64))


def test_au_annotation_roundtrips_from_byte_24():
    """The AU info field starts at byte 24 (right after the five u32
    header words); a reader that skips 28 drops the first 4 bytes."""
    blob = A.encode_au(X[:32], 8000, "pcm16", annotation=b"hello world")
    assert A.au_meta(blob)["annotation"] == "hello world"


def test_aifc_pstring_overrun_refuses():
    """A compressionName length byte larger than the COMM chunk must
    refuse, not leak the next chunk's bytes into the name."""
    blob = bytearray(A.encode_aiff(X[:32], 8000, 2, "sowt"))
    i = blob.index(b"sowt", 20)
    blob[i + 4] = 200  # pstring length byte
    with pytest.raises(ValueError, match="pstring"):
        A.aiff_meta(bytes(blob))


def test_aifc_fl64_decodes():
    """fl64 (big-endian double) AIFC: no writer here emits it, so build
    the container by patching an fl32 file's COMM/SSND — the decode
    branch must return the doubles exactly."""
    vals = X[:64].astype(np.float64) / 3.0
    blob = bytearray(A.encode_aiff(vals, 8000, compression="fl32"))
    i = blob.index(b"fl32", 20)
    blob[i : i + 4] = b"fl64"
    # swap the SSND payload from >f4 to >f8 and fix sizes
    ssnd_at = blob.index(b"SSND")
    (old_size,) = struct.unpack_from(">I", blob, ssnd_at + 4)
    new_payload = vals.astype(">f8").tobytes()
    new_chunk = struct.pack(">I", 8 + len(new_payload)) + struct.pack(">II", 0, 0) + new_payload
    out = bytes(blob[: ssnd_at + 4]) + new_chunk
    # FORM size field
    out = out[:4] + struct.pack(">I", len(out) - 8) + out[8:]
    s, rate, meta = A.decode_aiff(out)
    assert meta["compression"] == "fl64" and rate == 8000
    assert np.array_equal(s[:, 0], vals)


def test_au_stereo_deinterleaves_per_channel():
    stereo = np.stack([X[:100], X[100:200]], axis=1)
    blob = A.encode_au(stereo, 8000, "pcm16")
    s, _rate, meta = A.decode_au(blob)
    assert meta["n_channels"] == 2 and s.shape == (100, 2)
    assert (s == stereo).all()
