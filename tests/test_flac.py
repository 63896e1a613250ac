"""FLAC codec (operators/flacmini.py) — lossless roundtrip + format
integrity machinery.

Verification strategy (module docstring has the full argument): no libFLAC
exists in this build environment, so the pinning rests on (a) bit-exact
encode->decode roundtrips crossing two independent implementations of the
prediction math, (b) the format's OWN references — STREAMINFO's PCM MD5 and
the frame CRC-8/CRC-16 — all verified on decode with loud refusal, and
(c) a ctypes libFLAC parity matrix that runs wherever the system library
exists (skipif-gated below, same pattern as tests/test_live_qdrant.py)."""

from __future__ import annotations

import ctypes.util
import subprocess

import numpy as np
import pytest

from vectorflow_spark.operators.flacmini import (
    _crc8,
    _crc16,
    _utf8_decode,
    _utf8_encode,
    decode_flac,
    encode_flac,
    flac_meta,
    looks_like_flac,
)


def _signal(n: int, seed: int, kind: str = "tone") -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    if kind == "tone":
        s = 3000 * np.sin(t / (8 + seed % 13)) + rng.integers(-150, 150, n)
    elif kind == "noise":
        return rng.integers(-32768, 32768, n).astype(np.int16)
    elif kind == "ramp":
        s = (t * 3 - n) % 60000 - 30000
    else:
        raise ValueError(kind)
    return np.clip(np.rint(s), -32768, 32767).astype(np.int16)


class TestRoundtrip:
    @pytest.mark.parametrize("kind", ["tone", "noise", "ramp"])
    @pytest.mark.parametrize("n", [1, 100, 1024, 5000])
    def test_mono_exact(self, kind, n):
        s = _signal(n, n, kind)
        pcm, rate, meta = decode_flac(encode_flac(s, 44100, block_size=1024))
        assert rate == 44100
        assert meta["md5_verified"]
        assert np.array_equal(pcm[:, 0], s)

    @pytest.mark.parametrize("mode", ["indep", "mid", "left", "right"])
    def test_stereo_modes_exact(self, mode):
        left = _signal(3000, 1)
        right = _signal(3000, 2)
        st = np.stack([left, right], axis=1)
        pcm, rate, _ = decode_flac(encode_flac(st, 48000, block_size=512, stereo_mode=mode))
        assert rate == 48000
        assert np.array_equal(pcm, st)

    @pytest.mark.parametrize("order", [1, 2, 4, 8, 16])
    def test_lpc_orders_exact(self, order):
        s = _signal(4000, order)
        pcm, _, _ = decode_flac(encode_flac(s, 44100, block_size=1000, lpc_order=order))
        assert np.array_equal(pcm[:, 0], s)

    @pytest.mark.parametrize("po", [0, 1, 2, 3])
    def test_partition_orders_exact(self, po):
        s = _signal(4096, po + 7)
        pcm, _, _ = decode_flac(encode_flac(s, 44100, block_size=2048, partition_order=po))
        assert np.array_equal(pcm[:, 0], s)

    def test_constant_verbatim_paths(self):
        c = np.full(1500, -12345, np.int16)
        assert np.array_equal(decode_flac(encode_flac(c, 8000))[0][:, 0], c)
        v = _signal(999, 5, "noise")
        assert np.array_equal(
            decode_flac(encode_flac(v, 8000, force="verbatim"))[0][:, 0], v
        )

    def test_wasted_bits_shrink_and_roundtrip(self):
        w = (_signal(2000, 9).astype(np.int32) // 64 * 64).astype(np.int16)
        blob = encode_flac(w, 16000, block_size=1000)
        plain = encode_flac((w // 64).astype(np.int16), 16000, block_size=1000)
        assert np.array_equal(decode_flac(blob)[0][:, 0], w)
        # wasted-bits coding costs ~the same as the pre-shifted signal
        assert len(blob) < len(plain) * 1.05

    def test_escape_partitions_roundtrip(self):
        # huge alternating outliers make raw escape cheaper than rice
        s = np.zeros(1024, np.int16)
        s[::2] = 32000
        s[1::2] = -32000
        pcm, _, _ = decode_flac(encode_flac(s, 44100, block_size=256, force="verbatim"))
        assert np.array_equal(pcm[:, 0], s)
        pcm2, _, _ = decode_flac(encode_flac(s, 44100, block_size=256))
        assert np.array_equal(pcm2[:, 0], s)

    def test_odd_tail_frame(self):
        s = _signal(1024 + 333, 11)
        pcm, _, _ = decode_flac(encode_flac(s, 44100, block_size=1024))
        assert np.array_equal(pcm[:, 0], s)

    def test_nonstandard_blocksize_uses_explicit_field(self):
        s = _signal(2100, 13)
        pcm, _, _ = decode_flac(encode_flac(s, 44100, block_size=700))
        assert np.array_equal(pcm[:, 0], s)

    def test_nonstandard_sample_rate_from_streaminfo(self):
        s = _signal(500, 17)
        pcm, rate, _ = decode_flac(encode_flac(s, 11025, block_size=256))
        assert rate == 11025
        assert np.array_equal(pcm[:, 0], s)


class TestIntegrity:
    def test_md5_and_crc_catch_any_corruption(self):
        s = _signal(5000, 3)
        blob = bytearray(encode_flac(s, 44100, block_size=1024))
        rng = np.random.default_rng(0)
        caught = 0
        for _ in range(24):
            i = int(rng.integers(50, len(blob)))  # past STREAMINFO md5
            bad = bytearray(blob)
            bad[i] ^= 0x5A
            try:
                decode_flac(bytes(bad))
            except (ValueError, IndexError):
                caught += 1
        assert caught == 24  # every flip refused, none decoded silently wrong

    def test_md5_mismatch_refused(self):
        s = _signal(1000, 4)
        blob = bytearray(encode_flac(s, 44100))
        # STREAMINFO md5 lives at bytes 26..42 (4 magic + 4 hdr + 18)
        blob[30] ^= 0xFF
        with pytest.raises(ValueError, match="MD5 mismatch"):
            decode_flac(bytes(blob))

    def test_crc_vectors(self):
        # spec polynomials pinned against PUBLISHED check values: CRC-8
        # poly 0x07 init 0 ("CRC-8") and CRC-16 poly 0x8005 init 0 no
        # reflection ("CRC-16/UMTS aka BUYPASS") over "123456789"
        assert _crc8(b"") == 0
        assert _crc8(b"123456789") == 0xF4
        assert _crc16(b"") == 0
        assert _crc16(b"123456789") == 0xFEE8
        # GF(2) linearity: crc(a xor b) == crc(a) xor crc(b), equal lengths
        a, b = b"\x12\x34\x56", b"\xab\xcd\xef"
        x = bytes(p ^ q for p, q in zip(a, b))
        assert _crc8(x) == _crc8(a) ^ _crc8(b)
        assert _crc16(x) == _crc16(a) ^ _crc16(b)

    def test_utf8_frame_numbers(self):
        for n in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF, (1 << 31) - 1, (1 << 36) - 1]:
            enc = _utf8_encode(n)
            dec, pos = _utf8_decode(enc, 0)
            assert (dec, pos) == (n, len(enc)), n

    def test_meta_and_sniff(self):
        s = _signal(2500, 6)
        blob = encode_flac(s, 22050, block_size=512)
        assert looks_like_flac(blob)
        assert not looks_like_flac(b"RIFFxxxxWAVE")
        m = flac_meta(blob)
        assert m["kind"] == "audio"
        assert m["sample_rate"] == 22050
        assert m["channels"] == 1
        assert m["bits_per_sample"] == 16
        assert m["n_samples"] == 2500

    def test_encode_guards(self):
        with pytest.raises(ValueError, match="int16 range"):
            encode_flac(np.array([40000]), 8000)
        with pytest.raises(ValueError, match="empty"):
            encode_flac(np.array([], np.int16), 8000)
        with pytest.raises(ValueError, match="partition order"):
            encode_flac(_signal(100, 0), 8000, block_size=100, partition_order=3)


class TestDispatch:
    def test_decode_audio_and_meta_dispatch(self):
        from vectorflow_spark.operators.codecs import decode_audio
        from vectorflow_spark.operators.multimodal import decode_meta

        s = _signal(1800, 8)
        blob = encode_flac(s, 16000, block_size=512)
        samples, rate = decode_audio(blob)
        assert rate == 16000
        assert np.array_equal(samples.astype(np.int16), s)
        m = decode_meta(blob)
        assert (m["kind"], m["sample_rate"], m["n_samples"]) == ("audio", 16000, 1800)

    def test_mp3_still_refuses_decode(self):
        from vectorflow_spark.operators.codecs import build_mp3, decode_audio

        with pytest.raises(NotImplementedError, match="MP3"):
            decode_audio(build_mp3(3))


_LIBFLAC = ctypes.util.find_library("FLAC")
_FLAC_CLI = None
try:
    _FLAC_CLI = subprocess.run(["flac", "--version"], capture_output=True).returncode == 0
except OSError:
    _FLAC_CLI = False


@pytest.mark.skipif(
    not (_LIBFLAC or _FLAC_CLI),
    reason="libFLAC/flac not present in this environment — the module "
    "docstring documents the alternative pinning (own-MD5 + CRCs + "
    "independent-path losslessness); this matrix runs wherever the "
    "system reference exists",
)
class TestLibFlacParity:
    """System-reference parity (the tests/lib*_ref.py pattern): our
    encoder's streams must decode bit-exactly in the reference `flac`
    tool, and reference-encoded streams must decode bit-exactly here."""

    def test_reference_decodes_our_streams(self, tmp_path):
        import wave

        for seed, mode, lpc in [(0, "indep", 0), (1, "mid", 0), (2, "left", 8)]:
            st = np.stack([_signal(3000, seed), _signal(3000, seed + 50)], axis=1)
            blob = encode_flac(st, 44100, block_size=1024, stereo_mode=mode, lpc_order=lpc)
            f = tmp_path / f"x{seed}.flac"
            f.write_bytes(blob)
            out = tmp_path / f"x{seed}.wav"
            r = subprocess.run(
                ["flac", "-d", "-f", "-o", str(out), str(f)], capture_output=True
            )
            assert r.returncode == 0, r.stderr
            with wave.open(str(out), "rb") as w:
                raw = np.frombuffer(w.readframes(w.getnframes()), "<i2").reshape(-1, 2)
            assert np.array_equal(raw, st)

    def test_we_decode_reference_streams(self, tmp_path):
        import wave

        st = np.stack([_signal(4000, 9), _signal(4000, 10)], axis=1)
        wav = tmp_path / "in.wav"
        with wave.open(str(wav), "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(44100)
            w.writeframes(st.astype("<i2").tobytes())
        out = tmp_path / "in.flac"
        r = subprocess.run(
            ["flac", "-f", "-8", "-o", str(out), str(wav)], capture_output=True
        )
        assert r.returncode == 0, r.stderr
        pcm, rate, meta = decode_flac(out.read_bytes())
        assert rate == 44100 and meta["md5_verified"]
        assert np.array_equal(pcm, st)


class TestBitDepths:
    @pytest.mark.parametrize("bits", [8, 16, 24])
    def test_depth_roundtrip(self, bits):
        rng = np.random.default_rng(bits)
        hi = 1 << (bits - 1)
        st = np.stack(
            [rng.integers(-hi, hi, 2500), rng.integers(-hi, hi, 2500)], axis=1
        ).astype(np.int64)
        blob = encode_flac(st, 44100, block_size=512, bits=bits, lpc_order=4)
        pcm, rate, meta = decode_flac(blob)
        assert meta["bits_per_sample"] == bits and meta["md5_verified"]
        assert np.array_equal(pcm, st)

    def test_range_guard(self):
        with pytest.raises(ValueError, match="int8 range"):
            encode_flac(np.array([300]), 8000, bits=8)
        with pytest.raises(ValueError, match="bits must be"):
            encode_flac(np.array([1]), 8000, bits=12)


class TestReviewHardening:
    """r7 self-review closures: every malformed input refuses with
    ValueError (codec-layer contract), divergence guards cover the FIXED
    predictor path too, and md5_verified is honest."""

    def test_truncation_always_valueerror(self):
        s = _signal(300, 21)
        blob = encode_flac(s, 8000)
        for cut in range(5, len(blob), 7):
            try:
                decode_flac(blob[:cut])
            except ValueError:
                pass  # the ONLY acceptable refusal type

    def test_trailing_bytes_refused(self):
        blob = encode_flac(_signal(200, 22), 8000)
        for junk in (b"\x00", b"\xde\xad", b"\xde\xad\xbe\xef"):
            with pytest.raises(ValueError):
                decode_flac(blob + junk)

    def test_fixed_predictor_divergence_refuses(self):
        from vectorflow_spark.operators.flacmini import _reconstruct_fixed

        with pytest.raises(ValueError, match="out of range"):
            _reconstruct_fixed(2, [0, 0], [1 << 50] * 100)
        with pytest.raises(ValueError, match="out of range"):
            _reconstruct_fixed(4, [0, 0, 0, 0], [1 << 39] * 100000)


class TestRound8Hardening:
    def test_sample_rate_must_fit_20_bits(self):
        s = _signal(300, 30)
        with pytest.raises(ValueError, match="20-bit"):
            encode_flac(s, 1 << 20)
        with pytest.raises(ValueError, match="20-bit"):
            encode_flac(s, 0)
        decode_flac(encode_flac(s, (1 << 20) - 1))  # max legal rate round-trips

    def test_id3v1_trailer_accepted(self):
        """Some taggers append a 128-byte ID3v1 'TAG' block to FLAC files;
        the stream is complete and MD5-verified, so accept-and-skip."""
        import numpy as np

        s = _signal(400, 31)
        blob = encode_flac(s, 8000)
        tag = b"TAG" + b"\x00" * 125
        pcm, rate, _ = decode_flac(blob + tag)
        assert rate == 8000
        assert np.array_equal(pcm[:, 0], s)
        # a tag of the wrong size, or other trailing bytes, still refuses
        with pytest.raises(ValueError):
            decode_flac(blob + tag[:-1])
        with pytest.raises(ValueError):
            decode_flac(blob + b"NOT" + b"\x00" * 125)
