"""Embedded album art (operators/albumart.py): the RFC 9639 §8.8
PICTURE structure in its two wild forms — FLAC metadata block type 6
and the base64 METADATA_BLOCK_PICTURE Vorbis comment tag (Ogg Opus /
Vorbis / FLAC). Round-trips are pixel-exact (BMP payloads are
lossless); malformed structures refuse loudly."""

from __future__ import annotations

import base64
import struct

import numpy as np
import pytest

from vectorflow_spark.operators.albumart import (
    add_flac_picture,
    build_picture_block,
    flac_pictures,
    ogg_pictures,
    parse_picture_block,
    picture_comment_tag,
)
from vectorflow_spark.operators.codecs import decode_image, encode_bmp
from vectorflow_spark.operators.flacmini import decode_flac, encode_flac
from vectorflow_spark.operators.oggmini import (
    build_ogg_flac,
    build_ogg_opus,
    build_ogg_vorbis,
    ogg_meta,
)


def _img(seed: int, h: int = 12, w: int = 16) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)


def _pic(seed: int = 5, **kw) -> tuple[bytes, bytes]:
    img = _img(seed)
    bmp = encode_bmp(img)
    defaults = dict(mime="image/bmp", width=16, height=12, depth=24, description="cover")
    defaults.update(kw)
    return bmp, build_picture_block(bmp, **defaults)


def _flac(n: int = 2000) -> bytes:
    return encode_flac((np.arange(n) % 131).astype(np.int16), 8000, block_size=512)


class TestPictureStructure:
    def test_roundtrip_all_fields(self):
        bmp, pic = _pic(picture_type=4, n_colors=0, description="Füße")
        d = parse_picture_block(pic)
        assert d["picture_type"] == 4
        assert d["mime"] == "image/bmp"
        assert d["description"] == "Füße"
        assert (d["width"], d["height"], d["depth"], d["n_colors"]) == (16, 12, 24, 0)
        assert d["data"] == bmp
        assert np.array_equal(decode_image(d["data"]), _img(5))

    def test_truncation_refuses_at_every_field(self):
        _, pic = _pic()
        for cut in [2, 6, 9, 14, 16, 30, len(pic) - 7]:
            with pytest.raises(ValueError, match="truncated"):
                parse_picture_block(pic[:cut])

    def test_oversized_length_fields_refuse(self):
        bmp, pic = _pic()
        # inflate the final data-length field past the buffer
        bad = bytearray(pic)
        off = len(pic) - len(bmp) - 4
        struct.pack_into(">I", bad, off, len(bmp) + 999)
        with pytest.raises(ValueError, match="truncated picture data"):
            parse_picture_block(bytes(bad))
        # mime length pointing past EOF
        bad2 = bytearray(pic)
        struct.pack_into(">I", bad2, 4, 1 << 30)
        with pytest.raises(ValueError, match="truncated mime"):
            parse_picture_block(bytes(bad2))

    def test_trailing_garbage_refuses(self):
        _, pic = _pic()
        with pytest.raises(ValueError, match="trailing bytes"):
            parse_picture_block(pic + b"\x00")

    def test_bad_type_and_mime_refuse(self):
        bmp, pic = _pic()
        with pytest.raises(ValueError, match="type 21"):
            build_picture_block(bmp, "image/bmp", 16, 12, picture_type=21)
        bad = bytearray(pic)
        struct.pack_into(">I", bad, 0, 99)
        with pytest.raises(ValueError, match="type 99"):
            parse_picture_block(bytes(bad))
        bad = bytearray(pic)
        bad[8] = 0xFF  # first mime byte: not ASCII
        with pytest.raises(ValueError, match="ASCII"):
            parse_picture_block(bytes(bad))


class TestFlacPictures:
    def test_insert_parse_and_audio_survives(self):
        bmp, pic = _pic()
        flac = _flac()
        assert flac_pictures(flac) == []
        out = add_flac_picture(flac, pic)
        pics = flac_pictures(out)
        assert len(pics) == 1 and pics[0]["data"] == bmp
        # the audio chain is untouched: full decode + MD5 self-verify
        pcm, rate, _info = decode_flac(out)
        assert rate == 8000 and pcm.shape[0] == 2000
        # two pictures stack (back cover after front cover)
        _, pic2 = _pic(seed=9, picture_type=4)
        both = flac_pictures(add_flac_picture(out, pic2))
        assert [p["picture_type"] for p in both] == [4, 3]

    def test_truncated_block_refuses(self):
        _, pic = _pic()
        out = add_flac_picture(_flac(), pic)
        with pytest.raises(ValueError, match="truncated metadata block"):
            flac_pictures(out[: 8 + 34 + 20])

    def test_oversized_picture_refuses(self):
        with pytest.raises(ValueError, match="24-bit"):
            add_flac_picture(_flac(), b"\x00" * (1 << 24))

    def test_non_flac_refuses(self):
        with pytest.raises(ValueError, match="bad magic"):
            flac_pictures(b"NOPE" + b"\x00" * 64)


class TestOggPictures:
    def test_all_three_comment_carriers(self):
        bmp, pic = _pic()
        tag = picture_comment_tag(pic)
        blobs = [
            build_ogg_opus(seed=1, channels=1, pre_skip=0, input_sample_rate=48000,
                           n_audio_packets=3, tags=[tag, "artist=x"]),
            build_ogg_vorbis(seed=2, channels=1, sample_rate=22050,
                             n_audio_packets=3, tags=["artist=x", tag]),
            build_ogg_flac(_flac(), tags=[tag]),
        ]
        for blob in blobs:
            pics = ogg_pictures(blob)
            assert len(pics) == 1 and pics[0]["data"] == bmp, ogg_meta(blob)["codec"]

    def test_no_picture_tag_is_empty(self):
        blob = build_ogg_opus(seed=3, channels=1, pre_skip=0, input_sample_rate=48000,
                              n_audio_packets=3, tags=["artist=x"])
        assert ogg_pictures(blob) == []

    def test_corrupt_base64_refuses(self):
        _, pic = _pic()
        good = picture_comment_tag(pic)
        bad = good[:-2] + "!!"  # not base64 alphabet
        blob = build_ogg_vorbis(seed=4, channels=1, sample_rate=22050,
                                n_audio_packets=3, tags=[bad])
        with pytest.raises(ValueError, match="base64"):
            ogg_pictures(blob)

    def test_truncated_structure_inside_valid_base64_refuses(self):
        _, pic = _pic()
        tag = "METADATA_BLOCK_PICTURE=" + base64.b64encode(pic[:-9]).decode()
        blob = build_ogg_opus(seed=5, channels=1, pre_skip=0, input_sample_rate=48000,
                              n_audio_packets=3, tags=[tag])
        with pytest.raises(ValueError, match="truncated picture data"):
            ogg_pictures(blob)
