"""MP4/ISO-BMFF header-only metadata (operators/mp4mini.py): box walk
pinned on hand-built spec-shaped skeletons — both box-size forms, both
full-box versions, multi-track, malformed-input contracts — plus the
decode_meta dispatch and the still-refusing sample decode."""

from __future__ import annotations

import struct

import pytest

from vectorflow_spark.operators.mp4mini import build_mp4, mp4_meta

VIDEO = {
    "kind": "video", "codec": "avc1", "timescale": 30000, "duration": 90000,
    "n_samples": 90, "width": 640, "height": 360,
}
AUDIO = {"kind": "audio", "codec": "mp4a", "timescale": 44100, "duration": 132300, "n_samples": 129}


class TestBoxWalk:
    def test_video_plus_audio(self):
        m = mp4_meta(build_mp4([VIDEO, AUDIO], duration_ms=3000))
        assert m["kind"] == "video"
        assert m["duration_ms"] == 3000
        assert m["n_tracks"] == 2
        assert (m["width"], m["height"]) == (640, 360)
        assert [t["codec"] for t in m["tracks"]] == ["avc1", "mp4a"]
        assert m["tracks"][0]["n_samples"] == 90
        assert m["tracks"][1]["timescale"] == 44100

    def test_audio_only(self):
        m = mp4_meta(build_mp4([AUDIO], duration_ms=2500))
        assert m["kind"] == "audio"
        assert m["width"] is None
        assert m["tracks"][0]["kind"] == "audio"

    def test_version1_and_largesize(self):
        blob = build_mp4(
            [dict(VIDEO, version=1)], duration_ms=3000, mvhd_version=1, largesize_moov=True
        )
        m = mp4_meta(blob)
        assert m["duration_ms"] == 3000
        assert m["tracks"][0]["duration"] == 90000
        assert (m["width"], m["height"]) == (640, 360)

    def test_major_brand(self):
        assert mp4_meta(build_mp4([AUDIO], major_brand=b"mp42"))["major_brand"] == "mp42"

    def test_hand_built_independent_of_writer(self):
        """A skeleton assembled inline (not via build_mp4) must parse —
        pins the walker against the spec layout, not our writer."""
        def box(fc, body):
            return struct.pack(">I", 8 + len(body)) + fc + body

        mvhd = box(b"mvhd", bytes([0, 0, 0, 0]) + struct.pack(">IIII", 0, 0, 600, 1200)
                   + b"\x00" * 80)
        blob = box(b"ftyp", b"isom" + b"\x00" * 4) + box(b"moov", mvhd)
        m = mp4_meta(blob)
        assert m["duration_ms"] == 2000 and m["n_tracks"] == 0 and m["kind"] == "audio"


class TestContracts:
    def test_no_ftyp(self):
        with pytest.raises(ValueError, match="ftyp"):
            mp4_meta(b"\x00\x00\x00\x08free")

    def test_no_moov(self):
        blob = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
        with pytest.raises(ValueError, match="moov"):
            mp4_meta(blob)

    def test_bad_box_size(self):
        blob = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
        blob += struct.pack(">I", 3) + b"moov"  # size < header
        with pytest.raises(ValueError, match="box size"):
            mp4_meta(blob)

    def test_sample_decode_still_refuses(self):
        from vectorflow_spark.operators.codecs import decode_video

        with pytest.raises(NotImplementedError):
            decode_video(build_mp4([VIDEO], duration_ms=1000))


class TestMetaDispatch:
    def test_decode_meta_video(self):
        from vectorflow_spark.operators.multimodal import decode_meta

        m = decode_meta(build_mp4([VIDEO, AUDIO], duration_ms=3000))
        assert (m["kind"], m["n_frames"], m["width"], m["height"]) == ("video", 90, 640, 360)

    def test_decode_meta_audio(self):
        from vectorflow_spark.operators.multimodal import decode_meta

        m = decode_meta(build_mp4([AUDIO], duration_ms=3000))
        assert (m["kind"], m["sample_rate"], m["n_samples"]) == ("audio", 44100, 129)
