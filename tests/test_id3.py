"""ID3v2 framing (operators/id3mini.py): v2.3/v2.4 round-trips in every
spec'd text encoding, APIC album art (pixel-exact BMP payloads),
cross-check against codecs.mp3_meta's independent tag-skip arithmetic,
and the parse-correctly-or-refuse contracts."""

from __future__ import annotations

import numpy as np
import pytest

from vectorflow_spark.operators.codecs import (
    build_mp3,
    decode_image,
    encode_bmp,
    mp3_meta,
)
from vectorflow_spark.operators.id3mini import (
    apic_frame,
    build_id3v2,
    id3_pictures,
    id3_text,
    id3v2_meta,
    text_frame,
)

IMG = np.random.default_rng(3).integers(0, 256, (10, 13, 3), np.uint8)
BMP = encode_bmp(IMG)


class TestRoundtrip:
    @pytest.mark.parametrize("ver,enc", [(3, 0), (3, 1), (3, 2), (4, 0), (4, 1), (4, 2), (4, 3)])
    def test_all_versions_and_encodings(self, ver, enc):
        title = "Tïtle" if enc == 0 else "Tïtle — 标题"
        frames = [
            text_frame("TIT2", title, enc),
            text_frame("TPE1", "Artist", 0),
            apic_frame(BMP, picture_type=6, description=title, encoding=enc),
        ]
        tag = build_id3v2(frames, version=ver, padding=enc * 17 + 1)
        m = id3v2_meta(tag)
        assert m["version"] == f"2.{ver}.0"
        assert m["n_frames"] == 3
        assert m["padding"] == enc * 17 + 1
        assert m["tag_size"] == len(tag)
        assert id3_text(m, "TIT2") == title
        assert id3_text(m, "TXXX") is None
        (pic,) = id3_pictures(m)
        assert pic["mime"] == "image/bmp"
        assert pic["picture_type"] == 6
        assert pic["description"] == title
        assert np.array_equal(decode_image(pic["data"]), IMG)

    @pytest.mark.parametrize("ver", [3, 4])
    def test_large_frame_size_encoding_differs_by_version(self, ver):
        # a >127-byte body exercises the v2.3 plain-BE vs v2.4 synchsafe
        # frame-size split: the 4 size bytes genuinely differ
        body_text = "x" * 300
        tag = build_id3v2([text_frame("TIT2", body_text, 0)], version=ver)
        size_bytes = tag[10 + 4 : 10 + 8]
        if ver == 3:
            assert int.from_bytes(size_bytes, "big") == 301
        else:
            assert size_bytes == bytes([(301 >> 21) & 0x7F, (301 >> 14) & 0x7F,
                                        (301 >> 7) & 0x7F, 301 & 0x7F])
        assert id3_text(tag, "TIT2") == body_text

    def test_mp3_meta_cross_check(self):
        # the two independent tag-size implementations agree: id3v2_meta's
        # parsed size equals the hop mp3_meta takes to the first frame
        tag = build_id3v2(
            [text_frame("TIT2", "t", 0), apic_frame(BMP)], version=4, padding=40
        )
        blob = tag + build_mp3(9, seed=2)
        assert id3v2_meta(blob)["tag_size"] == len(tag)
        assert mp3_meta(blob)["n_frames"] == 9

    def test_trailing_nul_in_text_tolerated(self):
        tag = build_id3v2([("TIT2", b"\x00abc\x00")], version=4)
        assert id3_text(tag, "TIT2") == "abc"


class TestRefusals:
    def _tag(self, ver=4):
        return build_id3v2([text_frame("TIT2", "x", 0), apic_frame(BMP)], version=ver)

    def test_v22_empty_tag_parses(self):
        # v2.2 support landed in r9: the empty tag is valid framing now
        m = id3v2_meta(b"ID3\x02\x00\x00\x00\x00\x00\x00")
        assert m["version"].startswith("2.2") and m["n_frames"] == 0
        with pytest.raises(ValueError, match="unknown ID3v2.5"):
            id3v2_meta(b"ID3\x05\x00\x00\x00\x00\x00\x00")

    def test_unsync_and_extended_header_refuse(self):
        tag = self._tag()
        with pytest.raises(NotImplementedError, match="unsynchronised"):
            id3v2_meta(b"ID3\x04\x00\x80" + tag[6:])
        with pytest.raises(NotImplementedError, match="extended"):
            id3v2_meta(b"ID3\x04\x00\x40" + tag[6:])

    def test_frame_flags_refuse(self):
        bad = bytearray(self._tag())
        bad[10 + 9] = 0x08  # compression flag on the first frame
        with pytest.raises(NotImplementedError, match="flags"):
            id3v2_meta(bytes(bad))

    def test_truncation_refuses(self):
        tag = self._tag()
        with pytest.raises(ValueError, match="exceeds the data"):
            id3v2_meta(tag[:-1])
        with pytest.raises(ValueError, match="truncated header"):
            id3v2_meta(b"ID3\x04\x00")

    def test_bad_synchsafe_refuses(self):
        tag = bytearray(self._tag())
        tag[6] = 0x80
        with pytest.raises(ValueError, match="synchsafe"):
            id3v2_meta(bytes(tag))

    def test_frame_size_past_tag_refuses(self):
        tag = bytearray(self._tag(ver=3))
        tag[10 + 4 : 10 + 8] = (1 << 20).to_bytes(4, "big")
        with pytest.raises(ValueError, match="exceeds the tag"):
            id3v2_meta(bytes(tag))

    def test_garbage_in_padding_refuses(self):
        tag = bytearray(build_id3v2([text_frame("TIT2", "x", 0)], version=4, padding=8))
        tag[-3] = 0x41  # padding must be all zero to the declared end
        with pytest.raises(ValueError, match="padding"):
            id3v2_meta(bytes(tag))

    def test_malformed_frame_id_refuses(self):
        tag = bytearray(self._tag())
        tag[10] = ord("t")  # lowercase: not a valid id
        with pytest.raises(ValueError, match="frame id"):
            id3v2_meta(bytes(tag))

    def test_apic_malformations_refuse(self):
        # unterminated MIME
        tag = build_id3v2([("APIC", b"\x00image/bmp")], version=4)
        with pytest.raises(ValueError, match="MIME"):
            id3_pictures(tag)
        # picture type out of range
        tag = build_id3v2([("APIC", b"\x00image/bmp\x00\x63\x00" + BMP)], version=4)
        with pytest.raises(ValueError, match="picture type 99"):
            id3_pictures(tag)
        # unterminated UTF-16 description (odd tail would split a unit)
        tag = build_id3v2([("APIC", b"\x01image/bmp\x00\x03\xff")], version=4)
        with pytest.raises(ValueError, match="unterminated APIC description"):
            id3_pictures(tag)

    def test_writer_guards(self):
        with pytest.raises(ValueError, match="v2.4-only"):
            build_id3v2([text_frame("TIT2", "x", 3)], version=3)
        with pytest.raises(ValueError, match="not a text frame id"):
            text_frame("APIC", "x", 0)
        with pytest.raises(ValueError, match="picture type"):
            apic_frame(BMP, picture_type=21)
        with pytest.raises(ValueError, match="only v2.2, v2.3 and v2.4"):
            build_id3v2([], version=5)


class TestV22:
    """ID3v2.2 (3-char frame layout, 3-byte sizes, PIC pictures)."""

    def _tag(self, enc=0, padding=5):
        from vectorflow_spark.operators.id3mini import pic_frame_v22, text_frame_v22

        title = "Tïtle" if enc == 0 else "Tïtle — 标题"
        frames = [
            text_frame_v22("TT2", title, enc),
            text_frame_v22("TP1", "Artist", 0),
            pic_frame_v22(BMP, "BMP", picture_type=6, description=title, encoding=enc),
        ]
        return build_id3v2(frames, version=2, padding=padding), title

    @pytest.mark.parametrize("enc", [0, 1])
    def test_roundtrip_both_v22_encodings(self, enc):
        tag, title = self._tag(enc=enc)
        m = id3v2_meta(tag)
        assert m["version"].startswith("2.2") and m["n_frames"] == 3 and m["padding"] == 5
        assert [fid for fid, _ in m["frames"]] == ["TT2", "TP1", "PIC"]
        assert id3_text(m, "TT2") == title and id3_text(m, "TP1") == "Artist"
        (pic,) = id3_pictures(m)
        assert pic["mime"] == "image/bmp" and pic["picture_type"] == 6
        assert pic["description"] == title
        assert np.array_equal(decode_image(pic["data"]), IMG)

    def test_v22_tag_fronts_mp3_and_cross_checks_skip(self):
        from vectorflow_spark.operators.id3mini import text_frame_v22

        tag = build_id3v2([text_frame_v22("TT2", "x")], version=2)
        mp3 = build_mp3(n_frames=3)
        m = mp3_meta(tag + mp3)
        assert m["n_frames"] == 3  # mp3 walker hopped the v2.2 tag
        assert id3v2_meta(tag + mp3)["tag_size"] == len(tag)

    def test_v22_writer_contracts(self):
        from vectorflow_spark.operators.id3mini import pic_frame_v22, text_frame_v22

        with pytest.raises(ValueError, match="latin-1"):
            text_frame_v22("TT2", "x", encoding=3)
        with pytest.raises(ValueError, match="v2.2 text frame"):
            text_frame_v22("TIT2", "x")
        with pytest.raises(ValueError, match="image format"):
            pic_frame_v22(BMP, "WEBP")
        with pytest.raises(ValueError, match="bad v2.2 frame id"):
            build_id3v2([("TIT2", b"\x00x")], version=2)
        # v2.2 frames carry UTF-8/UTF-16BE nowhere — writer refuses
        with pytest.raises(ValueError, match="latin-1"):
            build_id3v2([("TT2", b"\x03abc")], version=2)

    def test_v22_refusals(self):
        from vectorflow_spark.operators.id3mini import text_frame_v22

        tag = bytearray(build_id3v2([text_frame_v22("TT2", "x")], version=2))
        tag[5] = 0x40  # compression flag
        with pytest.raises(NotImplementedError, match="compressed"):
            id3v2_meta(bytes(tag))
        tag[5] = 0x80  # unsync flag
        with pytest.raises(NotImplementedError, match="unsynchronised"):
            id3v2_meta(bytes(tag))
        tag[5] = 0x01
        with pytest.raises(ValueError, match="undefined v2.2"):
            id3v2_meta(bytes(tag))
        # unknown PIC format refuses on read too
        bad = bytearray(build_id3v2([("PIC", b"\x00XYZ\x03\x00" + BMP)], version=2))
        with pytest.raises(ValueError, match="PIC image format"):
            id3_pictures(bytes(bad))

    def test_v22_size_field_is_3_bytes(self):
        from vectorflow_spark.operators.id3mini import text_frame_v22

        tag = build_id3v2([text_frame_v22("TT2", "abc")], version=2)
        # frame header starts at 10: 'TT2' + 3-byte size + body
        assert tag[10:13] == b"TT2"
        size = (tag[13] << 16) | (tag[14] << 8) | tag[15]
        assert size == 1 + 3  # encoding byte + 'abc'
        assert tag[16 + size - 1 :].startswith(b"c") or True
        m = id3v2_meta(tag)
        assert m["frames"][0] == ("TT2", b"\x00abc")
