"""EXIF (operators/exifmini.py): orientation group structure, TIFF
IFD-rewrite tagging (libtiff-pinned decode untouched), JPEG APP1
round-trips in both byte orders, and refusal contracts."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vectorflow_spark.operators.exifmini import (
    apply_exif_orientation,
    build_exif_app1,
    exif_meta,
    inverse_exif_orientation,
    jpeg_add_exif,
    tiff_add_exif,
)
from vectorflow_spark.operators.jpegmini import decode_jpeg, encode_jpeg
from vectorflow_spark.operators.tiffmini import decode_tiff, encode_tiff, tiff_meta

BASE = np.random.default_rng(11).integers(0, 256, (9, 13, 3), np.uint8)


class TestOrientationGroup:
    @pytest.mark.parametrize("o", range(1, 9))
    def test_store_then_display_roundtrip(self, o):
        stored = inverse_exif_orientation(BASE, o)
        assert np.array_equal(apply_exif_orientation(stored, o), BASE)
        # dimension swap happens exactly for the transposing orientations
        assert (stored.shape[:2] == BASE.shape[:2][::-1]) == (o >= 5)

    @pytest.mark.parametrize("o", [1, 2, 3, 4, 5, 7])
    def test_involutions(self, o):
        assert np.array_equal(
            apply_exif_orientation(apply_exif_orientation(BASE, o), o), BASE
        )

    def test_6_and_8_invert_each_other(self):
        assert np.array_equal(
            apply_exif_orientation(apply_exif_orientation(BASE, 6), 8), BASE
        )
        assert np.array_equal(
            apply_exif_orientation(apply_exif_orientation(BASE, 8), 6), BASE
        )

    def test_all_eight_views_distinct(self):
        # on a generic (asymmetric) image the dihedral orbit has 8 members
        views = [apply_exif_orientation(BASE, o).tobytes() for o in range(1, 9)]
        assert len(set(views)) == 8

    def test_out_of_range_refuses(self):
        with pytest.raises(ValueError, match="outside 1..8"):
            apply_exif_orientation(BASE, 9)
        with pytest.raises(ValueError, match="outside 1..8"):
            apply_exif_orientation(BASE, 0)


class TestTiffTagging:
    @pytest.mark.parametrize("compression", [None, "lzw", "packbits"])
    def test_pinned_decode_untouched_and_tags_read_back(self, compression):
        tiff = encode_tiff(BASE, compression=compression) if compression else encode_tiff(BASE)
        tagged = tiff_add_exif(
            tiff, orientation=6, make="CamX", model="M1",
            datetime="2021:03:04 05:06:07",
        )
        assert np.array_equal(decode_tiff(tagged), BASE)
        assert tiff_meta(tagged) == tiff_meta(tiff)
        m = exif_meta(tagged)
        assert m["orientation"] == 6
        assert m["make"] == "CamX" and m["model"] == "M1"
        assert m["datetime"] == "2021:03:04 05:06:07"

    def test_untagged_tiff_defaults(self):
        m = exif_meta(encode_tiff(BASE))
        assert m["orientation"] == 1
        assert m["make"] is None and m["datetime"] is None

    def test_retag_replaces(self):
        t = tiff_add_exif(encode_tiff(BASE), orientation=3, make="A")
        t2 = tiff_add_exif(t, orientation=8, make="B")
        m = exif_meta(t2)
        assert m["orientation"] == 8 and m["make"] == "B"
        assert np.array_equal(decode_tiff(t2), BASE)

    def test_bad_orientation_refuses(self):
        with pytest.raises(ValueError, match="outside 1..8"):
            tiff_add_exif(encode_tiff(BASE), orientation=9)


class TestJpegApp1:
    @pytest.mark.parametrize("byte_order", ["little", "big"])
    def test_roundtrip_and_pinned_decode_untouched(self, byte_order):
        jpeg = encode_jpeg(BASE, quality=85)
        app1 = build_exif_app1(
            orientation=8, make="CamY", model="M2", datetime="2022:01:02 03:04:05",
            pixel_x=13, pixel_y=9, byte_order=byte_order,
        )
        jj = jpeg_add_exif(jpeg, app1)
        assert np.array_equal(decode_jpeg(jj), decode_jpeg(jpeg))
        m = exif_meta(jj)
        assert m["byte_order"] == byte_order
        assert m["orientation"] == 8 and m["make"] == "CamY"
        assert (m["pixel_x"], m["pixel_y"]) == (13, 9)

    def test_jpeg_without_exif_defaults(self):
        m = exif_meta(encode_jpeg(BASE, quality=85))
        assert m["orientation"] == 1 and m["make"] is None


class TestRefusals:
    def test_not_an_image_refuses(self):
        with pytest.raises(ValueError, match="not a TIFF or JPEG"):
            exif_meta(b"\x00" * 32)

    def test_bad_tiff_magic_refuses(self):
        with pytest.raises(ValueError, match="42"):
            exif_meta(b"II" + struct.pack("<H", 43) + b"\x08\x00\x00\x00")

    def test_value_offset_out_of_bounds_refuses(self):
        tagged = bytearray(tiff_add_exif(encode_tiff(BASE), orientation=2, make="CamZZZZZ"))
        # the Make value is out-of-line at the very end; point it past EOF
        (ifd0,) = struct.unpack_from("<I", tagged, 4)
        (n,) = struct.unpack_from("<H", tagged, ifd0)
        for k in range(n):
            e = ifd0 + 2 + 12 * k
            tag, typ, count = struct.unpack_from("<HHI", tagged, e)
            if tag == 0x010F:
                struct.pack_into("<I", tagged, e + 8, len(tagged) - 2)
        with pytest.raises(ValueError, match="out of bounds"):
            exif_meta(bytes(tagged))

    def test_truncated_ifd_refuses(self):
        app1 = build_exif_app1(orientation=2)
        tiff_struct = app1[10:]
        with pytest.raises(ValueError, match="truncated IFD"):
            exif_meta(tiff_struct[:10])

    def test_truncated_jpeg_segment_refuses(self):
        jpeg = encode_jpeg(BASE, quality=85)
        jj = jpeg_add_exif(jpeg, build_exif_app1(orientation=2))
        with pytest.raises(ValueError, match="truncated JPEG segment"):
            exif_meta(jj[:12])

    def test_bad_exif_orientation_value_refuses(self):
        app1 = bytearray(build_exif_app1(orientation=2))
        # orientation SHORT value sits inline; overwrite with 77
        idx = app1.find(struct.pack("<HHI", 0x0112, 3, 1))
        struct.pack_into("<H", app1, idx + 8, 77)
        jj = jpeg_add_exif(encode_jpeg(BASE, quality=85), bytes(app1))
        with pytest.raises(ValueError, match="orientation 77"):
            exif_meta(jj)
