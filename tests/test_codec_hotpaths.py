"""Focused pins for the r11 codec hot-path rewrites.

Each test targets a code path the r11 optimization round restructured
(bounded-accumulator bit writers, chunked/vectorized bit readers,
block-repeat RLE) and pins it against an independent reference
computation — the same per-element semantics the old code implemented —
so a future refactor cannot silently change the byte stream.
"""

from __future__ import annotations

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# flacmini: chunked reader, read_signed_block, align() rewind
# ---------------------------------------------------------------------------


class TestFlacBitIO:
    def test_read_signed_block_matches_per_sample_reads(self):
        from vectorflow_spark.operators.flacmini import _Bits

        rng = np.random.default_rng(7)
        for k in (1, 2, 5, 8, 13, 17, 24, 31, 33):
            vals = rng.integers(-(1 << (k - 1)), 1 << (k - 1), size=137).tolist()
            acc = 0
            for v in vals:
                acc = (acc << k) | (v & ((1 << k) - 1))
            nbits = k * len(vals)
            pad = (-nbits) % 8
            data = (acc << pad).to_bytes((nbits + pad) // 8, "big")
            a = _Bits(data).read_signed_block(k, len(vals))
            ref = _Bits(data)
            b = [ref.read_signed(k) for _ in range(len(vals))]
            assert a == b == vals

    def test_read_signed_block_truncation_refuses(self):
        from vectorflow_spark.operators.flacmini import _Bits

        with pytest.raises(ValueError, match="truncated"):
            _Bits(b"\xab").read_signed_block(9, 100)

    def test_align_rewinds_chunked_overread(self):
        """The 8-byte refill over-reads; align() must land pos exactly on
        the next byte boundary (frame-CRC offsets depend on it)."""
        from vectorflow_spark.operators.flacmini import _Bits

        data = bytes([0b10100000]) + b"\x55" * 9
        b = _Bits(data)
        assert b.read(3) == 0b101  # 5 zero pad bits remain in byte 0
        b.align()
        assert b.pos == 1
        assert b.read(8) == 0x55

    def test_align_nonzero_padding_refuses(self):
        from vectorflow_spark.operators.flacmini import _Bits

        b = _Bits(bytes([0b10100100]) + b"\x00" * 8)
        assert b.read(3) == 0b101
        with pytest.raises(ValueError, match="padding"):
            b.align()

    def test_writer_bulk_flush_bit_exact(self):
        """Arbitrary-width writes (incl. the >8192-bit residual chunks)
        produce the same stream as bit-at-a-time emission."""
        from vectorflow_spark.operators.flacmini import _BitW

        rng = np.random.default_rng(11)
        fields = [
            (int(rng.integers(0, 1 << int(k))), int(k)) for k in rng.integers(1, 61, size=200)
        ]
        fields.append((int(rng.integers(0, 1 << 61)), 9000))  # one huge write
        w = _BitW()
        for v, k in fields:
            w.write(v, k)
        w.align()
        ref = bytearray()
        acc = nb = 0
        for v, k in fields:
            acc = (acc << k) | (v & ((1 << k) - 1))
            nb += k
            while nb >= 8:
                nb -= 8
                ref.append((acc >> nb) & 0xFF)
                acc &= (1 << nb) - 1
        if nb:
            ref.append((acc << (8 - nb)) & 0xFF)
        assert w.tobytes() == bytes(ref)

    def test_write_unary_any_width(self):
        from vectorflow_spark.operators.flacmini import _BitW

        for q in (0, 1, 7, 31, 32, 33, 100, 911):
            w = _BitW()
            w.write_unary(q)
            w.align()
            out = w.tobytes()
            # q zero bits then a 1, MSB-first
            bits = "".join(f"{b:08b}" for b in out)
            assert bits[:q] == "0" * q and bits[q] == "1"


# ---------------------------------------------------------------------------
# jpegmini: bounded-accumulator writer with bulk 0xFF stuffing
# ---------------------------------------------------------------------------


class TestJpegBitWriter:
    def _ref(self, fields):
        out = bytearray()
        acc = nb = 0
        for v, k in fields:
            acc = (acc << k) | (v & ((1 << k) - 1))
            nb += k
            while nb >= 8:
                nb -= 8
                byte = (acc >> nb) & 0xFF
                out.append(byte)
                if byte == 0xFF:
                    out.append(0x00)
                acc &= (1 << nb) - 1
        return bytes(out), acc, nb

    def test_bulk_flush_stuffs_like_per_byte(self):
        from vectorflow_spark.operators.jpegmini import _BitWriter

        rng = np.random.default_rng(13)
        fields = []
        for i in range(300):
            k = int(rng.integers(1, 25))
            # bias toward all-ones values so 0xFF bytes (the stuffing
            # branch) occur often, incl. across bulk-chunk boundaries
            v = (1 << k) - 1 if i % 3 else int(rng.integers(0, 1 << k))
            fields.append((v, k))
        fields.append(((1 << 200) - 1, 200))  # a wide all-ones write
        w = _BitWriter()
        for v, k in fields:
            w.write(v, k)
        ref, acc, nb = self._ref(fields)
        assert bytes(w.out) == ref
        assert (w.acc, w.nbits) == (acc, nb)


# ---------------------------------------------------------------------------
# snappymini: block-repeat overlapping copies
# ---------------------------------------------------------------------------


class TestSnappyOverlap:
    def test_overlapping_copy_every_period_and_remainder(self):
        """RLE copies with off < ln for every period/remainder shape must
        equal the byte-at-a-time reference semantics."""
        from vectorflow_spark.operators.snappymini import compress, decompress

        for off in range(1, 9):
            for ln in range(off + 1, 40):
                seed = bytes(range(1, off + 1))
                # reference: literal seed, then ln bytes copied from -off
                ref = bytearray(seed)
                for _ in range(ln):
                    ref.append(ref[-off])
                # hand-built snappy block: literal then one copy tag
                blob = bytearray()
                total = len(seed) + ln
                v = total
                while v >= 0x80:
                    blob.append((v & 0x7F) | 0x80)
                    v >>= 7
                blob.append(v)
                blob.append((len(seed) - 1) << 2)  # literal tag
                blob += seed
                blob.append(((ln - 1) << 2) | 2)  # copy-2 tag
                blob += off.to_bytes(2, "little")
                assert decompress(bytes(blob)) == bytes(ref)
                # and our encoder's output for the same data roundtrips
                assert decompress(compress(bytes(ref))) == bytes(ref)


# ---------------------------------------------------------------------------
# webpmini: canonical first/limit/base Huffman decode
# ---------------------------------------------------------------------------


class TestVp8lCanonicalDecode:
    def test_canonical_arrays_match_spec_walk(self):
        """Random valid (complete) length assignments: the array decoder
        must return the same symbol for every 15-bit input as a literal
        (length, code) dict walk over the canonical assignment."""
        from vectorflow_spark.operators.webpmini import _BitReader, _HuffTree

        rng = np.random.default_rng(17)
        for _ in range(20):
            # build a random complete code: start from {0:1,1:1} and
            # repeatedly split a random leaf into two children
            lengths = {0: 1, 1: 1}
            next_sym = 2
            for _ in range(int(rng.integers(0, 40))):
                pick = list(lengths)[int(rng.integers(0, len(lengths)))]
                if lengths[pick] >= 15:
                    continue
                lengths[next_sym] = lengths[pick] + 1
                lengths[pick] = lengths[pick] + 1
                next_sym += 1
            tree = _HuffTree(lengths)
            # reference canonical dict
            table = {}
            code = 0
            prev = 0
            for sym, ln in sorted(lengths.items(), key=lambda kv: (kv[1], kv[0])):
                code <<= ln - prev
                table[(ln, code)] = sym
                code += 1
                prev = ln
            for trial in range(50):
                word = int(rng.integers(0, 1 << 15))
                # LSB-first stream bytes for the 15 bits
                data = int(f"{word:015b}"[::-1], 2).to_bytes(2, "little")
                br = _BitReader(data) if _BitReader.__init__.__code__.co_argcount == 2 else None
                if br is None:
                    br = _BitReader(data, 0)
                got = tree.read_symbol(br)
                # reference walk, MSB of the code = first stream bit
                c = 0
                for ln in range(1, 16):
                    c = (c << 1) | ((word >> (15 - ln)) & 1)
                    if (ln, c) in table:
                        assert table[(ln, c)] == got
                        assert br.pos == ln
                        break
                else:
                    pytest.fail("reference walk found no code")
