"""Extract + validate the T.81 Table D.3 QM-coder state table from the
system libjpeg (provenance for operators/jpegarith._ARITAB).

The table lives in the library's rodata as ``jpeg_aritab[114]`` of int64,
each packed ``(Qe << 16) | (NMPS << 8) | (switch << 7) | NLPS``. Validation
is two-way: the first 15 Qe values are checked against ITU-T T.81 Table
D.3 anchors transcribed from the spec, and every NMPS/NLPS index must stay
inside the 114-state machine (state 113 is libjpeg's fixed non-adapting
0.5-probability bin used for AC signs).

Usage: python scripts/extract_jpeg_aritab.py [libjpeg.so path]
Prints the packed tuple; compare against operators/jpegarith._ARITAB.
"""

from __future__ import annotations

import struct
import sys

ANCHORS = {
    0: 0x5A1D, 1: 0x2586, 2: 0x1114, 3: 0x080B, 4: 0x03D8, 5: 0x01DA,
    6: 0x00E5, 7: 0x006F, 8: 0x0036, 9: 0x001A, 10: 0x000D, 11: 0x0006,
    12: 0x0003, 13: 0x0001, 14: 0x5A7F,
}


def extract(path: str) -> tuple[int, ...]:
    data = open(path, "rb").read()
    first = struct.pack("<q", (0x5A1D << 16) | (1 << 8) | (1 << 7) | 1)
    off = data.find(first)
    while off >= 0:
        vals = struct.unpack_from("<114q", data, off)
        qe = [v >> 16 for v in vals]
        idx = [(v >> 8) & 0xFF for v in vals] + [v & 0x7F for v in vals]
        if all(qe[k] == v for k, v in ANCHORS.items()) and all(x <= 113 for x in idx):
            return vals
        off = data.find(first, off + 1)
    raise SystemExit("jpeg_aritab not found / failed validation")


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "/usr/lib/x86_64-linux-gnu/libjpeg.so.62"
    vals = extract(path)
    print("_ARITAB = (")
    for i in range(0, 114, 6):
        print("    " + " ".join(f"0x{v:012X}," for v in vals[i : i + 6]))
    print(")")
