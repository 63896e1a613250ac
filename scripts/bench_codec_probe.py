"""Codec hot-path probe (r6 verdict item 5): decode wall-clock on 1-2 MP
fixtures, the scale where the per-token Python entropy loop dominates.

Run twice and trust the second line (JIT/alloc warmup; the host also has
periodic external load — see BENCH gotchas). Round-7 quiet-host numbers:

  baseline JPEG 1 MP   1.57 s -> ~1.05 s   (inlined scan loop, f32 IDCT,
                                            regex destuff fast path)
  progressive JPEG 1MP 1.67 s -> ~1.50 s   (window-fetch _BitReader)
  VP8 (noisy 0.2 MP)   0.58 s -> ~0.38 s   (multi-bit renorm bool decoder,
                                            batched 4x4 IDCT patch IO)

All changes are bit-exact: the libjpeg/libwebp parity matrices
(tests/test_jpeg_libjpeg_parity.py, tests/test_vp8_libwebp_parity.py)
pin the outputs against the system libraries.

Usage: python scripts/bench_codec_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    from vectorflow_spark.operators.jpegmini import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from vectorflow_spark.operators.vp8mini import encode_webp_lossy
    from vectorflow_spark.operators.webpmini import decode_webp

    rng = np.random.default_rng(0)
    h, w = 768, 1024
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 80 * np.sin(xx / 37) * np.cos(yy / 23))[:, :, None]
    img = (base + rng.normal(0, 12, (h, w, 3))).clip(0, 255).astype(np.uint8)
    noisy = rng.integers(0, 256, (384, 512, 3), np.uint8)

    probes = [
        ("jpeg_baseline_1mp", encode_jpeg(img), decode_jpeg),
        ("jpeg_progressive_1mp", encode_jpeg_progressive(img), decode_jpeg),
        ("vp8_noisy_0p2mp", encode_webp_lossy(noisy, qi=60), decode_webp),
    ]
    for name, blob, fn in probes:
        fn(blob)  # warm
        times = []
        for _ in range(3):
            t0 = time.time()
            fn(blob)
            times.append(time.time() - t0)
        print(f"{name}: {min(times):.3f} s  (bytes={len(blob)})")


if __name__ == "__main__":
    main()
