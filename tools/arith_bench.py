"""QM-arithmetic vs Huffman native decode ratio, ONE process.

VERDICT r3 item 7: native QM was ~3.4x slower than native Huffman;
target <= 2x.  The same image content is encoded both ways (tools/
encoder), both decoded by the native C++ backend, timings interleaved
(this box's CPU noise is +-20% across runs — never compare two separate
processes, CLAUDE.md).

Usage: python tools/arith_bench.py [megapixels]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from encoder import encode  # noqa: E402

from jpeg_decoder_tpu.entropy import native  # noqa: E402
from jpeg_decoder_tpu.io import parser  # noqa: E402


def main():
    mp = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    side = int((mp * 1e6) ** 0.5) // 16 * 16
    rng = np.random.default_rng(5)
    base = rng.integers(0, 255, size=(side // 8, side // 8, 3))
    rgb = np.kron(base, np.ones((8, 8, 1)))[:side, :side].astype(np.uint8)
    # photographic-ish content: smooth + noise
    noise = rng.normal(0, 12, rgb.shape)
    rgb = np.clip(rgb.astype(np.float64) * 0.7 + noise + 30, 0,
                  255).astype(np.uint8)

    huff, _ = encode(rgb, samplings=((2, 2), (1, 1), (1, 1)), quality=85)
    arith, _ = encode(rgb, samplings=((2, 2), (1, 1), (1, 1)), quality=85,
                      arithmetic=True)
    h_hdr, a_hdr = parser.parse(huff), parser.parse(arith)
    assert a_hdr.arithmetic
    px = side * side / 1e6
    print(f"{side}x{side} ({px:.2f} MP), huff {len(huff)} B, "
          f"arith {len(arith)} B")

    native.decode_scan_baseline(h_hdr, h_hdr.scans[0], n_threads=1)
    native.decode_scan_arith(a_hdr, a_hdr.scans[0], n_threads=1)

    t_h, t_a = [], []
    for _ in range(7):
        t0 = time.perf_counter()
        native.decode_scan_baseline(h_hdr, h_hdr.scans[0], n_threads=1)
        t_h.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        native.decode_scan_arith(a_hdr, a_hdr.scans[0], n_threads=1)
        t_a.append(time.perf_counter() - t0)
    bh, ba = min(t_h), min(t_a)
    print(f"huffman 1-thread: {bh*1e3:.1f} ms ({px/bh:.1f} MP/s)")
    print(f"arith   1-thread: {ba*1e3:.1f} ms ({px/ba:.1f} MP/s)")
    print(f"ratio arith/huffman: {ba/bh:.2f}x  (target <= 2.0x)")


if __name__ == "__main__":
    main()
