"""Pallas entropy kernel vs the bit-exact python_ref backend.

CPU runs use interpret mode on a tiny synthetic image (interpret mode
executes per-op, so the corpus would take minutes); real-TPU coverage is in
the tpu-marked test and the bench's aux stage."""

import io

import numpy as np
import pytest
from PIL import Image

from jpeg_decoder_tpu.entropy import python_ref
from jpeg_decoder_tpu.io import parser
from jpeg_decoder_tpu.ops import entropy_pallas, idct_pallas
import jax.numpy as jnp


def _tiny_jpeg(subsampling=2, blocks=2, size=(48, 32)):
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(4, 6, 3)).astype(np.uint8)
    rgb = np.asarray(Image.fromarray(base).resize(size))
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", quality=90,
                              subsampling=subsampling,
                              restart_marker_blocks=blocks)
    return buf.getvalue()


@pytest.mark.parametrize("subsampling", [0, 2])
def test_pallas_interpret_matches_python(subsampling):
    hdr = parser.parse(_tiny_jpeg(subsampling=subsampling))
    scan = hdr.scans[0]
    assert len(scan.seg_offsets) > 2, "need multiple restart segments"
    ref = python_ref.decode_scan_baseline(hdr, scan)
    got = entropy_pallas.decode_scan_baseline(hdr, scan, interpret=True)
    assert np.array_equal(ref, got)


def test_pallas_fallback_dri0():
    # DRI=0 corpus image: wrapper must fall back to the XLA decoder.
    hdr = parser.parse_file("/root/reference/images/img5.jpg")
    scan = hdr.scans[0]
    ref = python_ref.decode_scan_baseline(hdr, scan)
    got = entropy_pallas.decode_scan_baseline(hdr, scan)
    assert np.array_equal(ref, got)


def test_idct_kron_matches_fast():
    from jpeg_decoder_tpu.ops import pixel as P

    rng = np.random.default_rng(1)
    blocks = rng.integers(-512, 512, size=(300, 64)).astype(np.int32)
    q = rng.integers(1, 40, size=(64,)).astype(np.int32)
    fast = np.asarray(P.idct_fast(
        (jnp.asarray(blocks) * q).reshape(-1, 8, 8))).reshape(-1, 64)
    kron = np.asarray(idct_pallas.idct_kron(jnp.asarray(blocks),
                                            jnp.asarray(q)))
    assert np.abs(fast - kron).max() <= 1


def test_idct_pallas_kernel_interpret():
    rng = np.random.default_rng(2)
    blocks = rng.integers(-512, 512, size=(700, 64)).astype(np.int32)
    q = rng.integers(1, 40, size=(64,)).astype(np.int32)
    ref = np.asarray(idct_pallas.idct_kron(jnp.asarray(blocks),
                                           jnp.asarray(q)))
    got = np.asarray(idct_pallas.fused_dequant_idct(
        jnp.asarray(blocks), jnp.asarray(q), interpret=True))
    assert np.abs(ref - got).max() <= 1
