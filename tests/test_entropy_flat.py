"""Flat symbol-loop device decoder (ops/entropy_flat.py): bit-exactness.

Same conformance surface as every entropy backend: scan-order coefficient
blocks identical to entropy.python_ref on the corpus and on synthetic
streams across samplings and restart intervals (CPU backend; the kernel
is backend-agnostic XLA).
"""

import numpy as np
import pytest

from conftest import CORPUS, corpus_path

from jpeg_decoder_tpu.io import parser
from jpeg_decoder_tpu.entropy import python_ref
from jpeg_decoder_tpu.ops import entropy_flat
from jpeg_decoder_tpu.types import JPEGError

from tools.encoder import encode


@pytest.mark.parametrize("name", CORPUS)
def test_corpus_bit_exact(name):
    hdr = parser.parse_file(corpus_path(name))
    scan = hdr.scans[0]
    ref = python_ref.decode_scan_baseline(hdr, scan)
    got = entropy_flat.decode_scan_baseline(hdr, scan)
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("samplings,dri", [
    (((1, 1), (1, 1), (1, 1)), 0),
    (((2, 2), (1, 1), (1, 1)), 0),
    (((2, 2), (1, 1), (1, 1)), 1),
    (((2, 1), (1, 2), (1, 1)), 3),
    (((4, 1), (1, 1), (1, 1)), 2),
    (((3, 2), (1, 1), (1, 1)), 7),
    (((2, 4), (1, 1), (1, 1)), 5),
])
def test_synthetic_bit_exact(samplings, dri):
    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (72, 88, 3), np.uint8)
    blob, _ = encode(rgb, samplings=samplings, restart_interval=dri)
    hdr = parser.parse(blob)
    scan = hdr.scans[0]
    ref = python_ref.decode_scan_baseline(hdr, scan)
    got = entropy_flat.decode_scan_baseline(hdr, scan)
    assert np.array_equal(got, ref)


def test_grayscale():
    rng = np.random.default_rng(12)
    blob, _ = encode(rng.integers(0, 256, (48, 56), np.uint8),
                     grayscale=True, samplings=((1, 1),),
                     restart_interval=3)
    hdr = parser.parse(blob)
    scan = hdr.scans[0]
    assert np.array_equal(entropy_flat.decode_scan_baseline(hdr, scan),
                          python_ref.decode_scan_baseline(hdr, scan))


def test_corrupt_stream_flags_error():
    """Invalid prefixes park the lane with an error flag — no divergence,
    no hang (the while loop has a static safety bound)."""
    rng = np.random.default_rng(13)
    blob, _ = encode(rng.integers(0, 256, (48, 56, 3), np.uint8),
                     restart_interval=2)
    hdr = parser.parse(blob)
    scan = hdr.scans[0]
    d = np.array(scan.data)
    d[len(d) // 3: len(d) // 3 + 40] = 0xFF
    scan.data = d
    with pytest.raises(JPEGError):
        entropy_flat.decode_scan_baseline(hdr, scan)


def test_truncated_stream_backend_parity():
    """A truncated stream feeds zero bits past the end; depending on the
    tables this decodes phantom symbols or hits an invalid prefix.  The
    device backend must agree with python_ref either way (same outputs or
    both error) — bit-for-bit backend swappability even off the happy
    path."""
    rng = np.random.default_rng(14)
    blob, _ = encode(rng.integers(0, 256, (48, 56, 3), np.uint8))
    hdr = parser.parse(blob)
    scan = hdr.scans[0]
    scan.data = scan.data[: max(4, len(scan.data) // 8)]
    scan.seg_offsets = np.asarray([0, len(scan.data)], np.int64)
    try:
        ref = python_ref.decode_scan_baseline(hdr, scan)
    except JPEGError:
        with pytest.raises(JPEGError):
            entropy_flat.decode_scan_baseline(hdr, scan)
        return
    got = entropy_flat.decode_scan_baseline(hdr, scan)
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_fuzz_random_streams_all_device_impls(seed):
    """Property fuzz: random geometry/quality/DRI synthetic streams decode
    bit-identically on python_ref, the flat loop, the lockstep decoder,
    and (for DRI=0) the speculative chunk pipeline."""
    from jpeg_decoder_tpu.ops import entropy_spec

    rng = np.random.default_rng(1000 + seed)
    h = int(rng.integers(16, 120))
    w = int(rng.integers(16, 150))
    legal = [((1, 1), (1, 1), (1, 1)), ((2, 2), (1, 1), (1, 1)),
             ((2, 1), (1, 2), (1, 1)), ((1, 2), (2, 1), (1, 1)),
             ((4, 1), (1, 1), (1, 1)), ((2, 2), (2, 1), (1, 1))]
    sam = legal[int(rng.integers(len(legal)))]
    dri = int(rng.integers(0, 9))
    quality = int(rng.integers(30, 98))
    rgb = rng.integers(0, 256, (h, w, 3), np.uint8)
    blob, _ = encode(rgb, samplings=sam, restart_interval=dri,
                     quality=quality)
    hdr = parser.parse(blob)
    scan = hdr.scans[0]
    ref = python_ref.decode_scan_baseline(hdr, scan)
    assert np.array_equal(
        entropy_flat.decode_scan_baseline(hdr, scan, impl="lockstep"), ref)
    assert np.array_equal(
        entropy_flat.decode_scan_baseline(hdr, scan, impl="flat"), ref)
    if dri == 0:
        got = entropy_spec.decode_scan_speculative(
            hdr, scan, chunk_bytes=int(rng.choice([512, 1024, 4096])))
        assert np.array_equal(got, ref)


def test_decode_emit2_pairs_match_single():
    """Paired emission kernel == single-symbol kernel on corpus lanes,
    with the skeleton's paired step count sufficient (T2 bound holds)."""
    import jax.numpy as jnp

    from conftest import corpus_path
    from jpeg_decoder_tpu.entropy import native
    from jpeg_decoder_tpu.ops import entropy_spec as es

    if not native.available():
        pytest.skip("native lib not built")
    for name in ("img.jpg", "img4.jpg"):
        hdr = parser.parse_file(corpus_path(name))
        scan = hdr.scans[0]
        (pools, starts, nm, _off, T, T2, C, _segf,
         ok) = es.prepare_hybrid_batch_emit(hdr, [scan])
        assert ok[0] and T2 <= T
        bc = tuple(ci for ci, c in enumerate(hdr.components)
                   for _ in range(c.v * c.h))
        bpm = len(bc)
        luts = jnp.asarray(entropy_flat.merged_luts(hdr, scan))
        words = jnp.asarray(pools[0])
        base = jnp.asarray(starts[0].astype(np.int32))
        nblocks = jnp.asarray((nm[0] * bpm).astype(np.int32))
        kw = dict(block_comp=bc, n_comps=len(hdr.components))
        p1, v1, e1, nd1 = entropy_flat.decode_emit(
            words, base, nblocks, luts, T=T, **kw)
        p2, v2, e2, nd2 = entropy_flat.decode_emit2(
            words, base, nblocks, luts, T=T2, **kw)
        assert not bool(np.asarray(e1).any())
        assert not bool(np.asarray(e2).any())
        assert bool(np.asarray(nd2 == nblocks).all()), (
            "skeleton paired-step bound must cover every lane")
        S = base.shape[0]
        n_slots = int(nm[0].max()) * bpm * 64
        lane_off = jnp.arange(S, dtype=jnp.int32) * n_slots

        def dense(pos, val):
            fp = jnp.where(pos >= 0, pos + lane_off, S * n_slots)
            return jnp.zeros((S * n_slots,), jnp.int32).at[
                fp.reshape(-1)].add(val.reshape(-1), mode="drop")

        assert np.array_equal(np.asarray(dense(p1, v1)),
                              np.asarray(dense(p2.reshape(-1, S),
                                               v2.reshape(-1, S))))
