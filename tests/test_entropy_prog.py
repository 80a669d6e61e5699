"""Device progressive entropy kernels (ops/entropy_prog) vs the oracle-
grade Python implementation (entropy/progressive) — scan-by-scan and
whole-frame bit-exactness (VERDICT r3 item 2)."""

import io

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from conftest import corpus_path
from jpeg_decoder_tpu.entropy import progressive as prog_ref
from jpeg_decoder_tpu.io import parser
from jpeg_decoder_tpu.ops import entropy_prog


def _pil_progressive(seed=0, size=(96, 80), restart_blocks=0, quality=85):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, size=(size[1] // 8, size[0] // 8, 3))
    rgb = np.kron(base, np.ones((8, 8, 1)))[: size[1], : size[0]]
    buf = io.BytesIO()
    kw = dict(quality=quality, progressive=True)
    if restart_blocks:
        kw["restart_marker_blocks"] = restart_blocks
    Image.fromarray(rgb.astype(np.uint8)).save(buf, "JPEG", **kw)
    return buf.getvalue()


def _ref_planes_after(hdr, n_scans):
    """Python progressive planes after the first n_scans scans."""
    planes = []
    for ci in range(len(hdr.components)):
        rows = hdr.mcus_y * hdr.components[ci].v
        cols = hdr.mcus_x * hdr.components[ci].h
        planes.append(np.zeros((rows, cols, 64), np.int64))
    for scan in hdr.scans[:n_scans]:
        if scan.ss == 0:
            prog_ref._dc_scan(hdr, scan, planes)
        elif scan.ah == 0:
            prog_ref._ac_first_scan(hdr, scan,
                                    planes[scan.comp_indices[0]])
        else:
            prog_ref._ac_refine_scan(hdr, scan,
                                     planes[scan.comp_indices[0]])
    return planes


def _to_flat_device(planes_np):
    out = []
    for p in planes_np:
        rows, cols = p.shape[:2]
        flat = np.zeros((rows * cols + 1, 64), np.int32)
        flat[:-1] = p.reshape(-1, 64)
        out.append(jnp.asarray(flat))
    return out


def _scan_kinds(hdr):
    kinds = []
    for s in hdr.scans:
        if s.ss == 0:
            kinds.append("dc-first" if s.ah == 0 else "dc-refine")
        else:
            kinds.append("ac-first" if s.ah == 0 else "ac-refine")
    return kinds


@pytest.mark.parametrize("restart_blocks", [0, 4])
def test_each_scan_kind_matches_python(restart_blocks):
    """Every scan applied on device to the python-computed prior state
    must equal python's posterior state — isolates each kernel."""
    blob = _pil_progressive(seed=3, restart_blocks=restart_blocks)
    hdr = parser.parse(blob)
    assert hdr.progressive
    kinds = _scan_kinds(hdr)
    # PIL's standard script covers all four kinds.
    assert set(kinds) >= {"dc-first", "ac-first", "ac-refine", "dc-refine"}
    for k, scan in enumerate(hdr.scans):
        before = _ref_planes_after(hdr, k)
        after = _ref_planes_after(hdr, k + 1)
        dev = _to_flat_device(before)
        dev = entropy_prog.apply_scan_device(hdr, scan, dev)
        for ci, want in enumerate(after):
            got = np.asarray(dev[ci])[:-1].reshape(want.shape)
            assert np.array_equal(got, want.astype(np.int32)), (
                f"scan {k} ({kinds[k]}) comp {ci}")


@pytest.mark.parametrize("restart_blocks", [0, 3, 16])
def test_whole_frame_device_vs_python(restart_blocks):
    blob = _pil_progressive(seed=11, size=(120, 56),
                            restart_blocks=restart_blocks)
    hdr = parser.parse(blob)
    want = prog_ref.decode_progressive(hdr)
    got = entropy_prog.decode_progressive_device(hdr)
    for w, g in zip(want, got):
        assert np.array_equal(w, g)


def test_subsampled_progressive_device():
    """4:2:0 progressive (interleaved DC scans with 6 blocks/MCU)."""
    blob = _pil_progressive(seed=7, size=(88, 72), restart_blocks=2,
                            quality=70)
    hdr = parser.parse(blob)
    assert hdr.components[0].h == 2 and hdr.components[0].v == 2
    want = prog_ref.decode_progressive(hdr)
    got = entropy_prog.decode_progressive_device(hdr)
    for w, g in zip(want, got):
        assert np.array_equal(w, g)


def test_corpus_progressive_small_device():
    """prograssive-sample-2.jpg (DRI=0): single-lane device decode is
    bit-exact vs python."""
    hdr = parser.parse_file(corpus_path("prograssive-sample-2.jpg"))
    want = prog_ref.decode_progressive(hdr)
    got = entropy_prog.decode_progressive_device(hdr)
    for w, g in zip(want, got):
        assert np.array_equal(w, g)


def _native_ok():
    from jpeg_decoder_tpu.entropy import native
    return native.available()


@pytest.mark.parametrize("size,quality", [((120, 88), 85), ((168, 104), 60)])
def test_hybrid_skeleton_lanes_vs_python(size, quality):
    """DRI=0 frames through the native-skeleton device-lane path:
    bit-exact vs python with ~8-lane strides exercised."""
    if not _native_ok():
        pytest.skip("native lib not built")
    blob = _pil_progressive(seed=13, size=size, quality=quality)
    hdr = parser.parse(blob)
    assert all(len(s.seg_offsets) == 2 for s in hdr.scans)
    want = prog_ref.decode_progressive(hdr)
    got = entropy_prog.decode_progressive_hybrid(hdr, target_lanes=8)
    for w, g in zip(want, got):
        assert np.array_equal(w, g)


def test_hybrid_corpus_small():
    if not _native_ok():
        pytest.skip("native lib not built")
    hdr = parser.parse_file(corpus_path("prograssive-sample-2.jpg"))
    want = prog_ref.decode_progressive(hdr)
    got = entropy_prog.decode_progressive_hybrid(hdr)
    for w, g in zip(want, got):
        assert np.array_equal(w, g)


@pytest.mark.slow
def test_hybrid_corpus_12mp():
    """The 12 MP corpus progressive image through skeleton device lanes."""
    if not _native_ok():
        pytest.skip("native lib not built")
    from jpeg_decoder_tpu.entropy import native

    hdr = parser.parse_file(corpus_path("prograssive-sample.jpg"))
    want = native.decode_progressive(hdr)
    got = entropy_prog.decode_progressive_hybrid(hdr)
    for w, g in zip(want, got):
        assert np.array_equal(w, g)


def test_progressive_rides_decode_batch_sharded():
    """Progressive blobs decode through decode_batch_sharded's device
    path (not host fallback), bit-exact vs decode()."""
    from jpeg_decoder_tpu import decode
    from jpeg_decoder_tpu.parallel import mesh as mesh_mod
    from jpeg_decoder_tpu.parallel.sharded import decode_batch_sharded

    mesh = mesh_mod.make_mesh((1, 8), ("data", "seg"))
    blob = open(corpus_path("prograssive-sample-2.jpg"), "rb").read()
    blob2 = _pil_progressive(seed=21, size=(96, 64), restart_blocks=4)
    items = decode_batch_sharded([blob, blob2], mesh, idct="fast",
                                 upsample="fancy")
    for it, b in zip(items, [blob, blob2]):
        assert it.error is None
        ref = decode(b, idct="fast", upsample="fancy").rgb
        assert np.array_equal(np.asarray(it.rgb), ref)


def test_jax_backend_progressive_decode():
    """decode(entropy='jax'/'hybrid') routes progressive frames through
    the device lane kernels end-to-end."""
    from jpeg_decoder_tpu import decode

    path = corpus_path("prograssive-sample-2.jpg")
    ref = decode(path, entropy="python", idct="fast", upsample="nn").rgb
    for backend in ("jax", "hybrid"):
        got = decode(path, entropy=backend, idct="fast", upsample="nn").rgb
        assert np.array_equal(got, ref), backend


def test_progressive_lanes_shard_over_mesh():
    """Progressive scan lanes shard over ALL mesh axes (shard_map +
    psum plane reduction): bit-exact vs the unsharded decode, on both
    the skeleton-lane and segment-lane paths."""
    from jpeg_decoder_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.make_mesh((2, 4), ("data", "seg"))
    for blob in (_pil_progressive(seed=33, size=(152, 96)),
                 _pil_progressive(seed=34, size=(120, 88),
                                  restart_blocks=4)):
        hdr = parser.parse(blob)
        want = prog_ref.decode_progressive(hdr)
        got = entropy_prog.decode_progressive_lanes(hdr, mesh=mesh)
        for w, g in zip(want, got):
            assert np.array_equal(w, g)


# ---------------------------------------------------------------------------
# Emission AC-refine (round 5): balanced lanes, deterministic schedule
# ---------------------------------------------------------------------------


def test_refine_emit_vs_lockstep_ab():
    """JD_PROG_REFINE=lockstep (the legacy A/B path) and the default
    emission refine produce identical planes on a refine-heavy frame."""
    import os

    if not _native_ok():
        pytest.skip("native lib not built")
    blob = _pil_progressive(seed=41, size=(200, 144), quality=92)
    hdr = parser.parse(blob)
    want = entropy_prog.decode_progressive_hybrid(hdr)
    os.environ["JD_PROG_REFINE"] = "lockstep"
    try:
        legacy = entropy_prog.decode_progressive_hybrid(hdr)
    finally:
        del os.environ["JD_PROG_REFINE"]
    for w, g in zip(want, legacy):
        assert np.array_equal(w, g)
    ref = prog_ref.decode_progressive(hdr)
    for w, g in zip(want, ref):
        assert np.array_equal(w, g)


def test_refine_emit_many_lane_counts():
    """The emission kernels are lane-count independent: odd/small/large
    balanced lane counts all reproduce the Python planes (exercises
    lane-entry EOB skips, empty lanes, and partial correction chunks)."""
    if not _native_ok():
        pytest.skip("native lib not built")
    blob = _pil_progressive(seed=42, size=(136, 112), quality=78)
    hdr = parser.parse(blob)
    want = prog_ref.decode_progressive(hdr)
    for lanes in (1, 3, 7, 64, 1024):
        got = entropy_prog.decode_progressive_hybrid(
            hdr, target_lanes=lanes)
        for w, g in zip(want, got):
            assert np.array_equal(w, g), f"lanes={lanes}"


def test_balanced_lane_edges_properties():
    rng = np.random.default_rng(7)
    for n, S in ((1000, 16), (17, 32), (64, 8)):
        w = rng.integers(0, 50, n).astype(np.int64)
        w[rng.integers(0, n, n // 3)] = 0
        edges = entropy_prog._balanced_lane_edges(np.maximum(w, 1), S)
        assert edges[0] == 0 and edges[-1] == n and len(edges) == S + 1
        assert (np.diff(edges) >= 0).all()
        sums = np.add.reduceat(np.maximum(w, 1), edges[:-1])[
            np.diff(edges) > 0]
        # No lane exceeds the mean by more than the max single weight.
        assert sums.max() <= np.maximum(w, 1).sum() / S + 50


def test_refine_emit_corrupt_stream_flags_error():
    """A refine scan whose entropy bytes are corrupted after skeleton
    time must surface JPEGError from the device path, not wrong pixels.
    (The skeleton validates first, so corruption between skeleton and
    kernel is simulated by truncating the scan data under the kernel.)"""
    if not _native_ok():
        pytest.skip("native lib not built")
    from jpeg_decoder_tpu.types import JPEGError

    blob = _pil_progressive(seed=43, size=(96, 80), quality=90)
    hdr = parser.parse(blob)
    # Corrupt the LAST refine scan's data: flip bytes mid-stream.  The
    # skeleton walk itself errors (invalid prefix) or the kernel's
    # schedule check fires — either way a JPEGError must surface.
    for s in reversed(hdr.scans):
        if s.ss != 0 and s.ah != 0:
            data = np.array(s.data, np.uint8, copy=True)
            data[len(data) // 2:] = 0xFF
            s.data = data
            break
    with pytest.raises(JPEGError):
        entropy_prog.decode_progressive_hybrid(hdr)
