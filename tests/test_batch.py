"""Batched decode path (models/batch.py): wire formats, grouping, isolation.

The batched path must produce exactly the same RGB as the single-image
``decode()`` API for every wire format — the wire encoding is lossless by
construction and these tests pin that down (including escape coefficients,
gap extenders, ragged padding, and non-power-of-two batch sizes).
"""

import io

import numpy as np
import pytest

from conftest import CORPUS, PROGRESSIVE_CORPUS, corpus_path

from jpeg_decoder_tpu import decode
from jpeg_decoder_tpu.models.batch import (
    BatchDecoder, nibbleize_ac, pack_blocks, sparsify_ac)


def _blob(name: str) -> bytes:
    with open(corpus_path(name), "rb") as f:
        return f.read()


# ---------------------------------------------------------------------------
# sparsify_ac: encoding round-trip (host-side property tests)
# ---------------------------------------------------------------------------

def _unsparsify(g: np.ndarray, v: np.ndarray, n_coef: int) -> np.ndarray:
    """NumPy model of the device reconstruction (cumsum + scatter-add)."""
    flat = np.zeros(n_coef, np.int32)
    idx = np.cumsum(g.astype(np.int64)) - 1
    np.add.at(flat, idx[idx >= 0], v[idx >= 0])
    return flat


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("density", [0.0, 0.01, 0.15, 1.0])
def test_sparsify_roundtrip(seed, density):
    rng = np.random.default_rng(seed)
    n_blocks = 37
    blocks = np.zeros((n_blocks, 64), np.int32)
    mask = rng.random(blocks.shape) < density
    mask[:, 0] = False  # DC slots are zero in the AC plane
    blocks[mask] = rng.integers(-128, 128, mask.sum())
    ac8 = blocks.astype(np.int8)
    g, v = sparsify_ac(ac8)
    assert g.dtype == np.uint8 and v.dtype == np.int8
    out = _unsparsify(g, v, n_blocks * 64)
    np.testing.assert_array_equal(out, blocks.reshape(-1))


def test_sparsify_long_gaps_extenders():
    """Gaps > 255 must emit (255, 0) extender entries, exactly."""
    ac8 = np.zeros((100, 64), np.int8)
    flat = ac8.reshape(-1)
    positions = [0, 1, 300, 301, 1000, 6399]  # gaps incl. 299 and 5399
    for p in positions:
        flat[p] = 7
    g, v = sparsify_ac(ac8)
    assert (v[g == 255] == 0).sum() >= 1 or 255 not in g[v != 0]
    out = _unsparsify(g, v, flat.size)
    np.testing.assert_array_equal(out, flat.astype(np.int32))
    # entries with val==0 are exactly the extenders; all gaps in [0,255]
    assert g.max() <= 255 and g.min() >= 1


def test_sparsify_matches_pack_blocks_on_corpus():
    """Wire encodings agree with each other on a real image."""
    from jpeg_decoder_tpu.entropy import python_ref
    from jpeg_decoder_tpu.io import parser

    hdr = parser.parse(_blob("img2.jpg"))
    blocks = python_ref.decode_scan_baseline(hdr, hdr.scans[0])
    dc16, ac8, ei, ev = pack_blocks(np.asarray(blocks))
    g, v = sparsify_ac(ac8)
    flat = _unsparsify(g, v, ac8.size)
    np.testing.assert_array_equal(flat, ac8.reshape(-1).astype(np.int32))


def test_native_sparse_emitter_matches_numpy():
    """The C++ sparse emitter must produce the exact byte stream of
    sparsify_ac over the packed decode, including the threaded
    segment-splice path (img4.jpg has DRI=100 -> 160 segments)."""
    from jpeg_decoder_tpu.entropy import native
    from jpeg_decoder_tpu.io import parser

    if not native.available():
        pytest.skip("native backend unavailable")
    for name in ("img2.jpg", "img4.jpg", "img5.jpg"):
        hdr = parser.parse(_blob(name))
        dc_p, ac8, ei_p, ev_p = native.decode_scan_packed(hdr, hdr.scans[0])
        g_ref, v_ref = sparsify_ac(ac8)
        for nt in (1, 2):
            dc, g, v, ei, ev = native.decode_scan_sparse(
                hdr, hdr.scans[0], n_threads=nt)
            np.testing.assert_array_equal(dc, dc_p, err_msg=name)
            np.testing.assert_array_equal(g, g_ref, err_msg=name)
            np.testing.assert_array_equal(v, v_ref, err_msg=name)
            o1, o2 = np.argsort(ei, kind="stable"), np.argsort(
                ei_p, kind="stable")
            np.testing.assert_array_equal(ei[o1], ei_p[o2], err_msg=name)
            np.testing.assert_array_equal(ev[o1], ev_p[o2], err_msg=name)


def test_native_emitters_randomized_restart_sweep():
    """Native sparse/nibble emitters vs NumPy references on randomized
    restart-marker images with long zero runs crossing segment
    boundaries — regression for the splice emitting a non-canonical
    extender chain when a segment's first nonzero sits far past its
    base (byte-divergent though value-equivalent)."""
    from PIL import Image

    from jpeg_decoder_tpu.entropy import native
    from jpeg_decoder_tpu.io import parser

    if not native.available():
        pytest.skip("native backend unavailable")
    rng = np.random.default_rng(0)
    for _ in range(15):
        w, h = int(rng.integers(64, 200)), int(rng.integers(64, 200))
        img = np.full((h, w, 3), int(rng.integers(0, 255)), np.uint8)
        for _k in range(int(rng.integers(0, 6))):
            y0, x0 = int(rng.integers(0, h - 8)), int(rng.integers(0, w - 8))
            img[y0:y0 + 8, x0:x0 + 8] = rng.integers(0, 255, (8, 8, 3))
        buf = io.BytesIO()
        try:
            Image.fromarray(img).save(
                buf, "JPEG", quality=int(rng.integers(30, 95)),
                restart_marker_blocks=int(rng.integers(1, 5)),
                subsampling=int(rng.integers(0, 3)))
        except TypeError:
            pytest.skip("PIL lacks restart_marker_blocks")
        hdr = parser.parse(buf.getvalue())
        from jpeg_decoder_tpu.models.batch import (
            nibbleize_ac as _nib, sparsify_ac as _sp)

        _, ac8, _, _ = native.decode_scan_packed(hdr, hdr.scans[0])
        g_ref, v_ref = _sp(ac8)
        e_ref, ov_ref = _nib(ac8)
        for nt in (1, 2):
            _, g, v, _, _ = native.decode_scan_sparse(
                hdr, hdr.scans[0], n_threads=nt)
            np.testing.assert_array_equal(g, g_ref)
            np.testing.assert_array_equal(v, v_ref)
            _, e, ov, _, _ = native.decode_scan_nibble(
                hdr, hdr.scans[0], n_threads=nt)
            np.testing.assert_array_equal(e, e_ref)
            np.testing.assert_array_equal(ov, ov_ref)


def test_native_slots_emitter_matches_numpy():
    """C++ slot emitter == numpy slotify_ac, including the threaded path
    and the overflow list (order-insensitive)."""
    from jpeg_decoder_tpu.entropy import native
    from jpeg_decoder_tpu.io import parser
    from jpeg_decoder_tpu.models.batch import slotify_ac

    if not native.available():
        pytest.skip("native backend unavailable")
    for name in ("img3.jpg", "img4.jpg"):
        hdr = parser.parse(_blob(name))
        _, ac8, _, _ = native.decode_scan_packed(hdr, hdr.scans[0])
        pos_r, val_r, ovi_r, ovv_r = slotify_ac(ac8, 16)
        for nt in (1, 2):
            dc, pos, val, ovi, ovv, ei, ev = native.decode_scan_slots(
                hdr, hdr.scans[0], 16, n_threads=nt)
            np.testing.assert_array_equal(pos, pos_r, err_msg=name)
            np.testing.assert_array_equal(val, val_r, err_msg=name)
            o1, o2 = np.argsort(ovi, kind="stable"), np.argsort(
                ovi_r, kind="stable")
            np.testing.assert_array_equal(ovi[o1], ovi_r[o2])
            np.testing.assert_array_equal(ovv[o1], ovv_r[o2])


def _unnibble(e: np.ndarray, ov: np.ndarray, n_coef: int) -> np.ndarray:
    """NumPy model of the device nibble reconstruction."""
    g, vc = e >> 4, e & 15
    adv = np.where(vc == 0, g.astype(np.int64) * 16, g)
    idx = np.cumsum(adv) - 1
    v4 = ((vc.astype(np.int32) + 8) & 15) - 8
    is_ov = vc == 8
    rank = np.cumsum(is_ov) - 1
    vals = np.where(is_ov, ov[np.clip(rank, 0, max(len(ov) - 1, 0))]
                    if len(ov) else 0, v4)
    flat = np.zeros(n_coef, np.int32)
    keep = idx >= 0
    np.add.at(flat, idx[keep], vals[keep])
    return flat


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("density", [0.0, 0.003, 0.05, 0.5])
def test_nibbleize_roundtrip(seed, density):
    rng = np.random.default_rng(seed)
    blocks = np.zeros((53, 64), np.int32)
    mask = rng.random(blocks.shape) < density
    mask[:, 0] = False
    blocks[mask] = rng.integers(-128, 128, mask.sum())
    blocks[mask & (blocks == 0)] = 1
    ac8 = blocks.astype(np.int8)
    e, ov = nibbleize_ac(ac8)
    out = _unnibble(e, ov, ac8.size)
    np.testing.assert_array_equal(out, ac8.reshape(-1).astype(np.int32))


def test_nibbleize_gap_boundaries():
    """Exercise every extender regime: <=15, 16..255, 256..495, huge."""
    ac8 = np.zeros((200, 64), np.int8)
    flat = ac8.reshape(-1)
    pos = [0, 10, 25, 26, 280, 290, 800, 6000, 6001, 12799]
    for p_ in pos:
        flat[p_] = -9  # also exercises the overflow stream
    e, ov = nibbleize_ac(ac8)
    assert len(ov) == len(pos)
    out = _unnibble(e, ov, flat.size)
    np.testing.assert_array_equal(out, flat.astype(np.int32))


def test_nibbleize_matches_sparse_on_corpus():
    from jpeg_decoder_tpu.entropy import native
    from jpeg_decoder_tpu.io import parser

    if not native.available():
        pytest.skip("native backend unavailable")
    hdr = parser.parse(_blob("img5.jpg"))
    _, ac8, _, _ = native.decode_scan_packed(hdr, hdr.scans[0])
    e, ov = nibbleize_ac(ac8)
    out = _unnibble(e, ov, ac8.size)
    np.testing.assert_array_equal(out, ac8.reshape(-1).astype(np.int32))
    assert len(e) + len(ov) < 2 * np.count_nonzero(ac8) * 1.05


# ---------------------------------------------------------------------------
# BatchDecoder end-to-end vs single-image decode
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("wire", ["nibble", "sparse", "packed", "slots"])
def test_batch_matches_single(wire):
    names = ["img.jpg", "img2.jpg", "img4.jpg"]
    blobs = [_blob(n) for n in names]
    bd = BatchDecoder(entropy="auto", idct="fast", upsample="fancy",
                      wire=wire)
    items = bd.decode(blobs)
    for name, blob, item in zip(names, blobs, items):
        assert item.ok, item.error
        ref = decode(blob, idct="fast", upsample="fancy").rgb
        np.testing.assert_array_equal(
            np.asarray(item.rgb), np.asarray(ref), err_msg=name)


@pytest.mark.parametrize("wire", ["nibble", "sparse", "packed", "slots"])
def test_batch_same_geometry_nonpow2(wire):
    """5 copies of one geometry exercises the pow-2 batch padding."""
    blob = _blob("img6.jpg")
    bd = BatchDecoder(wire=wire)
    items = bd.decode([blob] * 5)
    ref = np.asarray(decode(blob, idct="fast", upsample="fancy").rgb)
    for item in items:
        assert item.ok
        np.testing.assert_array_equal(np.asarray(item.rgb), ref)


def test_batch_error_isolation():
    """A malformed image fails alone; the rest of the batch decodes."""
    good = _blob("img2.jpg")
    bad = b"\xff\xd8\xff\xdb\x00\x04garbage"
    items = BatchDecoder().decode([good, bad, good])
    assert items[0].ok and items[2].ok and not items[1].ok
    assert isinstance(items[1].error, Exception)
    ref = np.asarray(decode(good, idct="fast", upsample="fancy").rgb)
    np.testing.assert_array_equal(np.asarray(items[0].rgb), ref)
    np.testing.assert_array_equal(np.asarray(items[2].rgb), ref)


@pytest.mark.slow
def test_batch_progressive_in_batch():
    """Progressive images flow through the batch path (host planes)."""
    names = ["img3.jpg", PROGRESSIVE_CORPUS[0]]
    blobs = [_blob(n) for n in names]
    items = BatchDecoder(wire="sparse").decode(blobs)
    for name, blob, item in zip(names, blobs, items):
        assert item.ok, item.error
        ref = decode(blob, idct="fast", upsample="fancy").rgb
        np.testing.assert_array_equal(
            np.asarray(item.rgb), np.asarray(ref), err_msg=name)


def test_batch_wave_pipelining():
    """Wave-split path (len > wave) produces in-order, correct results."""
    blobs = [_blob("img2.jpg"), _blob("img6.jpg")] * 3
    items = BatchDecoder(wire="sparse").decode(blobs, wave=2)
    refs = {n: np.asarray(decode(_blob(n), idct="fast",
                                 upsample="fancy").rgb)
            for n in ("img2.jpg", "img6.jpg")}
    for i, item in enumerate(items):
        assert item.ok and item.index == i
        name = "img2.jpg" if i % 2 == 0 else "img6.jpg"
        np.testing.assert_array_equal(np.asarray(item.rgb), refs[name])
