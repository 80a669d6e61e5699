"""Geometry bucketing in decode_batch_sharded (VERDICT r3 item 4):
arbitrary-size corpora compile O(log sizes) sharded programs; output
stays bit-exact vs the unbucketed (exact-geometry) route."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from jpeg_decoder_tpu import decode
from jpeg_decoder_tpu.parallel import mesh as mesh_mod
from jpeg_decoder_tpu.parallel import sharded


@pytest.fixture(scope="module")
def mesh18():
    return mesh_mod.make_mesh((1, 8), ("data", "seg"))


def _native_ok():
    from jpeg_decoder_tpu.entropy import native
    return native.available()


def _blob(rng, w, h, restart_blocks=0, quality=85):
    base = rng.integers(0, 255, size=(h // 8 + 1, w // 8 + 1, 3))
    rgb = np.kron(base, np.ones((8, 8, 1)))[:h, :w].astype(np.uint8)
    buf = io.BytesIO()
    kw = dict(quality=quality, subsampling=2)
    if restart_blocks:
        kw["restart_marker_blocks"] = restart_blocks
    Image.fromarray(rgb).save(buf, "JPEG", **kw)
    return buf.getvalue()


def test_twenty_sizes_few_programs(mesh18, monkeypatch):
    """20 random-size blobs -> <= 4 compiled bucketed programs,
    bit-exact vs both decode() and the unbucketed sharded route."""
    if not _native_ok():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(17)
    # Sizes spanning exactly two pow-2 MCU buckets per axis (w, h in
    # [136, 250] -> 9..16 MCUs -> bucket 16; [72, 120] -> bucket 8).
    sizes = [(int(rng.integers(72, 250)), int(rng.integers(72, 250)))
             for _ in range(18)]
    blobs = [_blob(rng, w, h) for w, h in sizes]
    # Two restart-interval images of odd sizes join the same buckets
    # (DRI rides as a dynamic geom column).
    blobs.append(_blob(rng, 100, 90, restart_blocks=3))
    blobs.append(_blob(rng, 200, 110, restart_blocks=5))

    sharded._hybrid_full_step_emit_dyn._clear_cache()
    items = sharded.decode_batch_sharded(blobs, mesh18, idct="fast",
                                         upsample="fancy")
    n_programs = sharded._hybrid_full_step_emit_dyn._cache_size()
    assert n_programs <= 4, n_programs
    for it, b in zip(items, blobs):
        assert it.error is None, it.error
        ref = decode(b, idct="fast", upsample="fancy").rgb
        assert np.array_equal(np.asarray(it.rgb), ref)

    # Unbucketed route (exact-geometry grouping) agrees bit-for-bit.
    monkeypatch.setenv("JD_SHARDED_BUCKET", "off")
    items2 = sharded.decode_batch_sharded(blobs, mesh18, idct="fast",
                                          upsample="fancy")
    for it, it2 in zip(items, items2):
        assert it2.error is None
        assert np.array_equal(np.asarray(it.rgb), np.asarray(it2.rgb))


def test_bucketed_program_reuse_across_batches(mesh18):
    """A second batch of DIFFERENT sizes in the same geometry buckets
    compiles at most one more program (only the quarter-pow2 trip-count
    bucket T may differ; W/C/geometry are bucketed), and repeating the
    same batch compiles nothing."""
    if not _native_ok():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(23)
    batch1 = [_blob(rng, int(rng.integers(140, 250)),
                    int(rng.integers(140, 250))) for _ in range(4)]
    batch2 = [_blob(rng, int(rng.integers(140, 250)),
                    int(rng.integers(140, 250))) for _ in range(4)]
    items1 = sharded.decode_batch_sharded(batch1, mesh18)
    n_after_first = sharded._hybrid_full_step_emit_dyn._cache_size()
    items2 = sharded.decode_batch_sharded(batch2, mesh18)
    n_after_second = sharded._hybrid_full_step_emit_dyn._cache_size()
    # The trip-count bucket T, the lane-count bucket C and the eighth-
    # granularity pad dims may each flip one bucket between batches;
    # growth stays O(1) per batch and zero for repeats.
    assert n_after_second <= n_after_first + 2
    sharded.decode_batch_sharded(batch2, mesh18)
    assert (sharded._hybrid_full_step_emit_dyn._cache_size()
            == n_after_second)
    for it, b in zip(items1 + items2, batch1 + batch2):
        assert it.error is None
        ref = decode(b, idct="fast", upsample="fancy").rgb
        assert np.array_equal(np.asarray(it.rgb), ref)


def test_bucketed_failed_row_patches_per_image(mesh18):
    """A truncated blob inside a bucketed group decodes best-effort via
    the per-image host patch at its own geometry; neighbors stay exact."""
    if not _native_ok():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(31)
    good = _blob(rng, 150, 140)
    other = _blob(rng, 230, 170)
    sos = good.find(b"\xff\xda")
    body = sos + 2 + int.from_bytes(good[sos + 2: sos + 4], "big")
    eoi = good.rfind(b"\xff\xd9")
    cut_a = body + (eoi - body) // 4
    cut_b = body + 3 * (eoi - body) // 4
    bad = good[:cut_a] + good[cut_b:]
    items = sharded.decode_batch_sharded([good, bad, other], mesh18,
                                         idct="fast", upsample="nn")
    for it, b in zip([items[0], items[2]], [good, other]):
        assert it.error is None
        ref = decode(b, idct="fast", upsample="nn").rgb
        assert np.array_equal(np.asarray(it.rgb), ref)
    # best-effort decode of the truncated stream, correct shape
    assert items[1].error is None
    assert np.asarray(items[1].rgb).shape == decode(
        good, idct="fast", upsample="nn").rgb.shape


def test_default_idct_kron_matches_single_decode(mesh18):
    """decode_batch_sharded's default idct (kron) is bit-exact vs the
    single-image decode at the same mode."""
    if not _native_ok():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(41)
    blobs = [_blob(rng, 150, 120), _blob(rng, 100, 170)]
    items = sharded.decode_batch_sharded(blobs, mesh18)
    for it, b in zip(items, blobs):
        assert it.error is None
        ref = decode(b, idct="kron", upsample="fancy").rgb
        assert np.array_equal(np.asarray(it.rgb), ref)


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_randomized_streams_through_serving_api(mesh18, seed):
    """Property sweep: random sizes, sampling factors, DRI and quality
    through decode_batch_sharded (bucketed default route) — bit-exact
    vs the single-image decoder at matching modes."""
    if not _native_ok():
        pytest.skip("native lib not built")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from encoder import encode as raw_encode

    rng = np.random.default_rng(seed)
    blobs = []
    for _ in range(5):
        w = int(rng.integers(40, 220))
        h = int(rng.integers(40, 220))
        samp = [((1, 1), (1, 1), (1, 1)), ((2, 2), (1, 1), (1, 1)),
                ((2, 1), (1, 2), (1, 1)),
                ((2, 2), (2, 1), (1, 1))][int(rng.integers(0, 4))]
        dri = int(rng.integers(0, 6))
        q = int(rng.integers(60, 96))
        base = rng.integers(0, 255, size=(h // 8 + 1, w // 8 + 1, 3))
        rgb = np.kron(base, np.ones((8, 8, 1)))[:h, :w].astype(np.uint8)
        blob, _ = raw_encode(rgb, samplings=samp, quality=q,
                             restart_interval=dri)
        blobs.append(blob)
    items = sharded.decode_batch_sharded(blobs, mesh18, idct="fast",
                                         upsample="fancy")
    for it, b in zip(items, blobs):
        assert it.error is None, it.error
        ref = decode(b, idct="fast", upsample="fancy").rgb
        assert np.array_equal(np.asarray(it.rgb), ref)
