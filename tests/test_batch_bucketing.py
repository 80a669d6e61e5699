"""Geometry bucketing (VERDICT r2 item 7): a serving corpus of arbitrary
image sizes decodes through O(buckets) compiled pixel programs — not one
per distinct size — with output identical to the unbucketed decode."""

import io

import numpy as np
import pytest
from PIL import Image

from jpeg_decoder_tpu import decode
from jpeg_decoder_tpu.models.batch import BatchDecoder, _bucket_pow2


def _jpeg(w, h, seed, subsampling=2, quality=85):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (6, 8, 3)).astype(np.uint8)
    rgb = np.asarray(Image.fromarray(base).resize((w, h)))
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", quality=quality,
                              subsampling=subsampling)
    return buf.getvalue()


def test_bucket_pow2():
    assert [_bucket_pow2(n) for n in (1, 2, 3, 17, 64, 65)] == \
        [1, 2, 4, 32, 64, 128]


@pytest.mark.parametrize("wire", ["nibble", "slots", "packed"])
def test_random_sizes_few_programs_exact_output(wire):
    """20 random-size images -> <= 4 compiled pixel programs, each image
    byte-identical to its single-image decode."""
    import jax

    rng = np.random.default_rng(0)
    sizes = [(int(rng.integers(130, 500)), int(rng.integers(130, 500)))
             for _ in range(20)]
    blobs = [_jpeg(w, h, seed=i) for i, (w, h) in enumerate(sizes)]

    bd = BatchDecoder(idct="fast", upsample="fancy", wire=wire)
    before = {k: v for k, v in _program_counts().items()}
    items = bd.decode(blobs)
    after = _program_counts()
    fresh = {k: after.get(k, 0) - before.get(k, 0) for k in after}
    pixel_programs = sum(
        v for k, v in fresh.items() if k.startswith("_batched_from"))
    assert pixel_programs <= 4, (pixel_programs, fresh)

    for it, blob in zip(items, blobs):
        assert it.error is None
        ref = decode(blob, idct="fast", upsample="fancy").rgb
        got = np.asarray(it.rgb)
        assert got.shape == ref.shape
        assert np.array_equal(got, ref), f"size {ref.shape}"


def _program_counts():
    """Count compiled specializations of the batch device programs."""
    from jpeg_decoder_tpu.models import batch as batch_mod

    out = {}
    for name in ("_batched_from_nibble", "_batched_from_sparse",
                 "_batched_from_packed", "_batched_from_slots"):
        fn = getattr(batch_mod, name)
        try:
            out[name] = fn._cache_size()
        except Exception:  # noqa: BLE001 — jit internals moved
            out[name] = 0
    return out


def test_bucketed_matches_exact_mode():
    """bucket='pow2' output == bucket=None output, byte-for-byte (fancy
    upsampling's dynamic edge clamp must reproduce true-edge replication
    exactly — images chosen so width/height are NOT multiples of the MCU
    grid and buckets genuinely pad)."""
    sizes = [(131, 97), (200, 330), (259, 130)]
    blobs = [_jpeg(w, h, seed=10 + i, subsampling=2)
             for i, (w, h) in enumerate(sizes)]
    items_b = BatchDecoder(upsample="fancy", bucket="pow2").decode(blobs)
    items_e = BatchDecoder(upsample="fancy", bucket=None).decode(blobs)
    for ib, ie in zip(items_b, items_e):
        assert ib.error is None and ie.error is None
        assert np.array_equal(np.asarray(ib.rgb), np.asarray(ie.rgb))


def test_bucketed_gray_and_444():
    blobs = [_jpeg(161, 123, seed=30, subsampling=0)]
    im = Image.open(io.BytesIO(blobs[0])).convert("L")
    buf = io.BytesIO()
    im.save(buf, "JPEG", quality=85)
    blobs.append(buf.getvalue())
    items = BatchDecoder().decode(blobs)
    for it, blob in zip(items, blobs):
        assert it.error is None
        ref = decode(blob, idct="fast", upsample="fancy").rgb
        assert np.array_equal(np.asarray(it.rgb), ref)
