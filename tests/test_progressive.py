"""Progressive-JPEG conformance (oracle: PIL/libjpeg — the reference C++
rejects SOF2, jpeg.cpp:69-73, so it cannot serve as oracle here).

Also property tests via PIL re-encoding: any pixel content, re-encoded as
progressive at various subsamplings/qualities, must decode to the same pixels
PIL decodes (within IDCT/color rounding tolerance; 4:4:4 avoids upsampler
differences entirely)."""

import io

import numpy as np
import pytest
from PIL import Image

from conftest import corpus_path
from jpeg_decoder_tpu import decode


def _compare(ours, pil, max_mean, frac2_bound, name):
    diff = np.abs(ours.astype(int) - pil.astype(int))
    assert diff.mean() < max_mean, f"{name}: mean {diff.mean()}"
    assert (diff > 2).mean() < frac2_bound, f"{name}: frac>2 {(diff>2).mean()}"


def test_progressive_sample2_vs_pil():
    p = corpus_path("prograssive-sample-2.jpg")
    res = decode(p, idct="fast", upsample="fancy")
    pil = np.asarray(Image.open(p).convert("RGB"))
    assert res.rgb.shape == pil.shape
    assert res.header.progressive
    _compare(res.rgb, pil, 0.55, 0.005, "prog2")


@pytest.mark.slow
def test_progressive_sample_12mp_vs_pil():
    p = corpus_path("prograssive-sample.jpg")
    res = decode(p, idct="fast", upsample="fancy")
    pil = np.asarray(Image.open(p).convert("RGB"))
    _compare(res.rgb, pil, 0.8, 0.02, "prog 12MP")


def _reencode(rgb: np.ndarray, **save_kw) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", **save_kw)
    return buf.getvalue()


@pytest.mark.parametrize("quality", [30, 75, 95])
def test_progressive_roundtrip_444(quality):
    rng = np.random.default_rng(quality)
    # Smooth-ish random content (random noise stresses IDCT tails)
    base = rng.integers(0, 255, size=(13, 17, 3)).astype(np.uint8)
    rgb = np.asarray(Image.fromarray(base).resize((136, 104)))
    data = _reencode(rgb, quality=quality, progressive=True, subsampling=0)
    res = decode(data, idct="fast")
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    diff = np.abs(res.rgb.astype(int) - pil.astype(int))
    assert diff.max() <= 12, f"q{quality}: max {diff.max()}"
    assert diff.mean() < 1.0


@pytest.mark.parametrize("subsampling", [0, 1, 2])
def test_progressive_roundtrip_subsampled(subsampling):
    rng = np.random.default_rng(subsampling)
    base = rng.integers(0, 255, size=(9, 11, 3)).astype(np.uint8)
    rgb = np.asarray(Image.fromarray(base).resize((120, 88)))
    data = _reencode(rgb, quality=85, progressive=True,
                     subsampling=subsampling)
    res = decode(data, idct="fast", upsample="fancy")
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    _compare(res.rgb, pil, 0.7, 0.01, f"subsampling={subsampling}")


def test_progressive_with_restarts():
    # PIL can emit restart markers in progressive scans via 'restart_marker_blocks'
    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, size=(8, 8, 3)).astype(np.uint8)
    rgb = np.asarray(Image.fromarray(base).resize((96, 64)))
    try:
        data = _reencode(rgb, quality=80, progressive=True, subsampling=0,
                         restart_marker_blocks=4)
    except TypeError:
        pytest.skip("PIL without restart_marker_blocks support")
    res = decode(data, idct="fast")
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    diff = np.abs(res.rgb.astype(int) - pil.astype(int))
    assert diff.max() <= 12


def test_baseline_roundtrip_grayscale():
    # 1-component support (beyond the reference's 3-only, jpeg.cpp:83-87)
    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, size=(7, 9)).astype(np.uint8)
    gray = np.asarray(Image.fromarray(base, "L").resize((72, 56)))
    data = _reencode(np.asarray(Image.fromarray(gray, "L")), quality=90)
    res = decode(data, idct="fast")
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    diff = np.abs(res.rgb.astype(int) - pil.astype(int))
    assert diff.max() <= 6
