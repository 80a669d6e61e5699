"""Output-sink tests: BMP round-trip, PPM, PNG."""

import numpy as np

from jpeg_decoder_tpu.io import writers


def test_bmp_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for w in (7, 8, 9, 10):  # exercise all padding cases
        rgb = rng.integers(0, 256, size=(5, w, 3), dtype=np.uint8)
        p = tmp_path / f"x{w}.bmp"
        writers.write_bmp(p, rgb)
        back = writers.read_bmp(p)
        assert np.array_equal(back, rgb)


def test_ppm(tmp_path):
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    p = tmp_path / "x.ppm"
    writers.write_ppm(p, rgb)
    raw = open(p, "rb").read()
    assert raw.startswith(b"P6\n3 2\n255\n")
    assert raw.endswith(rgb.tobytes())


def test_png_roundtrip(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    writers.write_image(p, rgb)
    back = np.asarray(Image.open(p).convert("RGB"))
    assert np.array_equal(back, rgb)

