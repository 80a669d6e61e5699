"""Native C++ progressive decoder vs the Python reference implementation."""

import io

import numpy as np
import pytest
from PIL import Image

from conftest import corpus_path
from jpeg_decoder_tpu.entropy import progressive
from jpeg_decoder_tpu.io import parser


@pytest.fixture(scope="module")
def native():
    from jpeg_decoder_tpu.entropy import native as native_mod

    if not native_mod.available():
        pytest.skip("native backend unavailable")
    return native_mod


def test_native_progressive_corpus_small(native):
    hdr = parser.parse_file(corpus_path("prograssive-sample-2.jpg"))
    ref = progressive.decode_progressive(hdr)
    got = native.decode_progressive(hdr)
    for ci in range(3):
        assert np.array_equal(ref[ci], got[ci]), f"comp {ci}"


@pytest.mark.slow
def test_native_progressive_corpus_12mp(native):
    hdr = parser.parse_file(corpus_path("prograssive-sample.jpg"))
    ref = progressive.decode_progressive(hdr)
    got = native.decode_progressive(hdr)
    for ci in range(3):
        assert np.array_equal(ref[ci], got[ci]), f"comp {ci}"


@pytest.mark.parametrize("subsampling", [0, 2])
@pytest.mark.parametrize("quality", [40, 90])
def test_native_progressive_reencodes(native, subsampling, quality):
    rng = np.random.default_rng(subsampling * 100 + quality)
    base = rng.integers(0, 255, size=(9, 7, 3)).astype(np.uint8)
    rgb = np.asarray(Image.fromarray(base).resize((104, 88)))
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", quality=quality,
                              progressive=True, subsampling=subsampling)
    hdr = parser.parse(buf.getvalue())
    ref = progressive.decode_progressive(hdr)
    got = native.decode_progressive(hdr)
    for ci in range(3):
        assert np.array_equal(ref[ci], got[ci]), f"comp {ci}"


def test_native_progressive_with_restarts(native):
    rng = np.random.default_rng(5)
    base = rng.integers(0, 255, size=(6, 8, 3)).astype(np.uint8)
    rgb = np.asarray(Image.fromarray(base).resize((96, 72)))
    buf = io.BytesIO()
    try:
        Image.fromarray(rgb).save(buf, "JPEG", quality=80, progressive=True,
                                  subsampling=0, restart_marker_blocks=4)
    except TypeError:
        pytest.skip("PIL lacks restart_marker_blocks")
    hdr = parser.parse(buf.getvalue())
    ref = progressive.decode_progressive(hdr)
    got = native.decode_progressive(hdr)
    for ci in range(3):
        assert np.array_equal(ref[ci], got[ci]), f"comp {ci}"
