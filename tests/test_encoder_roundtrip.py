"""Property tests via the synthetic encoder (tools/encoder.py).

The entropy layer is lossless, so for ANY legal baseline geometry the
decoder's scan output must equal the encoder's quantized coefficient input
bit-exactly — this covers sampling-factor generality (beyond both the
reference decoder's {1,2}x{1,1} restriction and PIL's encoder, which only
emits 4:4:4/4:2:2/4:2:0), restart intervals, grayscale, and the zero-based
component-ID quirk.  Pixel output is sanity-checked against PIL/libjpeg
decoding the same streams.
"""

import io
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from encoder import encode  # noqa: E402

from jpeg_decoder_tpu import decode, layout as layout_mod  # noqa: E402
from jpeg_decoder_tpu.io import parser  # noqa: E402


def _smooth_rgb(rng, w, h):
    from PIL import Image

    base = rng.integers(0, 256, (4, 4, 3)).astype(np.uint8)
    return np.asarray(Image.fromarray(base).resize((w, h), Image.BILINEAR))


SAMPLING_CASES = [
    ((1, 1), (1, 1), (1, 1)),   # 4:4:4
    ((2, 1), (1, 1), (1, 1)),   # 4:2:2
    ((1, 2), (1, 1), (1, 1)),   # 4:4:0
    ((2, 2), (1, 1), (1, 1)),   # 4:2:0
    ((4, 1), (1, 1), (1, 1)),   # 4:1:1 — beyond the reference AND PIL
    ((1, 4), (1, 1), (1, 1)),
    ((4, 2), (1, 1), (1, 1)),
    ((3, 1), (1, 1), (1, 1)),   # factor-3 ratio
    ((2, 2), (2, 1), (1, 2)),   # mixed chroma sampling
    ((4, 1), (2, 1), (2, 1)),
]


@pytest.mark.parametrize("samps", SAMPLING_CASES,
                         ids=[str(s) for s in SAMPLING_CASES])
def test_entropy_roundtrip_bit_exact(samps):
    from jpeg_decoder_tpu.entropy import native, python_ref

    import zlib

    rng = np.random.default_rng(zlib.crc32(str(samps).encode()))
    w, h = int(rng.integers(20, 130)), int(rng.integers(20, 130))
    dri = int(rng.integers(0, 4))
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    blob, planes = encode(img, samplings=samps,
                          quality=int(rng.integers(40, 95)),
                          restart_interval=dri)
    hdr = parser.parse(blob)
    lay = layout_mod.scan_layout(hdr)
    backends = [python_ref.decode_scan_baseline]
    if native.available():
        backends.append(native.decode_scan_baseline)
    for backend in backends:
        blocks = np.asarray(backend(hdr, hdr.scans[0]))
        for ci, p in enumerate(planes):
            got = blocks[lay.comp_src[ci]].reshape(p.shape)
            np.testing.assert_array_equal(got, p, err_msg=f"{samps} c{ci}")


@pytest.mark.parametrize("samps", [
    ((2, 2), (1, 1), (1, 1)),
    ((4, 1), (1, 1), (1, 1)),
    ((2, 2), (2, 1), (1, 2)),
    ((3, 1), (1, 1), (1, 1)),
])
def test_pixels_match_libjpeg(samps):
    """Decode our own exotic-sampling streams and compare against
    PIL/libjpeg decoding the same bytes (different IDCT/upsampling
    implementations: small tolerance)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    img = _smooth_rgb(rng, 100, 84)
    blob, _ = encode(img, samplings=samps, quality=85)
    res = decode(blob, idct="exact", upsample="fancy")
    pil = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    d = np.abs(res.rgb.astype(int) - pil.astype(int))
    assert d.max() <= 8, (samps, d.max())
    assert d.mean() < 2.5, (samps, d.mean())


def test_grayscale_and_zero_based_ids():
    from jpeg_decoder_tpu.models.decoder import decode_to_planes

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (41, 57), dtype=np.uint8)
    # Default samplings leave the sole component at 2x2 — legal, and per
    # T.81 A.2.2 the single-component scan is then NON-interleaved (the
    # MCU grid would be 16x16 otherwise; libjpeg agrees).
    blob, planes = encode(img, grayscale=True, restart_interval=2,
                          zero_based_ids=True, quality=70)
    hdr = parser.parse(blob)
    assert len(hdr.components) == 1
    got = decode_to_planes(hdr)
    np.testing.assert_array_equal(np.asarray(got[0]), planes[0])
    res = decode(blob)
    assert res.rgb.shape == (41, 57, 3)
    # 1x1-sampled grayscale takes the fast interleaved path (identical
    # semantics when h = v = 1).
    blob2, planes2 = encode(img, samplings=((1, 1),), grayscale=True,
                            restart_interval=3, quality=70)
    hdr2 = parser.parse(blob2)
    got2 = decode_to_planes(hdr2)
    np.testing.assert_array_equal(np.asarray(got2[0]), planes2[0])


def test_sequential_multiscan_roundtrip():
    """T.81 sequential multi-scan frames: per-component non-interleaved
    scans and partial interleaved groups — legal streams the reference
    rejects outright and PIL cannot produce."""
    from jpeg_decoder_tpu.models.decoder import decode_to_planes

    rng = np.random.default_rng(11)
    for samps, scans, dri in [
        (((2, 2), (1, 1), (1, 1)), [(0,), (1,), (2,)], 0),
        (((2, 2), (1, 1), (1, 1)), [(0,), (1, 2)], 3),
        (((1, 1), (1, 1), (1, 1)), [(0, 1), (2,)], 2),
        (((2, 1), (1, 1), (1, 1)), [(0,), (1,), (2,)], 5),
    ]:
        H, W = int(rng.integers(21, 100)), int(rng.integers(21, 100))
        img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        blob, planes = encode(img, samplings=samps, scans=scans,
                              restart_interval=dri, quality=80)
        hdr = parser.parse(blob)
        assert len(hdr.scans) == len(scans)
        got = decode_to_planes(hdr)
        got_py = decode_to_planes(hdr, entropy="python")
        for ci, p in enumerate(planes):
            np.testing.assert_array_equal(np.asarray(got[ci]), p,
                                          err_msg=f"{scans} c{ci}")
            np.testing.assert_array_equal(np.asarray(got_py[ci]), p,
                                          err_msg=f"py {scans} c{ci}")
        # PIL/libjpeg decodes the same streams: pixel sanity.
        from PIL import Image

        res = decode(blob, idct="exact", upsample="fancy")
        pil = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
        assert np.abs(res.rgb.astype(int) - pil.astype(int)).max() <= 20


def test_exotic_sampling_through_batch_decoder():
    """The batched device path handles generalized samplings too."""
    from jpeg_decoder_tpu.models.batch import BatchDecoder

    rng = np.random.default_rng(4)
    img = _smooth_rgb(rng, 64, 48)
    blob, _ = encode(img, samplings=((4, 1), (1, 1), (1, 1)), quality=80)
    item = BatchDecoder(idct="fast", upsample="fancy").decode([blob])[0]
    assert item.ok, item.error
    ref = decode(blob, idct="fast", upsample="fancy")
    np.testing.assert_array_equal(np.asarray(item.rgb), np.asarray(ref.rgb))


def test_jax_backend_on_exotic_sampling():
    """On-device entropy decoder agrees on a generalized-sampling stream."""
    from jpeg_decoder_tpu.entropy import python_ref
    from jpeg_decoder_tpu.models import decoder as decoder_mod

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    blob, _ = encode(img, samplings=((2, 2), (2, 1), (1, 2)),
                     restart_interval=2, quality=75)
    hdr = parser.parse(blob)
    jax_backend = decoder_mod._entropy_backend("jax")
    ref = np.asarray(python_ref.decode_scan_baseline(hdr, hdr.scans[0]))
    got = np.asarray(jax_backend(hdr, hdr.scans[0]))
    np.testing.assert_array_equal(got, ref)
