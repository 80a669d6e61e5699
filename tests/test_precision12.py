"""12-bit extended-sequential frames (T.81 B.2.2, SOF1 precision 12).

Beyond the reference (8-bit only, exits otherwise) and beyond standard
libjpeg builds.  Entropy coding is lossless, so the coefficient round
trip through tools/encoder (extended Huffman tables, 2048 level shift)
must be exact on every backend; pixels are checked against a float64
IDCT reference.
"""

import numpy as np
import pytest

from jpeg_decoder_tpu import decode
from jpeg_decoder_tpu.io import parser
from jpeg_decoder_tpu.models import decoder as decoder_mod
from jpeg_decoder_tpu.models.batch import BatchDecoder

from tools.encoder import encode


def _rgb12(seed, h=48, w=64, channels=3):
    rng = np.random.default_rng(seed)
    shape = (h, w, channels) if channels else (h, w)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 2048 + 1500 * np.sin(yy / 9.0) * np.cos(xx / 7.0)
    if channels:
        base = base[..., None]
    noise = rng.normal(0, 300, shape)
    return np.clip(base + noise, 0, 4095).astype(np.uint16)


@pytest.mark.parametrize("entropy", ["python", "jax"])
@pytest.mark.parametrize("samplings,dri", [
    (((1, 1), (1, 1), (1, 1)), 0),
    (((2, 2), (1, 1), (1, 1)), 3),
    (((2, 1), (1, 2), (1, 1)), 2),
])
def test_coefficient_roundtrip(entropy, samplings, dri):
    blob, planes = encode(_rgb12(0), samplings=samplings,
                          restart_interval=dri, precision=12)
    hdr = parser.parse(blob)
    assert hdr.precision == 12
    got = decoder_mod.decode_to_planes(hdr, entropy=entropy)
    for g, p in zip(got, planes):
        assert np.array_equal(np.asarray(g).reshape(p.shape), p)


def test_output_dtype_and_range():
    blob, _ = encode(_rgb12(1), precision=12)
    res = decode(blob)
    assert res.rgb.dtype == np.uint16
    assert res.rgb.max() <= 4095


def test_gray_pixels_vs_float64_reference():
    g12 = _rgb12(2, 40, 40, channels=0)
    blob, _ = encode(g12, grayscale=True, samplings=((1, 1),),
                     precision=12)
    res = decode(blob)
    hdr = parser.parse(blob)
    from jpeg_decoder_tpu.ops.pixel import IDCT_M

    q = hdr.quant_tables[hdr.components[0].tq].values
    deq = (np.asarray(decoder_mod.decode_to_planes(hdr, entropy="python")[0])
           * q).astype(np.float64)
    blocks = deq.reshape(*deq.shape[:2], 8, 8)
    out = np.einsum("pu,rcuv,qv->rcpq", IDCT_M, blocks, IDCT_M)
    img = out.transpose(0, 2, 1, 3).reshape(deq.shape[0] * 8, -1)[:40, :40]
    ref = np.clip(np.trunc(img + 2048), 0, 4095)
    diff = np.abs(res.rgb[..., 0].astype(int) - ref.astype(int))
    # f32 AAN vs f64 orthonormal IDCT: tolerance scales with precision
    # (libjpeg's conformance bound is ~1 part in 256 of full scale).
    assert diff.max() <= 8


def test_batch_routes_planes_path():
    blob, _ = encode(_rgb12(3), samplings=((2, 2), (1, 1), (1, 1)),
                     precision=12)
    single = decode(blob, idct="fast", upsample="fancy").rgb
    items = BatchDecoder().decode([blob])
    assert items[0].error is None
    assert np.array_equal(np.asarray(items[0].rgb), single)


def test_native_12bit_matches_python():
    """jd_decode_scan handles precision-12 (T.81 B.2.2 size categories
    15/14; VERDICT r3 item 6): bit-identical to the Python oracle, and
    the wire emitters still reject cleanly."""
    from jpeg_decoder_tpu.entropy import native, python_ref
    from jpeg_decoder_tpu.types import JPEGError

    if not native.available():
        pytest.skip("native backend not built")
    for dri, samplings in [(0, ((1, 1),) * 3), (3, ((2, 2), (1, 1), (1, 1)))]:
        blob, _ = encode(_rgb12(4), samplings=samplings,
                         restart_interval=dri, precision=12)
        hdr = parser.parse(blob)
        want = python_ref.decode_scan_baseline(hdr, hdr.scans[0])
        got = native.decode_scan_baseline(hdr, hdr.scans[0])
        assert np.array_equal(got, want)
    with pytest.raises(JPEGError):
        native.decode_scan_sparse(hdr, hdr.scans[0])


def test_native_12bit_is_fast():
    """The whole point of VERDICT r3 item 6: remove the ~100x Python
    cliff.  Native must be >= 50x the Python path on a precision-12
    stream (one process, interleaved timing)."""
    import time

    from jpeg_decoder_tpu.entropy import native, python_ref

    if not native.available():
        pytest.skip("native backend not built")
    blob, _ = encode(_rgb12(5, h=256, w=320), precision=12)
    hdr = parser.parse(blob)
    scan = hdr.scans[0]
    native.decode_scan_baseline(hdr, scan)  # warm LUTs
    t0 = time.perf_counter()
    native.decode_scan_baseline(hdr, scan)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    python_ref.decode_scan_baseline(hdr, scan)
    t_py = time.perf_counter() - t0
    assert t_py / t_nat >= 50, (t_py, t_nat)


def test_auto_backend_uses_native_for_12bit():
    from jpeg_decoder_tpu.entropy import native

    if not native.available():
        pytest.skip("native backend not built")
    blob, planes = encode(_rgb12(6), precision=12)
    hdr = parser.parse(blob)
    got = decoder_mod.decode_to_planes(hdr, entropy="auto")
    for g, p in zip(got, planes):
        assert np.array_equal(np.asarray(g).reshape(p.shape), p)


def test_write_image_scales_to_8bit(tmp_path):
    blob, _ = encode(_rgb12(5), precision=12)
    res = decode(blob)
    from jpeg_decoder_tpu.io import writers

    p = tmp_path / "out.png"
    writers.write_image(p, res.rgb)
    from PIL import Image

    arr = np.asarray(Image.open(p))
    assert arr.dtype == np.uint8
    assert np.array_equal(arr, (res.rgb >> 4).astype(np.uint8))
    npy = tmp_path / "out.npy"
    writers.write_image(npy, res.rgb)
    assert np.load(npy).dtype == np.uint16


@pytest.mark.parametrize("progressive", [False, True])
def test_arithmetic_12bit_roundtrip(progressive):
    """SOF9/SOF10 at precision 12: the QM layer is size-agnostic (magnitude
    chains self-delimit), so arithmetic 12-bit needs no extra limits."""
    blob, planes = encode(_rgb12(6), samplings=((2, 2), (1, 1), (1, 1)),
                          precision=12, arithmetic=True,
                          progressive=progressive,
                          restart_interval=0 if progressive else 2)
    hdr = parser.parse(blob)
    assert hdr.precision == 12 and hdr.arithmetic
    got = decoder_mod.decode_to_planes(hdr)
    for g, p in zip(got, planes):
        assert np.array_equal(np.asarray(g).reshape(p.shape), p)
    assert decode(blob).rgb.dtype == np.uint16


def test_12bit_rides_device_sharded_route():
    """12-bit baseline Huffman frames decode through
    decode_batch_sharded's DEVICE lanes (VERDICT r4 item 5) — both DRI=0
    hybrid skeleton lanes and restart-segment lanes — bit-exact vs the
    native host backend, mixed with an 8-bit image in the same batch.
    Anchor: the reference rejects precision != 8 (jpeg.cpp:77)."""
    from jpeg_decoder_tpu.entropy import native
    from jpeg_decoder_tpu.parallel import mesh as mesh_mod
    from jpeg_decoder_tpu.parallel import sharded

    if not native.available():
        pytest.skip("native lib not built")
    b12, _ = encode(_rgb12(11, h=48, w=64),
                    samplings=((2, 2), (1, 1), (1, 1)), precision=12)
    b12dri, _ = encode(_rgb12(12, h=56, w=80), samplings=((1, 1),) * 3,
                       precision=12, restart_interval=3)
    b8, _ = encode((_rgb12(13, h=64, w=48) >> 4).astype(np.uint8),
                   samplings=((2, 2), (1, 1), (1, 1)))
    blobs = [b12, b8, b12dri]
    assert parser.parse(b12).precision == 12
    assert parser.parse(b12dri).restart_interval == 3
    mesh = mesh_mod.make_mesh((1, 8), ("data", "seg"))
    items = sharded.decode_batch_sharded(blobs, mesh, idct="fast",
                                         upsample="nn")
    for it, b in zip(items, blobs):
        assert it.error is None, it.error
        ref = decode(b, entropy="native", idct="fast", upsample="nn").rgb
        got = np.asarray(it.rgb)
        assert got.dtype == ref.dtype
        assert np.array_equal(got, ref)
