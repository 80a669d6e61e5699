"""Robustness fuzzing: corrupted, truncated, and bit-flipped streams must
raise typed errors (JPEGError) — never crash, hang, or corrupt memory — on
every backend.  The reference exits the process on any malformed input
(25+ exit(1) sites); we must degrade per image."""

import io

import numpy as np
import pytest
from PIL import Image

from jpeg_decoder_tpu import JPEGError, decode
from jpeg_decoder_tpu.io import parser


def _make_jpeg(seed, progressive=False, subsampling=2, dri=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, size=(6, 8, 3)).astype(np.uint8)
    rgb = np.asarray(Image.fromarray(base).resize((88, 64)))
    buf = io.BytesIO()
    kw = dict(quality=80, subsampling=subsampling, progressive=progressive)
    if dri:
        kw["restart_marker_blocks"] = dri
    Image.fromarray(rgb).save(buf, "JPEG", **kw)
    return buf.getvalue()


def _expect_decode_or_error(data, entropy):
    try:
        res = decode(data, entropy=entropy)
        assert res.rgb.dtype == np.uint8
    except (JPEGError, ValueError, IndexError):
        pass  # typed rejection is fine; crash/hang is not


@pytest.mark.parametrize("entropy", ["python", "native"])
def test_fuzz_truncation(entropy):
    data = _make_jpeg(1)
    rng = np.random.default_rng(42)
    for cut in rng.integers(2, len(data), 25):
        _expect_decode_or_error(data[:int(cut)], entropy)


@pytest.mark.parametrize("entropy", ["python", "native"])
def test_fuzz_bitflips(entropy):
    rng = np.random.default_rng(7)
    for trial in range(25):
        data = bytearray(_make_jpeg(trial % 3, dri=2 if trial % 2 else 0))
        for _ in range(rng.integers(1, 6)):
            pos = int(rng.integers(2, len(data)))
            data[pos] ^= 1 << int(rng.integers(0, 8))
        _expect_decode_or_error(bytes(data), entropy)


def test_fuzz_progressive_bitflips():
    rng = np.random.default_rng(11)
    for trial in range(15):
        data = bytearray(_make_jpeg(trial, progressive=True))
        pos = int(rng.integers(2, len(data)))
        data[pos] ^= 1 << int(rng.integers(0, 8))
        _expect_decode_or_error(bytes(data), "auto")


def test_fuzz_random_garbage():
    rng = np.random.default_rng(3)
    for trial in range(20):
        n = int(rng.integers(4, 4096))
        blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        with pytest.raises((JPEGError, ValueError, IndexError)):
            decode(b"\xff\xd8" + blob)


def test_fuzz_speculative_truncation():
    from jpeg_decoder_tpu.entropy import native

    if not native.available():
        pytest.skip("native backend unavailable")
    data = _make_jpeg(9, subsampling=0)
    hdr = parser.parse(data)
    scan = hdr.scans[0]
    import dataclasses

    rng = np.random.default_rng(13)
    for _ in range(10):
        cut = int(rng.integers(1, len(scan.data)))
        bad = dataclasses.replace(
            scan, data=scan.data[:cut],
            seg_offsets=np.array([0, cut], np.int64))
        try:
            native.decode_scan_speculative(hdr, bad, n_chunks=4)
        except JPEGError:
            pass
