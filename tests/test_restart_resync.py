"""Restart resynchronization on corrupted streams (VERDICT r1 item 7).

Streams whose RST-marker count disagrees with DRI must decode best-effort
(libjpeg keeps going; the reference — oblivious to the mismatch — desyncs)
instead of raising.  Marker positions are ground truth: segment s covers
MCUs [s*DRI, (s+1)*DRI).
"""

import io

import numpy as np
import pytest

from conftest import corpus_path

from jpeg_decoder_tpu import decode
from jpeg_decoder_tpu.io import parser
from jpeg_decoder_tpu.entropy import python_ref
from jpeg_decoder_tpu.models.batch import BatchDecoder

from tools.encoder import encode


def _rst_positions(blob: bytes) -> list[int]:
    """Byte offsets of RSTn markers inside the entropy-coded data."""
    sos = blob.find(b"\xff\xda")
    assert sos >= 0
    out = []
    i = sos + 2
    while i < len(blob) - 1:
        if blob[i] == 0xFF and 0xD0 <= blob[i + 1] <= 0xD7:
            out.append(i)
        i += 1
    return out


def _fixture(dri=4, seed=7):
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, (64, 80, 3), np.uint8)
    blob, _ = encode(rgb, samplings=((2, 2), (1, 1), (1, 1)),
                     restart_interval=dri)
    return blob


def _pil_decodes(blob: bytes):
    from PIL import Image

    try:
        im = Image.open(io.BytesIO(blob))
        im.load()
        return np.asarray(im.convert("RGB"))
    except Exception:  # noqa: BLE001
        return None


def test_wellformed_resilient_matches_strict():
    """On conforming streams the resilient decoder is bit-identical."""
    blob = _fixture()
    hdr = parser.parse(blob)
    scan = hdr.scans[0]
    assert np.array_equal(python_ref.decode_scan_resilient(hdr, scan),
                          python_ref.decode_scan_baseline(hdr, scan))


def test_missing_rst_marker_decodes():
    """Drop one RSTn (merging two segments): PIL decodes it; so must we —
    without raising, full-frame output."""
    blob = _fixture()
    rsts = _rst_positions(blob)
    assert len(rsts) >= 3
    cut = rsts[len(rsts) // 2]
    corrupt = blob[:cut] + blob[cut + 2:]
    res = decode(corrupt)  # must not raise
    hdr = parser.parse(corrupt)
    assert res.rgb.shape == (hdr.height, hdr.width, 3)
    pil = _pil_decodes(corrupt)
    if pil is not None:
        assert pil.shape == res.rgb.shape


def test_extra_rst_marker_decodes():
    """Inject a spurious RSTn mid-segment: surplus segments are ignored
    past the MCU grid; decode completes."""
    blob = _fixture()
    rsts = _rst_positions(blob)
    mid = (rsts[0] + rsts[1]) // 2
    # Avoid splitting an existing FF xx pair.
    while blob[mid] == 0xFF or blob[mid - 1] == 0xFF:
        mid += 1
    corrupt = blob[:mid] + b"\xff\xd7" + blob[mid:]
    res = decode(corrupt)  # must not raise
    hdr = parser.parse(corrupt)
    assert res.rgb.shape == (hdr.height, hdr.width, 3)


def test_resync_isolates_damage():
    """Zeroing one segment's bytes corrupts only that segment's MCU rows:
    MCUs owned by other segments stay bit-identical to the clean decode."""
    blob = _fixture(dri=2)
    hdr = parser.parse(blob)
    scan = hdr.scans[0]
    clean = python_ref.decode_scan_baseline(hdr, scan)
    bpm = clean.shape[0] // (len(scan.seg_offsets) - 1) \
        // scan.restart_interval * scan.restart_interval
    # Corrupt segment 1's bytes in place (keep offsets).
    d = np.array(scan.data)
    d[scan.seg_offsets[1]: scan.seg_offsets[2]] = 0xFF
    scan.data = d
    got = python_ref.decode_scan_resilient(hdr, scan)
    from jpeg_decoder_tpu.layout import scan_layout

    lay = scan_layout(hdr)
    ri = scan.restart_interval
    b = lay.blocks_per_mcu
    # Segment 0 and segments >= 2 are untouched.
    assert np.array_equal(got[: ri * b], clean[: ri * b])
    assert np.array_equal(got[2 * ri * b:], clean[2 * ri * b:])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_rst_mutations_never_raise(seed):
    """Random RST insert/delete/duplicate mutations: decode() must always
    return a full-size frame, never raise."""
    blob = _fixture(dri=3, seed=seed)
    rng = np.random.default_rng(seed)
    rsts = _rst_positions(blob)
    for _ in range(6):
        op = rng.integers(0, 3)
        b = bytearray(blob)
        if op == 0 and rsts:  # delete one
            p = rsts[rng.integers(0, len(rsts))]
            del b[p: p + 2]
        elif op == 1 and rsts:  # duplicate one
            p = rsts[rng.integers(0, len(rsts))]
            b[p:p] = b[p: p + 2]
        else:  # delete several
            for p in sorted(rsts[::2], reverse=True):
                del b[p: p + 2]
        res = decode(bytes(b))
        hdr = parser.parse(bytes(b))
        assert res.rgb.shape == (hdr.height, hdr.width, 3)


def _native_or_skip():
    from jpeg_decoder_tpu.entropy import native

    if not native.available():
        pytest.skip("native backend unavailable")
    return native


def test_native_resilient_matches_python_wellformed():
    native = _native_or_skip()
    blob = _fixture()
    hdr = parser.parse(blob)
    scan = hdr.scans[0]
    assert np.array_equal(native.decode_scan_resilient(hdr, scan),
                          python_ref.decode_scan_baseline(hdr, scan))


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_native_resilient_matches_python_on_mutations(seed):
    """Native C++ resilient decode is bit-identical to the Python oracle on
    RST insert/delete mutations AND byte corruption (VERDICT r2 item 6)."""
    native = _native_or_skip()
    blob = _fixture(dri=3, seed=seed)
    rng = np.random.default_rng(100 + seed)
    rsts = _rst_positions(blob)
    for trial in range(8):
        b = bytearray(blob)
        op = rng.integers(0, 4)
        if op == 0 and rsts:  # delete one RST
            p = rsts[rng.integers(0, len(rsts))]
            del b[p: p + 2]
        elif op == 1 and rsts:  # duplicate one RST
            p = rsts[rng.integers(0, len(rsts))]
            b[p:p] = b[p: p + 2]
        elif op == 2:  # flip bits in the entropy region
            sos = blob.find(b"\xff\xda")
            for _ in range(3):
                p = int(rng.integers(sos + 14, len(b) - 2))
                b[p] ^= 1 << int(rng.integers(0, 8))
        else:  # truncate the tail (exercises decode past end-of-data)
            del b[int(rng.integers(len(b) * 3 // 4, len(b) - 2)):]
            b += b"\xff\xd9"
        try:
            hdr = parser.parse(bytes(b))
        except Exception:  # noqa: BLE001 — header damage: nothing to compare
            continue
        scan = hdr.scans[0]
        want = python_ref.decode_scan_resilient(hdr, scan)
        got = native.decode_scan_resilient(hdr, scan)
        assert np.array_equal(got, want), f"seed {seed} trial {trial}"


def test_native_resilient_cost_near_clean():
    """A corrupt stream in a serving batch must cost about the same as a
    clean one (not a ~100x Python fallback).  Same-size streams, timed
    interleaved in one process (this box's CPU noise is +-20%)."""
    import time

    native = _native_or_skip()
    blob = _fixture(dri=2, seed=11)
    rsts = _rst_positions(blob)
    cut = rsts[len(rsts) // 2]
    corrupt = blob[:cut] + blob[cut + 2:]  # segment-count mismatch
    hdr_c, hdr_k = parser.parse(blob), parser.parse(corrupt)
    scan_c, scan_k = hdr_c.scans[0], hdr_k.scans[0]

    def t_best(fn, *args, reps=5):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(20):
                fn(*args)
            best = min(best, time.perf_counter() - t0)
        return best

    # Warm both paths (LUT caches, lib load), then interleave.
    native.decode_scan_baseline(hdr_c, scan_c)
    native.decode_scan_resilient(hdr_k, scan_k)
    t_clean = t_best(native.decode_scan_baseline, hdr_c, scan_c)
    t_resil = t_best(native.decode_scan_resilient, hdr_k, scan_k)
    # Generous bound: same machinery, so anything near 1x passes even with
    # scheduler noise; the Python fallback this replaces is ~100x.
    assert t_resil < 4 * t_clean + 5e-3, (t_resil, t_clean)


def test_batch_handles_mismatch():
    blob = _fixture()
    rsts = _rst_positions(blob)
    cut = rsts[0]
    corrupt = blob[:cut] + blob[cut + 2:]
    items = BatchDecoder().decode([blob, corrupt])
    assert items[0].error is None
    assert items[1].error is None  # best-effort, not a failure
    assert np.asarray(items[1].rgb).shape == np.asarray(items[0].rgb).shape
