"""Entropy-backend equivalence and semantics tests.

All backends (python_ref, native C++, Pallas) must emit identical scan-order
coefficient arrays — the swappable stage boundary (SURVEY.md §7)."""

import numpy as np
import pytest

from conftest import CORPUS, corpus_path
from jpeg_decoder_tpu.entropy import python_ref
from jpeg_decoder_tpu.huffman import build_lut
from jpeg_decoder_tpu.io import parser
from jpeg_decoder_tpu.types import HuffmanSpec, JPEGError


# ---------------------------------------------------------------------------
# BitReader semantics
# ---------------------------------------------------------------------------

def test_bitreader_msb_first():
    br = python_ref.BitReader(bytes([0b10110100, 0b11110000]))
    assert br.getbits(1) == 1
    assert br.getbits(2) == 0b01
    assert br.getbits(5) == 0b10100
    assert br.getbits(4) == 0b1111


def test_bitreader_peek_does_not_advance():
    br = python_ref.BitReader(bytes([0xAB, 0xCD, 0xEF]))
    assert br.peek16() == 0xABCD
    assert br.peek16() == 0xABCD
    br.pos += 4
    assert br.peek16() == 0xBCDE


def test_bitreader_align():
    br = python_ref.BitReader(bytes([0xFF, 0x0F]))
    br.getbits(3)
    br.align()
    assert br.pos == 8
    br.align()  # already aligned: no-op
    assert br.pos == 8


def test_sign_extension():
    # receive/extend semantics (jpeg.cpp:340-343): values below half-range
    # are negative.
    assert python_ref.receive_extend(0b0, 1) == -1
    assert python_ref.receive_extend(0b1, 1) == 1
    assert python_ref.receive_extend(0b00, 2) == -3
    assert python_ref.receive_extend(0b01, 2) == -2
    assert python_ref.receive_extend(0b10, 2) == 2
    assert python_ref.receive_extend(0b111, 3) == 7
    assert python_ref.receive_extend(0b011, 3) == -4


# ---------------------------------------------------------------------------
# Block decode on synthetic streams
# ---------------------------------------------------------------------------

def _mini_tables():
    # DC: '0' -> size 0, '10' -> size 2; AC: '0' -> EOB, '10' -> 0x01
    # (run 0, size 1), '110' -> 0xF0 (ZRL)
    dc = HuffmanSpec(0, 0, np.array([1, 1] + [0] * 14, np.uint8),
                     np.array([0, 2], np.uint8))
    ac = HuffmanSpec(1, 0, np.array([1, 1, 1] + [0] * 13, np.uint8),
                     np.array([0x00, 0x01, 0xF0], np.uint8))
    return build_lut(dc).tolist(), build_lut(ac).tolist()


def _bits_to_bytes(bits: str) -> bytes:
    bits = bits + "1" * ((8 - len(bits) % 8) % 8)
    return bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))


def test_decode_block_dc_and_eob():
    dc_lut, ac_lut = _mini_tables()
    # DC: '10' (size 2) + bits '11' (=3), AC: '0' EOB
    br = python_ref.BitReader(_bits_to_bytes("10" + "11" + "0"))
    block = np.zeros(64, np.int64)
    pred = python_ref.decode_block(br, dc_lut, ac_lut, block, 10)
    assert pred == 13
    assert block[0] == 13
    assert np.all(block[1:] == 0)


def test_decode_block_negative_dc():
    dc_lut, ac_lut = _mini_tables()
    # DC size 2, bits '00' -> extend(0,2) = -3
    br = python_ref.BitReader(_bits_to_bytes("10" + "00" + "0"))
    block = np.zeros(64, np.int64)
    pred = python_ref.decode_block(br, dc_lut, ac_lut, block, 0)
    assert pred == -3


def test_decode_block_ac_run_and_zigzag():
    dc_lut, ac_lut = _mini_tables()
    # DC size 0; AC: ZRL ('110': 16 zeros), then 0x01 ('10' + 1 bit '1' = +1),
    # then EOB.  Coefficient lands at zigzag position 17 -> natural index 24.
    br = python_ref.BitReader(_bits_to_bytes("0" + "110" + "10" + "1" + "0"))
    block = np.zeros(64, np.int64)
    python_ref.decode_block(br, dc_lut, ac_lut, block, 0)
    from jpeg_decoder_tpu.types import ZIGZAG
    assert block[ZIGZAG[17]] == 1
    assert block.sum() == 1


def test_decode_block_invalid_code_raises():
    dc = HuffmanSpec(0, 0, np.array([1] + [0] * 15, np.uint8),
                     np.array([0], np.uint8))
    dc_lut = build_lut(dc).tolist()
    _, ac_lut = _mini_tables()
    # first bit 1 -> not the only code '0' -> invalid
    br = python_ref.BitReader(_bits_to_bytes("1" * 20))
    with pytest.raises(JPEGError):
        python_ref.decode_block(br, dc_lut, ac_lut, np.zeros(64, np.int64), 0)


# ---------------------------------------------------------------------------
# Backend equivalence: native C++ vs python_ref on the corpus
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def native():
    from jpeg_decoder_tpu.entropy import native as native_mod

    if not native_mod.available():
        pytest.skip("native backend unavailable (no g++?)")
    return native_mod


@pytest.mark.parametrize("name", CORPUS)
def test_native_matches_python(native, name):
    hdr = parser.parse_file(corpus_path(name))
    scan = hdr.scans[0]
    ref = python_ref.decode_scan_baseline(hdr, scan)
    got = native.decode_scan_baseline(hdr, scan)
    assert np.array_equal(ref, got), f"{name}: native != python"


def test_native_multithreaded_segments(native):
    # img4 has 50 restart segments; force several thread counts
    hdr = parser.parse_file(corpus_path("img4.jpg"))
    scan = hdr.scans[0]
    ref = python_ref.decode_scan_baseline(hdr, scan)
    for nt in (1, 2, 7):
        got = native.decode_scan_baseline(hdr, scan, n_threads=nt)
        assert np.array_equal(ref, got), f"n_threads={nt}"


def test_native_corrupt_stream_raises(native):
    hdr = parser.parse_file(corpus_path("img2.jpg"))
    scan = hdr.scans[0]
    bad = scan.data.copy()
    bad[: 200] = 0xFF  # invalid prefixes decode to garbage quickly
    import dataclasses

    bad_scan = dataclasses.replace(scan, data=bad)
    with pytest.raises(JPEGError):
        native.decode_scan_baseline(hdr, bad_scan)


@pytest.mark.parametrize("name", ["img.jpg", "img2.jpg", "img5.jpg"])
def test_speculative_matches_python(native, name):
    # Self-synchronizing chunk-parallel decode of DRI=0 streams must be
    # bit-exact (splice falls back to sequential decode on sync failure,
    # so correctness never depends on the speculation).
    hdr = parser.parse_file(corpus_path(name))
    scan = hdr.scans[0]
    ref = python_ref.decode_scan_baseline(hdr, scan)
    for n_chunks in (1, 3, 8, 17):
        got = native.decode_scan_speculative(hdr, scan, n_chunks=n_chunks)
        assert np.array_equal(ref, got), f"{name} n_chunks={n_chunks}"


def test_speculative_rejects_segmented(native):
    hdr = parser.parse_file(corpus_path("img4.jpg"))  # DRI=100
    with pytest.raises(JPEGError):
        native.decode_scan_speculative(hdr, hdr.scans[0])


def test_speculative_corrupt_stream(native):
    hdr = parser.parse_file(corpus_path("img2.jpg"))
    scan = hdr.scans[0]
    import dataclasses

    bad = scan.data.copy()
    bad[:] = 0xFF  # whole stream invalid -> sequential fallback must error
    with pytest.raises(JPEGError):
        native.decode_scan_speculative(
            hdr, dataclasses.replace(scan, data=bad), n_chunks=4)
