"""Unit tests: canonical Huffman code generation and decode-LUT semantics.

Strategy per SURVEY.md §4.1: code-gen vs the spec's canonical construction,
and every LUT entry cross-checked against the reference's linear-search
semantics (jpeg.cpp:300-320)."""

import numpy as np
import pytest

from jpeg_decoder_tpu.huffman import (
    STD_AC_CHROMA,
    STD_AC_LUMA,
    STD_DC_CHROMA,
    STD_DC_LUMA,
    build_lut,
    canonical_codes,
)
from jpeg_decoder_tpu.types import HuffmanSpec, JPEGError


def test_canonical_codes_simple():
    # counts: 2 codes of len 2, 2 of len 3 -> canonical: 00, 01, 100, 101
    spec = HuffmanSpec(0, 0,
                       np.array([0, 2, 2] + [0] * 13, np.uint8),
                       np.array([5, 6, 7, 8], np.uint8))
    codes, lengths = canonical_codes(spec)
    assert codes.tolist() == [0b00, 0b01, 0b100, 0b101]
    assert lengths.tolist() == [2, 2, 3, 3]


def test_canonical_codes_dc_luma_annexK():
    # T.81 Annex K.3.1: DC luma codes are 00,010,...,111111110
    codes, lengths = canonical_codes(STD_DC_LUMA)
    assert codes[0] == 0b00 and lengths[0] == 2
    assert codes[1] == 0b010 and lengths[1] == 3
    assert codes[5] == 0b110 and lengths[5] == 3
    assert codes[-1] == 0b111111110 and lengths[-1] == 9


def test_oversubscribed_table_rejected():
    spec = HuffmanSpec(0, 0,
                       np.array([3] + [0] * 15, np.uint8),  # 3 codes of len 1
                       np.array([1, 2, 3], np.uint8))
    with pytest.raises(JPEGError):
        canonical_codes(spec)


def _linear_search_decode(spec: HuffmanSpec, bits16: int):
    """The reference's getNextSymbol semantics (jpeg.cpp:300-320): grow the
    code one bit at a time, scanning codes of that length."""
    codes, lengths = canonical_codes(spec)
    cur = 0
    for i in range(16):
        bit = (bits16 >> (15 - i)) & 1
        cur = (cur << 1) | bit
        for code, ln, sym in zip(codes, lengths, spec.symbols):
            if ln == i + 1 and code == cur:
                return int(sym), i + 1
    return None


@pytest.mark.parametrize("spec", [STD_DC_LUMA, STD_DC_CHROMA,
                                  STD_AC_LUMA, STD_AC_CHROMA])
def test_lut_matches_linear_search(spec):
    lut = build_lut(spec)
    rng = np.random.default_rng(0)
    probes = np.unique(np.concatenate([
        rng.integers(0, 1 << 16, 2000),
        np.arange(0, 1 << 16, 509),  # deterministic sweep
    ]))
    for p in probes:
        entry = int(lut[p])
        expected = _linear_search_decode(spec, int(p))
        if entry == 0:
            assert expected is None
        else:
            sym, ln = entry >> 5, entry & 31
            assert expected == (sym, ln)


def test_lut_full_coverage_ac_luma():
    # AC luma is a full (or nearly full) code: count invalid prefixes
    lut = build_lut(STD_AC_LUMA)
    # Canonical JPEG tables reserve all-ones; most prefixes must be valid.
    assert (lut == 0).sum() < (1 << 16) * 0.01
