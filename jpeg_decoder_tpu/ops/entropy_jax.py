"""On-device Huffman entropy decode (JAX/XLA, segment-vectorized).

TPU-native re-architecture of the reference's sequential hot loop
(decodeHuffman / decodeMCUComponent / getNextSymbol, jpeg.cpp:300-446):

* The per-bit linear code search (jpeg.cpp:300-320) becomes an O(1) probe of
  a flat 2^16 LUT (built host-side, uploaded once per table).
* The bitstream is packed into big-endian uint32 words; the bit cursor is a
  scalar; peeking 16 bits costs two dynamic-slice loads + shifts.
* Restart segments are independent (DC predictors reset + byte alignment at
  RSTn, jpeg.cpp:419-425), so the decoder is written for ONE segment and
  ``vmap``-ed: every while-loop iteration then steps ALL segments in
  parallel as vector ops — segments are the vectorization axis on-device and
  the sharding axis across devices (see parallel/sharded.py).
* Coefficients are accumulated in zig-zag order via one-hot adds (no
  scatter), and de-zigzagged at the end with a single static gather.

All loop bounds are static (MAX MCUs per segment; AC loop bounded by 64) —
no data-dependent Python control flow, as XLA requires.  Corrupt streams set
a per-segment error flag instead of diverging.

The output is bit-identical to entropy.python_ref / entropy.native
(asserted in tests/test_entropy_jax.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..huffman import build_lut
from ..layout import scan_layout
from ..types import FrameHeader, JPEGError, ScanHeader, ZIGZAG_INV


def pack_words(data: np.ndarray) -> np.ndarray:
    """Pack unstuffed bytes into big-endian uint32 words (host side)."""
    n = len(data)
    padded = np.zeros((n + 3 + 8) // 4 * 4, dtype=np.uint8)
    padded[:n] = data
    return padded.view(">u4").astype(np.uint32)


def _peek32(words: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Next 32 bits at absolute bit position ``pos`` as uint32.

    One fetch serves both the 16-bit LUT probe (top half) and the value
    bits that follow the code (up to 16 more bits) — halving the number of
    dynamic gathers per symbol vs a peek-per-field design.
    """
    w = (pos >> 5).astype(jnp.int32)
    off = (pos & 31).astype(jnp.uint32)
    w0 = jax.lax.dynamic_index_in_dim(words, w, keepdims=False)
    w1 = jax.lax.dynamic_index_in_dim(words, w + 1, keepdims=False)
    return jnp.where(off == 0, w0,
                     (w0 << off) | (w1 >> (32 - jnp.maximum(off, 1))))


def _extend(value: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
    """JPEG sign extension (parity: jpeg.cpp:340-343)."""
    value = value.astype(jnp.int32)
    half = jnp.where(size > 0, 1 << jnp.maximum(size - 1, 0), 0)
    return jnp.where((size > 0) & (value < half),
                     value - ((1 << size) - 1), value)


def _decode_block(words, pos, pred, dc_lut, ac_lut, err):
    """Decode one 8x8 block.  Returns (pos, pred, block_zz(64,), err).

    ``block_zz`` holds coefficients in ZIG-ZAG order; the caller applies the
    static de-zigzag permutation afterwards.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (64,), 0)

    # ---- DC (parity: jpeg.cpp:324-345) ----
    window = _peek32(words, pos)
    entry = jax.lax.dynamic_index_in_dim(
        dc_lut, (window >> 16).astype(jnp.int32), keepdims=False)
    length = (entry & 31).astype(jnp.uint32)
    size = (entry >> 5).astype(jnp.uint32)
    err = err | (entry == 0) | (size > 11)
    # Value bits follow the code inside the same 32-bit window
    # (length + size <= 16 + 11 <= 32).
    raw = jnp.where(
        size == 0, jnp.uint32(0),
        (window << length) >> (32 - jnp.maximum(size, 1))).astype(jnp.int32)
    pos = pos + length + size
    diff = _extend(raw, size.astype(jnp.int32))
    pred = pred + diff
    block = jnp.where(lane == 0, pred, 0)

    # ---- AC loop (parity: jpeg.cpp:347-401), static bound 64 ----
    def cond(c):
        _pos, i, _blk, done, _err = c
        return jnp.logical_not(done) & (i < 64)

    def body(c):
        pos, i, blk, done, err = c
        window = _peek32(words, pos)
        entry = jax.lax.dynamic_index_in_dim(
            ac_lut, (window >> 16).astype(jnp.int32), keepdims=False)
        length = (entry & 31).astype(jnp.uint32)
        sym = entry >> 5
        err = err | (entry == 0)
        is_eob = sym == 0x00
        run = jnp.where(sym == 0xF0, 16, sym >> 4)
        csize = (sym & 0x0F).astype(jnp.uint32)
        i_new = i + run
        overflow = (i_new > 64) | ((csize > 0) & (i_new >= 64)) | (csize > 10)
        err = err | (~is_eob & overflow)
        raw = jnp.where(
            csize == 0, jnp.uint32(0),
            (window << length) >> (32 - jnp.maximum(csize, 1))
        ).astype(jnp.int32)
        pos = pos + length + csize
        coeff = _extend(raw, csize.astype(jnp.int32))
        write = (~is_eob) & (csize > 0) & (~overflow)
        idx = jnp.clip(i_new, 0, 63)
        blk = blk + jnp.where(write & (lane == idx), coeff, 0)
        i_next = jnp.where(is_eob, 64, jnp.where(write, i_new + 1, i_new))
        return (pos, i_next, blk, done | is_eob, err)

    pos, _, block, _, err = jax.lax.while_loop(
        cond, body, (pos, jnp.int32(1), block, jnp.bool_(False), err))
    return pos, pred, block, err


def make_segment_decoder(block_comp: tuple[int, ...], n_comps: int,
                         max_mcus: int):
    """Build a single-segment decoder for a fixed scan geometry.

    ``block_comp``: static component index of each within-MCU block (scan
    order, parity with jpeg.cpp:426-442).  Returns a function
    ``(words, n_mcus, dc_luts(n_comps,65536), ac_luts) -> (out, err)`` where
    ``out`` is (max_mcus*bpm, 64) int32 natural order.
    """
    bpm = len(block_comp)

    def decode_segment(words, n_mcus, dc_luts, ac_luts):
        out = jnp.zeros((max_mcus * bpm, 64), jnp.int32)
        preds = jnp.zeros((n_comps,), jnp.int32)
        pos = jnp.uint32(0)
        err = jnp.bool_(False)

        def mcu_body(m, carry):
            pos, preds, out, err = carry
            active = m < n_mcus

            def do(carry):
                pos, preds, out, err = carry
                for k, ci in enumerate(block_comp):
                    pos, pred, blk, err = _decode_block(
                        words, pos, preds[ci], dc_luts[ci], ac_luts[ci], err)
                    preds = preds.at[ci].set(pred)
                    out = jax.lax.dynamic_update_slice(
                        out, blk[None, :], (m * bpm + k, 0))
                return (pos, preds, out, err)

            return jax.lax.cond(active, do, lambda c: c,
                                (pos, preds, out, err))

        pos, preds, out, err = jax.lax.fori_loop(
            0, max_mcus, mcu_body, (pos, preds, out, err))
        # De-zigzag: out holds zig-zag-order rows; natural[p] = zz[ZZ_INV[p]].
        out = jnp.take(out, jnp.asarray(ZIGZAG_INV), axis=1)
        return out, err

    return decode_segment


@functools.partial(jax.jit, static_argnames=("block_comp", "n_comps",
                                             "max_mcus"))
def decode_segments(words, seg_nmcus, dc_luts, ac_luts, *,
                    block_comp: tuple[int, ...], n_comps: int,
                    max_mcus: int):
    """vmapped multi-segment decode.

    Args:
      words: (n_segments, seg_words) uint32 big-endian packed streams,
        each segment starting at bit 0 of its row.
      seg_nmcus: (n_segments,) int32 MCU count per segment.
      dc_luts/ac_luts: (n_comps, 65536) int32 decode LUTs (per component).
    Returns (out, err): (n_segments, max_mcus*bpm, 64) int32 and
      (n_segments,) bool error flags.
    """
    decoder = make_segment_decoder(block_comp, n_comps, max_mcus)
    return jax.vmap(decoder, in_axes=(0, 0, None, None))(
        words, seg_nmcus, dc_luts, ac_luts)


# ---------------------------------------------------------------------------
# Host-facing wrapper with the common backend signature
# ---------------------------------------------------------------------------

def prepare_scan(hdr: FrameHeader, scan: ScanHeader):
    """Host prep: per-segment packed words + geometry (NumPy, cheap)."""
    lay = scan_layout(hdr)
    ri = scan.restart_interval
    n_mcus = lay.n_mcus
    seg_offsets = scan.seg_offsets
    n_segments = len(seg_offsets) - 1
    expected = -(-n_mcus // ri) if ri else 1
    if n_segments != expected:
        raise JPEGError(
            f"restart-segment count {n_segments} does not match DRI {ri}")
    max_mcus = ri if ri else n_mcus
    seg_lens = np.diff(seg_offsets)
    seg_words = int(max(1, -(-int(seg_lens.max()) // 4) + 2))
    words = np.zeros((n_segments, seg_words), np.uint32)
    data = scan.data
    for s in range(n_segments):
        seg = data[seg_offsets[s]: seg_offsets[s + 1]]
        words[s, : (len(seg) + 3) // 4] = pack_words(seg)[: (len(seg) + 3) // 4]
    nm = np.full((n_segments,), max_mcus, np.int32)
    if ri:
        nm[-1] = n_mcus - ri * (n_segments - 1)
    block_comp = tuple(
        ci for ci, c in enumerate(hdr.components) for _ in range(c.v * c.h))
    return words, nm, block_comp, max_mcus, lay


def luts_for_scan(hdr: FrameHeader, scan: ScanHeader):
    dc = np.stack([build_lut(scan.dc_specs[c.td]) for c in hdr.components])
    ac = np.stack([build_lut(scan.ac_specs[c.ta]) for c in hdr.components])
    return dc, ac


def decode_scan_baseline(hdr: FrameHeader, scan: ScanHeader) -> np.ndarray:
    """Common-backend-signature wrapper: returns (total_blocks, 64) int32
    scan-order natural-layout coefficients (same as python_ref/native)."""
    words, nm, block_comp, max_mcus, lay = prepare_scan(hdr, scan)
    dc, ac = luts_for_scan(hdr, scan)
    out, err = decode_segments(
        jnp.asarray(words), jnp.asarray(nm), jnp.asarray(dc), jnp.asarray(ac),
        block_comp=block_comp, n_comps=len(hdr.components), max_mcus=max_mcus)
    if bool(np.asarray(err).any()):
        bad = np.flatnonzero(np.asarray(err))
        raise JPEGError(f"device entropy decode failed in segments {bad[:8]}")
    bpm = len(block_comp)
    out = np.asarray(out).reshape(-1, 64)
    return out[: lay.n_mcus * bpm]
