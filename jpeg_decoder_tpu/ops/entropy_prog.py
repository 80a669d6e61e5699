"""On-device progressive entropy decode (T.81 Annex G.2) — lane-parallel.

Capability far beyond the reference (which hard-exits on SOF2,
/root/reference/jpeg.cpp:69-73): every progressive scan kind runs as lanes
of a block-lockstep device kernel, the same design as the baseline
lockstep decoder (ops/entropy_flat):

* **DC first** — one DC probe per block slot; no inner loop at all.
  Lane DC predictors seed from the lane table (restart segments seed 0;
  DRI=0 skeleton lanes seed the recorded predictor), so no cross-lane
  pass is needed.
* **DC refinement** — one raw bit per block at a CLOSED-FORM stream
  position (bit i of the lane = block i): no kernel, one vectorized
  gather computes every block's ``+= bit << al`` delta.
* **AC first** — run/size symbols with EOB-run state per lane; lanes in
  an EOB run skip whole block slots without touching the stream.
* **AC refinement** — correction-bit pass: reads the CURRENT device-
  resident coefficient band (one row gather per block slot), walks the
  band positions emitting ``+/- (1 << al)`` deltas.

Every kernel emits DELTAS: progressive plane updates are all
mathematically scatter-ADDS on conformant streams (DC-first writes into
zero DC slots; refinement bits target value bits proven zero by the
successive-approximation invariant — value mod 2^(al+1) == 0 entering
scan ``al``), so one ``plane.at[rows].add(delta)`` applies each scan and
the plane never leaves HBM.

Lanes come from restart segments (DC reset + eobrun reset per segment,
T.81 G.2 — zero host work) or, for DRI=0 scans, from the native
progressive skeleton scan (entropy/native.prog_skeleton) recording
(bit position, eobrun, DC predictors) at every stride-th MCU.

Bit-exactness vs entropy/progressive.py is asserted scan-by-scan in
tests/test_entropy_prog.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..huffman import build_lut
from ..layout import comp_dims_unpadded
from ..types import FrameHeader, JPEGError, ScanHeader, ZIGZAG, ZIGZAG_INV
from .entropy_flat import _extend, _window32


def scan_words(scan: ScanHeader) -> np.ndarray:
    """Whole-scan big-endian uint32 word buffer, zero-padded (lanes index
    it by absolute bit position — no per-segment repacking)."""
    data = np.asarray(scan.data, np.uint8)
    nw = (len(data) + 3) // 4 + 8
    buf = np.zeros(nw * 4, np.uint8)
    buf[: len(data)] = data
    return buf.view(">u4").astype(np.uint32)


def segment_lanes(scan: ScanHeader, n_mcus: int):
    """Restart segments as lanes: (base_bits, n_per_lane, mcu_first),
    all (S,) int32/int64.  DRI=0 scans yield one lane."""
    offs = np.asarray(scan.seg_offsets, np.int64)
    n_seg = len(offs) - 1
    ri = scan.restart_interval
    expected = -(-n_mcus // ri) if ri else 1
    if n_seg != expected:
        raise JPEGError(
            f"progressive scan: segment count {n_seg} != expected "
            f"{expected} (DRI {ri}, {n_mcus} MCUs)")
    base_bits = (offs[:-1] * 8).astype(np.int64)
    per = ri if ri else n_mcus
    n_per = np.full(n_seg, per, np.int32)
    if ri:
        n_per[-1] = n_mcus - ri * (n_seg - 1)
    mcu_first = (np.arange(n_seg, dtype=np.int64) * per)
    return base_bits, n_per, mcu_first


# ---------------------------------------------------------------------------
# DC scans
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("block_comp", "max_blocks", "al"))
def decode_dc_first(words, base_bits, nblocks, pred0, luts2d, *,
                    block_comp: tuple[int, ...], max_blocks: int, al: int):
    """DC-first scan (ss=0, ah=0) over S lanes, block-lockstep.

    luts2d: (n_scan_comps, 65536) uint16 DC LUTs (scan component order).
    pred0: (S, n_scan_comps) int32 predictor seeds.
    Returns (vals (S, max_blocks) int32 = pred << al per block slot,
    err (S,) bool).  Parity: entropy/progressive._decode_dc_first.
    """
    S = base_bits.shape[0]
    bpm = len(block_comp)
    n_words = words.shape[0]
    bc_arr = jnp.asarray(np.asarray(block_comp, np.int32))

    w0 = (base_bits >> 5).astype(jnp.int32)
    off0 = (base_bits & 31).astype(jnp.uint32)
    state = dict(
        cur=jnp.take(words, jnp.minimum(w0, n_words - 1)),
        nxt=jnp.take(words, jnp.minimum(w0 + 1, n_words - 1)),
        off=off0, w_idx=w0 + 2,
        b=jnp.int32(0),
        preds=pred0.astype(jnp.int32),
        out=jnp.zeros((max_blocks, S), jnp.int32),
        err=jnp.zeros((S,), jnp.bool_))

    def cond(s):
        return (s["b"] < max_blocks) & jnp.any(~s["err"] & (s["b"] < nblocks))

    def body(s):
        b = s["b"]
        comp = jnp.take(bc_arr, b % bpm)          # uniform scalar
        lut_row = jax.lax.dynamic_index_in_dim(luts2d, comp, keepdims=False)
        active = ~s["err"] & (b < nblocks)
        window = _window32(s["cur"], s["nxt"], s["off"])
        entry = jnp.take(lut_row, (window >> 16).astype(jnp.int32)
                         ).astype(jnp.int32)
        length = (entry & 31).astype(jnp.uint32)
        size = (entry >> 5).astype(jnp.uint32)
        bad = (entry == 0) | (size > 11)
        size = jnp.minimum(size, 16)
        raw = jnp.where(size == 0, jnp.uint32(0),
                        (window << length) >> (32 - jnp.maximum(size, 1)))
        diff = _extend(raw, size.astype(jnp.int32))
        ok = active & ~bad
        pred_old = jax.lax.dynamic_slice(s["preds"], (0, comp), (S, 1))[:, 0]
        pred = pred_old + diff
        preds = jax.lax.dynamic_update_slice(
            s["preds"], jnp.where(ok, pred, pred_old)[:, None], (0, comp))
        out = jax.lax.dynamic_update_slice(
            s["out"], jnp.where(ok, pred << al, 0)[None], (b, 0))
        adv = jnp.where(ok, length + size, 0)
        offp = s["off"] + adv
        need = offp >= 32
        loaded = jnp.take(words, jnp.minimum(s["w_idx"], n_words - 1))
        return dict(
            cur=jnp.where(need, s["nxt"], s["cur"]),
            nxt=jnp.where(need, loaded, s["nxt"]),
            off=offp - jnp.where(need, 32, 0).astype(jnp.uint32),
            w_idx=s["w_idx"] + need, b=b + 1, preds=preds, out=out,
            err=s["err"] | (bad & active))

    s = jax.lax.while_loop(cond, body, state)
    return s["out"].T, s["err"]


def dc_refine_bits(words, base_bits, nblocks, max_blocks: int, al: int):
    """DC refinement (ss=0, ah>0): block i of a lane reads exactly bit
    ``base + i`` — closed form, ONE vectorized gather, no kernel.

    Returns (S, max_blocks) int32 deltas (``bit << al``; the target bit of
    every DC value is zero entering the scan, so |= == +=).
    Parity: entropy/progressive._dc_scan refinement branch."""
    S = base_bits.shape[0]
    n_words = words.shape[0]
    slot = jnp.arange(max_blocks, dtype=jnp.int32)[None, :]
    pos = base_bits[:, None].astype(jnp.int32) + slot
    w = jnp.take(words, jnp.minimum(pos >> 5, n_words - 1))
    bit = (w >> (31 - (pos & 31).astype(jnp.uint32))) & 1
    valid = slot < nblocks[:, None]
    return jnp.where(valid, bit.astype(jnp.int32) << al, 0)


# ---------------------------------------------------------------------------
# AC scans (single-component, T.81 G.2.2 / G.2.3)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("max_blocks", "ss", "se", "al"))
def decode_ac_first(words, base_bits, nblocks, eobrun0, lut, *,
                    max_blocks: int, ss: int, se: int, al: int):
    """AC-first scan over S lanes, block-lockstep with EOB-run state.

    Returns (out (S, max_blocks, 64) int32 natural order, err (S,) bool).
    Parity: entropy/progressive._ac_first_scan.
    """
    S = base_bits.shape[0]
    n_words = words.shape[0]
    lane64 = jax.lax.broadcasted_iota(jnp.int32, (S, 64), 1)

    w0 = (base_bits >> 5).astype(jnp.int32)
    off0 = (base_bits & 31).astype(jnp.uint32)
    state = dict(
        cur=jnp.take(words, jnp.minimum(w0, n_words - 1)),
        nxt=jnp.take(words, jnp.minimum(w0 + 1, n_words - 1)),
        off=off0, w_idx=w0 + 2,
        b=jnp.int32(0),
        eobrun=eobrun0.astype(jnp.int32),
        out=jnp.zeros((max_blocks, S, 64), jnp.int32),
        err=jnp.zeros((S,), jnp.bool_))

    def cond(s):
        return (s["b"] < max_blocks) & jnp.any(~s["err"] & (s["b"] < nblocks))

    def body(s):
        b = s["b"]
        active = ~s["err"] & (b < nblocks)
        in_eob = active & (s["eobrun"] > 0)
        eobrun = jnp.where(in_eob, s["eobrun"] - 1, s["eobrun"])
        decode = active & ~in_eob

        def ac_cond(c):
            return jnp.any(c["in"])

        def ac_body(c):
            window = _window32(c["cur"], c["nxt"], c["off"])
            entry = jnp.take(lut, (window >> 16).astype(jnp.int32)
                             ).astype(jnp.int32)
            length = (entry & 31).astype(jnp.uint32)
            sym = (entry >> 5) & 0xFF
            bad = (entry == 0) & c["in"]
            r = sym >> 4
            sz = (sym & 15).astype(jnp.uint32)
            is_eobrun = (sz == 0) & (r < 15)
            # EOB run: (1 << r) - 1 plus r raw bits (after the code).
            # The shift count must stay UNSIGNED: a signed count promotes
            # the whole shift to int32 and turns it arithmetic.
            ebits = jnp.where(
                r == 0, jnp.uint32(0),
                (window << length)
                >> (32 - jnp.maximum(r, 1).astype(jnp.uint32)))
            new_eob = (1 << r) - 1 + jnp.where(r > 0, ebits, 0).astype(
                jnp.int32)
            # Coefficient: advance run, write extend(value) << al.
            wpos = c["k"] + r
            # Parity: python raises only on a COEFFICIENT run overflow
            # (k + r > se with sz > 0); a ZRL that walks past the band
            # simply ends the block (progressive.py:156-160).
            overflow = (~is_eobrun) & (sz > 0) & (wpos > se)
            bad = bad | (overflow & c["in"])
            sz = jnp.minimum(sz, 16)
            raw = jnp.where(
                sz == 0, jnp.uint32(0),
                (window << length) >> (32 - jnp.maximum(sz, 1)))
            val = _extend(raw, sz.astype(jnp.int32)) << al
            live = c["in"] & ~bad
            do_write = live & ~is_eobrun & (sz > 0)
            idx = jnp.clip(wpos, 0, 63)
            acc = c["acc"] + jnp.where(
                do_write[:, None] & (lane64 == idx[:, None]),
                val[:, None], 0)
            k = jnp.where(
                live & ~is_eobrun,
                jnp.where(sz > 0, wpos + 1, c["k"] + 16),  # coef / ZRL
                c["k"])
            adv = jnp.where(
                live,
                length + jnp.where(is_eobrun, r.astype(jnp.uint32), sz),
                0)
            eob = jnp.where(live & is_eobrun, new_eob, c["eob"])
            offp = c["off"] + adv
            need = offp >= 32
            loaded = jnp.take(words, jnp.minimum(c["w_idx"], n_words - 1))
            in_next = live & ~is_eobrun & (k <= se)
            return dict(
                cur=jnp.where(need, c["nxt"], c["cur"]),
                nxt=jnp.where(need, loaded, c["nxt"]),
                off=offp - jnp.where(need, 32, 0).astype(jnp.uint32),
                w_idx=c["w_idx"] + need, k=k, acc=acc, eob=eob,
                err=c["err"] | bad, **{"in": in_next})

        ac0 = dict(cur=s["cur"], nxt=s["nxt"], off=s["off"],
                   w_idx=s["w_idx"],
                   k=jnp.full((S,), ss, jnp.int32),
                   acc=jnp.zeros((S, 64), jnp.int32),
                   eob=jnp.zeros((S,), jnp.int32),
                   err=s["err"])
        ac0["in"] = decode
        ac = jax.lax.while_loop(ac_cond, ac_body, ac0)

        # A fresh EOB run covers THIS block too (python: eobrun = n - 1
        # consumed next blocks; here the break happened inside this block).
        eobrun = jnp.where(decode & (ac["eob"] > 0), ac["eob"], eobrun)
        out = jax.lax.dynamic_update_slice(s["out"], ac["acc"][None],
                                           (b, 0, 0))
        return dict(
            cur=ac["cur"], nxt=ac["nxt"], off=ac["off"], w_idx=ac["w_idx"],
            b=b + 1, eobrun=eobrun, out=out, err=ac["err"])

    s = jax.lax.while_loop(cond, body, state)
    out = jnp.take(s["out"].transpose(1, 0, 2), jnp.asarray(ZIGZAG_INV),
                   axis=2)
    return out, s["err"]


@functools.partial(
    jax.jit, static_argnames=("max_blocks", "ss", "se", "al"))
def decode_ac_refine(words, base_bits, nblocks, eobrun0, lut, plane_rows,
                     row_idx, *, max_blocks: int, ss: int, se: int,
                     al: int):
    """AC refinement scan over S lanes, block-lockstep (T.81 G.2.3).

    plane_rows: (n_plane_blocks + 1, 64) int32 CURRENT coefficient rows in
      ZIGZAG order (history decides bit consumption), row n_plane_blocks
      zeros (padding target).
    row_idx: (S, max_blocks) int32 plane row of each lane's block slot
      (n_plane_blocks for padded slots).

    Inner iterations are BATCHED: one correction bit per nonzero-history
    band position would cost up to 63 iterations per block; instead each
    iteration distributes up to 32 window bits across the positions by
    RANK (a cumulative count over the history mask), so a block costs
    ~#symbols + ceil(#correction_bits / 32) iterations — measured ~8x
    fewer for the dense final refinement scans.

    Returns (delta (S, max_blocks, 64) int32 natural order — add to the
    plane, err (S,) bool).  Parity: entropy/progressive._ac_refine_scan.
    """
    S = base_bits.shape[0]
    n_words = words.shape[0]
    lane64 = jax.lax.broadcasted_iota(jnp.int32, (S, 64), 1)
    p1 = 1 << al
    CAP = 32  # correction bits consumed per batched iteration

    w0 = (base_bits >> 5).astype(jnp.int32)
    off0 = (base_bits & 31).astype(jnp.uint32)
    state = dict(
        cur=jnp.take(words, jnp.minimum(w0, n_words - 1)),
        nxt=jnp.take(words, jnp.minimum(w0 + 1, n_words - 1)),
        off=off0, w_idx=w0 + 2,
        b=jnp.int32(0),
        eobrun=eobrun0.astype(jnp.int32),
        out=jnp.zeros((max_blocks, S, 64), jnp.int32),
        err=jnp.zeros((S,), jnp.bool_))

    def cond(s):
        return (s["b"] < max_blocks) & jnp.any(~s["err"] & (s["b"] < nblocks))

    def body(s):
        b = s["b"]
        active = ~s["err"] & (b < nblocks)
        rows = jnp.take(row_idx, b, axis=1)
        cur_vals = jnp.take(plane_rows, rows, axis=0)   # (S, 64) zigzag
        hist_nz = cur_vals != 0
        corr_step = jnp.where(cur_vals > 0, p1, -p1)
        # Python's correct() guards (nz & p1) == 0 — always true on
        # conformant streams; honored exactly for parity.
        guard_ok = (cur_vals & p1) == 0
        in_eob0 = s["eobrun"] > 0

        # Per-event inner loop.  Phases: 0 = symbol probe, 1 = RUN
        # (zero-run walk with batched corrections), 2 = TAIL (batched
        # corrections to band end).
        def ev_cond(c):
            return jnp.any(c["in"])

        def ev_body(c):
            window = _window32(c["cur"], c["nxt"], c["off"])
            live = c["in"]
            sym_phase = live & (c["phase"] == 0)

            # --- SYM: one probe (unchanged semantics)
            entry = jnp.take(lut, (window >> 16).astype(jnp.int32)
                             ).astype(jnp.int32)
            length = (entry & 31).astype(jnp.uint32)
            sym = (entry >> 5) & 0xFF
            r_s = sym >> 4
            sz = sym & 15
            bad = sym_phase & ((entry == 0) | ((sz != 0) & (sz != 1)))
            is_eobrun = (sz == 0) & (r_s < 15)
            ebits = jnp.where(
                r_s == 0, jnp.uint32(0),
                (window << length)
                >> (32 - jnp.maximum(r_s, 1).astype(jnp.uint32)))
            new_eob = (1 << r_s) + jnp.where(
                r_s > 0, ebits, 0).astype(jnp.int32)
            nv_bit = (window << length) >> 31
            newval_s = jnp.where(sz == 1,
                                 jnp.where(nv_bit == 1, p1, -p1), 0)
            sym_adv = length + jnp.where(
                is_eobrun, r_s.astype(jnp.uint32),
                jnp.where(sz == 1, jnp.uint32(1), jnp.uint32(0)))

            # --- RUN / TAIL: batched correction distribution
            pos_phase = live & (c["phase"] != 0)
            is_run = c["phase"] == 1
            valid = (lane64 >= c["k"][:, None]) & (lane64 <= se)
            nzv = valid & hist_nz
            zv = valid & ~hist_nz
            zrank = jnp.cumsum(zv.astype(jnp.int32), axis=1)
            # RUN stop: the (r+1)-th zero-history position (newval site).
            stop = zv & (zrank == (c["r"] + 1)[:, None]) & is_run[:, None]
            has_stop = stop.any(axis=1)
            p_stop = jnp.min(jnp.where(stop, lane64, 64), axis=1)
            # Correctable positions this phase: nonzero-history, before
            # the stop (RUN) or to band end (TAIL).
            lim = jnp.where(is_run & has_stop, p_stop, 64)
            crossed = nzv & (lane64 < lim[:, None])
            crank = jnp.cumsum(crossed.astype(jnp.int32), axis=1) \
                - crossed.astype(jnp.int32)           # 0-based ranks
            n_cross = jnp.sum(crossed.astype(jnp.int32), axis=1)
            take_n = jnp.minimum(n_cross, CAP)
            use = crossed & (crank < take_n[:, None])
            bit = (window[:, None]
                   >> (31 - jnp.minimum(crank, 31)).astype(jnp.uint32)) & 1
            do_corr = pos_phase[:, None] & use & (bit == 1) & guard_ok
            delta = jnp.where(do_corr, corr_step, 0)
            partial = n_cross > CAP
            # Partial chunk: resume after the CAP-th correction.
            j_cut = jnp.min(jnp.where(
                crossed & (crank == (take_n - 1)[:, None]), lane64, 64),
                axis=1)
            k_resume = jnp.minimum(j_cut + 1, 64)
            zeros_used = jnp.sum(
                (zv & (lane64 <= j_cut[:, None])).astype(jnp.int32),
                axis=1)
            # Full chunk outcomes.
            place = is_run & has_stop & (c["newval"] != 0)
            delta = delta + jnp.where(
                (pos_phase & place & ~partial)[:, None]
                & (lane64 == p_stop[:, None]),
                c["newval"][:, None], 0)
            k_full = jnp.where(is_run & has_stop, p_stop + 1, 65)
            acc = c["acc"] + jnp.where(pos_phase[:, None], delta, 0)

            # --- state transitions
            phase = c["phase"]
            k = c["k"]
            r = c["r"]
            nv = c["newval"]
            eob = c["eob"]
            # SYM outcomes
            phase = jnp.where(sym_phase,
                              jnp.where(is_eobrun, 2, 1), phase)
            eob = jnp.where(sym_phase & is_eobrun, new_eob, eob)
            r = jnp.where(sym_phase & ~is_eobrun, r_s, r)
            nv = jnp.where(sym_phase & ~is_eobrun, newval_s, nv)
            # RUN/TAIL outcomes
            k = jnp.where(pos_phase,
                          jnp.where(partial, k_resume, k_full), k)
            r = jnp.where(pos_phase & is_run & partial,
                          r - zeros_used, r)
            phase = jnp.where(pos_phase & ~partial & is_run & has_stop,
                              0, phase)
            blk_done = pos_phase & ~partial & (
                (is_run & (~has_stop | (k_full > se)))
                | (~is_run))
            in_next = live & ~bad & ~blk_done & ~(
                sym_phase & jnp.zeros_like(bad))
            in_next = in_next & ~(pos_phase & ~partial & is_run
                                  & has_stop & (p_stop + 1 > se))

            adv = jnp.where(sym_phase, sym_adv,
                            take_n.astype(jnp.uint32))
            adv = jnp.where(live & ~bad, adv, 0)
            offp = c["off"] + adv
            need = offp >= 32
            loaded = jnp.take(words, jnp.minimum(c["w_idx"], n_words - 1))
            return dict(
                cur=jnp.where(need, c["nxt"], c["cur"]),
                nxt=jnp.where(need, loaded, c["nxt"]),
                off=offp - jnp.where(need, 32, 0).astype(jnp.uint32),
                w_idx=c["w_idx"] + need,
                phase=phase, k=k, r=r, newval=nv, eob=eob, acc=acc,
                err=c["err"] | bad, **{"in": in_next})

        ev0 = dict(cur=s["cur"], nxt=s["nxt"], off=s["off"],
                   w_idx=s["w_idx"],
                   phase=jnp.where(in_eob0, 2, 0).astype(jnp.int32),
                   k=jnp.full((S,), ss, jnp.int32),
                   r=jnp.zeros((S,), jnp.int32),
                   newval=jnp.zeros((S,), jnp.int32),
                   eob=jnp.zeros((S,), jnp.int32),
                   acc=jnp.zeros((S, 64), jnp.int32),
                   err=s["err"])
        ev0["in"] = active
        ev = jax.lax.while_loop(ev_cond, ev_body, ev0)

        eobrun = jnp.where(
            active,
            jnp.where(in_eob0, s["eobrun"] - 1,
                      jnp.maximum(ev["eob"] - 1, 0)),
            s["eobrun"])
        out = jax.lax.dynamic_update_slice(s["out"], ev["acc"][None],
                                           (b, 0, 0))
        return dict(
            cur=ev["cur"], nxt=ev["nxt"], off=ev["off"], w_idx=ev["w_idx"],
            b=b + 1, eobrun=eobrun, out=out, err=ev["err"])

    s = jax.lax.while_loop(cond, body, state)
    out = jnp.take(s["out"].transpose(1, 0, 2), jnp.asarray(ZIGZAG_INV),
                   axis=2)
    return out, s["err"]


@functools.partial(jax.jit, static_argnames=("T", "ss", "se", "al"))
def decode_ac_first_emit(words, base_bits, nblocks, eobrun0, lut, *,
                         T: int, ss: int, se: int, al: int):
    """Emission-style AC-first scan: one symbol per step, and an EOB run
    advances the block counter in ONE step (the lockstep form iterates
    every skipped block slot and pays the max-over-lanes slot skew).
    ``T`` must be >= every lane's total symbol count (the AC skeleton
    counts it exactly; EOB-skipped blocks count zero).

    Returns (pos (T, S) int32 — lane-local ``blk * 64 + natural_index``
    or -1, val (T, S) int32 already ``<< al``, err (S,) bool,
    n_done (S,) int32).  Parity: entropy/progressive._ac_first_scan.
    """
    S = base_bits.shape[0]
    n_words = words.shape[0]
    zig = jnp.asarray(ZIGZAG.astype(np.int32))

    w0 = (base_bits >> 5).astype(jnp.int32)
    off0 = (base_bits & 31).astype(jnp.uint32)
    carry0 = dict(
        cur=jnp.take(words, jnp.minimum(w0, n_words - 1)),
        nxt=jnp.take(words, jnp.minimum(w0 + 1, n_words - 1)),
        off=off0, w_idx=w0 + 2,
        blk=jnp.minimum(eobrun0.astype(jnp.int32), nblocks),
        k=jnp.full((S,), ss, jnp.int32),
        err=jnp.zeros((S,), jnp.bool_))

    def step(c, _):
        active = ~c["err"] & (c["blk"] < nblocks)
        window = _window32(c["cur"], c["nxt"], c["off"])
        entry = jnp.take(lut, (window >> 16).astype(jnp.int32)
                         ).astype(jnp.int32)
        length = (entry & 31).astype(jnp.uint32)
        sym = (entry >> 5) & 0xFF
        bad = (entry == 0) & active
        r = sym >> 4
        sz = (sym & 15).astype(jnp.uint32)
        is_eob = (sz == 0) & (r < 15)
        ebits = jnp.where(
            r == 0, jnp.uint32(0),
            (window << length)
            >> (32 - jnp.maximum(r, 1).astype(jnp.uint32)))
        n_eob = (1 << r) - 1 + jnp.where(r > 0, ebits, 0).astype(
            jnp.int32)
        wpos = c["k"] + r
        overflow = (~is_eob) & (sz > 0) & (wpos > se)
        bad = bad | (overflow & active)
        szc = jnp.minimum(sz, 16)
        raw = jnp.where(
            szc == 0, jnp.uint32(0),
            (window << length) >> (32 - jnp.maximum(szc, 1)))
        val = _extend(raw, szc.astype(jnp.int32)) << al
        live = active & ~bad
        do_write = live & ~is_eob & (sz > 0)
        nat = jnp.take(zig, jnp.clip(wpos, 0, 63))
        pos = jnp.where(do_write, c["blk"] * 64 + nat, -1)

        k1 = jnp.where(is_eob, ss,
                       jnp.where(sz > 0, wpos + 1, c["k"] + 16))
        blk_in = jnp.where(is_eob, c["blk"] + 1 + n_eob, c["blk"])
        end_blk = live & ~is_eob & (k1 > se)
        blk = jnp.where(live, blk_in + end_blk, c["blk"])
        k = jnp.where(live, jnp.where(end_blk | is_eob, ss, k1), c["k"])

        adv = jnp.where(
            live,
            length + jnp.where(is_eob, r.astype(jnp.uint32), szc), 0)
        offp = c["off"] + adv
        need = offp >= 32
        loaded = jnp.take(words, jnp.minimum(c["w_idx"], n_words - 1))
        carry = dict(
            cur=jnp.where(need, c["nxt"], c["cur"]),
            nxt=jnp.where(need, loaded, c["nxt"]),
            off=offp - jnp.where(need, 32, 0).astype(jnp.uint32),
            w_idx=c["w_idx"] + need, blk=blk, k=k,
            err=c["err"] | bad)
        return carry, (pos, jnp.where(do_write, val, 0))

    end, (pos, val) = jax.lax.scan(step, carry0, None, length=T)
    return pos, val, end["err"], jnp.minimum(end["blk"], nblocks)


# ---------------------------------------------------------------------------
# Scan application + whole-frame orchestration
# ---------------------------------------------------------------------------

def _dc_slot_map(hdr, scan, mcu_first, n_per, max_blocks):
    """Per-(lane, slot) plane-row targets for a DC scan.

    Returns ``[(ci, row_tgt (S, max_blocks) int64)]`` per frame component
    in the scan — rows index the component's flat (rows*cols,) block
    grid; out-of-range marks slots belonging to other components or lane
    padding (dropped by the scatter)."""
    comps = hdr.components
    S = len(mcu_first)
    interleaved = len(scan.comp_indices) > 1
    slot = np.arange(max_blocks, dtype=np.int64)[None, :]
    mcu_of = mcu_first[:, None]  # (S, 1)
    out = []
    if not interleaved:
        ci = scan.comp_indices[0]
        rows_u, cols_u = comp_dims_unpadded(hdr, ci)
        plane_cols = hdr.mcus_x * comps[ci].h
        m = mcu_of + slot
        r, c = m // cols_u, m % cols_u
        tgt = r * plane_cols + c
        n_rows = (hdr.mcus_y * comps[ci].v) * plane_cols
        tgt = np.where(slot < n_per[:, None], tgt, n_rows)
        return [(ci, tgt)]
    # Interleaved: slot = t * bpm + j; j -> (ci, v, h) in scan order.
    blocks = [(ci, v, h)
              for ci in scan.comp_indices
              for v in range(comps[ci].v) for h in range(comps[ci].h)]
    bpm = len(blocks)
    t = slot // bpm
    j = slot % bpm
    m = mcu_of + t
    my, mx = m // hdr.mcus_x, m % hdr.mcus_x
    j_ci = np.array([b[0] for b in blocks])
    j_v = np.array([b[1] for b in blocks])
    j_h = np.array([b[2] for b in blocks])
    for ci in sorted(set(scan.comp_indices)):
        c = comps[ci]
        plane_cols = hdr.mcus_x * c.h
        n_rows = (hdr.mcus_y * c.v) * plane_cols
        row = my * c.v + j_v[j]
        col = mx * c.h + j_h[j]
        tgt = row * plane_cols + col
        mine = (j_ci[j] == ci) & (slot < (n_per * bpm)[:, None])
        out.append((ci, np.where(mine, tgt, n_rows)))
    return out


def _ac_slot_map(hdr, scan, mcu_first, n_per, max_blocks):
    """(S, max_blocks) plane-row targets for a single-component AC scan."""
    ci = scan.comp_indices[0]
    c = hdr.components[ci]
    rows_u, cols_u = comp_dims_unpadded(hdr, ci)
    plane_cols = hdr.mcus_x * c.h
    n_rows = (hdr.mcus_y * c.v) * plane_cols
    slot = np.arange(max_blocks, dtype=np.int64)[None, :]
    m = mcu_first[:, None] + slot
    tgt = (m // cols_u) * plane_cols + (m % cols_u)
    return ci, np.where(slot < n_per[:, None], tgt, n_rows), n_rows


def _scan_block_comp(hdr, scan):
    if len(scan.comp_indices) == 1:
        return (0,)
    return tuple(
        k for k, ci in enumerate(scan.comp_indices)
        for _ in range(hdr.components[ci].v * hdr.components[ci].h))


class _MeshHolder:
    """Hashable Mesh wrapper for jit static args (mirror of
    parallel.sharded._MeshHolder; duplicated to avoid a circular
    import)."""

    def __init__(self, mesh):
        self.mesh = mesh

    def __hash__(self):
        return hash((tuple(self.mesh.shape.items()),
                     tuple(d.id for d in self.mesh.devices.flat)))

    def __eq__(self, other):
        return (isinstance(other, _MeshHolder)
                and self.mesh.shape == other.mesh.shape
                and [d.id for d in self.mesh.devices.flat]
                == [d.id for d in other.mesh.devices.flat])


def _emit_global_scatter(plane, pos, val, tgt, max_blocks):
    """Scatter emission-kernel (pos, val) pairs into the flat plane:
    lane-local ``blk * 64 + nat`` maps to plane row ``tgt[lane, blk]``.
    Out-of-range blk (EOB runs past the lane) and pos = -1 drop."""
    S = tgt.shape[0]
    n_total = plane.shape[0] * 64
    blk = pos >> 6
    nat = pos & 63
    lane = jax.lax.broadcasted_iota(jnp.int32, pos.shape, pos.ndim - 1)
    row = jnp.take(tgt.reshape(-1),
                   jnp.clip(lane * max_blocks + blk, 0,
                            S * max_blocks - 1))
    gpos = jnp.where((pos >= 0) & (blk < max_blocks),
                     row * 64 + nat, n_total)
    flat = plane.reshape(-1).at[gpos.reshape(-1)].add(
        val.reshape(-1), mode="drop")
    return flat.reshape(plane.shape)


@functools.partial(
    jax.jit,
    static_argnames=("block_comp", "max_blocks", "al", "first"),
    donate_argnums=(0,))
def _apply_dc_scan(planes_t, words, base_bits, nblocks, pred0, luts2d,
                   tgts_t, *, block_comp, max_blocks, al, first):
    """ONE device program per DC scan — thin wrapper over _chain_step
    (the chain-fused path traces many scans into one program)."""
    planes = list(planes_t)
    m = ("dc", block_comp, max_blocks, al, first,
         tuple(range(len(planes_t))))
    planes, err = _chain_step(
        planes, m, (words, base_bits, nblocks, pred0, luts2d, tgts_t),
        None)
    return tuple(planes), err


@functools.partial(
    jax.jit,
    static_argnames=("block_comp", "max_blocks", "al", "first",
                     "mesh_holder"),
    donate_argnums=(0,))
def _apply_dc_scan_mesh(planes_t, words, base_bits, nblocks, pred0,
                        luts2d, tgts_t, *, block_comp, max_blocks, al,
                        first, mesh_holder):
    """Mesh-sharded DC scan (lanes over all mesh axes, psum column
    reduction) — thin wrapper over _chain_step."""
    planes = list(planes_t)
    m = ("dc", block_comp, max_blocks, al, first,
         tuple(range(len(planes_t))))
    planes, err = _chain_step(
        planes, m, (words, base_bits, nblocks, pred0, luts2d, tgts_t),
        mesh_holder.mesh)
    return tuple(planes), err


@functools.partial(
    jax.jit,
    static_argnames=("max_blocks", "ss", "se", "al", "first", "t_sym"),
    donate_argnums=(0,))
def _apply_ac_scan(plane, words, base_bits, nblocks, eobrun0, lut, tgt,
                   *, max_blocks, ss, se, al, first, t_sym=None):
    """ONE device program per AC scan — thin wrapper over _chain_step."""
    m = ("ac", max_blocks, ss, se, al, first, t_sym, 0)
    planes, err = _chain_step(
        [plane], m, (words, base_bits, nblocks, eobrun0, lut, tgt), None)
    return planes[0], err


@functools.partial(
    jax.jit,
    static_argnames=("max_blocks", "ss", "se", "al", "first",
                     "mesh_holder", "t_sym"),
    donate_argnums=(0,))
def _apply_ac_scan_mesh(plane, words, base_bits, nblocks, eobrun0, lut,
                        tgt, *, max_blocks, ss, se, al, first,
                        mesh_holder, t_sym=None):
    """Mesh-sharded AC scan — thin wrapper over _chain_step."""
    m = ("ac", max_blocks, ss, se, al, first, t_sym, 0)
    planes, err = _chain_step(
        [plane], m, (words, base_bits, nblocks, eobrun0, lut, tgt),
        mesh_holder.mesh)
    return planes[0], err


def apply_scan_device(hdr: FrameHeader, scan: ScanHeader, planes,
                      lanes=None, err_sink: list | None = None,
                      mesh=None):
    """Apply ONE progressive scan to device-resident flat planes.

    ``planes``: list of (n_blocks_c + 1, 64) int32 device arrays in
    NATURAL coefficient order (last row is the scatter-drop pad).
    ``lanes``: optional (base_bits, n_per, mcu_first, eobrun0, pred0)
    overriding the restart-segment lane table (the DRI=0 skeleton path).
    ``err_sink``: when given, the per-lane error flags are APPENDED to it
    as a device array instead of being fetched here — callers check once
    per frame (one host sync instead of one per scan; see
    check_errors()).  ``mesh``: optional jax Mesh — lanes then shard
    over ALL mesh axes under shard_map (planes replicated; disjoint
    partial scatters reduce with one psum).  Returns the updated planes;
    without a sink, raises JPEGError when any lane errors.
    """
    comps = hdr.components
    interleaved = len(scan.comp_indices) > 1
    if scan.ss == 0:
        if interleaved:
            n_mcus = hdr.mcus_x * hdr.mcus_y
        else:
            rows_u, cols_u = comp_dims_unpadded(hdr, scan.comp_indices[0])
            n_mcus = rows_u * cols_u
    else:
        if interleaved:
            raise JPEGError("progressive: AC scans must be single-component")
        rows_u, cols_u = comp_dims_unpadded(hdr, scan.comp_indices[0])
        n_mcus = rows_u * cols_u

    t_sym = None
    if lanes is None:
        base_bits, n_per, mcu_first = segment_lanes(scan, n_mcus)
        S = len(base_bits)
        eobrun0 = np.zeros(S, np.int32)
        pred0 = np.zeros((S, len(scan.comp_indices)), np.int32)
    else:
        base_bits, n_per, mcu_first, eobrun0, pred0 = lanes[:5]
        if len(lanes) > 5:
            t_sym = lanes[5]
        S = len(base_bits)
    if mesh is not None:
        # Pad the lane axis to the mesh size (padded lanes decode
        # nothing; their slot targets drop).
        ms = int(np.prod(list(mesh.shape.values())))
        Sp = -(-max(S, 1) // ms) * ms
        if Sp != S:
            pad = Sp - S
            base_bits = np.concatenate([base_bits, np.zeros(pad, np.int64)])
            n_per = np.concatenate([n_per, np.zeros(pad, n_per.dtype)])
            mcu_first = np.concatenate(
                [mcu_first, np.full(pad, 1 << 40, np.int64)])
            eobrun0 = np.concatenate([eobrun0, np.zeros(pad, np.int32)])
            pred0 = np.concatenate(
                [pred0, np.zeros((pad, pred0.shape[1]), np.int32)])
            S = Sp
    words = jnp.asarray(scan_words(scan))
    block_comp = _scan_block_comp(hdr, scan)
    bpm = len(block_comp)
    max_mcus = int(n_per.max()) if len(n_per) else 0

    if scan.ss == 0:
        max_blocks = max_mcus * bpm
        nblocks = (n_per.astype(np.int64) * bpm).astype(np.int32)
        if scan.ah == 0:
            luts2d = jnp.asarray(np.stack([
                build_lut(scan.dc_specs[scan.dc_table_ids[k]])
                for k in range(len(scan.comp_indices))]))
        else:
            luts2d = jnp.zeros((1, 1), jnp.uint16)  # unused in refine
        slot_map = _dc_slot_map(hdr, scan, mcu_first, n_per, max_blocks)
        cis = [ci for ci, _t in slot_map]
        planes_t = tuple(planes[ci] for ci in cis)
        tgts_t = tuple(jnp.asarray(t) for _ci, t in slot_map)
        kw = dict(block_comp=block_comp, max_blocks=max_blocks,
                  al=scan.al, first=scan.ah == 0)
        if mesh is not None:
            out_t, err = _apply_dc_scan_mesh(
                planes_t, words, jnp.asarray(base_bits),
                jnp.asarray(nblocks), jnp.asarray(pred0), luts2d,
                tgts_t, mesh_holder=_MeshHolder(mesh), **kw)
        else:
            out_t, err = _apply_dc_scan(
                planes_t, words, jnp.asarray(base_bits),
                jnp.asarray(nblocks), jnp.asarray(pred0), luts2d,
                tgts_t, **kw)
        for ci, pl in zip(cis, out_t):
            planes[ci] = pl
    else:
        lut = build_lut(scan.ac_specs[scan.ac_table_ids[0]])
        ci, tgt, n_rows = _ac_slot_map(hdr, scan, mcu_first, n_per,
                                       max_mcus)
        kw = dict(max_blocks=max_mcus, ss=scan.ss, se=scan.se,
                  al=scan.al, first=scan.ah == 0, t_sym=t_sym)
        args = (planes[ci], words, jnp.asarray(base_bits),
                jnp.asarray(n_per.astype(np.int32)),
                jnp.asarray(eobrun0), jnp.asarray(lut),
                jnp.asarray(tgt.astype(np.int32)))
        if mesh is not None:
            planes[ci], err = _apply_ac_scan_mesh(
                *args, mesh_holder=_MeshHolder(mesh), **kw)
        else:
            planes[ci], err = _apply_ac_scan(*args, **kw)
    if err_sink is not None:
        err_sink.append(err)
    elif bool(np.asarray(err).any()):
        raise JPEGError(
            f"device progressive scan failed in lanes "
            f"{np.flatnonzero(np.asarray(err))[:8]}")
    return planes


def check_errors(err_sink: list) -> None:
    """Fetch all deferred per-scan error flags with one device sync;
    raises JPEGError naming the first failing scan."""
    if not err_sink:
        return
    flags = np.asarray(jnp.stack([e.any() for e in err_sink]))
    if flags.any():
        raise JPEGError(
            f"device progressive decode failed in scan(s) "
            f"{np.flatnonzero(flags)[:8].tolist()}")


def decode_progressive_device(hdr: FrameHeader, as_device: bool = False,
                              mesh=None):
    """Decode ALL scans of a progressive frame with device lane kernels.

    Lanes come from restart segments; a DRI=0 scan runs as one lane
    (callers with the native lib use entropy_spec.decode_progressive_hybrid,
    which feeds skeleton lanes instead).  Output matches
    entropy/progressive.decode_progressive bit-exactly: per-component
    (rows_c, cols_c, 64) int32 planes on the padded dense grid.
    """
    planes = []
    shapes = []
    for ci in range(len(hdr.components)):
        rows = hdr.mcus_y * hdr.components[ci].v
        cols = hdr.mcus_x * hdr.components[ci].h
        shapes.append((rows, cols))
        planes.append(jnp.zeros((rows * cols + 1, 64), jnp.int32))
    errs: list = []
    for scan in hdr.scans:
        planes = apply_scan_device(hdr, scan, planes, err_sink=errs,
                                   mesh=mesh)
    check_errors(errs)
    out = [p[:-1].reshape(r, c, 64) for p, (r, c) in zip(planes, shapes)]
    if as_device:
        return out
    return [np.asarray(p) for p in out]


def decode_progressive_hybrid(hdr: FrameHeader, as_device: bool = False,
                              target_lanes: int | None = None,
                              mesh=None):
    """DRI=0 progressive decode with DEVICE lanes from native skeleton
    scans: the host walks each scan position-only (jd_prog_skeleton_*,
    maintaining per-component nonzero bitmaps so refinement bit
    consumption never needs the coefficient planes), and the device
    kernels decode ~``target_lanes`` parallel lanes per scan from the
    recorded (bit, predictor / EOB-run) states.  All coefficient stores
    happen on device; planes never leave HBM.

    Requires the native lib, 8-bit precision and single-segment scans —
    callers fall back to :func:`decode_progressive_device` (segment
    lanes) otherwise.  Output bit-exact vs entropy/progressive.py.
    """
    import os

    from ..entropy import native

    if hdr.precision != 8:
        raise JPEGError("progressive hybrid path is 8-bit only")
    if any(len(s.seg_offsets) != 2 for s in hdr.scans):
        raise JPEGError(
            "progressive hybrid path requires DRI=0 scans "
            "(restart-segmented scans take segment lanes)")
    if target_lanes is None:
        target_lanes = int(os.environ.get("JD_PROG_LANES", "512"))

    n_comps = len(hdr.components)
    shapes = []
    for ci in range(n_comps):
        rows = hdr.mcus_y * hdr.components[ci].v
        cols = hdr.mcus_x * hdr.components[ci].h
        shapes.append((rows, cols))

    # Scans partition into INDEPENDENT chains writing disjoint
    # coefficient sets — all DC scans (k=0 only) and each component's AC
    # scans (its k>=1 band); refinements depend only on earlier scans of
    # the same chain (see entropy/native._scan_chains).  Each chain runs
    # on its own thread with its OWN zero plane accumulators (skeleton
    # walks release the GIL; jax dispatch is thread-safe), so chain B's
    # host skeletons overlap chain A's device programs; the final merge
    # is one exact add per component (disjoint coefficients).
    chains: dict = {}
    for scan in hdr.scans:
        key = "dc" if scan.ss == 0 else ("ac", scan.comp_indices[0])
        chains.setdefault(key, []).append(scan)

    ms = (int(np.prod(list(mesh.shape.values())))
          if mesh is not None else 1)

    def _pad_lanes(base_bits, n_per, mcu_first, eobrun0, pred0):
        S = len(base_bits)
        Sp = -(-max(S, 1) // ms) * ms
        if Sp != S:
            pad = Sp - S
            base_bits = np.concatenate(
                [base_bits, np.zeros(pad, np.int64)])
            n_per = np.concatenate([n_per, np.zeros(pad, n_per.dtype)])
            mcu_first = np.concatenate(
                [mcu_first, np.full(pad, 1 << 40, np.int64)])
            eobrun0 = np.concatenate([eobrun0, np.zeros(pad, np.int32)])
            pred0 = np.concatenate(
                [pred0, np.zeros((pad, pred0.shape[1]), np.int32)])
        return base_bits, n_per, mcu_first, eobrun0, pred0

    def run_chain(scans):
        # Host half: skeleton walks + lane tables + slot maps for EVERY
        # scan of the chain, then ONE fused device program applies them
        # all (per-scan programs paid one link round trip each).
        planes = [jnp.zeros((r * c + 1, 64), jnp.int32)
                  for r, c in shapes]
        nzmaps: dict[int, np.ndarray] = {}
        metas, inputs = [], []
        for scan in scans:
            if scan.ss == 0:
                interleaved = len(scan.comp_indices) > 1
                if interleaved:
                    n_mcus = hdr.mcus_x * hdr.mcus_y
                else:
                    r, c = comp_dims_unpadded(hdr, scan.comp_indices[0])
                    n_mcus = r * c
                if scan.ah == 0:
                    stride = max(1, -(-n_mcus // target_lanes))
                    bits, preds = native.prog_skeleton_dc(hdr, scan,
                                                          stride)
                    lanes = _stride_lanes(bits, stride, n_mcus,
                                          preds=preds)
                else:
                    lanes = segment_lanes(scan, n_mcus) + (
                        np.zeros(1, np.int32),
                        np.zeros((1, len(scan.comp_indices)), np.int32))
                base_bits, n_per, mcu_first, eobrun0, pred0 = \
                    _pad_lanes(*lanes)
                block_comp = _scan_block_comp(hdr, scan)
                bpm = len(block_comp)
                max_mcus = int(n_per.max())
                max_blocks = max_mcus * bpm
                nblocks = (n_per.astype(np.int64) * bpm).astype(np.int32)
                if scan.ah == 0:
                    luts2d = jnp.asarray(np.stack([
                        build_lut(scan.dc_specs[scan.dc_table_ids[k]])
                        for k in range(len(scan.comp_indices))]))
                else:
                    luts2d = jnp.zeros((1, 1), jnp.uint16)
                slot_map = _dc_slot_map(hdr, scan, mcu_first, n_per,
                                        max_blocks)
                cis = tuple(ci for ci, _t in slot_map)
                tgts_t = tuple(jnp.asarray(t) for _ci, t in slot_map)
                metas.append(("dc", block_comp, max_blocks, scan.al,
                              scan.ah == 0, cis))
                inputs.append((jnp.asarray(scan_words(scan)),
                               jnp.asarray(base_bits),
                               jnp.asarray(nblocks),
                               jnp.asarray(pred0), luts2d, tgts_t))
            else:
                ci = scan.comp_indices[0]
                r, c = comp_dims_unpadded(hdr, ci)
                n_blocks = r * c
                nzmap = nzmaps.get(ci)
                if nzmap is None:
                    nzmap = nzmaps.setdefault(
                        ci, np.zeros(n_blocks, np.uint64))
                stride = max(1, -(-n_blocks // target_lanes))
                t_sym = None
                if scan.ah == 0:
                    bits, eob, syms = native.prog_skeleton_ac(
                        hdr, scan, stride, nzmap, want_syms=True)
                    # Exact per-lane trip count for the emission
                    # AC-first kernel (quarter-pow2 bucketed so corpora
                    # compile O(log) variants).
                    cum = np.concatenate(
                        [[0], np.cumsum(syms.astype(np.int64))])
                    edges = np.arange(0, n_blocks, stride)
                    hi = np.minimum(edges + stride, n_blocks)
                    t_sym = int((cum[hi] - cum[edges]).max()) if len(
                        edges) else 1
                    t_sym = _bucket_trip(max(t_sym, 16))
                else:
                    bits, eob = native.prog_skeleton_ac(hdr, scan,
                                                        stride, nzmap)
                lanes = _stride_lanes(bits, stride, n_blocks, eobrun=eob)
                base_bits, n_per, mcu_first, eobrun0, _p0 = \
                    _pad_lanes(*lanes)
                max_mcus = int(n_per.max())
                ci2, tgt, _n_rows = _ac_slot_map(hdr, scan, mcu_first,
                                                 n_per, max_mcus)
                metas.append(("ac", max_mcus, scan.ss, scan.se, scan.al,
                              scan.ah == 0, t_sym, ci2))
                inputs.append((jnp.asarray(scan_words(scan)),
                               jnp.asarray(base_bits),
                               jnp.asarray(n_per.astype(np.int32)),
                               jnp.asarray(eobrun0),
                               jnp.asarray(build_lut(
                                   scan.ac_specs[scan.ac_table_ids[0]])),
                               jnp.asarray(tgt.astype(np.int32))))
        holder = _MeshHolder(mesh) if mesh is not None else None
        if os.environ.get("JD_PROG_FUSE", "1") != "0":
            planes_t, flags = _apply_chain(
                tuple(planes), tuple(inputs), meta=tuple(metas),
                mesh_holder=holder)
            return list(planes_t), [flags]
        # Per-scan programs (A/B reference: JD_PROG_FUSE=0).
        errs = []
        for m, inp in zip(metas, inputs):
            planes, err = _chain_step(planes, m, inp, mesh)
            errs.append(err)
        return planes, errs

    chain_list = list(chains.values())
    # Threaded chains are safe single-process, or multihost only when
    # the programs carry no collectives (mesh is None): under
    # jax.distributed every process must enqueue collective programs in
    # the same order.
    can_thread = len(chain_list) > 1 and (
        mesh is None or jax.process_count() == 1)
    if can_thread:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(4, len(chain_list))) as ex:
            results = list(ex.map(run_chain, chain_list))
    else:
        results = [run_chain(ch) for ch in chain_list]

    errs = [e for _pl, es in results for e in es]
    check_errors(errs)
    planes = list(results[0][0])
    for pl_t, _es in results[1:]:
        planes = [a + b for a, b in zip(planes, pl_t)]

    out = [p[:-1].reshape(r, c, 64) for p, (r, c) in zip(planes, shapes)]
    if as_device:
        return out
    return [np.asarray(p) for p in out]


def _bucket_trip(t: int) -> int:
    """Quarter-pow2 trip-count bucket (see entropy_spec._bucket_T)."""
    t = max(16, int(t))
    step = max(16, 1 << (t.bit_length() - 3))
    return -(-t // step) * step


def _stride_lanes(bits: np.ndarray, stride: int, n_mcus: int, *,
                  preds: np.ndarray | None = None,
                  eobrun: np.ndarray | None = None):
    """Lane table from per-stride skeleton records."""
    L = len(bits)
    n_per = np.full(L, stride, np.int32)
    if L:
        n_per[-1] = n_mcus - stride * (L - 1)
    mcu_first = np.arange(L, dtype=np.int64) * stride
    eob0 = eobrun if eobrun is not None else np.zeros(L, np.int32)
    pred0 = preds if preds is not None else np.zeros((L, 1), np.int32)
    return bits, n_per, mcu_first, eob0, pred0


def decode_progressive_lanes(hdr: FrameHeader, as_device: bool = False,
                             mesh=None):
    """Best available device-lane progressive decode: native skeleton
    lanes when possible, segment lanes otherwise.  With ``mesh``, lanes
    shard over all mesh axes (shard_map + psum plane reduction)."""
    if hdr.precision != 8:
        # The device DC kernels (and the Python oracle) implement the
        # 8-bit size categories; keep non-8-bit progressive on the host
        # path rather than erroring from the kernels.
        from ..entropy import progressive

        planes = progressive.decode_progressive(hdr)
        if as_device:
            return [jnp.asarray(pl) for pl in planes]
        return planes
    if all(len(s.seg_offsets) == 2 for s in hdr.scans):
        try:
            from ..entropy import native

            if native.available():
                return decode_progressive_hybrid(hdr, as_device=as_device,
                                                 mesh=mesh)
        except ImportError:
            pass
    return decode_progressive_device(hdr, as_device=as_device, mesh=mesh)


# ---------------------------------------------------------------------------
# Chain-fused scan application: one device program per independent chain
# ---------------------------------------------------------------------------
#
# On link-attached devices each dispatched program pays round-trip
# overhead that dwarfs these kernels (the 12 MP DC-first kernel measures
# 9.3 ms isolated vs ~10 per-scan programs x ~30-50 ms link cost), so
# the hybrid path traces a WHOLE chain's scans into one jitted program.


def _chain_step(planes, m, inp, mesh):
    """Apply one scan (traced inline) to the planes list.  ``m`` is the
    static descriptor, ``inp`` the dynamic arrays (see
    decode_progressive_hybrid.run_chain)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names) if mesh is not None else ()
    lane = P(axes) if mesh is not None else None
    if m[0] == "dc":
        _, block_comp, max_blocks, al, first, cis = m
        words, base, nblocks, pred0, luts2d, tgts_t = inp
        if mesh is None:
            if first:
                vals, err = decode_dc_first(
                    words, base, nblocks, pred0, luts2d,
                    block_comp=block_comp, max_blocks=max_blocks, al=al)
            else:
                vals = dc_refine_bits(words, base, nblocks, max_blocks,
                                      al)
                err = jnp.zeros(base.shape, jnp.bool_)
            for ci, tgt in zip(cis, tgts_t):
                planes[ci] = planes[ci].at[tgt.reshape(-1), 0].add(
                    vals.reshape(-1), mode="drop")
            return planes, err
        n_rows_t = tuple(planes[ci].shape[0] for ci in cis)

        def local(words_l, base_l, nb_l, pred_l, luts_l, *tgts_l):
            if first:
                vals, err = decode_dc_first(
                    words_l, base_l, nb_l, pred_l, luts_l,
                    block_comp=block_comp, max_blocks=max_blocks, al=al)
            else:
                vals = dc_refine_bits(words_l, base_l, nb_l, max_blocks,
                                      al)
                err = jnp.zeros(base_l.shape, jnp.bool_)
            outs = []
            for tgt_l, n_rows in zip(tgts_l, n_rows_t):
                col = jnp.zeros((n_rows,), jnp.int32).at[
                    tgt_l.reshape(-1)].add(vals.reshape(-1), mode="drop")
                outs.append(jax.lax.psum(col, axes))
            return (*outs, err)

        res = shard_map(
            local, mesh=mesh,
            in_specs=(P(None), lane, lane, P(axes, None), P(None, None),
                      *([P(axes, None)] * len(tgts_t))),
            out_specs=(*([P(None)] * len(tgts_t)), lane),
            check_vma=False,
        )(words, base, nblocks, pred0, luts2d, *tgts_t)
        cols, err = res[:-1], res[-1]
        for ci, col in zip(cis, cols):
            planes[ci] = planes[ci].at[:, 0].add(col)
        return planes, err

    _, max_blocks, ss, se, al, first, t_sym, ci = m
    words, base, nblocks, eob0, lut, tgt = inp
    if mesh is None:
        if first and t_sym is not None:
            pos, val, err, _nd = decode_ac_first_emit(
                words, base, nblocks, eob0, lut,
                T=t_sym, ss=ss, se=se, al=al)
            planes[ci] = _emit_global_scatter(planes[ci], pos, val, tgt,
                                              max_blocks)
            return planes, err
        if first:
            delta, err = decode_ac_first(
                words, base, nblocks, eob0, lut,
                max_blocks=max_blocks, ss=ss, se=se, al=al)
        else:
            zz_rows = jnp.take(planes[ci], jnp.asarray(ZIGZAG), axis=1)
            delta, err = decode_ac_refine(
                words, base, nblocks, eob0, lut, zz_rows, tgt,
                max_blocks=max_blocks, ss=ss, se=se, al=al)
        planes[ci] = planes[ci].at[tgt.reshape(-1)].add(
            delta.reshape(-1, 64), mode="drop")
        return planes, err
    n_rows1 = planes[ci].shape[0]
    zz = (jnp.take(planes[ci], jnp.asarray(ZIGZAG), axis=1)
          if not first else jnp.zeros((1, 64), jnp.int32))

    def local(words_l, base_l, nb_l, eob_l, lut_l, zz_l, tgt_l):
        if first and t_sym is not None:
            pos, val, err, _nd = decode_ac_first_emit(
                words_l, base_l, nb_l, eob_l, lut_l,
                T=t_sym, ss=ss, se=se, al=al)
            part = _emit_global_scatter(
                jnp.zeros((n_rows1, 64), jnp.int32), pos, val, tgt_l,
                max_blocks)
            return jax.lax.psum(part, axes), err
        if first:
            delta, err = decode_ac_first(
                words_l, base_l, nb_l, eob_l, lut_l,
                max_blocks=max_blocks, ss=ss, se=se, al=al)
        else:
            delta, err = decode_ac_refine(
                words_l, base_l, nb_l, eob_l, lut_l, zz_l, tgt_l,
                max_blocks=max_blocks, ss=ss, se=se, al=al)
        part = jnp.zeros((n_rows1, 64), jnp.int32).at[
            tgt_l.reshape(-1)].add(delta.reshape(-1, 64), mode="drop")
        return jax.lax.psum(part, axes), err

    part, err = shard_map(
        local, mesh=mesh,
        in_specs=(P(None), lane, lane, lane, P(None), P(None, None),
                  P(axes, None)),
        out_specs=(P(None, None), lane),
        check_vma=False,
    )(words, base, nblocks, eob0, lut, zz, tgt)
    planes[ci] = planes[ci] + part
    return planes, err


@functools.partial(
    jax.jit, static_argnames=("meta", "mesh_holder"), donate_argnums=(0,))
def _apply_chain(planes_t, scan_inputs, *, meta, mesh_holder=None):
    """ONE device program for a whole chain of scans (traced in order);
    returns (planes, per-scan any-err flags)."""
    planes = list(planes_t)
    flags = []
    mesh = mesh_holder.mesh if mesh_holder is not None else None
    for m, inp in zip(meta, scan_inputs):
        planes, err = _chain_step(planes, m, inp, mesh)
        flags.append(err.any())
    return tuple(planes), jnp.stack(flags)
