"""ctypes wrapper for the native C++ entropy decoder.

Compiles ``native_src/jpeg_entropy.cpp`` on first use (cached in
``.cache/native`` next to the repo root, keyed by source mtime) and exposes
:func:`decode_scan_baseline` with the exact same signature/semantics as
:func:`jpeg_decoder_tpu.entropy.python_ref.decode_scan_baseline` — the
backends are swappable at the coefficient-plane boundary.

The C call releases the GIL, so Python-level thread pools give image-level
parallelism on top of the in-call segment parallelism.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NCPU = os.cpu_count() or 1

from ..huffman import build_ac_lut32, build_lut
from ..layout import scan_layout
from ..types import FrameHeader, JPEGError, ScanHeader

_SRC = os.path.join(os.path.dirname(__file__), "native_src", "jpeg_entropy.cpp")
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".cache", "native")
_LIB_PATH = os.path.join(_CACHE, "libjpeg_entropy.so")

_lib = None
_lib_lock = threading.Lock()
_lut16_cache: dict[int, np.ndarray] = {}
_lut32_cache: dict[int, np.ndarray] = {}


def _compile() -> str:
    os.makedirs(_CACHE, exist_ok=True)
    if (os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return _LIB_PATH
    tmp = _LIB_PATH + f".tmp{os.getpid()}"
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
         "-o", tmp, _SRC],
        check=True, capture_output=True,
    )
    os.replace(tmp, _LIB_PATH)
    return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        lib = ctypes.CDLL(_compile())
        lib.jd_abi_version.restype = ctypes.c_int32
        if lib.jd_abi_version() != 22:
            raise RuntimeError("jpeg_entropy ABI mismatch")
        lib.jd_prog_skeleton_dc.restype = ctypes.c_int64
        lib.jd_prog_skeleton_dc.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,  # data,start,len
            ctypes.c_int32,                                   # n_scan_comps
            ctypes.c_void_p, ctypes.c_void_p,                 # comp_h, comp_v
            ctypes.c_void_p, ctypes.c_int32,                  # dc_luts, il
            ctypes.c_int64, ctypes.c_int64,                   # n_mcus, stride
            ctypes.c_void_p, ctypes.c_void_p,                 # bits, preds
        ]
        lib.jd_prog_skeleton_ac.restype = ctypes.c_int64
        lib.jd_prog_skeleton_ac.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,  # data,start,len
            ctypes.c_int32,                                   # first
            ctypes.c_int32, ctypes.c_int32,                   # ss, se
            ctypes.c_void_p, ctypes.c_void_p,                 # ac_lut, nzmap
            ctypes.c_int64, ctypes.c_int64,                   # n_blocks,stride
            ctypes.c_void_p, ctypes.c_void_p,                 # bits, eobrun
            ctypes.c_void_p,                                  # syms
        ]
        lib.jd_prog_dc_scan_arith.restype = ctypes.c_int64
        lib.jd_prog_dc_scan_arith.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,  # data,segs,n
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,    # first,al,il
            ctypes.c_int32,                                    # n_scan_comps
            ctypes.c_void_p, ctypes.c_void_p,                  # comp_h/v
            ctypes.c_void_p, ctypes.c_void_p,                  # planes, cols
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # tid, l, u
            ctypes.c_int64, ctypes.c_int64,                    # mcus_x/y
            ctypes.c_int64, ctypes.c_int64,                    # sc_rows/cols
            ctypes.c_int64, ctypes.c_int32,                    # restart, nthr
        ]
        lib.jd_prog_ac_scan_arith.restype = ctypes.c_int64
        lib.jd_prog_ac_scan_arith.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,                    # ss, se
            ctypes.c_int32, ctypes.c_int32,                    # ah, al
            ctypes.c_void_p, ctypes.c_int32,                   # plane, cols
            ctypes.c_int32, ctypes.c_int32,                    # ac_tid, kx
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,    # rows,cols,ri
            ctypes.c_int32,                                    # n_threads
        ]
        lib.jd_decode_scan_arith.restype = ctypes.c_int64
        lib.jd_decode_scan_arith.argtypes = [
            ctypes.c_void_p,                    # data
            ctypes.c_void_p, ctypes.c_int32,    # seg_offsets, n_segments
            ctypes.c_int32,                     # n_comps
            ctypes.c_void_p, ctypes.c_void_p,   # h, v
            ctypes.c_void_p, ctypes.c_void_p,   # dc_tid, ac_tid
            ctypes.c_void_p, ctypes.c_void_p,   # dc_l, dc_u
            ctypes.c_void_p,                    # ac_kx
            ctypes.c_int64, ctypes.c_int64,     # n_mcus, restart_interval
            ctypes.c_void_p, ctypes.c_int32,    # out, n_threads
        ]
        lib.jd_decode_scan.restype = ctypes.c_int64
        lib.jd_decode_scan.argtypes = [
            ctypes.c_void_p,                    # data
            ctypes.c_void_p, ctypes.c_int32,    # seg_offsets, n_segments
            ctypes.c_int32,                     # n_comps
            ctypes.c_void_p, ctypes.c_void_p,   # h, v
            ctypes.c_void_p, ctypes.c_void_p,   # dc_luts, ac_luts (ptr arrays)
            ctypes.c_int64, ctypes.c_int64,     # n_mcus, restart_interval
            ctypes.c_void_p, ctypes.c_int32,    # out, n_threads
            ctypes.c_int32,                     # precision
        ]
        lib.jd_decode_scan_resilient.restype = ctypes.c_int64
        lib.jd_decode_scan_resilient.argtypes = [
            ctypes.c_void_p,                    # data
            ctypes.c_void_p, ctypes.c_int32,    # seg_offsets, n_segments
            ctypes.c_int32,                     # n_comps
            ctypes.c_void_p, ctypes.c_void_p,   # h, v
            ctypes.c_void_p, ctypes.c_void_p,   # dc_luts, ac_luts
            ctypes.c_int64, ctypes.c_int64,     # n_mcus, restart_interval
            ctypes.c_void_p, ctypes.c_void_p,   # out, seg_err
            ctypes.c_int32, ctypes.c_int32,     # n_threads, precision
        ]
        lib.jd_decode_scan_speculative.restype = ctypes.c_int64
        lib.jd_decode_scan_speculative.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,    # data, data_len
            ctypes.c_int32,                     # n_comps
            ctypes.c_void_p, ctypes.c_void_p,   # h, v
            ctypes.c_void_p, ctypes.c_void_p,   # dc_luts, ac_luts
            ctypes.c_int64,                     # n_mcus
            ctypes.c_void_p, ctypes.c_int32,    # out, n_threads
            ctypes.c_int32,                     # n_chunks
        ]
        lib.jd_emit_prep.restype = ctypes.c_int64
        lib.jd_emit_prep.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,    # data, data_len
            ctypes.c_void_p, ctypes.c_int32,    # seg_offsets, n_segments
            ctypes.c_int32,                     # n_comps
            ctypes.c_void_p, ctypes.c_void_p,   # h, v
            ctypes.c_void_p, ctypes.c_void_p,   # dc_luts, ac_luts
            ctypes.c_int64, ctypes.c_int64,     # n_mcus, restart_interval
            ctypes.c_int32, ctypes.c_int32,     # precision, max_chunks
            ctypes.c_int32, ctypes.c_int32,     # cap_factor, target_steps
            ctypes.c_void_p, ctypes.c_void_p,   # scratch bits, syms
            ctypes.c_void_p,                    # scratch pairs
            ctypes.c_void_p, ctypes.c_void_p,   # out_m_lo, out_nm
            ctypes.c_void_p,                    # out_starts
            ctypes.c_void_p, ctypes.c_void_p,   # out_T_sym, out_T_pair
            ctypes.c_void_p, ctypes.c_int32,    # out_L, n_threads
        ]
        lib.jd_skeleton_scan.restype = ctypes.c_int64
        lib.jd_skeleton_scan.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,    # data, data_len
            ctypes.c_int32,                     # n_comps
            ctypes.c_void_p, ctypes.c_void_p,   # h, v
            ctypes.c_void_p, ctypes.c_void_p,   # dc_luts, ac_luts
            ctypes.c_int64, ctypes.c_int64,     # n_mcus, stride
            ctypes.c_void_p, ctypes.c_void_p,   # out_bits, out_syms
            ctypes.c_void_p, ctypes.c_int32,    # out_pairs, precision
        ]
        lib.jd_prog_dc_scan.restype = ctypes.c_int64
        lib.jd_prog_dc_scan.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,  # data, segs, n
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,    # first, al, il
            ctypes.c_int32,                                    # n_scan_comps
            ctypes.c_void_p, ctypes.c_void_p,                  # comp_h, comp_v
            ctypes.c_void_p, ctypes.c_void_p,                  # planes, cols
            ctypes.c_void_p,                                   # dc_luts
            ctypes.c_int64, ctypes.c_int64,                    # mcus_x, mcus_y
            ctypes.c_int64, ctypes.c_int64,                    # sc_rows, sc_cols
            ctypes.c_int64, ctypes.c_int32,                    # restart, nthr
        ]
        lib.jd_prog_ac_scan.restype = ctypes.c_int64
        lib.jd_prog_ac_scan.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int32,                   # plane, cols
            ctypes.c_void_p,                                   # ac_lut
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,    # rows, cols, ri
            ctypes.c_int32,                                    # n_threads
        ]
        lib.jd_decode_scan_packed.restype = ctypes.c_int64
        lib.jd_decode_scan_packed.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,   # dc_out, ac_out
            ctypes.c_void_p, ctypes.c_void_p,   # esc_idx, esc_val
            ctypes.c_int64, ctypes.c_void_p,    # esc_cap, esc_count
            ctypes.c_int32,                     # n_threads
        ]
        lib.jd_unstuff.restype = ctypes.c_int64
        lib.jd_unstuff.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,    # data, len
            ctypes.c_void_p, ctypes.c_void_p,   # out, out_len
            ctypes.c_void_p, ctypes.c_int64,    # seg_offsets, seg_cap
            ctypes.c_void_p,                    # n_segs
        ]
        lib.jd_decode_scan_nibble.restype = ctypes.c_int64
        lib.jd_decode_scan_nibble.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p,                    # dc_out
            ctypes.c_void_p, ctypes.c_int64,    # entry_out, entry_cap
            ctypes.c_void_p,                    # entry_count
            ctypes.c_void_p, ctypes.c_int64,    # ov_out, ov_cap
            ctypes.c_void_p,                    # ov_count
            ctypes.c_void_p, ctypes.c_void_p,   # esc_idx, esc_val
            ctypes.c_int64, ctypes.c_void_p,    # esc_cap, esc_count
            ctypes.c_int32,                     # n_threads
        ]
        lib.jd_decode_scan_slots.restype = ctypes.c_int64
        lib.jd_decode_scan_slots.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p,                    # dc_out
            ctypes.c_void_p, ctypes.c_void_p,   # pos_out, val_out
            ctypes.c_int32,                     # cap
            ctypes.c_void_p, ctypes.c_void_p,   # ov_idx, ov_val
            ctypes.c_int64, ctypes.c_void_p,    # ov_cap, ov_count
            ctypes.c_void_p, ctypes.c_void_p,   # esc_idx, esc_val
            ctypes.c_int64, ctypes.c_void_p,    # esc_cap, esc_count
            ctypes.c_int32,                     # n_threads
        ]
        lib.jd_decode_scan_sparse.restype = ctypes.c_int64
        lib.jd_decode_scan_sparse.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p,                    # dc_out
            ctypes.c_void_p, ctypes.c_void_p,   # gap_out, val_out
            ctypes.c_int64, ctypes.c_void_p,    # sparse_cap, sparse_count
            ctypes.c_void_p, ctypes.c_void_p,   # esc_idx, esc_val
            ctypes.c_int64, ctypes.c_void_p,    # esc_cap, esc_count
            ctypes.c_int32,                     # n_threads
        ]
        _lib = lib
    return _lib


def _lut16(spec) -> np.ndarray:
    """int16 LUT entry (sym<<5)|len: max (255<<5)|31 = 8191 < 2^15.

    Layout (ABI 21): 65536 entries + a 4096-entry FIRST-LEVEL table
    (entry i resolves codes of <= 12 bits, 0 = fall back to the full
    probe).  The 8 KB first level stays L1-resident — the serially-
    dependent probe chain is load-latency-bound, and nearly all real
    Huffman codes fit 12 bits."""
    key = (spec.counts.tobytes(), spec.symbols.tobytes())
    lut = _lut16_cache.get(key)
    if lut is None:
        big = build_lut(spec).astype(np.int16)
        cand = big[::16].copy()                 # big[i << 4]
        lens = cand & 31
        small = np.where((lens > 0) & (lens <= 12), cand, 0)
        lut = np.ascontiguousarray(
            np.concatenate([big, small.astype(np.int16)]))
        _lut16_cache[key] = lut
    return lut


def _lut32ac(spec) -> np.ndarray:
    """Combined-value int32 AC LUT (huffman.build_ac_lut32), cached,
    with the same appended 4096-entry first level as :func:`_lut16`
    (fast entries need code+value <= 12 bits; slow entries need only the
    code to fit — the symbol is then already resolved)."""
    key = (spec.counts.tobytes(), spec.symbols.tobytes())
    lut = _lut32_cache.get(key)
    if lut is None:
        big = np.ascontiguousarray(build_ac_lut32(spec))
        cand = big[::16].copy()
        bits = cand & 31                        # total (fast) / len (slow)
        ok = (cand != 0) & (bits <= 12)
        small = np.where(ok, cand, 0)
        lut = np.ascontiguousarray(
            np.concatenate([big, small.astype(np.int32)]))
        _lut32_cache[key] = lut
    return lut


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _padded(scan) -> np.ndarray:
    """Entropy bytes with the 256-byte zero tail the decoders require.

    Uses the parser-provided pre-padded buffer only when it still aliases
    ``scan.data`` (callers may replace ``data`` — e.g. tests corrupting
    streams — without updating ``data_padded``)."""
    d = scan.data
    dp = getattr(scan, "data_padded", None)
    if (dp is not None and len(dp) == len(d) + 256
            and dp.__array_interface__["data"][0]
            == d.__array_interface__["data"][0]):
        return dp
    return np.concatenate([d, np.zeros(256, np.uint8)])


class _ScanCall:
    """Shared native-call setup for full-frame scan wrappers: padded data,
    validated segment table, sampling arrays, and LUT pointer arrays (the
    LUT ndarrays are kept alive on the instance for the ctypes call)."""

    def __init__(self, hdr: FrameHeader, scan: ScanHeader,
                 allow12: bool = False):
        # jd_decode_scan supports precision-12 frames (T.81 B.2.2 size
        # categories 15/14); the wire-format emitters stay 8-bit.
        if hdr.precision != 8 and not (allow12 and hdr.precision == 12):
            raise JPEGError(
                "this native entry point decodes 8-bit frames only")
        self.lay = scan_layout(hdr)
        comps = hdr.components
        self.data = _padded(scan)
        self.seg_offsets = np.ascontiguousarray(scan.seg_offsets,
                                                dtype=np.int64)
        self.n_segments = len(self.seg_offsets) - 1
        self.ri = scan.restart_interval
        expected = -(-self.lay.n_mcus // self.ri) if self.ri else 1
        if self.n_segments != expected:
            raise JPEGError(
                f"restart-segment count {self.n_segments} does not match "
                f"DRI {self.ri}")
        self.h = np.array([c.h for c in comps], np.int32)
        self.v = np.array([c.v for c in comps], np.int32)
        self.dc_luts = [_lut16(scan.dc_specs[c.td]) for c in comps]
        self.ac_luts = [_lut32ac(scan.ac_specs[c.ta]) for c in comps]
        PtrArray = ctypes.c_void_p * len(comps)
        self.dc_ptrs = PtrArray(*[a.ctypes.data for a in self.dc_luts])
        self.ac_ptrs = PtrArray(*[a.ctypes.data for a in self.ac_luts])
        self.n_comps = len(comps)

    def threads(self, n_threads):
        if n_threads is not None:
            return n_threads
        return min(_NCPU, max(1, self.n_segments))

    def head_args(self):
        """The common leading argument tuple of the jd_decode_scan_*
        C functions."""
        return (self.data.ctypes.data, self.seg_offsets.ctypes.data,
                self.n_segments, self.n_comps,
                self.h.ctypes.data, self.v.ctypes.data,
                self.dc_ptrs, self.ac_ptrs,
                self.lay.n_mcus, self.ri)


def decode_scan_baseline(hdr: FrameHeader, scan: ScanHeader,
                         n_threads: int | None = None) -> np.ndarray:
    """Decode a full baseline interleaved scan (native backend).

    Returns (total_blocks, 64) int32 scan-order natural-layout coefficients,
    identical to the python_ref backend (asserted by tests/test_entropy.py).
    """
    lib = _load()
    st = _ScanCall(hdr, scan, allow12=True)
    lay = st.lay

    out = np.zeros((lay.total_blocks, 64), dtype=np.int32)
    rc = lib.jd_decode_scan(
        *st.head_args(), out.ctypes.data, st.threads(n_threads),
        hdr.precision,
    )
    if rc != 0:
        raise JPEGError(
            f"native entropy decode failed: segment {rc >> 8}, "
            f"error code {rc & 0xFF}")
    return out


def decode_scan_resilient(hdr: FrameHeader, scan: ScanHeader,
                          n_threads: int | None = None) -> np.ndarray:
    """Best-effort decode of a scan whose restart-segment count disagrees
    with DRI or whose segments are corrupt (native mirror of
    python_ref.decode_scan_resilient — identical output, asserted by
    tests/test_fuzz.py).  Segment-threaded: a corrupt stream in a serving
    batch costs the same as a clean one, not a ~100x Python fallback
    (VERDICT r2 item 6)."""
    lib = _load()
    if hdr.precision not in (8, 12):
        raise JPEGError(f"unsupported precision {hdr.precision}")
    lay = scan_layout(hdr)
    comps = hdr.components
    # Big zero tail: garbage speculation near a segment end may overrun by
    # up to one MCU (~bpm * 209 bytes) before the per-MCU bound check
    # fires; the Python reader clamps reads to zeros, so the pad makes the
    # native reader see the same zero bits.
    data = np.concatenate([scan.data, np.zeros(16384, np.uint8)])
    seg_offsets = np.ascontiguousarray(scan.seg_offsets, dtype=np.int64)
    n_segments = len(seg_offsets) - 1
    h = np.array([c.h for c in comps], np.int32)
    v = np.array([c.v for c in comps], np.int32)
    dc_luts = [_lut16(scan.dc_specs[c.td]) for c in comps]
    ac_luts = [_lut32ac(scan.ac_specs[c.ta]) for c in comps]
    PtrArray = ctypes.c_void_p * len(comps)
    dc_ptrs = PtrArray(*[a.ctypes.data for a in dc_luts])
    ac_ptrs = PtrArray(*[a.ctypes.data for a in ac_luts])
    out = np.zeros((lay.total_blocks, 64), dtype=np.int32)
    seg_err = np.zeros(max(1, n_segments), np.uint8)
    if n_threads is None:
        n_threads = min(_NCPU, max(1, n_segments))
    rc = lib.jd_decode_scan_resilient(
        data.ctypes.data, seg_offsets.ctypes.data, n_segments,
        len(comps), h.ctypes.data, v.ctypes.data, dc_ptrs, ac_ptrs,
        lay.n_mcus, scan.restart_interval, out.ctypes.data,
        seg_err.ctypes.data, n_threads, hdr.precision)
    if rc != 0:
        raise JPEGError(f"native resilient decode failed (code {rc})")
    return out


def decode_scan_arith(hdr: FrameHeader, scan: ScanHeader,
                      n_threads: int | None = None) -> np.ndarray:
    """Decode a sequential arithmetic (SOF9) interleaved scan natively.

    Returns (total_blocks, 64) int32 scan-order natural-layout
    coefficients, identical to entropy.arith.decode_scan_baseline
    (asserted by tests/test_arith.py)."""
    lib = _load()
    lay = scan_layout(hdr)
    comps = hdr.components
    data = _padded(scan)
    seg_offsets = np.ascontiguousarray(scan.seg_offsets, dtype=np.int64)
    n_segments = len(seg_offsets) - 1
    ri = scan.restart_interval
    expected = -(-lay.n_mcus // ri) if ri else 1
    if n_segments != expected:
        raise JPEGError(
            f"restart-segment count {n_segments} does not match DRI {ri}")
    h = np.array([c.h for c in comps], np.int32)
    v = np.array([c.v for c in comps], np.int32)
    s0 = scan
    dc_tid = np.zeros(len(comps), np.int32)
    ac_tid = np.zeros(len(comps), np.int32)
    for k, ci in enumerate(s0.comp_indices):
        dc_tid[ci] = s0.dc_table_ids[k]
        ac_tid[ci] = s0.ac_table_ids[k]
    dc_cond = getattr(s0, "dc_cond", None) or {}
    ac_cond = getattr(s0, "ac_cond", None) or {}
    dc_l = np.zeros(4, np.int32)
    dc_u = np.ones(4, np.int32)
    ac_kx = np.full(4, 5, np.int32)
    for tid, (lp, up) in dc_cond.items():
        dc_l[tid], dc_u[tid] = lp, up
    for tid, kx in ac_cond.items():
        ac_kx[tid] = kx
    out = np.zeros((lay.total_blocks, 64), dtype=np.int32)
    if n_threads is None:
        n_threads = min(_NCPU, max(1, n_segments))
    rc = lib.jd_decode_scan_arith(
        data.ctypes.data, seg_offsets.ctypes.data, n_segments, len(comps),
        h.ctypes.data, v.ctypes.data,
        dc_tid.ctypes.data, ac_tid.ctypes.data,
        dc_l.ctypes.data, dc_u.ctypes.data, ac_kx.ctypes.data,
        lay.n_mcus, ri, out.ctypes.data, n_threads)
    if rc != 0:
        raise JPEGError(
            f"native arithmetic decode failed: segment {rc >> 8}, "
            f"error code {rc & 0xFF}")
    return out


def decode_progressive_arith(hdr: FrameHeader) -> list:
    """Native fast path for progressive ARITHMETIC frames (SOF10, T.81
    G.3): per-scan C++ decoders mutate caller-owned planes.  Output
    identical to entropy.arith._decode_progressive (tests/test_arith.py).
    """
    from ..layout import comp_dims_unpadded

    lib = _load()
    planes = []
    for ci in range(len(hdr.components)):
        rows = hdr.mcus_y * hdr.components[ci].v
        cols = hdr.mcus_x * hdr.components[ci].h
        planes.append(np.zeros((rows, cols, 64), np.int32))

    def run_scan(scan):
        data = _padded(scan)
        seg_offsets = np.ascontiguousarray(scan.seg_offsets, np.int64)
        n_segments = len(seg_offsets) - 1
        ri = scan.restart_interval
        first = 1 if scan.ah == 0 else 0
        n_threads = min(_NCPU, max(1, n_segments))
        dc_cond = getattr(scan, "dc_cond", None) or {}
        ac_cond = getattr(scan, "ac_cond", None) or {}
        dc_l = np.zeros(4, np.int32)
        dc_u = np.ones(4, np.int32)
        for tid, (lp, up) in dc_cond.items():
            dc_l[tid], dc_u[tid] = lp, up
        if scan.ss == 0:
            if scan.se != 0:
                raise JPEGError("progressive: DC scan must have Se=0")
            nsc = len(scan.comp_indices)
            interleaved = 1 if nsc > 1 else 0
            comps = [hdr.components[ci] for ci in scan.comp_indices]
            comp_h = np.array([c.h for c in comps], np.int32)
            comp_v = np.array([c.v for c in comps], np.int32)
            plane_ptrs = (ctypes.c_void_p * nsc)(
                *[planes[ci].ctypes.data for ci in scan.comp_indices])
            plane_cols = np.array(
                [planes[ci].shape[1] for ci in scan.comp_indices], np.int32)
            dc_tid = np.array(scan.dc_table_ids, np.int32)
            if interleaved:
                sc_rows = sc_cols = 0
            else:
                sc_rows, sc_cols = comp_dims_unpadded(
                    hdr, scan.comp_indices[0])
            rc = lib.jd_prog_dc_scan_arith(
                data.ctypes.data, seg_offsets.ctypes.data, n_segments,
                first, scan.al, interleaved, nsc,
                comp_h.ctypes.data, comp_v.ctypes.data,
                plane_ptrs, plane_cols.ctypes.data,
                dc_tid.ctypes.data, dc_l.ctypes.data, dc_u.ctypes.data,
                hdr.mcus_x, hdr.mcus_y, sc_rows, sc_cols, ri, n_threads)
        else:
            if len(scan.comp_indices) != 1:
                raise JPEGError(
                    "progressive: AC scans must be single-component")
            ci = scan.comp_indices[0]
            rows, cols = comp_dims_unpadded(hdr, ci)
            tid = scan.ac_table_ids[0]
            kx = ac_cond.get(tid, 5)
            rc = lib.jd_prog_ac_scan_arith(
                data.ctypes.data, seg_offsets.ctypes.data, n_segments,
                scan.ss, scan.se, scan.ah, scan.al,
                planes[ci].ctypes.data, planes[ci].shape[1],
                tid, kx, rows, cols, ri, n_threads)
        if rc != 0:
            raise JPEGError(
                f"native arithmetic progressive scan failed (code {rc})")

    chains = _scan_chains(hdr)

    def run_chain(scans):
        for scan in scans:
            run_scan(scan)

    if len(chains) > 1 and _NCPU > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(_NCPU * 2, len(chains))) as ex:
            list(ex.map(run_chain, chains))
    else:
        for scans in chains:
            run_chain(scans)
    return planes


def decode_scan_speculative(hdr: FrameHeader, scan: ScanHeader,
                            n_threads: int | None = None,
                            n_chunks: int | None = None) -> np.ndarray:
    """Speculative self-synchronizing parallel decode of a DRI=0 stream
    (see jpeg_entropy.cpp for the algorithm).  Output identical to
    decode_scan_baseline; raises JPEGError on malformed streams."""
    lib = _load()
    lay = scan_layout(hdr)
    comps = hdr.components
    if len(scan.seg_offsets) != 2:
        raise JPEGError("speculative decode requires a single-segment scan")
    data = _padded(scan)
    h = np.array([c.h for c in comps], np.int32)
    v = np.array([c.v for c in comps], np.int32)
    dc_luts = [_lut16(scan.dc_specs[c.td]) for c in comps]
    ac_luts = [_lut32ac(scan.ac_specs[c.ta]) for c in comps]
    PtrArray = ctypes.c_void_p * len(comps)
    dc_ptrs = PtrArray(*[a.ctypes.data for a in dc_luts])
    ac_ptrs = PtrArray(*[a.ctypes.data for a in ac_luts])
    out = np.zeros((lay.total_blocks, 64), dtype=np.int32)
    if n_threads is None:
        n_threads = _NCPU
    if n_chunks is None:
        n_chunks = max(1, n_threads * 4)
    rc = lib.jd_decode_scan_speculative(
        data.ctypes.data, len(scan.data),
        len(comps), h.ctypes.data, v.ctypes.data,
        dc_ptrs, ac_ptrs, lay.n_mcus,
        out.ctypes.data, n_threads, n_chunks)
    if rc != 0:
        raise JPEGError(f"speculative entropy decode failed (code {rc})")
    return out


def skeleton_scan(hdr: FrameHeader, scan: ScanHeader,
                  stride: int, want_syms: bool = False):
    """Position-only Huffman pass over a DRI=0 interleaved baseline scan.

    Decodes every symbol (exact lengths) but stores nothing; returns the
    absolute start BIT of every ``stride``-th MCU as a
    (ceil(n_mcus / stride),) int64 array; with ``want_syms`` also the
    per-MCU Huffman symbol (probe) count as an int32 array — the exact
    per-lane trip counts for the emission kernel.  The host half of the hybrid
    device decode (ops.entropy_spec.prepare_hybrid_batch): device lanes
    then extract coefficients from TRUE MCU starts, with none of the
    speculative path's overflow-window or chunk-skew overheads.
    Raises JPEGError on malformed streams (callers fall back)."""
    lib = _load()
    lay = scan_layout(hdr)
    comps = hdr.components
    if len(scan.seg_offsets) != 2:
        raise JPEGError("skeleton scan requires a single-segment scan")
    if hdr.precision not in (8, 12):
        raise JPEGError(f"unsupported precision {hdr.precision}")
    data = _padded(scan)
    h = np.array([c.h for c in comps], np.int32)
    v = np.array([c.v for c in comps], np.int32)
    dc_luts = [_lut16(scan.dc_specs[c.td]) for c in comps]
    ac_luts = [_lut32ac(scan.ac_specs[c.ta]) for c in comps]
    PtrArray = ctypes.c_void_p * len(comps)
    dc_ptrs = PtrArray(*[a.ctypes.data for a in dc_luts])
    ac_ptrs = PtrArray(*[a.ctypes.data for a in ac_luts])
    n_out = -(-lay.n_mcus // stride)
    out = np.zeros(n_out, dtype=np.int64)
    syms = np.zeros(lay.n_mcus, dtype=np.int32) if want_syms else None
    rc = lib.jd_skeleton_scan(
        data.ctypes.data, len(scan.data),
        len(comps), h.ctypes.data, v.ctypes.data,
        dc_ptrs, ac_ptrs, lay.n_mcus, stride, out.ctypes.data,
        syms.ctypes.data if want_syms else None, None, hdr.precision)
    if rc != 0:
        raise JPEGError(f"skeleton scan failed (code {rc})")
    return (out, syms) if want_syms else out


def skeleton_scan_segments(hdr: FrameHeader, scan: ScanHeader):
    """Per-segment skeleton scan of a (possibly restart-segmented)
    baseline scan: the position-only Huffman pass runs independently per
    RSTn segment (DC resets + byte alignment make segments independent,
    jpeg.cpp:419-425), recording EVERY MCU's absolute start bit within
    ``scan.data`` and its Huffman symbol (probe) count.

    Returns (bits (n_mcus,) int64, syms (n_mcus,) int32,
    pairs (n_mcus,) int32 — the paired emission kernel's per-MCU step
    count, see ops.entropy_flat.decode_emit2).
    Raises JPEGError on malformed streams (callers fall back)."""
    lib = _load()
    lay = scan_layout(hdr)
    comps = hdr.components
    if hdr.precision not in (8, 12):
        raise JPEGError(f"unsupported precision {hdr.precision}")
    data = _padded(scan)
    ri = scan.restart_interval
    seg_offsets = np.ascontiguousarray(scan.seg_offsets, np.int64)
    n_segments = len(seg_offsets) - 1
    expected = -(-lay.n_mcus // ri) if ri else 1
    if n_segments != expected:
        raise JPEGError(
            f"restart-segment count {n_segments} does not match DRI {ri}")
    h = np.array([c.h for c in comps], np.int32)
    v = np.array([c.v for c in comps], np.int32)
    dc_luts = [_lut16(scan.dc_specs[c.td]) for c in comps]
    ac_luts = [_lut32ac(scan.ac_specs[c.ta]) for c in comps]
    PtrArray = ctypes.c_void_p * len(comps)
    dc_ptrs = PtrArray(*[a.ctypes.data for a in dc_luts])
    ac_ptrs = PtrArray(*[a.ctypes.data for a in ac_luts])
    n_mcus = lay.n_mcus
    bits = np.zeros(n_mcus, np.int64)
    syms = np.zeros(n_mcus, np.int32)
    pairs = np.zeros(n_mcus, np.int32)
    per_seg = ri if ri else n_mcus
    base_ptr = data.ctypes.data
    for s in range(n_segments):
        lo, hi = int(seg_offsets[s]), int(seg_offsets[s + 1])
        m0 = s * per_seg
        m1 = min(n_mcus, m0 + per_seg)
        nm = m1 - m0
        rc = lib.jd_skeleton_scan(
            base_ptr + lo, hi - lo,
            len(comps), h.ctypes.data, v.ctypes.data,
            dc_ptrs, ac_ptrs, nm, 1,
            bits.ctypes.data + m0 * 8, syms.ctypes.data + m0 * 4,
            pairs.ctypes.data + m0 * 4, hdr.precision)
        if rc != 0:
            raise JPEGError(
                f"skeleton scan failed in segment {s} (code {rc})")
        bits[m0:m1] += lo * 8
    return bits, syms, pairs


def emit_prep(hdr: FrameHeader, scan: ScanHeader, *,
              max_chunks: int = 512, cap_factor: int = 4,
              target_steps: int = 1300, n_threads: int | None = None):
    """One-call emit-lane prep (jd_emit_prep, ABI 22): per-segment
    skeleton walks (threaded in C++), pair-balanced lane boundaries
    with segment starts forced, exact per-lane trip maxima.

    Returns (m_lo (L,) int64 first MCU per lane, nm (L,) int32,
    starts (L,) int32 bit offsets, T_sym, T_pair).
    Raises JPEGError on malformed streams (callers fall back)."""
    lib = _load()
    lay = scan_layout(hdr)
    comps = hdr.components
    if hdr.precision not in (8, 12):
        raise JPEGError(f"unsupported precision {hdr.precision}")
    data = _padded(scan)
    ri = scan.restart_interval
    seg_offsets = np.ascontiguousarray(scan.seg_offsets, np.int64)
    n_segments = len(seg_offsets) - 1
    expected = -(-lay.n_mcus // ri) if ri else 1
    if n_segments != expected:
        raise JPEGError(
            f"restart-segment count {n_segments} does not match DRI {ri}")
    h = np.array([c.h for c in comps], np.int32)
    v = np.array([c.v for c in comps], np.int32)
    dc_luts = [_lut16(scan.dc_specs[c.td]) for c in comps]
    ac_luts = [_lut32ac(scan.ac_specs[c.ta]) for c in comps]
    PtrArray = ctypes.c_void_p * len(comps)
    dc_ptrs = PtrArray(*[a.ctypes.data for a in dc_luts])
    ac_ptrs = PtrArray(*[a.ctypes.data for a in ac_luts])
    n_mcus = lay.n_mcus
    sb = np.zeros(n_mcus, np.int64)
    ss_ = np.zeros(n_mcus, np.int32)
    sp = np.zeros(n_mcus, np.int32)
    cap_out = max_chunks + 2 * n_segments + 8
    m_lo = np.zeros(cap_out, np.int64)
    nm = np.zeros(cap_out, np.int32)
    starts = np.zeros(cap_out, np.int32)
    t_sym = ctypes.c_int64(0)
    t_pair = ctypes.c_int64(0)
    n_l = ctypes.c_int32(0)
    rc = lib.jd_emit_prep(
        data.ctypes.data, len(scan.data),
        seg_offsets.ctypes.data, n_segments,
        len(comps), h.ctypes.data, v.ctypes.data, dc_ptrs, ac_ptrs,
        n_mcus, ri, hdr.precision, max_chunks, cap_factor, target_steps,
        sb.ctypes.data, ss_.ctypes.data, sp.ctypes.data,
        m_lo.ctypes.data, nm.ctypes.data, starts.ctypes.data,
        ctypes.byref(t_sym), ctypes.byref(t_pair), ctypes.byref(n_l),
        n_threads if n_threads is not None else min(_NCPU, 4))
    if rc != 0:
        raise JPEGError(f"emit prep failed (code {rc})")
    L = int(n_l.value)
    return (m_lo[:L], nm[:L], starts[:L], int(t_sym.value),
            int(t_pair.value))


def decode_scan_packed(hdr: FrameHeader, scan: ScanHeader,
                       n_threads: int | None = None):
    """Decode straight to the packed wire format (int16 DC plane, int8 AC
    plane, sparse escape list) — zero extra host passes.

    Returns (dc16 (N,), ac8 (N, 64) int8 with [:,0]=0, esc_idx (E,) int32,
    esc_val (E,) int16); semantics identical to
    models.batch.pack_blocks(decode_scan_baseline(...)).
    """
    lib = _load()
    st = _ScanCall(hdr, scan)
    lay = st.lay

    n_blocks = lay.total_blocks
    dc16 = np.empty((n_blocks,), np.int16)
    ac8 = np.empty((n_blocks, 64), np.int8)
    n_threads = st.threads(n_threads)

    esc_cap = max(4096, n_blocks // 2)
    while True:
        esc_idx = np.empty((esc_cap,), np.int32)
        esc_val = np.empty((esc_cap,), np.int16)
        esc_count = np.zeros((1,), np.int64)
        rc = lib.jd_decode_scan_packed(
            *st.head_args(),
            dc16.ctypes.data, ac8.ctypes.data,
            esc_idx.ctypes.data, esc_val.ctypes.data,
            esc_cap, esc_count.ctypes.data, n_threads,
        )
        if rc == -3:  # escape capacity exceeded (low-quality images)
            esc_cap *= 4
            continue
        if rc != 0:
            raise JPEGError(
                f"native packed entropy decode failed: segment {rc >> 8}, "
                f"error code {rc & 0xFF}")
        e = int(esc_count[0])
        return dc16, ac8, esc_idx[:e].copy(), esc_val[:e].copy()


def decode_scan_subset(hdr: FrameHeader, scan: ScanHeader,
                       n_threads: int | None = None) -> np.ndarray:
    """Sequential subset scan (T.81 A.2): interleaved over the frame MCU
    grid when the scan lists several components, non-interleaved over the
    single component's unpadded block grid otherwise.

    Returns (n_units * blocks_per_unit, 64) int32 scan-order blocks;
    identical to python_ref.decode_scan_sequential_into's traversal order
    (asserted in tests/test_encoder_roundtrip.py)."""
    from ..layout import comp_dims_unpadded

    lib = _load()
    sc = scan.comp_indices
    comps = [hdr.components[ci] for ci in sc]

    data = _padded(scan)
    seg_offsets = np.ascontiguousarray(scan.seg_offsets, dtype=np.int64)
    n_segments = len(seg_offsets) - 1
    ri = scan.restart_interval

    if len(sc) == 1:
        # Non-interleaved: one data unit per MCU over the unpadded grid.
        rows_u, cols_u = comp_dims_unpadded(hdr, sc[0])
        n_units = rows_u * cols_u
        h = np.array([1], np.int32)
        v = np.array([1], np.int32)
        bpu = 1
    else:
        n_units = hdr.mcus_x * hdr.mcus_y
        h = np.array([c.h for c in comps], np.int32)
        v = np.array([c.v for c in comps], np.int32)
        bpu = int(sum(c.h * c.v for c in comps))
    expected = -(-n_units // ri) if ri else 1
    if n_segments != expected:
        raise JPEGError(
            f"restart-segment count {n_segments} does not match DRI {ri}")

    dc_luts = [_lut16(scan.dc_specs[scan.dc_table_ids[k]])
               for k in range(len(sc))]
    ac_luts = [_lut32ac(scan.ac_specs[scan.ac_table_ids[k]])
               for k in range(len(sc))]
    PtrArray = ctypes.c_void_p * len(sc)
    dc_ptrs = PtrArray(*[a.ctypes.data for a in dc_luts])
    ac_ptrs = PtrArray(*[a.ctypes.data for a in ac_luts])

    out = np.zeros((n_units * bpu, 64), dtype=np.int32)
    if n_threads is None:
        n_threads = min(_NCPU, max(1, n_segments))
    rc = lib.jd_decode_scan(
        data.ctypes.data, seg_offsets.ctypes.data, n_segments,
        len(sc), h.ctypes.data, v.ctypes.data,
        dc_ptrs, ac_ptrs,
        n_units, ri, out.ctypes.data, n_threads, hdr.precision,
    )
    if rc != 0:
        raise JPEGError(
            f"native subset-scan decode failed: segment {rc >> 8}, "
            f"error code {rc & 0xFF}")
    return out


def decode_scan_sparse(hdr: FrameHeader, scan: ScanHeader,
                       n_threads: int | None = None):
    """Decode straight to the sparse wire format (int16 DC plane + (gap
    uint8, val int8) AC stream + escape list) — the run-length decode loop
    emits nonzeros directly, never materializing a dense AC plane.

    Returns (dc16 (N,), gaps (K,) uint8, vals (K,) int8, esc_idx (E,) int32,
    esc_val (E,) int16); semantics identical to
    models.batch.sparsify_ac over the packed format (asserted in tests).
    """
    lib = _load()
    st = _ScanCall(hdr, scan)
    lay = st.lay

    n_blocks = lay.total_blocks
    dc16 = np.empty((n_blocks,), np.int16)
    n_threads = st.threads(n_threads)

    # Average corpus density is ~9 nonzeros/block; start at 16/block and
    # grow geometrically (hard upper bound: 64/block incl. extenders).
    sparse_cap = max(4096, n_blocks * 16)
    esc_cap = max(4096, n_blocks // 2)
    while True:
        gaps = np.empty((sparse_cap,), np.uint8)
        vals = np.empty((sparse_cap,), np.int8)
        sparse_count = np.zeros((1,), np.int64)
        esc_idx = np.empty((esc_cap,), np.int32)
        esc_val = np.empty((esc_cap,), np.int16)
        esc_count = np.zeros((1,), np.int64)
        rc = lib.jd_decode_scan_sparse(
            *st.head_args(),
            dc16.ctypes.data,
            gaps.ctypes.data, vals.ctypes.data,
            sparse_cap, sparse_count.ctypes.data,
            esc_idx.ctypes.data, esc_val.ctypes.data,
            esc_cap, esc_count.ctypes.data, n_threads,
        )
        if rc == -3:  # capacity exceeded
            sparse_cap *= 4
            esc_cap *= 4
            continue
        if rc != 0:
            raise JPEGError(
                f"native sparse entropy decode failed: segment {rc >> 8}, "
                f"error code {rc & 0xFF}")
        k = int(sparse_count[0])
        e = int(esc_count[0])
        return (dc16, gaps[:k].copy(), vals[:k].copy(),
                esc_idx[:e].copy(), esc_val[:e].copy())


def unstuff(data: np.ndarray, start: int):
    """Native entropy-region unstuffer; same contract as
    io.parser.unstuff_entropy (clean bytes, clean-stream segment offset
    table incl. 0 and total length, absolute end offset of the
    terminating marker FF).  ~10x the NumPy scan's throughput."""
    lib = _load()
    region = np.ascontiguousarray(data[start:])
    n = len(region)
    if n == 0:
        raise JPEGError("entropy data: no terminating marker found")
    out = np.empty(n + 256, np.uint8)
    out_len = np.zeros(1, np.int64)
    seg_cap = n // 2 + 2
    segs = np.empty(seg_cap, np.int64)
    n_segs = np.zeros(1, np.int64)
    end = lib.jd_unstuff(region.ctypes.data, n,
                         out.ctypes.data, out_len.ctypes.data,
                         segs.ctypes.data, seg_cap, n_segs.ctypes.data)
    if end == -1:
        raise JPEGError("entropy data: no terminating marker found")
    if end < 0:
        raise JPEGError(f"unstuffer failed (code {end})")
    k = int(out_len[0])
    out[k:k + 256] = 0  # native decoder padding contract, paid once here
    clean = out[:k]
    seg_offsets = np.unique(np.concatenate(
        [[0], segs[:int(n_segs[0])], [len(clean)]]).astype(np.int64))
    return clean, seg_offsets, start + int(end)


def decode_scan_nibble(hdr: FrameHeader, scan: ScanHeader,
                       n_threads: int | None = None):
    """Decode straight to the nibble wire format (int16 DC plane +
    (gap<<4)|val-code uint8 entry stream + int8 overflow stream + escape
    list); see models.batch.nibbleize_ac for the encoding.

    Returns (dc16 (N,), entries (K,) uint8, ov (O,) int8,
    esc_idx (E,) int32, esc_val (E,) int16)."""
    lib = _load()
    st = _ScanCall(hdr, scan)
    lay = st.lay

    n_blocks = lay.total_blocks
    dc16 = np.empty((n_blocks,), np.int16)
    n_threads = st.threads(n_threads)

    entry_cap = max(4096, n_blocks * 12)
    ov_cap = max(1024, n_blocks * 3)
    esc_cap = max(4096, n_blocks // 2)
    while True:
        entries = np.empty((entry_cap,), np.uint8)
        ov = np.empty((ov_cap,), np.int8)
        esc_idx = np.empty((esc_cap,), np.int32)
        esc_val = np.empty((esc_cap,), np.int16)
        counts = np.zeros((3,), np.int64)
        rc = lib.jd_decode_scan_nibble(
            *st.head_args(),
            dc16.ctypes.data,
            entries.ctypes.data, entry_cap, counts[0:].ctypes.data,
            ov.ctypes.data, ov_cap, counts[1:].ctypes.data,
            esc_idx.ctypes.data, esc_val.ctypes.data,
            esc_cap, counts[2:].ctypes.data, n_threads,
        )
        if rc == -3:  # capacity exceeded
            entry_cap *= 4
            ov_cap *= 4
            esc_cap *= 4
            continue
        if rc != 0:
            raise JPEGError(
                f"native nibble entropy decode failed: segment {rc >> 8}, "
                f"error code {rc & 0xFF}")
        k, o, e = (int(x) for x in counts)
        return (dc16, entries[:k].copy(), ov[:o].copy(),
                esc_idx[:e].copy(), esc_val[:e].copy())


def decode_scan_slots(hdr: FrameHeader, scan: ScanHeader, cap: int = 16,
                      n_threads: int | None = None):
    """Decode straight to the slot wire format (int16 DC plane + (N, cap)
    position/value slot arrays + overflow and escape lists); see
    models.batch.slotify_ac for the format.

    Returns (dc16 (N,), pos (N, cap) uint8, val (N, cap) int8,
    ov_idx (O,) int32, ov_val (O,) int16, esc_idx (E,), esc_val (E,))."""
    lib = _load()
    st = _ScanCall(hdr, scan)
    lay = st.lay

    n_blocks = lay.total_blocks
    dc16 = np.empty((n_blocks,), np.int16)
    pos = np.zeros((n_blocks, cap), np.uint8)
    val = np.zeros((n_blocks, cap), np.int8)
    n_threads = st.threads(n_threads)

    ov_cap = max(4096, n_blocks * 8)
    esc_cap = max(4096, n_blocks // 2)
    while True:
        ov_idx = np.empty((ov_cap,), np.int32)
        ov_val = np.empty((ov_cap,), np.int16)
        esc_idx = np.empty((esc_cap,), np.int32)
        esc_val = np.empty((esc_cap,), np.int16)
        counts = np.zeros((2,), np.int64)
        rc = lib.jd_decode_scan_slots(
            *st.head_args(),
            dc16.ctypes.data,
            pos.ctypes.data, val.ctypes.data, cap,
            ov_idx.ctypes.data, ov_val.ctypes.data,
            ov_cap, counts[0:].ctypes.data,
            esc_idx.ctypes.data, esc_val.ctypes.data,
            esc_cap, counts[1:].ctypes.data, n_threads,
        )
        if rc == -3:
            ov_cap *= 4
            esc_cap *= 4
            continue
        if rc != 0:
            raise JPEGError(
                f"native slots entropy decode failed: segment {rc >> 8}, "
                f"error code {rc & 0xFF}")
        o, e = (int(x) for x in counts)
        return (dc16, pos, val, ov_idx[:o].copy(), ov_val[:o].copy(),
                esc_idx[:e].copy(), esc_val[:e].copy())


def _run_prog_scan(lib, hdr: FrameHeader, planes: list, scan) -> None:
    """One progressive Huffman scan into caller-owned planes (segment-
    threaded in the C call; restart segments are independent, T.81 G.2)."""
    from ..layout import comp_dims_unpadded

    data = _padded(scan)
    seg_offsets = np.ascontiguousarray(scan.seg_offsets, np.int64)
    n_segments = len(seg_offsets) - 1
    ri = scan.restart_interval
    first = 1 if scan.ah == 0 else 0
    n_threads = min(_NCPU, max(1, n_segments))
    if scan.ss == 0:
        if scan.se != 0:
            raise JPEGError("progressive: DC scan must have Se=0")
        nsc = len(scan.comp_indices)
        interleaved = 1 if nsc > 1 else 0
        comps = [hdr.components[ci] for ci in scan.comp_indices]
        comp_h = np.array([c.h for c in comps], np.int32)
        comp_v = np.array([c.v for c in comps], np.int32)
        plane_ptrs = (ctypes.c_void_p * nsc)(
            *[planes[ci].ctypes.data for ci in scan.comp_indices])
        plane_cols = np.array(
            [planes[ci].shape[1] for ci in scan.comp_indices], np.int32)
        if first:
            luts = [_lut16(scan.dc_specs[scan.dc_table_ids[k]])
                    for k in range(nsc)]
        else:
            luts = [np.zeros(1, np.int16)] * nsc  # unused
        lut_ptrs = (ctypes.c_void_p * nsc)(
            *[a.ctypes.data for a in luts])
        if interleaved:
            sc_rows = sc_cols = 0
        else:
            sc_rows, sc_cols = comp_dims_unpadded(
                hdr, scan.comp_indices[0])
        rc = lib.jd_prog_dc_scan(
            data.ctypes.data, seg_offsets.ctypes.data, n_segments,
            first, scan.al, interleaved, nsc,
            comp_h.ctypes.data, comp_v.ctypes.data,
            plane_ptrs, plane_cols.ctypes.data, lut_ptrs,
            hdr.mcus_x, hdr.mcus_y, sc_rows, sc_cols, ri, n_threads)
    else:
        if len(scan.comp_indices) != 1:
            raise JPEGError(
                "progressive: AC scans must be single-component")
        ci = scan.comp_indices[0]
        rows, cols = comp_dims_unpadded(hdr, ci)
        lut = _lut16(scan.ac_specs[scan.ac_table_ids[0]])
        rc = lib.jd_prog_ac_scan(
            data.ctypes.data, seg_offsets.ctypes.data, n_segments,
            first, scan.ss, scan.se, scan.al,
            planes[ci].ctypes.data, planes[ci].shape[1],
            lut.ctypes.data, rows, cols, ri, n_threads)
    if rc != 0:
        raise JPEGError(f"native progressive scan failed (code {rc})")


def _scan_chains(hdr: FrameHeader) -> list:
    """Partition a progressive frame's scans into independent chains.

    Scans write disjoint coefficient sets: DC scans touch only k=0, AC
    scans a single component's k>=1 band; refinements depend only on
    earlier scans of the SAME component/band.  So (all DC scans, in file
    order) and (each component's AC scans, in file order) are mutually
    independent chains — they run on parallel host threads, recovering
    scan-level parallelism even for DRI=0 progressive streams (where
    segment sharding has nothing to shard).  Order within a chain is
    preserved, so output is identical to the sequential loop."""
    chains: dict = {}
    for scan in hdr.scans:
        key = "dc" if scan.ss == 0 else ("ac", scan.comp_indices[0])
        chains.setdefault(key, []).append(scan)
    return list(chains.values())


def decode_progressive(hdr: FrameHeader) -> list:
    """Native fast path for progressive frames (T.81 G.2): per-scan C++
    decoders mutate caller-owned per-component planes; independent scan
    chains (DC / per-component AC) run on parallel threads and each scan
    is additionally segment-threaded.

    Output identical to entropy.progressive.decode_progressive (asserted in
    tests/test_progressive_native.py).
    """
    lib = _load()
    planes = []
    for ci in range(len(hdr.components)):
        rows = hdr.mcus_y * hdr.components[ci].v
        cols = hdr.mcus_x * hdr.components[ci].h
        planes.append(np.zeros((rows, cols, 64), np.int32))

    chains = _scan_chains(hdr)

    def run_chain(scans):
        for scan in scans:
            _run_prog_scan(lib, hdr, planes, scan)

    if len(chains) > 1 and _NCPU > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(_NCPU * 2, len(chains))) as ex:
            list(ex.map(run_chain, chains))
    else:
        for scans in chains:
            run_chain(scans)
    return planes


# ---------------------------------------------------------------------------
# Progressive skeleton scans: the host half of the DEVICE-lane progressive
# decode (ops/entropy_prog.decode_progressive_hybrid).  Position-only
# walks recording per-stride lane states; coefficient stores all happen
# on device.
# ---------------------------------------------------------------------------

def prog_skeleton_dc(hdr: FrameHeader, scan: ScanHeader, stride: int):
    """Skeleton of a DRI=0 DC-first scan: returns (bits (L,) int64
    absolute lane start bits, preds (L, n_scan_comps) int32 predictors
    entering each lane), L = ceil(n_mcus / stride)."""
    from ..layout import comp_dims_unpadded

    lib = _load()
    if len(scan.seg_offsets) != 2:
        raise JPEGError("progressive skeleton requires a DRI=0 scan")
    interleaved = len(scan.comp_indices) > 1
    if interleaved:
        n_mcus = hdr.mcus_x * hdr.mcus_y
    else:
        r, c = comp_dims_unpadded(hdr, scan.comp_indices[0])
        n_mcus = r * c
    data = _padded(scan)
    nsc = len(scan.comp_indices)
    h = np.array([hdr.components[ci].h for ci in scan.comp_indices],
                 np.int32)
    v = np.array([hdr.components[ci].v for ci in scan.comp_indices],
                 np.int32)
    dc_luts = [_lut16(scan.dc_specs[scan.dc_table_ids[k]])
               for k in range(nsc)]
    PtrArray = ctypes.c_void_p * nsc
    ptrs = PtrArray(*[a.ctypes.data for a in dc_luts])
    n_lanes = -(-n_mcus // stride)
    bits = np.zeros(n_lanes, np.int64)
    preds = np.zeros((n_lanes, nsc), np.int32)
    rc = lib.jd_prog_skeleton_dc(
        data.ctypes.data, int(scan.seg_offsets[0]), len(scan.data),
        nsc, h.ctypes.data, v.ctypes.data, ptrs,
        1 if interleaved else 0, n_mcus, stride,
        bits.ctypes.data, preds.ctypes.data)
    if rc != 0:
        raise JPEGError(f"progressive DC skeleton failed (code {rc})")
    return bits, preds


def prog_skeleton_ac(hdr: FrameHeader, scan: ScanHeader, stride: int,
                     nzmap: np.ndarray, want_syms: bool = False):
    """Skeleton of a DRI=0 AC scan (first pass or refinement): returns
    (bits (L,) int64, eobrun (L,) int32) lane states and UPDATES
    ``nzmap`` — the component's (n_blocks,) uint64 band-position bitmap
    persisted across its scan chain (bit k <=> zigzag coefficient k
    nonzero), which determines refinement bit consumption.  With
    ``want_syms`` also returns a per-block (n_blocks,) int32 count: the
    Huffman symbol count for first-pass scans, or the emission refine
    kernel's per-block EVENT count (merged chunk rule, see the C++
    comment on jd_prog_skeleton_ac) for refinement scans — the exact
    per-lane trip counts / balance weights for the emission kernels."""
    from ..layout import comp_dims_unpadded

    lib = _load()
    if len(scan.seg_offsets) != 2:
        raise JPEGError("progressive skeleton requires a DRI=0 scan")
    ci = scan.comp_indices[0]
    r, c = comp_dims_unpadded(hdr, ci)
    n_blocks = r * c
    if nzmap.shape != (n_blocks,) or nzmap.dtype != np.uint64:
        raise ValueError("nzmap must be (n_blocks,) uint64")
    data = _padded(scan)
    lut = _lut16(scan.ac_specs[scan.ac_table_ids[0]])
    n_lanes = -(-n_blocks // stride)
    bits = np.zeros(n_lanes, np.int64)
    eob = np.zeros(n_lanes, np.int32)
    syms = np.zeros(n_blocks, np.int32) if want_syms else None
    rc = lib.jd_prog_skeleton_ac(
        data.ctypes.data, int(scan.seg_offsets[0]), len(scan.data),
        1 if scan.ah == 0 else 0, scan.ss, scan.se,
        lut.ctypes.data, nzmap.ctypes.data, n_blocks, stride,
        bits.ctypes.data, eob.ctypes.data,
        syms.ctypes.data if want_syms else None)
    if rc != 0:
        raise JPEGError(f"progressive AC skeleton failed (code {rc})")
    return (bits, eob, syms) if want_syms else (bits, eob)
