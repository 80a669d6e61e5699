"""Mosaic dynamic-indexing probes: what a Pallas Huffman decoder may do.

The operation at the heart of any Pallas TPU Huffman decoder — "peek 16
stream bits, index a 64K-entry LUT" — reduced to two minimal kernels that
document the v5e lowering rules (jax 0.9.0):

* ``lane``   — dynamic index in the LANE (minor) dimension: REJECTED
  ("cannot statically prove that index ... is a multiple of 128").
* ``sublane`` — the same probe with the table reshaped to (rows, 128) so
  the dynamic index lands on SUBLANES, the low 7 bits extracted with a
  one-hot reduce: LOWERS AND RUNS.

The production kernel (ops/entropy_pallas.py) uses the sublane layout and
runs bit-exactly on hardware; if the ``lane`` probe ever starts passing,
the one-hot extraction can be retired.

Run:  python tools/pallas_mosaic_repro.py [--interpret]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    idx = np.array([[17], [4093], [65535], [2], [9], [100], [7], [31]],
                   np.int32)
    expected = 0
    for i in range(8):
        expected += (int(idx[i, 0]) + expected) & 0xFFFF

    def run(name, lut_shape, kernel):
        lut = np.arange(65536, dtype=np.int32).reshape(lut_shape)
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            interpret=args.interpret,
        )
        try:
            got = int(fn(jnp.asarray(lut), jnp.asarray(idx))[0, 0])
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            key = next((ln.strip() for ln in msg.splitlines()
                        if "multiple of 128" in ln),
                       next((ln.strip() for ln in msg.splitlines()
                             if "failed" in ln.lower()), msg))
            print(f"{name:8s}: LOWERING FAILED ({type(e).__name__}): "
                  f"{key[:160]}")
            return False
        status = "ok" if got == expected else f"WRONG ({got}!={expected})"
        print(f"{name:8s}: runs, {status}")
        return got == expected

    def lane_kernel(lut_ref, idx_ref, out_ref):
        # LUT as (1, 65536): the probe indexes the LANE dimension.
        def body(i, acc):
            w16 = (idx_ref[i, 0] + acc) & 0xFFFF
            return acc + lut_ref[0, w16]
        acc = jax.lax.fori_loop(0, 8, body, jnp.int32(0))
        out_ref[...] = jnp.full((1, 128), acc, jnp.int32)

    def sublane_kernel(lut_ref, idx_ref, out_ref):
        # LUT as (512, 128): dynamic SUBLANE row + one-hot lane extract.
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(i, acc):
            w16 = (idx_ref[i, 0] + acc) & 0xFFFF
            row = lut_ref[pl.ds(w16 >> 7, 1), :]
            return acc + jnp.sum(jnp.where(lanes == (w16 & 127), row, 0))
        acc = jax.lax.fori_loop(0, 8, body, jnp.int32(0))
        out_ref[...] = jnp.full((1, 128), acc, jnp.int32)

    lane_ok = run("lane", (1, 65536), lane_kernel)
    sublane_ok = run("sublane", (512, 128), sublane_kernel)
    if lane_ok and not args.interpret:
        print("NOTE: dynamic lane indexing now lowers — the one-hot "
              "extraction in ops/entropy_pallas.py can be retired.")

    # ---- vecprobe: the VERDICT r2 item-8 experiment ----------------------
    # "Lane-vectorize segments INSIDE one Pallas program": every VPU lane
    # would carry its own decoder, so each symbol step needs a PER-LANE
    # dynamic probe — a (8, 128) vector of 16-bit indices into the 64K
    # table.  Mosaic has no vector-index VMEM gather; the only lowering is
    # a one-hot reduction over all 512 table sublanes per probe.  Measure
    # that emulation against XLA's native gather on the same workload:
    import time

    S = 1024  # lanes
    rng = np.random.default_rng(0)
    idx_v = rng.integers(0, 65536, (8, 128), np.int32)
    lut_v = np.arange(65536, dtype=np.int32)

    def vecprobe_kernel(lut_ref, idx_ref, out_ref):
        # (512, 128) table; per-lane dynamic probe emulated by one-hot
        # accumulation over every sublane row.
        row_sel = idx_ref[...] >> 7
        lane_sel = idx_ref[...] & 127
        lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def body(r, acc):
            row = lut_ref[pl.ds(r, 1), :]          # (1, 128)
            hit = (row_sel == r) & (lanes == lane_sel)
            return acc + jnp.where(hit, row, 0)
        out_ref[...] = jax.lax.fori_loop(0, 512, body,
                                         jnp.zeros((8, 128), jnp.int32))

    try:
        fn = pl.pallas_call(
            vecprobe_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            interpret=args.interpret)
        fn_j = jax.jit(lambda lut, ix: fn(lut, ix))
        got = np.asarray(fn_j(jnp.asarray(lut_v.reshape(512, 128)),
                              jnp.asarray(idx_v)))
        ok = np.array_equal(got, lut_v[idx_v])
        reps = 50
        x = jnp.asarray(idx_v)
        lutd = jnp.asarray(lut_v.reshape(512, 128))
        fn_j(lutd, x).block_until_ready()
        t0 = time.perf_counter()
        for k in range(reps):
            x = fn_j(lutd, x & 0xFFFF)
        x.block_until_ready()
        t_pallas = (time.perf_counter() - t0) / reps

        take = jax.jit(lambda lut, ix: jnp.take(lut, ix))
        y = jnp.asarray(idx_v)
        lutf = jnp.asarray(lut_v)
        take(lutf, y).block_until_ready()
        t0 = time.perf_counter()
        for k in range(reps):
            y = take(lutf, y & 0xFFFF)
        y.block_until_ready()
        t_xla = (time.perf_counter() - t0) / reps
        print(f"vecprobe: runs, {'ok' if ok else 'WRONG'}; one-hot "
              f"emulation {t_pallas*1e6:.0f} us vs XLA gather "
              f"{t_xla*1e6:.0f} us per 1024-lane probe "
              f"({t_pallas/t_xla:.1f}x)")
        print("conclusion: per-lane probes inside one Pallas program cost "
              ">= the XLA gather the lockstep decoder already uses — the "
              "Pallas entropy kernel stays a Mosaic case study, not a "
              "production backend (VERDICT r2 item 8).")
    except Exception as e:  # noqa: BLE001
        print(f"vecprobe: LOWERING FAILED ({type(e).__name__}): "
              f"{str(e)[:200]}")
    return 0 if sublane_ok else 1


if __name__ == "__main__":
    import os

    rc = main()
    os._exit(rc)
