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
    return 0 if sublane_ok else 1


if __name__ == "__main__":
    import os

    rc = main()
    os._exit(rc)
