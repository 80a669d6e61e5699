"""Fused dequantize + 8x8 IDCT as a Pallas TPU kernel (MXU matmul form).

The separable 2-D IDCT ``out = M @ X @ M^T`` is rewritten via the Kronecker
identity ``vec(M X M^T) = (M (x) M) vec(X)``: every 8x8 block becomes a
64-vector and the whole transform is ONE ``(N, 64) @ (64, 64)`` matmul over
all blocks — ideal MXU shape (contraction 64, unit stride, no per-block
transposes).  Dequantization (int multiply) and the f32 cast fuse into the
same kernel, so coefficients stream HBM -> VMEM once.

4x more MACs than the separable form, but the MXU runs dense tiles at full
rate where the separable form would issue tiny 8x8 matmuls; for this
bandwidth-bound op the matmul is effectively free.

Equivalent XLA fallback (`idct_kron`) is provided for non-TPU backends and
as a perf reference; pixel_pipeline's ``idct="fast"`` remains the einsum
form.  Parity: replaces inverseDCTComponent + dequantizeMCUComponent
(reference jpeg.cpp:563-753) within +-1 rounding of the true transform.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pixel import IDCT_M

#: (64, 64) Kronecker IDCT basis: KRON[p*8+q, u*8+v] = M[p,u] * M[q,v].
IDCT_KRON = np.kron(IDCT_M, IDCT_M).astype(np.float32)

_TILE = 512  # blocks per grid step: (512, 64) int32 = 128 KB in VMEM


def idct_kron(blocks: jnp.ndarray, qtable: jnp.ndarray) -> jnp.ndarray:
    """XLA reference: dequant + IDCT via the (64, 64) Kronecker matmul.

    blocks: (N, 64) int32 quantized coefficients (natural order).
    qtable: (64,) int32.  Returns (N, 64) int32 pixel-domain samples.
    """
    deq = (blocks * qtable.astype(jnp.int32)).astype(jnp.float32)
    out = jnp.dot(deq, jnp.asarray(IDCT_KRON).T,
                  preferred_element_type=jnp.float32)
    return jnp.round(out).astype(jnp.int32)


def _kernel(blocks_ref, q_ref, kron_ref, out_ref):
    deq = (blocks_ref[:] * q_ref[0:1, :]).astype(jnp.float32)
    out = jnp.dot(deq, kron_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.round(out).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_dequant_idct(blocks: jnp.ndarray, qtable: jnp.ndarray,
                       *, interpret: bool = False) -> jnp.ndarray:
    """Pallas kernel: (N, 64) int32 blocks + (64,) qtable -> (N, 64) int32.

    N is padded to the tile size internally; the grid streams block tiles
    through VMEM with the transposed Kronecker basis resident.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = blocks.shape[0]
    n_pad = -(-n // _TILE) * _TILE
    if n_pad != n:
        blocks = jnp.pad(blocks, ((0, n_pad - n), (0, 0)))
    q2d = jnp.broadcast_to(qtable.astype(jnp.int32)[None, :], (8, 64))
    kron_t = jnp.asarray(IDCT_KRON.T)

    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, 64), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, 64), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 64), jnp.int32),
        interpret=interpret,
    )(blocks, q2d, kron_t)
    return out[:n]
