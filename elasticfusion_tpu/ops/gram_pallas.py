"""Pallas Gram-accumulation kernel — the reduction stage of the tracking
normal equations (the reference's two-stage warp-shuffle tree,
/root/reference/Core/Cuda/reduce.cu:57-140 and types.cuh:98-143).

`rows @ rowsᵀ` for a [K<=16, N] row matrix is the whole payload of every
icp/rgb/so3 step.  The XLA formulation (ops/odometry._gram_outer) chunks N
into 128-lane blocks and batches ~2400 tiny [K,128]x[128,K] dots — measured
1.33 ms at N=307k on the chip, a fixed per-dot overhead ~30x above the
bandwidth bound.  This kernel instead streams [K, BLOCK] tiles HBM->VMEM and
accumulates ONE [K,K] MXU dot per tile into the output ref (grid is
sequential on TPU, so `o_ref +=` is the canonical reduction pattern):
9.8 MB of traffic for N=307k -> bandwidth-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _gram_kernel(x_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    b = x_ref[:]  # [Kp, BLOCK]
    o_ref[:] += jax.lax.dot_general(
        b, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def gram_outer_pallas(rows: jax.Array, block: int = 4096,
                      interpret: bool = False) -> jax.Array:
    """rows [K, N] f32 -> rows @ rowsᵀ [K, K] f32 (K <= 16).

    N is zero-padded to a block multiple (zero rows contribute nothing);
    K pads to the 8-sublane tile."""
    K, N = rows.shape
    assert K <= 16, K
    Kp = 8 if K <= 8 else 16
    if N < block:
        block = max(128, 1 << (N - 1).bit_length())
    pad_n = (-N) % block
    if Kp - K or pad_n:
        rows = jnp.pad(rows, ((0, Kp - K), (0, pad_n)))
    G = pl.pallas_call(
        _gram_kernel,
        grid=(rows.shape[1] // block,),
        in_specs=[pl.BlockSpec((Kp, block), lambda i: (0, i))],
        out_specs=pl.BlockSpec((Kp, Kp), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Kp, Kp), jnp.float32),
        interpret=interpret,
    )(rows)
    return G[:K, :K]
