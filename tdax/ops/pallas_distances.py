"""Pallas TPU kernel: tiled pairwise squared-Euclidean distances.

The 10k-point scale target (BASELINE.json configs[4]) needs a
10k x 10k distance matrix from 4096-d embeddings: ~4e11 MXU FLOPs and
a 400 MB f32 output.  This kernel tiles the output into MXU-aligned
(128, 128) blocks, streams K-chunks of both operand row-blocks through
VMEM, accumulates x.y on the MXU in f32, and fuses the
|x|^2 + |y|^2 - 2xy assembly and clamping into the same kernel — one
HBM write per output element, no intermediate Gram matrix.

Falls back to the XLA expansion path off-TPU (interpret mode keeps the
kernel testable on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _sqdist_kernel(x_ref, y_ref, xsq_ref, ysq_ref, out_ref, acc_ref):
    """Grid (i, j, k): out tile (i, j), contraction chunk k."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], y_ref[:].T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # true f32: distance parity

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        d2 = xsq_ref[:].T + ysq_ref[:] - 2.0 * acc_ref[:]
        out_ref[:] = jnp.maximum(d2, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairwise_sq_euclidean_pallas(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x [n, d] float32 (n, d padded to multiples of 128 internally)
    -> [n, n] squared distances."""
    n, d = x.shape
    n_pad = pl.cdiv(n, TILE) * TILE
    d_pad = pl.cdiv(d, TILE) * TILE
    xp = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(x.astype(jnp.float32))
    xsq = jnp.sum(xp * xp, axis=1, keepdims=True)  # [n_pad, 1]

    grid = (n_pad // TILE, n_pad // TILE, d_pad // TILE)
    out = pl.pallas_call(
        _sqdist_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, TILE), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, TILE), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i, j, k: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, TILE), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n_pad * d_pad,
            bytes_accessed=2 * n_pad * d_pad * 4 + n_pad * n_pad * 4,
            transcendentals=0),
        interpret=interpret,
    )(xp, xp, xsq.T, xsq.T)
    return out[:n, :n]


def pairwise_euclidean_pallas(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    d2 = pairwise_sq_euclidean_pallas(x, interpret=interpret)
    d = jnp.sqrt(d2)
    return d * (1.0 - jnp.eye(x.shape[0], dtype=d.dtype))
