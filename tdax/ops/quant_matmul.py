"""Pallas TPU kernel: matmul with in-kernel int8-weight dequantization.

EXPERIMENT, OFF BY DEFAULT (``TDAX_QMM=1`` opts in).  Hypothesis: the
weight-only serving matmul ``(x @ wq.astype(bf16)) * s`` leaves the
int8->bf16 convert serialized with the MXU under XLA, so an explicit
Pallas pipeline (int8 tiles at half the HBM bytes, VPU convert inside
the K-loop, scale fused into the accumulator write) should beat it.

Measured on a v5e chip (M=5120, the capture-forward token count;
amortized over a 50-iteration in-program scan):

  K=4096  N=4096   XLA dequant 0.931 ms (46.8%)   this kernel, best of
                   six tilings  0.977 ms (44.6%)
  K=4096  N=11008  XLA dequant 2.462 ms (47.6%)   best tiling (40.2%)

XLA's dequant fusion is already within ~2% of the best hand tiling —
the convert is NOT the bottleneck at these shapes, so the kernel stays
an opt-in experiment rather than the default path (scratch history:
round-3 A/B).  Kept because (a) the interpret tests pin the kernel
semantics for future toolchains where the trade may flip, and (b) it
is the starting point for fused epilogues XLA cannot express.

Reference behavior being replaced either way: the dequantized matmuls
inside the hooked forward of
/root/reference/extract_activations.py:110-111 (the reference runs
bf16 on CUDA; int8 weight-only is tdax's single-chip serving mode).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmm_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref):
    """Grid (i, j, k): out tile (i, j), contraction chunk k."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # int8 -> bf16 on the VPU; Mosaic overlaps it with the MXU via the
    # grid pipeline (next tiles DMA while this one computes)
    acc_ref[:] += jnp.dot(x_ref[:], q_ref[:].astype(x_ref.dtype),
                          preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


def _pick_block(dim: int, prefer=(512, 256, 128)) -> int:
    for b in prefer:
        if dim % b == 0:
            return b
    return 0


@functools.partial(jax.jit,
                   static_argnames=("interpret", "blocks"))
def _qmm_2d(x: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray,
            interpret: bool = False,
            blocks: tuple | None = None) -> jnp.ndarray:
    """x [M, K] bf16/f32, q [K, N] int8, s [N] f32 -> [M, N] x.dtype."""
    M, K = x.shape
    N = q.shape[1]
    if blocks is not None:
        bm, bn, bk = blocks
    else:
        bk = _pick_block(K)
        bn = _pick_block(N, prefer=(1024, 512, 256, 128))
        bm = 0
    m_pad = pl.cdiv(M, 128) * 128
    if not bm:
        bm = _pick_block(m_pad)
    xp = x if m_pad == M else jnp.zeros((m_pad, K), x.dtype).at[:M].set(x)

    grid = (m_pad // bm, N // bn, K // bk)
    out = pl.pallas_call(
        _qmm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * N * K,
            bytes_accessed=(m_pad * K * x.dtype.itemsize + K * N
                            + m_pad * N * x.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(xp, q, s.reshape(1, N))
    return out[:M]


def qmm_supported(x: jnp.ndarray, q: jnp.ndarray) -> bool:
    """Shapes/dtypes this kernel handles; callers fall back otherwise.
    Opt-in: the measured A/B (module docstring) has XLA ahead."""
    if os.environ.get("TDAX_QMM") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if q.ndim != 2 or x.ndim < 1 or x.shape[-1] != q.shape[0]:
        return False
    if x.dtype != jnp.bfloat16:
        # f32 activations are the parity/test configuration: keep them
        # on the XLA path, whose matmuls pin Precision.HIGHEST where it
        # matters (a Pallas f32 dot would take bf16 passes by default)
        return False
    K, N = q.shape
    return K % 128 == 0 and N % 128 == 0


@jax.custom_vjp
def quant_matmul(x: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray
                 ) -> jnp.ndarray:
    """[..., K] @ int8 [K, N] * s [N] -> [..., N] via the Pallas kernel."""
    lead = x.shape[:-1]
    out = _qmm_2d(x.reshape(-1, x.shape[-1]), q, s)
    return out.reshape(*lead, q.shape[1])


def _qmm_fwd(x, q, s):
    return quant_matmul(x, q, s), (x, q, s)


def _qmm_bwd(res, dy):
    # serving/capture never differentiate this; keep grads correct for
    # completeness via the XLA dequant formulation (weights frozen)
    x, q, s = res
    w = q.astype(dy.dtype) * s.astype(dy.dtype)
    dx = jnp.einsum("...n,kn->...k", dy, w).astype(x.dtype)
    return dx, None, None


quant_matmul.defvjp(_qmm_fwd, _qmm_bwd)


def quant_matmul_interpret(x, q, s):
    """Interpret-mode entry for CPU kernel tests."""
    lead = x.shape[:-1]
    out = _qmm_2d(x.reshape(-1, x.shape[-1]), q, s, interpret=True)
    return out.reshape(*lead, q.shape[1])
