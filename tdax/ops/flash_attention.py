"""Fused flash attention for TPU (Pallas tiled online-softmax kernel).

The model forward is the reference's device-heavy path
(extract_activations.py:110-111).  The XLA formulation materializes
[B, n_heads, Tq, Tk] float32 logits AND probabilities in HBM for every
layer — at the ViT's 1024 patch tokens that is ~1 GB of f32 traffic per
block, 48 blocks per image batch, and it capped the capture forward at
33.6% MFU.  This kernel keeps the score tile in VMEM: for each
(batch*head, q-block) it streams k/v blocks through the MXU, maintains
the running row max / normalizer of the online softmax in VMEM scratch,
and writes only the [Tq, head_dim] output to HBM.

Shared by the decoder (causal + key-validity), the ViT blocks
(dense self-attention), the resampler (cross-attention), and prefill —
``AttnSpec`` carries the mask structurally (a [B, Tk] validity row +
a causal flag) so the O(T^2) additive mask is never materialized on
the flash path.

Backward: fused too.  The forward saves each query row's softmax
log-normalizer; the ``custom_vjp`` backward then runs two tiled Pallas
kernels — dq (q-block-major, streaming k/v) and dk/dv (k-block-major,
streaming q/dO) — each recomputing only its [blk_q, blk_k] probability
tile in VMEM from the saved logsumexp.  Peak HBM for training stays
O(T*hd); the O(Tq*Tk)-materializing reference-recompute backward
remains available under TDAX_FLASH_REF_BWD=1.

Off-TPU (tests, CPU mesh dryrun) the dispatcher falls back to the
reference einsum path; the kernel itself stays testable anywhere via
Pallas interpret mode.

Multi-chip: the XLA partitioner treats a pallas_call as opaque, but
batch and head dims are fully parallel here (no cross-device reduction
inside attention), so ``mha`` runs the kernel per-shard under
``jax.shard_map`` whenever a ``flash_sharding(mesh, ...)`` context is
active — the extraction pipeline activates it automatically for its dp
mesh.  Without a context, ``mha`` refuses the kernel (loudly) for
eagerly-sharded multi-device inputs and takes the partitionable einsum
path instead; TDAX_NO_FLASH=1 forces that path everywhere.
TDAX_FLASH_INTERPRET=1 forces the Pallas path in interpret mode even
off-TPU — this is how the multi-chip dryrun proves the kernel (not its
fallback) is what a sharded mesh executes.
"""

from __future__ import annotations

import contextlib
import functools
import os
import warnings

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

NEG_INF = -1e30  # matches the additive-mask convention in decoder.causal_mask


class AttnSpec:
    """Structural attention mask: key-validity row + causal flag.

    ``kv_valid``: [B, Tk] bool/int (1 = real token) or None (all valid).
    ``causal``: static Python bool.  Not a pytree — pass via closure,
    never through scan carries or jit boundaries.
    """

    __slots__ = ("kv_valid", "causal")

    def __init__(self, kv_valid=None, causal: bool = False):
        self.kv_valid = kv_valid
        self.causal = bool(causal)

    def additive(self, tq: int, tk: int, batch: int) -> jnp.ndarray:
        """Materialized additive mask [B, 1, tq, tk] (fallback path)."""
        if self.kv_valid is not None:
            keyed = (self.kv_valid > 0)[:, None, :]          # [B, 1, Tk]
        else:
            keyed = jnp.ones((batch, 1, tk), dtype=bool)
        if self.causal:
            keyed = keyed & jnp.tril(jnp.ones((tq, tk), dtype=bool))[None]
        return jnp.where(keyed, 0.0, NEG_INF)[:, None, :, :].astype(jnp.float32)


def flash_mode() -> str | None:
    """"tpu" (compiled kernel), "interpret" (Pallas interpret mode,
    any backend — dryrun/CI coverage of the real kernel path), or None
    (einsum fallback)."""
    if os.environ.get("TDAX_NO_FLASH") == "1":
        return None
    if os.environ.get("TDAX_FLASH_INTERPRET") == "1":
        return "interpret"
    try:
        return "tpu" if jax.default_backend() == "tpu" else None
    except Exception:  # pragma: no cover - backend probing never fatal
        return None


def flash_enabled() -> bool:
    return flash_mode() is not None


# Active (mesh, batch_axis, head_axis, seq_axis) for multi-chip flash —
# a stack so nested scopes restore correctly.  Set via flash_sharding().
_SHARD_CTX: list[tuple] = []


@contextlib.contextmanager
def flash_sharding(mesh, batch_axis: str | None = "dp",
                   head_axis: str | None = None,
                   seq_axis: str | None = None):
    """Declare how attention inputs are sharded so ``mha`` can run the
    Pallas kernel per-shard under ``jax.shard_map``.

    Batch and head are the kernel's fully-parallel dims; q/k/v are
    treated as P(batch_axis, None, head_axis, None) and the key-validity
    bias as P(batch_axis, None).  This replaces the reference's
    device_map="auto" placement (extract_activations.py:26) for the
    attention hot path.

    ``seq_axis`` additionally turns on CONTEXT PARALLELISM: the
    sequence axis of q/k/v is sharded over that mesh axis and attention
    runs as a ring — each device holds one sequence chunk, k/v chunks
    rotate around the ring via ``lax.ppermute``, and per-chunk partial
    softmax results merge through their log-normalizers (see
    tdax.ops.ring_attention).  Requires self-attention (Tq == Tk) with
    Tq divisible by the axis size; other calls under the context warn
    and take the replicated path.  head_dim sharding is never
    supported (attention reduces over it)."""
    _SHARD_CTX.append((mesh, batch_axis, head_axis, seq_axis))
    try:
        yield
    finally:
        _SHARD_CTX.pop()


def current_flash_sharding():
    return _SHARD_CTX[-1] if _SHARD_CTX else None


@functools.lru_cache(maxsize=8)
def _warn_once(msg: str) -> None:
    warnings.warn(msg, stacklevel=3)


def _eagerly_multidevice(x) -> bool:
    """True only for a CONCRETE array committed across >1 device; under
    jit tracing (no sharding visible) this returns False — there the
    flash_sharding context is the mechanism."""
    try:
        if isinstance(x, jax.core.Tracer):
            return False
        return len(x.sharding.device_set) > 1
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, *rest,
            causal: bool, blk_q: int, blk_k: int, scale: float,
            precision, out_dtype, qk_axes: tuple, with_lse: bool = False):
    # qk_axes: grid dims carrying (q-block, k-block) — (1, 2) on the 3-D
    # [b*nh, i, j] grid, (2, 3) on the 4-D zero-transpose [b, nh, i, j]
    # grid.  Hard-coding (1, 2) here once keyed the causal mask and the
    # accumulator init/write to (head, q-block) on the 4-D grid: heads
    # >= 1 lost causal masking entirely (rows = head*blk_q + iota made
    # cols <= rows vacuously true) and multi-q-block shapes read stale
    # accumulators.  The full config's head_dim = 128 takes exactly that
    # path, so the regression tests below pin aligned+causal+multiblock.
    q_ax, k_ax = qk_axes
    if with_lse:
        lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        lse_ref, (acc_ref, m_ref, l_ref) = None, rest
    i, j = pl.program_id(q_ax), pl.program_id(k_ax)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    def body():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision) * scale                      # [blk_q, blk_k]
        s = s + bias_ref[0]                                   # [1, blk_k] bcast
        if causal:
            rows = i * blk_q + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, blk_k), 0)
            cols = j * blk_k + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, blk_k), 1)
            s = jnp.where(cols <= rows, s, NEG_INF)

        m_prev = m_ref[:, 0:1]                                # [blk_q, 1]
        l_prev = l_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                                # [blk_q, blk_k]
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    if causal:
        # skip k/v blocks entirely above the diagonal
        @pl.when(j * blk_k <= i * blk_q + blk_q - 1)
        def _():
            body()
    else:
        body()

    @pl.when(j == pl.num_programs(k_ax) - 1)
    def _():
        # fully-masked (padding) query rows have l == 0 via exp underflow
        # only when nothing was accumulated; guard the divide — their
        # output is sliced off / masked out downstream anyway
        l = l_ref[:, 0:1]
        o_ref[0] = (acc_ref[:] / jnp.where(l == 0.0, 1.0, l)).astype(out_dtype)
        if with_lse:
            # log-sum-exp per query row, consumed by the fused backward;
            # 0 for fully-masked rows makes exp(s - lse) underflow to 0
            # there (s <= NEG_INF), zeroing their gradient contributions
            lse = jnp.where(l == 0.0, 0.0, m_ref[:, 0:1] + jnp.log(
                jnp.where(l == 0.0, 1.0, l)))                 # [blk_q, 1]
            lse_ref[0] = jnp.transpose(lse, (1, 0))           # [1, blk_q]


def _flash_impl(q, k, v, bias, causal: bool, interpret: bool,
                return_lse: bool = False):
    """q [B, Tq, nh, hd], k/v [B, Tk, nh, hd], bias [B, Tk] additive f32
    -> [B, Tq, nh, hd] in q.dtype (and, when return_lse, the softmax
    log-normalizer [B*nh, 1, tq_pad] f32 for the fused backward)."""
    b, tq, nh, hd = q.shape
    tk = k.shape[1]
    hd_pad = _round_up(hd, 128)
    tq_pad = _round_up(tq, 128)
    tk_pad = _round_up(tk, 128)
    # Bigger blocks amortize per-program grid overhead (measured: the
    # ~0.5-1us/program cost dominated a 4096-program ViT grid at 128x512
    # blocks); cap the f32 score tile s/p at ~4 MB of VMEM.
    blk_q = next(s for s in (512, 384, 256, 128) if tq_pad % s == 0)
    blk_k = next(s for s in (1024, 768, 512, 384, 256, 128)
                 if tk_pad % s == 0)
    while blk_q * blk_k * 4 > 4 * 1024 * 1024:
        if blk_k >= blk_q and blk_k > 128:
            blk_k //= 2
            while tk_pad % blk_k:
                blk_k //= 2
        else:
            blk_q //= 2
            while tq_pad % blk_q:
                blk_q //= 2
    # true f32 MXU passes when the model itself runs f32 (parity tests);
    # bf16 params keep the native bf16-multiply/f32-accumulate path
    precision = (jax.lax.Precision.HIGHEST
                 if q.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)

    # [B, 1, tk_pad]: the singleton middle dim keeps the block's
    # second-to-last dimension equal to the array's (TPU tiling rule)
    bias_p = jnp.pad(bias.astype(jnp.float32), ((0, 0), (0, tk_pad - tk)),
                     constant_values=NEG_INF)[:, None, :]
    def make_kernel(qk_axes):
        return functools.partial(
            _kernel, causal=causal, blk_q=blk_q, blk_k=blk_k,
            scale=1.0 / np.sqrt(hd), precision=precision,
            out_dtype=q.dtype, qk_axes=qk_axes, with_lse=return_lse)
    scratch = [
        pltpu.VMEM((blk_q, hd_pad), jnp.float32),   # acc
        pltpu.VMEM((blk_q, 128), jnp.float32),      # running max
        pltpu.VMEM((blk_q, 128), jnp.float32),      # running denom
    ]
    cost = pl.CostEstimate(
        flops=4 * b * nh * tq_pad * tk_pad * hd_pad,
        bytes_accessed=(b * nh * (tq_pad + 2 * tk_pad) * hd_pad
                        + b * nh * tq_pad * hd_pad) * q.dtype.itemsize,
        transcendentals=b * nh * tq_pad * tk_pad)

    if hd % 128 == 0:
        # zero-transpose layout: keep [B, T, nh*hd] (the native qkv
        # projection layout) and slice head h's 128-lane band via the
        # block index map — no [B,nh,T,hd] transposes, no hd padding
        # (the trace showed ~50 ms/step of pure transpose/pad copies)
        def prep(x, t_pad):
            x = x.reshape(b, x.shape[1], nh * hd)
            return jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]), (0, 0)))

        qt, kt, vt = prep(q, tq_pad), prep(k, tk_pad), prep(v, tk_pad)
        grid = (b, nh, tq_pad // blk_q, tk_pad // blk_k)
        out_specs = pl.BlockSpec((1, blk_q, hd),
                                 lambda g, h, i, j: (g, i, h),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, tq_pad, nh * hd), q.dtype)
        if return_lse:
            # lse rides a [b*nh, 1, tq_pad] layout (same singleton-middle
            # trick as the bias): Mosaic requires a block's last two dims
            # to divide (8, 128) or equal the array's — a (1, 1, blk_q)
            # block over [b, nh, tq_pad] fails (1 vs nh) and only
            # surfaces when lowering for a real TPU, never in interpret
            out_specs = [out_specs,
                         pl.BlockSpec((1, 1, blk_q),
                                      lambda g, h, i, j: (g * nh + h, 0, i),
                                      memory_space=pltpu.VMEM)]
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((b * nh, 1, tq_pad),
                                              jnp.float32)]
        out = pl.pallas_call(
            make_kernel(qk_axes=(2, 3)),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, blk_k),
                             lambda g, h, i, j: (g, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk_q, hd),
                             lambda g, h, i, j: (g, i, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk_k, hd),
                             lambda g, h, i, j: (g, j, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk_k, hd),
                             lambda g, h, i, j: (g, j, h),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary")),
            interpret=interpret,
        )(bias_p, qt, kt, vt)
        if return_lse:
            out, lse = out
            return out[:, :tq, :].reshape(b, tq, nh, hd), lse
        return out[:, :tq, :].reshape(b, tq, nh, hd)

    def prep(x, t_pad):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * nh, x.shape[1], hd)
        return jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]), (0, hd_pad - hd)))

    qt, kt, vt = prep(q, tq_pad), prep(k, tk_pad), prep(v, tk_pad)
    grid = (b * nh, tq_pad // blk_q, tk_pad // blk_k)
    out_specs = pl.BlockSpec((1, blk_q, hd_pad), lambda g, i, j: (g, i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b * nh, tq_pad, hd_pad), q.dtype)
    if return_lse:
        out_specs = [out_specs,
                     pl.BlockSpec((1, 1, blk_q),
                                  lambda g, i, j: (g, 0, i),
                                  memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b * nh, 1, tq_pad), jnp.float32)]
    out = pl.pallas_call(
        make_kernel(qk_axes=(1, 2)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blk_k), lambda g, i, j: (g // nh, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_q, hd_pad), lambda g, i, j: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, hd_pad), lambda g, i, j: (g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, hd_pad), lambda g, i, j: (g, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            # batch*head and q-block grid dims carry no cross-iteration
            # state; only the kv dim is sequential (online-softmax
            # scratch) — lets Mosaic pipeline/parallelize the grid
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(bias_p, qt, kt, vt)
    if return_lse:
        out, lse = out
        out = out.reshape(b, nh, tq_pad, hd_pad)[:, :, :tq, :hd]
        return jnp.transpose(out, (0, 2, 1, 3)), lse
    out = out.reshape(b, nh, tq_pad, hd_pad)[:, :, :tq, :hd]
    return jnp.transpose(out, (0, 2, 1, 3))


def _bwd_dq_kernel(bias_ref, lse_ref, delta_ref, q_ref, k_ref, v_ref,
                   do_ref, dq_ref, dq_acc, *, causal: bool, blk_q: int,
                   blk_k: int, scale: float, precision,
                   qk_axes: tuple = (1, 2)):
    """dq for one (batch*head, q-block): stream k/v blocks (sequential
    grid dim), recompute the probability tile from the saved logsumexp,
    accumulate ds @ k in VMEM.  qk_axes: grid dims carrying the
    (q-block, k-block) indices — (1, 2) on the 3-D transpose-layout
    grid, (2, 3) on the 4-D zero-transpose [b, nh, i, j] grid (same
    head-band trick as the forward)."""
    i, j = pl.program_id(qk_axes[0]), pl.program_id(qk_axes[1])

    @pl.when(j == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    def body():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision) * scale                  # [blk_q, blk_k]
        s = s + bias_ref[0]
        if causal:
            rows = i * blk_q + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, blk_k), 0)
            cols = j * blk_k + jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, blk_k), 1)
            s = jnp.where(cols <= rows, s, NEG_INF)
        lse = jnp.transpose(lse_ref[0], (1, 0))           # [blk_q, 1]
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        delta = jnp.transpose(delta_ref[0], (1, 0))       # [blk_q, 1]
        ds = p * (dp - delta) * scale
        dq_acc[:] += jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    if causal:
        @pl.when(j * blk_k <= i * blk_q + blk_q - 1)
        def _():
            body()
    else:
        body()

    @pl.when(j == pl.num_programs(qk_axes[1]) - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(bias_ref, lse_ref, delta_ref, q_ref, k_ref, v_ref,
                    do_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                    causal: bool, blk_q: int, blk_k: int, scale: float,
                    precision, qk_axes: tuple = (1, 2)):
    """dk/dv for one (batch*head, k-block): stream q/do blocks
    (sequential grid dim), recompute the TRANSPOSED probability tile,
    accumulate p^T @ do and ds^T @ q in VMEM.  qk_axes as in
    _bwd_dq_kernel ((k-block, q-block) here — k-major grid)."""
    j, i = pl.program_id(qk_axes[0]), pl.program_id(qk_axes[1])

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    def body():
        st = jax.lax.dot_general(
            k_ref[0], q_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision) * scale                  # [blk_k, blk_q]
        st = st + jnp.transpose(bias_ref[0], (1, 0))      # key bias, rows
        if causal:
            kr = j * blk_k + jax.lax.broadcasted_iota(
                jnp.int32, (blk_k, blk_q), 0)
            qc = i * blk_q + jax.lax.broadcasted_iota(
                jnp.int32, (blk_k, blk_q), 1)
            st = jnp.where(qc >= kr, st, NEG_INF)
        pt = jnp.exp(st - lse_ref[0])                     # [1,blk_q] bcast
        dv_acc[:] += jax.lax.dot_general(
            pt.astype(do_ref.dtype), do_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        dpt = jax.lax.dot_general(
            v_ref[0], do_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        dst = pt * (dpt - delta_ref[0]) * scale
        dk_acc[:] += jax.lax.dot_general(
            dst.astype(q_ref.dtype), q_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    if causal:
        # only q blocks at or below this k block's diagonal contribute
        @pl.when(i * blk_q + blk_q - 1 >= j * blk_k)
        def _():
            body()
    else:
        body()

    @pl.when(i == pl.num_programs(qk_axes[1]) - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, bias, lse, delta, do, causal: bool,
                    interpret: bool):
    """Fused-backward driver: two tiled kernels (dq; dk+dv), each
    recomputing only its [blk_q, blk_k] probability tile in VMEM from
    the forward's logsumexp — peak HBM stays O(T·hd), never O(T^2).
    lse/delta are [B*nh, 1, tq_pad] f32 (the singleton middle dim keeps
    their (1, 1, blk_q) blocks legal under Mosaic's tiling rule)."""
    b, tq, nh, hd = q.shape
    tk = k.shape[1]
    hd_pad = _round_up(hd, 128)
    tq_pad = _round_up(tq, 128)
    tk_pad = _round_up(tk, 128)
    # forward-sized tiles: the on-chip A/B at the 1b config (b8 x 1024,
    # bf16) measured blk_q 256 -> 512 and blk_k 512 -> 1024 as
    # 0.411 -> 0.397 s/step (28.6% -> 29.7% MFU) — the backward's ~4
    # live f32 tile temporaries still fit VMEM at 512 x 1024
    blk_q = next(s for s in (512, 384, 256, 128) if tq_pad % s == 0)
    blk_k = next(s for s in (1024, 768, 512, 384, 256, 128)
                 if tk_pad % s == 0)
    while blk_q * blk_k * 4 > 2 * 1024 * 1024:
        if blk_k >= blk_q and blk_k > 128:
            blk_k //= 2
            while tk_pad % blk_k:
                blk_k //= 2
        else:
            blk_q //= 2
            while tq_pad % blk_q:
                blk_q //= 2
    # A/B tuning knobs (bench only — invalid overrides are ignored):
    # TDAX_BWD_BLKQ / TDAX_BWD_BLKK pin the backward tile sizes
    _q_ovr = os.environ.get("TDAX_BWD_BLKQ")
    if _q_ovr and tq_pad % int(_q_ovr) == 0:
        blk_q = int(_q_ovr)
    _k_ovr = os.environ.get("TDAX_BWD_BLKK")
    if _k_ovr and tk_pad % int(_k_ovr) == 0:
        blk_k = int(_k_ovr)
    precision = (jax.lax.Precision.HIGHEST
                 if q.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)

    bias_p = jnp.pad(bias.astype(jnp.float32), ((0, 0), (0, tk_pad - tk)),
                     constant_values=NEG_INF)[:, None, :]
    kwargs = dict(causal=causal, blk_q=blk_q, blk_k=blk_k,
                  scale=1.0 / np.sqrt(hd), precision=precision)

    if hd % 128 == 0 and os.environ.get("TDAX_BWD_ZT") == "1":
        # zero-transpose layout (mirrors the forward's hd%128 path):
        # keep [B, T, nh*hd] — the native qkv-projection layout — and
        # slice head h's 128-lane band via the block index maps,
        # skipping the transpose layout's 4-in/3-out [B,nh,T,hd]
        # copies.  OPT-IN (TDAX_BWD_ZT=1): the on-chip A/B at the 1b
        # config measured it 0.433 vs 0.418 s/grad AGAINST the
        # transpose layout — Mosaic schedules the 3-D [b*nh, i, j]
        # grid's k-major streaming better than the 4-D head-banded
        # loads here, the opposite of the forward's result — so the
        # copies are the cheaper evil for the backward on this
        # hardware.  Kept (tested, grads identical) for future
        # shapes/generations where the trade may flip.
        def prep4(x, t_pad):
            x = x.reshape(b, x.shape[1], nh * hd)
            return jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]), (0, 0)))

        qt, kt, vt = prep4(q, tq_pad), prep4(k, tk_pad), prep4(v, tk_pad)
        dot_ = prep4(do, tq_pad)
        row_specs4 = [  # bias / lse / delta rows on the (b, h, i, j) grid
            pl.BlockSpec((1, 1, blk_k), lambda g, h, i, j: (g, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_q), lambda g, h, i, j: (g * nh + h, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_q), lambda g, h, i, j: (g * nh + h, 0, i),
                         memory_space=pltpu.VMEM),
        ]
        q_spec4 = pl.BlockSpec((1, blk_q, hd), lambda g, h, i, j: (g, i, h),
                               memory_space=pltpu.VMEM)
        k_spec4 = pl.BlockSpec((1, blk_k, hd), lambda g, h, i, j: (g, j, h),
                               memory_space=pltpu.VMEM)
        dq = pl.pallas_call(
            functools.partial(_bwd_dq_kernel, qk_axes=(2, 3), **kwargs),
            grid=(b, nh, tq_pad // blk_q, tk_pad // blk_k),
            in_specs=row_specs4 + [q_spec4, k_spec4, k_spec4, q_spec4],
            out_specs=q_spec4,
            out_shape=jax.ShapeDtypeStruct((b, tq_pad, nh * hd), q.dtype),
            scratch_shapes=[pltpu.VMEM((blk_q, hd), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary")),
            interpret=interpret,
        )(bias_p, lse, delta, qt, kt, vt, dot_)

        row_specs4_t = [  # k-block-major grid (b, h, j, i)
            pl.BlockSpec((1, 1, blk_k), lambda g, h, j, i: (g, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_q), lambda g, h, j, i: (g * nh + h, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_q), lambda g, h, j, i: (g * nh + h, 0, i),
                         memory_space=pltpu.VMEM),
        ]
        q_spec4_t = pl.BlockSpec((1, blk_q, hd), lambda g, h, j, i: (g, i, h),
                                 memory_space=pltpu.VMEM)
        k_spec4_t = pl.BlockSpec((1, blk_k, hd), lambda g, h, j, i: (g, j, h),
                                 memory_space=pltpu.VMEM)
        dk, dv = pl.pallas_call(
            functools.partial(_bwd_dkv_kernel, qk_axes=(2, 3), **kwargs),
            grid=(b, nh, tk_pad // blk_k, tq_pad // blk_q),
            in_specs=row_specs4_t + [q_spec4_t, k_spec4_t, k_spec4_t,
                                     q_spec4_t],
            out_specs=[k_spec4_t, k_spec4_t],
            out_shape=[jax.ShapeDtypeStruct((b, tk_pad, nh * hd), q.dtype),
                       jax.ShapeDtypeStruct((b, tk_pad, nh * hd), q.dtype)],
            scratch_shapes=[pltpu.VMEM((blk_k, hd), jnp.float32),
                            pltpu.VMEM((blk_k, hd), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary")),
            interpret=interpret,
        )(bias_p, lse, delta, qt, kt, vt, dot_)
        return (dq[:, :tq, :].reshape(b, tq, nh, hd),
                dk[:, :tk, :].reshape(b, tk, nh, hd),
                dv[:, :tk, :].reshape(b, tk, nh, hd))

    def prep(x, t_pad):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * nh, x.shape[1], hd)
        return jnp.pad(x, ((0, 0), (0, t_pad - x.shape[1]),
                           (0, hd_pad - hd)))

    qt, kt, vt = prep(q, tq_pad), prep(k, tk_pad), prep(v, tk_pad)
    dot_ = prep(do, tq_pad)
    row_specs = [  # bias / lse / delta rows, q-block-major grid (g, i, j)
        pl.BlockSpec((1, 1, blk_k), lambda g, i, j: (g // nh, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q), lambda g, i, j: (g, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q), lambda g, i, j: (g, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    q_spec = pl.BlockSpec((1, blk_q, hd_pad), lambda g, i, j: (g, i, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, blk_k, hd_pad), lambda g, i, j: (g, j, 0),
                          memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **kwargs),
        grid=(b * nh, tq_pad // blk_q, tk_pad // blk_k),
        in_specs=row_specs + [q_spec, k_spec, k_spec, q_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b * nh, tq_pad, hd_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((blk_q, hd_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(bias_p, lse, delta, qt, kt, vt, dot_)

    # k-block-major grid (g, j, i): same index maps with (i, j) swapped
    row_specs_t = [
        pl.BlockSpec((1, 1, blk_k), lambda g, j, i: (g // nh, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q), lambda g, j, i: (g, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, blk_q), lambda g, j, i: (g, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    q_spec_t = pl.BlockSpec((1, blk_q, hd_pad), lambda g, j, i: (g, i, 0),
                            memory_space=pltpu.VMEM)
    k_spec_t = pl.BlockSpec((1, blk_k, hd_pad), lambda g, j, i: (g, j, 0),
                            memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **kwargs),
        grid=(b * nh, tk_pad // blk_k, tq_pad // blk_q),
        in_specs=row_specs_t + [q_spec_t, k_spec_t, k_spec_t, q_spec_t],
        out_specs=[k_spec_t, k_spec_t],
        out_shape=[jax.ShapeDtypeStruct((b * nh, tk_pad, hd_pad), q.dtype),
                   jax.ShapeDtypeStruct((b * nh, tk_pad, hd_pad), q.dtype)],
        scratch_shapes=[pltpu.VMEM((blk_k, hd_pad), jnp.float32),
                        pltpu.VMEM((blk_k, hd_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(bias_p, lse, delta, qt, kt, vt, dot_)

    def unprep(x, t, t_pad):
        x = x.reshape(b, nh, t_pad, hd_pad)[:, :, :t, :hd]
        return jnp.transpose(x, (0, 2, 1, 3))

    return (unprep(dq, tq, tq_pad), unprep(dk, tk, tk_pad),
            unprep(dv, tk, tk_pad))


def _reference_mha(q, k, v, additive, precision=None) -> jnp.ndarray:
    """The XLA formulation (numerically identical to the pre-flash
    decoder/ViT attention): full [B, nh, Tq, Tk] f32 logits + softmax."""
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32,
                        precision=precision) * scale
    logits = logits + additive
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=jnp.float32,
                      precision=precision).astype(q.dtype)


@functools.lru_cache(maxsize=None)
def _build_flash(causal: bool, interpret: bool, ref_bwd: bool):
    """custom_vjp-wrapped flash attention for a static (causal, interpret)
    pair: fused forward; fused tiled backward (dq kernel + dk/dv kernel,
    peak HBM O(T*hd)) unless ref_bwd, which keeps the old
    O(Tq*Tk)-materializing reference-recompute backward."""

    @jax.custom_vjp
    def f(q, k, v, bias):
        return _flash_impl(q, k, v, bias, causal, interpret)

    if ref_bwd:
        def fwd(q, k, v, bias):
            return (_flash_impl(q, k, v, bias, causal, interpret),
                    (q, k, v, bias))

        def bwd(res, g):
            q, k, v, bias = res
            tq, tk = q.shape[1], k.shape[1]
            add = bias.astype(jnp.float32)[:, None, None, :]
            if causal:
                add = add + jnp.where(
                    jnp.tril(jnp.ones((tq, tk), dtype=bool)), 0.0, NEG_INF)

            def ref(q_, k_, v_):
                return _reference_mha(q_, k_, v_, add)

            _, vjp = jax.vjp(ref, q, k, v)
            dq, dk, dv = vjp(g)
            return dq, dk, dv, jnp.zeros_like(bias)
    else:
        def fwd(q, k, v, bias):
            o, lse = _flash_impl(q, k, v, bias, causal, interpret,
                                 return_lse=True)
            # named so a jax.checkpoint policy can SAVE the kernel's
            # residuals across a remat boundary (see decoder.remat_policy):
            # otherwise rematerialization replays the whole flash forward
            # in the backward just to regenerate o/lse, even though the
            # backward kernels only read them (q/k/v re-derive cheaply
            # from the saved qkv projection dot).
            from jax.ad_checkpoint import checkpoint_name
            o = checkpoint_name(o, "flash_out")
            lse = checkpoint_name(lse, "flash_lse")
            return o, (q, k, v, bias, o, lse)

        def bwd(res, g):
            q, k, v, bias, o, lse = res
            b, tq, nh, _ = q.shape
            tq_pad = _round_up(tq, 128)
            # delta_i = rowsum(dO_i * O_i) — the softmax-normalizer term;
            # [b*nh, 1, tq_pad] to match lse's Mosaic-legal row layout
            delta = jnp.einsum("bqhd,bqhd->bhq", g, o,
                               preferred_element_type=jnp.float32)
            delta = jnp.pad(delta, ((0, 0), (0, 0), (0, tq_pad - tq)))
            delta = delta.reshape(b * nh, 1, tq_pad)
            dq, dk, dv = _flash_bwd_impl(q, k, v, bias, lse, delta, g,
                                         causal, interpret)
            return dq, dk, dv, jnp.zeros_like(bias)

    f.defvjp(fwd, bwd)
    return f


def _get_flash(causal: bool, interpret: bool):
    return _build_flash(causal, interpret,
                        os.environ.get("TDAX_FLASH_REF_BWD") == "1")


@functools.lru_cache(maxsize=None)
def _build_flash_lse(causal: bool, interpret: bool):
    """Differentiable ``(o, lse)`` flash attention — the ring /
    context-parallel merge (tdax.ops.ring_attention) needs each chunk's
    softmax log-normalizer as a first-class, differentiated output.

    No new kernels: the lse cotangent folds into the existing tiled
    backward.  With p_ij = exp(s_ij - lse_i), d lse_i / d s_ij = p_ij,
    so the total logit gradient is
        ds_ij = p_ij * (dp_ij - delta_i) + dlse_i * p_ij
              = p_ij * (dp_ij - (delta_i - dlse_i)),
    i.e. the dq/dk/dv kernels run unchanged with the per-row constant
    delta' = rowsum(dO * O) - dlse.  (dv has no lse term: lse does not
    depend on v.)"""

    @jax.custom_vjp
    def f(q, k, v, bias):
        return _flash_impl(q, k, v, bias, causal, interpret,
                           return_lse=True)

    def fwd(q, k, v, bias):
        o, lse = _flash_impl(q, k, v, bias, causal, interpret,
                             return_lse=True)
        from jax.ad_checkpoint import checkpoint_name
        o = checkpoint_name(o, "flash_out")
        lse = checkpoint_name(lse, "flash_lse")
        return (o, lse), (q, k, v, bias, o, lse)

    def bwd(res, g):
        q, k, v, bias, o, lse = res
        do, dlse = g
        b, tq, nh, _ = q.shape
        tq_pad = _round_up(tq, 128)
        delta = jnp.einsum("bqhd,bqhd->bhq", do, o,
                           preferred_element_type=jnp.float32)
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, tq_pad - tq)))
        delta = delta.reshape(b * nh, 1, tq_pad)
        delta = delta - dlse.astype(jnp.float32)
        dq, dk, dv = _flash_bwd_impl(q, k, v, bias, lse, delta, do,
                                     causal, interpret)
        return dq, dk, dv, jnp.zeros_like(bias)

    f.defvjp(fwd, bwd)
    return f


def mha(q, k, v, mask) -> jnp.ndarray:
    """Multi-head attention used by decoder, ViT, resampler, and prefill.

    q [B, Tq, nh, hd], k/v [B, Tk, nh, hd]; ``mask`` is either an
    additive array broadcastable to [B, nh, Tq, Tk] (decode path) or an
    ``AttnSpec`` — specs take the fused Pallas kernel (on TPU, or any
    backend under TDAX_FLASH_INTERPRET=1) and the reference einsum path
    elsewhere.  Under an active ``flash_sharding(mesh)`` context the
    kernel runs per-shard via shard_map (batch/head parallel); eagerly
    multi-device inputs with no context fall back to the einsum path
    with a warning rather than hitting an unpartitionable pallas_call.
    Returns [B, Tq, nh, hd]."""
    if isinstance(mask, AttnSpec):
        ctx = current_flash_sharding()
        if ctx is not None and ctx[3] is not None:
            # context parallelism: sequence-sharded ring attention.
            # Routed regardless of flash_mode() — the ring is a SHARDING
            # semantics (chunk rotation + lse merge), needed whenever the
            # sequence axis lives on the mesh; each chunk's attention
            # uses the Pallas kernel when available and an einsum-with-
            # lse path otherwise.
            from tdax.ops.ring_attention import ring_attention
            mesh, b_ax, h_ax, s_ax = ctx
            b, tq, nh = q.shape[0], q.shape[1], q.shape[2]
            tk = k.shape[1]
            n_b = mesh.shape[b_ax] if b_ax else 1
            n_h = mesh.shape[h_ax] if h_ax else 1
            n_s = mesh.shape[s_ax]
            if (tq == tk and tq % n_s == 0 and b % n_b == 0
                    and nh % n_h == 0):
                return ring_attention(q, k, v, mask.kv_valid, mask.causal,
                                      mesh, b_ax, h_ax, s_ax)
            _warn_once(
                f"flash_sharding seq_axis={s_ax}({n_s}) needs"
                f" self-attention with divisible dims (Tq={tq}, Tk={tk},"
                f" batch={b}%{n_b}, heads={nh}%{n_h}); using the"
                " replicated attention path for this call")
        mode = flash_mode()
        if mode is not None:
            b, nh, tk = q.shape[0], q.shape[2], k.shape[1]
            if mask.kv_valid is not None:
                bias = jnp.where(mask.kv_valid > 0, 0.0, NEG_INF
                                 ).astype(jnp.float32)
            else:
                bias = jnp.zeros((b, tk), jnp.float32)
            fn = _get_flash(mask.causal, mode == "interpret")
            if ctx is not None:
                mesh, b_ax, h_ax, _s_ax = ctx
                n_b = mesh.shape[b_ax] if b_ax else 1
                n_h = mesh.shape[h_ax] if h_ax else 1
                if b % n_b == 0 and nh % n_h == 0:
                    spec = P(b_ax, None, h_ax, None)
                    # check_vma=False: pallas_call's out_shape carries no
                    # varying-mesh-axes annotation; the kernel is purely
                    # per-shard (no collectives), so the check adds nothing
                    return jax.shard_map(
                        fn, mesh=mesh,
                        in_specs=(spec, spec, spec, P(b_ax, None)),
                        out_specs=spec, check_vma=False)(q, k, v, bias)
                _warn_once(
                    f"flash_sharding mesh axes ({b_ax}={n_b}, {h_ax}={n_h})"
                    f" do not divide attention dims (batch={b}, heads={nh});"
                    " using the XLA einsum attention path")
            elif _eagerly_multidevice(q):
                _warn_once(
                    "flash attention input is committed across multiple"
                    " devices with no flash_sharding(mesh) context —"
                    " falling back to the partitionable XLA einsum path."
                    " Wrap the call in tdax.ops.flash_attention."
                    "flash_sharding(mesh) to keep the fused kernel.")
            else:
                return fn(q, k, v, bias)
        mask = mask.additive(q.shape[1], k.shape[1], q.shape[0])
    return _reference_mha(q, k, v, mask)
