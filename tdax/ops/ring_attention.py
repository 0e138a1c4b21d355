"""Ring attention: context-parallel self-attention over a mesh axis.

The last classic parallelism axis alongside dp/tp/pp/sp (the reference
has none of them — its only multi-device mechanism is Accelerate's
``device_map="auto"`` layer placement, extract_activations.py:26).
Context parallelism shards the SEQUENCE axis of q/k/v over the mesh, so
per-device activation memory for attention scales as T/cp — the TPU-
native way to train past one chip's sequence capacity.

Mechanics (per device, inside ``jax.shard_map``):
  * each device holds one contiguous sequence chunk of q, k, v and of
    the key-validity bias;
  * k/v/bias chunks rotate around the ring via ``lax.ppermute`` (cp
    steps; neighbor-only ICI traffic, never all-gather);
  * each step computes flash attention of the local q chunk against the
    visiting k/v chunk and merges the partial result through the softmax
    log-normalizer:  with m = max(lse_a, lse_b),
        lse = m + log(e^{lse_a-m} + e^{lse_b-m})
        o   = (o_a e^{lse_a-m} + o_b e^{lse_b-m}) / (e^{lse_a-m} + e^{lse_b-m})
    which is exactly the online-softmax combine the kernel itself uses
    across k-blocks, lifted to ring steps;
  * causality is decided per step at chunk granularity: a visiting
    chunk strictly after the local chunk contributes nothing (skipped),
    the diagonal chunk runs the causal kernel (local row/col indices
    coincide with global ones there), earlier chunks run dense.

Each chunk's attention is the fused Pallas kernel when available
(``flash_mode()``), via the differentiable (o, lse) variant
``_build_flash_lse`` — its backward folds the lse cotangent into the
existing tiled kernels — and an einsum-with-lse path otherwise (CPU
tests / TDAX_NO_FLASH=1).  The whole ring is reverse-mode
differentiable: scan + ppermute + custom_vjp all have transpose rules,
so the training path gets context parallelism with no bespoke backward
pass.

Load-balance note: with plain contiguous chunks under causality, ring
step s is idle on devices whose visiting chunk is in their future —
device 0 computes 1 chunk, device cp-1 computes cp.  A zigzag chunk
assignment fixes this but complicates rotary/capture indexing; at the
chunk sizes this repo trains (T/cp >= 512) the imbalance is bounded by
the dense steps' cost and is accepted for v1.

Convention notes: the kernel emits lse = 0 (not -inf) for rows with no
visible key (exp(s - 0) underflows in its backward — see
flash_attention._kernel).  A merge would mis-weight such rows, so the
per-chunk wrapper rewrites them to NEG_INF from the bias itself:
row r of the causal diagonal chunk sees a valid key iff any of
bias[:r+1] is finite (a cumulative any); a dense chunk's rows all see
the same keys (a plain any).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from tdax.ops.flash_attention import (NEG_INF, _build_flash_lse,
                                      flash_mode)


def _reference_mha_lse(q, k, v, bias, causal: bool):
    """(o, lse) via plain XLA einsums — numerically the reference
    attention formulation plus the log-normalizer.  Rows with no
    visible key get lse ~ NEG_INF naturally (logsumexp of all-NEG_INF
    logits), which the merge treats as a zero-weight contribution."""
    b, tq, nh, hd = q.shape
    scale = 1.0 / jnp.sqrt(jnp.float32(hd))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + bias[:, None, None, :]
    if causal:
        tk = k.shape[1]
        tri = jnp.tril(jnp.ones((tq, tk), dtype=bool))
        logits = jnp.where(tri[None, None], logits, NEG_INF)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)     # [B, nh, Tq]
    p = jnp.exp(logits - lse[..., None])
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return o.astype(q.dtype), lse


def _chunk_attn(q, k, v, bias, causal: bool):
    """One ring step's attention: (o [B,Tq,nh,hd] in q.dtype,
    lse [B,nh,Tq] f32 with NEG_INF for rows seeing no valid key)."""
    mode = flash_mode()
    if mode is None:
        return _reference_mha_lse(q, k, v, bias, causal)
    b, tq, nh, _ = q.shape
    f = _build_flash_lse(causal, mode == "interpret")
    o, lse = f(q, k, v, bias)
    lse = lse.reshape(b, nh, -1)[:, :, :tq]
    # rewrite the kernel's lse=0 no-visible-key convention to NEG_INF
    kvalid = bias > NEG_INF / 2                            # [B, Tk]
    if causal:
        row_valid = jnp.cumsum(kvalid.astype(jnp.int32), axis=1) > 0
    else:
        row_valid = jnp.any(kvalid, axis=1, keepdims=True)  # [B, 1]
    lse = jnp.where(row_valid[:, None, :], lse, NEG_INF)
    return o, lse


def _merge(o_acc, lse_acc, o_s, lse_s):
    """Online-softmax combine of two partial attention results.
    o_acc f32 [B,T,nh,hd]; lse f32 [B,nh,T].  Stable: one weight is
    always exactly 1, so the denominator is >= 1."""
    m = jnp.maximum(lse_acc, lse_s)
    w_acc = jnp.exp(lse_acc - m)
    w_s = jnp.exp(lse_s - m)
    lse_new = m + jnp.log(w_acc + w_s)
    wa = jnp.transpose(w_acc, (0, 2, 1))[..., None]        # [B,T,nh,1]
    ws = jnp.transpose(w_s, (0, 2, 1))[..., None]
    o_new = (o_acc * wa + o_s.astype(jnp.float32) * ws) / (wa + ws)
    return o_new, lse_new


def _ring_local(q, k, v, bias, *, causal: bool, cp: int, axis: str):
    """Per-device ring body (runs inside shard_map; all shapes local)."""
    b, tl, nh, hd = q.shape
    my = lax.axis_index(axis)
    perm = [(i, (i + 1) % cp) for i in range(cp)]

    def skip(_):
        return (jnp.zeros((b, tl, nh, hd), q.dtype),
                jnp.full((b, nh, tl), NEG_INF, jnp.float32))

    def step(carry, _):
        kc, vc, bc, o_acc, lse_acc, chunk = carry
        if causal:
            branches = [
                lambda _: _chunk_attn(q, kc, vc, bc, True),   # diagonal
                lambda _: _chunk_attn(q, kc, vc, bc, False),  # past chunk
                skip,                                         # future chunk
            ]
            case = jnp.where(chunk == my, 0, jnp.where(chunk < my, 1, 2))
            o_s, lse_s = lax.switch(case, branches, None)
        else:
            o_s, lse_s = _chunk_attn(q, kc, vc, bc, False)
        o_acc, lse_acc = _merge(o_acc, lse_acc, o_s, lse_s)
        kc = lax.ppermute(kc, axis, perm)
        vc = lax.ppermute(vc, axis, perm)
        bc = lax.ppermute(bc, axis, perm)
        # device i receives from i-1, which held chunk (i-1) - s
        chunk = (chunk - 1) % cp
        return (kc, vc, bc, o_acc, lse_acc, chunk), None

    o0 = jnp.zeros((b, tl, nh, hd), jnp.float32)
    lse0 = jnp.full((b, nh, tl), NEG_INF, jnp.float32)
    (_, _, _, o, _, _), _ = lax.scan(
        step, (k, v, bias, o0, lse0, my), None, length=cp)
    return o.astype(q.dtype)


def ring_attention(q, k, v, kv_valid, causal: bool, mesh,
                   batch_axis: str | None, head_axis: str | None,
                   seq_axis: str):
    """Context-parallel self-attention: q/k/v [B, T, nh, hd] with T
    sharded over ``seq_axis`` (and optionally B over ``batch_axis``,
    nh over ``head_axis``); ``kv_valid`` [B, T] or None.  Returns
    [B, T, nh, hd] sharded like q.  Dispatched by ``mha`` under an
    active ``flash_sharding(mesh, ..., seq_axis=...)`` context."""
    b, t = q.shape[0], q.shape[1]
    cp = mesh.shape[seq_axis]
    if kv_valid is not None:
        bias = jnp.where(kv_valid > 0, 0.0, NEG_INF).astype(jnp.float32)
    else:
        bias = jnp.zeros((b, t), jnp.float32)
    spec = P(batch_axis, seq_axis, head_axis, None)
    fn = functools.partial(_ring_local, causal=causal, cp=cp,
                           axis=seq_axis)
    # check_vma=False for the same reason as the batch/head shard_map in
    # mha: the pallas_call inside carries no varying-mesh annotation
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(spec, spec, spec, P(batch_axis, seq_axis)),
        out_specs=spec, check_vma=False)(q, k, v, bias)
