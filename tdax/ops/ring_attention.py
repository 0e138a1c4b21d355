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
    across k-blocks, lifted to ring steps.

Causal load balance — the ZIGZAG layout: with plain contiguous chunks
under causality, device 0's chunk attends 1 chunk while device cp-1's
attends cp, so the ring's wall-clock is the worst device.  The causal
ring therefore re-lays the sequence out as 2cp half-chunks with device
i holding halves (i, 2cp-1-i) — one early half plus its mirror-image
late half.  Under that pairing every ring step costs the SAME two
dense half-blocks on every device (the self step costs three, once per
device — see ``_zigzag_step_blocks``, pinned by a test to per-device
totals equal across the ring):
  * visiting pair from device j == i: plain causal attention of the
    locally concatenated halves (their global order is increasing, so
    the kernel's local lower-triangle IS the global causal mask);
  * j < i: both local q halves attend ONLY the visiting early half
    (the visiting late half 2cp-1-j is in every local row's future);
  * j > i: only the local late half attends, and it attends BOTH
    visiting halves (they are both in its past).
The re-layout is four ppermute pairs on entry (q/k/v/bias halves) and
one on exit (the output back to contiguous order) — neighbor-grade
point-to-point traffic of 5 chunk-sizes total, amortized over the
ring's cp x chunk-size rotation.  Rotary/position semantics are
untouched: rotary is applied to q/k BEFORE the op, and the op restores
the contiguous layout before returning, so it stays a drop-in ``mha``.
Dense (non-causal) rings are balanced already and keep contiguous
chunks, as does a causal ring whose local chunk length is odd
(T % 2cp != 0) or TDAX_NO_ZIGZAG=1 (the A/B switch).

Each chunk's attention is the fused Pallas kernel when available
(``flash_mode()``), via the differentiable (o, lse) variant
``_build_flash_lse`` — its backward folds the lse cotangent into the
existing tiled kernels — and an einsum-with-lse path otherwise (CPU
tests / TDAX_NO_FLASH=1).  The whole ring is reverse-mode
differentiable: scan + ppermute + switch + custom_vjp all have
transpose rules, so the training path gets context parallelism with no
bespoke backward pass.

Convention notes: the kernel emits lse = 0 (not -inf) for rows with no
visible key (exp(s - 0) underflows in its backward — see
flash_attention._kernel).  A merge would mis-weight such rows, so the
per-chunk wrapper rewrites them to NEG_INF from the bias itself:
row r of a causal chunk sees a valid key iff any of bias[:r+1] is
finite (a cumulative any); a dense chunk's rows all see the same keys
(a plain any).
"""

from __future__ import annotations

import functools
import os

import numpy as np

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


# --- zigzag layout ------------------------------------------------------------

def _zigzag_tables(cp: int):
    """Static routing tables for the zigzag half-chunk layout.

    Contiguous device i holds halves (2i, 2i+1); zigzag device j holds
    (j, 2cp-1-j).  Half h's zigzag home is min(h, 2cp-1-h), and the two
    halves of any device have opposite parity (they sum to the odd
    2cp-1), so the relayout decomposes into exactly two device
    permutations: ``p_lo`` routes every contiguous EARLY half (2i) and
    ``p_hi`` every LATE half (2i+1).  ``a_is_lo[j]`` says whether the
    half arriving at j via p_lo is j's zigzag-early slot (value j) or
    its late slot (value 2cp-1-j)."""
    d_lo = [2 * i if 2 * i < cp else 2 * cp - 1 - 2 * i for i in range(cp)]
    d_hi = [2 * i + 1 if 2 * i + 1 < cp else 2 * cp - 2 - 2 * i
            for i in range(cp)]
    assert sorted(d_lo) == list(range(cp)) and sorted(d_hi) == list(range(cp))
    p_lo = [(i, d_lo[i]) for i in range(cp)]
    p_hi = [(i, d_hi[i]) for i in range(cp)]
    inv_lo = [(d_lo[i], i) for i in range(cp)]
    inv_hi = [(d_hi[i], i) for i in range(cp)]
    a_is_lo = np.zeros(cp, dtype=bool)
    for i in range(cp):
        a_is_lo[d_lo[i]] = (2 * i == d_lo[i])
    return p_lo, p_hi, inv_lo, inv_hi, a_is_lo


def _zigzag_step_blocks(cp: int, device: int, src: int) -> int:
    """Dense half-block count device ``device`` computes when the
    visiting pair originates at ``src`` (the schedule's cost model; a
    causal half-block counts 1 like the kernel's block-skip grid does).
    Mirrored by the balance test."""
    if src == device:
        return 3        # lo-lo causal + hi-lo dense + hi-hi causal
    return 2            # past: 2 q-halves x 1 k-half; future: 1 x 2


def _to_zigzag(x, axis: int, axis_name: str, my, tables):
    p_lo, p_hi, _, _, a_is_lo = tables
    hl = x.shape[axis] // 2
    lo = lax.slice_in_dim(x, 0, hl, axis=axis)
    hi = lax.slice_in_dim(x, hl, 2 * hl, axis=axis)
    a = lax.ppermute(lo, axis_name, p_lo)
    b = lax.ppermute(hi, axis_name, p_hi)
    isl = jnp.asarray(a_is_lo)[my]
    return jnp.concatenate([jnp.where(isl, a, b), jnp.where(isl, b, a)],
                           axis=axis)


def _from_zigzag(x, axis: int, axis_name: str, my, tables):
    _, _, inv_lo, inv_hi, _ = tables
    hl = x.shape[axis] // 2
    lo = lax.slice_in_dim(x, 0, hl, axis=axis)          # half value: my
    hi = lax.slice_in_dim(x, hl, 2 * hl, axis=axis)     # half: 2cp-1-my
    j_even = (my % 2) == 0
    even = jnp.where(j_even, lo, hi)                    # the even-index half
    odd = jnp.where(j_even, hi, lo)
    recv_lo = lax.ppermute(even, axis_name, inv_lo)     # arrives as half 2i
    recv_hi = lax.ppermute(odd, axis_name, inv_hi)      # arrives as half 2i+1
    return jnp.concatenate([recv_lo, recv_hi], axis=axis)


def _ring_local_zigzag(q, k, v, bias, *, cp: int, axis: str):
    """Causal ring body in the zigzag layout (see module docstring)."""
    b, tl, nh, hd = q.shape
    hl = tl // 2
    my = lax.axis_index(axis)
    tables = _zigzag_tables(cp)
    qz = _to_zigzag(q, 1, axis, my, tables)
    kz = _to_zigzag(k, 1, axis, my, tables)
    vz = _to_zigzag(v, 1, axis, my, tables)
    bz = _to_zigzag(bias, 1, axis, my, tables)
    perm = [(i, (i + 1) % cp) for i in range(cp)]

    def step(carry, _):
        kc, vc, bc, o_acc, lse_acc, src = carry

        def self_branch(_):
            # local concat order (i, 2cp-1-i) is globally increasing, so
            # the kernel's LOCAL lower-triangle equals the global mask
            return _chunk_attn(qz, kc, vc, bc, True)

        def past_branch(_):
            # visiting pair (j, 2cp-1-j), j < my: both local halves are
            # strictly after half j and strictly before half 2cp-1-j
            return _chunk_attn(qz, kc[:, :hl], vc[:, :hl], bc[:, :hl],
                               False)

        def future_branch(_):
            # j > my: only the local LATE half (2cp-1-my) attends, and
            # both visiting halves are in its past
            o_hi, lse_hi = _chunk_attn(qz[:, hl:], kc, vc, bc, False)
            o = jnp.concatenate(
                [jnp.zeros((b, hl, nh, hd), o_hi.dtype), o_hi], axis=1)
            lse = jnp.concatenate(
                [jnp.full((b, nh, hl), NEG_INF, jnp.float32), lse_hi],
                axis=2)
            return o, lse

        case = jnp.where(src == my, 0, jnp.where(src < my, 1, 2))
        o_s, lse_s = lax.switch(
            case, [self_branch, past_branch, future_branch], None)
        o_acc, lse_acc = _merge(o_acc, lse_acc, o_s, lse_s)
        kc = lax.ppermute(kc, axis, perm)
        vc = lax.ppermute(vc, axis, perm)
        bc = lax.ppermute(bc, axis, perm)
        # device i receives from i-1, which held the pair from (i-1) - s
        src = (src - 1) % cp
        return (kc, vc, bc, o_acc, lse_acc, src), None

    o0 = jnp.zeros((b, tl, nh, hd), jnp.float32)
    lse0 = jnp.full((b, nh, tl), NEG_INF, jnp.float32)
    (_, _, _, o, _, _), _ = lax.scan(
        step, (kz, vz, bz, o0, lse0, my), None, length=cp)
    return _from_zigzag(o.astype(q.dtype), 1, axis, my, tables)


def _ring_local(q, k, v, bias, *, causal: bool, cp: int, axis: str):
    """Per-device ring body (runs inside shard_map; all shapes local)."""
    b, tl, nh, hd = q.shape
    if (causal and cp > 1 and tl % 2 == 0
            and os.environ.get("TDAX_NO_ZIGZAG") != "1"):
        return _ring_local_zigzag(q, k, v, bias, cp=cp, axis=axis)
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
