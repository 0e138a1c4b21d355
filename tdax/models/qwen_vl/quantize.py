"""Weight-only int8 quantization for single-chip serving.

The full Qwen-VL config is 9.66B params = 19.3 GB bf16 — over one v5e
chip's 15.75 GB HBM (measured; PARITY.md).  Per-output-channel int8
weights (q = round(w / s), s = max|w| / 127 over the input dim) cut
resident weights to ~9.7 GB and fit, with dequantization fused into
each matmul by XLA (transient bf16 tiles only).

Quantized tensors are plain pytree nodes {"q": int8, "s": f32}; the
model's matmul helper (tdax.models.qwen_vl.decoder.qdot) dispatches on
that structure, so fp and int8 parameter trees run through the same
forward code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight(w) -> dict:
    """[..., in, out] float -> {"q": int8 [..., in, out], "s": f32 [..., out]}
    with per-output-channel scales over the input dimension."""
    wf = jnp.asarray(w, dtype=jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-2) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s[..., None, :]), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def is_quantized(node) -> bool:
    return isinstance(node, dict) and set(node) == {"q", "s"}


_W8A8 = [False]


def set_w8a8(enabled: bool) -> None:
    """Opt-in W8A8 serving mode: quantized matmuls additionally quantize
    the ACTIVATIONS per token (dynamic abs-max scales) and run the
    contraction as int8 x int8 -> int32 on the MXU — 788 TOPS/s on v5e
    vs 394 TFLOP/s bf16.  Weight-only (the default) keeps activations
    exact; W8A8 introduces ~1e-2-relative activation rounding, which is
    the standard serving trade (per-token x per-channel scales).  Takes
    effect at trace time — set BEFORE jitting the model step."""
    _W8A8[0] = bool(enabled)


def w8a8_enabled() -> bool:
    import os
    return _W8A8[0] or os.environ.get("TDAX_W8A8") == "1"


def qdot(x: jnp.ndarray, w) -> jnp.ndarray:
    """Matmul accepting fp weights or {"q","s"} int8 weights; dequant is
    fused into the matmul by XLA (weights stay int8 in HBM).  Under
    set_w8a8(True) the activation side is quantized too and the MXU runs
    the native int8 path."""
    if is_quantized(w):
        if w8a8_enabled():
            xf = x.astype(jnp.float32)
            s_x = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
            s_x = jnp.maximum(s_x, 1e-12)
            xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, w["q"], (((xq.ndim - 1,), (w["q"].ndim - 2,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * s_x * w["s"]).astype(x.dtype)
        from tdax.ops.quant_matmul import qmm_supported, quant_matmul
        if qmm_supported(x, w["q"]):
            # TDAX_QMM=1 experiment: Pallas dequant-GEMM (measured A/B
            # in tdax/ops/quant_matmul.py — XLA currently ahead)
            return quant_matmul(x, w["q"], w["s"])
        out = jnp.dot(x, w["q"].astype(x.dtype),
                      preferred_element_type=jnp.float32)
        return (out * w["s"]).astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def embed_lookup(wte, ids: jnp.ndarray, dtype) -> jnp.ndarray:
    """Token-embedding gather for fp or int8 tables."""
    if is_quantized(wte):
        return (wte["q"][ids].astype(dtype) * wte["s"].astype(dtype))
    return wte[ids]


# weight names worth quantizing (the big matmuls); norms/bias/pos stay fp
_QUANT_KEYS = {
    "attn_qkv_w", "attn_proj_w", "mlp_w1", "mlp_w2", "mlp_proj_w",
    "mlp_fc_w", "lm_head", "wte", "patch_w", "kv_proj_w",
    "attn_q_w", "attn_k_w", "attn_v_w", "attn_out_w", "proj",
}


def quantize_params(params: dict) -> dict:
    """Quantize every large matmul weight in a qwen_vl param tree."""
    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k in _QUANT_KEYS:
                out[k] = quantize_weight(v)
            else:
                out[k] = v
        return out

    return walk(params)


def quantized_bytes(params: dict) -> int:
    return sum(int(np.prod(p.shape)) * p.dtype.itemsize
               for p in jax.tree.leaves(params))


def init_params_quantized(key: jax.Array, cfg, with_visual: bool = True) -> dict:
    """Random-init the model DIRECTLY in int8 on device, leaf by leaf —
    the bf16 tree never materializes (19.3 GB for the full config, over
    one chip's HBM; peak here is the int8 tree + one fp transient).

    Distribution-matches ``init_params``: same per-leaf scales (fan-in
    matmuls, 0.02 embeddings), deterministic sincos positional tables,
    unit norms, zero biases — so int8 and bf16 random-init runs are
    comparable; dtypes follow the eval_shape tree (i.e. cfg.dtype)."""
    import functools
    import math

    from tdax.models.qwen_vl.model import init_params
    from tdax.models.qwen_vl.vit import sincos_2d

    shapes = jax.eval_shape(lambda k: init_params(k, cfg, with_visual), key)

    @functools.partial(jax.jit, static_argnames=("shape", "scale", "dtype"))
    def gen_quant(k, shape, scale, dtype):
        w = jax.random.normal(k, shape, jnp.dtype(dtype)) * scale
        return quantize_weight(w)

    @functools.partial(jax.jit, static_argnames=("shape", "kind", "dtype"))
    def gen_plain(k, shape, kind, dtype):
        dt = jnp.dtype(dtype)
        if kind == "ones":
            return jnp.ones(shape, dt)
        if kind == "zeros":
            return jnp.zeros(shape, dt)
        return jax.random.normal(k, shape, dt) * 0.02

    # leaves init_params draws at scale 0.02 rather than fan-in
    _EMBED_SCALE = {"wte", "pos_embed", "query"}
    _NORM_ONES = {"ln_1", "ln_2", "ln_f"}
    counter = [0]

    def build(tree):
        out = {}
        for name, v in tree.items():
            if isinstance(v, dict):
                out[name] = build(v)
                continue
            counter[0] += 1
            sub = jax.random.fold_in(key, counter[0])
            dt = str(v.dtype)
            if name in ("q_pos", "kv_pos"):
                # deterministic sincos tables, as in init_params: queries
                # at the query grid, keys = that table upsampled to the
                # patch grid (get_abs_pos semantics)
                from tdax.models.qwen_vl.vit import interp_pos_embed
                q_grid = int(math.isqrt(cfg.visual.n_queries))
                table = sincos_2d(q_grid, cfg.visual.output_dim)
                if name == "kv_pos":
                    table = interp_pos_embed(table, cfg.visual.grid_size)
                out[name] = jnp.asarray(table, jnp.dtype(dt))
            elif name in _QUANT_KEYS:
                scale = 0.02 if name in _EMBED_SCALE else 1.0 / math.sqrt(v.shape[-2])
                out[name] = gen_quant(sub, tuple(v.shape), scale, dt)
            elif name in _NORM_ONES or (name.startswith("ln") and name.endswith("_w")):
                out[name] = gen_plain(sub, tuple(v.shape), "ones", dt)
            elif name.endswith("_b"):
                out[name] = gen_plain(sub, tuple(v.shape), "zeros", dt)
            else:
                out[name] = gen_plain(sub, tuple(v.shape), "normal", dt)
        return out

    return build(shapes)
