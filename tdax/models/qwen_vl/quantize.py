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


def qdot(x: jnp.ndarray, w) -> jnp.ndarray:
    """Matmul accepting fp weights or {"q","s"} int8 weights; dequant is
    fused into the matmul by XLA (weights stay int8 in HBM)."""
    if is_quantized(w):
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
