"""Qwen-VL visual encoder: OpenCLIP-bigG-style ViT + cross-attention resampler.

Architecture contract (the ``transformer.visual`` module of the
checkpoint the reference loads, extract_activations.py:23-28):
448x448 input, patch 14 conv embed (no class token), learned absolute
positional embedding over the 32x32 grid, pre-LN transformer blocks
(GELU MLP), then a Resampler — 256 learned queries cross-attending over
the kv-projected patch features with 2-D sincos positional encodings on
both sides — followed by ln_post and a final output projection to the
decoder width.

TPU-first: the patch embed is a reshape + one MXU matmul (not a conv),
the depth loop is a ``lax.scan`` over stacked block weights, and
everything is batch-jittable.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tdax.models.qwen_vl.config import VisualConfig
from tdax.models.qwen_vl.quantize import qdot


def layer_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def patch_embed(images: jnp.ndarray, w: jnp.ndarray, cfg: VisualConfig) -> jnp.ndarray:
    """images [B, 3, S, S] -> patches [B, n_patches, width] via one matmul.

    w is the conv kernel flattened to [3 * p * p, width] (channel-major
    to match a torch Conv2d(3, width, p, p) kernel reshape)."""
    b = images.shape[0]
    p, g = cfg.patch_size, cfg.grid_size
    x = images.reshape(b, 3, g, p, g, p)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(b, g * g, 3 * p * p)
    return qdot(x, w).astype(images.dtype)


def _mha(q, k, v, n_heads: int):
    """Multi-head attention on [B, T, D] inputs (already projected).

    Dense (non-causal) self- or cross-attention; on TPU this takes the
    fused Pallas flash kernel — at 1024 patch tokens the materialized
    [B, nh, T, T] f32 logits were the single largest HBM-traffic term
    of the whole capture forward."""
    from tdax.ops.flash_attention import AttnSpec, mha
    b, tq, d = q.shape
    tk = k.shape[1]
    hd = d // n_heads
    out = mha(q.reshape(b, tq, n_heads, hd),
              k.reshape(b, tk, n_heads, hd),
              v.reshape(b, tk, n_heads, hd),
              AttnSpec(kv_valid=None, causal=False))
    return out.reshape(b, tq, d)


def vit_block(x: jnp.ndarray, layer: dict, cfg: VisualConfig) -> jnp.ndarray:
    h = layer_norm(x, layer["ln_1_w"], layer["ln_1_b"], cfg.layer_norm_eps)
    qkv = qdot(h, layer["attn_qkv_w"]) + layer["attn_qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    attn = _mha(q, k, v, cfg.heads)
    attn = qdot(attn, layer["attn_proj_w"]) + layer["attn_proj_b"]
    x = x + attn
    h = layer_norm(x, layer["ln_2_w"], layer["ln_2_b"], cfg.layer_norm_eps)
    h = qdot(h, layer["mlp_fc_w"]) + layer["mlp_fc_b"]
    h = jax.nn.gelu(h.astype(jnp.float32)).astype(x.dtype)
    h = qdot(h, layer["mlp_proj_w"]) + layer["mlp_proj_b"]
    return x + h


def sincos_2d(grid: int, dim: int) -> np.ndarray:
    """2-D sincos positional embedding [grid*grid, dim], exactly the
    ``get_2d_sincos_pos_embed`` convention Qwen-VL's Resampler uses
    (MAE layout): positions flattened row-major, the FIRST dim/2 block
    encodes the column (w) coordinate and the second the row (h), each
    block = [sin | cos] over dim/4 frequencies."""
    assert dim % 4 == 0
    omega = 1.0 / (10000 ** (np.arange(dim // 4, dtype=np.float64) / (dim / 4)))
    coords = np.arange(grid, dtype=np.float64)
    out = []
    for pos in (np.tile(coords, grid),      # w varies fastest -> first half
                np.repeat(coords, grid)):   # h -> second half
        ang = np.outer(pos, omega)
        out += [np.sin(ang), np.cos(ang)]
    return np.concatenate(out, axis=1).astype(np.float32)


def interp_pos_embed(pos: np.ndarray, dst_grid: int) -> np.ndarray:
    """Qwen-VL's ``get_abs_pos`` semantics: bicubic-interpolate a square
    [src_grid**2, dim] positional table to [dst_grid**2, dim] (the
    Resampler applies its QUERY-grid sincos table to the KEYS by
    upsampling it to the patch grid; align_corners=False).  Host-side
    (runs once at init/convert time)."""
    src_grid = int(np.sqrt(pos.shape[0]))
    assert src_grid * src_grid == pos.shape[0], "pos table must be square"
    if src_grid == dst_grid:
        return np.asarray(pos, dtype=np.float32)
    import torch
    import torch.nn.functional as F
    t = torch.from_numpy(np.asarray(pos, dtype=np.float32))
    t = t.reshape(1, src_grid, src_grid, -1).permute(0, 3, 1, 2)
    t = F.interpolate(t, size=(dst_grid, dst_grid), mode="bicubic",
                      align_corners=False)
    return t.permute(0, 2, 3, 1).reshape(dst_grid * dst_grid, -1).numpy()


def resampler(x: jnp.ndarray, params: dict, cfg: VisualConfig) -> jnp.ndarray:
    """x [B, n_patches, width] -> [B, n_queries, output_dim]."""
    d = cfg.output_dim
    kv = qdot(x, params["kv_proj_w"])
    kv = layer_norm(kv, params["ln_kv_w"], params["ln_kv_b"], cfg.layer_norm_eps)
    q = layer_norm(params["query"], params["ln_q_w"], params["ln_q_b"],
                   cfg.layer_norm_eps)

    q_pos = params["q_pos"]      # [n_queries, d] sincos (grid sqrt(n_queries))
    kv_pos = params["kv_pos"]    # [n_patches, d] sincos (grid 32)

    b = x.shape[0]
    qb = jnp.broadcast_to((q + q_pos)[None], (b, cfg.n_queries, d)).astype(x.dtype)
    kb = kv + kv_pos.astype(x.dtype)

    qh = qdot(qb, params["attn_q_w"]) + params["attn_q_b"]
    kh = qdot(kb, params["attn_k_w"]) + params["attn_k_b"]
    vh = qdot(kv, params["attn_v_w"]) + params["attn_v_b"]
    out = _mha(qh, kh, vh, cfg.resampler_heads)
    out = qdot(out, params["attn_out_w"]) + params["attn_out_b"]
    return out


def visual_encode(images: jnp.ndarray, params: dict, cfg: VisualConfig) -> jnp.ndarray:
    """images [B, 3, S, S] -> visual tokens [B, n_queries, output_dim].

    The tower computes in the MODEL's dtype (taken from the ln_pre
    weights), not the input images' dtype: benches and the pipeline feed
    f32 pixels, and letting that propagate ran all 48 ViT blocks as f32
    matmuls — 0.73 s of the 1.19 s full-model step (~5% MFU) before this
    cast, 62% of the whole forward."""
    dtype = params["ln_pre_w"].dtype
    x = patch_embed(images.astype(dtype), params["patch_w"], cfg)
    x = x + params["pos_embed"].astype(x.dtype)
    x = layer_norm(x, params["ln_pre_w"], params["ln_pre_b"], cfg.layer_norm_eps)

    def step(h, layer):
        return vit_block(h, layer, cfg), None

    x, _ = jax.lax.scan(step, x, params["blocks"])
    x = resampler(x, params["resampler"], cfg)
    x = layer_norm(x, params["ln_post_w"], params["ln_post_b"], cfg.layer_norm_eps)
    return qdot(x, params["proj"]).astype(dtype)
