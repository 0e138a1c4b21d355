"""Full Qwen-VL model: init, forward, batched per-layer capture.

The capture entry point is the TPU replacement for the reference's
hook-based extraction (extract_activations.py:34-54,110-127): ONE
jitted batched forward returns [n_layers, batch, hidden] last-token
vectors directly from HBM — no per-layer device->host copies, no
batch-1 Python loop.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from tdax.models.qwen_vl.config import QwenVLConfig, VisualConfig
from tdax.models.qwen_vl.decoder import decoder, decoder_capture, rms_norm
from tdax.models.qwen_vl.quantize import embed_lookup, qdot
from tdax.models.qwen_vl.vit import interp_pos_embed, sincos_2d, visual_encode


def _dense(key, shape, scale=None, dtype=jnp.float32):
    # fan-in init: for stacked [L, in, out] weights the input dim is
    # shape[-2], not the layer axis
    if scale is None:
        scale = 1.0 / math.sqrt(shape[-2] if len(shape) > 1 else shape[0])
    return jax.random.normal(key, shape, dtype) * scale


def init_visual_params(key: jax.Array, cfg: VisualConfig, dtype) -> dict:
    ks = jax.random.split(key, 8)
    w = cfg.width
    q_grid = int(math.isqrt(cfg.n_queries))
    blocks = {
        "ln_1_w": jnp.ones((cfg.layers, w), dtype), "ln_1_b": jnp.zeros((cfg.layers, w), dtype),
        "ln_2_w": jnp.ones((cfg.layers, w), dtype), "ln_2_b": jnp.zeros((cfg.layers, w), dtype),
        "attn_qkv_w": _dense(ks[0], (cfg.layers, w, 3 * w), dtype=dtype),
        "attn_qkv_b": jnp.zeros((cfg.layers, 3 * w), dtype),
        "attn_proj_w": _dense(ks[1], (cfg.layers, w, w), dtype=dtype),
        "attn_proj_b": jnp.zeros((cfg.layers, w), dtype),
        "mlp_fc_w": _dense(ks[2], (cfg.layers, w, cfg.mlp_dim), dtype=dtype),
        "mlp_fc_b": jnp.zeros((cfg.layers, cfg.mlp_dim), dtype),
        "mlp_proj_w": _dense(ks[3], (cfg.layers, cfg.mlp_dim, w), dtype=dtype),
        "mlp_proj_b": jnp.zeros((cfg.layers, w), dtype),
    }
    d = cfg.output_dim
    resampler = {
        "query": _dense(ks[4], (cfg.n_queries, d), scale=0.02, dtype=dtype),
        "q_pos": jnp.asarray(sincos_2d(q_grid, d), dtype),
        # keys reuse the query-grid table upsampled to the patch grid
        # (Qwen's get_abs_pos semantics; see vit.interp_pos_embed)
        "kv_pos": jnp.asarray(
            interp_pos_embed(sincos_2d(q_grid, d), cfg.grid_size), dtype),
        "kv_proj_w": _dense(ks[5], (w, d), dtype=dtype),
        "ln_q_w": jnp.ones((d,), dtype), "ln_q_b": jnp.zeros((d,), dtype),
        "ln_kv_w": jnp.ones((d,), dtype), "ln_kv_b": jnp.zeros((d,), dtype),
        "attn_q_w": _dense(ks[6], (d, d), dtype=dtype), "attn_q_b": jnp.zeros((d,), dtype),
        "attn_k_w": _dense(ks[7], (d, d), dtype=dtype), "attn_k_b": jnp.zeros((d,), dtype),
        "attn_v_w": _dense(jax.random.fold_in(key, 11), (d, d), dtype=dtype),
        "attn_v_b": jnp.zeros((d,), dtype),
        "attn_out_w": _dense(jax.random.fold_in(key, 12), (d, d), dtype=dtype),
        "attn_out_b": jnp.zeros((d,), dtype),
    }
    return {
        "patch_w": _dense(jax.random.fold_in(key, 13),
                          (3 * cfg.patch_size ** 2, w), dtype=dtype),
        "pos_embed": _dense(jax.random.fold_in(key, 14),
                            (cfg.n_patches, w), scale=0.02, dtype=dtype),
        "ln_pre_w": jnp.ones((w,), dtype), "ln_pre_b": jnp.zeros((w,), dtype),
        "ln_post_w": jnp.ones((d,), dtype), "ln_post_b": jnp.zeros((d,), dtype),
        "blocks": blocks,
        "resampler": resampler,
        "proj": _dense(jax.random.fold_in(key, 15), (d, d), dtype=dtype),
    }


def init_params(key: jax.Array, cfg: QwenVLConfig, with_visual: bool = True) -> dict:
    dtype = jnp.dtype(cfg.dtype)
    ks = jax.random.split(key, 8)
    h, l = cfg.hidden_size, cfg.num_layers
    layers = {
        "ln_1": jnp.ones((l, h), dtype),
        "ln_2": jnp.ones((l, h), dtype),
        "attn_qkv_w": _dense(ks[0], (l, h, 3 * h), dtype=dtype),
        "attn_qkv_b": jnp.zeros((l, 3 * h), dtype),
        "attn_proj_w": _dense(ks[1], (l, h, h), dtype=dtype),
        "mlp_w1": _dense(ks[2], (l, h, cfg.ff_half), dtype=dtype),
        "mlp_w2": _dense(ks[3], (l, h, cfg.ff_half), dtype=dtype),
        "mlp_proj_w": _dense(ks[4], (l, cfg.ff_half, h), dtype=dtype),
    }
    params = {
        "wte": _dense(ks[5], (cfg.vocab_size, h), scale=0.02, dtype=dtype),
        "layers": layers,
        "ln_f": jnp.ones((h,), dtype),
        "lm_head": _dense(ks[6], (h, cfg.vocab_size), dtype=dtype),
    }
    if with_visual:
        params["visual"] = init_visual_params(ks[7], cfg.visual, dtype)
    return params


def embed_inputs(params: dict, cfg: QwenVLConfig, input_ids: jnp.ndarray,
                 images: jnp.ndarray | None,
                 image_positions: jnp.ndarray | None) -> jnp.ndarray:
    """Token embeddings with visual tokens scattered into image spans.

    image_positions [B, n_queries]: sequence indices of the image-pad
    span per sample (one image per sample, the reference's layout —
    extract_activations.py:71-74).  Positions of -1 disable fusion for
    that sample (text-only).
    """
    x = embed_lookup(params["wte"], input_ids, jnp.dtype(cfg.dtype))
    if images is not None:
        vis = visual_encode(images, params["visual"], cfg.visual)  # [B, nq, H]
        b = x.shape[0]
        pos = image_positions
        safe_pos = jnp.maximum(pos, 0)
        onehot_ok = (pos >= 0)[..., None]
        vis = jnp.where(onehot_ok, vis, 0.0).astype(x.dtype)
        batch_idx = jnp.arange(b)[:, None]
        keep = jnp.ones(x.shape[:2], dtype=bool).at[batch_idx, safe_pos].set(
            ~(pos >= 0))
        x = x * keep[..., None] + jnp.zeros_like(x).at[batch_idx, safe_pos].add(vis)
    return x


def extract_layer_activations(params: dict, cfg: QwenVLConfig,
                              input_ids: jnp.ndarray,
                              attn_mask: jnp.ndarray,
                              last_token_idx: jnp.ndarray,
                              images: jnp.ndarray | None = None,
                              image_positions: jnp.ndarray | None = None) -> jnp.ndarray:
    """[n_layers, batch, hidden] last-token activation capture."""
    x = embed_inputs(params, cfg, input_ids, images, image_positions)
    _, capture = decoder_capture(params["layers"], x, cfg, attn_mask,
                                 last_token_idx)
    return capture


def forward(params: dict, cfg: QwenVLConfig, input_ids: jnp.ndarray,
            attn_mask: jnp.ndarray | None = None,
            images: jnp.ndarray | None = None,
            image_positions: jnp.ndarray | None = None,
            remat: bool = False, seq_sharding=None) -> jnp.ndarray:
    """Logits [B, T, vocab].  ``remat`` rematerializes decoder blocks
    in the backward pass (training memory knob); ``seq_sharding`` turns
    on sequence parallelism between blocks (see decoder)."""
    if attn_mask is None:
        attn_mask = jnp.ones_like(input_ids)
    x = embed_inputs(params, cfg, input_ids, images, image_positions)
    x = decoder(params["layers"], x, cfg, attn_mask, remat=remat,
                seq_sharding=seq_sharding)
    x = rms_norm(x, params["ln_f"], cfg.layer_norm_eps)
    return qdot(x, params["lm_head"]).astype(jnp.float32)
