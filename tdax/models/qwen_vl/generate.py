"""KV-cached autoregressive generation (greedy / temperature sampling).

Net-new over the reference (it only probes activations), rounding out
the serving surface a production VLM framework needs: a prefill pass
that builds per-layer K/V caches from the (multimodal) prompt, then a
``lax.scan`` decode loop — one token per step, static cache shapes,
everything inside a single jitted program.

Cache layout: k/v [n_layers, B, T_max, n_heads, head_dim]; attention in
the decode step masks positions > current. Works with fp or int8
(qdot) parameter trees.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tdax.models.qwen_vl.config import QwenVLConfig
from tdax.models.qwen_vl.decoder import (apply_rotary, causal_mask, mlp,
                                         rms_norm, rotary_cos_sin)
from tdax.models.qwen_vl.model import embed_inputs
from tdax.models.qwen_vl.quantize import qdot


def _attn_proj(x, layer, cfg):
    b, t, _ = x.shape
    qkv = qdot(x, layer["attn_qkv_w"]) + layer["attn_qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    shape = (b, t, cfg.num_heads, cfg.head_dim)
    return q.reshape(shape), k.reshape(shape), v.reshape(shape)


def _prefill_block(x, layer, cfg, cos, sin, mask):
    """Block forward that also returns this layer's rotated K and V."""
    h = rms_norm(x, layer["ln_1"], cfg.layer_norm_eps)
    q, k, v = _attn_proj(h, layer, cfg)
    q = apply_rotary(q, cos, sin)
    k = apply_rotary(k, cos, sin)
    scale = 1.0 / jnp.sqrt(jnp.float32(cfg.head_dim))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(x.shape)
    x = x + qdot(out, layer["attn_proj_w"])
    x = x + mlp(rms_norm(x, layer["ln_2"], cfg.layer_norm_eps), layer)
    return x, k, v


def prefill(params, cfg: QwenVLConfig, input_ids, attn_mask,
            images=None, image_positions=None, t_max: int | None = None):
    """Prompt pass: returns (hidden [B,T,H], k/v caches [L,B,T_max,nh,hd])."""
    x = embed_inputs(params, cfg, input_ids, images, image_positions)
    b, t, _ = x.shape
    t_max = t_max or t
    positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    cos, sin = rotary_cos_sin(positions, cfg.head_dim, cfg.rope_base)
    mask = causal_mask(attn_mask)

    def step(h, layer):
        h, k, v = _prefill_block(h, layer, cfg, cos, sin, mask)
        return h, (k, v)

    final, (ks, vs) = jax.lax.scan(step, x, params["layers"])
    pad = t_max - t
    if pad:
        zeros = jnp.zeros((ks.shape[0], b, pad, cfg.num_heads, cfg.head_dim),
                          ks.dtype)
        ks = jnp.concatenate([ks, zeros], axis=2)
        vs = jnp.concatenate([vs, zeros], axis=2)
    return final, ks, vs


def _decode_step(params, cfg: QwenVLConfig, tok, cur_pos, ks, vs):
    """One-token step: tok [B], cur_pos [B] per-sample positions
    (lengths + step — shorter prompts keep their own timeline, no pad
    gaps in rotary or cache).  Returns (logits [B, vocab], updated
    caches)."""
    from tdax.models.qwen_vl.quantize import embed_lookup

    b = tok.shape[0]
    x = embed_lookup(params["wte"], tok[:, None], jnp.dtype(cfg.dtype))  # [B,1,H]
    cos, sin = rotary_cos_sin(cur_pos[:, None], cfg.head_dim, cfg.rope_base)
    t_max = ks.shape[2]  # [L, B, T, nh, hd]
    key_pos = jnp.arange(t_max)[None, :]
    # per-sample writes land exactly at lengths+j, so plain causal works
    valid = key_pos <= cur_pos[:, None]
    add_mask = jnp.where(valid, 0.0, -1e30)[:, None, None, :]  # [B,1,1,T]
    # one-hot scatter: write each sample's K/V at its own position
    write = jax.nn.one_hot(cur_pos, t_max, dtype=jnp.float32)   # [B, T]
    write4 = write[:, :, None, None]

    def step(carry, inputs):
        h = carry
        layer, k_cache, v_cache = inputs
        hh = rms_norm(h, layer["ln_1"], cfg.layer_norm_eps)
        q, k, v = _attn_proj(hh, layer, cfg)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        k_cache = (k_cache * (1.0 - write4)
                   + k.astype(k_cache.dtype) * write4).astype(k_cache.dtype)
        v_cache = (v_cache * (1.0 - write4)
                   + v.astype(v_cache.dtype) * write4).astype(v_cache.dtype)
        scale = 1.0 / jnp.sqrt(jnp.float32(cfg.head_dim))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_cache,
                            preferred_element_type=jnp.float32) * scale
        logits = logits + add_mask
        probs = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v_cache,
                         preferred_element_type=jnp.float32).astype(h.dtype)
        out = out.reshape(h.shape)
        h = h + qdot(out, layer["attn_proj_w"])
        h = h + mlp(rms_norm(h, layer["ln_2"], cfg.layer_norm_eps), layer)
        return h, (k_cache, v_cache)

    final, (new_ks, new_vs) = jax.lax.scan(step, x, (params["layers"], ks, vs))
    final = rms_norm(final, params["ln_f"], cfg.layer_norm_eps)
    logits = qdot(final[:, 0, :], params["lm_head"]).astype(jnp.float32)
    return logits, new_ks, new_vs


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "temperature"))
def generate(params, cfg: QwenVLConfig, input_ids, attn_mask,
             max_new_tokens: int = 32,
             images=None, image_positions=None,
             temperature: float = 0.0,
             key: jax.Array | None = None) -> jnp.ndarray:
    """Greedy (temperature=0) or sampled generation.

    input_ids/attn_mask [B, T] right-padded prompts; returns generated
    token ids [B, max_new_tokens].
    """
    b, t = input_ids.shape
    t_max = t + max_new_tokens
    lengths = jnp.sum(attn_mask, axis=1).astype(jnp.int32)  # [B]

    hidden, ks, vs = prefill(params, cfg, input_ids, attn_mask,
                             images, image_positions, t_max=t_max)
    # logits at each prompt's LAST real token
    sel = jax.nn.one_hot(lengths - 1, t, dtype=hidden.dtype)
    last_h = jnp.einsum("bt,bth->bh", sel, hidden)
    last_h = rms_norm(last_h, params["ln_f"], cfg.layer_norm_eps)
    first_logits = qdot(last_h, params["lm_head"]).astype(jnp.float32)

    if key is None:
        key = jax.random.PRNGKey(0)

    def pick(logits, k):
        if temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(k, logits / temperature, axis=-1).astype(jnp.int32)

    tok0 = pick(first_logits, key)

    def loop(carry, i):
        tok, ks, vs, k = carry
        k, sub = jax.random.split(k)
        logits, ks, vs = _decode_step(params, cfg, tok, lengths + i, ks, vs)
        nxt = pick(logits, sub)
        return (nxt, ks, vs, k), tok

    (_, _, _, _), toks = jax.lax.scan(
        loop, (tok0, ks, vs, key), jnp.arange(max_new_tokens, dtype=jnp.int32))
    return jnp.transpose(toks, (1, 0))  # [B, max_new_tokens]