"""QWen decoder in JAX: RMSNorm, rotary, causal attention, SwiGLU.

Architecture contract: the ``transformer.h[i]`` blocks the reference
hooks (extract_activations.py:44-54) — pre-RMSNorm, fused QKV with
bias, rotary on the full head dim (base 10000), causal attention,
output projection without bias, then pre-RMSNorm SwiGLU MLP
(w1 * silu(w2) -> c_proj).

TPU-first details:
  * layer weights are STACKED [n_layers, ...] and the depth loop is a
    ``lax.scan`` — one compiled block body regardless of depth;
  * per-layer capture is emitted from the scan as a stacked
    [n_layers, batch, hidden] array of last-token vectors (the hook
    replacement — capture semantics: output of block i, i.e. the
    hidden state AFTER block i, matching ``output[0]`` in the hook,
    extract_activations.py:37-39);
  * attention logits accumulate in float32 on the MXU
    (preferred_element_type), softmax in float32, params/activations
    bfloat16-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tdax.models.qwen_vl.config import QwenVLConfig
from tdax.models.qwen_vl.quantize import qdot
from tdax.ops.flash_attention import AttnSpec, mha


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


def rotary_cos_sin(positions: jnp.ndarray, head_dim: int,
                   base: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """positions [B, T] -> cos/sin [B, T, head_dim/2], float32."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [B, T, hd/2]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, T, n_heads, head_dim]; rotate-half convention (QWen/LLaMA)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    r1 = xf1 * cos - xf2 * sin
    r2 = xf2 * cos + xf1 * sin
    return jnp.concatenate([r1, r2], axis=-1).astype(x.dtype)


def project_qkv(x: jnp.ndarray, layer: dict, cfg: QwenVLConfig,
                cos: jnp.ndarray, sin: jnp.ndarray):
    """x [B, T, H] -> rotated (q, k, v) each [B, T, nh, hd].  The single
    source of the QKV math for the forward, capture, prefill, and decode
    paths — keep them numerically identical by construction."""
    b, t, _ = x.shape
    qkv = qdot(x, layer["attn_qkv_w"]) + layer["attn_qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    shape = (b, t, cfg.num_heads, cfg.head_dim)
    q = apply_rotary(q.reshape(shape), cos, sin)
    k = apply_rotary(k.reshape(shape), cos, sin)
    return q, k, v.reshape(shape)


def attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
           mask, layer: dict, cfg: QwenVLConfig) -> jnp.ndarray:
    """Scaled masked attention + output projection.
    q [B, Tq, nh, hd], k/v [B, Tk, nh, hd]; ``mask`` is an additive
    array broadcastable to [B, nh, Tq, Tk] (decode path) or an
    ``AttnSpec`` (flash path on TPU); returns [B, Tq, H]."""
    b, tq = q.shape[0], q.shape[1]
    out = mha(q, k, v, mask).reshape(b, tq, cfg.hidden_size)
    return qdot(out, layer["attn_proj_w"])


def attention(x: jnp.ndarray, layer: dict, cfg: QwenVLConfig,
              cos: jnp.ndarray, sin: jnp.ndarray, mask) -> jnp.ndarray:
    """x [B, T, H]; mask: AttnSpec or additive [B, 1, T, T]."""
    q, k, v = project_qkv(x, layer, cfg, cos, sin)
    return attend(q, k, v, mask, layer, cfg)


def mlp(x: jnp.ndarray, layer: dict) -> jnp.ndarray:
    """QWen SwiGLU: c_proj(w1(x) * silu(w2(x)))."""
    a1 = qdot(x, layer["mlp_w1"])
    a2 = qdot(x, layer["mlp_w2"])
    inter = a1 * jax.nn.silu(a2.astype(jnp.float32)).astype(x.dtype)
    return qdot(inter, layer["mlp_proj_w"])


def block(x: jnp.ndarray, layer: dict, cfg: QwenVLConfig,
          cos: jnp.ndarray, sin: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    from jax.ad_checkpoint import checkpoint_name
    h1 = checkpoint_name(rms_norm(x, layer["ln_1"], cfg.layer_norm_eps),
                         "rms1_out")
    x = x + attention(h1, layer, cfg, cos, sin, mask)
    h2 = checkpoint_name(rms_norm(x, layer["ln_2"], cfg.layer_norm_eps),
                         "rms2_out")
    x = x + mlp(h2, layer)
    return x


def remat_policy():
    """Rematerialization policy for the scanned decoder block: save
    matmul outputs (dots) AND the flash kernel's named residuals
    (flash_out/flash_lse, see flash_attention._build_flash) — the
    backward then recomputes only elementwise work; without the names,
    every remat backward replayed the full flash forward kernel per
    block just to regenerate the residuals its backward kernels read.
    Saving them costs O(B*T*H) per block (the same order as the saved
    dots), not O(T^2)."""
    names = ["flash_out", "flash_lse"]
    if __import__("os").environ.get("TDAX_REMAT_SAVE_NORMS") == "1":
        # A/B knob: additionally save the rms_norm outputs (the qkv /
        # mlp dot inputs), trading ~64 MB/layer of saved bf16 for the
        # backward's f32 norm replays
        names += ["rms1_out", "rms2_out"]
    return jax.checkpoint_policies.save_from_both_policies(
        jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        jax.checkpoint_policies.save_only_these_names(*names))


def causal_mask(attn_mask: jnp.ndarray) -> jnp.ndarray:
    """attn_mask [B, T] (1 = real token) -> additive mask [B, 1, T, T]."""
    t = attn_mask.shape[-1]
    causal = jnp.tril(jnp.ones((t, t), dtype=bool))
    keyed = causal[None, :, :] & (attn_mask[:, None, :] > 0)
    return jnp.where(keyed, 0.0, -1e30)[:, None, :, :].astype(jnp.float32)


def decoder_capture(stacked_layers: dict, x: jnp.ndarray, cfg: QwenVLConfig,
                    attn_mask: jnp.ndarray,
                    last_token_idx: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run all blocks via scan; return (final hidden [B, T, H],
    capture [n_layers, B, H] of the last-token vector after each block)."""
    b, t, _ = x.shape
    positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    cos, sin = rotary_cos_sin(positions, cfg.head_dim, cfg.rope_base)
    mask = AttnSpec(kv_valid=attn_mask, causal=True)
    # one-hot contraction instead of a batched gather: identical result,
    # but shards cleanly over a dp-partitioned batch axis under GSPMD
    # (advanced indexing across a sharded axis lowers poorly).
    sel = jax.nn.one_hot(last_token_idx, t, dtype=x.dtype)  # [B, T]

    def step(h, layer):
        h = block(h, layer, cfg, cos, sin, mask)
        return h, jnp.einsum("bt,bth->bh", sel, h,
                             preferred_element_type=jnp.float32).astype(h.dtype)

    final, capture = jax.lax.scan(step, x, stacked_layers)
    return final, capture


def decoder(stacked_layers: dict, x: jnp.ndarray, cfg: QwenVLConfig,
            attn_mask: jnp.ndarray, remat: bool = False,
            seq_sharding=None) -> jnp.ndarray:
    """Plain depth scan without capture (training / generation path).

    ``remat=True`` rematerializes each scanned block in the backward
    pass (keeping only matmul outputs, the dots-saveable policy), so
    training memory stops scaling with every intermediate of every
    layer — the standard TPU trade of HBM for recompute FLOPs.

    ``seq_sharding`` (a NamedSharding like P("dp", "tp", None)) turns on
    Megatron-style sequence parallelism: the residual stream between
    blocks is constrained to be SHARDED over tp on the sequence axis, so
    the norms/elementwise regions run tp-local and GSPMD replaces the
    tp all-reduces after the attention/MLP down-projections with
    reduce-scatter + all-gather pairs (same ICI bytes, 1/tp the
    activation residency — under remat the per-block saved carry drops
    by tp as well).
    """
    b, t, _ = x.shape
    positions = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    cos, sin = rotary_cos_sin(positions, cfg.head_dim, cfg.rope_base)
    mask = AttnSpec(kv_valid=attn_mask, causal=True)

    def step(h, layer):
        if seq_sharding is not None:
            h = jax.lax.with_sharding_constraint(h, seq_sharding)
        return block(h, layer, cfg, cos, sin, mask), None

    if remat:
        step = jax.checkpoint(step, policy=remat_policy())
    final, _ = jax.lax.scan(step, x, stacked_layers)
    if seq_sharding is not None:
        final = jax.lax.with_sharding_constraint(final, seq_sharding)
    return final
