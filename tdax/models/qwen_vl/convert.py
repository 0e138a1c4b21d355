"""HF Qwen-VL-Chat checkpoint -> tdax stacked pytree.

Maps the state-dict names of the checkpoint the reference downloads
(download_model.py:4-13; module paths per extract_activations.py:49
``transformer.h[i]``) onto tdax's scan-stacked layout.  torch Linear
weights are [out, in] and are transposed to [in, out] for x @ W; the
per-layer tensors are stacked along a leading layer axis.

Key-by-key HF -> pytree map (T = transpose, S = stack over layers i):

  transformer.wte.weight                  -> wte
  transformer.ln_f.weight                 -> ln_f
  lm_head.weight                          -> lm_head (T)
  transformer.h.{i}.ln_1.weight           -> layers.ln_1 (S)
  transformer.h.{i}.ln_2.weight           -> layers.ln_2 (S)
  transformer.h.{i}.attn.c_attn.weight    -> layers.attn_qkv_w (S,T)
  transformer.h.{i}.attn.c_attn.bias      -> layers.attn_qkv_b (S)
  transformer.h.{i}.attn.c_proj.weight    -> layers.attn_proj_w (S,T)
  transformer.h.{i}.mlp.w1.weight         -> layers.mlp_w1 (S,T)
  transformer.h.{i}.mlp.w2.weight         -> layers.mlp_w2 (S,T)
  transformer.h.{i}.mlp.c_proj.weight     -> layers.mlp_proj_w (S,T)
  transformer.visual.conv1.weight         -> visual.patch_w (reshape+T)
  transformer.visual.positional_embedding -> visual.pos_embed
  transformer.visual.ln_pre.{w,b}         -> visual.ln_pre_{w,b}
  transformer.visual.ln_post.{w,b}        -> visual.ln_post_{w,b}
  transformer.visual.proj                 -> visual.proj (already [in, out])
  transformer.visual.transformer.resblocks.{i}.*
                                          -> visual.blocks.* (S; Linears T)
  transformer.visual.attn_pool.query      -> visual.resampler.query
  transformer.visual.attn_pool.pos_embed  -> visual.resampler.q_pos, and
                                             bicubic-upsampled to the patch
                                             grid -> visual.resampler.kv_pos
  transformer.visual.attn_pool.kv_proj.weight -> visual.resampler.kv_proj_w (T)
  transformer.visual.attn_pool.ln_{q,kv}.{w,b} -> visual.resampler.ln_*
  transformer.visual.attn_pool.attn.in_proj_{weight,bias} (rows split q|k|v)
                                          -> visual.resampler.attn_{q,k,v}_{w,b} (T)
  transformer.visual.attn_pool.attn.out_proj.{weight,bias}
                                          -> visual.resampler.attn_out_{w,b} (T)

Runs on CPU numpy; the resulting pytree is device_put by the caller
(optionally sharded — tdax.parallel.shard_params).
"""

from __future__ import annotations

import glob
import os

import numpy as np

from tdax.models.qwen_vl.config import QwenVLConfig
from tdax.models.qwen_vl.vit import interp_pos_embed, sincos_2d


def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


def _stack(state: dict, template: str, n: int, transpose: bool) -> np.ndarray:
    arrs = [state[template.format(i=i)] for i in range(n)]
    return np.stack([_t(a) if transpose else a for a in arrs])


def convert_hf_state_dict(state: dict[str, np.ndarray], cfg: QwenVLConfig,
                          dtype=np.float32) -> dict:
    """state: flat dict of numpy arrays with HF names."""
    l = cfg.num_layers
    p = "transformer.h.{i}."
    layers = {
        "ln_1": _stack(state, p + "ln_1.weight", l, False),
        "ln_2": _stack(state, p + "ln_2.weight", l, False),
        "attn_qkv_w": _stack(state, p + "attn.c_attn.weight", l, True),
        "attn_qkv_b": _stack(state, p + "attn.c_attn.bias", l, False),
        "attn_proj_w": _stack(state, p + "attn.c_proj.weight", l, True),
        "mlp_w1": _stack(state, p + "mlp.w1.weight", l, True),
        "mlp_w2": _stack(state, p + "mlp.w2.weight", l, True),
        "mlp_proj_w": _stack(state, p + "mlp.c_proj.weight", l, True),
    }
    params = {
        "wte": state["transformer.wte.weight"],
        "layers": layers,
        "ln_f": state["transformer.ln_f.weight"],
        "lm_head": _t(state["lm_head.weight"]),
    }
    if any(k.startswith("transformer.visual.") for k in state):
        params["visual"] = _convert_visual(state, cfg)
    out = {}

    def cast(tree):
        if isinstance(tree, dict):
            return {k: cast(v) for k, v in tree.items()}
        return np.asarray(tree, dtype=dtype)

    out = cast(params)
    return out


def _convert_visual(state: dict[str, np.ndarray], cfg: QwenVLConfig) -> dict:
    v = cfg.visual
    pv = "transformer.visual."
    pb = pv + "transformer.resblocks.{i}."
    n = v.layers
    blocks = {
        "ln_1_w": _stack(state, pb + "ln_1.weight", n, False),
        "ln_1_b": _stack(state, pb + "ln_1.bias", n, False),
        "ln_2_w": _stack(state, pb + "ln_2.weight", n, False),
        "ln_2_b": _stack(state, pb + "ln_2.bias", n, False),
        "attn_qkv_w": _stack(state, pb + "attn.in_proj_weight", n, True),
        "attn_qkv_b": _stack(state, pb + "attn.in_proj_bias", n, False),
        "attn_proj_w": _stack(state, pb + "attn.out_proj.weight", n, True),
        "attn_proj_b": _stack(state, pb + "attn.out_proj.bias", n, False),
        "mlp_fc_w": _stack(state, pb + "mlp.c_fc.weight", n, True),
        "mlp_fc_b": _stack(state, pb + "mlp.c_fc.bias", n, False),
        "mlp_proj_w": _stack(state, pb + "mlp.c_proj.weight", n, True),
        "mlp_proj_b": _stack(state, pb + "mlp.c_proj.bias", n, False),
    }
    conv = state[pv + "conv1.weight"]  # [width, 3, p, p]
    patch_w = _t(conv.reshape(conv.shape[0], -1))  # [3*p*p, width]

    rp = pv + "attn_pool."
    d = v.output_dim
    in_w = state[rp + "attn.in_proj_weight"]  # [3d, d]
    in_b = state[rp + "attn.in_proj_bias"]
    q_grid = int(np.sqrt(v.n_queries))
    # the checkpoint's attn_pool.pos_embed is the query-grid sincos table;
    # queries add it directly, keys add the SAME table bicubic-upsampled
    # to the patch grid (Qwen's get_abs_pos on x.size(1))
    q_pos = state.get(rp + "pos_embed", sincos_2d(q_grid, d))
    resampler = {
        "query": state[rp + "query"],
        "q_pos": q_pos,
        "kv_pos": interp_pos_embed(q_pos, v.grid_size),
        "kv_proj_w": _t(state[rp + "kv_proj.weight"]),
        "ln_q_w": state[rp + "ln_q.weight"], "ln_q_b": state[rp + "ln_q.bias"],
        "ln_kv_w": state[rp + "ln_kv.weight"], "ln_kv_b": state[rp + "ln_kv.bias"],
        "attn_q_w": _t(in_w[:d]), "attn_q_b": in_b[:d],
        "attn_k_w": _t(in_w[d:2 * d]), "attn_k_b": in_b[d:2 * d],
        "attn_v_w": _t(in_w[2 * d:]), "attn_v_b": in_b[2 * d:],
        "attn_out_w": _t(state[rp + "attn.out_proj.weight"]),
        "attn_out_b": state[rp + "attn.out_proj.bias"],
    }
    return {
        "patch_w": patch_w,
        "pos_embed": state[pv + "positional_embedding"],
        "ln_pre_w": state[pv + "ln_pre.weight"], "ln_pre_b": state[pv + "ln_pre.bias"],
        "ln_post_w": state[pv + "ln_post.weight"], "ln_post_b": state[pv + "ln_post.bias"],
        "blocks": blocks,
        "resampler": resampler,
        "proj": state[pv + "proj"],  # stored as [d, d] matrix (not a Linear)
    }


def load_hf_state_dict(model_dir: str) -> dict[str, np.ndarray]:
    """Read a local HF checkpoint dir into a flat {name: float32 array}.

    Handles the real layouts an HF snapshot can have:
      * sharded safetensors (``model-0000X-of-0000N.safetensors`` + a
        ``*.safetensors.index.json``) — loaded via safetensors.torch so
        bfloat16 shards (numpy has no bf16) convert cleanly;
      * single ``model.safetensors``;
      * torch ``pytorch_model*.bin`` shards (the Qwen-VL-Chat snapshot
        the reference downloads ships 10 such shards).
    Duplicate keys across shards are rejected (a corrupt snapshot should
    fail loudly, not silently last-write-win).
    """
    state: dict[str, np.ndarray] = {}

    def merge(shard: dict, src: str) -> None:
        for k, t in shard.items():
            if k in state:
                raise ValueError(f"duplicate checkpoint key {k!r} in {src}")
            state[k] = t

    st_files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if st_files:
        from safetensors.torch import load_file
        for f in st_files:
            merge({k: t.float().numpy() for k, t in load_file(f).items()}, f)
        return state
    bin_files = sorted(glob.glob(os.path.join(model_dir, "pytorch_model*.bin")))
    bin_files = [f for f in bin_files if os.path.getsize(f) > 0]
    if not bin_files:
        raise FileNotFoundError(f"no checkpoint shards under {model_dir}")
    import torch
    for f in bin_files:
        shard = torch.load(f, map_location="cpu", weights_only=True)
        merge({k: t.float().numpy() for k, t in shard.items()}, f)
    return state


def load_qwen_checkpoint(model_dir: str, cfg: QwenVLConfig,
                         dtype=np.float32) -> dict:
    """model_dir -> tdax params pytree (numpy; caller device_puts)."""
    return convert_hf_state_dict(load_hf_state_dict(model_dir), cfg, dtype)
