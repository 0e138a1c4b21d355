"""HF Qwen-VL-Chat checkpoint -> tdax stacked pytree.

Maps the state-dict names of the checkpoint the reference downloads
(download_model.py:4-13; module paths per extract_activations.py:49
``transformer.h[i]``) onto tdax's scan-stacked layout.  torch Linear
weights are [out, in] and are transposed to [in, out] for x @ W; the
per-layer tensors are stacked along a leading layer axis.

Runs on CPU numpy; the resulting pytree is device_put by the caller
(optionally sharded — tdax.parallel.shard_params).
"""

from __future__ import annotations

import glob
import os

import numpy as np

from tdax.models.qwen_vl.config import QwenVLConfig
from tdax.models.qwen_vl.vit import sincos_2d


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
    # checkpoint pos_embed covers the query grid; keys use the sincos grid
    # interpolated/generated at the patch grid size
    q_pos = state.get(rp + "pos_embed", sincos_2d(q_grid, d))
    resampler = {
        "query": state[rp + "query"],
        "q_pos": q_pos,
        "kv_pos": sincos_2d(v.grid_size, d),
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
    """Read a local HF checkpoint dir (safetensors or torch .bin shards)."""
    state: dict[str, np.ndarray] = {}
    st_files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if st_files:
        from safetensors.numpy import load_file
        for f in st_files:
            state.update(load_file(f))
        return state
    bin_files = sorted(glob.glob(os.path.join(model_dir, "pytorch_model*.bin")))
    if not bin_files:
        raise FileNotFoundError(f"no checkpoint shards under {model_dir}")
    import torch
    for f in bin_files:
        shard = torch.load(f, map_location="cpu", weights_only=True)
        for k, t in shard.items():
            state[k] = t.float().numpy()
    return state


def load_qwen_checkpoint(model_dir: str, cfg: QwenVLConfig,
                         dtype=np.float32) -> dict:
    """model_dir -> tdax params pytree (numpy; caller device_puts)."""
    return convert_hf_state_dict(load_hf_state_dict(model_dir), cfg, dtype)
