"""Mesh construction and parameter sharding rules.

dp = data parallel over the batch axis; tp = tensor parallel in the
Megatron pattern: QKV and the two SwiGLU up-projections are sharded on
their OUTPUT feature dim (heads / ff split across tp), the attention
and MLP down-projections on their INPUT dim (GSPMD inserts the psum),
and the LM head on vocab.  Everything else (norms, embeddings) is
replicated.  Collectives ride ICI; lay the larger mesh axis innermost
when mapping to physical devices.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, cp: int = 1,
              devices: list | None = None) -> Mesh:
    """dp x tp mesh; ``cp > 1`` adds a context-parallel axis (ring
    attention over sequence chunks, tdax.ops.ring_attention) as the
    innermost — its per-step neighbor ppermute is the most
    latency-sensitive collective, so it gets the closest ICI links."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // (tp * cp)
    if dp * tp * cp != n:
        raise ValueError(f"dp*tp*cp = {dp}*{tp}*{cp} != {n} devices")
    if cp > 1:
        grid = np.asarray(devices).reshape(dp, tp, cp)
        return Mesh(grid, ("dp", "tp", "cp"))
    grid = np.asarray(devices).reshape(dp, tp)
    return Mesh(grid, ("dp", "tp"))


def param_sharding_rules(with_visual: bool = True) -> dict:
    """PartitionSpec pytree matching tdax.models.qwen_vl param layout."""
    layers = {
        "ln_1": P(), "ln_2": P(),
        "attn_qkv_w": P(None, None, "tp"),   # [L, H, 3H] heads over tp
        "attn_qkv_b": P(None, "tp"),
        "attn_proj_w": P(None, "tp", None),  # row-parallel -> psum
        "mlp_w1": P(None, None, "tp"),
        "mlp_w2": P(None, None, "tp"),
        "mlp_proj_w": P(None, "tp", None),
    }
    rules = {
        "wte": P(),                           # replicated (gathered lookups)
        "layers": layers,
        "ln_f": P(),
        "lm_head": P(None, "tp"),             # vocab-parallel logits
    }
    if with_visual:
        vis_blocks = {
            "ln_1_w": P(), "ln_1_b": P(), "ln_2_w": P(), "ln_2_b": P(),
            "attn_qkv_w": P(None, None, "tp"), "attn_qkv_b": P(None, "tp"),
            "attn_proj_w": P(None, "tp", None), "attn_proj_b": P(),
            "mlp_fc_w": P(None, None, "tp"), "mlp_fc_b": P(None, "tp"),
            "mlp_proj_w": P(None, "tp", None), "mlp_proj_b": P(),
        }
        rules["visual"] = {
            "patch_w": P(), "pos_embed": P(),
            "ln_pre_w": P(), "ln_pre_b": P(), "ln_post_w": P(), "ln_post_b": P(),
            "blocks": vis_blocks,
            "resampler": {
                "query": P(), "q_pos": P(), "kv_pos": P(),
                "kv_proj_w": P(), "ln_q_w": P(), "ln_q_b": P(),
                "ln_kv_w": P(), "ln_kv_b": P(),
                "attn_q_w": P(None, "tp"), "attn_q_b": P("tp"),
                "attn_k_w": P(None, "tp"), "attn_k_b": P("tp"),
                "attn_v_w": P(None, "tp"), "attn_v_b": P("tp"),
                "attn_out_w": P("tp", None), "attn_out_b": P(),
            },
            "proj": P(),
        }
    return rules


def shard_params(params: dict, mesh: Mesh, rules: dict | None = None) -> dict:
    """device_put the pytree with NamedShardings from the rules."""
    rules = rules or param_sharding_rules("visual" in params)

    def put(p, spec):
        return jax.device_put(p, NamedSharding(mesh, spec))

    return jax.tree.map(put, params, rules,
                        is_leaf=lambda x: isinstance(x, P))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
