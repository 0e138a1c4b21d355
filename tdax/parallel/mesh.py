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


def make_hybrid_mesh(dcn: int, dp: int | None = None, tp: int = 1,
                     devices: list | None = None) -> Mesh:
    """Hybrid ICI x DCN mesh for multi-slice topologies (SURVEY §5
    distributed row: "a DCN axis for multi-slice").

    ``dcn`` slices form the OUTERMOST mesh axis — only collectives over
    the "dcn" axis cross the data-center network; the "dp"/"tp" axes
    stay inside a slice and ride ICI.  Intended layout: batch sharded
    over the combined ("dcn", "dp") axes (``hybrid_batch_sharding``),
    params replicated across slices — or FSDP-sharded over the
    WITHIN-slice "dp" axis only (``fsdp_sharding_rules`` with this
    mesh), so ZeRO-3 weight all-gathers never cross DCN — leaving ONE
    cross-slice gradient all-reduce per step as the only DCN traffic,
    inserted by GSPMD.  The reference's only multi-device mechanism is
    single-host device_map="auto" (extract_activations.py:26).

    On real multi-slice TPU (devices carry ``slice_index``) the grid is
    built with ``mesh_utils.create_hybrid_device_mesh`` so every
    (dp, tp) sub-grid is slice-local; on single-slice or virtual (CPU)
    device sets, contiguous blocks of the device list stand in for
    slices (the dryrun's 2x4 partition of the 8-device CPU mesh).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dcn < 1 or n % dcn:
        raise ValueError(f"{n} devices do not divide into dcn={dcn} slices")
    per_slice = n // dcn
    if dp is None:
        dp = per_slice // tp
    if dp * tp != per_slice:
        raise ValueError(f"dp*tp = {dp}*{tp} != {per_slice} devices/slice "
                         f"({n} devices / dcn={dcn})")
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if None not in slice_ids and len(slice_ids) == dcn:
        from jax.experimental import mesh_utils
        grid = mesh_utils.create_hybrid_device_mesh(
            (1, dp, tp), (dcn, 1, 1), devices=devices)
    else:
        grid = np.asarray(devices).reshape(dcn, dp, tp)
    return Mesh(grid, ("dcn", "dp", "tp"))


def hybrid_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch over every data-parallel degree: slices x within-slice dp."""
    return NamedSharding(mesh, P(("dcn", "dp")))


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


def fsdp_sharding_rules(params: dict, dp: int | Mesh,
                        base_rules: dict | None = None,
                        min_size: int = 2 ** 14) -> dict:
    """ZeRO-3-style parameter sharding rules (FSDP).

    ``dp`` may be the dp-axis size or the Mesh itself — passing the Mesh
    reads the real ``dp`` axis size, so the divisibility checks below
    can never disagree with the mesh the rules are later bound to (a
    mismatched integer would only surface later at device_put time).

    Extends the Megatron tp rules: each large leaf is ADDITIONALLY
    sharded over the ``dp`` axis on its largest tp-free dimension
    divisible by ``dp``, so parameters, gradients, and optimizer
    moments all live 1/dp-sized per device.  GSPMD turns this into the
    ZeRO-3 schedule automatically — weights are all-gathered over dp
    just before each layer's matmuls (re-gathered in the backward under
    remat) and gradients arrive via reduce-scatter instead of
    all-reduce, so peak HBM holds one layer's gathered weights instead
    of the whole replicated model.  The reference has no training
    subsystem at all (SURVEY §2.3); this is the standard production
    recipe for models whose optimizer state outgrows one device.

    Rules of thumb encoded here:
    - leaves smaller than ``min_size`` elements (norm scales, biases)
      stay on the base rule — sharding them buys nothing and every
      gather is a latency-bound collective;
    - stacked per-layer leaves (under ``layers``/``blocks``, leading
      axis = layer index that ``lax.scan`` slices) never shard dim 0:
      a dynamic-slice across a sharded scan axis would force a gather
      of the WHOLE stack per step;
    - the dim already carrying "tp" is skipped (a dim can host one
      mesh axis).

    ``params`` may be real arrays or ``jax.eval_shape`` abstractions —
    only shapes are read.
    """
    if isinstance(dp, Mesh):
        dp = int(dp.shape["dp"])
    base = base_rules or param_sharding_rules("visual" in params)

    def extend(path, leaf, spec):
        base_spec = spec
        spec = tuple(spec) + (None,) * (leaf.ndim - len(spec))
        if leaf.size < min_size:
            return base_spec
        stacked = any(getattr(k, "key", None) in ("layers", "blocks")
                      for k in path)
        cand = [(leaf.shape[d], d) for d in range(1 if stacked else 0, leaf.ndim)
                if spec[d] is None and leaf.shape[d] % dp == 0]
        if not cand:
            return base_spec
        d = max(cand)[1]
        out = ["dp" if i == d else s for i, s in enumerate(spec)]
        while out and out[-1] is None:   # P(a, None) and P(a) are distinct
            out.pop()                    # tuples; keep the canonical short form
        return P(*out)

    return jax.tree_util.tree_map_with_path(extend, params, base)


def named_shardings(mesh: Mesh, rules: dict) -> dict:
    """PartitionSpec pytree -> NamedSharding pytree (for
    with_sharding_constraint / device_put)."""
    return jax.tree.map(lambda s: NamedSharding(mesh, s), rules,
                        is_leaf=lambda x: isinstance(x, P))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
