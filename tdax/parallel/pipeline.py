"""GPipe-style pipeline parallelism for the decoder over a ``pp`` mesh axis.

The reference's only multi-device mechanism is HF Accelerate's
``device_map="auto"`` (extract_activations.py:26) — naive layer-wise
placement where exactly ONE device works at a time while activations
hop GPUs.  tdax's tensor-parallel rules (tdax.parallel.mesh) replace it
for the capture path; this module adds the other classic axis: the
stacked [L, ...] layer weights are sharded over ``pp`` (each device
holds L/pp contiguous blocks) and microbatches stream through the
stages with ``jax.lax.ppermute`` — point-to-point ICI traffic of one
[mb, T, H] activation per step instead of tp's per-matmul all-reduces,
the right trade when ICI bandwidth (not HBM) binds or when heads/ffn
don't divide the chip count.

Schedule: the standard GPipe loop.  With S stages and M microbatches,
step s has stage k processing microbatch ``s - k`` (valid when
``0 <= s - k < M``), so a full forward takes ``M + S - 1`` steps with a
bubble fraction (S-1)/(M+S-1).  Bubble-step compute is clamped
duplicate work whose results are never selected, so autodiff through
the schedule contributes zero gradient from the bubbles.

Everything is expressed with ``jax.shard_map`` + collectives — no
hand-rolled send/recv runtime; XLA lowers ppermute to ICI
collective-permute, and the same program runs unchanged on the CPU
dryrun mesh.  Embedding (token + visual fusion), the final norm, and
the LM head stay ordinary GSPMD code outside the pipeline region.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tdax.models.qwen_vl.config import QwenVLConfig
from tdax.models.qwen_vl.decoder import (AttnSpec, block, rms_norm,
                                         rotary_cos_sin)
from tdax.models.qwen_vl.model import embed_inputs
from tdax.models.qwen_vl.quantize import qdot
from tdax.parallel.train import masked_ce


def make_pp_mesh(pp: int, dp: int | None = None,
                 devices: list | None = None) -> Mesh:
    """(dp, pp) mesh; pp innermost so stage hops ride neighbor ICI links."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // pp
    if dp * pp != n:
        raise ValueError(f"dp*pp = {dp}*{pp} != {n} devices")
    return Mesh(np.asarray(devices).reshape(dp, pp), ("dp", "pp"))


def shard_params_pp(params: dict, mesh: Mesh) -> dict:
    """device_put for the pipeline: every stacked [L, ...] layer leaf is
    split over pp on the layer axis; everything else is replicated."""
    def spec_for(path, _):
        return P("pp") if path and path[0].key == "layers" else P()

    specs = jax.tree_util.tree_map_with_path(spec_for, params)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)


def pipeline_blocks(layers: dict, x: jnp.ndarray, cfg: QwenVLConfig,
                    attn_mask: jnp.ndarray, mesh: Mesh, n_micro: int,
                    remat: bool = False) -> jnp.ndarray:
    """Run the decoder blocks over the GPipe schedule.

    ``layers``: the stacked [L, ...] weight pytree, sharded P("pp") on
    the layer axis (shard_params_pp); ``x`` [B, T, H] embedded inputs,
    batch sharded over dp.  ``cfg.num_layers`` must divide by pp and
    the per-dp batch by ``n_micro``.  Returns the final hidden state
    [B, T, H], psum-broadcast over pp (replicated), so downstream
    ln_f / lm_head / loss run as ordinary GSPMD code.
    """
    pp = mesh.shape["pp"]
    dp = mesh.shape.get("dp", 1)
    b, t, hdim = x.shape
    if cfg.num_layers % pp:
        raise ValueError(f"num_layers={cfg.num_layers} not divisible by pp={pp}")
    b_loc = b // dp
    if b_loc % n_micro:
        raise ValueError(f"per-dp batch {b_loc} not divisible by n_micro={n_micro}")
    mb = b_loc // n_micro
    n_steps = n_micro + pp - 1

    def stage_scan(layers_local, h, kv_valid, cos, sin):
        mask = AttnSpec(kv_valid=kv_valid, causal=True)

        def step(carry, layer):
            return block(carry, layer, cfg, cos, sin, mask), None

        if remat:
            from tdax.models.qwen_vl.decoder import remat_policy
            step = jax.checkpoint(step, policy=remat_policy())
        out, _ = jax.lax.scan(step, h, layers_local)
        return out

    def fn(layers_local, x_loc, mask_loc):
        stage = jax.lax.axis_index("pp")
        xm = x_loc.reshape(n_micro, mb, t, hdim)
        maskm = mask_loc.reshape(n_micro, mb, t)
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (mb, t))
        cos, sin = rotary_cos_sin(positions, cfg.head_dim, cfg.rope_base)

        def sched_step(state, s):
            # stage k at step s processes microbatch s - k (clamped:
            # out-of-range steps are bubble work, never selected below)
            my_mb = jnp.clip(s - stage, 0, n_micro - 1)
            inp = jnp.where(
                stage == 0,
                jax.lax.dynamic_index_in_dim(xm, jnp.clip(s, 0, n_micro - 1),
                                             0, keepdims=False),
                state)
            kv_valid = jax.lax.dynamic_index_in_dim(maskm, my_mb, 0,
                                                    keepdims=False)
            h = stage_scan(layers_local, inp, kv_valid, cos, sin)
            nxt = jax.lax.ppermute(
                h, "pp", [(i, i + 1) for i in range(pp - 1)])
            return nxt, h

        init = jnp.zeros((mb, t, hdim), x_loc.dtype)
        _, hs = jax.lax.scan(sched_step, init, jnp.arange(n_steps))
        # the last stage emitted microbatch s-(pp-1) at step s: rows
        # pp-1 .. pp-1+n_micro-1 are the real outputs there; mask the
        # other stages to zero and psum-broadcast the one real copy.
        valid = hs[pp - 1:pp - 1 + n_micro]        # [n_micro, mb, T, H]
        out = jnp.where(stage == pp - 1, valid, jnp.zeros_like(valid))
        out = jax.lax.psum(out, "pp")
        return out.reshape(b_loc, t, hdim)

    fn_sm = shard_map(
        fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("pp"), layers), P("dp"), P("dp")),
        out_specs=P("dp"),
        check_vma=False)
    return fn_sm(layers, x, attn_mask)


def pipeline_forward(params: dict, cfg: QwenVLConfig, input_ids: jnp.ndarray,
                     attn_mask: jnp.ndarray | None, mesh: Mesh,
                     n_micro: int,
                     images: jnp.ndarray | None = None,
                     image_positions: jnp.ndarray | None = None,
                     remat: bool = False) -> jnp.ndarray:
    """Logits [B, T, vocab] — pipeline-parallel equivalent of
    tdax.models.qwen_vl.forward (identical per-layer arithmetic; the
    layer stack lives pp-sharded instead of resident on every chip)."""
    if attn_mask is None:
        attn_mask = jnp.ones_like(input_ids)
    x = embed_inputs(params, cfg, input_ids, images, image_positions)
    x = pipeline_blocks(params["layers"], x, cfg, attn_mask, mesh, n_micro,
                        remat=remat)
    x = rms_norm(x, params["ln_f"], cfg.layer_norm_eps)
    return qdot(x, params["lm_head"]).astype(jnp.float32)


def make_train_step_pp(cfg: QwenVLConfig,
                       optimizer: optax.GradientTransformation,
                       mesh: Mesh, n_micro: int, remat: bool = False):
    """Pipeline-parallel train step: same contract as
    tdax.parallel.train.make_train_step, with the decoder layers sharded
    over pp (shard_params_pp) and microbatches streamed through the
    GPipe schedule.  Gradients flow back through the ppermute chain
    (reverse collective-permute); GSPMD handles the dp gradient psums
    and keeps the adamw update local to each stage's layer shard."""

    def loss_fn(p, batch):
        logits = pipeline_forward(p, cfg, batch["input_ids"],
                                  batch["attn_mask"], mesh, n_micro,
                                  remat=remat)
        return masked_ce(logits, batch["input_ids"], batch["attn_mask"])

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))
