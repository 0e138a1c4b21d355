"""Training step: causal-LM fine-tuning of Qwen-VL under dp x tp sharding.

The reference is inference-only; tdax adds the training path a
production deployment needs: masked next-token cross-entropy, adamw via
optax, one jitted train_step with donated params/opt-state, parameters
sharded by the Megatron rules (tdax.parallel.mesh) and the batch over
dp.  GSPMD inserts the gradient psums over tp and dp automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from tdax.models.qwen_vl import QwenVLConfig, forward


def masked_ce(logits: jnp.ndarray, input_ids: jnp.ndarray,
              attn_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked next-token cross entropy (mean over real target tokens).

    Written as ``logsumexp(logits) - logits[target]`` rather than
    gathering from ``log_softmax``: the logsumexp reduction fuses into
    one pass over the [B, T, vocab] logits, where a log_softmax OUTPUT
    (another full [B, T, vocab] f32 tensor) must materialize in HBM for
    the gather — ~1 GB of extra traffic per step at the 1B bench config.
    Same value to fp rounding (both are max-stabilized)."""
    targets = input_ids[:, 1:]
    logits = logits[:, :-1].astype(jnp.float32)
    mask = (attn_mask[:, 1:] > 0).astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return jnp.sum((lse - picked) * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def lm_loss(params: dict, cfg: QwenVLConfig, input_ids: jnp.ndarray,
            attn_mask: jnp.ndarray,
            images: jnp.ndarray | None = None,
            image_positions: jnp.ndarray | None = None,
            remat: bool = False, seq_sharding=None) -> jnp.ndarray:
    """Masked next-token cross entropy (mean over real target tokens)."""
    logits = forward(params, cfg, input_ids, attn_mask, images, image_positions,
                     remat=remat, seq_sharding=seq_sharding)
    return masked_ce(logits, input_ids, attn_mask)


def make_train_step(cfg: QwenVLConfig, optimizer: optax.GradientTransformation,
                    with_images: bool = False, remat: bool = False,
                    sp_mesh=None, cp_mesh=None):
    """Returns train_step(params, opt_state, batch) -> (params, opt_state, loss).

    ``batch``: dict with input_ids/attn_mask (+ images/image_positions
    when with_images).  jit with donated params/opt_state; shard params
    with tdax.parallel.shard_params and the batch with batch_sharding
    BEFORE calling — GSPMD handles the rest.  ``remat=True`` turns on
    per-block rematerialization (same gradients, less HBM, ~1 extra
    block forward in the backward).  ``sp_mesh`` (the dp x tp mesh the
    params are sharded over) additionally turns on sequence parallelism:
    the residual stream between blocks is sharded over tp on the
    sequence axis (see tdax.models.qwen_vl.decoder).

    ``cp_mesh`` (a mesh with "dp" and "cp" axes) turns on CONTEXT
    PARALLELISM instead: activations are sharded over cp on the
    sequence axis end to end — norms/MLP/loss are sequence-local under
    GSPMD, and attention (the only sequence-coupled op) runs as ring
    attention over the cp axis (tdax.ops.ring_attention): k/v chunks
    rotate via lax.ppermute, partial softmax results merge through
    their log-normalizers.  Per-device activation memory scales as
    T/cp — the axis for sequences too long for one chip.  Mutually
    exclusive with sp_mesh (both claim the sequence axis).
    """
    if sp_mesh is not None and cp_mesh is not None:
        raise ValueError("sp_mesh and cp_mesh are mutually exclusive: "
                         "both shard the sequence axis (over tp and cp "
                         "respectively)")
    seq_sharding = None
    if sp_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        seq_sharding = NamedSharding(sp_mesh, P("dp", "tp", None))
    if cp_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        seq_sharding = NamedSharding(cp_mesh, P("dp", "cp", None))

    def step(params, opt_state, batch):
        def loss_fn(p):
            if cp_mesh is not None:
                from tdax.ops.flash_attention import flash_sharding
                h_ax = "tp" if "tp" in cp_mesh.axis_names else None
                ctx = flash_sharding(cp_mesh, batch_axis="dp",
                                     head_axis=h_ax, seq_axis="cp")
            else:
                import contextlib
                ctx = contextlib.nullcontext()
            with ctx:
                return lm_loss(
                    p, cfg, batch["input_ids"], batch["attn_mask"],
                    batch.get("images") if with_images else None,
                    batch.get("image_positions") if with_images else None,
                    remat=remat, seq_sharding=seq_sharding)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def default_optimizer(lr=1e-4) -> optax.GradientTransformation:
    """Global-norm clip + adamw.  ``lr`` may be a float or any optax
    schedule (e.g. ``warmup_cosine_lr``)."""
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=0.01),
    )


def warmup_cosine_lr(peak_lr: float, warmup_steps: int, total_steps: int,
                     end_frac: float = 0.1):
    """The standard LLM fine-tuning schedule: linear warmup from 0 to
    peak_lr, cosine decay to end_frac * peak_lr by total_steps."""
    return optax.warmup_cosine_decay_schedule(
        0.0, peak_lr, warmup_steps, total_steps, peak_lr * end_frac)


def train_loop(params: dict, cfg: QwenVLConfig, batches, n_steps: int,
               optimizer: optax.GradientTransformation | None = None,
               checkpoint_path: str | None = None,
               checkpoint_every: int = 100,
               resume: bool = True,
               with_images: bool = False, remat: bool = False,
               sp_mesh=None, verbose: bool = False):
    """Minimal production fit loop with crash resume.

    ``batches`` is a callable ``step -> batch dict`` (a function of the
    step index, so a resumed run replays the identical data order).
    Every ``checkpoint_every`` steps the full train state (params +
    optimizer state + step) is written atomically to
    ``checkpoint_path.npz`` (tdax.utils.checkpoint.save_train_state);
    with ``resume=True`` an existing checkpoint restarts the loop from
    its step — the same resumable contract as activation extraction
    (SURVEY §5).  Returns (params, opt_state, losses) where losses
    covers the steps THIS invocation ran."""
    import os

    from tdax.utils.checkpoint import load_train_state, save_train_state

    opt = optimizer if optimizer is not None else default_optimizer()
    start = 0
    if checkpoint_path and resume and os.path.exists(checkpoint_path + ".npz"):
        # load_train_state only needs the opt-state TREE STRUCTURE;
        # eval_shape avoids materializing a full set of moments (2x
        # params of HBM) that the loaded state would immediately replace.
        opt_state_shape = jax.eval_shape(opt.init, params)
        params, opt_state, start = load_train_state(checkpoint_path,
                                                    opt_state_shape)
        if verbose:
            print(f"[tdax.train] resumed from step {start}", flush=True)
    else:
        opt_state = opt.init(params)

    step_fn = make_train_step(cfg, opt, with_images=with_images,
                              remat=remat, sp_mesh=sp_mesh)
    # Losses stay on device until the loop ends (or a checkpoint/verbose
    # print forces a sync anyway): float(loss) every step would insert a
    # host round-trip between dispatches, serializing the pipeline — on
    # this project's relayed TPU (erratic dispatch latency) that costs
    # far more than the step itself.
    device_losses = []
    for i in range(start, n_steps):
        params, opt_state, loss = step_fn(params, opt_state, batches(i))
        device_losses.append(loss)
        if verbose:
            print(f"[tdax.train] step {i + 1}/{n_steps} loss "
                  f"{float(loss):.4f}", flush=True)
        if checkpoint_path and (i + 1) % checkpoint_every == 0:
            save_train_state(checkpoint_path, params, opt_state, i + 1)
    losses = [float(l) for l in device_losses]
    return params, opt_state, losses
