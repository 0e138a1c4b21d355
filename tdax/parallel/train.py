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


def masked_ce_parts(logits: jnp.ndarray, input_ids: jnp.ndarray,
                    attn_mask: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sum of masked next-token CE, number of real target tokens).

    The unreduced form exists for gradient accumulation: summing
    (ce_sum, n_tokens) over microbatches and dividing ONCE reproduces
    the full-batch mean exactly even when microbatches carry different
    numbers of real tokens (a mean-of-means would not).

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
    return jnp.sum((lse - picked) * mask), jnp.sum(mask)


def masked_ce(logits: jnp.ndarray, input_ids: jnp.ndarray,
              attn_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked next-token cross entropy (mean over real target tokens)."""
    ce_sum, n = masked_ce_parts(logits, input_ids, attn_mask)
    return ce_sum / jnp.maximum(n, 1.0)


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
                    sp_mesh=None, cp_mesh=None, param_shardings=None,
                    accum_steps: int = 1):
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

    ``param_shardings`` (a NamedSharding pytree matching params, built
    from tdax.parallel.fsdp_sharding_rules + named_shardings) turns on
    FSDP/ZeRO-3: gradients are constrained into the dp-sharded layout
    (reduce-scatter instead of all-reduce) and updated params back into
    it, so params + grads + adamw moments all stay 1/dp per device;
    GSPMD inserts the per-layer weight all-gathers.  Pure placement —
    same math as the replicated step.

    ``accum_steps > 1`` turns on gradient accumulation: every batch
    leaf carries a leading [accum_steps, ...] microbatch axis and the
    step scans over it, accumulating loss numerator/denominator and
    f32 gradient sums, then applies ONE optimizer update.  Exactly the
    full-batch gradient (token-weighted, not mean-of-means), at the
    activation memory of one microbatch.
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

    def attn_ctx():
        if cp_mesh is not None:
            from tdax.ops.flash_attention import flash_sharding
            h_ax = "tp" if "tp" in cp_mesh.axis_names else None
            return flash_sharding(cp_mesh, batch_axis="dp",
                                  head_axis=h_ax, seq_axis="cp")
        import contextlib
        return contextlib.nullcontext()

    def constrain(tree):
        if param_shardings is None:
            return tree
        return jax.lax.with_sharding_constraint(tree, param_shardings)

    def loss_parts_fn(p, b):
        """(ce_sum, n_tokens) on one (micro)batch — summed, not meaned,
        so accumulation over microbatches is exact."""
        with attn_ctx():
            logits = forward(
                p, cfg, b["input_ids"], b["attn_mask"],
                b.get("images") if with_images else None,
                b.get("image_positions") if with_images else None,
                remat=remat, seq_sharding=seq_sharding)
        ce_sum, n = masked_ce_parts(logits, b["input_ids"], b["attn_mask"])
        return ce_sum, n

    def step(params, opt_state, batch):
        if accum_steps == 1:
            def loss_fn(p):
                ce_sum, n = loss_parts_fn(p, batch)
                return ce_sum / jnp.maximum(n, 1.0)
            loss, grads = jax.value_and_grad(loss_fn)(params)
        else:
            # the scan would silently run over WHATEVER leading axis the
            # leaves carry — a batch reshaped with the wrong microbatch
            # count must fail here, not train on a different schedule
            for path, leaf in jax.tree_util.tree_leaves_with_path(batch):
                if leaf.shape[0] != accum_steps:
                    raise ValueError(
                        f"batch leaf {jax.tree_util.keystr(path)} has leading "
                        f"dim {leaf.shape[0]}, expected accum_steps="
                        f"{accum_steps}")
            def body(carry, microbatch):
                acc_g, acc_ce, acc_n = carry
                (ce_sum, n), g = jax.value_and_grad(
                    loss_parts_fn, has_aux=True)(params, microbatch)
                # f32 accumulator: bf16 grads would lose low bits over
                # the sum; sharded like the params (1/dp under FSDP)
                acc_g = constrain(jax.tree.map(
                    lambda a, b: a + b.astype(a.dtype), acc_g, g))
                return (acc_g, acc_ce + ce_sum, acc_n + n), None
            zeros = constrain(jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params))
            (g_sum, ce_sum, n), _ = jax.lax.scan(
                body, (zeros, jnp.float32(0), jnp.float32(0)), batch)
            n = jnp.maximum(n, 1.0)
            loss = ce_sum / n
            # the final cast to param dtype is intentional: it matches
            # the non-accum path's grad dtype (one compiled optimizer
            # program serves both) and costs ONE rounding of the result
            # — the f32 accumulator's purpose was avoiding rounding
            # error compounding across the microbatch sum, which is done
            grads = jax.tree.map(lambda g, p: (g / n).astype(p.dtype),
                                 g_sum, params)

        grads = constrain(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = constrain(optax.apply_updates(params, updates))
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
               sp_mesh=None, cp_mesh=None, param_shardings=None,
               accum_steps: int = 1, log_every: int = 50,
               verbose: bool = False):
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
                              remat=remat, sp_mesh=sp_mesh, cp_mesh=cp_mesh,
                              param_shardings=param_shardings,
                              accum_steps=accum_steps)
    # Losses stay on device until the loop ends (or a checkpoint/verbose
    # print forces a sync anyway): float(loss) every step would insert a
    # host round-trip between dispatches, serializing the pipeline — on
    # this project's relayed TPU (erratic dispatch latency) that costs
    # far more than the step itself.
    device_losses = []
    import time as _time

    from tdax.utils.log import log_event

    t_window = _time.time()
    tokens_window = 0
    for i in range(start, n_steps):
        batch = batches(i)
        params, opt_state, loss = step_fn(params, opt_state, batch)
        device_losses.append(loss)
        tokens_window += batch["input_ids"].size
        if verbose:
            print(f"[tdax.train] step {i + 1}/{n_steps} loss "
                  f"{float(loss):.4f}", flush=True)
        if log_every and (i + 1) % log_every == 0:
            # one sync per window (float of the latest loss), not per
            # step — the observability hook must not serialize dispatch
            dt = _time.time() - t_window
            # dispatched_tokens_per_s counts every element of input_ids
            # (pad/masked included) — it is a DISPATCH-throughput gauge,
            # not useful-token throughput; the first window also absorbs
            # jit compile time.  Real-token throughput would cost a
            # device sync per window for the loss denominator.
            log_event("train_window", step=i + 1,
                      loss=float(loss), wall_s=round(dt, 4),
                      dispatched_tokens_per_s=round(
                          tokens_window / max(dt, 1e-9), 1))
            t_window, tokens_window = _time.time(), 0
        if checkpoint_path and (i + 1) % checkpoint_every == 0:
            save_train_state(checkpoint_path, params, opt_state, i + 1)
    losses = [float(l) for l in device_losses]
    return params, opt_state, losses
