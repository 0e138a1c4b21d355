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


def lm_loss(params: dict, cfg: QwenVLConfig, input_ids: jnp.ndarray,
            attn_mask: jnp.ndarray,
            images: jnp.ndarray | None = None,
            image_positions: jnp.ndarray | None = None,
            remat: bool = False) -> jnp.ndarray:
    """Masked next-token cross entropy (mean over real target tokens)."""
    logits = forward(params, cfg, input_ids, attn_mask, images, image_positions,
                     remat=remat)
    targets = input_ids[:, 1:]
    logits = logits[:, :-1]
    mask = (attn_mask[:, 1:] > 0).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_train_step(cfg: QwenVLConfig, optimizer: optax.GradientTransformation,
                    with_images: bool = False, remat: bool = False):
    """Returns train_step(params, opt_state, batch) -> (params, opt_state, loss).

    ``batch``: dict with input_ids/attn_mask (+ images/image_positions
    when with_images).  jit with donated params/opt_state; shard params
    with tdax.parallel.shard_params and the batch with batch_sharding
    BEFORE calling — GSPMD handles the rest.  ``remat=True`` turns on
    per-block rematerialization (same gradients, less HBM, ~1 extra
    block forward in the backward).
    """

    def step(params, opt_state, batch):
        def loss_fn(p):
            return lm_loss(p, cfg, batch["input_ids"], batch["attn_mask"],
                           batch.get("images") if with_images else None,
                           batch.get("image_positions") if with_images else None,
                           remat=remat)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def default_optimizer(lr: float = 1e-4) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=0.01),
    )
