"""Mesh/sharding/train-step tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tdax.models.qwen_vl import QwenVLConfig, forward, init_params
from tdax.models.qwen_vl.model import extract_layer_activations
from tdax.parallel import make_mesh, make_train_step, param_sharding_rules, shard_params
from tdax.parallel.mesh import batch_sharding
from tdax.parallel.train import default_optimizer, lm_loss

CFG = QwenVLConfig.tiny(dtype="float32")


def test_mesh_shapes():
    mesh = make_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=3)


def test_sharded_forward_matches_single_device():
    mesh = make_mesh(dp=2, tp=4)
    params = init_params(jax.random.PRNGKey(0), CFG, with_visual=False)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (4, 16)).astype(np.int32))
    mask = jnp.ones_like(ids)

    ref = np.asarray(forward(params, CFG, ids, mask))

    sharded = shard_params(params, mesh, param_sharding_rules(with_visual=False))
    ids_s = jax.device_put(ids, batch_sharding(mesh))
    mask_s = jax.device_put(mask, batch_sharding(mesh))
    out = np.asarray(jax.jit(lambda p, i, m: forward(p, CFG, i, m))(sharded, ids_s, mask_s))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=5e-3)


def test_sharded_capture_matches_single_device():
    mesh = make_mesh(dp=4, tp=2)
    params = init_params(jax.random.PRNGKey(1), CFG, with_visual=False)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (8, 12)).astype(np.int32))
    mask = jnp.ones_like(ids)
    last = jnp.asarray(np.full(8, 11, np.int32))

    ref = np.asarray(extract_layer_activations(params, CFG, ids, mask, last))
    sharded = shard_params(params, mesh, param_sharding_rules(with_visual=False))
    out = np.asarray(jax.jit(
        lambda p, i, m, l: extract_layer_activations(p, CFG, i, m, l))(
        sharded,
        jax.device_put(ids, batch_sharding(mesh)),
        jax.device_put(mask, batch_sharding(mesh)),
        jax.device_put(last, batch_sharding(mesh))))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=5e-3)


def test_train_step_runs_and_reduces_loss():
    mesh = make_mesh(dp=2, tp=4)
    params = init_params(jax.random.PRNGKey(2), CFG, with_visual=False)
    params = shard_params(params, mesh, param_sharding_rules(with_visual=False))
    opt = default_optimizer(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(CFG, opt)

    rng = np.random.default_rng(2)
    ids = rng.integers(1, 64, (4, 16)).astype(np.int32)  # small vocab slice -> learnable
    batch = {
        "input_ids": jax.device_put(jnp.asarray(ids), batch_sharding(mesh)),
        "attn_mask": jax.device_put(jnp.ones((4, 16), jnp.int32), batch_sharding(mesh)),
    }
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9  # memorizing a fixed batch


def test_lm_loss_masking():
    params = init_params(jax.random.PRNGKey(3), CFG, with_visual=False)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (2, 10)).astype(np.int32))
    full = jnp.ones((2, 10), jnp.int32)
    half = full.at[:, 5:].set(0)
    l_full = float(lm_loss(params, CFG, ids, full))
    l_half = float(lm_loss(params, CFG, ids, half))
    assert np.isfinite(l_full) and np.isfinite(l_half)
    assert abs(l_full - l_half) > 1e-6  # mask actually changes the loss


def test_remat_grads_match_plain():
    """jax.checkpoint on the scanned block is a pure memory/recompute
    trade: gradients must match the plain backward."""
    params = init_params(jax.random.PRNGKey(4), CFG, with_visual=False)
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (2, 12)).astype(np.int32))
    mask = jnp.ones_like(ids)

    g_plain = jax.grad(lambda p: lm_loss(p, CFG, ids, mask))(params)
    g_remat = jax.grad(lambda p: lm_loss(p, CFG, ids, mask, remat=True))(params)
    flat_a = jax.tree_util.tree_leaves(g_plain)
    flat_b = jax.tree_util.tree_leaves(g_remat)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_train_loop_checkpoint_resume(tmp_path):
    """train_loop's crash-resume contract: a run interrupted after its
    checkpoint and resumed must land on EXACTLY the same params and
    optimizer state as an uninterrupted run (batches are a function of
    the step index, so data order replays identically)."""
    from tdax.parallel import default_optimizer, train_loop, warmup_cosine_lr

    cfg = CFG
    rng = np.random.default_rng(7)
    fixed = [rng.integers(1, 64, (2, 12)).astype(np.int32) for _ in range(6)]

    def batches(i):
        return {"input_ids": jnp.asarray(fixed[i]),
                "attn_mask": jnp.ones((2, 12), jnp.int32)}

    def opt():
        return default_optimizer(warmup_cosine_lr(1e-3, 2, 6))

    p0 = init_params(jax.random.PRNGKey(5), cfg, with_visual=False)
    straight, opt_straight, losses = train_loop(
        p0, cfg, batches, n_steps=6, optimizer=opt())
    assert len(losses) == 6 and np.isfinite(losses).all()

    # interrupted: checkpoint at step 4, "crash" (stop), then resume to 6
    p0 = init_params(jax.random.PRNGKey(5), cfg, with_visual=False)
    ck = str(tmp_path / "train_ck")
    _, _, l1 = train_loop(p0, cfg, batches, n_steps=4, optimizer=opt(),
                          checkpoint_path=ck, checkpoint_every=4)
    assert len(l1) == 4
    p0 = init_params(jax.random.PRNGKey(5), cfg, with_visual=False)
    resumed, opt_resumed, l2 = train_loop(p0, cfg, batches, n_steps=6,
                                          optimizer=opt(),
                                          checkpoint_path=ck,
                                          checkpoint_every=100)
    assert len(l2) == 2  # only steps 4..6 ran
    np.testing.assert_array_equal(l2, losses[4:])

    flat_a = jax.tree_util.tree_leaves(straight)
    flat_b = jax.tree_util.tree_leaves(resumed)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(opt_straight),
                    jax.tree_util.tree_leaves(opt_resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
