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


# ---------------------------------------------------------------------------
# pipeline parallelism (tdax/parallel/pipeline.py)


def _pp_setup(pp, dp, n_micro, key=9):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tdax.parallel import make_pp_mesh, shard_params_pp

    mesh = make_pp_mesh(pp=pp, dp=dp)
    rng = np.random.default_rng(key)
    b, t = 2 * dp * n_micro, 24
    ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (b, t)).astype(np.int32))
    mask = jnp.ones((b, t), jnp.int32).at[:, t - 4:].set(0)  # ragged tail
    params = init_params(jax.random.PRNGKey(key), CFG, with_visual=False)
    sharded = shard_params_pp(
        init_params(jax.random.PRNGKey(key), CFG, with_visual=False), mesh)
    bs = NamedSharding(mesh, P("dp"))
    return mesh, params, sharded, ids, mask, bs


def test_pipeline_forward_matches_single_device():
    """GPipe schedule over pp=4 stages x 2 microbatches: logits must
    equal the plain scan decoder (same per-layer arithmetic; only the
    placement changes)."""
    from tdax.parallel import pipeline_forward

    mesh, params, sharded, ids, mask, bs = _pp_setup(pp=4, dp=2, n_micro=2)
    ref = np.asarray(forward(params, CFG, ids, mask))
    got = np.asarray(pipeline_forward(
        sharded, CFG, jax.device_put(ids, bs), jax.device_put(mask, bs),
        mesh, n_micro=2))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_pipeline_forward_pp_only_and_remat():
    """pp without dp (the mesh is only stages — one block per stage),
    with remat on: still matches the single-device forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tdax.parallel import make_pp_mesh, pipeline_forward, shard_params_pp

    mesh = make_pp_mesh(pp=CFG.num_layers, dp=1,
                        devices=jax.devices()[:CFG.num_layers])
    rng = np.random.default_rng(11)
    b, t = 4, 24
    ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (b, t)).astype(np.int32))
    mask = jnp.ones((b, t), jnp.int32)
    params = init_params(jax.random.PRNGKey(11), CFG, with_visual=False)
    sharded = shard_params_pp(
        init_params(jax.random.PRNGKey(11), CFG, with_visual=False), mesh)
    bs = NamedSharding(mesh, P("dp"))
    ref = np.asarray(forward(params, CFG, ids, mask))
    got = np.asarray(pipeline_forward(
        sharded, CFG, jax.device_put(ids, bs), jax.device_put(mask, bs),
        mesh, n_micro=4, remat=True))
    # mb=1 changes the matmul batch shape vs the b=4 reference, so the
    # logits carry reduction-order float noise (~3e-6 measured)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)


def test_pipeline_train_step_matches_plain():
    """One pipeline train step must land on the same loss and params as
    the single-device train step (up to grad reduction-order float
    noise): the bubbles contribute zero gradient."""
    from tdax.parallel import make_train_step_pp

    mesh, params, sharded, ids, mask, bs = _pp_setup(pp=4, dp=2, n_micro=2)
    opt = default_optimizer(1e-3)
    batch = {"input_ids": ids, "attn_mask": mask}
    p1, _, l1 = make_train_step(CFG, opt)(params, opt.init(params), batch)

    step_pp = make_train_step_pp(CFG, opt, mesh, n_micro=2)
    batch_s = {"input_ids": jax.device_put(ids, bs),
               "attn_mask": jax.device_put(mask, bs)}
    p2, _, l2 = step_pp(sharded, opt.init(sharded), batch_s)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_1f1b_schedule_properties():
    """The 1F1B schedule caps in-flight activations at min(S - s, M)
    per stage (the memory claim: saved inputs scale with S, not M),
    finishes in 2(M + S - 1) slots when M >= S, and keeps the unsent
    h/g buffers small — all checked statically by the simulator's own
    asserts plus the bounds pinned here."""
    from tdax.parallel.pipeline import _schedule_1f1b

    for S, M in [(2, 2), (4, 2), (4, 4), (4, 8), (4, 16), (8, 4), (3, 5)]:
        sched = _schedule_1f1b(S, M)
        if M >= S:
            assert sched["n_slots"] == 2 * (M + S - 1), (S, M, sched["n_slots"])
        # the saved-input ring never grows with M past S
        assert sched["b_in"] == min(S, M)
        assert sched["oh"] <= S and sched["og"] <= S, (S, M)
        # every stage runs exactly M forwards and M backwards
        assert (sched["fw_do"].sum(axis=0) == M).all()
        assert (sched["bw_do"].sum(axis=0) == M).all()


def test_pipeline_1f1b_deep_microbatching_matches_plain():
    """1F1B with M=4 > warmup depth (steady-state interleaving actually
    exercised) on pp=4 x dp=2: loss and params match the single-device
    step, and the gpipe A/B schedule lands on the same numbers."""
    from tdax.parallel import make_train_step_pp

    mesh, params, sharded, ids, mask, bs = _pp_setup(pp=4, dp=2, n_micro=4,
                                                     key=21)
    opt = default_optimizer(1e-3)
    batch = {"input_ids": ids, "attn_mask": mask}
    p1, _, l1 = make_train_step(CFG, opt)(params, opt.init(params), batch)

    batch_s = {"input_ids": jax.device_put(ids, bs),
               "attn_mask": jax.device_put(mask, bs)}
    p2, _, l2 = make_train_step_pp(CFG, opt, mesh, n_micro=4, remat=True)(
        sharded, opt.init(sharded), batch_s)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)

    # gradient parity (the real claim — params after ONE adamw step are
    # noise-hostile: update ~ lr*g/|g| turns float-noise-scale grads
    # into O(lr) param diffs): 1F1B grads vs jax.grad of the plain loss
    from tdax.parallel.pipeline import pipeline_1f1b_grads
    from tdax.parallel.train import lm_loss

    # both param copies were DONATED by the train steps above — rebuild
    params = init_params(jax.random.PRNGKey(21), CFG, with_visual=False)
    g_ref = jax.grad(
        lambda p: lm_loss(p, CFG, ids, mask))(params)
    n = float(np.sum(np.asarray(mask)[:, 1:] > 0))
    from tdax.parallel import shard_params_pp
    sharded = shard_params_pp(
        init_params(jax.random.PRNGKey(21), CFG, with_visual=False), mesh)
    head = {"ln_f": sharded["ln_f"], "lm_head": sharded["lm_head"]}
    from tdax.models.qwen_vl.model import embed_inputs
    x = embed_inputs(params, CFG, ids, None, None)
    ce, d_layers, d_head, dx = pipeline_1f1b_grads(
        sharded["layers"], head, jax.device_put(x, bs),
        batch_s["input_ids"], batch_s["attn_mask"], CFG, mesh, n_micro=4,
        remat=True)
    np.testing.assert_allclose(
        np.asarray(d_layers["attn_qkv_w"]) / n,
        np.asarray(g_ref["layers"]["attn_qkv_w"]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(d_head["lm_head"]) / n,
        np.asarray(g_ref["lm_head"]), rtol=1e-4, atol=1e-6)

    from tdax.parallel import shard_params_pp
    sharded_g = shard_params_pp(
        init_params(jax.random.PRNGKey(21), CFG, with_visual=False), mesh)
    p3, _, l3 = make_train_step_pp(CFG, opt, mesh, n_micro=4,
                                   schedule="gpipe")(
        sharded_g, opt.init(sharded_g), batch_s)
    np.testing.assert_allclose(float(l3), float(l1), rtol=1e-6)


def test_pipeline_1f1b_bf16_params():
    """1F1B with bfloat16 params: the cond branches cast their grad
    pytrees to the f32 accumulator dtype (param-dtype grads from the
    vjp would mismatch the no-op branch and fail lax.cond's shape
    check) — pinned here since every other pipeline test runs f32."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tdax.parallel import (make_pp_mesh, make_train_step_pp,
                               shard_params_pp)

    cfg_bf16 = QwenVLConfig.tiny(dtype="bfloat16")
    mesh = make_pp_mesh(pp=4, dp=2)
    rng = np.random.default_rng(33)
    b, t = 8, 16
    ids = jnp.asarray(rng.integers(1, cfg_bf16.vocab_size, (b, t))
                      .astype(np.int32))
    mask = jnp.ones((b, t), jnp.int32)
    params = init_params(jax.random.PRNGKey(3), cfg_bf16, with_visual=False)
    p_ref, _, l_ref = make_train_step(cfg_bf16, default_optimizer(1e-3))(
        params, default_optimizer(1e-3).init(params),
        {"input_ids": ids, "attn_mask": mask})

    sharded = shard_params_pp(
        init_params(jax.random.PRNGKey(3), cfg_bf16, with_visual=False), mesh)
    bs = NamedSharding(mesh, P("dp"))
    opt = default_optimizer(1e-3)
    p2, _, l2 = make_train_step_pp(cfg_bf16, opt, mesh, n_micro=2)(
        sharded, opt.init(sharded),
        {"input_ids": jax.device_put(ids, bs),
         "attn_mask": jax.device_put(mask, bs)})
    assert np.isfinite(float(l2))
    # bf16 forward noise is larger than f32's; the losses must agree to
    # bf16 resolution and params must stay close after one step
    np.testing.assert_allclose(float(l2), float(l_ref), rtol=2e-2)
    for a, c in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(c, np.float32),
                                   rtol=0.1, atol=2e-2)


def test_pipeline_rejects_indivisible():
    from tdax.parallel import make_pp_mesh, pipeline_forward, shard_params_pp

    mesh = make_pp_mesh(pp=8, dp=1)  # CFG.num_layers == 4 < 8 stages
    params = init_params(jax.random.PRNGKey(0), CFG, with_visual=False)
    ids = jnp.ones((8, 8), jnp.int32)
    with pytest.raises(ValueError, match="divisible by pp"):
        pipeline_forward(params, CFG, ids, jnp.ones_like(ids), mesh, n_micro=1)
    mesh4 = make_pp_mesh(pp=4, dp=2)
    with pytest.raises(ValueError, match="n_micro"):
        pipeline_forward(params, CFG, jnp.ones((6, 8), jnp.int32),
                         jnp.ones((6, 8), jnp.int32), mesh4, n_micro=4)


def test_sequence_parallel_train_step_matches():
    """sp_mesh= shards the residual stream's sequence axis over tp
    between blocks (Megatron sequence parallelism).  Pure placement:
    loss and updated params must match the plain dp x tp step up to
    reduction-order float noise."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(dp=2, tp=4)
    rng = np.random.default_rng(13)
    b, t = 4, 32
    ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (b, t)).astype(np.int32))
    mask = jnp.ones((b, t), jnp.int32).at[:, t - 3:].set(0)
    opt = default_optimizer(1e-3)

    def sharded_setup(key=15):
        p = shard_params(init_params(jax.random.PRNGKey(key), CFG,
                                     with_visual=False),
                         mesh, param_sharding_rules(with_visual=False))
        batch = {"input_ids": jax.device_put(ids, batch_sharding(mesh)),
                 "attn_mask": jax.device_put(mask, batch_sharding(mesh))}
        return p, opt.init(p), batch

    p1, o1, b1 = sharded_setup()
    p1, _, l1 = make_train_step(CFG, opt)(p1, o1, b1)
    p2, o2, b2 = sharded_setup()
    p2, _, l2 = make_train_step(CFG, opt, sp_mesh=mesh, remat=True)(p2, o2, b2)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    # adamw's m/sqrt(v) amplifies reduction-order float noise on tiny
    # grads (reduce-scatter vs all-reduce orders differ): 2e-4 rel seen
    for a, c in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-3, atol=1e-5)


def test_context_parallel_train_step_matches():
    """cp_mesh= shards the sequence axis over a cp ring (context
    parallelism, tdax.ops.ring_attention): attention runs as a
    ppermute ring with log-normalizer merges, everything else is
    sequence-local under GSPMD.  Pure placement: loss and updated
    params must match the plain dp x tp step."""
    rng = np.random.default_rng(21)
    b, t = 4, 32
    ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (b, t)).astype(np.int32))
    mask = jnp.ones((b, t), jnp.int32).at[:, t - 3:].set(0)
    opt = default_optimizer(1e-3)

    def setup(mesh, key=15):
        p = shard_params(init_params(jax.random.PRNGKey(key), CFG,
                                     with_visual=False),
                         mesh, param_sharding_rules(with_visual=False))
        batch = {"input_ids": jax.device_put(ids, batch_sharding(mesh)),
                 "attn_mask": jax.device_put(mask, batch_sharding(mesh))}
        return p, opt.init(p), batch

    p1, o1, b1 = setup(make_mesh(dp=2, tp=4))
    p1, _, l1 = make_train_step(CFG, opt)(p1, o1, b1)

    # dp x cp, with remat (the long-sequence configuration cp exists for)
    mesh_cp = make_mesh(dp=2, tp=1, cp=4)
    p2, o2, b2 = setup(mesh_cp)
    p2, _, l2 = make_train_step(CFG, opt, cp_mesh=mesh_cp, remat=True)(
        p2, o2, b2)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for a, c in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-3, atol=1e-5)

    # all three axes at once: heads over tp inside the ring
    mesh_all = make_mesh(dp=2, tp=2, cp=2)
    p3, o3, b3 = setup(mesh_all)
    p3, _, l3 = make_train_step(CFG, opt, cp_mesh=mesh_all)(p3, o3, b3)
    np.testing.assert_allclose(float(l3), float(l1), rtol=1e-6)

    with pytest.raises(ValueError, match="mutually exclusive"):
        make_train_step(CFG, opt, sp_mesh=mesh_cp, cp_mesh=mesh_cp)


def test_fsdp_sharding_rules_structure():
    """Rules: large leaves gain a "dp" dim (never dim 0 of stacked
    per-layer leaves, never the tp dim); small leaves stay replicated."""
    from jax.sharding import PartitionSpec as P

    from tdax.parallel import fsdp_sharding_rules

    params = init_params(jax.random.PRNGKey(0), CFG, with_visual=False)
    rules = fsdp_sharding_rules(params, dp=2,
                                base_rules=param_sharding_rules(False))

    # stacked leaf [L, H, 3H]: tp on dim 2 -> dp lands on dim 1, not 0
    assert rules["layers"]["attn_qkv_w"] == P(None, "dp", "tp")
    # norms are tiny -> untouched
    assert rules["layers"]["ln_1"] == P()
    # wte [vocab, H] has no scan axis -> dp on its largest dim (vocab)
    assert rules["wte"] == P("dp")
    # every leaf's dp-sharded dim must actually divide
    def check(path, leaf, spec):
        for d, ax in enumerate(tuple(spec)):
            if ax is not None:
                assert leaf.shape[d] % 2 == 0
        return spec
    jax.tree_util.tree_map_with_path(check, params, rules)


def test_fsdp_train_step_matches_plain():
    """FSDP/ZeRO-3 placement: params + grads + moments dp-sharded, math
    identical to the replicated dp x tp step.  Also asserts the state
    actually lives 1/dp per device."""
    from tdax.parallel import fsdp_sharding_rules, named_shardings

    mesh = make_mesh(dp=4, tp=2)
    rng = np.random.default_rng(31)
    b, t = 4, 32
    ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (b, t)).astype(np.int32))
    mask = jnp.ones((b, t), jnp.int32).at[:, t - 3:].set(0)
    opt = default_optimizer(1e-3)

    def setup(rules, key=15):
        p = shard_params(init_params(jax.random.PRNGKey(key), CFG,
                                     with_visual=False), mesh, rules)
        batch = {"input_ids": jax.device_put(ids, batch_sharding(mesh)),
                 "attn_mask": jax.device_put(mask, batch_sharding(mesh))}
        # opt.init under jit so GSPMD propagates the param sharding
        # into the adamw moments (the ZeRO-1 half of the recipe)
        return p, jax.jit(opt.init)(p), batch

    p1, o1, b1 = setup(param_sharding_rules(False))
    p1, _, l1 = make_train_step(CFG, opt)(p1, o1, b1)

    base = param_sharding_rules(False)
    rules = fsdp_sharding_rules(
        jax.eval_shape(lambda k: init_params(k, CFG, with_visual=False),
                       jax.random.PRNGKey(15)),
        dp=4, base_rules=base)
    shardings = named_shardings(mesh, rules)
    p2, o2, b2 = setup(rules)
    step = make_train_step(CFG, opt, remat=True, param_shardings=shardings)
    p2, o2, l2 = step(p2, o2, b2)

    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for a, c in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-3, atol=3e-5)

    # the updated qkv weight and its adamw moments are 1/dp per device
    w = p2["layers"]["attn_qkv_w"]
    assert w.addressable_shards[0].data.size == w.size // 8  # dp4 x tp2
    mu = jax.tree_util.tree_leaves(
        o2, is_leaf=lambda x: hasattr(x, "addressable_shards"))
    big = [m for m in mu if hasattr(m, "addressable_shards")
           and m.size == w.size]
    assert big and all(
        m.addressable_shards[0].data.size == w.size // 8 for m in big)


def test_grad_accum_matches_full_batch():
    """accum_steps=k over [k, mb, ...] microbatches == one full-batch
    step, including non-uniform mask counts across microbatches (the
    token-weighted accumulation, not a mean-of-means)."""
    params = init_params(jax.random.PRNGKey(5), CFG, with_visual=False)
    opt = default_optimizer(1e-3)
    rng = np.random.default_rng(7)
    b, t = 8, 16
    ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (b, t)).astype(np.int32))
    # microbatches see DIFFERENT real-token counts
    mask = jnp.ones((b, t), jnp.int32)
    mask = mask.at[:3, t - 9:].set(0).at[5:, t - 2:].set(0)

    full = {"input_ids": ids, "attn_mask": mask}
    p1, _, l1 = make_train_step(CFG, opt)(params, opt.init(params), full)

    # the step donates params/opt_state -> fresh copies for run 2
    params = init_params(jax.random.PRNGKey(5), CFG, with_visual=False)
    micro = {"input_ids": ids.reshape(4, 2, t), "attn_mask": mask.reshape(4, 2, t)}
    p2, _, l2 = make_train_step(CFG, opt, accum_steps=4)(
        params, opt.init(params), micro)

    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    # adamw's m/sqrt(v) amplifies the scan-order float noise on tiny
    # grads just like reduction order does on the mesh tests
    for a, c in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-3, atol=3e-5)


def test_hybrid_mesh_train_step_matches_plain():
    """DCN/multi-slice: 2 "slices" x (dp=2, tp=2) on the 8-device CPU
    mesh.  Batch over ("dcn", "dp"), FSDP over the WITHIN-slice dp axis
    only (weight gathers never cross DCN; the only cross-slice traffic
    is the gradient all-reduce GSPMD inserts).  Loss and state must
    match the plain single-device step; params must live 1/dp per
    device but REPLICATED across slices."""
    from tdax.parallel import (fsdp_sharding_rules, hybrid_batch_sharding,
                               make_hybrid_mesh, named_shardings)

    mesh = make_hybrid_mesh(dcn=2, dp=2, tp=2)
    assert mesh.axis_names == ("dcn", "dp", "tp")
    rng = np.random.default_rng(41)
    b, t = 8, 24
    ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (b, t)).astype(np.int32))
    mask = jnp.ones((b, t), jnp.int32).at[: b // 2, t - 6:].set(0)
    opt = default_optimizer(1e-3)

    p1 = init_params(jax.random.PRNGKey(23), CFG, with_visual=False)
    p1, _, l1 = make_train_step(CFG, opt)(
        p1, opt.init(p1), {"input_ids": ids, "attn_mask": mask})

    p2 = init_params(jax.random.PRNGKey(23), CFG, with_visual=False)
    rules = fsdp_sharding_rules(p2, mesh,
                                base_rules=param_sharding_rules(False))
    shardings = named_shardings(mesh, rules)
    p2 = shard_params(p2, mesh, rules)
    o2 = jax.jit(default_optimizer(1e-3).init)(p2)
    bs = hybrid_batch_sharding(mesh)
    batch = {"input_ids": jax.device_put(ids, bs),
             "attn_mask": jax.device_put(mask, bs)}
    p2, o2, l2 = make_train_step(CFG, opt, remat=True,
                                 param_shardings=shardings)(p2, o2, batch)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for a, c in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-3, atol=3e-5)
    # sharded 1/dp within a slice, replicated across the dcn axis:
    # per-device shard = size / dp (NOT size / n_devices)
    w = p2["layers"]["attn_qkv_w"]
    assert w.addressable_shards[0].data.size == w.size // 4  # dp2 x tp2


def test_hybrid_mesh_refuses_indivisible():
    from tdax.parallel import make_hybrid_mesh

    with pytest.raises(ValueError, match="slices"):
        make_hybrid_mesh(dcn=3)  # 8 % 3 != 0
    with pytest.raises(ValueError, match="devices/slice"):
        make_hybrid_mesh(dcn=2, dp=4, tp=2)  # 4*2 != 4 per slice


def test_grad_accum_rejects_wrong_microbatch_axis():
    """A batch reshaped with the wrong microbatch count must fail loudly
    — the scan would otherwise silently train on a different schedule."""
    import pytest

    params = init_params(jax.random.PRNGKey(5), CFG, with_visual=False)
    opt = default_optimizer(1e-3)
    ids = jnp.ones((2, 4, 16), jnp.int32)  # leading dim 2, accum_steps 4
    batch = {"input_ids": ids, "attn_mask": jnp.ones_like(ids)}
    with pytest.raises(ValueError, match="accum_steps"):
        make_train_step(CFG, opt, accum_steps=4)(
            params, opt.init(params), batch)


def test_fsdp_rules_accept_mesh():
    """fsdp_sharding_rules(params, mesh) reads the real dp axis size, so
    the rules can never disagree with the mesh they are bound to."""
    from tdax.parallel import fsdp_sharding_rules

    mesh = make_mesh(dp=2, tp=4)
    params = init_params(jax.random.PRNGKey(0), CFG, with_visual=False)
    assert fsdp_sharding_rules(params, mesh) == \
        fsdp_sharding_rules(params, dp=2)


def test_grad_accum_composes_with_fsdp():
    """accum + FSDP + remat together (the production memory recipe):
    same result as the plain full-batch replicated step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tdax.parallel import fsdp_sharding_rules, named_shardings

    mesh = make_mesh(dp=2, tp=4)
    rng = np.random.default_rng(11)
    b, t = 4, 16
    ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (b, t)).astype(np.int32))
    mask = jnp.ones((b, t), jnp.int32).at[:2, t - 5:].set(0)
    opt = default_optimizer(1e-3)

    params = init_params(jax.random.PRNGKey(3), CFG, with_visual=False)
    full = {"input_ids": ids, "attn_mask": mask}
    p1, _, l1 = make_train_step(CFG, opt)(params, opt.init(params), full)

    # the step donates params -> fresh copy for the sharded run
    params = init_params(jax.random.PRNGKey(3), CFG, with_visual=False)
    rules = fsdp_sharding_rules(params, dp=2,
                                base_rules=param_sharding_rules(False))
    shardings = named_shardings(mesh, rules)
    p2 = shard_params(params, mesh, rules)
    o2 = jax.jit(opt.init)(p2)
    micro = {
        "input_ids": jax.device_put(ids.reshape(2, 2, t),
                                    NamedSharding(mesh, P(None, "dp"))),
        "attn_mask": jax.device_put(mask.reshape(2, 2, t),
                                    NamedSharding(mesh, P(None, "dp"))),
    }
    step = make_train_step(CFG, opt, remat=True, param_shardings=shardings,
                           accum_steps=2)
    p2, _, l2 = step(p2, o2, micro)

    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for a, c in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-3, atol=3e-5)


def test_train_loop_logs_windows(tmp_path):
    """TDAX_LOG observability: train_loop emits one train_window event
    per log_every steps with loss/wall/throughput fields."""
    import json

    from tdax.parallel import default_optimizer, train_loop
    from tdax.utils.log import configure

    rng = np.random.default_rng(17)
    fixed = [rng.integers(1, 64, (2, 12)).astype(np.int32) for _ in range(4)]

    def batches(i):
        return {"input_ids": jnp.asarray(fixed[i]),
                "attn_mask": jnp.ones((2, 12), jnp.int32)}

    log = tmp_path / "run.jsonl"
    configure(str(log))
    try:
        p0 = init_params(jax.random.PRNGKey(5), CFG, with_visual=False)
        train_loop(p0, CFG, batches, n_steps=4,
                   optimizer=default_optimizer(1e-3), log_every=2)
    finally:
        configure(None)

    events = [json.loads(l) for l in log.read_text().splitlines()]
    windows = [e for e in events if e["event"] == "train_window"]
    assert [w["step"] for w in windows] == [2, 4]
    for w in windows:
        assert np.isfinite(w["loss"]) and w["dispatched_tokens_per_s"] > 0
