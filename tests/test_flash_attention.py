"""Flash attention: Pallas kernel (interpret mode) vs the reference
einsum formulation, mask/causal/raggedness coverage, custom_vjp path."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdax.ops.flash_attention import (AttnSpec, _get_flash, _reference_mha,
                                      NEG_INF, mha)

# Interpret-mode kernels evaluate op-by-op on the default backend; on
# the relayed TPU that is hundreds of round-trips per test.  These are
# CPU tests of the kernel's math; the REAL compiled kernel is covered
# on hardware by test_mha_dispatch_matches_reference + the model suite.
interpret_only_on_cpu = pytest.mark.skipif(
    os.environ.get("TDAX_TEST_TPU") == "1",
    reason="interpret-mode kernel tests are CPU-targeted; the compiled "
           "kernel is covered by the dispatch/model tests on TPU")


def _rand_qkv(rng, b, tq, tk, nh, hd, dtype=np.float32):
    q = jnp.asarray(rng.normal(size=(b, tq, nh, hd)).astype(dtype))
    k = jnp.asarray(rng.normal(size=(b, tk, nh, hd)).astype(dtype))
    v = jnp.asarray(rng.normal(size=(b, tk, nh, hd)).astype(dtype))
    return q, k, v


def _bias_from_valid(valid):
    return jnp.where(valid > 0, 0.0, NEG_INF).astype(jnp.float32)


@interpret_only_on_cpu
@pytest.mark.parametrize("tq,tk,nh,hd,causal", [
    (40, 40, 2, 16, True),     # ragged causal self-attention (decoder)
    (40, 40, 2, 16, False),    # ragged dense
    (8, 40, 2, 20, False),     # cross-attention, hd not 128-aligned
    (130, 130, 1, 128, True),  # spills into a second q block
    (16, 260, 1, 32, False),   # multiple k blocks (tk_pad 384 -> blk 384)
    (64, 192, 2, 128, False),  # zero-transpose layout (hd % 128 == 0), cross
    # zero-transpose (4-D grid) regressions: the kernel once read the
    # grid's (head, q-block) dims as (q-block, k-block) — visible ONLY
    # with nh >= 2 under causal, or >= 2 q-blocks, on the aligned path
    (256, 256, 2, 128, True),   # heads >= 1 lost the causal mask
    (1024, 1024, 1, 128, True), # 2 q-blocks: stale-accumulator/NaN case
    (128, 640, 2, 128, True),   # multi-k-block aligned causal
])
def test_flash_matches_reference(tq, tk, nh, hd, causal):
    rng = np.random.default_rng(0)
    b = 2
    q, k, v = _rand_qkv(rng, b, tq, tk, nh, hd)
    valid = np.ones((b, tk), np.int32)
    valid[0, tk - 7:] = 0  # ragged sample
    valid = jnp.asarray(valid)

    got = _get_flash(causal, True)(q, k, v, _bias_from_valid(valid))
    want = _reference_mha(
        q, k, v, AttnSpec(kv_valid=valid, causal=causal).additive(tq, tk, b))

    # compare only rows that are real queries under the mask (a fully
    # masked query row is undefined garbage on both paths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@interpret_only_on_cpu
def test_flash_all_keys_valid_none_spec():
    """kv_valid=None must equal an all-ones validity row."""
    rng = np.random.default_rng(1)
    q, k, v = _rand_qkv(rng, 2, 24, 24, 2, 16)
    got = _get_flash(False, True)(q, k, v, jnp.zeros((2, 24), jnp.float32))
    want = _reference_mha(q, k, v,
                          AttnSpec(kv_valid=None, causal=False).additive(24, 24, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@interpret_only_on_cpu
def test_flash_custom_vjp_matches_reference_grads():
    """The backward recomputes the reference path — gradients must match
    jax.grad of the reference formulation."""
    rng = np.random.default_rng(2)
    b, t, nh, hd = 1, 16, 2, 8
    q, k, v = _rand_qkv(rng, b, t, t, nh, hd)
    valid = jnp.ones((b, t), jnp.int32)
    bias = _bias_from_valid(valid)
    add = AttnSpec(kv_valid=valid, causal=True).additive(t, t, b)

    def loss_flash(q, k, v):
        return jnp.sum(_get_flash(True, True)(q, k, v, bias) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_mha(q, k, v, add) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


@interpret_only_on_cpu
@pytest.mark.parametrize("tq,tk,nh,hd,causal,nvalid", [
    (256, 256, 4, 64, False, None),   # multi-k-block dense
    (256, 256, 4, 64, True, None),    # multi-block causal (block skipping)
    (200, 200, 2, 128, True, 150),    # ragged + padded tq + aligned hd
    (130, 130, 4, 128, False, 100),   # 2 q-blocks, ragged
])
def test_fused_backward_matches_reference_grads(tq, tk, nh, hd, causal, nvalid):
    """The FUSED tiled backward (dq kernel + dk/dv kernel, recomputing
    probability tiles from the saved logsumexp) must match jax.grad of
    the reference formulation across block/mask/causal regimes."""
    from tdax.ops.flash_attention import _build_flash
    rng = np.random.default_rng(10)
    b = 2
    q, k, v = _rand_qkv(rng, b, tq, tk, nh, hd)
    if nvalid is None:
        bias = jnp.zeros((b, tk), jnp.float32)
        valid = jnp.ones((b, tk), jnp.int32)
    else:
        valid = jnp.asarray((np.arange(tk) < nvalid)[None].astype(np.int32)
                            * np.ones((b, 1), np.int32))
        bias = _bias_from_valid(valid)
    g = jnp.asarray(rng.normal(size=(b, tq, nh, hd)).astype(np.float32))

    fused = _build_flash(causal, True, False)  # ref_bwd=False: fused kernels
    dq, dk, dv = jax.grad(lambda a, c, d: jnp.vdot(fused(a, c, d, bias), g),
                          argnums=(0, 1, 2))(q, k, v)

    add = AttnSpec(kv_valid=valid, causal=causal).additive(tq, tk, b)
    rdq, rdk, rdv = jax.grad(
        lambda a, c, d: jnp.vdot(_reference_mha(
            a, c, d, add, precision=jax.lax.Precision.HIGHEST), g),
        argnums=(0, 1, 2))(q, k, v)
    for got, want in ((dq, rdq), (dk, rdk), (dv, rdv)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)


@interpret_only_on_cpu
def test_bwd_block_knobs_preserve_grads(monkeypatch):
    """TDAX_BWD_BLKQ/BLKK (the on-chip tile A/B knobs) must only change
    tiling, never values — and the UNSET path must behave identically
    (a loop variable once shadowed the v tensor there: the knob code
    runs on every backward trace, set or not)."""
    from tdax.ops.flash_attention import _build_flash, _flash_bwd_impl
    rng = np.random.default_rng(13)
    b, t, nh, hd = 2, 256, 2, 128
    q, k, v = _rand_qkv(rng, b, t, t, nh, hd)
    bias = jnp.zeros((b, t), jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, t, nh, hd)).astype(np.float32))

    def grads():
        fused = _build_flash(True, True, False)
        return jax.grad(lambda a, c, d: jnp.vdot(fused(a, c, d, bias), g),
                        argnums=(0, 1, 2))(q, k, v)

    base = grads()
    monkeypatch.setenv("TDAX_BWD_ZT", "1")
    monkeypatch.setenv("TDAX_BWD_BLKQ", "128")
    monkeypatch.setenv("TDAX_BWD_BLKK", "256")
    jax.clear_caches()  # the knob is read at trace time
    knobbed = grads()
    for a, c in zip(base, knobbed):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-6)


@interpret_only_on_cpu
def test_ref_bwd_escape_hatch_matches(monkeypatch):
    """TDAX_FLASH_REF_BWD=1 keeps the old reference-recompute backward;
    both backward builds must produce the same gradients."""
    from tdax.ops.flash_attention import _build_flash
    rng = np.random.default_rng(11)
    q, k, v = _rand_qkv(rng, 2, 40, 40, 2, 16)
    bias = jnp.zeros((2, 40), jnp.float32)

    def loss(fn):
        return jax.grad(lambda a: jnp.sum(fn(a, k, v, bias) ** 2))(q)

    g_fused = loss(_build_flash(True, True, False))
    g_ref = loss(_build_flash(True, True, True))
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


@interpret_only_on_cpu
def test_train_step_peak_memory_not_quadratic(monkeypatch):
    """VERDICT r3 #4 done-criterion: with the fused backward, the
    compiled training step's peak temp memory must NOT contain a
    [B, nh, T, T] tensor.  Asserted two ways: the absolute temp size at
    T=2048 is below the size of ONE such f32 tensor, and a control
    compile on the einsum path (which saves the softmax residual)
    exceeds it at T=1024."""
    from tdax.models.qwen_vl import QwenVLConfig, init_params
    from tdax.parallel.train import default_optimizer, make_train_step

    monkeypatch.setenv("TDAX_FLASH_INTERPRET", "1")
    b = 2

    def temp_bytes(t):
        cfg = QwenVLConfig(vocab_size=256, hidden_size=64, num_layers=2,
                           num_heads=4, intermediate_size=128, seq_length=t)
        params = init_params(jax.random.PRNGKey(0), cfg, with_visual=False)
        opt = default_optimizer(1e-4)
        opt_state = opt.init(params)
        batch = {"input_ids": jnp.ones((b, t), jnp.int32),
                 "attn_mask": jnp.ones((b, t), jnp.int32)}
        step = make_train_step(cfg, opt)
        ma = step.lower(params, opt_state, batch).compile().memory_analysis()
        return ma.temp_size_in_bytes, 4 * b * t * t * 4  # nh=4, f32

    temp_flash, quad = temp_bytes(2048)
    assert temp_flash < quad, (temp_flash, quad)  # measured: 92 MB vs 134 MB

    monkeypatch.setenv("TDAX_NO_FLASH", "1")
    monkeypatch.delenv("TDAX_FLASH_INTERPRET")
    temp_ref, quad_1k = temp_bytes(1024)
    assert temp_ref > quad_1k, (temp_ref, quad_1k)  # control: 224 MB vs 34 MB


def test_mha_dispatch_matches_reference():
    """The AttnSpec dispatch (reference fallback on CPU, the REAL compiled
    kernel under TDAX_TEST_TPU) must equal a materialized additive call."""
    rng = np.random.default_rng(3)
    q, k, v = _rand_qkv(rng, 2, 12, 12, 2, 8)
    valid = jnp.asarray(np.array([[1] * 12, [1] * 9 + [0] * 3], np.int32))
    spec = AttnSpec(kv_valid=valid, causal=True)
    got = mha(q, k, v, spec)
    want = _reference_mha(q, k, v, spec.additive(12, 12, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@interpret_only_on_cpu
def test_mha_sharded_mesh_runs_flash_kernel(monkeypatch):
    """Under flash_sharding(mesh) the Pallas kernel (interpret mode)
    runs per-shard via shard_map on the 8-device mesh and matches the
    reference einsum — the multi-chip flash contract (VERDICT r3 #1)."""
    import tdax.ops.flash_attention as fa
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    monkeypatch.setenv("TDAX_FLASH_INTERPRET", "1")
    devs = np.array(jax.devices()).reshape(4, 2)
    mesh = Mesh(devs, ("dp", "tp"))
    rng = np.random.default_rng(7)
    b, t, nh, hd = 8, 40, 4, 16
    q, k, v = _rand_qkv(rng, b, t, t, nh, hd)
    valid = np.ones((b, t), np.int32)
    valid[0, t - 5:] = 0
    valid = jnp.asarray(valid)
    spec = AttnSpec(kv_valid=valid, causal=True)
    want = _reference_mha(q, k, v, spec.additive(t, t, b))

    qs = jax.device_put(q, NamedSharding(mesh, P("dp", None, "tp", None)))
    ks = jax.device_put(k, NamedSharding(mesh, P("dp", None, "tp", None)))
    vs = jax.device_put(v, NamedSharding(mesh, P("dp", None, "tp", None)))
    ms = jax.device_put(valid, NamedSharding(mesh, P("dp", None)))
    with fa.flash_sharding(mesh, batch_axis="dp", head_axis="tp"):
        got = jax.jit(lambda a, b_, c, m: mha(a, b_, c,
                                              AttnSpec(kv_valid=m, causal=True))
                      )(qs, ks, vs, ms)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # gradients flow through the shard_map'd custom_vjp (training path)
    with fa.flash_sharding(mesh, batch_axis="dp", head_axis="tp"):
        g = jax.jit(jax.grad(lambda a: jnp.sum(
            mha(a, ks, vs, AttnSpec(kv_valid=ms, causal=True)) ** 2)))(qs)
    gr = jax.grad(lambda a: jnp.sum(
        _reference_mha(a, k, v, spec.additive(t, t, b)) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


@interpret_only_on_cpu
def test_mha_sharded_eager_guard_falls_back(monkeypatch):
    """Eagerly multi-device inputs with NO flash_sharding context must
    refuse the (unpartitionable) kernel loudly and take the einsum path."""
    import tdax.ops.flash_attention as fa
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    monkeypatch.setenv("TDAX_FLASH_INTERPRET", "1")
    fa._warn_once.cache_clear()
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    rng = np.random.default_rng(8)
    b, t, nh, hd = 8, 16, 2, 8
    q, k, v = _rand_qkv(rng, b, t, t, nh, hd)
    spec = AttnSpec(kv_valid=None, causal=False)
    want = _reference_mha(q, k, v, spec.additive(t, t, b))
    qs = jax.device_put(q, NamedSharding(mesh, P("dp")))
    with pytest.warns(UserWarning, match="no flash_sharding"):
        got = mha(qs, k, v, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@interpret_only_on_cpu
def test_mha_sharded_indivisible_heads_fall_back(monkeypatch):
    """A context whose head axis does not divide this site's head count
    (e.g. the tiny resampler's 2 heads under tp=4) must warn and produce
    the correct einsum result, not a wrong per-shard kernel."""
    import tdax.ops.flash_attention as fa
    from jax.sharding import Mesh, PartitionSpec  # noqa: F401

    monkeypatch.setenv("TDAX_FLASH_INTERPRET", "1")
    fa._warn_once.cache_clear()
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("dp", "tp"))
    rng = np.random.default_rng(9)
    b, t, nh, hd = 2, 12, 2, 8  # nh=2 not divisible by tp=4
    q, k, v = _rand_qkv(rng, b, t, t, nh, hd)
    spec = AttnSpec(kv_valid=None, causal=False)
    want = _reference_mha(q, k, v, spec.additive(t, t, b))
    with fa.flash_sharding(mesh, batch_axis="dp", head_axis="tp"):
        with pytest.warns(UserWarning, match="do not divide"):
            got = mha(q, k, v, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@interpret_only_on_cpu
def test_fully_masked_rows_finite():
    """Padding query rows (all keys masked) must produce finite output —
    NaNs would poison the residual stream."""
    rng = np.random.default_rng(4)
    b, t, nh, hd = 1, 8, 1, 8
    q, k, v = _rand_qkv(rng, b, t, t, nh, hd)
    valid = jnp.zeros((b, t), jnp.int32)  # nothing valid at all
    out = _get_flash(False, True)(q, k, v, _bias_from_valid(valid))
    assert np.isfinite(np.asarray(out)).all()


tpu_hardware_only = pytest.mark.skipif(
    os.environ.get("TDAX_TEST_TPU") != "1",
    reason="compiled-kernel lowering test; runs in the on-chip suite "
           "(TDAX_TEST_TPU=1) — CPU covers the math in interpret mode")


@tpu_hardware_only
@pytest.mark.parametrize("tq,tk,nh,hd,causal", [
    (256, 256, 2, 128, True),   # 4-D zero-transpose grid, multi-q-block
    (256, 256, 2, 64, False),   # 3-D grid (hd padded)
])
def test_fused_backward_lowers_and_matches_on_device(tq, tk, nh, hd, causal):
    """Compile (not interpret) the fused forward+backward on the real
    chip and compare grads to the reference vjp.  Mosaic enforces block
    tiling rules ONLY when lowering for hardware — the round-4 lse
    layout bug ((1, 1, blk_q) blocks over [B, nh, tq_pad], illegal
    second-to-last dim) passed every interpret-mode test and failed the
    first real training step; this test pins the lowering."""
    from tdax.ops.flash_attention import _build_flash
    rng = np.random.default_rng(7)
    b = 2
    q, k, v = _rand_qkv(rng, b, tq, tk, nh, hd)
    bias = jnp.zeros((b, tk), jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, tq, nh, hd)).astype(np.float32))

    fused = _build_flash(causal, False, False)  # interpret=False: real kernel
    dq, dk, dv = jax.jit(jax.grad(
        lambda a, c, d: jnp.vdot(fused(a, c, d, bias), g),
        argnums=(0, 1, 2)))(q, k, v)

    add = AttnSpec(kv_valid=None, causal=causal).additive(tq, tk, b)
    rdq, rdk, rdv = jax.jit(jax.grad(
        lambda a, c, d: jnp.vdot(_reference_mha(
            a, c, d, add, precision=jax.lax.Precision.HIGHEST), g),
        argnums=(0, 1, 2)))(q, k, v)
    # the f32 flash kernel runs HIGHEST-precision MXU passes (see
    # _flash_impl); grads agree to f32 reduction noise
    for got, want in ((dq, rdq), (dk, rdk), (dv, rdv)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
