"""Ring (context-parallel) attention vs single-device attention.

The ring shards the SEQUENCE axis of self-attention over a mesh axis
and rotates k/v chunks via lax.ppermute, merging per-chunk partial
softmax results through their log-normalizers (tdax/ops/ring_attention
.py).  These tests prove, on the 8-device virtual CPU mesh, that the
ring is a pure placement transform: forward and gradients match the
single-device path for causal and dense attention, with and without
key padding, through BOTH per-chunk backends (the einsum-with-lse path
and the fused Pallas kernel in interpret mode).

Fully-masked query rows (no visible valid key) are garbage-by-
convention on every path (the single-device kernel zeroes them, the
einsum path leaves uniform-softmax garbage); comparisons mask them.
"""

import warnings

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tdax.ops.flash_attention import AttnSpec, flash_sharding, mha


def _mesh(dp=2, cp=4):
    return Mesh(np.array(jax.devices()).reshape(dp, cp), ("dp", "cp"))


def _qkv(rng, b=4, t=64, nh=4, hd=32):
    mk = lambda: jnp.asarray(rng.normal(size=(b, t, nh, hd)), jnp.float32)
    return mk(), mk(), mk()


def _row_ok(kv_valid, causal):
    """[B, T] bool: query rows with at least one visible valid key."""
    if kv_valid is None:
        return None
    if causal:
        return jnp.cumsum(kv_valid, axis=1) > 0
    return jnp.broadcast_to(jnp.any(kv_valid > 0, axis=1, keepdims=True),
                            kv_valid.shape)


def _masked_err(ref, out, kv_valid, causal):
    d = jnp.abs(ref - out)
    ok = _row_ok(kv_valid, causal)
    if ok is not None:
        d = d * ok[:, :, None, None]
    return float(jnp.max(d))


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("padded", [False, True])
def test_ring_forward_matches_single_device(causal, padded):
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng)
    kv = None
    if padded:
        kv = jnp.asarray(rng.random((4, 64)) > 0.2, jnp.int32)
        kv = kv.at[1, :16].set(0)  # one whole chunk invalid for one row
    spec = AttnSpec(kv_valid=kv, causal=causal)
    ref = mha(q, k, v, spec)
    with flash_sharding(_mesh(), batch_axis="dp", head_axis=None,
                        seq_axis="cp"):
        out = jax.jit(lambda q, k, v: mha(q, k, v, spec))(q, k, v)
    assert _masked_err(ref, out, kv, causal) < 1e-5


@pytest.mark.parametrize("causal", [True, False])
def test_ring_grads_match_single_device(causal):
    rng = np.random.default_rng(1)
    q, k, v = _qkv(rng, b=2, nh=2)
    kv = jnp.ones((2, 64), jnp.int32).at[0, -7:].set(0)
    spec = AttnSpec(kv_valid=kv, causal=causal)
    w = kv[:, :, None, None]

    def loss_single(q, k, v):
        return jnp.sum(jnp.sin(mha(q, k, v, spec)) * w)

    def loss_ring(q, k, v):
        with flash_sharding(_mesh(), batch_axis="dp", head_axis=None,
                            seq_axis="cp"):
            return jnp.sum(jnp.sin(mha(q, k, v, spec)) * w)

    g_ref = jax.grad(loss_single, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_kernel_interpret_forward_and_grads(monkeypatch, causal):
    """Force the per-chunk attention through the fused Pallas kernel
    (interpret mode) with warnings-as-errors: any fallback off the ring
    or the kernel fails the test.  Gradients run the fused (o, lse)
    backward — the lse cotangent folded into the tiled kernels."""
    monkeypatch.setenv("TDAX_FLASH_INTERPRET", "1")
    rng = np.random.default_rng(2)
    q, k, v = _qkv(rng, b=2, nh=2)
    kv = jnp.ones((2, 64), jnp.int32).at[0, -7:].set(0)
    spec = AttnSpec(kv_valid=kv, causal=causal)
    w = kv[:, :, None, None]
    ref = mha(q, k, v, spec)

    def loss_single(q, k, v):
        return jnp.sum(jnp.sin(mha(q, k, v, spec)) * w)

    def loss_ring(q, k, v):
        with flash_sharding(_mesh(), batch_axis="dp", head_axis=None,
                            seq_axis="cp"):
            return jnp.sum(jnp.sin(mha(q, k, v, spec)) * w)

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        with flash_sharding(_mesh(), batch_axis="dp", head_axis=None,
                            seq_axis="cp"):
            out = jax.jit(lambda q, k, v: mha(q, k, v, spec))(q, k, v)
        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    assert _masked_err(ref, out, kv, causal) < 1e-5
    g_ref = jax.grad(loss_single, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_ring_head_sharded_too():
    """Heads over tp INSIDE the ring (dp x tp x cp): the combined spec
    P('dp', 'cp', 'tp', None) is what make_train_step(cp_mesh=) uses
    when the mesh also carries a tensor-parallel axis."""
    mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2),
                ("dp", "tp", "cp"))
    rng = np.random.default_rng(3)
    q, k, v = _qkv(rng, b=2, t=32, nh=4, hd=16)
    spec = AttnSpec(causal=True)
    ref = mha(q, k, v, spec)
    with flash_sharding(mesh, batch_axis="dp", head_axis="tp",
                        seq_axis="cp"):
        out = jax.jit(lambda q, k, v: mha(q, k, v, spec))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_zigzag_schedule_balanced():
    """The zigzag layout's causal work is balanced: every device's
    dense half-block total over the ring is identical (2cp+1 — two
    blocks per off-step, three on its one self step), vs the contiguous
    layout's 4(i+1) half-blocks for device i.  Mirrors the branch math
    in _ring_local_zigzag via the shared cost model."""
    from tdax.ops.ring_attention import _zigzag_step_blocks, _zigzag_tables

    for cp in (2, 3, 4, 8):
        _zigzag_tables(cp)  # permutation sanity asserts inside
        totals = [sum(_zigzag_step_blocks(cp, d, s) for s in range(cp))
                  for d in range(cp)]
        assert max(totals) - min(totals) == 0, (cp, totals)
        assert totals[0] == 2 * cp + 1


@pytest.mark.skipif(len(jax.devices()) < 4,
                    reason="needs >= 4 devices (virtual CPU mesh)")
def test_zigzag_layout_roundtrip():
    """to_zigzag then from_zigzag is the identity on every device, and
    the zigzag layout holds halves (j, 2cp-1-j) on device j."""
    from functools import partial

    from tdax.ops.ring_attention import (_from_zigzag, _to_zigzag,
                                         _zigzag_tables)

    cp = 4
    mesh = Mesh(np.array(jax.devices()[:cp]), ("cp",))
    t, hl = 8 * cp, 4
    x = jnp.arange(t, dtype=jnp.float32)[None, :, None, None]
    x = jnp.broadcast_to(x, (2, t, 1, 1))
    tables = _zigzag_tables(cp)

    def zig(x):
        my = jax.lax.axis_index("cp")
        return _to_zigzag(x, 1, "cp", my, tables)

    def unzig(x):
        my = jax.lax.axis_index("cp")
        return _from_zigzag(x, 1, "cp", my, tables)

    from jax.sharding import PartitionSpec as P
    sm = partial(jax.shard_map, mesh=mesh, in_specs=P(None, "cp"),
                 out_specs=P(None, "cp"), check_vma=False)
    z = sm(zig)(x)
    # device j's shard must be halves (j, 2cp-1-j) of the global order
    zl = np.asarray(z)[0, :, 0, 0].reshape(cp, 2 * hl)
    for j in range(cp):
        want = np.r_[np.arange(j * hl, (j + 1) * hl),
                     np.arange((2 * cp - 1 - j) * hl, (2 * cp - j) * hl)]
        np.testing.assert_array_equal(zl[j], want.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(sm(unzig)(z)), np.asarray(x))


def test_ring_causal_odd_chunk_falls_back_contiguous():
    """Causal T divisible by cp but NOT by 2cp: the zigzag layout can't
    split halves, so the contiguous schedule runs — still correct."""
    rng = np.random.default_rng(6)
    q, k, v = _qkv(rng, b=4, t=36)  # 36/4 = 9 per chunk (odd)
    kv = jnp.ones((4, 36), jnp.int32).at[2, -5:].set(0)
    spec = AttnSpec(kv_valid=kv, causal=True)
    ref = mha(q, k, v, spec)
    with flash_sharding(_mesh(), batch_axis="dp", head_axis=None,
                        seq_axis="cp"):
        out = jax.jit(lambda q, k, v: mha(q, k, v, spec))(q, k, v)
    assert _masked_err(ref, out, kv, True) < 1e-5


def test_ring_refuses_cross_attention():
    """Tq != Tk (the resampler's cross-attention) cannot ride the ring
    (chunks would misalign); it must warn once and stay numerically
    correct via the replicated path."""
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(2, 16, 2, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 64, 2, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 64, 2, 32)), jnp.float32)
    spec = AttnSpec(causal=False)
    ref = mha(q, k, v, spec)
    from tdax.ops import flash_attention as fa
    fa._warn_once.cache_clear()
    with pytest.warns(UserWarning, match="self-attention"):
        with flash_sharding(_mesh(), batch_axis="dp", head_axis=None,
                            seq_axis="cp"):
            out = mha(q, k, v, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_ring_refuses_indivisible_seq():
    """T not divisible by the cp axis size: warn + replicated path."""
    rng = np.random.default_rng(5)
    q, k, v = _qkv(rng, t=62)  # 62 % 4 != 0
    spec = AttnSpec(causal=True)
    ref = mha(q, k, v, spec)
    from tdax.ops import flash_attention as fa
    fa._warn_once.cache_clear()
    with pytest.warns(UserWarning, match="divisible"):
        with flash_sharding(_mesh(), batch_axis="dp", head_axis=None,
                            seq_axis="cp"):
            out = mha(q, k, v, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
