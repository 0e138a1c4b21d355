"""Weight-only int8 quantization: roundtrip accuracy + forward fidelity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tdax.models.qwen_vl import QwenVLConfig, extract_layer_activations, forward, init_params
from tdax.models.qwen_vl.quantize import (is_quantized, qdot, quantize_params,
                                          quantize_weight, quantized_bytes)

CFG = QwenVLConfig.tiny(dtype="float32")


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 128)).astype(np.float32)
    qw = quantize_weight(w)
    assert qw["q"].dtype == jnp.int8 and qw["s"].shape == (128,)
    deq = np.asarray(qw["q"], np.float32) * np.asarray(qw["s"])
    # per-channel int8: max error is half a quantization step per channel
    step = np.asarray(qw["s"])
    assert (np.abs(deq - w) <= step[None, :] * 0.5 + 1e-7).all()


def test_qdot_matches_dense_dequant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    w = rng.normal(size=(64, 32)).astype(np.float32)
    qw = quantize_weight(w)
    ref = np.asarray(x) @ (np.asarray(qw["q"], np.float32) * np.asarray(qw["s"]))
    out = np.asarray(qdot(x, qw))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_quantized_forward_fidelity():
    """int8 weight-only capture stays directionally faithful to fp."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_params(params)
    assert is_quantized(qparams["layers"]["attn_qkv_w"])
    assert is_quantized(qparams["wte"]) and is_quantized(qparams["visual"]["proj"])
    assert not is_quantized(qparams["ln_f"])

    # memory actually shrinks (~4x on the quantized fraction)
    assert quantized_bytes(qparams) < 0.5 * quantized_bytes(params)

    rng = np.random.default_rng(2)
    b, t = 2, 24
    ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (b, t)).astype(np.int32))
    mask = jnp.ones((b, t), jnp.int32)
    last = jnp.asarray(np.full(b, t - 1, np.int32))
    imgs = jnp.asarray(rng.normal(size=(b, 3, CFG.visual.image_size,
                                        CFG.visual.image_size)).astype(np.float32))
    pos = jnp.asarray(np.stack([np.arange(2, 2 + CFG.visual.n_queries)] * b).astype(np.int32))

    fp = np.asarray(extract_layer_activations(params, CFG, ids, mask, last, imgs, pos))
    q8 = np.asarray(extract_layer_activations(qparams, CFG, ids, mask, last, imgs, pos))
    # cosine similarity per captured vector stays high
    cos = np.sum(fp * q8, -1) / (np.linalg.norm(fp, axis=-1) * np.linalg.norm(q8, axis=-1))
    assert cos.min() > 0.98, f"min cosine {cos.min()}"

    # machinery exactness: the int8 forward must equal an fp forward run
    # on the explicitly dequantized weights (isolates implementation bugs
    # from inherent quantization error, which the capture-cosine covers)
    def dequant(tree):
        if is_quantized(tree):
            q = np.asarray(tree["q"], np.float32)
            s = np.asarray(tree["s"])
            return q * s[..., None, :]  # scales broadcast over the input dim
        if isinstance(tree, dict):
            return {k: dequant(v) for k, v in tree.items()}
        return tree

    deq = jax.tree.map(jnp.asarray, dequant(qparams))
    lq = np.asarray(forward(qparams, CFG, ids, mask))
    ld = np.asarray(forward(deq, CFG, ids, mask))
    np.testing.assert_allclose(lq, ld, rtol=5e-4, atol=5e-3)


def test_init_params_quantized_structure():
    from tdax.models.qwen_vl.quantize import init_params_quantized, is_quantized
    q = init_params_quantized(jax.random.PRNGKey(0), CFG)
    assert is_quantized(q["layers"]["attn_qkv_w"]) and is_quantized(q["wte"])
    assert not is_quantized(q["layers"]["ln_1"])
    assert np.allclose(np.asarray(q["layers"]["ln_1"], np.float32), 1.0)
    assert np.allclose(np.asarray(q["layers"]["attn_qkv_b"], np.float32), 0.0)
    # shapes match the fp tree
    fp = init_params(jax.random.PRNGKey(0), CFG)
    def shape_of(t):
        return t["q"].shape if is_quantized(t) else t.shape
    assert shape_of(q["layers"]["mlp_w1"]) == fp["layers"]["mlp_w1"].shape
    # the quantized tree drives the forward
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (1, 8)).astype(np.int32))
    out = forward(q, CFG, ids)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_w8a8_qdot_close_to_weight_only():
    """The opt-in W8A8 path (int8 x int8 MXU contraction, per-token
    activation scales) must stay within activation-rounding tolerance of
    the weight-only path, and the flag must restore cleanly."""
    from tdax.models.qwen_vl.quantize import (qdot, quantize_weight,
                                              set_w8a8, w8a8_enabled)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    w = quantize_weight(jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32)))
    base = np.asarray(qdot(x, w))
    try:
        set_w8a8(True)
        assert w8a8_enabled()
        got = np.asarray(qdot(x, w))
    finally:
        set_w8a8(False)
    assert not w8a8_enabled()
    # activation rounding is ~1/254 relative per element; the contraction
    # averages it down — row-scale tolerance
    scale = np.abs(base).max()
    np.testing.assert_allclose(got, base, atol=2e-2 * scale)


def test_w8a8_forward_fidelity():
    """Whole-model W8A8 forward stays close to the weight-only int8
    forward on the toy config (serving-mode sanity, not bit parity)."""
    from tdax.models.qwen_vl.quantize import quantize_params, set_w8a8
    rng = np.random.default_rng(1)
    params = init_params(jax.random.PRNGKey(0), CFG, with_visual=False)
    qparams = quantize_params(params)
    ids = jnp.asarray(rng.integers(1, CFG.vocab_size, (2, 12)).astype(np.int32))
    base = np.asarray(forward(qparams, CFG, ids))
    try:
        set_w8a8(True)
        got = np.asarray(forward(qparams, CFG, ids))
    finally:
        set_w8a8(False)
    # compare softmax-relevant structure: top-1 agreement on most
    # positions + bounded logit drift
    drift = np.abs(got - base).max() / max(np.abs(base).max(), 1e-6)
    assert drift < 0.15, drift
    agree = (got.argmax(-1) == base.argmax(-1)).mean()
    assert agree > 0.9, agree


def test_pallas_qmm_interpret_matches_xla():
    """Interpret-mode Pallas dequant-GEMM == the XLA dequant matmul,
    across the model's real (K, N) tiling classes and a padded-M case."""
    from tdax.ops.quant_matmul import quant_matmul_interpret

    rng = np.random.default_rng(2)
    for M, K, N in [(8, 256, 128), (130, 256, 384), (64, 512, 256)]:
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32),
                        dtype=jnp.bfloat16)
        w = rng.normal(size=(K, N)).astype(np.float32) / np.sqrt(K)
        qw = quantize_weight(w)
        ref = (jnp.dot(x, qw["q"].astype(x.dtype),
                       preferred_element_type=jnp.float32)
               * qw["s"]).astype(x.dtype)
        out = quant_matmul_interpret(x, qw["q"], qw["s"])
        assert out.dtype == x.dtype and out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_pallas_qmm_batched_and_grad():
    """Leading batch dims collapse correctly; custom_vjp dx matches the
    dequant formulation."""
    from tdax.ops.quant_matmul import quant_matmul_interpret

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 3, 256)).astype(np.float32),
                    dtype=jnp.bfloat16)
    w = rng.normal(size=(256, 128)).astype(np.float32) / 16.0
    qw = quantize_weight(w)
    out = quant_matmul_interpret(x, qw["q"], qw["s"])
    assert out.shape == (2, 3, 128)

    # the bwd rule (CPU-runnable: it never touches the kernel)
    from tdax.ops.quant_matmul import _qmm_bwd

    dy = jnp.asarray(rng.normal(size=(2, 3, 128)).astype(np.float32),
                     dtype=jnp.bfloat16)
    dx, dq, ds = _qmm_bwd((x, qw["q"], qw["s"]), dy)
    assert dq is None and ds is None and dx.dtype == x.dtype
    wd = np.asarray(qw["q"], np.float32) * np.asarray(qw["s"])
    ref = np.einsum("btn,kn->btk", np.asarray(dy, np.float32), wd)
    np.testing.assert_allclose(np.asarray(dx, np.float32), ref,
                               rtol=3e-2, atol=3e-2)
