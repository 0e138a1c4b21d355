"""KV-cached generation: cache-consistency vs full forward, determinism."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tdax.models.qwen_vl import QwenVLConfig, forward, init_params
from tdax.models.qwen_vl.generate import generate

CFG = QwenVLConfig.tiny(dtype="float32")


@pytest.fixture(scope="module")
def setup():
    params = init_params(jax.random.PRNGKey(0), CFG, with_visual=False)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, CFG.vocab_size, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    return params, jnp.asarray(ids), jnp.asarray(mask)


def test_greedy_matches_incremental_full_forward(setup):
    """The KV-cached decode must produce the same greedy continuation as
    repeatedly re-running the full (uncached) forward — the definitive
    cache-correctness check."""
    params, ids, mask = setup
    n_new = 6
    gen = np.asarray(generate(params, CFG, ids, mask, max_new_tokens=n_new))

    cur_ids = np.asarray(ids)
    for step in range(n_new):
        logits = np.asarray(forward(params, CFG, jnp.asarray(cur_ids)))
        nxt = logits[:, -1, :].argmax(-1).astype(np.int32)
        np.testing.assert_array_equal(gen[:, step], nxt,
                                      err_msg=f"divergence at step {step}")
        cur_ids = np.concatenate([cur_ids, nxt[:, None]], axis=1)


def test_generate_deterministic_and_sampling_varies(setup):
    params, ids, mask = setup
    a = np.asarray(generate(params, CFG, ids, mask, max_new_tokens=4))
    b = np.asarray(generate(params, CFG, ids, mask, max_new_tokens=4))
    np.testing.assert_array_equal(a, b)
    s1 = np.asarray(generate(params, CFG, ids, mask, max_new_tokens=8,
                             temperature=1.0, key=jax.random.PRNGKey(1)))
    s2 = np.asarray(generate(params, CFG, ids, mask, max_new_tokens=8,
                             temperature=1.0, key=jax.random.PRNGKey(2)))
    assert not np.array_equal(s1, s2)


def test_generate_ragged_prompts(setup):
    """Right-padded shorter prompts must generate as if unpadded."""
    params, ids, mask = setup
    ids = np.asarray(ids).copy()
    mask = np.asarray(mask).copy()
    ids[1, 7:] = 0
    mask[1, 7:] = 0
    gen = np.asarray(generate(params, CFG, jnp.asarray(ids), jnp.asarray(mask),
                              max_new_tokens=3))
    # sample 1 alone, unpadded
    solo = np.asarray(generate(params, CFG, jnp.asarray(ids[1:, :7]),
                               jnp.asarray(mask[1:, :7]), max_new_tokens=3))
    np.testing.assert_array_equal(gen[1], solo[0])


def test_kv_int8_cache_quantization_bound(setup):
    """Dequantized int8 caches must match the fp caches within the
    per-row abs-max/127 rounding bound (0.5 ulp of the int8 grid)."""
    from tdax.models.qwen_vl.generate import _kv_dequant, prefill
    params, ids, mask = setup
    _, ks, vs = prefill(params, CFG, ids, mask, t_max=14)
    _, ksq, vsq = prefill(params, CFG, ids, mask, t_max=14, kv_int8=True)
    for fp, qd in ((ks, ksq), (vs, vsq)):
        row_max = np.abs(np.asarray(fp)).max(axis=-1, keepdims=True)
        err = np.abs(np.asarray(_kv_dequant(qd, jnp.float32)) - np.asarray(fp))
        assert (err <= row_max / 127.0 * 0.5 + 1e-6).all()


def test_kv_int8_decode_logits_close(setup):
    """A decode step through int8 caches stays close to the fp-cache
    logits (the only error source is the ~1e-2 cache rounding)."""
    from tdax.models.qwen_vl.generate import _decode_step, prefill
    params, ids, mask = setup
    t_max = 14
    lengths = jnp.sum(mask, axis=1).astype(jnp.int32)
    _, ks, vs = prefill(params, CFG, ids, mask, t_max=t_max)
    _, ksq, vsq = prefill(params, CFG, ids, mask, t_max=t_max, kv_int8=True)
    tok = jnp.asarray(np.asarray(ids)[:, -1])
    lg_f, _, _ = _decode_step(params, CFG, tok, lengths, ks, vs)
    lg_q, ksq, vsq = _decode_step(params, CFG, tok, lengths, ksq, vsq)
    lg_f, lg_q = np.asarray(lg_f), np.asarray(lg_q)
    scale = np.abs(lg_f).max()
    assert np.abs(lg_q - lg_f).max() < 0.05 * scale
    # the scattered new row went through quantization too
    assert ksq["q"].dtype == jnp.int8 and vsq["q"].dtype == jnp.int8


def test_kv_int8_ragged_parity(setup):
    """The ragged-prompt guarantee holds under int8 caches: quantization
    is per (token, head) row, so padding cannot leak across samples."""
    params, ids, mask = setup
    ids = np.asarray(ids).copy()
    mask = np.asarray(mask).copy()
    ids[1, 7:] = 0
    mask[1, 7:] = 0
    gen = np.asarray(generate(params, CFG, jnp.asarray(ids), jnp.asarray(mask),
                              max_new_tokens=3, kv_int8=True))
    solo = np.asarray(generate(params, CFG, jnp.asarray(ids[1:, :7]),
                               jnp.asarray(mask[1:, :7]), max_new_tokens=3,
                               kv_int8=True))
    np.testing.assert_array_equal(gen[1], solo[0])


def test_generate_with_int8(setup):
    from tdax.models.qwen_vl.quantize import quantize_params
    params, ids, mask = setup
    q = quantize_params(params)
    gen = np.asarray(generate(q, CFG, ids, mask, max_new_tokens=4))
    assert gen.shape == (2, 4)
    assert ((gen >= 0) & (gen < CFG.vocab_size)).all()


def test_sample_logits_filters():
    """top-k / top-p masks restrict draws to exactly the intended
    support; degenerate settings reduce to greedy."""
    from tdax.models.qwen_vl.generate import sample_logits

    logits = jnp.asarray([[0.0, 3.0, 1.0, 2.5, -1.0],
                          [5.0, 0.0, 0.1, 0.2, 0.3]])
    best = np.array([1, 0])

    # temperature 0 -> argmax regardless of filters
    np.testing.assert_array_equal(
        np.asarray(sample_logits(logits, jax.random.PRNGKey(0), 0.0,
                                 top_k=3, top_p=0.5)), best)
    # top_k=1 -> argmax even at high temperature
    for s in range(5):
        np.testing.assert_array_equal(
            np.asarray(sample_logits(logits, jax.random.PRNGKey(s), 5.0,
                                     top_k=1)), best)
    # tiny top_p -> only the first (highest-prob) token survives
    for s in range(5):
        np.testing.assert_array_equal(
            np.asarray(sample_logits(logits, jax.random.PRNGKey(s), 1.0,
                                     top_p=1e-6)), best)

    # top_k=3: row-0 support {1, 3, 2}, row-1 support {0, 4, 3}
    draws = np.stack([np.asarray(sample_logits(logits, jax.random.PRNGKey(s),
                                               temperature=3.0, top_k=3))
                      for s in range(200)])
    assert set(draws[:, 0]) == {1, 2, 3}
    assert set(draws[:, 1]) <= {0, 3, 4} and 0 in set(draws[:, 1])

    # top_p: row 0 probs ~ [.03, .61, .08, .37]-ish -> 0.7 keeps {1, 3}
    draws = np.stack([np.asarray(sample_logits(logits, jax.random.PRNGKey(s),
                                               temperature=1.0, top_p=0.7))
                      for s in range(200)])
    assert set(draws[:, 0]) == {1, 3}
    assert set(draws[:, 1]) == {0}  # row 1: token 0 carries ~0.95 mass


def test_generate_with_sampling_filters(setup):
    """generate() with top-k/top-p runs, is deterministic under a fixed
    key, and differs from the unfiltered draw."""
    params, ids, mask = setup
    kw = dict(max_new_tokens=6, temperature=1.0, key=jax.random.PRNGKey(3))
    a = np.asarray(generate(params, CFG, ids, mask, top_k=5, top_p=0.9, **kw))
    b = np.asarray(generate(params, CFG, ids, mask, top_k=5, top_p=0.9, **kw))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(generate(params, CFG, ids, mask, **kw))
    assert a.shape == c.shape == (2, 6)


def test_generate_value_sweeps_do_not_recompile(setup):
    """temperature/top_p/eos/pad VALUES are dynamic scalars: a serving
    loop sweeping them must reuse one compiled program (only structural
    gates — greedy-vs-sampled, top_k, top-p on/off, eos set — retrace)."""
    from tdax.models.qwen_vl.generate import _generate_core

    params, ids, mask = setup
    kw = dict(max_new_tokens=4, key=jax.random.PRNGKey(0))
    generate(params, CFG, ids, mask, temperature=0.7, top_p=0.9,
             eos_token_id=3, pad_token_id=0, **kw)
    n0 = _generate_core._cache_size()
    generate(params, CFG, ids, mask, temperature=0.9, top_p=0.95,
             eos_token_id=5, pad_token_id=-1, **kw)
    assert _generate_core._cache_size() == n0, \
        "sampling-value sweep triggered a recompile"


def test_generate_eos_masks_tail(setup):
    """With eos_token_id set, every token after a sample's first EOS is
    pad, and tokens up to (and incl.) the EOS match the unmasked run."""
    params, ids, mask = setup
    n_new = 8
    base = np.asarray(generate(params, CFG, ids, mask, max_new_tokens=n_new))
    # choose an eos id that actually occurs mid-stream for sample 0
    eos = int(base[0, 3])
    pad = -1
    out = np.asarray(generate(params, CFG, ids, mask, max_new_tokens=n_new,
                              eos_token_id=eos, pad_token_id=pad))
    for bi in range(out.shape[0]):
        hits = np.where(base[bi] == eos)[0]
        cut = int(hits[0]) if len(hits) else n_new - 1
        np.testing.assert_array_equal(out[bi, :cut + 1], base[bi, :cut + 1])
        assert (out[bi, cut + 1:] == pad).all()
