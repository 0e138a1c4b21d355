"""Qwen-VL model tests: numerics vs an independent torch implementation,
capture semantics, padding invariance, tokenizer, conversion layout."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tdax.models.qwen_vl import (QwenVLConfig, extract_layer_activations,
                                 forward, init_params)
from tdax.models.qwen_vl.convert import convert_hf_state_dict
from tdax.models.qwen_vl.decoder import decoder_capture
from tdax.models.qwen_vl.model import embed_inputs
from tdax.models.qwen_vl.tokenizer import (ToyTokenizer, batch_encode,
                                           find_last_text_token_index,
                                           from_list_format)

CFG = QwenVLConfig.tiny(dtype="float32")


# --- independent torch reference of the QWen decoder --------------------------

def torch_qwen_forward_capture(state, cfg, ids_np, mask_np, last_idx_np):
    """Written directly from the QWen architecture spec (RMSNorm, fused
    QKV+bias, NeoX rotary, causal attention, SwiGLU w1*silu(w2)->c_proj)
    using torch Linear [out, in] conventions — an independent oracle for
    both tdax's forward math and its HF->pytree conversion."""
    import torch

    eps = cfg.layer_norm_eps
    nh, hd = cfg.num_heads, cfg.head_dim
    x = torch.tensor(state["transformer.wte.weight"])[torch.tensor(ids_np)]
    b, t, h = x.shape
    mask = torch.tensor(mask_np)

    pos = torch.arange(t, dtype=torch.float64)
    inv = 1.0 / (cfg.rope_base ** (torch.arange(0, hd, 2, dtype=torch.float64) / hd))
    ang = torch.outer(pos, inv)
    cos = torch.cat([ang.cos(), ang.cos()], -1).float()
    sin = torch.cat([ang.sin(), ang.sin()], -1).float()

    def rot_half(v):
        v1, v2 = v.chunk(2, -1)
        return torch.cat([-v2, v1], -1)

    def rms(v, w):
        return v * torch.rsqrt((v.float() ** 2).mean(-1, keepdim=True) + eps) * torch.tensor(w)

    causal = torch.tril(torch.ones(t, t, dtype=torch.bool))
    attn_bias = torch.where(causal[None] & (mask[:, None, :] > 0), 0.0, -1e30)

    captures = []
    for i in range(cfg.num_layers):
        p = f"transformer.h.{i}."
        hst = rms(x, state[p + "ln_1.weight"])
        qkv = hst @ torch.tensor(state[p + "attn.c_attn.weight"]).T \
            + torch.tensor(state[p + "attn.c_attn.bias"])
        q, k, v = qkv.chunk(3, -1)
        q = q.view(b, t, nh, hd)
        k = k.view(b, t, nh, hd)
        v = v.view(b, t, nh, hd)
        q = q * cos[None, :, None, :] + rot_half(q) * sin[None, :, None, :]
        k = k * cos[None, :, None, :] + rot_half(k) * sin[None, :, None, :]
        logits = torch.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        probs = torch.softmax(logits + attn_bias[:, None], -1)
        out = torch.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, h)
        x = x + out @ torch.tensor(state[p + "attn.c_proj.weight"]).T
        hst = rms(x, state[p + "ln_2.weight"])
        a1 = hst @ torch.tensor(state[p + "mlp.w1.weight"]).T
        a2 = hst @ torch.tensor(state[p + "mlp.w2.weight"]).T
        x = x + (a1 * torch.nn.functional.silu(a2)) @ torch.tensor(state[p + "mlp.c_proj.weight"]).T
        captures.append(x[torch.arange(b), torch.tensor(last_idx_np)].clone())

    xf = rms(x, state["transformer.ln_f.weight"])
    logits = xf @ torch.tensor(state["lm_head.weight"]).T
    return torch.stack(captures).numpy(), logits.numpy()


def random_hf_state(cfg, seed=0):
    rng = np.random.default_rng(seed)
    h, l, f2, v = cfg.hidden_size, cfg.num_layers, cfg.ff_half, cfg.vocab_size

    def r(*shape, s=0.05):
        return (rng.normal(0, s, shape)).astype(np.float32)

    state = {"transformer.wte.weight": r(v, h),
             "transformer.ln_f.weight": 1.0 + r(h, s=0.01),
             "lm_head.weight": r(v, h)}
    for i in range(l):
        p = f"transformer.h.{i}."
        state[p + "ln_1.weight"] = 1.0 + r(h, s=0.01)
        state[p + "ln_2.weight"] = 1.0 + r(h, s=0.01)
        state[p + "attn.c_attn.weight"] = r(3 * h, h)
        state[p + "attn.c_attn.bias"] = r(3 * h)
        state[p + "attn.c_proj.weight"] = r(h, h)
        state[p + "mlp.w1.weight"] = r(f2, h)
        state[p + "mlp.w2.weight"] = r(f2, h)
        state[p + "mlp.c_proj.weight"] = r(h, f2)
    return state


@pytest.fixture(scope="module")
def converted():
    state = random_hf_state(CFG)
    params = jax.tree.map(jnp.asarray, convert_hf_state_dict(state, CFG))
    return state, params


def test_decoder_matches_torch_oracle(converted):
    state, params = converted
    rng = np.random.default_rng(1)
    b, t = 3, 20
    ids = rng.integers(1, CFG.vocab_size, (b, t)).astype(np.int32)
    mask = np.ones((b, t), np.int32)
    mask[1, 15:] = 0  # padded sample
    ids[1, 15:] = 0
    last_idx = np.array([t - 1, 14, 7], np.int32)

    ours = np.asarray(extract_layer_activations(
        params, CFG, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(last_idx)))
    theirs, logits_t = torch_qwen_forward_capture(state, CFG, ids, mask, last_idx)

    assert ours.shape == (CFG.num_layers, b, CFG.hidden_size)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)

    logits_j = np.asarray(forward(params, CFG, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(
        logits_j[0, : , :], logits_t[0], rtol=2e-3, atol=2e-4)


def test_capture_is_post_block_hidden(converted):
    """capture[i] must equal the hidden state AFTER block i (the
    reference's hook semantics, extract_activations.py:37-39)."""
    _, params = converted
    ids = jnp.asarray(np.arange(1, 13, dtype=np.int32)[None])
    mask = jnp.ones_like(ids)
    last = jnp.asarray([11], dtype=jnp.int32)
    cap = np.asarray(extract_layer_activations(params, CFG, ids, mask, last))
    x = params["wte"][ids]
    from tdax.models.qwen_vl.decoder import block, causal_mask, rotary_cos_sin
    positions = jnp.broadcast_to(jnp.arange(12)[None], (1, 12))
    cos, sin = rotary_cos_sin(positions, CFG.head_dim, CFG.rope_base)
    m = causal_mask(mask)
    for i in range(CFG.num_layers):
        layer = jax.tree.map(lambda a: a[i], params["layers"])
        x = block(x, layer, CFG, cos, sin, m)
        np.testing.assert_allclose(cap[i], np.asarray(x[:, 11]), rtol=1e-5, atol=1e-6)


def test_padding_invariance(converted):
    """A sample's captured activations must not depend on batch padding."""
    _, params = converted
    rng = np.random.default_rng(2)
    seq = rng.integers(1, CFG.vocab_size, 10).astype(np.int32)

    def run(t_pad):
        ids = np.zeros((1, t_pad), np.int32)
        ids[0, :10] = seq
        mask = np.zeros((1, t_pad), np.int32)
        mask[0, :10] = 1
        return np.asarray(extract_layer_activations(
            params, CFG, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray([9], dtype=jnp.int32)))

    np.testing.assert_allclose(run(10), run(24), rtol=1e-4, atol=1e-5)


# --- tokenizer -----------------------------------------------------------------

def test_from_list_format():
    q = from_list_format([{"image": "a/b.png"}, {"text": "a photo of a red cube"}])
    assert q == "Picture 1: <img>a/b.png</img>\na photo of a red cube"


def test_last_text_token_search():
    assert find_last_text_token_index([5, 6, 7, 8, 9], [7, 8]) == 3
    assert find_last_text_token_index([5, 6, 7], [9, 9]) == -2  # fallback
    assert find_last_text_token_index([1, 2, 1, 2], [1, 2]) == 1  # first match


def test_batch_encode_layout():
    tok = ToyTokenizer(CFG)
    samples = [{"id": "x", "image_path": "img.png", "prompt": "red cube"},
               {"id": "y", "image_path": "img2.png", "prompt": "a longer blue sphere prompt"}]
    batch = batch_encode(tok, samples, CFG)
    b, t = batch["input_ids"].shape
    assert b == 2
    assert (batch["attn_mask"].sum(1) > 0).all()
    nq = CFG.visual.n_queries
    # image span is a contiguous run of img_pad ids
    for j in range(2):
        span = batch["image_positions"][j]
        assert (np.diff(span) == 1).all()
        assert (batch["input_ids"][j, span] == CFG.img_pad_id % CFG.vocab_size).all()
        # last text token is the final non-pad token (text comes last)
        assert batch["last_token_idx"][j] == batch["attn_mask"][j].sum() - 1
    assert batch["image_paths"] == ["img.png", "img2.png"]


def test_image_fusion(converted):
    """Visual tokens replace embeddings exactly on the image span."""
    _, params_text = converted
    params = init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(3)
    nq, t = CFG.visual.n_queries, 40
    ids = rng.integers(1, CFG.vocab_size, (2, t)).astype(np.int32)
    pos = np.stack([np.arange(3, 3 + nq), np.full(nq, -1)]).astype(np.int32)
    imgs = rng.normal(size=(2, 3, CFG.visual.image_size, CFG.visual.image_size)).astype(np.float32)
    x = np.asarray(embed_inputs(params, CFG, jnp.asarray(ids),
                                jnp.asarray(imgs), jnp.asarray(pos)))
    base = np.asarray(params["wte"])[ids]
    # sample 0: span replaced, elsewhere untouched
    assert not np.allclose(x[0, 3:3 + nq], base[0, 3:3 + nq])
    np.testing.assert_allclose(x[0, :3], base[0, :3], rtol=1e-6)
    np.testing.assert_allclose(x[0, 3 + nq:], base[0, 3 + nq:], rtol=1e-6)
    # sample 1: no image -> untouched
    np.testing.assert_allclose(x[1], base[1], rtol=1e-6)
