"""Real-checkpoint readiness: visual-path torch oracle, sharded
bf16-safetensors loading in the real HF file layout, and a
weights-gated integration test that fires the moment a real
``qwen-vl-chat-local`` snapshot exists (extract_activations.py:17-54).
"""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tdax.models.qwen_vl import QwenVLConfig, extract_layer_activations
from tdax.models.qwen_vl.config import VisualConfig
from tdax.models.qwen_vl.convert import (convert_hf_state_dict,
                                         load_hf_state_dict,
                                         load_qwen_checkpoint)
from tdax.models.qwen_vl.vit import visual_encode

from tests.test_model import random_hf_state, torch_qwen_forward_capture

# query grid (4) != patch grid (8): exercises the kv pos-embed upsampling
VCFG = VisualConfig(image_size=112, patch_size=14, width=32, layers=2,
                    heads=2, mlp_dim=64, output_dim=64, n_queries=16,
                    resampler_heads=4)
CFG = QwenVLConfig.tiny(dtype="float32")


# --- independent torch implementation of the Qwen-VL visual module ----------

def torch_visual_forward(state, v: VisualConfig, images_np):
    """Written from the Qwen-VL architecture spec: patch conv (no bias),
    learned absolute pos embed, pre-LN CLIP blocks, then the Resampler
    (queries = ln_q(query) + query-grid sincos; keys = ln_kv(kv_proj(x))
    + the SAME table bicubic-upsampled to the patch grid via get_abs_pos;
    values take no pos), then ln_post and the output proj matrix."""
    import torch
    import torch.nn.functional as F

    def T(name):
        return torch.tensor(state[name])

    x = torch.tensor(images_np)
    pv = "transformer.visual."
    conv = T(pv + "conv1.weight")  # [width, 3, p, p]
    x = F.conv2d(x, conv, stride=v.patch_size)  # [B, w, g, g]
    b, w, g, _ = x.shape
    x = x.reshape(b, w, g * g).permute(0, 2, 1)

    def get_abs_pos(pos, tgt_len):
        src = int(np.sqrt(pos.shape[0]))
        tgt = int(np.sqrt(tgt_len))
        if src == tgt:
            return pos
        return F.interpolate(
            pos.float().reshape(1, src, src, -1).permute(0, 3, 1, 2),
            size=(tgt, tgt), mode="bicubic", align_corners=False,
        ).permute(0, 2, 3, 1).reshape(tgt * tgt, -1)

    x = x + get_abs_pos(T(pv + "positional_embedding"), x.shape[1])
    eps = v.layer_norm_eps

    def ln(t, wn, bn):
        return F.layer_norm(t, (t.shape[-1],), T(wn), T(bn), eps)

    x = ln(x, pv + "ln_pre.weight", pv + "ln_pre.bias")

    def mha(q, k, val, heads):
        bq, tq, d = q.shape
        tk = k.shape[1]
        hd = d // heads
        q = q.reshape(bq, tq, heads, hd).permute(0, 2, 1, 3)
        k = k.reshape(bq, tk, heads, hd).permute(0, 2, 1, 3)
        val = val.reshape(bq, tk, heads, hd).permute(0, 2, 1, 3)
        probs = torch.softmax(q @ k.transpose(-1, -2) / np.sqrt(hd), -1)
        return (probs @ val).permute(0, 2, 1, 3).reshape(bq, tq, d)

    for i in range(v.layers):
        pb = f"{pv}transformer.resblocks.{i}."
        h = ln(x, pb + "ln_1.weight", pb + "ln_1.bias")
        qkv = h @ T(pb + "attn.in_proj_weight").T + T(pb + "attn.in_proj_bias")
        q, k, val = qkv.chunk(3, -1)
        a = mha(q, k, val, v.heads)
        x = x + a @ T(pb + "attn.out_proj.weight").T + T(pb + "attn.out_proj.bias")
        h = ln(x, pb + "ln_2.weight", pb + "ln_2.bias")
        h = h @ T(pb + "mlp.c_fc.weight").T + T(pb + "mlp.c_fc.bias")
        h = F.gelu(h)
        x = x + h @ T(pb + "mlp.c_proj.weight").T + T(pb + "mlp.c_proj.bias")

    # resampler (attn_pool)
    rp = pv + "attn_pool."
    d = v.output_dim
    kv_pos = get_abs_pos(T(rp + "pos_embed"), x.shape[1])
    kv = x @ T(rp + "kv_proj.weight").T
    kv = ln(kv, rp + "ln_kv.weight", rp + "ln_kv.bias")
    q = ln(T(rp + "query"), rp + "ln_q.weight", rp + "ln_q.bias")
    in_w, in_b = T(rp + "attn.in_proj_weight"), T(rp + "attn.in_proj_bias")
    qh = (q + T(rp + "pos_embed")) @ in_w[:d].T + in_b[:d]
    kh = (kv + kv_pos) @ in_w[d:2 * d].T + in_b[d:2 * d]
    vh = kv @ in_w[2 * d:].T + in_b[2 * d:]
    out = mha(qh.expand(b, -1, -1), kh, vh, v.resampler_heads)
    out = out @ T(rp + "attn.out_proj.weight").T + T(rp + "attn.out_proj.bias")
    out = ln(out, pv + "ln_post.weight", pv + "ln_post.bias")
    return (out @ T(pv + "proj")).numpy()


def random_hf_visual_state(v: VisualConfig, seed=0):
    from tdax.models.qwen_vl.vit import sincos_2d
    rng = np.random.default_rng(seed)
    w, d = v.width, v.output_dim
    q_grid = int(np.sqrt(v.n_queries))

    def r(*shape, s=0.05):
        return rng.normal(0, s, shape).astype(np.float32)

    pv = "transformer.visual."
    state = {
        pv + "conv1.weight": r(w, 3, v.patch_size, v.patch_size),
        pv + "positional_embedding": r(v.n_patches, w, s=0.02),
        pv + "ln_pre.weight": 1 + r(w, s=0.01), pv + "ln_pre.bias": r(w, s=0.01),
        pv + "ln_post.weight": 1 + r(d, s=0.01), pv + "ln_post.bias": r(d, s=0.01),
        pv + "proj": r(d, d),
    }
    for i in range(v.layers):
        pb = f"{pv}transformer.resblocks.{i}."
        state.update({
            pb + "ln_1.weight": 1 + r(w, s=0.01), pb + "ln_1.bias": r(w, s=0.01),
            pb + "ln_2.weight": 1 + r(w, s=0.01), pb + "ln_2.bias": r(w, s=0.01),
            pb + "attn.in_proj_weight": r(3 * w, w), pb + "attn.in_proj_bias": r(3 * w),
            pb + "attn.out_proj.weight": r(w, w), pb + "attn.out_proj.bias": r(w),
            pb + "mlp.c_fc.weight": r(v.mlp_dim, w), pb + "mlp.c_fc.bias": r(v.mlp_dim),
            pb + "mlp.c_proj.weight": r(w, v.mlp_dim), pb + "mlp.c_proj.bias": r(w),
        })
    rp = pv + "attn_pool."
    state.update({
        rp + "query": r(v.n_queries, d, s=0.02),
        rp + "pos_embed": sincos_2d(q_grid, d),  # the checkpoint stores it
        rp + "kv_proj.weight": r(d, w),
        rp + "ln_q.weight": 1 + r(d, s=0.01), rp + "ln_q.bias": r(d, s=0.01),
        rp + "ln_kv.weight": 1 + r(d, s=0.01), rp + "ln_kv.bias": r(d, s=0.01),
        rp + "attn.in_proj_weight": r(3 * d, d), rp + "attn.in_proj_bias": r(3 * d),
        rp + "attn.out_proj.weight": r(d, d), rp + "attn.out_proj.bias": r(d),
    })
    return state


def test_visual_matches_torch_oracle():
    """tdax visual_encode == the torch oracle on converted weights,
    including the query-grid -> patch-grid pos-embed upsampling."""
    cfg = QwenVLConfig.tiny(dtype="float32")
    cfg = type(cfg)(**{**cfg.__dict__, "visual": VCFG, "dtype": "float32"})
    state = random_hf_visual_state(VCFG)
    state.update(random_hf_state(cfg))
    params = convert_hf_state_dict(state, cfg)

    rng = np.random.default_rng(5)
    images = rng.normal(size=(2, 3, VCFG.image_size, VCFG.image_size)).astype(np.float32)
    ours = np.asarray(visual_encode(jnp.asarray(images),
                                    jax.tree.map(jnp.asarray, params["visual"]),
                                    VCFG))
    theirs = torch_visual_forward(state, VCFG, images)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)


def _write_sharded_safetensors(state, out_dir, n_shards=3):
    """Write state as bf16 sharded safetensors in the real HF layout
    (model-0000X-of-0000N.safetensors + model.safetensors.index.json)."""
    import torch
    from safetensors.torch import save_file
    keys = sorted(state)
    per = (len(keys) + n_shards - 1) // n_shards
    weight_map = {}
    for s in range(n_shards):
        shard_keys = keys[s * per:(s + 1) * per]
        fname = f"model-{s + 1:05d}-of-{n_shards:05d}.safetensors"
        tensors = {k: torch.tensor(state[k]).to(torch.bfloat16)
                   for k in shard_keys}
        save_file(tensors, os.path.join(out_dir, fname))
        weight_map.update({k: fname for k in shard_keys})
    with open(os.path.join(out_dir, "model.safetensors.index.json"), "w") as f:
        json.dump({"metadata": {}, "weight_map": weight_map}, f)


def test_sharded_bf16_safetensors_roundtrip(tmp_path):
    """convert.py consumes a checkpoint written in the real sharded
    bf16-safetensors layout; the converted model's captures match the
    torch oracle run on the same (bf16-rounded) weights."""
    state = random_hf_state(CFG)
    _write_sharded_safetensors(state, str(tmp_path))

    loaded = load_hf_state_dict(str(tmp_path))
    assert set(loaded) == set(state)
    # bf16 rounding is the only allowed difference
    import torch
    rounded = {k: torch.tensor(v).to(torch.bfloat16).float().numpy()
               for k, v in state.items()}
    for k in state:
        np.testing.assert_array_equal(loaded[k], rounded[k])

    params = jax.tree.map(jnp.asarray, load_qwen_checkpoint(str(tmp_path), CFG))
    rng = np.random.default_rng(2)
    ids = rng.integers(1, CFG.vocab_size, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    last = np.array([11, 11], np.int32)
    ours = np.asarray(extract_layer_activations(
        params, CFG, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(last)))
    theirs, _ = torch_qwen_forward_capture(rounded, CFG, ids, mask, last)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)


def test_duplicate_shard_keys_rejected(tmp_path):
    import torch
    from safetensors.torch import save_file
    t = {"transformer.ln_f.weight": torch.ones(4)}
    save_file(t, str(tmp_path / "model-00001-of-00002.safetensors"))
    save_file(t, str(tmp_path / "model-00002-of-00002.safetensors"))
    with pytest.raises(ValueError, match="duplicate"):
        load_hf_state_dict(str(tmp_path))


def test_gate_rehearsal_synthetic_full_layout_snapshot(tmp_path):
    """Dress rehearsal of the weights-gated parity test on a SYNTHETIC
    snapshot in the real file layout (sharded bf16 safetensors with the
    decoder + visual + resampler key set, plus the tokenizer fixture's
    trust_remote_code-style files): every step the gated test runs
    except the HF AutoModel forward — load_qwen_checkpoint, tokenizer
    adapter, dataset item -> batch_encode -> image preprocessing ->
    multimodal extract — so the moment real weights appear, parity is
    one command (VERDICT r4 #8).  The loaded-from-disk capture must
    equal the capture from the same state converted in memory."""
    import shutil

    from tdax.config import DatasetConfig
    from tdax.data import generate_dataset
    from tdax.models.qwen_vl.preprocess import load_image_batch
    from tdax.models.qwen_vl.tokenizer import batch_encode, get_tokenizer

    cfg = QwenVLConfig.tiny(dtype="float32")
    cfg = type(cfg)(**{**cfg.__dict__, "visual": VCFG, "dtype": "float32"})
    state = random_hf_state(cfg)
    state.update(random_hf_visual_state(VCFG))
    snap = tmp_path / "snapshot"
    snap.mkdir()
    _write_sharded_safetensors(state, str(snap))
    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "qwen_tok_fixture")
    for f in os.listdir(fixture):
        shutil.copy(os.path.join(fixture, f), snap / f)

    params = jax.tree.map(jnp.asarray, load_qwen_checkpoint(str(snap), cfg))
    tok = get_tokenizer(str(snap), cfg)
    meta = generate_dataset(DatasetConfig(data_dir=str(tmp_path / "ds")))
    enc = batch_encode(tok, meta[:2], cfg)
    images = load_image_batch(enc["image_paths"], cfg.visual.image_size)
    ours = np.asarray(extract_layer_activations(
        params, cfg, jnp.asarray(enc["input_ids"]),
        jnp.asarray(enc["attn_mask"]), jnp.asarray(enc["last_token_idx"]),
        jnp.asarray(images.astype(np.float32)),
        jnp.asarray(enc["image_positions"])))
    assert ours.shape == (cfg.num_layers, 2, cfg.hidden_size)
    assert np.isfinite(ours).all()

    # loading from the sharded files must equal the in-memory conversion
    # of the same (bf16-rounded) state
    import torch
    rounded = {k: torch.tensor(v).to(torch.bfloat16).float().numpy()
               for k, v in state.items()}
    params_mem = jax.tree.map(jnp.asarray,
                              convert_hf_state_dict(rounded, cfg))
    ref = np.asarray(extract_layer_activations(
        params_mem, cfg, jnp.asarray(enc["input_ids"]),
        jnp.asarray(enc["attn_mask"]), jnp.asarray(enc["last_token_idx"]),
        jnp.asarray(images.astype(np.float32)),
        jnp.asarray(enc["image_positions"])))
    np.testing.assert_array_equal(ours, ref)


# --- weights-gated integration: fires when the real snapshot exists ---------

_REAL_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                         "qwen-vl-chat-local")


def _real_checkpoint_present() -> bool:
    if not os.path.isdir(_REAL_DIR):
        return False
    return any(f.endswith((".safetensors", ".bin")) and
               os.path.getsize(os.path.join(_REAL_DIR, f)) > 1 << 20
               for f in os.listdir(_REAL_DIR))


@pytest.mark.skipif(not _real_checkpoint_present(),
                    reason="no real qwen-vl-chat-local checkpoint")
def test_real_checkpoint_layer_parity():
    """The reference's exact flow (extract_activations.py:17-54,110-127):
    load the real snapshot with HF transformers (trust_remote_code ships
    modeling code inside the snapshot), hook all 32 blocks, run one
    multimodal forward; tdax converts the same snapshot and captures the
    same sample — all 32 layers' last-text-token vectors must agree."""
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    cfg = QwenVLConfig()  # full size
    tok = AutoTokenizer.from_pretrained(_REAL_DIR, trust_remote_code=True,
                                        local_files_only=True)
    model = AutoModelForCausalLM.from_pretrained(
        _REAL_DIR, device_map="cpu", trust_remote_code=True,
        local_files_only=True, fp16=False).eval()

    from tdax.data import generate_dataset
    from tdax.config import DatasetConfig
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        meta = generate_dataset(DatasetConfig(data_dir=os.path.join(d, "ds")))
        item = meta[0]
        query = tok.from_list_format([{"image": item["image_path"]},
                                      {"text": item["prompt"]}])
        inputs = tok(query, return_tensors="pt")

        acts = {}
        hooks = []
        for i in range(cfg.num_layers):
            def mk(idx):
                def hook(m, inp, out):
                    acts[idx] = out[0].detach().float()
                return hook
            hooks.append(model.transformer.h[i].register_forward_hook(mk(i)))
        with torch.no_grad():
            model(**inputs)
        for h in hooks:
            h.remove()

        text_ids = tok(item["prompt"])["input_ids"]
        ids = inputs["input_ids"][0].tolist()
        from tdax.models.qwen_vl.tokenizer import find_last_text_token_index
        last = find_last_text_token_index(ids, text_ids)

        params = load_qwen_checkpoint(_REAL_DIR, cfg)
        from tdax.models.qwen_vl.preprocess import load_image_batch
        from tdax.models.qwen_vl.tokenizer import get_tokenizer, batch_encode
        ttok = get_tokenizer(_REAL_DIR, cfg)
        enc = batch_encode(ttok, [item], cfg)
        images = load_image_batch(enc["image_paths"], cfg.visual.image_size)
        ours = np.asarray(extract_layer_activations(
            jax.tree.map(jnp.asarray, params), cfg,
            jnp.asarray(enc["input_ids"]), jnp.asarray(enc["attn_mask"]),
            jnp.asarray(enc["last_token_idx"]),
            jnp.asarray(images.astype(np.float32)),
            jnp.asarray(enc["image_positions"])))

        for i in range(cfg.num_layers):
            theirs = acts[i][0, last].numpy()
            np.testing.assert_allclose(ours[i, 0], theirs, rtol=5e-3, atol=5e-3)
