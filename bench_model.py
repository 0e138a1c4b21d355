#!/usr/bin/env python
"""Model-forward benchmark: tokens/s and MFU for the Qwen-VL capture path.

Decomposes what a "48-sample extraction in N seconds" claim is made of —
param init/quantize, tokenize, XLA compile, and the steady-state batched
forward — and reports throughput against the chip's peak (MFU).

Configs:
  toy        tiny random model (always runs; CI-sized sanity numbers)
  full-int8  the 9.66B-param full config, weight-only int8, single chip
  full-w8a8  full config with int8 activations too (serving mode: the
             MXU runs its native int8 path — 788 TOPS/s peak on v5e)

Peak FLOP/s reference (TPU v5e, per chip): 197e12 bf16, 394e12 int8 —
MFU here is computed against the bf16 peak (the int8 path still does
its matmul math after dequant at bf16-equivalent rates on the MXU).
Earlier rounds mistakenly used 394e12 as the bf16 peak; benches report
mfu_vs_394_legacy alongside for cross-round continuity.

Usage: python bench_model.py [toy|full-int8] [batch_size] [seq_len]
Prints one JSON line per stage plus a summary line with tokens/s + MFU.
"""

import json
import sys
import time

import numpy as np

# TPU v5e peak: 197 TFLOP/s bf16 (394 is the INT8 figure).  Rounds 1-4
# reported "MFU" against 394e12 — i.e. HALF the true bf16 MFU; the
# chip's measured matmul ceiling (~194 TFLOP/s, PARITY.md round-4 A/B)
# confirms 197 is the right denominator.  Benches now report both:
# mfu_vs_v5e_bf16 against the correct peak and mfu_vs_394_legacy for
# continuity with earlier rounds' numbers.
V5E_BF16_PEAK = 197e12
V5E_LEGACY_PEAK = 394e12


def count_params(tree) -> int:
    import jax
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def decoder_flops_per_token(cfg) -> float:
    """Forward FLOPs per token through the decoder stack (2*MACs), plus
    attention score/value math at the benchmark sequence length handled
    separately in main (it depends on t)."""
    h, l = cfg.hidden_size, cfg.num_layers
    ff = cfg.ff_half
    per_layer = 2 * (h * 3 * h        # qkv
                     + h * h          # attn out proj
                     + 3 * h * ff)    # swiglu w1, w2, c_proj
    return l * per_layer


def visual_flops(cfg) -> float:
    """Forward FLOPs for one image through the ViT + resampler."""
    v = cfg.visual
    n, w = v.n_patches, v.width
    per_block = 2 * (w * 3 * w + w * w + 2 * w * v.mlp_dim) * n \
        + 4 * n * n * w  # attention scores + values
    patch = 2 * n * 3 * v.patch_size ** 2 * w
    d = v.output_dim
    resampler = 2 * (n * w * d            # kv_proj
                     + (n + v.n_queries) * d * d * 2  # q/k/v in-proj (approx)
                     + v.n_queries * d * d)           # out proj
    cross = 4 * v.n_queries * n * d
    return patch + v.layers * per_block + resampler + cross + 2 * v.n_queries * d * d


def main() -> None:
    from tdax.utils import setup_runtime
    setup_runtime(want_device=True)
    import jax
    import jax.numpy as jnp
    from tdax.models.qwen_vl import QwenVLConfig, extract_layer_activations, init_params

    mode = sys.argv[1] if len(sys.argv) > 1 else "toy"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else (16 if mode == "toy" else 16)
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 320

    # one tiny round trip: opens the device session outside the timings
    np.asarray(jax.jit(lambda x: x + 1)(jnp.ones(4)))

    t0 = time.time()
    if mode == "toy":
        cfg = QwenVLConfig.tiny(dtype="float32")
        params = init_params(jax.random.PRNGKey(0), cfg)
    elif mode in ("full-int8", "full-w8a8"):
        cfg = QwenVLConfig(dtype="bfloat16")
        from tdax.models.qwen_vl.quantize import (init_params_quantized,
                                                  set_w8a8)
        params = init_params_quantized(jax.random.PRNGKey(0), cfg)
        if mode == "full-w8a8":
            set_w8a8(True)
    else:
        raise SystemExit(f"unknown mode {mode}")
    params = jax.device_put(params)
    jax.block_until_ready(params)
    t_init = time.time() - t0
    n_params = count_params(params)
    print(json.dumps({"stage": "init_params", "mode": mode,
                      "n_params": n_params, "value": round(t_init, 2),
                      "unit": "s"}))

    nq = cfg.visual.n_queries
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, t)).astype(np.int32))
    mask = jnp.ones((b, t), jnp.int32)
    last = jnp.asarray(np.full(b, t - 1, np.int32))
    images = jnp.asarray(rng.normal(size=(
        b, 3, cfg.visual.image_size, cfg.visual.image_size)).astype(np.float32))
    img_pos = jnp.asarray(np.tile(np.arange(2, 2 + nq, dtype=np.int32), (b, 1)))

    run = jax.jit(lambda p, i, m, l, im, ip:
                  extract_layer_activations(p, cfg, i, m, l, im, ip))

    t0 = time.time()
    out = run(params, ids, mask, last, images, img_pos)
    jax.block_until_ready(out)
    t_compile = time.time() - t0
    print(json.dumps({"stage": "compile_plus_first_run",
                      "value": round(t_compile, 2), "unit": "s"}))

    n_iters = 5
    t0 = time.time()
    for _ in range(n_iters):
        out = run(params, ids, mask, last, images, img_pos)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n_iters

    tokens = b * t
    attn = cfg.num_layers * 4 * t * t * cfg.hidden_size * b  # scores + values
    flops = tokens * decoder_flops_per_token(cfg) + attn + b * visual_flops(cfg)
    tok_s = tokens / dt
    mfu = flops / dt / V5E_BF16_PEAK
    on_tpu = jax.devices()[0].platform == "tpu"
    print(json.dumps({"stage": "steady_state_forward", "batch": b, "seq": t,
                      "value": round(dt, 4), "unit": "s/iter",
                      "tokens_per_s": round(tok_s, 1),
                      "tflops": round(flops / dt / 1e12, 2),
                      "mfu_vs_v5e_bf16": round(mfu, 4) if on_tpu else None,
                      "mfu_vs_394_legacy": (round(mfu * V5E_BF16_PEAK
                                                  / V5E_LEGACY_PEAK, 4)
                                            if on_tpu else None)}))
    print(json.dumps({"metric": f"model_forward_{mode}_b{b}_t{t}",
                      "value": round(tok_s, 1), "unit": "tokens/s",
                      "vs_baseline": None}))

    # decoder-only capture (images=None): isolates the 32-layer decoder
    # stack from the ViT+resampler for the MFU decomposition
    run_txt = jax.jit(lambda p, i, m, l:
                      extract_layer_activations(p, cfg, i, m, l, None, None))
    out = run_txt(params, ids, mask, last)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n_iters):
        out = run_txt(params, ids, mask, last)
    jax.block_until_ready(out)
    dt_txt = (time.time() - t0) / n_iters
    flops_txt = tokens * decoder_flops_per_token(cfg) + attn
    print(json.dumps({"stage": "steady_state_decoder_only", "batch": b,
                      "seq": t, "value": round(dt_txt, 4), "unit": "s/iter",
                      "tokens_per_s": round(tokens / dt_txt, 1),
                      "mfu_vs_v5e_bf16": (round(flops_txt / dt_txt
                                                / V5E_BF16_PEAK, 4)
                                          if on_tpu else None)}))


if __name__ == "__main__":
    main()
