#!/usr/bin/env python
"""Serving benchmark: prefill and steady-state decode throughput for the
KV-cached generation subsystem (tdax.models.qwen_vl.generate).

The reference only probes activations; generation is tdax's net-new
serving surface, so this bench supplies its perf evidence: prefill
tokens/s (prompt pass building the caches) and steady-state decode
tokens/s (the lax.scan one-token loop), per batch size.

Usage: python bench_generate.py [toy|full-int8] [batches] [prompt_len] [new_tokens] [kv8]
  batches: comma list, default "1,8,32"
  kv8: store K/V caches in int8 (halves cache HBM — batch 32 of the
       full config fits one chip; bf16 caches don't)
Prints one JSON line per (batch, stage) plus a headline line.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    from tdax.utils import setup_runtime
    setup_runtime(want_device=True)
    import functools

    import jax
    import jax.numpy as jnp
    from tdax.models.qwen_vl import QwenVLConfig, init_params
    from tdax.models.qwen_vl.generate import _decode_step, generate, prefill

    mode = sys.argv[1] if len(sys.argv) > 1 else "toy"
    batches = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2
                                else "1,8,32").split(",")]
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 320
    new_tokens = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    kv_int8 = len(sys.argv) > 5 and sys.argv[5] == "kv8"

    np.asarray(jax.jit(lambda x: x + 1)(jnp.ones(4)))  # open device session

    if mode == "toy":
        cfg = QwenVLConfig.tiny(dtype="float32")
        params = init_params(jax.random.PRNGKey(0), cfg, with_visual=False)
    elif mode == "full-int8":
        cfg = QwenVLConfig(dtype="bfloat16")
        from tdax.models.qwen_vl.quantize import init_params_quantized
        params = init_params_quantized(jax.random.PRNGKey(0), cfg,
                                       with_visual=False)
    else:
        raise SystemExit(f"unknown mode {mode}")
    params = jax.device_put(params)
    jax.block_until_ready(params)

    from tdax.models.qwen_vl.quantize import quantized_bytes
    param_bytes = quantized_bytes(params)
    HBM = 15.75e9  # one v5e chip

    rng = np.random.default_rng(0)
    results = {}
    for b in batches:
        ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, t), dtype=np.int64)
                          .astype(np.int32))
        mask = jnp.ones((b, t), jnp.int32)
        t_max = t + new_tokens

        # single-chip feasibility: params + k/v caches must fit in HBM
        # (batch 32 of the full config needs 9.7 GB params + 6.4 GB
        # caches = 16.1 GB > 15.75 — that batch size takes >= 2 chips
        # via the provided tp sharding, so skip it honestly here)
        kv_elem = 2 * cfg.num_layers * b * t_max * cfg.num_heads
        if kv_int8:
            # int8 values + one f32 scale per (token, head) row
            kv_bytes = kv_elem * (cfg.head_dim * 1 + 4)
        else:
            kv_bytes = kv_elem * cfg.head_dim * jnp.dtype(cfg.dtype).itemsize
        # 0.88: leave ~12% for activations, the per-layer pad transient,
        # and allocator fragmentation (b=32 full passes a 0.93 gate on
        # paper at 14.2 GB and still OOMs in practice)
        if param_bytes + kv_bytes > HBM * 0.88:
            print(json.dumps({
                "stage": "skipped_batch", "mode": mode, "batch": b,
                "kv_int8": kv_int8,
                "reason": "params+caches exceed one chip's HBM",
                "param_gb": round(param_bytes / 1e9, 2),
                "kv_gb": round(kv_bytes / 1e9, 2)}))
            continue

        prefill_fn = jax.jit(functools.partial(prefill, t_max=t_max,
                                               kv_int8=kv_int8),
                             static_argnums=(1,))  # cfg is static
        run_prefill = lambda: prefill_fn(params, cfg, ids, mask)  # noqa: E731

        out = run_prefill()
        jax.block_until_ready(out)  # compile
        n_iter = 5 if mode == "toy" else 3
        t0 = time.time()
        for _ in range(n_iter):
            out = run_prefill()
        jax.block_until_ready(out)
        dt_prefill = (time.time() - t0) / n_iter
        hidden, ks, vs = out

        print(json.dumps({
            "stage": "prefill", "mode": mode, "batch": b, "prompt_len": t,
            "kv_int8": kv_int8,
            "value": round(dt_prefill, 4), "unit": "s",
            "tokens_per_s": round(b * t / dt_prefill, 1)}))

        lengths = jnp.full((b,), t, jnp.int32)
        tok0 = jnp.zeros((b,), jnp.int32)

        # lengths is an argument, not a closure capture: an eagerly
        # created device array closed over by a jitted fn becomes a
        # lowering-time device fetch over the relay (CLAUDE.md gotcha)
        @jax.jit
        def decode_n(params, tok, lengths, ks, vs):
            def step(carry, i):
                tok, ks, vs = carry
                logits, ks, vs = _decode_step(params, cfg, tok,
                                              lengths + i, ks, vs)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (tok * 0 + nxt, ks, vs), nxt

            (_, ks, vs), toks = jax.lax.scan(
                step, (tok, ks, vs), jnp.arange(new_tokens, dtype=jnp.int32))
            return toks

        toks = decode_n(params, tok0, lengths, ks, vs)
        jax.block_until_ready(toks)  # compile
        t0 = time.time()
        for _ in range(n_iter):
            toks = decode_n(params, tok0, lengths, ks, vs)
        jax.block_until_ready(toks)
        dt_decode = (time.time() - t0) / n_iter
        tok_s = b * new_tokens / dt_decode

        print(json.dumps({
            "stage": "decode", "mode": mode, "batch": b, "kv_int8": kv_int8,
            "cache_len": t_max, "new_tokens": new_tokens,
            "value": round(dt_decode / new_tokens * 1000, 3), "unit": "ms/token",
            "tokens_per_s": round(tok_s, 1)}))

        # end-to-end generate() (prefill + decode in one jitted program)
        gen = generate(params, cfg, ids, mask, max_new_tokens=new_tokens,
                       kv_int8=kv_int8)
        jax.block_until_ready(gen)
        t0 = time.time()
        gen = generate(params, cfg, ids, mask, max_new_tokens=new_tokens,
                       kv_int8=kv_int8)
        jax.block_until_ready(gen)
        dt_e2e = time.time() - t0
        print(json.dumps({
            "stage": "generate_e2e", "mode": mode, "batch": b,
            "value": round(dt_e2e, 4), "unit": "s"}))
        results[b] = (b * t / dt_prefill, tok_s)

    best_b = max(results, key=lambda b: results[b][1])
    print(json.dumps({
        "metric": f"serving_{mode}{'_kv8' if kv_int8 else ''}_decode_tokens_per_s",
        "value": round(results[best_b][1], 1), "unit": "tokens/s",
        "batch": best_b,
        "prefill_tokens_per_s": round(results[best_b][0], 1),
        "vs_baseline": None}))


if __name__ == "__main__":
    main()
