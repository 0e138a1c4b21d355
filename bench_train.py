#!/usr/bin/env python
"""Training-step benchmark: tokens/s and MFU for the net-new fine-tuning
path (tdax/parallel/train.py — the reference is inference-only).

Measures one donated jitted train_step (masked next-token CE + adamw)
at steady state: step time, tokens/s, and MFU against the v5e bf16
peak.  MFU uses the standard 6*N*D model-FLOPs convention (forward +
2x backward; rematerialization recompute is NOT credited — it is
overhead the number must absorb, reported separately).

Configs:
  toy   tiny random model (always runs; CI-sized sanity numbers)
  1b    ~0.94B-param decoder (hidden 2048 x 16 layers, vocab 32k) in
        bf16 with per-block rematerialization — the largest round-
        number config whose params + adam moments + logits fit one
        v5e chip for TRAINING (the 9.66B full config needs the tp
        sharding in tdax.parallel and >= 8 chips; that path is
        compile-validated by __graft_entry__.dryrun_multichip).

Usage: python bench_train.py [toy|1b] [batch_size] [seq_len]
Prints one JSON line per stage plus a summary line.
"""

import json
import sys
import time

import numpy as np

from bench_model import (V5E_BF16_PEAK, V5E_LEGACY_PEAK, count_params,
                         decoder_flops_per_token)

HBM_BYTES = 15.5e9  # usable single-chip v5e HBM (16 GB nominal)


def train_cfg_1b():
    from tdax.models.qwen_vl import QwenVLConfig
    return QwenVLConfig(vocab_size=32768, hidden_size=2048, num_layers=16,
                        num_heads=16, intermediate_size=11008,
                        seq_length=2048, dtype="bfloat16")


def main() -> None:
    from tdax.utils import setup_runtime
    setup_runtime(want_device=True)
    import jax
    import jax.numpy as jnp
    from tdax.models.qwen_vl import QwenVLConfig, init_params
    from tdax.parallel.train import default_optimizer, make_train_step

    mode = sys.argv[1] if len(sys.argv) > 1 else "toy"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else (16 if mode == "toy" else 8)
    t = int(sys.argv[3]) if len(sys.argv) > 3 else (128 if mode == "toy" else 1024)

    np.asarray(jax.jit(lambda x: x + 1)(jnp.ones(4)))  # open the device session

    if mode == "toy":
        cfg = QwenVLConfig.tiny(dtype="float32")
        remat = False
    elif mode == "1b":
        cfg = train_cfg_1b()
        remat = True
    else:
        raise SystemExit(f"unknown mode {mode}")

    t0 = time.time()
    params = init_params(jax.random.PRNGKey(0), cfg, with_visual=False)
    params = jax.device_put(params)
    jax.block_until_ready(params)
    n_params = count_params(params)
    bytes_per_param = np.dtype(cfg.dtype).itemsize
    # params + adamw mu/nu (optax follows param dtype) + transient grads
    # + the f32 logits/log-softmax pair, the big activation survivors
    est = n_params * bytes_per_param * 4 + 2 * b * t * cfg.vocab_size * 4
    print(json.dumps({"stage": "init_params", "mode": mode,
                      "n_params": n_params,
                      "est_hbm_gb": round(est / 1e9, 2),
                      "value": round(time.time() - t0, 2), "unit": "s"}))
    if est > HBM_BYTES and jax.devices()[0].platform == "tpu":
        print(json.dumps({"stage": "skip", "reason":
                          f"estimated {est/1e9:.1f} GB exceeds one chip"}))
        return

    opt = default_optimizer(1e-4)
    opt_state = jax.device_put(opt.init(params))
    step = make_train_step(cfg, opt, remat=remat)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, t)).astype(np.int32))
    batch = {"input_ids": ids, "attn_mask": jnp.ones((b, t), jnp.int32)}

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, batch)
    jax.block_until_ready(loss)
    print(json.dumps({"stage": "compile_plus_first_step",
                      "value": round(time.time() - t0, 2), "unit": "s",
                      "loss": round(float(loss), 4)}))

    if "--decomp" in sys.argv:
        # A/B decomposition of the step: forward-only loss, loss+grad
        # (no optimizer), full step — locates which phase eats the MFU
        # (the round-4 analysis that found the backward gap).
        from tdax.parallel.train import lm_loss

        loss_fn = jax.jit(lambda p, b_: lm_loss(
            p, cfg, b_["input_ids"], b_["attn_mask"], remat=remat))

        def _grad_probe(p, b_):
            loss, g = jax.value_and_grad(
                lambda pp: lm_loss(pp, cfg, b_["input_ids"], b_["attn_mask"],
                                   remat=remat))(p)
            # reduce grads to one scalar INSIDE the jit: the full grads
            # pytree frees on exit, so the probe never holds two copies
            # (params + opt state + 2x grads OOMs one chip at 1b)
            import optax as _optax
            return loss, _optax.global_norm(g)

        grad_fn = jax.jit(_grad_probe)
        for name, fn in (("fwd_only", loss_fn), ("loss_and_grad", grad_fn)):
            out = fn(params, batch)
            jax.block_until_ready(out)
            ts = []
            for i_ in range(3):
                bb = {"input_ids": batch["input_ids"].at[0, 0].set(1 + i_),
                      "attn_mask": batch["attn_mask"]}
                del out
                t0 = time.time()
                out = fn(params, bb)
                jax.block_until_ready(out)
                ts.append(time.time() - t0)
            print(json.dumps({"stage": f"decomp_{name}",
                              "value": round(sorted(ts)[1], 4),
                              "all_s": [round(x, 4) for x in ts],
                              "unit": "s"}))

    n_iters = 5
    losses = []
    t0 = time.time()
    for _ in range(n_iters):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(loss)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / n_iters
    losses = [float(x) for x in losses]
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], "fixed-batch loss must decrease"

    tokens = b * t
    attn_fwd = cfg.num_layers * 4 * t * t * cfg.hidden_size * b
    fwd = tokens * (decoder_flops_per_token(cfg)
                    + 2 * cfg.hidden_size * cfg.vocab_size) + attn_fwd
    flops = 3 * fwd  # fwd + 2x bwd; remat recompute not credited
    on_tpu = jax.devices()[0].platform == "tpu"
    print(json.dumps({"stage": "steady_state_train_step", "batch": b,
                      "seq": t, "remat": remat,
                      "value": round(dt, 4), "unit": "s/iter",
                      "tokens_per_s": round(tokens / dt, 1),
                      "tflops": round(flops / dt / 1e12, 2),
                      "loss_first_last": [round(losses[0], 4),
                                          round(losses[-1], 4)],
                      "mfu_vs_v5e_bf16": (round(flops / dt / V5E_BF16_PEAK, 4)
                                          if on_tpu else None),
                      "mfu_vs_394_legacy": (round(flops / dt / V5E_LEGACY_PEAK, 4)
                                            if on_tpu else None)}))
    print(json.dumps({"metric": f"train_step_{mode}_b{b}_t{t}",
                      "value": round(tokens / dt, 1), "unit": "tokens/s",
                      "vs_baseline": None}))


if __name__ == "__main__":
    main()
