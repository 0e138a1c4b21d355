"""Pipeline parallelism for the decoder over a ``pp`` mesh axis.

The reference's only multi-device mechanism is HF Accelerate's
``device_map="auto"`` (extract_activations.py:26) — naive layer-wise
placement where exactly ONE device works at a time while activations
hop GPUs.  tdax's tensor-parallel rules (tdax.parallel.mesh) replace it
for the capture path; this module adds the other classic axis: the
stacked [L, ...] layer weights are sharded over ``pp`` (each device
holds L/pp contiguous blocks) and microbatches stream through the
stages with ``jax.lax.ppermute`` — point-to-point ICI traffic of one
[mb, T, H] activation per step instead of tp's per-matmul all-reduces,
the right trade when ICI bandwidth (not HBM) binds or when heads/ffn
don't divide the chip count.

Two schedules:

* **1F1B** (default training schedule, ``make_train_step_pp``): the
  non-interleaved one-forward-one-backward schedule (PipeDream-Flush).
  Each stage warms up with min(S-1-s, M) forwards then alternates
  forward/backward, so at most ``min(S - s, M)`` microbatch activations
  are in flight per stage — activation memory scales with the stage
  count S, not the microbatch count M — and idle slots run NO stage
  compute (the fwd/bwd bodies live inside ``lax.cond`` on per-device
  schedule bits).  The backward is built manually per microbatch with
  ``jax.vjp`` (stage-input recompute), because JAX autodiff cannot
  interleave forward and backward across a scan.  The whole static
  schedule is precomputed by ``_schedule_1f1b`` with its invariants
  asserted at trace time.

* **GPipe** (``pipeline_forward`` and ``schedule="gpipe"``): with S
  stages and M microbatches, step s has stage k processing microbatch
  ``s - k`` (valid when ``0 <= s - k < M``) — M + S - 1 steps, bubble
  fraction (S-1)/(M+S-1), bubble-step compute clamped duplicate work
  whose results are never selected (zero gradient, but paid for).
  Autodiff builds its backward; kept for inference forwards (no
  backward to interleave) and as the training A/B reference.

Everything is expressed with ``jax.shard_map`` + collectives — no
hand-rolled send/recv runtime; XLA lowers ppermute to ICI
collective-permute, and the same program runs unchanged on the CPU
dryrun mesh.  Embedding (token + visual fusion) stays ordinary GSPMD
code outside the pipeline region; the final norm + LM head + loss run
inside the LAST stage on the 1F1B path (their per-microbatch gradient
must exist during the schedule) and outside on the GPipe path.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tdax.models.qwen_vl.config import QwenVLConfig
from tdax.models.qwen_vl.decoder import (AttnSpec, block, rms_norm,
                                         rotary_cos_sin)
from tdax.models.qwen_vl.model import embed_inputs
from tdax.models.qwen_vl.quantize import qdot
from tdax.parallel.train import masked_ce, masked_ce_parts


def make_pp_mesh(pp: int, dp: int | None = None,
                 devices: list | None = None) -> Mesh:
    """(dp, pp) mesh; pp innermost so stage hops ride neighbor ICI links."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // pp
    if dp * pp != n:
        raise ValueError(f"dp*pp = {dp}*{pp} != {n} devices")
    return Mesh(np.asarray(devices).reshape(dp, pp), ("dp", "pp"))


def shard_params_pp(params: dict, mesh: Mesh) -> dict:
    """device_put for the pipeline: every stacked [L, ...] layer leaf is
    split over pp on the layer axis; everything else is replicated."""
    def spec_for(path, _):
        return P("pp") if path and path[0].key == "layers" else P()

    specs = jax.tree_util.tree_map_with_path(spec_for, params)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs)


def pipeline_blocks(layers: dict, x: jnp.ndarray, cfg: QwenVLConfig,
                    attn_mask: jnp.ndarray, mesh: Mesh, n_micro: int,
                    remat: bool = False) -> jnp.ndarray:
    """Run the decoder blocks over the GPipe schedule.

    ``layers``: the stacked [L, ...] weight pytree, sharded P("pp") on
    the layer axis (shard_params_pp); ``x`` [B, T, H] embedded inputs,
    batch sharded over dp.  ``cfg.num_layers`` must divide by pp and
    the per-dp batch by ``n_micro``.  Returns the final hidden state
    [B, T, H], psum-broadcast over pp (replicated), so downstream
    ln_f / lm_head / loss run as ordinary GSPMD code.
    """
    pp = mesh.shape["pp"]
    dp = mesh.shape.get("dp", 1)
    b, t, hdim = x.shape
    if cfg.num_layers % pp:
        raise ValueError(f"num_layers={cfg.num_layers} not divisible by pp={pp}")
    b_loc = b // dp
    if b_loc % n_micro:
        raise ValueError(f"per-dp batch {b_loc} not divisible by n_micro={n_micro}")
    mb = b_loc // n_micro
    n_steps = n_micro + pp - 1

    def stage_scan(layers_local, h, kv_valid, cos, sin):
        mask = AttnSpec(kv_valid=kv_valid, causal=True)

        def step(carry, layer):
            return block(carry, layer, cfg, cos, sin, mask), None

        if remat:
            from tdax.models.qwen_vl.decoder import remat_policy
            step = jax.checkpoint(step, policy=remat_policy())
        out, _ = jax.lax.scan(step, h, layers_local)
        return out

    def fn(layers_local, x_loc, mask_loc):
        stage = jax.lax.axis_index("pp")
        xm = x_loc.reshape(n_micro, mb, t, hdim)
        maskm = mask_loc.reshape(n_micro, mb, t)
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (mb, t))
        cos, sin = rotary_cos_sin(positions, cfg.head_dim, cfg.rope_base)

        def sched_step(state, s):
            # stage k at step s processes microbatch s - k (clamped:
            # out-of-range steps are bubble work, never selected below)
            my_mb = jnp.clip(s - stage, 0, n_micro - 1)
            inp = jnp.where(
                stage == 0,
                jax.lax.dynamic_index_in_dim(xm, jnp.clip(s, 0, n_micro - 1),
                                             0, keepdims=False),
                state)
            kv_valid = jax.lax.dynamic_index_in_dim(maskm, my_mb, 0,
                                                    keepdims=False)
            h = stage_scan(layers_local, inp, kv_valid, cos, sin)
            nxt = jax.lax.ppermute(
                h, "pp", [(i, i + 1) for i in range(pp - 1)])
            return nxt, h

        init = jnp.zeros((mb, t, hdim), x_loc.dtype)
        _, hs = jax.lax.scan(sched_step, init, jnp.arange(n_steps))
        # the last stage emitted microbatch s-(pp-1) at step s: rows
        # pp-1 .. pp-1+n_micro-1 are the real outputs there; mask the
        # other stages to zero and psum-broadcast the one real copy.
        valid = hs[pp - 1:pp - 1 + n_micro]        # [n_micro, mb, T, H]
        out = jnp.where(stage == pp - 1, valid, jnp.zeros_like(valid))
        out = jax.lax.psum(out, "pp")
        return out.reshape(b_loc, t, hdim)

    fn_sm = shard_map(
        fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("pp"), layers), P("dp"), P("dp")),
        out_specs=P("dp"),
        check_vma=False)
    return fn_sm(layers, x, attn_mask)


def pipeline_forward(params: dict, cfg: QwenVLConfig, input_ids: jnp.ndarray,
                     attn_mask: jnp.ndarray | None, mesh: Mesh,
                     n_micro: int,
                     images: jnp.ndarray | None = None,
                     image_positions: jnp.ndarray | None = None,
                     remat: bool = False) -> jnp.ndarray:
    """Logits [B, T, vocab] — pipeline-parallel equivalent of
    tdax.models.qwen_vl.forward (identical per-layer arithmetic; the
    layer stack lives pp-sharded instead of resident on every chip)."""
    if attn_mask is None:
        attn_mask = jnp.ones_like(input_ids)
    x = embed_inputs(params, cfg, input_ids, images, image_positions)
    x = pipeline_blocks(params["layers"], x, cfg, attn_mask, mesh, n_micro,
                        remat=remat)
    x = rms_norm(x, params["ln_f"], cfg.layer_norm_eps)
    return qdot(x, params["lm_head"]).astype(jnp.float32)


# --- 1F1B schedule -----------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _schedule_1f1b(S: int, M: int):
    """Static 1F1B schedule tables for S stages x M microbatches.

    Greedy simulation of the standard non-interleaved 1F1B policy: a
    stage runs a backward whenever one is ready and its in-flight count
    has reached its cap min(S - s, M), else a forward — which
    reproduces the classic warmup/steady/cooldown phases.  One op per
    stage per slot; total slots = 2(M + S - 1) when M >= S.

    Returns a dict of numpy tables indexed [slot, stage]:
      fw_do/fw_mb   — run a forward of microbatch fw_mb this slot
      bw_do/bw_mb   — run a backward of microbatch bw_mb this slot
      sh_do/sh_mb   — ppermute h_out of fw-microbatch sh_mb to stage+1
                      at the END of this slot (consumed next slot)
      sg_do/sg_mb   — ppermute g_out of bw-microbatch sg_mb to stage-1
    plus static buffer sizes:
      n_slots, b_in = min(S, M) saved-input ring slots (the "activations
      scale with S not M" guarantee), oh/og = peak unsent h_out / g_out
      occupancy (verified against the simulated live intervals).
    """
    f = [[None] * M for _ in range(S)]
    b = [[None] * M for _ in range(S)]
    fwd_done, bwd_done = [0] * S, [0] * S
    t = 0
    while any(d < M for d in bwd_done):
        assert t < 4 * (M + S), "1F1B simulation failed to converge"
        for s in range(S):
            mf, mb_ = fwd_done[s], bwd_done[s]
            can_f = mf < M and (s == 0 or (f[s - 1][mf] is not None
                                           and f[s - 1][mf] < t))
            if s == S - 1:
                can_b = mb_ < M and f[s][mb_] is not None and f[s][mb_] < t
            else:
                can_b = (mb_ < M and b[s + 1][mb_] is not None
                         and b[s + 1][mb_] < t)
            limit = min(S - s, M)
            inflight = mf - mb_
            if can_b and (inflight >= limit or mf == M):
                b[s][mb_] = t
                bwd_done[s] += 1
            elif can_f and inflight < limit:
                f[s][mf] = t
                fwd_done[s] += 1
            elif can_b:
                b[s][mb_] = t
                bwd_done[s] += 1
        t += 1
    n_slots = t

    # schedule invariants: the in-flight cap IS the memory claim
    for s in range(S):
        live = 0
        events = ([(f[s][m], 1) for m in range(M)]
                  + [(b[s][m], -1) for m in range(M)])
        peak = 0
        for _, d in sorted(events):
            live += d
            peak = max(peak, live)
        assert peak <= min(S - s, M), (s, peak)

    def occupancy(intervals):
        peak = 0
        for u in range(n_slots):
            peak = max(peak, sum(1 for lo, hi in intervals if lo <= u <= hi))
        return peak

    oh = max((occupancy([(f[s][m], f[s + 1][m] - 1) for m in range(M)])
              for s in range(S - 1)), default=1)
    og = max((occupancy([(b[s][m], b[s - 1][m] - 1) for m in range(M)])
              for s in range(1, S)), default=1)

    def tables(times, send_to):
        do = np.zeros((n_slots, S), dtype=bool)
        mb = np.zeros((n_slots, S), dtype=np.int32)
        for s in range(S):
            for m in range(M):
                do[times[s][m], s] = True
                mb[times[s][m], s] = m
        if send_to is None:
            return do, mb
        sdo = np.zeros((n_slots, S), dtype=bool)
        smb = np.zeros((n_slots, S), dtype=np.int32)
        for s in range(S):
            dst = s + send_to
            if not (0 <= dst < S):
                continue
            for m in range(M):
                slot = times[dst][m] - 1
                assert slot >= times[s][m], "payload sent before computed"
                assert not sdo[slot, s], "two sends in one slot"
                sdo[slot, s] = True
                smb[slot, s] = m
        return do, mb, sdo, smb

    fw_do, fw_mb, sh_do, sh_mb = tables(f, +1)
    bw_do, bw_mb, sg_do, sg_mb = tables(b, -1)
    return dict(n_slots=n_slots, b_in=min(S, M), oh=oh, og=og,
                fw_do=fw_do, fw_mb=fw_mb, bw_do=bw_do, bw_mb=bw_mb,
                sh_do=sh_do, sh_mb=sh_mb, sg_do=sg_do, sg_mb=sg_mb)


def _stage_apply(layers_local, h, kv_valid, cos, sin, cfg: QwenVLConfig,
                 remat: bool):
    """One pipeline stage's decoder blocks (the per-device layer shard)."""
    mask = AttnSpec(kv_valid=kv_valid, causal=True)

    def step(carry, layer):
        return block(carry, layer, cfg, cos, sin, mask), None

    if remat:
        from tdax.models.qwen_vl.decoder import remat_policy
        step = jax.checkpoint(step, policy=remat_policy())
    out, _ = lax.scan(step, h, layers_local)
    return out


def pipeline_1f1b_grads(layers: dict, head: dict, x: jnp.ndarray,
                        input_ids: jnp.ndarray, attn_mask: jnp.ndarray,
                        cfg: QwenVLConfig, mesh: Mesh, n_micro: int,
                        remat: bool = False):
    """Loss numerator and gradients through the 1F1B pipeline schedule.

    The autodiff-through-GPipe path (``pipeline_blocks``) lets JAX build
    the backward, which (a) leaves the full M-microbatch activation
    stack live between the forward and backward phases and (b) executes
    clamped duplicate compute in every bubble slot.  1F1B interleaves
    each stage's forwards and backwards instead, so at most
    ``min(S - stage, M)`` microbatch inputs are ever saved per stage,
    and idle slots run NO stage compute (the fwd/bwd bodies sit inside
    ``lax.cond`` on per-device schedule bits — a real runtime branch,
    not a masked compute).  The backward of each microbatch recomputes
    its stage forward from the saved stage INPUT (activation recompute,
    the standard pipeline memory trade; ``remat`` additionally applies
    the flash-residual checkpoint policy inside that recompute).

    ``layers``: pp-sharded stacked [L, ...] pytree (shard_params_pp);
    ``head``: {"ln_f", "lm_head"} (replicated — only the last stage
    touches it); ``x`` [B, T, H] embedded inputs, batch over dp.
    Returns (ce_sum, dlayers, dhead, dx): the SUM of masked token CE
    over the whole batch and gradients of that sum — the caller divides
    by the global token count (computed from the mask outside) and
    chains dx through ``jax.vjp`` of the embedding.

    Cites: schedule per Narayanan et al.'s non-interleaved 1F1B
    (PipeDream-Flush), replacing pipeline.py's earlier GPipe loop; the
    reference has no pipeline (SURVEY §2.3 — device_map="auto" only).
    """
    pp = mesh.shape["pp"]
    dp = mesh.shape.get("dp", 1)
    b, t, hdim = x.shape
    if cfg.num_layers % pp:
        raise ValueError(f"num_layers={cfg.num_layers} not divisible by pp={pp}")
    b_loc = b // dp
    if b_loc % n_micro:
        raise ValueError(f"per-dp batch {b_loc} not divisible by n_micro={n_micro}")
    mb = b_loc // n_micro
    sched = _schedule_1f1b(pp, n_micro)
    n_slots, b_in = sched["n_slots"], sched["b_in"]
    oh, og = sched["oh"], sched["og"]

    def fn(layers_local, head_r, x_loc, ids_loc, mask_loc):
        stage = lax.axis_index("pp")
        is_last = stage == pp - 1
        xm = x_loc.reshape(n_micro, mb, t, hdim)
        idsm = ids_loc.reshape(n_micro, mb, t)
        maskm = mask_loc.reshape(n_micro, mb, t)
        positions = jnp.broadcast_to(jnp.arange(t)[None, :], (mb, t))
        cos, sin = rotary_cos_sin(positions, cfg.head_dim, cfg.rope_base)

        # schedule tables as on-device constants, gathered per (slot, stage)
        tabs = {k: jnp.asarray(v) for k, v in sched.items()
                if isinstance(v, np.ndarray)}

        def tail_ce(ly, hd, h, ids_m, kv_m):
            h = _stage_apply(ly, h, kv_m, cos, sin, cfg, remat)
            hn = rms_norm(h, hd["ln_f"], cfg.layer_norm_eps)
            logits = qdot(hn, hd["lm_head"]).astype(jnp.float32)
            ce_sum, _ = masked_ce_parts(logits, ids_m, kv_m)
            return ce_sum

        zero_head = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                                 head_r)
        zero_layers = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                                   layers_local)

        def slot(carry, ts):
            (in_buf, outh, outg, f_recv, g_recv,
             d_layers, d_head, dx_buf, ce) = carry
            fw_do = tabs["fw_do"][ts, stage]
            fw_m = tabs["fw_mb"][ts, stage]
            bw_do = tabs["bw_do"][ts, stage]
            bw_m = tabs["bw_mb"][ts, stage]

            # ---- forward (skipped at runtime on idle slots) ----
            h_in = jnp.where(stage == 0, xm[fw_m], f_recv)
            kv_f = maskm[fw_m]
            h_out = lax.cond(
                fw_do,
                lambda _: _stage_apply(layers_local, h_in, kv_f, cos, sin,
                                       cfg, remat),
                lambda _: jnp.zeros_like(h_in), None)
            # ring writes route to a scratch slot (index = size) when idle
            in_buf = lax.dynamic_update_index_in_dim(
                in_buf, h_in, jnp.where(fw_do, fw_m % b_in, b_in), 0)
            outh = lax.dynamic_update_index_in_dim(
                outh, h_out, jnp.where(fw_do, fw_m % oh, oh), 0)

            # ---- backward ----
            h_saved = in_buf[bw_m % b_in]
            ids_b = idsm[bw_m]
            kv_b = maskm[bw_m]

            def do_b(_):
                f32 = functools.partial(jax.tree.map,
                                        lambda g: g.astype(jnp.float32))

                def last(_):
                    ce_m, vjp = jax.vjp(
                        lambda ly, hd, h: tail_ce(ly, hd, h, ids_b, kv_b),
                        layers_local, head_r, h_saved)
                    dl, dh, g_out = vjp(jnp.float32(1.0))
                    return f32(dl), f32(dh), g_out, ce_m

                def mid(_):
                    _, vjp = jax.vjp(
                        lambda ly, h: _stage_apply(ly, h, kv_b, cos, sin,
                                                   cfg, remat),
                        layers_local, h_saved)
                    dl, g_out = vjp(g_recv)
                    return f32(dl), zero_head, g_out, jnp.float32(0.0)

                return lax.cond(is_last, last, mid, None)

            def no_b(_):
                return (zero_layers, zero_head,
                        jnp.zeros((mb, t, hdim), x_loc.dtype),
                        jnp.float32(0.0))

            dl, dh, g_out, ce_m = lax.cond(bw_do, do_b, no_b, None)
            d_layers = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32), d_layers, dl)
            d_head = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32), d_head, dh)
            ce = ce + ce_m
            outg = lax.dynamic_update_index_in_dim(
                outg, g_out,
                jnp.where(bw_do & (stage > 0), bw_m % og, og), 0)
            dx_buf = lax.dynamic_update_index_in_dim(
                dx_buf, g_out.astype(jnp.float32),
                jnp.where(bw_do & (stage == 0), bw_m, n_micro), 0)

            # ---- scheduled sends (collectives OUTSIDE the conds) ----
            f_recv = lax.ppermute(
                outh[tabs["sh_mb"][ts, stage] % oh], "pp",
                [(i, i + 1) for i in range(pp - 1)])
            g_recv = lax.ppermute(
                outg[tabs["sg_mb"][ts, stage] % og], "pp",
                [(i, i - 1) for i in range(1, pp)])
            return (in_buf, outh, outg, f_recv, g_recv,
                    d_layers, d_head, dx_buf, ce), None

        act = functools.partial(jnp.zeros, dtype=x_loc.dtype)
        init = (act((b_in + 1, mb, t, hdim)),       # saved stage inputs
                act((oh + 1, mb, t, hdim)),         # unsent h_out ring
                act((og + 1, mb, t, hdim)),         # unsent g_out ring
                act((mb, t, hdim)),                 # fwd recv register
                act((mb, t, hdim)),                 # bwd recv register
                zero_layers, zero_head,
                jnp.zeros((n_micro + 1, mb, t, hdim), jnp.float32),
                jnp.float32(0.0))
        (_, _, _, _, _, d_layers, d_head, dx_buf, ce), _ = lax.scan(
            slot, init, jnp.arange(n_slots))

        ce = lax.psum(jnp.where(is_last, ce, 0.0), "pp")
        d_head = lax.psum(jax.tree.map(
            lambda g: jnp.where(is_last, g, jnp.zeros_like(g)), d_head), "pp")
        dx = lax.psum(
            jnp.where(stage == 0, dx_buf[:n_micro],
                      jnp.zeros_like(dx_buf[:n_micro])), "pp")
        if dp > 1:
            ce = lax.psum(ce, "dp")
            d_layers = lax.psum(d_layers, "dp")
            d_head = lax.psum(d_head, "dp")
        return ce, d_layers, d_head, dx.reshape(b_loc, t, hdim)

    layer_specs = jax.tree.map(lambda _: P("pp"), layers)
    fn_sm = shard_map(
        fn, mesh=mesh,
        in_specs=(layer_specs, jax.tree.map(lambda _: P(), head),
                  P("dp"), P("dp"), P("dp")),
        out_specs=(P(), layer_specs, jax.tree.map(lambda _: P(), head),
                   P("dp")),
        check_vma=False)
    return fn_sm(layers, head, x, input_ids, attn_mask)


def make_train_step_pp(cfg: QwenVLConfig,
                       optimizer: optax.GradientTransformation,
                       mesh: Mesh, n_micro: int, remat: bool = False,
                       schedule: str = "1f1b"):
    """Pipeline-parallel train step: same contract as
    tdax.parallel.train.make_train_step, with the decoder layers sharded
    over pp (shard_params_pp) and microbatches streamed through the
    pipeline.

    ``schedule="1f1b"`` (default): the manual-vjp 1F1B schedule
    (pipeline_1f1b_grads) — per-stage saved activations capped at
    min(S - stage, M) microbatch inputs and NO compute in bubble slots.
    ``schedule="gpipe"``: the earlier autodiff-through-GPipe loop (all M
    microbatch outputs live between phases; bubble slots execute
    clamped duplicate compute) — kept as the A/B reference.
    Gradients flow back through the ppermute chain (reverse
    collective-permute); dp gradient reduction is explicit psum on the
    1f1b path and GSPMD-inserted on the gpipe path; the adamw update
    stays local to each stage's layer shard either way."""
    if schedule not in ("1f1b", "gpipe"):
        raise ValueError(f"unknown pipeline schedule {schedule!r}")

    if schedule == "1f1b":
        def step(params, opt_state, batch):
            ids, mask = batch["input_ids"], batch["attn_mask"]
            n = jnp.maximum(
                jnp.sum((mask[:, 1:] > 0).astype(jnp.float32)), 1.0)
            embed_part = {"wte": params["wte"]}
            x, embed_vjp = jax.vjp(
                lambda ep: embed_inputs({**params, **ep}, cfg, ids,
                                        None, None),
                embed_part)
            head = {"ln_f": params["ln_f"], "lm_head": params["lm_head"]}
            ce, d_layers, d_head, dx = pipeline_1f1b_grads(
                params["layers"], head, x, ids, mask, cfg, mesh, n_micro,
                remat=remat)
            d_embed, = embed_vjp((dx / n).astype(x.dtype))
            grads = {
                "wte": d_embed["wte"],
                "layers": jax.tree.map(
                    lambda g, p: (g / n).astype(p.dtype),
                    d_layers, params["layers"]),
                "ln_f": (d_head["ln_f"] / n).astype(params["ln_f"].dtype),
                "lm_head": (d_head["lm_head"] / n).astype(
                    params["lm_head"].dtype),
            }
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, ce / n

        return jax.jit(step, donate_argnums=(0, 1))

    def loss_fn(p, batch):
        logits = pipeline_forward(p, cfg, batch["input_ids"],
                                  batch["attn_mask"], mesh, n_micro,
                                  remat=remat)
        return masked_ce(logits, batch["input_ids"], batch["attn_mask"])

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))
