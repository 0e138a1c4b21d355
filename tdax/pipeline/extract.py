"""Batched activation extraction on TPU.

TPU-native successor of the reference's hook-based extractors
(extract_activations.py, extract_adversarial_activations.py): instead
of a serial batch-1 Python loop with 32 forward hooks copying full
hidden states to host per sample (SURVEY §3.2), tdax runs ONE jitted
batched forward per batch that returns [n_layers, batch, hidden]
last-token activations straight from HBM, data-parallel over the device
mesh.

Checkpoint/resume keeps the reference's crash-recovery contract
(extract_adversarial_activations.py:58-83,150-168): results accumulate
in a ``.tmp`` checkpoint every ``save_interval`` samples, a restart
skips already-done sample ids, and the temp file is removed after the
final save.  Checkpointing is at batch granularity (SURVEY §5).
"""

from __future__ import annotations

import functools
import os

import jax
import numpy as np

from tdax.config import ExtractConfig
from tdax.data.io import save_activations, save_activations_npz, load_activations_npz
from tdax.models.qwen_vl import QwenVLConfig, extract_layer_activations, init_params
from tdax.models.qwen_vl.preprocess import load_image_batch
from tdax.models.qwen_vl.tokenizer import batch_encode, get_tokenizer
from tdax.ops.flash_attention import flash_sharding


# number of XLA traces of the batched forward in the most recent
# extract_activations() call; tests assert it stays 1 for ragged datasets
LAST_TRACE_COUNT = 0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dp_sharding(n_batch: int):
    """(mesh, NamedSharding) over a 1-d data-parallel mesh when it
    divides the batch; None (single-device / replicated) otherwise."""
    devices = jax.devices()
    if len(devices) > 1 and n_batch % len(devices) == 0:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(np.array(devices), ("dp",))
        return mesh, NamedSharding(mesh, P("dp"))
    return None


def _has_checkpoint(model_dir: str | None) -> bool:
    return bool(model_dir) and os.path.isdir(model_dir) and any(
        f.endswith((".bin", ".safetensors")) for f in os.listdir(model_dir))


def load_or_init_params(model_dir: str | None, cfg: QwenVLConfig,
                        seed: int = 0) -> dict:
    """Converted checkpoint when available, random init otherwise."""
    if _has_checkpoint(model_dir):
        from tdax.models.qwen_vl.convert import load_qwen_checkpoint
        return load_qwen_checkpoint(model_dir, cfg)
    return init_params(jax.random.PRNGKey(seed), cfg)


def extract_activations(metadata: list[dict], output_path: str,
                        cfg: QwenVLConfig | None = None,
                        extract_cfg: ExtractConfig | None = None,
                        params: dict | None = None,
                        tokenizer=None,
                        verbose: bool = True) -> dict:
    """Run extraction over metadata samples; returns the nested-dict
    results and writes output_path (.pt and a sibling .npz)."""
    cfg = cfg or QwenVLConfig()
    extract_cfg = extract_cfg or ExtractConfig()
    tokenizer = tokenizer or get_tokenizer(extract_cfg.model_dir, cfg)
    if params is None:
        if extract_cfg.quantize_int8 and not _has_checkpoint(extract_cfg.model_dir):
            # random init straight into int8 on device: the full-config
            # bf16 tree would not fit one chip's HBM
            from tdax.models.qwen_vl.quantize import init_params_quantized
            params = init_params_quantized(jax.random.PRNGKey(0), cfg)
        else:
            params = load_or_init_params(extract_cfg.model_dir, cfg)
    if extract_cfg.quantize_int8:
        # no-op on already-quantized leaves
        from tdax.models.qwen_vl.quantize import quantize_params
        params = quantize_params(params)
    params = jax.device_put(params)

    # ".tmp.npz", not ".tmp": np.savez appends ".npz" to any other name,
    # which silently de-synced the written checkpoint from the path the
    # resume/cleanup logic checked (resume never fired, tmp never removed)
    tmp_path = output_path + ".tmp.npz"
    done_acts: np.ndarray | None = None
    done_ids: list[str] = []
    if os.path.exists(tmp_path):
        try:
            done_acts, done_ids, _ = load_activations_npz(tmp_path)
            # Guard against a stale checkpoint from a DIFFERENT run over
            # the same output dir (e.g. a .tmp.npz leaked by a pre-fix
            # crash): every checkpointed id must belong to the current
            # metadata, else resuming would splice foreign activations.
            current_ids = {m["id"] for m in metadata}
            stale = [i for i in done_ids if i not in current_ids]
            if stale:
                print(f"Warning: checkpoint {tmp_path} holds {len(stale)} "
                      f"sample ids not in the current metadata "
                      f"(e.g. {stale[0]!r}) — stale checkpoint from another "
                      f"run; starting fresh.")
                done_acts, done_ids = None, []
            else:
                # resume is a state-changing surprise after a crash the
                # user may not know about — always announce it
                print(f"Found existing checkpoint, resuming... "
                      f"({len(done_ids)} samples done)")
        except Exception as e:
            print(f"Warning: Could not load checkpoint: {e}. Starting fresh.")
            done_ids = []

    todo = [m for m in metadata if m["id"] not in set(done_ids)]
    bs = extract_cfg.batch_size

    # tokenize the whole dataset ONCE (slow tokenizers are host-bound);
    # batches below just slice rows.  One static sequence length for the
    # whole run -> single compile.
    encoded = batch_encode(tokenizer, metadata, cfg)
    max_len = _round_up(encoded["input_ids"].shape[1] + 1, 64)
    pad = max_len - encoded["input_ids"].shape[1]
    enc_ids = np.pad(encoded["input_ids"], ((0, 0), (0, pad)),
                     constant_values=tokenizer.pad_id)
    enc_mask = np.pad(encoded["attn_mask"], ((0, 0), (0, pad)))
    row_of = {m["id"]: j for j, m in enumerate(metadata)}

    trace_count = [0]

    @functools.partial(jax.jit, static_argnames=())
    def run(p, ids, mask, last_idx, images, img_pos):
        trace_count[0] += 1  # python body runs once per XLA trace
        return extract_layer_activations(p, cfg, ids, mask, last_idx,
                                         images, img_pos)

    dp_shard = _dp_sharding(bs)

    # The batch loop is a 3-stage software pipeline: while the device
    # runs batch i, a background thread decodes batch i+1's images (PIL
    # releases the GIL in its C decoders) and batch i-1's result is
    # drained to host.  jax dispatch is async, so run() returns
    # immediately and the only forced sync is the one-batch-late
    # np.asarray — host decode, device compute, and the relay download
    # all overlap instead of serializing.  At most two batch outputs
    # are in flight in HBM.
    from concurrent.futures import ThreadPoolExecutor

    def host_prep(chunk):
        # numpy/PIL only — device_put stays on the main thread
        rows = np.asarray([row_of[m["id"]] for m in chunk]
                          + [row_of[chunk[0]["id"]]] * (bs - len(chunk)))
        # (pad the ragged final chunk back up to batch_size by repeating
        # its first row: one static shape -> one XLA compile, dp sharding
        # kept for the tail; padded results are sliced off when drained)
        image_paths = [encoded["image_paths"][r] for r in rows]
        images = load_image_batch(image_paths, cfg.visual.image_size)
        return [enc_ids[rows], enc_mask[rows],
                encoded["last_token_idx"][rows],
                images.astype(np.float32), encoded["image_positions"][rows]]

    collected_ids = list(done_ids)
    collected: list[np.ndarray] = [] if done_acts is None else [done_acts]
    since_save = 0
    batches = [todo[s:s + bs] for s in range(0, len(todo), bs)]
    pending: tuple | None = None  # (device acts, chunk) not yet drained

    def drain(acts_dev, chunk):
        nonlocal since_save, collected
        acts = np.asarray(acts_dev, dtype=np.float32)[:, :len(chunk)]
        collected.append(acts)
        collected_ids.extend(m["id"] for m in chunk)
        since_save += len(chunk)
        if verbose:
            print(f"  extracted {len(collected_ids)}/{len(metadata)}", flush=True)
        if since_save >= extract_cfg.save_interval:
            all_acts = np.concatenate(collected, axis=1)
            save_activations_npz(tmp_path, all_acts, collected_ids, metadata)
            collected = [all_acts]
            since_save = 0
            if verbose:
                print(f"Checkpoint: Saving {len(collected_ids)} samples...")

    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(host_prep, batches[0]) if batches else None
        for i, chunk in enumerate(batches):
            args = fut.result()
            fut = (pool.submit(host_prep, batches[i + 1])
                   if i + 1 < len(batches) else None)
            if dp_shard is not None:
                mesh, sharding = dp_shard
                args = [jax.device_put(a, sharding) for a in args]
                # per-shard flash attention under the dp mesh: without
                # this context the batched forward's pallas_call is
                # opaque to the partitioner (mha falls back to einsum)
                with flash_sharding(mesh, batch_axis="dp"):
                    acts_dev = run(params, *args)
            else:
                acts_dev = run(params, *args)  # [L, bs, H], async
            if pending is not None:
                drain(*pending)
            pending = (acts_dev, chunk)
        if pending is not None:
            drain(*pending)

    global LAST_TRACE_COUNT
    LAST_TRACE_COUNT = trace_count[0]

    all_acts = np.concatenate(collected, axis=1) if collected else np.zeros(
        (cfg.num_layers, 0, cfg.hidden_size), np.float32)

    if len(collected_ids):
        save_activations(output_path, all_acts, collected_ids, metadata)
        save_activations_npz(output_path.rsplit(".", 1)[0] + ".npz",
                             all_acts, collected_ids, metadata)
        if os.path.exists(tmp_path):
            os.remove(tmp_path)
        if verbose:
            print(f"Extracted activations for {len(collected_ids)} samples. "
                  f"Saved to {output_path}")
    meta_by_id = {m["id"]: m for m in metadata}
    return {sid: {"metadata": meta_by_id[sid],
                  "activations": {f"layer_{i}": all_acts[i, j]
                                  for i in range(all_acts.shape[0])}}
            for j, sid in enumerate(collected_ids)}
