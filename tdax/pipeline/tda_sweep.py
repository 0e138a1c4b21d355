"""Per-layer UMAP + persistence sweep.

The TPU-native successor of the reference's main analysis loop
(debug_tda_pipeline.py:92-150): where the reference runs 32 serial
Numba UMAP fits + 32 serial ripser calls, tdax

  1. embeds ALL layers in one jitted vmapped program
     (tdax.ops.umap.fit_transform_batched) — the whole sweep is a
     single XLA compilation on the device mesh;
  2. scores ALL layer x label silhouettes in one vmapped program;
  3. runs Vietoris-Rips persistence per layer through the native C++
     engine in a thread pool (ctypes releases the GIL).

Artifacts and JSON schemas are byte-compatible with the reference
(SURVEY §5 "observability"): point_clouds_3d/layer_i_cloud.npy,
diagrams/layer_i_diagram.png, summary_stats.json,
summary_evolution_plot.png, and both peak-selection rules
(shape-silhouette argmax debug_tda_pipeline.py:195; max-H1 argmax
analyze_tda_over_layers.py:126).
"""

from __future__ import annotations

import concurrent.futures as cf
import functools
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from tdax.config import SweepConfig
from tdax.data.io import activations_to_layer_clouds, dump_json, ensure_dir, load_metadata
from tdax.metrics.persistence import diagram_stats
from tdax.metrics.silhouette import silhouette_jax
from tdax.ops.rips import rips
from tdax.ops.umap import UMAP, fit_transform_batched
from tdax.utils.log import log_event
from tdax.viz.diagrams import save_diagram_png
from tdax.viz.evolution import plot_evolution_2x2


def _encode_labels(labels: list[str]) -> tuple[np.ndarray, int]:
    _, enc = np.unique(np.asarray(labels), return_inverse=True)
    return enc.astype(np.int32), int(enc.max()) + 1


@functools.lru_cache(maxsize=16)
def _silhouette_vmapped_jitted(n_classes: int):
    """Per-layer silhouette program, cached per class count (the label
    encoding is a dynamic argument, so repeat calls — any label set of
    the same cardinality — reuse one compiled program)."""
    return jax.jit(jax.vmap(lambda c, e: silhouette_jax(c, e, n_classes),
                            in_axes=(0, None)))


def batched_silhouettes(clouds: np.ndarray, label_sets: dict[str, list[str]]) -> dict[str, np.ndarray]:
    """Silhouette of every layer cloud against every label set — one
    vmapped program per label-set cardinality."""
    cj = jnp.asarray(clouds, dtype=jnp.float32)
    out: dict[str, np.ndarray] = {}
    for name, labels in label_sets.items():
        enc, n_classes = _encode_labels(labels)
        fn = _silhouette_vmapped_jitted(n_classes)
        out[name] = np.asarray(fn(cj, jnp.asarray(enc)))
    return out


@functools.lru_cache(maxsize=16)
def _fused_embed_silhouettes_jitted(ucfg, k: int, n: int,
                                    label_structure: tuple,
                                    reducer_mode: str = "per_layer"):
    """One jitted (embed + all silhouettes) program per (hyperparams,
    cloud size, label-set structure, reducer mode), cached so repeat
    sweeps — e.g. bench medians and the product loop — skip the
    n_epochs-step retrace.  ``label_structure`` is a sorted
    (name, n_classes) tuple; the label encodings themselves are dynamic
    arguments.  reducer_mode="shared" embeds via the batched
    fit-on-last + vmapped-transform program (the legacy same-camera
    mode) instead of the per-layer vmapped fit."""
    from tdax.ops.umap.umap import (_default_epochs, _transform_epochs,
                                    batched_embed_fn,
                                    batched_shared_embed_fn, find_ab_params)
    a, b = find_ab_params(ucfg.spread, ucfg.min_dist)
    n_epochs = _default_epochs(n, ucfg.n_epochs)
    if reducer_mode == "shared":
        embed = batched_shared_embed_fn(ucfg, k, n_epochs,
                                        _transform_epochs(ucfg.n_epochs, n),
                                        a, b)
    else:
        embed = batched_embed_fn(ucfg, k, n_epochs, a, b)
    n_classes = dict(label_structure)

    @jax.jit
    def run(cs, key, enc_arrays):
        embs = embed(cs, key)
        sils = {}
        for name, enc in enc_arrays.items():
            nc = n_classes[name]
            sils[name] = jax.vmap(lambda e, _enc=enc: silhouette_jax(
                e, _enc, nc))(embs)
        return embs, sils

    return run


def embed_and_silhouettes(clouds, cfg: SweepConfig,
                          label_sets: dict[str, list[str]]
                          ) -> tuple[np.ndarray, dict[str, np.ndarray]]:
    """Fused stage 1+2: the batched UMAP embed of all layers (per-layer
    vmapped fit, or the shared fit-on-last + vmapped-transform legacy
    mode) AND every layer x label-set silhouette in ONE jitted program
    — one dispatch round-trip instead of three (values identical to
    embed_layers + batched_silhouettes; asserted in test_pipeline).
    Accepts a device-resident ``jax.Array`` cloud stack (the product
    path)."""
    from tdax.ops.umap.umap import UMAP, clouds_to_device_f32, shard_layer_axis
    ucfg = cfg.umap
    cj = clouds_to_device_f32(clouds)
    n = cj.shape[1]
    if cfg.reducer_mode != "per_layer" and (
            cfg.reducer_mode != "shared" or n > UMAP.sparse_threshold):
        # huge shared-mode clouds take the sparse fit/transform path
        c3 = embed_layers(clouds, cfg).astype(np.float32)
        return c3, batched_silhouettes(c3, label_sets)

    if n < 2:
        raise ValueError(f"UMAP requires at least 2 samples per cloud, got {n}")
    k = min(ucfg.n_neighbors, n - 1)
    encs = {name: _encode_labels(labels) for name, labels in label_sets.items()}
    run = _fused_embed_silhouettes_jitted(
        ucfg, k, n, tuple(sorted((name, nc) for name, (_, nc) in encs.items())),
        reducer_mode=cfg.reducer_mode)
    cj = shard_layer_axis(cj)
    embs, sils = run(cj, jax.random.PRNGKey(ucfg.random_state),
                     {name: jnp.asarray(enc) for name, (enc, _) in encs.items()})
    return (np.asarray(embs).astype(np.float32),
            {name: np.asarray(v) for name, v in sils.items()})


def persistence_per_layer(clouds_3d: np.ndarray, maxdim: int = 1,
                          backend: str = "auto",
                          max_workers: int | None = None) -> list[list[np.ndarray]]:
    """VR diagrams for each layer cloud.

    Backend order for tiny-cloud batches (the headline 32 x 36-pt
    sweep): the native C++ engine when built (~0.6 ms/cloud at n=36 —
    the apparent/emergent shortcuts make these trivial, measured faster
    than any batched device program), else the batched on-device
    reduction (ops.rips.tiny_device — one compiled program for the
    whole batch; the TPU-native path for compiler-free environments),
    else the python oracle.  backend="device" forces the batched device
    path; TDAX_NO_DEVICE_PH=1 forbids it."""
    n_layers, n = clouds_3d.shape[0], clouds_3d.shape[1]
    from tdax.ops.rips.native import available as _native_available
    device_ok = (maxdim <= 2 and n_layers >= 2 and 3 <= n <= 48
                 and os.environ.get("TDAX_NO_DEVICE_PH") != "1")
    if backend == "device" or (backend == "auto" and device_ok
                               and not _native_available()):
        try:
            from tdax.ops.rips.tiny_device import rips_tiny_batched
            return rips_tiny_batched(clouds_3d, maxdim=maxdim)
        except RuntimeError:
            if backend == "device":
                raise  # explicit request: surface non-convergence
            pass  # auto: fall through to the host engine

    max_workers = max_workers or min(n_layers, os.cpu_count() or 8)

    def one(i: int):
        return rips(np.asarray(clouds_3d[i], dtype=np.float64),
                    maxdim=maxdim, backend=backend if backend != "device"
                    else "auto")["dgms"]

    with cf.ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(one, range(n_layers)))


def embed_layers(clouds: np.ndarray, cfg: SweepConfig) -> np.ndarray:
    """[L, n, D] -> [L, n, 3] in the configured reducer mode."""
    n = clouds.shape[1]
    k = min(cfg.umap.n_neighbors, n - 1)
    if cfg.reducer_mode == "per_layer":
        return fit_transform_batched(clouds, cfg.umap, n_neighbors=k)
    if cfg.reducer_mode == "shared":
        # fit on the LAST layer, transform every layer (same "camera") —
        # analyze_tda_over_layers.py:65-72 — as ONE vmapped program for
        # dense-path sizes; the serial fit/transform loop only for
        # clouds past the dense ceiling (sparse edge-list path)
        from tdax.ops.umap.umap import shared_transform_batched
        if n <= UMAP.sparse_threshold:
            return shared_transform_batched(clouds, cfg.umap, n_neighbors=k)
        reducer = UMAP.from_config(cfg.umap)
        reducer.n_neighbors = k
        reducer.fit(clouds[-1])
        return np.stack([reducer.transform(clouds[i]) for i in range(clouds.shape[0])])
    raise ValueError(f"unknown reducer_mode {cfg.reducer_mode!r}")


def run_tda_sweep(all_data: dict[str, dict], metadata_path: str,
                  cfg: SweepConfig | None = None,
                  verbose: bool = True) -> dict:
    """Full sweep; returns {"stats": [...], "peak_layer": int,
    "clouds_3d": [L,n,3], "diagrams": [...]} and writes the artifact tree."""
    cfg = cfg or SweepConfig()

    if os.path.exists(cfg.output_dir):
        shutil.rmtree(cfg.output_dir)  # reference wipes per run (:29-32)
    diagram_dir = ensure_dir(os.path.join(cfg.output_dir, "diagrams"))
    cloud_dir = ensure_dir(os.path.join(cfg.output_dir, "point_clouds_3d"))

    metadata = load_metadata(metadata_path)
    metadata_map = {m["id"]: m for m in metadata}

    # autodetect layer count when the data has fewer than configured
    # (e.g. the toy model) — the reference hardcodes 32 (:22)
    first = next(iter(all_data.values()))
    n_avail = len(first["activations"])
    if n_avail < cfg.n_layers:
        if verbose:
            print(f"[tdax] data has {n_avail} layers (config: {cfg.n_layers}); "
                  f"using {n_avail}")
        cfg = __import__("dataclasses").replace(cfg, n_layers=n_avail)

    clouds, sample_ids = activations_to_layer_clouds(
        all_data, cfg.n_layers, point_cloud_type=cfg.point_cloud_type)
    color_labels = [metadata_map[i]["color"] for i in sample_ids]
    shape_labels = [metadata_map[i]["shape"] for i in sample_ids]
    if verbose:
        print(f"Found {len(sample_ids)} samples for type '{cfg.point_cloud_type}'")

    import contextlib
    import time as _time
    _t = _time.time()

    # jax.profiler trace around the device stages (SURVEY §5) when asked
    profile_ctx = contextlib.nullcontext()
    if os.environ.get("TDAX_PROFILE"):
        profile_ctx = jax.profiler.trace(os.environ.get(
            "TDAX_PROFILE_DIR", "/tmp/tdax_trace"))

    with profile_ctx:
        # 1+2) all layers embedded AND all silhouettes scored in one
        # compiled program (per_layer mode; shared mode runs them
        # separately inside the helper)
        clouds_3d, sil = embed_and_silhouettes(
            clouds, cfg, {"shape": shape_labels, "color": color_labels})
    if verbose:
        print(f"[tdax] embed+silhouettes ({cfg.reducer_mode}): "
              f"{_time.time() - _t:.1f}s", flush=True)
    log_event("embed", mode=cfg.reducer_mode, n_layers=cfg.n_layers,
              seconds=round(_time.time() - _t, 2))
    _t = _time.time()

    # 3) persistence per layer (threaded native engine)
    dgms_per_layer = persistence_per_layer(clouds_3d, maxdim=cfg.rips.maxdim,
                                           backend=cfg.rips.backend)
    if verbose:
        print(f"[tdax] persistence: {_time.time() - _t:.1f}s", flush=True)
    log_event("persistence", n_layers=cfg.n_layers,
              seconds=round(_time.time() - _t, 2))

    all_stats = []
    for i in range(cfg.n_layers):
        if cfg.save_clouds:
            np.save(os.path.join(cloud_dir, f"layer_{i}_cloud.npy"), clouds_3d[i])
        stats = diagram_stats(dgms_per_layer[i], layer=i)
        stats["silhouette_shape"] = float(sil["shape"][i])
        stats["silhouette_color"] = float(sil["color"][i])
        all_stats.append(stats)
        if verbose:
            print(f"\n--- Layer {i} Stats ---")
            print(f"  Max H1 Pers: {stats['max_h1_persistence']:.4f} "
                  f"(n={stats['n_h1_features']})")
            print(f"  Max H0 Pers: {stats['max_h0_persistence']:.4f}")
            print(f"  SILHOUETTE (Shape): {stats['silhouette_shape']:.4f}")
            print(f"  SILHOUETTE (Color): {stats['silhouette_color']:.4f}")

    if cfg.save_diagrams:
        def render(i: int) -> None:
            s = all_stats[i]
            save_diagram_png(
                dgms_per_layer[i],
                os.path.join(diagram_dir, f"layer_{i}_diagram.png"),
                title=f"Layer {i} Diagram | "
                      f"Shape Score: {s['silhouette_shape']:.2f} | "
                      f"Color Score: {s['silhouette_color']:.2f}")
        with cf.ThreadPoolExecutor(max_workers=4) as pool:
            list(pool.map(render, range(cfg.n_layers)))

    dump_json(all_stats, os.path.join(cfg.output_dir, "summary_stats.json"))
    plot_evolution_2x2(all_stats, os.path.join(cfg.output_dir, "summary_evolution_plot.png"))

    if cfg.peak_rule == "shape_silhouette":
        peak_layer = int(np.argmax([s["silhouette_shape"] for s in all_stats]))
    elif cfg.peak_rule == "max_h1":
        peak_layer = int(np.argmax([s["max_h1_persistence"] for s in all_stats]))
    else:
        raise ValueError(f"unknown peak_rule {cfg.peak_rule!r}")

    if verbose:
        import json as _json
        print("\n--- Overall Result ---")
        print(f"Peak layer ({cfg.peak_rule}): {peak_layer}")
        print(_json.dumps(all_stats[peak_layer], indent=2))

    return {"stats": all_stats, "peak_layer": peak_layer,
            "clouds_3d": clouds_3d, "diagrams": dgms_per_layer,
            "sample_ids": sample_ids}
