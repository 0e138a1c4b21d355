"""Process-level JAX runtime setup for tdax entry points.

Centralizes the knobs every CLI script and the bench need:
  * a persistent XLA compilation cache (first compile of the 32-layer
    batched UMAP program costs ~40s; subsequent processes reuse it);
  * optional CPU forcing for tests/debug (the TPU plugin's
    sitecustomize overrides JAX_PLATFORMS, so the config API is the
    only reliable switch).
"""

from __future__ import annotations

import os


def setup_runtime(cache_dir: str | None = None, force_cpu: bool = False) -> None:
    import jax

    if force_cpu or os.environ.get("TDAX_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    cache_dir = cache_dir or os.environ.get(
        "TDAX_COMPILE_CACHE", os.path.expanduser("~/.cache/tdax_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization, never a hard dependency


def profile_trace(out_dir: str = "/tmp/tdax_trace"):
    """Context manager: jax.profiler trace around a region (SURVEY §5)."""
    import jax

    return jax.profiler.trace(out_dir)
