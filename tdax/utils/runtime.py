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
import time


def setup_runtime(cache_dir: str | None = None, force_cpu: bool = False,
                  want_device: bool = False, retries: int = 8,
                  wait_s: float = 45.0) -> None:
    """Process-level runtime knobs.

    want_device=True (the benches) additionally verifies that JAX did not
    silently fall back to XLA:CPU: the TPU here is leased through a relay,
    and a not-yet-released lease from a previous process makes plugin init
    fail with only a warning — after which every "TPU" benchmark number is
    actually a CPU number.  On fallback, retry init every ``wait_s`` (the
    lease clears in minutes); after ``retries`` attempts, raise unless
    TDAX_ALLOW_CPU=1.
    """
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

    if (want_device and not force_cpu
            and os.environ.get("TDAX_FORCE_CPU") != "1"
            and os.environ.get("JAX_PLATFORMS", "") != "cpu"):
        for attempt in range(retries):
            if jax.devices()[0].platform != "cpu":
                return
            print(f"[tdax] device init fell back to XLA:CPU "
                  f"(attempt {attempt + 1}/{retries}); retrying in "
                  f"{wait_s:.0f}s — is a previous TPU process still "
                  f"holding the lease?", flush=True)
            time.sleep(wait_s)
            try:
                jax.clear_caches()
                jax.extend.backend.clear_backends()
            except Exception:
                pass
        if jax.devices()[0].platform == "cpu" \
                and os.environ.get("TDAX_ALLOW_CPU") != "1":
            raise RuntimeError(
                "tdax: device requested but only XLA:CPU is available "
                "(set TDAX_ALLOW_CPU=1 to benchmark on CPU anyway)")


def profile_trace(out_dir: str = "/tmp/tdax_trace"):
    """Context manager: jax.profiler trace around a region (SURVEY §5)."""
    import jax

    return jax.profiler.trace(out_dir)
