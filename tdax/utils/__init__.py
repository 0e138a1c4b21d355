"""Runtime utilities: platform setup, profiling, logging."""

from tdax.utils.runtime import setup_runtime

__all__ = ["setup_runtime"]
