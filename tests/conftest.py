"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so mesh/pjit/shard_map code
paths (the rebuild's replacement for the reference's
``device_map="auto"``, SURVEY §4) are exercised without TPU hardware.
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize force-registers the TPU plugin and overrides
# jax_platforms at interpreter start; undo that for the test session.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"

REFERENCE_DIR = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_dir() -> pathlib.Path:
    if not REFERENCE_DIR.exists():
        pytest.skip("reference checkout not available")
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def golden_tda_dir(reference_dir: pathlib.Path) -> pathlib.Path:
    d = reference_dir / "tda-output"
    if not d.exists():
        pytest.skip("committed golden tda-output not available")
    return d
