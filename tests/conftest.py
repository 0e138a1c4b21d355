"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so mesh/pjit/shard_map code
paths (the rebuild's replacement for the reference's
``device_map="auto"``, SURVEY §4) are exercised without TPU hardware.
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

TPU_MODE = os.environ.get("TDAX_TEST_TPU") == "1"

if not TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize force-registers the TPU plugin and overrides
# jax_platforms at interpreter start; undo that for the test session.
import jax

if not TPU_MODE:
    jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

if not TPU_MODE:
    assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
else:
    # TPU matmuls default to bf16 passes; the numerics tests target math
    # correctness, so pin the test session to true f32 (production code
    # chooses its own precision per call site).
    jax.config.update("jax_default_matmul_precision", "highest")


def pytest_collection_modifyitems(config, items):
    """On real hardware (TDAX_TEST_TPU=1, usually one chip) skip the
    tests that need the 8-device virtual mesh."""
    if len(jax.devices()) >= 8:
        return
    needs_mesh = ("sharded", "mesh", "train_step", "multichip", "pipeline",
                  "fsdp", "ring_")
    skip = pytest.mark.skip(reason="needs >= 8 devices (virtual CPU mesh)")
    for item in items:
        if any(k in item.name for k in needs_mesh):
            item.add_marker(skip)

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
