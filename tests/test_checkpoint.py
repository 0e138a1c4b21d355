"""Weight-checkpoint roundtrip (orbax or npz fallback)."""

import numpy as np
import jax

from tdax.models.qwen_vl import QwenVLConfig, init_params
from tdax.utils.checkpoint import load_params, save_params


def test_params_roundtrip(tmp_path):
    cfg = QwenVLConfig.tiny(dtype="float32")
    params = init_params(jax.random.PRNGKey(0), cfg, with_visual=False)
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    restored = load_params(path, like=params)

    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
