"""Weight-checkpoint roundtrip (orbax or npz fallback)."""

import numpy as np
import jax

from tdax.models.qwen_vl import QwenVLConfig, init_params
from tdax.utils.checkpoint import load_params, save_params


def test_train_state_roundtrip_bfloat16(tmp_path):
    """np.savez stores ml_dtypes bfloat16 as raw void ('|V2') arrays,
    which used to come back unusable; the packed manifest must restore
    the exact dtype and bits for the model's production dtype."""
    import jax.numpy as jnp
    import ml_dtypes

    from tdax.utils.checkpoint import load_train_state, save_train_state

    params = {
        "w": jnp.arange(6, dtype=jnp.bfloat16).reshape(2, 3) * 0.37,
        "inner": {"b": jnp.array([1.5, -2.25], dtype=jnp.bfloat16)},
    }
    opt_state = (
        {"mu": jnp.full((2, 3), 0.125, dtype=jnp.bfloat16)},
        np.arange(3, dtype=np.float32),
    )
    path = str(tmp_path / "train_ckpt")
    save_train_state(path, params, opt_state, step=7)
    shapes = jax.eval_shape(lambda t: t, opt_state)
    p2, o2, step = load_train_state(path, shapes)

    assert step == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        assert np.asarray(b).dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o2)):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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
