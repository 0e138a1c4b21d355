"""Model-weight checkpointing.

The reference's weight 'checkpoint' is the raw HF snapshot dir
(download_model.py:5-13, SURVEY §5); tdax additionally persists the
converted JAX pytree so conversion is paid once: orbax for sharded
trees when available, flat .npz otherwise.
"""

from __future__ import annotations

import os

import numpy as np


def save_params(path: str, params: dict) -> None:
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), params, force=True)
        ckptr.wait_until_finished()
        return
    except Exception:
        pass
    flat = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                walk(v, key + "/")
            else:
                flat[key] = np.asarray(v)

    walk(params)
    np.savez(path + ".npz", **flat)


def save_train_state(path: str, params: dict, opt_state, step: int) -> None:
    """Crash-resumable TRAINING checkpoint: params + optimizer state +
    step count in one flat .npz, written atomically (tmp + os.replace,
    the same torn-write discipline as the extraction checkpoints).
    optax states are arbitrary pytrees (NamedTuple chains), so their
    leaves are stored by traversal index and restored against the
    caller's like-structure treedef."""
    import jax

    flat = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                walk(v, key + "/")
            else:
                flat[key] = np.asarray(v)

    walk(params, "p/")
    for i, leaf in enumerate(jax.tree_util.tree_leaves(opt_state)):
        flat[f"o/{i}"] = np.asarray(leaf)
    flat["step"] = np.asarray(step, dtype=np.int64)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path + ".npz")


def load_train_state(path: str, like_opt_state) -> tuple[dict, object, int]:
    """Inverse of save_train_state.  ``like_opt_state`` supplies the
    optax pytree structure (e.g. ``optimizer.init(params)``); returns
    (params, opt_state, step)."""
    import jax

    with np.load(path + ".npz") as z:
        params: dict = {}
        opt_leaves: dict[int, np.ndarray] = {}
        step = 0
        for key in z.files:
            if key == "step":
                step = int(z[key])
            elif key.startswith("p/"):
                parts = key[2:].split("/")
                node = params
                for p in parts[:-1]:
                    node = node.setdefault(p, {})
                node[parts[-1]] = z[key]
            elif key.startswith("o/"):
                opt_leaves[int(key[2:])] = z[key]
        treedef = jax.tree_util.tree_structure(like_opt_state)
        leaves = [opt_leaves[i] for i in range(len(opt_leaves))]
        opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
        return params, opt_state, step


def load_params(path: str, like: dict | None = None) -> dict:
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), like)
    with np.load(path + ".npz") as z:
        tree: dict = {}
        for key in z.files:
            parts = key.split("/")
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
        return tree
