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
