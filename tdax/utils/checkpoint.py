"""Model-weight checkpointing.

The reference's weight 'checkpoint' is the raw HF snapshot dir
(download_model.py:5-13, SURVEY §5); tdax additionally persists the
converted JAX pytree so conversion is paid once: orbax for sharded
trees when available, flat .npz otherwise.
"""

from __future__ import annotations

import json
import os

import numpy as np

# np.savez round-trips ml_dtypes leaves (bfloat16, float8_*) as raw
# void arrays ('|V2'), silently corrupting them.  Such leaves are
# stored as flat byte views with their dtype name AND original shape
# recorded under this reserved manifest key and restored on load (the
# shape matters: a 0-d leaf's uint8 view is (itemsize,), which a
# shape-less view() would round-trip as (1,)).  Legacy manifests store
# only the dtype name; those entries predate 0-d support.
_DTYPE_MANIFEST_KEY = "__tdax_dtypes__"


def _pack_leaf(arr: np.ndarray) -> tuple[np.ndarray, list | None]:
    if arr.dtype.kind in "biufc":
        return arr, None
    packed = np.ascontiguousarray(arr).reshape(-1).view(np.uint8)
    return packed, [str(arr.dtype), list(arr.shape)]


def _unpack_leaf(arr: np.ndarray, entry) -> np.ndarray:
    if entry is None:
        return arr
    import ml_dtypes  # noqa: F401  (registers bfloat16/float8 with numpy)

    if isinstance(entry, str):  # legacy manifest: dtype name only
        return arr.view(np.dtype(entry))
    dtype_name, shape = entry
    return arr.view(np.dtype(dtype_name)).reshape(shape)


def _savez_packed(tmp_or_path: str, flat: dict) -> None:
    packed, dtypes = {}, {}
    for key, arr in flat.items():
        packed[key], name = _pack_leaf(np.asarray(arr))
        if name is not None:
            dtypes[key] = name
    packed[_DTYPE_MANIFEST_KEY] = np.frombuffer(
        json.dumps(dtypes).encode(), dtype=np.uint8)
    np.savez(tmp_or_path, **packed)


def _load_manifest(z) -> dict:
    if _DTYPE_MANIFEST_KEY not in z.files:
        return {}
    return json.loads(bytes(z[_DTYPE_MANIFEST_KEY]).decode())


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
    _savez_packed(path + ".npz", flat)


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
    _savez_packed(tmp, flat)
    os.replace(tmp, path + ".npz")


def load_train_state(path: str, like_opt_state) -> tuple[dict, object, int]:
    """Inverse of save_train_state.  ``like_opt_state`` supplies the
    optax pytree structure (e.g. ``optimizer.init(params)``); returns
    (params, opt_state, step)."""
    import jax

    with np.load(path + ".npz") as z:
        dtypes = _load_manifest(z)
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
                node[parts[-1]] = _unpack_leaf(z[key], dtypes.get(key))
            elif key.startswith("o/"):
                opt_leaves[int(key[2:])] = _unpack_leaf(z[key], dtypes.get(key))
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
        dtypes = _load_manifest(z)
        tree: dict = {}
        for key in z.files:
            if key == _DTYPE_MANIFEST_KEY:
                continue
            parts = key.split("/")
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = _unpack_leaf(z[key], dtypes.get(key))
        return tree
