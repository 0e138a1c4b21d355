"""UMAP estimator: sklearn-style fit/transform plus a batched TPU path.

The reference uses two modes (SURVEY §2.2):
  * fresh ``fit_transform`` per layer cloud (debug_tda_pipeline.py:96-104);
  * ``fit`` on the last layer then ``transform`` of every layer — the
    shared-reducer "same camera" mode (analyze_tda_over_layers.py:65-72).

Both are provided, plus ``fit_transform_batched``: a single jitted
vmap over a leading clouds axis that embeds all 32 layers in one XLA
program — the TPU-native replacement for 32 serial Numba fits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tdax.config import UMAPConfig
from tdax.ops.umap.fuzzy import (fuzzy_simplicial_set, knn, membership_strengths,
                                 pairwise, smooth_knn_dist)
from tdax.ops.umap.layout import optimize_layout
from tdax.ops.umap.spectral import spectral_init


@functools.lru_cache(maxsize=64)
def find_ab_params(spread: float, min_dist: float) -> tuple[float, float]:
    """Fit the (a, b) curve params: 1/(1 + a x^(2b)) approximating the
    fuzzy membership target (umap-learn's find_ab_params, via scipy)."""
    from scipy.optimize import curve_fit

    def curve(x, a, b):
        return 1.0 / (1.0 + a * x ** (2 * b))

    xv = np.linspace(0, spread * 3, 300)
    yv = np.zeros_like(xv)
    yv[xv < min_dist] = 1.0
    yv[xv >= min_dist] = np.exp(-(xv[xv >= min_dist] - min_dist) / spread)
    params, _ = curve_fit(curve, xv, yv)
    return float(params[0]), float(params[1])


def _default_epochs(n: int, n_epochs: int | None) -> int:
    if n_epochs is not None:
        return int(n_epochs)
    return 500 if n <= 10000 else 200


def _embed(x: jnp.ndarray, n_neighbors: int, n_components: int, metric: str,
           n_epochs: int, key: jax.Array, a: float, b: float,
           learning_rate: float, negative_sample_rate: int,
           repulsion_strength: float, local_connectivity: float,
           set_op_mix_ratio: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One cloud -> (embedding [n, n_components], fuzzy graph [n, n])."""
    w, _, _ = fuzzy_simplicial_set(x, n_neighbors, metric,
                                   local_connectivity=local_connectivity,
                                   set_op_mix_ratio=set_op_mix_ratio)
    k_init, k_layout = jax.random.split(key)
    init = spectral_init(w, n_components, k_init)
    emb = optimize_layout(init, init, w, n_epochs, k_layout, a, b,
                          gamma=repulsion_strength,
                          initial_alpha=learning_rate,
                          negative_sample_rate=negative_sample_rate,
                          move_other=True)
    return emb, w


def _transform_core(x: jnp.ndarray, train_x: jnp.ndarray,
                    train_emb: jnp.ndarray, k: int, metric: str,
                    n_epochs: int, key: jax.Array, a: float, b: float,
                    learning_rate: float, negative_sample_rate: int,
                    repulsion_strength: float,
                    local_connectivity: float) -> jnp.ndarray:
    """Embed new points [m, D] against a fitted reducer (train points
    fixed) — the jit/vmap-able core of ``UMAP.transform`` (the
    shared-camera mode, analyze_tda_over_layers.py:65-72).  The batched
    shared-reducer sweep vmaps this over the layer axis so all 32
    transforms run as ONE compiled program."""
    n_new = x.shape[0]
    n_train = train_x.shape[0]

    # kNN of new points against training data
    if metric == "cosine":
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30)
        tn = train_x / jnp.maximum(
            jnp.linalg.norm(train_x, axis=-1, keepdims=True), 1e-30)
        dist = jnp.clip(1.0 - xn @ tn.T, 0.0, 2.0)
    else:
        d2 = (jnp.sum(x * x, -1)[:, None] + jnp.sum(train_x ** 2, -1)[None, :]
              - 2.0 * x @ train_x.T)
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    if n_new == n_train:
        # transforming the fit cloud against itself (the shared-camera
        # sweep's fit layer) must see EXACT zero self-distances: rho's
        # "smallest NONZERO distance" rule (smooth_knn_dist) is
        # discontinuous at 0, and different compilations round the
        # x @ train.T diagonal differently (0.0 serially, ~1 ulp under
        # vmap), flipping rho from the true nearest neighbor to the
        # rounding residue.  Pin the diagonal to 0 when x IS train_x —
        # the value exact arithmetic (and umap-learn's exact kNN of the
        # raw data) produces.
        same = jnp.all(x == train_x)
        dist = jnp.where(same & jnp.eye(n_new, dtype=bool), 0.0, dist)
    neg, idx = jax.lax.top_k(-dist, k)
    dists = -neg

    # no self column in cross-kNN: prepend a zero column so the
    # calibration's skip-self convention stays consistent
    sigma, rho = smooth_knn_dist(
        jnp.concatenate([jnp.zeros((n_new, 1), dists.dtype), dists], axis=1),
        float(k), local_connectivity=local_connectivity)

    d_adj = dists - rho[:, None]
    w = jnp.where(d_adj <= 0.0, 1.0, jnp.exp(-d_adj / sigma[:, None]))
    rows = jnp.broadcast_to(jnp.arange(n_new)[:, None], (n_new, k))
    graph = jnp.zeros((n_new, n_train), dtype=w.dtype)
    graph = graph.at[rows.reshape(-1), idx.reshape(-1)].add(w.reshape(-1))

    # init: weighted mean of neighbor embeddings
    train_emb = train_emb.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(graph, axis=1, keepdims=True), 1e-12)
    init = (graph @ train_emb) / wsum

    return optimize_layout(init, train_emb, graph, n_epochs, key, a, b,
                           gamma=repulsion_strength,
                           # umap-learn's transform damps the step size
                           initial_alpha=learning_rate / 4.0,
                           negative_sample_rate=negative_sample_rate,
                           move_other=False)


def _transform_epochs(n_epochs_cfg: int | None, n_new: int) -> int:
    """umap-learn's transform epoch rule (n_epochs // 3, else 100/30)."""
    return (int(n_epochs_cfg // 3) if n_epochs_cfg
            else (100 if n_new <= 10000 else 30))


@functools.lru_cache(maxsize=64)
def _transform_core_jitted(k: int, metric: str, n_epochs: int, a: float,
                           b: float, learning_rate: float,
                           negative_sample_rate: int,
                           repulsion_strength: float,
                           local_connectivity: float):
    """jit of _transform_core with the hyperparameters closed over
    (cached per tuple): repeat transforms reuse one compiled program,
    and — load-bearing for value parity — the serial UMAP.transform
    and the vmapped shared-reducer sweep both go through XLA-compiled
    code, so their epoch arithmetic rounds identically (eager-vs-jit
    fusion differences amplify over the layout's chaotic epochs)."""
    def f(x, train_x, train_emb, key):
        return _transform_core(x, train_x, train_emb, k, metric, n_epochs,
                               key, a, b, learning_rate,
                               negative_sample_rate, repulsion_strength,
                               local_connectivity)
    return jax.jit(f)


class UMAP:
    """Drop-in for the reference's as-used umap.UMAP surface."""

    def __init__(self, n_neighbors: int = 15, n_components: int = 2,
                 min_dist: float = 0.1, spread: float = 1.0,
                 metric: str = "euclidean", random_state: int | None = None,
                 n_epochs: int | None = None, learning_rate: float = 1.0,
                 negative_sample_rate: int = 5, repulsion_strength: float = 1.0,
                 local_connectivity: float = 1.0, set_op_mix_ratio: float = 1.0,
                 init: str = "spectral"):
        self.n_neighbors = n_neighbors
        self.n_components = n_components
        self.min_dist = min_dist
        self.spread = spread
        self.metric = metric
        self.random_state = 42 if random_state is None else int(random_state)
        self.n_epochs = n_epochs
        self.learning_rate = learning_rate
        self.negative_sample_rate = negative_sample_rate
        self.repulsion_strength = repulsion_strength
        self.local_connectivity = local_connectivity
        self.set_op_mix_ratio = set_op_mix_ratio
        if init != "spectral":
            raise NotImplementedError("only spectral init is supported")
        self._a, self._b = find_ab_params(spread, min_dist)
        self.embedding_ = None
        self._train_x = None

    @classmethod
    def from_config(cls, cfg: UMAPConfig) -> "UMAP":
        return cls(n_neighbors=cfg.n_neighbors, n_components=cfg.n_components,
                   min_dist=cfg.min_dist, spread=cfg.spread, metric=cfg.metric,
                   random_state=cfg.random_state, n_epochs=cfg.n_epochs,
                   learning_rate=cfg.learning_rate,
                   negative_sample_rate=cfg.negative_sample_rate,
                   repulsion_strength=cfg.repulsion_strength,
                   local_connectivity=cfg.local_connectivity,
                   set_op_mix_ratio=cfg.set_op_mix_ratio)

    def _key(self) -> jax.Array:
        return jax.random.PRNGKey(self.random_state)

    # above this point count, the dense [n, n] fuzzy graph and the
    # [n, n, neg, d] repulsion tensor stop fitting; the edge-list path
    # (sparse_path.py) takes over.  The dense path below the threshold
    # is untouched (bit-identical results to previous releases).
    sparse_threshold: int = 2048

    def fit(self, x: np.ndarray) -> "UMAP":
        # a jax.Array input passes through without a host round-trip
        # (the product path: activation clouds are born in HBM)
        if isinstance(x, jax.Array):
            x = x if x.dtype == jnp.float32 else x.astype(jnp.float32)
        else:
            x = jnp.asarray(np.asarray(x), dtype=jnp.float32)
        n = x.shape[0]
        if n < 2:
            raise ValueError(f"UMAP requires at least 2 samples, got {n}")
        k = min(self.n_neighbors, n - 1) if n > 1 else 1
        if n > self.sparse_threshold:
            from tdax.ops.umap.sparse_path import embed_sparse
            self.embedding_ = embed_sparse(
                x, k, self.n_components, self.metric,
                _default_epochs(n, self.n_epochs), self._key(),
                self._a, self._b, self.learning_rate,
                self.negative_sample_rate, self.repulsion_strength,
                self.local_connectivity, self.set_op_mix_ratio)
            self._train_x = x
            return self
        emb, _ = _embed(x, k, self.n_components, self.metric,
                        _default_epochs(n, self.n_epochs), self._key(),
                        self._a, self._b, self.learning_rate,
                        self.negative_sample_rate, self.repulsion_strength,
                        self.local_connectivity, self.set_op_mix_ratio)
        self.embedding_ = np.asarray(emb)
        self._train_x = x
        return self

    def fit_transform(self, x: np.ndarray) -> np.ndarray:
        self.fit(x)
        return self.embedding_

    def transform(self, x: np.ndarray) -> np.ndarray:
        """Embed new points against the fitted reducer (train points fixed) —
        the shared-camera mode of analyze_tda_over_layers.py:65-72."""
        if self.embedding_ is None:
            raise RuntimeError("transform called before fit")
        if isinstance(x, jax.Array):
            x = x if x.dtype == jnp.float32 else x.astype(jnp.float32)
        else:
            x = jnp.asarray(np.asarray(x), dtype=jnp.float32)
        n_new = x.shape[0]
        n_train = self._train_x.shape[0]
        k = min(self.n_neighbors, n_train)

        # the dense path materializes an [n_new, n_train] graph and an
        # [n_new, n_train, neg, d] epoch tensor; past the dense fit
        # ceiling's product the edge-list transform takes over (always
        # the case when fit itself went sparse)
        n_epochs = _transform_epochs(self.n_epochs, n_new)
        if n_new * n_train > self.sparse_threshold ** 2:
            from tdax.ops.umap.sparse_path import transform_sparse
            return transform_sparse(
                x, self._train_x, self.embedding_, k, self.metric,
                n_epochs, jax.random.fold_in(self._key(), 1),
                self._a, self._b, self.learning_rate,
                self.negative_sample_rate, self.repulsion_strength,
                self.local_connectivity)

        run = _transform_core_jitted(
            k, self.metric, n_epochs, self._a, self._b, self.learning_rate,
            self.negative_sample_rate, self.repulsion_strength,
            self.local_connectivity)
        emb = run(x, self._train_x, jnp.asarray(self.embedding_, jnp.float32),
                  jax.random.fold_in(self._key(), 1))
        return np.asarray(emb)


def batched_embed_fn(cfg: UMAPConfig, k: int, n_epochs: int,
                     a: float, b: float):
    """The jit-able batched-embed core ``(clouds [L, n, D], key) ->
    [L, n, n_components]`` shared by fit_transform_batched and fused
    pipelines (tda_sweep composes it with the silhouettes in ONE
    program).  key is an argument, not a closure capture: captured
    device arrays become lowering-time constants that cost a
    device->host fetch each."""
    def run(cs, key):
        def one(c):
            emb, _ = _embed(c, k, cfg.n_components, cfg.metric, n_epochs, key,
                            a, b, cfg.learning_rate, cfg.negative_sample_rate,
                            cfg.repulsion_strength, cfg.local_connectivity,
                            cfg.set_op_mix_ratio)
            return emb
        return jax.vmap(one)(cs)
    return run


def batched_shared_embed_fn(cfg: UMAPConfig, k: int, n_fit_epochs: int,
                            n_t_epochs: int, a: float, b: float):
    """The jit-able SHARED-REDUCER batched core ``(clouds [L, n, D],
    key) -> [L, n, n_components]``: fit on the LAST layer, then
    transform every layer against it — the legacy "same camera" mode
    (analyze_tda_over_layers.py:65-72) — as ONE program (vmapped
    ``_transform_core``) instead of 32 serial ``reducer.transform``
    dispatches.  Matches the serial ``UMAP.fit`` + per-layer
    ``transform`` loop exactly: same fit key, same per-call
    ``fold_in(key, 1)`` transform key (the layout is deterministic
    mean-field, so the key only seeds spectral init)."""
    def run(cs, key):
        emb_train, _ = _embed(cs[-1], k, cfg.n_components, cfg.metric,
                              n_fit_epochs, key, a, b, cfg.learning_rate,
                              cfg.negative_sample_rate,
                              cfg.repulsion_strength,
                              cfg.local_connectivity, cfg.set_op_mix_ratio)
        key_t = jax.random.fold_in(key, 1)

        def one(c):
            return _transform_core(
                c, cs[-1], emb_train, k, cfg.metric, n_t_epochs, key_t,
                a, b, cfg.learning_rate, cfg.negative_sample_rate,
                cfg.repulsion_strength, cfg.local_connectivity)

        return jax.vmap(one)(cs)
    return run


@functools.lru_cache(maxsize=32)
def batched_shared_embed_jitted(cfg: UMAPConfig, k: int, n_fit_epochs: int,
                                n_t_epochs: int, a: float, b: float):
    return jax.jit(batched_shared_embed_fn(cfg, k, n_fit_epochs,
                                           n_t_epochs, a, b))


def shared_transform_batched(clouds, cfg: UMAPConfig | None = None,
                             n_neighbors: int | None = None) -> np.ndarray:
    """Shared-reducer embed of a stack [L, n, D] -> [L, n, c] in ONE
    jitted program (fit on clouds[-1] + vmapped transform of all
    layers).  Dense path only (n <= the sparse threshold) — the legacy
    mode's workloads are the 36-point headline clouds."""
    cfg = cfg or UMAPConfig()
    clouds = clouds_to_device_f32(clouds)
    n = clouds.shape[1]
    if n < 2:
        raise ValueError(f"UMAP requires at least 2 samples per cloud, got {n}")
    if n > UMAP.sparse_threshold:
        raise ValueError(
            f"shared_transform_batched is dense-path only (n <= "
            f"{UMAP.sparse_threshold}, got {n}); use UMAP.fit + transform")
    k = n_neighbors if n_neighbors is not None else min(cfg.n_neighbors, n - 1)
    a, b = find_ab_params(cfg.spread, cfg.min_dist)
    run = batched_shared_embed_jitted(
        cfg, k, _default_epochs(n, cfg.n_epochs),
        _transform_epochs(cfg.n_epochs, n), a, b)
    clouds = shard_layer_axis(clouds)
    return np.asarray(run(clouds, jax.random.PRNGKey(cfg.random_state)))


@functools.lru_cache(maxsize=32)
def batched_embed_jitted(cfg: UMAPConfig, k: int, n_epochs: int,
                         a: float, b: float):
    """jit of batched_embed_fn, cached per hyperparameter tuple so
    repeat sweeps hit the jit cache instead of re-tracing the
    n_epochs-step vmapped program on every call."""
    return jax.jit(batched_embed_fn(cfg, k, n_epochs, a, b))


def clouds_to_device_f32(clouds) -> jnp.ndarray:
    """Single policy for cloud-stack ingestion, shared by
    fit_transform_batched and the fused pipeline program
    (tda_sweep.embed_and_silhouettes): device-resident ``jax.Array``
    input passes through without a host round-trip (the product path —
    activation clouds are born in HBM; np.asarray would download and
    re-upload them), anything else is uploaded once as f32."""
    if isinstance(clouds, jax.Array):
        return clouds.astype(jnp.float32)
    return jnp.asarray(np.asarray(clouds), dtype=jnp.float32)


def shard_layer_axis(cj: jnp.ndarray) -> jnp.ndarray:
    """Shard the leading (layer) axis across the visible devices when it
    divides evenly: on a v5e-8 each device embeds n_layers/8 clouds of
    the vmapped program in parallel (the 32-layer sweep's scale-out
    axis, SURVEY §3.3).  Shared by fit_transform_batched and the fused
    pipeline program."""
    devices = jax.devices()
    if len(devices) > 1 and cj.shape[0] % len(devices) == 0:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(np.array(devices), ("layers",))
        cj = jax.device_put(cj, NamedSharding(mesh, P("layers")))
    return cj


def fit_transform_batched(clouds: np.ndarray, cfg: UMAPConfig | None = None,
                          n_neighbors: int | None = None) -> np.ndarray:
    """Embed a stack of clouds [L, n, D] -> [L, n, n_components] in ONE
    jitted program (vmap over the layer axis).

    Each layer gets the same seed — faithful to the reference, which
    constructs a fresh ``umap.UMAP(random_state=42)`` per layer
    (debug_tda_pipeline.py:96-102).
    """
    cfg = cfg or UMAPConfig()
    clouds = clouds_to_device_f32(clouds)
    n = clouds.shape[1]
    if n < 2:
        raise ValueError(f"UMAP requires at least 2 samples per cloud, got {n}")
    k = n_neighbors if n_neighbors is not None else min(cfg.n_neighbors, n - 1)
    a, b = find_ab_params(cfg.spread, cfg.min_dist)
    n_epochs = _default_epochs(n, cfg.n_epochs)

    run = batched_embed_jitted(cfg, k, n_epochs, a, b)
    clouds = shard_layer_axis(clouds)
    return np.asarray(run(clouds, jax.random.PRNGKey(cfg.random_state)))
