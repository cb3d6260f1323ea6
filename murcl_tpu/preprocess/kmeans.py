"""Device k-means for per-slide feature clustering.

Reference (``wsi_processing/features_clustering.py:10-25``): per slide,
sklearn ``KMeans(n_clusters=K, random_state=985)`` over ``img_features``,
writing an ``(N, 1)`` label npz and the inverted-index json. sklearn's
k-means++ stream is not bit-reproducible on accelerator (SURVEY §7 "hard
parts"); the contract requires the *format* and comparable cluster quality,
which Lloyd's with k-means++ init delivers. A ``backend='sklearn'`` escape
hatch keeps exact reference behavior on CPU.

TPU design: distances are one ``(N, D) @ (D, K)`` matmul per iteration
(MXU), iterations run under ``lax.while_loop`` with sklearn's relative
center-shift tolerance; k-means++ seeding is a ``lax.scan`` over K steps.
"""

from __future__ import annotations


from typing import Tuple

import numpy as np


def _kmeans_jax(x, k: int, seed: int, n_init: int, max_iter: int, tol: float):
    import jax
    import jax.numpy as jnp

    n, d = x.shape

    def plusplus_init(rng):
        """k-means++ seeding (D^2 sampling)."""
        rng, r0 = jax.random.split(rng)
        first = jax.random.randint(r0, (), 0, n)
        centers0 = jnp.zeros((k, d), x.dtype).at[0].set(x[first])
        d2_0 = jnp.sum((x - centers0[0]) ** 2, axis=1)

        def step(carry, i):
            centers, d2, rng = carry
            rng, r = jax.random.split(rng)
            probs = d2 / jnp.maximum(d2.sum(), 1e-12)
            idx = jax.random.categorical(r, jnp.log(jnp.maximum(probs, 1e-30)))
            c = x[idx]
            centers = centers.at[i].set(c)
            d2 = jnp.minimum(d2, jnp.sum((x - c) ** 2, axis=1))
            return (centers, d2, rng), None

        (centers, _, _), _ = jax.lax.scan(
            step, (centers0, d2_0, rng), jnp.arange(1, k)
        )
        return centers

    x_sq = jnp.sum(x * x, axis=1, keepdims=True)  # (N, 1)

    def assign(centers):
        c_sq = jnp.sum(centers * centers, axis=1)  # (K,)
        # |x - c|^2 = |x|^2 - 2 x.c + |c|^2 ; one big matmul on the MXU
        d2 = x_sq - 2.0 * (x @ centers.T) + c_sq[None, :]
        return jnp.argmin(d2, axis=1), jnp.min(d2, axis=1)

    def lloyd(centers):
        def cond(state):
            _, shift, it, _ = state
            return (it < max_iter) & (shift > tol)

        def body(state):
            centers, _, it, _ = state
            labels, mind2 = assign(centers)
            onehot = jax.nn.one_hot(labels, k, dtype=x.dtype)  # (N, K)
            counts = onehot.sum(axis=0)  # (K,)
            sums = onehot.T @ x  # (K, D)
            new_centers = jnp.where(
                counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
            )
            shift = jnp.sum((new_centers - centers) ** 2)
            return new_centers, shift, it + 1, jnp.sum(mind2)

        state = (centers, jnp.asarray(jnp.inf, x.dtype), jnp.asarray(0), jnp.asarray(0.0, x.dtype))
        centers, _, _, _ = jax.lax.while_loop(cond, body, state)
        labels, mind2 = assign(centers)
        return centers, labels, jnp.sum(mind2)

    @jax.jit
    def run(rng):
        def one(rng_i):
            centers = plusplus_init(rng_i)
            return lloyd(centers)

        rngs = jax.random.split(rng, n_init)
        centers, labels, inertia = jax.vmap(one)(rngs)
        best = jnp.argmin(inertia)
        return labels[best], centers[best], inertia[best]

    # sklearn tol semantics: tol * mean variance of features
    tol = tol * float(jnp.mean(jnp.var(x, axis=0)))
    return run(jax.random.PRNGKey(seed))


def kmeans(
    features: np.ndarray,
    num_clusters: int,
    seed: int = 985,
    n_init: int = 10,
    max_iter: int = 300,
    tol: float = 1e-4,
    backend: str = "jax",
) -> Tuple[np.ndarray, np.ndarray]:
    """Cluster ``(N, D)`` features into K groups. Returns ``(labels, centers)``."""
    if backend == "sklearn":
        from sklearn.cluster import KMeans

        km = KMeans(n_clusters=num_clusters, random_state=seed,
                    n_init=n_init, max_iter=max_iter, tol=tol).fit(features)
        return km.labels_.astype(np.int64), km.cluster_centers_
    import jax.numpy as jnp

    labels, centers, _ = _kmeans_jax(
        jnp.asarray(features, jnp.float32), num_clusters, seed, n_init, max_iter, tol
    )
    return np.asarray(labels, dtype=np.int64), np.asarray(centers)
