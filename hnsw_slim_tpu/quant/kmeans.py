"""Device-side Lloyd's KMeans (the KMeans-16 the reference assumes as
precomputed input files, hnsw_slimq_strategy.h:44-45: `_centroids_16.fvecs` /
`_clusterids_16.ivecs` — we build them in-framework)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import distance


@functools.partial(jax.jit, static_argnames=("k",))
def _assign(x, xn, cent, k):
    d = distance.pairwise_dist(
        x, cent, "l2", qn=xn, precision=jax.lax.Precision.DEFAULT
    )
    return jnp.argmin(d, axis=1).astype(jnp.int32)


def kmeans(
    vectors: np.ndarray, k: int = 16, iters: int = 25, seed: int = 0,
    batch: int = 262144,
) -> tuple[np.ndarray, np.ndarray]:
    """(centroids f32[k, d], assignments i32[N]) by Lloyd's iterations."""
    x = np.asarray(vectors, np.float32)
    n, d = x.shape
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(n, size=k, replace=False)].copy()
    xj = jnp.asarray(x)
    xnj = distance.sq_norms(xj)
    asn = np.zeros(n, np.int32)
    for _ in range(iters):
        for s in range(0, n, batch):
            e = min(s + batch, n)
            asn[s:e] = np.asarray(
                _assign(xj[s:e], xnj[s:e], jnp.asarray(cent), k)
            )
        sums = np.zeros((k, d), np.float64)
        np.add.at(sums, asn, x)
        counts = np.bincount(asn, minlength=k).astype(np.float64)
        empty = counts == 0
        if empty.any():  # reseed empty clusters
            cent[empty] = x[rng.choice(n, size=int(empty.sum()))]
        nz = ~empty
        cent[nz] = (sums[nz] / counts[nz, None]).astype(np.float32)
    return cent, asn
