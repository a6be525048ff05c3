"""Synthetic dataset generation for tests and benchmarks.

The reference benchmarks on SIFT/GIST/DEEP/COHERE fvecs files; for hermetic
tests and the bench harness we generate clustered Gaussian data with the same
shape characteristics (mirrors what prep_data.cc slices from real sets).
"""

from __future__ import annotations

import numpy as np


def clustered(
    n: int,
    dim: int,
    n_queries: int = 0,
    n_clusters: int = 64,
    seed: int = 0,
    scale: float = 0.15,
) -> tuple[np.ndarray, np.ndarray]:
    """(base f32[n, dim], queries f32[n_queries, dim]) clustered Gaussians."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    asn = rng.integers(0, n_clusters, size=n)
    base = centers[asn] + scale * rng.standard_normal((n, dim)).astype(np.float32)
    if n_queries:
        qasn = rng.integers(0, n_clusters, size=n_queries)
        queries = centers[qasn] + scale * rng.standard_normal((n_queries, dim)).astype(
            np.float32
        )
    else:
        queries = np.zeros((0, dim), np.float32)
    return base.astype(np.float32), queries.astype(np.float32)


def manifold(
    n: int,
    dim: int,
    latent_dim: int = 24,
    n_queries: int = 0,
    n_clusters: int = 256,
    seed: int = 0,
    scale: float = 1.0,
    noise: float = 0.02,
) -> tuple[np.ndarray, np.ndarray]:
    """Low-intrinsic-dimension synthetic: gaussian-mixture latents embedded
    into `dim` ambient dimensions by a random orthonormal map, plus small
    ambient noise. This is the geometry RaBitQ-style quantization assumes
    (real embeddings concentrate near a low-dim manifold; iid gaussians —
    `clustered` with large scale — are its adversarial worst case, see
    PARITY.md SlimQ notes)."""
    rng = np.random.default_rng(seed)
    emb = np.linalg.qr(rng.standard_normal((dim, latent_dim)))[0]
    centers = rng.standard_normal((n_clusters, latent_dim)).astype(np.float32)
    asn = rng.integers(0, n_clusters, size=n)
    z = centers[asn] + scale * rng.standard_normal((n, latent_dim))
    base = (z @ emb.T + noise * rng.standard_normal((n, dim))).astype(
        np.float32)
    queries = np.zeros((0, dim), np.float32)
    if n_queries:
        qa = rng.integers(0, n_clusters, size=n_queries)
        zq = centers[qa] + scale * rng.standard_normal((n_queries, latent_dim))
        queries = (zq @ emb.T
                   + noise * rng.standard_normal((n_queries, dim))).astype(
            np.float32)
    return base, queries
