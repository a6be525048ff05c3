"""End-to-end: batched HNSW build -> search -> recall vs brute force."""

import numpy as np
import pytest

from hnsw_slim_tpu.config import HnswConfig
from hnsw_slim_tpu.graph.build import sample_levels
from hnsw_slim_tpu.index.bruteforce import BruteForceIndex
from hnsw_slim_tpu.index.hnsw import HnswIndex
from hnsw_slim_tpu.utils.data import clustered


def test_sample_levels_distribution():
    lv = sample_levels(200000, mult=1.0 / np.log(32.0), seed=0)
    frac1 = (lv >= 1).mean()
    assert abs(frac1 - 1 / 32) < 0.005  # geometric with p = 1/32
    assert lv.min() == 0


def test_hnsw_build_search_recall():
    base, queries = clustered(n=5000, dim=32, n_queries=100, seed=11)
    cfg = HnswConfig(M=16, ef_construction=100, ef_search=64, branching_factor="32")
    idx = HnswIndex(cfg, max_batch=512)
    idx.build(base)

    stats = idx.check_integrity()
    assert stats["connections"] > 0

    bf = BruteForceIndex(base, chunk=1024)
    _, gt = bf.search(queries, k=10)
    d, ids = idx.search(queries, k=10)
    hits = sum(len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, gt))
    recall = hits / gt.size
    assert recall >= 0.95, recall

    # distances must be true distances of returned ids
    valid = ids >= 0
    true_d = ((queries[:, None, :] - base[np.maximum(ids, 0)]) ** 2).sum(-1)
    np.testing.assert_allclose(d[valid], true_d[valid], rtol=1e-3, atol=1e-3)


def test_insert_build_device_mirror_parity():
    """The insertion builder keeps two adjacency copies: adj_np (the host
    mirror convert/incremental consume) and adj_dev (device, what in-build
    searches traverse — and now the returned graph). The device side is
    updated with device-direct prune scatters + sparse deltas, so any drift
    would silently degrade build quality without failing a recall test.
    Assert byte-exact agreement on every ACTIVE row (level >= l) after a
    build that exercises both the fit (append) and overflow (re-prune)
    reverse-connect paths; host rows of inactive nodes are undefined by
    contract (np.empty lazy allocation — see build())."""
    from hnsw_slim_tpu.graph.build import HnswBuilder

    base, _ = clustered(n=3000, dim=16, n_queries=1, seed=3)
    b = HnswBuilder(HnswConfig(M=8, ef_construction=48), max_batch=256)
    g, levels = b.build(base)
    for lvl, dev in enumerate(g.adjs):
        act = levels >= lvl
        np.testing.assert_array_equal(
            np.asarray(dev)[act], b.adj_np[lvl][act],
            err_msg=f"adjacency mirror diverged at level {lvl}",
        )
        # inactive device rows must stay -1 (unreachable padding)
        assert (np.asarray(dev)[~act] == -1).all()


def test_hnsw_ip_metric():
    base, queries = clustered(n=2000, dim=24, n_queries=50, seed=12)
    # normalize for a meaningful IP space
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    cfg = HnswConfig(M=16, ef_construction=100, ef_search=64, metric="ip")
    idx = HnswIndex(cfg, max_batch=512)
    idx.build(base)
    bf = BruteForceIndex(base, metric="ip", chunk=1024)
    _, gt = bf.search(queries, k=10)
    _, ids = idx.search(queries, k=10)
    hits = sum(len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, gt))
    assert hits / gt.size >= 0.9


def test_bf16_storage_recall():
    base, queries = clustered(n=3000, dim=32, n_queries=50, seed=13)
    cfg = HnswConfig(M=16, ef_construction=100, ef_search=64,
                     store_dtype="bfloat16")
    idx = HnswIndex(cfg, max_batch=512)
    idx.build(base)
    import jax.numpy as jnp
    assert idx.vectors.dtype == jnp.bfloat16
    bf = BruteForceIndex(base, chunk=1024)
    _, gt = bf.search(queries, k=10)
    _, ids = idx.search(queries, k=10)
    hits = sum(len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, gt))
    assert hits / gt.size >= 0.93, hits / gt.size


def test_degenerate_duplicates_and_zeros():
    # many exact duplicates + zero vectors must not break build or search
    rng = np.random.default_rng(15)
    uniq = rng.standard_normal((300, 16)).astype(np.float32)
    base = np.concatenate([
        uniq,
        np.repeat(uniq[:50], 5, axis=0),  # 250 duplicates
        np.zeros((20, 16), np.float32),
    ])
    idx = HnswIndex(HnswConfig(M=8, ef_construction=48, ef_search=48))
    idx.build(base)
    idx.check_integrity()
    q = uniq[:10]
    d, ids = idx.search(q, k=1)
    # nearest neighbor of an exact dataset point must have distance 0
    np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-5)
