"""SlimZero conversion: in-degree guard, no reverse edges."""

import numpy as np

from hnsw_slim_tpu.config import HnswConfig, SlimConfig
from hnsw_slim_tpu.index.bruteforce import BruteForceIndex
from hnsw_slim_tpu.index.hnsw import HnswIndex
from hnsw_slim_tpu.index.slimzero import HnswSlimZeroIndex
from hnsw_slim_tpu.graph.prune import level_indegrees
from hnsw_slim_tpu.utils.data import clustered


def test_level_indegrees():
    adj0 = np.array([[1, 2, -1], [2, -1, -1], [0, -1, -1]], np.int32)
    levels = np.zeros(3, np.int32)
    ind = level_indegrees([adj0], levels)
    np.testing.assert_array_equal(ind[0], [1, 1, 2])


def test_slimzero_search_recall_and_guard():
    base, queries = clustered(n=4000, dim=32, n_queries=100, seed=31)
    hnsw = HnswIndex(HnswConfig(M=16, ef_construction=100), max_batch=512)
    hnsw.build(base)
    zero = HnswSlimZeroIndex.from_hnsw(hnsw, SlimConfig.from_ratios())
    stats = zero.check_integrity()
    assert stats["edges"] > 0

    bf = BruteForceIndex(base, chunk=1024)
    _, gt = bf.search(queries, k=10)
    zero.set_ef(80)
    _, ids = zero.search(queries, k=10)
    hits = sum(len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, gt))
    assert hits / gt.size >= 0.85, hits / gt.size


def test_size_estimate_formula():
    cfg = SlimConfig.from_ratios()
    est = HnswSlimZeroIndex.size_estimate(10**6, "32", cfg)
    decay = 1 / 32
    mix = 0.02 * 16 + 0.98 * 4
    expect = 16e6 + 2e6 * decay / (1 - decay) + 4e6 * (2 + decay) * mix
    assert abs(est - expect) < 1.0
