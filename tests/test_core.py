"""Tests for config, I/O, distances, brute force, and recall oracle."""

import numpy as np
import pytest

from hnsw_slim_tpu.config import HnswConfig, SlimConfig, branching_mult
from hnsw_slim_tpu.eval.recall import recall_at_k
from hnsw_slim_tpu.index.bruteforce import BruteForceIndex
from hnsw_slim_tpu.ops import distance
from hnsw_slim_tpu.utils import io
from hnsw_slim_tpu.utils.data import clustered

import jax.numpy as jnp


def test_branching_mult():
    # reference hnswalg.h:143-158
    assert branching_mult("e") == pytest.approx(1.0)
    assert branching_mult("32") == pytest.approx(1.0 / np.log(32.0))
    assert branching_mult("sqrt") == pytest.approx(
        1.0 / np.log(np.sqrt(2.0) / (np.sqrt(2.0) - 1.0))
    )


def test_slim_config_ratios():
    # reference main.cc:58-70 with defaults top_M0=32, level_ratio=50, Mm_ratio=25
    cfg = SlimConfig.from_ratios()
    assert (cfg.top_M0, cfg.low_m0, cfg.top_M, cfg.low_m) == (32, 8, 16, 4)


def test_fvecs_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((17, 24)).astype(np.float32)
    p = tmp_path / "x.fvecs"
    io.write_fvecs(p, data)
    assert io.read_size(p) == (24, 17)
    back = io.read_fvecs(p)
    np.testing.assert_array_equal(back, data)
    part = io.read_fvecs(p, max_num=5)
    np.testing.assert_array_equal(part, data[:5])

    ids = rng.integers(0, 100, (7, 10)).astype(np.int32)
    pi = tmp_path / "x.ivecs"
    io.write_ivecs(pi, ids)
    np.testing.assert_array_equal(io.read_ivecs(pi), ids)


def test_pairwise_matches_numpy():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    x = rng.standard_normal((11, 32)).astype(np.float32)
    d = np.asarray(distance.pairwise_dist(jnp.asarray(q), jnp.asarray(x), "l2"))
    ref = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, rtol=1e-4, atol=1e-4)
    dip = np.asarray(distance.pairwise_dist(jnp.asarray(q), jnp.asarray(x), "ip"))
    np.testing.assert_allclose(dip, 1.0 - q @ x.T, rtol=1e-5, atol=1e-5)


def test_gathered_dist_matches_pairwise():
    rng = np.random.default_rng(2)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    x = rng.standard_normal((30, 16)).astype(np.float32)
    ids = rng.integers(0, 30, (4, 6))
    vecs = x[ids]
    d = np.asarray(
        distance.gathered_dist(jnp.asarray(q), jnp.asarray(vecs), "l2")
    )
    full = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    ref = np.take_along_axis(full, ids, axis=1)
    np.testing.assert_allclose(d, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_bruteforce_exact(metric):
    base, queries = clustered(n=3000, dim=24, n_queries=32, seed=3)
    bf = BruteForceIndex(base, metric=metric, chunk=1024)
    d, i = bf.search(queries, k=10)
    # numpy reference
    if metric == "ip":
        full = 1.0 - queries @ base.T
    else:
        full = ((queries[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    ref_i = np.argsort(full, axis=1, kind="stable")[:, :10]
    ref_d = np.take_along_axis(full, ref_i, axis=1)
    np.testing.assert_allclose(np.sort(d, axis=1), np.sort(ref_d, axis=1), rtol=1e-3, atol=1e-3)
    # id sets must match (allow distance ties to permute)
    for a, b in zip(i, ref_i):
        assert len(set(a.tolist()) & set(b.tolist())) >= 9


def test_recall_oracle_perfect():
    base, queries = clustered(n=2000, dim=16, n_queries=16, seed=4)
    bf = BruteForceIndex(base, chunk=1024)
    _, gt = bf.search(queries, k=100)
    _, res = bf.search(queries, k=10)
    r = recall_at_k(res, gt, queries, base, k=10)
    assert r == pytest.approx(1.0)
    # a wrong result should score < 1
    res_bad = np.roll(res, 1, axis=0)
    assert recall_at_k(res_bad, gt, queries, base, k=10) < 1.0
