"""CLI strategy layer: bruteforce GT generation then each index strategy."""

import numpy as np
import pytest

from hnsw_slim_tpu import strategy
from hnsw_slim_tpu.utils.data import clustered
from hnsw_slim_tpu.utils.io import write_fvecs


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    d = root / "toy"
    d.mkdir()
    base, queries = clustered(n=2500, dim=24, n_queries=30, seed=71)
    write_fvecs(d / "toy_base.fvecs", base)
    write_fvecs(d / "toy_query.fvecs", queries)
    # ground truth via the bruteforce strategy itself
    strategy.main([
        "--dataset", "toy", "--data_dir", str(root),
        "--solve_strategy", "bruteforce",
    ])
    return root


@pytest.mark.parametrize(
    "strat,min_recall",
    [
        ("hnsw", 0.9),
        ("hnsw_slim", 0.85),
        ("hnsw_slimzero", 0.85),
        ("hnsw_slimq", 0.8),
    ],
)
def test_strategies(dataset, strat, min_recall):
    r = strategy.main([
        "--dataset", "toy", "--data_dir", str(dataset),
        "--solve_strategy", strat, "--m", "16",
        "--ef_construction", "100", "--ef_search", "100", "--k", "10",
    ])
    assert r >= min_recall, (strat, r)


def test_index_save_and_reload(dataset, tmp_path):
    argv = [
        "--dataset", "toy", "--data_dir", str(dataset),
        "--solve_strategy", "hnsw_slim", "--m", "16",
        "--ef_construction", "100", "--index_dir", str(tmp_path),
    ]
    r1 = strategy.main(argv)
    r2 = strategy.main(argv)  # second run loads from disk
    assert abs(r1 - r2) < 1e-9
