"""prep_data / recall_knn CLI tools."""

import numpy as np

from hnsw_slim_tpu import tools
from hnsw_slim_tpu.utils.data import clustered
from hnsw_slim_tpu.utils.io import read_fvecs, write_fvecs, write_ivecs


def test_prep_data_slices(tmp_path):
    base, _ = clustered(500, 16, seed=1)
    src = tmp_path / "full.fvecs"
    dst = tmp_path / "small.fvecs"
    write_fvecs(src, base)
    tools.prep_data(["--src", str(src), "--dst", str(dst), "--num", "100"])
    out = read_fvecs(dst)
    np.testing.assert_array_equal(out, base[:100])


def test_recall_knn_scores(tmp_path):
    base, queries = clustered(800, 16, n_queries=10, seed=2)
    from hnsw_slim_tpu.index.bruteforce import BruteForceIndex

    bf = BruteForceIndex(base, chunk=1024)
    _, gt = bf.search(queries, k=50)
    write_fvecs(tmp_path / "b.fvecs", base)
    write_fvecs(tmp_path / "q.fvecs", queries)
    write_ivecs(tmp_path / "gt.ivecs", gt)
    write_ivecs(tmp_path / "knn.ivecs", gt[:, :10])
    r = tools.recall_knn([
        "--base", str(tmp_path / "b.fvecs"),
        "--query", str(tmp_path / "q.fvecs"),
        "--gt", str(tmp_path / "gt.ivecs"),
        "--knn", str(tmp_path / "knn.ivecs"),
        "--k", "10",
    ])
    assert r == 1.0
