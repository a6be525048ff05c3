"""SlimQ head-to-head against the ACTUAL reference quantized engine.

Builds parity/ref_harness in slimq mode (compiles the unmodified
hnswalg_slimq.h + rabitqlib headers), runs the full reference SlimQ pipeline
(rabitq HNSW build -> slim conversion -> 1-bit-estimate search with exact
top-K rerank, hnsw_slimq_strategy.h:49-165) on shared data with the SAME
kmeans-16 centroids our engine uses, then compares recall at equal ef.

The estimator designs differ by intent (SURVEY §2 row 35): the reference
quantizes the query to 4-bit planes (SplitSingleQuery), we keep the rotated
query exact and estimate via one matmul — exact-or-better estimates. The
assertion is therefore recall(ours) >= recall(reference) - 0.02 at each ef.
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from hnsw_slim_tpu.config import HnswConfig, SlimConfig
from hnsw_slim_tpu.index.bruteforce import BruteForceIndex
from hnsw_slim_tpu.index.slimq import HnswSlimQIndex
from hnsw_slim_tpu.utils.data import clustered
from hnsw_slim_tpu.utils.io import read_ivecs, write_fvecs, write_ivecs

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def harness():
    r = subprocess.run(["make", "-C", str(REPO / "parity")],
                       capture_output=True, timeout=900)
    binary = REPO / "parity" / "ref_harness"
    if r.returncode != 0 or not binary.exists():
        pytest.skip(f"reference harness unavailable: {r.stderr[-300:]}")
    return str(binary)


def _recall(ids, gt):
    return np.mean([
        len(set(a.tolist()) & set(b.tolist())) / gt.shape[1]
        for a, b in zip(ids, gt)
    ])


def test_slimq_recall_parity(harness, tmp_path):
    base, queries = clustered(5000, 64, n_queries=100, seed=11)
    bf = BruteForceIndex(base, chunk=1024)
    _, gt = bf.search(queries, k=10)

    # shared kmeans-16 centroids/assignments (the files the reference
    # pipeline precomputes, hnsw_slimq_strategy.h:43-46)
    from hnsw_slim_tpu.quant.kmeans import kmeans

    cent, asn = kmeans(base, 16, iters=10, seed=0)

    bp, qp = tmp_path / "b.fvecs", tmp_path / "q.fvecs"
    cp, ap = tmp_path / "c.fvecs", tmp_path / "a.ivecs"
    write_fvecs(bp, base)
    write_fvecs(qp, queries)
    write_fvecs(cp, np.asarray(cent))
    write_ivecs(ap, np.asarray(asn, np.int32).reshape(-1, 1))
    rp = tmp_path / "r.ivecs"
    out = subprocess.run(
        [harness, str(bp), str(qp), str(rp), "slimq", "16", "128", "32,64",
         "10", "1", "", str(cp), str(ap)],
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-500:]
    ref_recall = {
        ef: _recall(read_ivecs(str(rp) + f".ef{ef}"), gt) for ef in (32, 64)
    }

    idx = HnswSlimQIndex.build(
        base, HnswConfig(M=16, ef_construction=128),
        SlimConfig(top_M0=32, low_m0=8, top_M=16, low_m=4),
    )
    for ef in (32, 64):
        idx.set_ef(ef)
        _, ids = idx.search(queries, k=10)
        ours = _recall(ids, gt)
        # measured on this data: ref 0.31/0.49, ours 0.58/0.94 — the exact
        # query estimator traverses strictly better than 4-bit query planes
        assert ours >= ref_recall[ef] - 0.02, (ef, ours, ref_recall[ef])
    assert ours >= 0.85, ours  # and absolutely usable at ef=64


def test_slimq_use_ex_improves_estimates(tmp_path):
    """use_ex traversal (hnswalg_slimq.h searchBaseLayerST<use_ex=true>) must
    be reachable from SearchConfig and not hurt recall."""
    import dataclasses

    base, queries = clustered(3000, 48, n_queries=50, seed=5)
    bf = BruteForceIndex(base, chunk=1024)
    _, gt = bf.search(queries, k=10)
    idx = HnswSlimQIndex.build(
        base, HnswConfig(M=12, ef_construction=96),
        SlimConfig(top_M0=24, low_m0=6, top_M=12, low_m=3),
    )
    idx.set_ef(48)
    _, ids1 = idx.search(queries, k=10)
    r1 = _recall(ids1, gt)
    idx.scfg = dataclasses.replace(idx.scfg, use_ex=True)
    _, ids2 = idx.search(queries, k=10)
    r2 = _recall(ids2, gt)
    assert r2 >= r1 - 0.02, (r1, r2)
