"""Slim conversion pipeline + threshold search tests."""

import numpy as np
import pytest

from hnsw_slim_tpu.config import HnswConfig, SlimConfig
from hnsw_slim_tpu.graph.prune import degree_thresholds
from hnsw_slim_tpu.index.bruteforce import BruteForceIndex
from hnsw_slim_tpu.index.hnsw import HnswIndex
from hnsw_slim_tpu.index.slim import HnswSlimIndex
from hnsw_slim_tpu.utils.data import clustered


def _build_pair(n=4000, dim=32, nq=100, seed=31, M=16, efc=100):
    base, queries = clustered(n=n, dim=dim, n_queries=nq, seed=seed)
    hnsw = HnswIndex(HnswConfig(M=M, ef_construction=efc), max_batch=512)
    hnsw.build(base)
    return base, queries, hnsw


def test_degree_threshold_walk_level0_quirk():
    # level 0 must get threshold maxM0+1 (reference quirk: level_cnts[0]==0)
    adj0 = np.full((100, 8), -1, np.int32)
    adj0[:, :4] = (np.arange(100)[:, None] + np.arange(1, 5)[None, :]) % 100
    adj0[:2, 4:] = [[50, 51, 52, 53], [60, 61, 62, 63]]  # two degree-8 hubs
    levels = np.zeros(100, np.int32)
    thr = degree_thresholds([adj0], levels, maxM0=8, cfg=SlimConfig())
    assert thr[0] == 9  # maxM0 + 1: no level-0 hubs, ever (shipped behavior)
    thr2 = degree_thresholds(
        [adj0], levels, maxM0=8, cfg=SlimConfig(), count_level0_hubs=True
    )
    # topN = round(100*0.02) = 2; the two degree-8 nodes cross it at d=8
    assert thr2[0] == 8


def test_slim_conversion_and_search():
    base, queries, hnsw = _build_pair()
    slim = HnswSlimIndex.from_hnsw(hnsw, SlimConfig.from_ratios())
    stats = slim.check_integrity()
    assert stats["edges"] > 0

    # slim graph must not exceed the vanilla graph (size-reduction ratio on
    # dense graphs is asserted in test_slim_index_size_reduction)
    vanilla_edges = sum(int((np.asarray(a) >= 0).sum()) for a in hnsw.graph.adjs)
    assert stats["edges"] <= vanilla_edges, (stats["edges"], vanilla_edges)

    bf = BruteForceIndex(base, chunk=1024)
    _, gt = bf.search(queries, k=10)

    slim.set_ef(80)
    d, ids = slim.search(queries, k=10)
    hits = sum(len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, gt))
    recall = hits / gt.size
    assert recall >= 0.9, recall

    # distances must be true distances
    valid = ids >= 0
    true_d = ((queries[:, None, :] - base[np.maximum(ids, 0)]) ** 2).sum(-1)
    np.testing.assert_allclose(d[valid], true_d[valid], rtol=1e-3, atol=1e-3)


def test_slim_index_size_reduction():
    # reference defaults (M=30 -> maxM0=60) on uniform data produce the dense
    # graphs the pruning is designed for; clustered/low-dim graphs are already
    # sparse because the RNG heuristic prunes them at insert time
    rng = np.random.default_rng(0)
    base = rng.standard_normal((3000, 24)).astype(np.float32)
    # insertion strategy: reference-like dense maxM0-saturated graphs are
    # what the two-stage pruning is designed to shrink (NND+RNG graphs are
    # born sparse, so the conversion has less to remove there)
    hnsw = HnswIndex(
        HnswConfig(M=30, ef_construction=128), max_batch=512, strategy="insert"
    )
    hnsw.build(base)
    slim = HnswSlimIndex.from_hnsw(hnsw, SlimConfig.from_ratios())
    # reference-accounting vanilla bytes: 24/node + 4/edge (+2/level u16)
    levels = np.asarray(hnsw.graph.level)
    vanilla_edges = sum(int((np.asarray(a) >= 0).sum()) for a in hnsw.graph.adjs)
    vanilla_bytes = 16 * len(levels) + 2 * int(levels.sum()) + 4 * vanilla_edges
    ratio = vanilla_bytes / slim.index_size()
    assert ratio > 1.5, ratio
    assert vanilla_edges / slim.check_integrity()["edges"] > 1.8


def test_slim_threshold_level_1():
    # threshold_level=1: beam runs at level 1 too, filter keeps all at l==1
    base, queries, hnsw = _build_pair(n=3000)
    slim = HnswSlimIndex.from_hnsw(
        hnsw, SlimConfig.from_ratios(threshold_level=1)
    )
    slim.check_integrity()
    bf = BruteForceIndex(base, chunk=1024)
    _, gt = bf.search(queries, k=10)
    slim.set_ef(80)
    _, ids = slim.search(queries, k=10)
    hits = sum(len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, gt))
    assert hits / gt.size >= 0.9


def test_slim_ip_metric():
    base, queries = clustered(n=2500, dim=24, n_queries=40, seed=14)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    hnsw = HnswIndex(HnswConfig(M=16, ef_construction=100, metric="ip"))
    hnsw.build(base)
    slim = HnswSlimIndex.from_hnsw(hnsw, SlimConfig.from_ratios())
    bf = BruteForceIndex(base, metric="ip", chunk=1024)
    _, gt = bf.search(queries, k=10)
    slim.set_ef(80)
    _, ids = slim.search(queries, k=10)
    hits = sum(len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, gt))
    assert hits / gt.size >= 0.85, hits / gt.size


def test_dynamic_ef_matches_static():
    from hnsw_slim_tpu.config import SearchConfig

    base, queries, hnsw = _build_pair(n=2000, nq=30)
    slim = HnswSlimIndex.from_hnsw(hnsw, SlimConfig.from_ratios())
    bf = BruteForceIndex(base, chunk=1024)
    _, gt = bf.search(queries, k=10)

    slim.scfg = SearchConfig(ef=64)
    _, i_static = slim.search(queries, k=10)
    h_static = sum(len(set(a.tolist()) & set(b.tolist()))
                   for a, b in zip(i_static, gt))

    slim.scfg = SearchConfig(ef=64, dynamic_ef=True, ef_max=128)
    _, i_dyn = slim.search(queries, k=10)
    h_dyn = sum(len(set(a.tolist()) & set(b.tolist()))
                for a, b in zip(i_dyn, gt))
    # dynamic-ef expands the same frontier; the wider scratch buffer can only
    # add candidates, so recall must be >= the static program's
    assert h_dyn >= h_static - 2, (h_dyn, h_static)

    # set_ef with dynamic_ef reuses the SAME compiled program (no retrace)
    slim.set_ef(32)
    _, i32 = slim.search(queries, k=10)
    assert i32.shape == (30, 10)


def test_filtered_search():
    """In-kernel BaseFilterFunctor: 50% of nodes disallowed, EVERY query must
    still return k allowed ids (the allowed-only FilterTrack keeps searching
    until its ef buffer bounds the frontier), and they must be high-recall
    against brute force restricted to the allowed set."""
    from hnsw_slim_tpu.index.bruteforce import BruteForceIndex

    base, queries, hnsw = _build_pair(n=2000, nq=20)
    slim = HnswSlimIndex.from_hnsw(hnsw, SlimConfig.from_ratios())
    slim.set_ef(80)
    mask = np.ones(2000, bool)
    mask[::2] = False  # only odd ids allowed (50% filtered)
    d, ids = slim.search(queries, k=10, filter_mask=mask)
    assert ids.shape == (20, 10)
    assert (ids >= 0).all(), "under-filled rows under 50% filtering"
    assert (ids % 2 == 1).all()
    assert (np.diff(d, axis=1) >= -1e-5).all()  # sorted ascending

    # recall vs exact search over the ALLOWED subset only
    bf = BruteForceIndex(base[mask], chunk=1024)
    _, sub_gt = bf.search(queries, k=10)
    gt_ids = np.nonzero(mask)[0][sub_gt]  # map back to original ids
    rec = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(ids, gt_ids)
    ])
    assert rec >= 0.85, rec

    # unfiltered results include even ids
    _, ids2 = slim.search(queries, k=10)
    assert (ids2[ids2 >= 0] % 2 == 0).any()


def test_filtered_search_heavy():
    """90% filtered: still k results per query (reference keeps collecting
    until k allowed results, hnswalg.h searchBaseLayerST non-bare-bone)."""
    base, queries, hnsw = _build_pair(n=2000, nq=20)
    slim = HnswSlimIndex.from_hnsw(hnsw, SlimConfig.from_ratios())
    slim.set_ef(64)
    rng = np.random.default_rng(0)
    mask = rng.random(2000) < 0.1  # only ~10% allowed
    d, ids = slim.search(queries, k=5, filter_mask=mask)
    assert (ids >= 0).all()
    assert mask[ids].all()


def test_densify_level0_same_results():
    base, queries, hnsw = _build_pair(n=2000, nq=20)
    slim = HnswSlimIndex.from_hnsw(hnsw, SlimConfig.from_ratios())
    slim.set_ef(64)
    _, chal_ids = slim.search(queries, k=10)
    extra = slim.densify_level0()
    assert extra == 2000 * slim.graph.cap0 * 4
    _, dense_ids = slim.search(queries, k=10)
    np.testing.assert_array_equal(dense_ids, chal_ids)


def test_densify_upper_same_results():
    """The dense upper serving layout (rank indirection, index/slim.py
    densify_upper) must reproduce the flat-CHAL traversal exactly, and
    update_dense_upper must track incremental changes including level
    drops (rank removal)."""
    base, queries, hnsw = _build_pair(n=2500, nq=30)
    slim = HnswSlimIndex.from_hnsw(hnsw, SlimConfig.from_ratios())
    slim.set_ef(64)
    _, chal_ids = slim.search(queries, k=10)
    slim.densify_level0()
    slim.densify_upper()
    assert slim.rank_up is not None and slim.dense_up is not None
    lvl = np.asarray(slim.graph.level)
    assert int(slim._n_up) == int((lvl >= 1).sum())
    _, dense_ids = slim.search(queries, k=10)
    np.testing.assert_array_equal(dense_ids, chal_ids)

    # incremental maintenance: refresh a few upper rows + drop one node's
    # level in the host mirror, then verify the device layout tracks it
    c = slim._host_chal()
    up_ids = np.nonzero(c["level"] >= 1)[0]
    victim = int(up_ids[0])
    c2 = dict(c)
    c2["level"] = c["level"].copy()
    c2["level"][victim] = 0
    slim.update_dense_upper(c2, np.concatenate([up_ids[:8], [victim]]))
    assert int(slim._rank_np[victim]) == -1
    assert int(np.asarray(slim.rank_up)[victim]) == -1


def test_autotune_calibrates_knobs():
    """autotune_index must (a) never pick knobs below the lossless config's
    probe recall minus slack, (b) cache per (ef, k), (c) leave scfg set to
    the winning knobs, (d) honor gids remapping for union-style indexes."""
    base, queries, hnsw = _build_pair(n=3000)
    slim = HnswSlimIndex.from_hnsw(hnsw, SlimConfig.from_ratios())

    rep = slim.autotune(128)
    assert set(rep["knobs"]) == {"pop_width", "scan_width"}
    assert slim.scfg.pop_width == rep["knobs"]["pop_width"]
    assert slim.scfg.ef == 128
    # lossless config (pop 8, scan 0) is in the grid; the winner's probe
    # recall is within slack of the best observed
    grid = {(g["pop_width"], g["scan_width"]): g["recall"] for g in rep["grid"]}
    assert (8, 0) in grid
    win = grid[(rep["knobs"]["pop_width"], rep["knobs"]["scan_width"])]
    assert win >= rep["probe_recall"] - 0.002 - 1e-9

    # cached: second call returns the same object without re-sweeping
    assert slim.autotune(128) is rep

    # calibrated search still hits real-query recall
    bf = BruteForceIndex(base, chunk=1024)
    _, gt = bf.search(queries, k=10)
    _, ids = slim.search(queries, k=10)
    hits = sum(len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, gt))
    assert hits / gt.size >= 0.9


def test_exact_topk_matches_bruteforce():
    from hnsw_slim_tpu.index.bruteforce import exact_topk

    base, queries, hnsw = _build_pair(n=2500)
    slim = HnswSlimIndex.from_hnsw(hnsw, SlimConfig.from_ratios())
    bf = BruteForceIndex(base, chunk=1024)
    _, gt = bf.search(queries, k=10)
    _, ids = exact_topk(slim.vectors, slim.vn, queries, k=10,
                        metric="l2", chunk=1024, n_valid=slim.graph.n)
    # padded rows (graph.n..pad) must never appear
    assert int(np.asarray(ids).max()) < slim.graph.n
    agree = sum(len(set(a.tolist()) & set(b.tolist()))
                for a, b in zip(np.asarray(ids), np.asarray(gt)))
    assert agree / gt.size >= 0.999
