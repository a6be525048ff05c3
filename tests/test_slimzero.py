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


def test_incremental_slimzero_full_and_update():
    """IncrementalSlimZero (convertFromHNSWWithDiff counterpart,
    hnswalg_slimzero.h:1590-1660): full() matches convert_to_slimzero;
    update() after inserts keeps the floor invariant and serves the new
    points."""
    from hnsw_slim_tpu.graph.incremental import IncrementalSlimZero
    from hnsw_slim_tpu.index.slim import HnswSlimIndex

    base, queries = clustered(n=3000, dim=32, n_queries=60, seed=77)
    hnsw = HnswIndex(HnswConfig(M=12, ef_construction=80), max_batch=512)
    hnsw.build(base[:2800])
    cfg = SlimConfig.from_ratios()

    inc = IncrementalSlimZero(cfg, metric="l2")
    g_inc = inc.full(
        hnsw.host_adj(), np.asarray(hnsw.levels),
        int(np.asarray(hnsw.graph.entry)), hnsw.vectors, hnsw.vn,
    )
    ref = HnswSlimZeroIndex.from_hnsw(hnsw, cfg)
    np.testing.assert_array_equal(
        np.asarray(g_inc.nbr), np.asarray(ref.graph.nbr))
    np.testing.assert_array_equal(
        np.asarray(g_inc.lvl_off), np.asarray(ref.graph.lvl_off))

    touched = hnsw.add_points(base[2800:])
    g2, changed = inc.update(
        hnsw.host_adj(), np.asarray(hnsw.levels),
        int(np.asarray(hnsw.graph.entry)), hnsw.vectors, hnsw.vn,
        touched=touched,
    )
    # every inserted node is in the patch membership set
    assert set(range(2800, 3000)) <= set(int(v) for v in changed)

    idx = HnswSlimIndex(metric="l2")
    idx.graph = g2
    idx.vectors = hnsw.vectors
    idx.vn = hnsw.vn
    idx.set_ef(80)
    bf = BruteForceIndex(base, chunk=1024)
    _, gt = bf.search(queries, k=10)
    _, ids = idx.search(queries, k=10)
    hits = sum(len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, gt))
    assert hits / gt.size >= 0.85, hits / gt.size
    # the new points themselves must be findable (connectivity floor)
    _, self_ids = idx.search(base[2800:], k=1)
    found = (np.asarray(self_ids)[:, 0] == np.arange(2800, 3000)).mean()
    assert found >= 0.95, found


def test_slimzero_server_patch_idempotence():
    """SlimServer(serve_index="slimzero"): patches reproduce the server's
    graph exactly on a client copy, and re-applying is a no-op."""
    import copy

    from hnsw_slim_tpu.persist import patch as patchlib
    from hnsw_slim_tpu.serve.server import SlimServer

    base, queries = clustered(n=2200, dim=16, n_queries=20, seed=91)
    server = SlimServer(
        base[:2000],
        hnsw_cfg=HnswConfig(M=12, ef_construction=64),
        slim_cfg=SlimConfig.from_ratios(),
        serve_index="slimzero",
    )
    from hnsw_slim_tpu.graph.incremental import IncrementalSlimZero

    assert isinstance(server.inc, IncrementalSlimZero)

    local_g = server.chal_unpadded
    local_vecs = np.array(server.vectors_np)
    writer = server.update_index(base[2000:2200])
    chunks = []
    while True:
        blob, finished = writer.next_chunk(limit=64 * 1024)
        chunks.append(blob)
        if finished:
            break
    g = local_g
    for blob in chunks:
        g, local_vecs = patchlib.apply_patch(g, blob, local_vecs)

    a, b = patchlib.to_np(g), patchlib.to_np(server.chal_unpadded)
    n = server.chal_unpadded.n  # logical count (graphs may be node-padded)
    np.testing.assert_array_equal(a["level"][:n], b["level"][:n])
    for v in range(n):
        for x, y in zip(patchlib.node_slices(a, v), patchlib.node_slices(b, v)):
            np.testing.assert_array_equal(x, y)
    np.testing.assert_allclose(local_vecs, server.vectors_np)
    g2, _ = patchlib.apply_patch(g, chunks[-1], local_vecs)
    np.testing.assert_array_equal(np.asarray(g2.lvl_off), np.asarray(g.lvl_off))

    # served queries reach the new points
    d, labels = server.query(base[2100], k=3)
    assert 2100 in labels
