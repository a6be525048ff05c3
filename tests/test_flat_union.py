"""FlatUnionIndex: one-device serving of independently built shards."""

import numpy as np

from hnsw_slim_tpu.config import HnswConfig, SlimConfig, SearchConfig
from hnsw_slim_tpu.index.bruteforce import BruteForceIndex
from hnsw_slim_tpu.index.slim import HnswSlimIndex
from hnsw_slim_tpu.parallel.flat_union import FlatUnionIndex


def test_flat_union_recall_and_merge():
    rng = np.random.default_rng(4)
    n, s, dim = 2400, 4, 24
    base = rng.standard_normal((n, dim)).astype(np.float32)
    queries = rng.standard_normal((64, dim)).astype(np.float32)
    bf = BruteForceIndex(base, chunk=1024)
    _, gt = bf.search(queries, k=5)

    shards = []
    for si in range(s):
        gids = np.arange(si, n, s, dtype=np.int32)
        idx = HnswSlimIndex.build(
            base[gids], HnswConfig(M=8, ef_construction=48),
            SlimConfig(top_M0=10, low_m0=4, top_M=6, low_m=3),
        )
        shards.append((idx, gids))

    uni = FlatUnionIndex.from_indexes(
        shards, search_cfg=SearchConfig(ef=48)
    )
    d, i = uni.search(queries, k=5)
    assert i.shape == (64, 5) and (i >= 0).all()
    rec = sum(len(set(a.tolist()) & set(b.tolist()))
              for a, b in zip(i, gt)) / gt.size
    assert rec >= 0.9, rec
    # distances ascending and consistent with exact recompute
    assert (np.diff(d, axis=1) >= -1e-5).all()
    dx = ((queries[:, None, :] - base[i]) ** 2).sum(-1)
    np.testing.assert_allclose(d, dx, rtol=1e-3, atol=1e-3)

    # the union must return exactly the merge of per-shard searches
    per = []
    for idx, gids in shards:
        idx.set_ef(48)
        sd, si_ = idx.search(queries, k=5)
        per.append((sd, np.where(si_ >= 0, gids[np.maximum(si_, 0)], -1)))
    cat_d = np.concatenate([p[0] for p in per], axis=1)
    cat_i = np.concatenate([p[1] for p in per], axis=1)
    order = np.argsort(cat_d, axis=1)[:, :5]
    want = np.take_along_axis(cat_i, order, 1)
    agree = (want == i).mean()
    assert agree > 0.98, agree

    # seeded single-instance path: one query instance, shard-stratified
    # exact seeds over the union upper layer — no S-way replication. On
    # 600-node shards the upper layer is a ~2% sample, so the shared-buffer
    # bound can starve far shards (lazy exploration has no per-shard
    # guarantee) — this test pins mechanism correctness (global-id results,
    # exact distances, sane recall); the throughput/recall trade at scale
    # is measured on the 8M/16M sets (scripts/serve_8m.py, serve_16m.py)
    # where the upper layer is a ~6% sample per shard.
    import dataclasses

    uni.scfg = dataclasses.replace(uni.scfg, seed_width=16)
    d2, i2 = uni.search(queries, k=5)
    rec2 = sum(len(set(a.tolist()) & set(b.tolist()))
               for a, b in zip(i2, gt)) / gt.size
    assert rec2 >= 0.5, rec2
    ok = i2 >= 0
    assert ok.all()
    dx2 = ((queries[:, None, :] - base[i2]) ** 2).sum(-1)
    np.testing.assert_allclose(d2, dx2, rtol=1e-3, atol=1e-3)
