"""Persistence + patch protocol: save/load determinism, diff/patch idempotence."""

import numpy as np

from hnsw_slim_tpu.config import HnswConfig, SlimConfig
from hnsw_slim_tpu.index.hnsw import HnswIndex
from hnsw_slim_tpu.index.slim import HnswSlimIndex
from hnsw_slim_tpu.persist import checkpoint, patch
from hnsw_slim_tpu.utils.data import clustered


def _slim(base, seed=31):
    hnsw = HnswIndex(HnswConfig(M=12, ef_construction=64), max_batch=512)
    hnsw.build(base)
    return HnswSlimIndex.from_hnsw(hnsw, SlimConfig.from_ratios())


def test_save_load_roundtrip(tmp_path):
    base, queries = clustered(n=2000, dim=16, n_queries=20, seed=31)
    slim = _slim(base)
    p = tmp_path / "idx.npz"
    checkpoint.save_slim(p, slim)
    loaded = checkpoint.load_slim(p)
    # byte-exact graph arrays and identical search results
    np.testing.assert_array_equal(np.asarray(slim.graph.nbr), np.asarray(loaded.graph.nbr))
    np.testing.assert_array_equal(
        np.asarray(slim.graph.lvl_off), np.asarray(loaded.graph.lvl_off)
    )
    d1, i1 = slim.search(queries, k=5)
    d2, i2 = loaded.search(queries, k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2)


def test_hnsw_save_load(tmp_path):
    base, queries = clustered(n=1500, dim=16, n_queries=10, seed=32)
    hnsw = HnswIndex(HnswConfig(M=12, ef_construction=64))
    hnsw.build(base)
    p = tmp_path / "h.npz"
    checkpoint.save_hnsw(p, hnsw)
    loaded = checkpoint.load_hnsw(p)
    _, i1 = hnsw.search(queries, k=5)
    _, i2 = loaded.search(queries, k=5)
    np.testing.assert_array_equal(i1, i2)


def test_diff_patch_roundtrip():
    base, _ = clustered(n=2200, dim=16, n_queries=0, seed=33)
    old = _slim(base[:2000])
    new = _slim(base)  # rebuild with 200 more points (re-pruned whole graph)

    changed_old, changed_new = patch.compute_diff(old.graph, new.graph)
    assert changed_new == list(range(2000, 2200))
    assert 0 < len(changed_old) <= 2000

    writer = patch.PatchWriter(
        new.graph, changed_old, changed_new, vectors=np.asarray(new.vectors)
    )
    chunks = []
    while True:
        blob, finished = writer.next_chunk(limit=64 * 1024)
        chunks.append(blob)
        if finished:
            break
    assert len(chunks) >= 1

    g = old.graph
    vecs = np.asarray(old.vectors)
    for blob in chunks:
        g, vecs = patch.apply_patch(g, blob, vecs)

    # patched graph must logically equal the rebuilt graph
    a, b = patch.to_np(g), patch.to_np(new.graph)
    assert len(a["level"]) == len(b["level"])
    np.testing.assert_array_equal(a["level"], b["level"])
    for v in range(len(a["level"])):
        sa = patch.node_slices(a, v)
        sb = patch.node_slices(b, v)
        assert len(sa) == len(sb), v
        for x, y in zip(sa, sb):
            np.testing.assert_array_equal(x, y)
    np.testing.assert_allclose(vecs, np.asarray(new.vectors))

    # idempotence: re-applying the final chunk changes nothing
    g2, _ = patch.apply_patch(g, chunks[-1], vecs)
    np.testing.assert_array_equal(
        np.asarray(g2.lvl_off), np.asarray(g.lvl_off)
    )


def test_slimq_save_load(tmp_path):
    from hnsw_slim_tpu.config import QuantConfig
    from hnsw_slim_tpu.index.slimq import HnswSlimQIndex

    base, queries = clustered(n=1500, dim=32, n_queries=10, seed=34)
    idx = HnswSlimQIndex.build(
        base, HnswConfig(M=12, ef_construction=64),
        quant_cfg=QuantConfig(total_bits=4),
    )
    p = tmp_path / "q.npz"
    checkpoint.save_slimq(p, idx)
    loaded = checkpoint.load_slimq(p)
    loaded.set_dataset(base)  # dataset is external (LEANN-style)
    idx.set_ef(64)
    loaded.set_ef(64)
    d1, i1 = idx.search(queries, k=5)
    d2, i2 = loaded.search(queries, k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5)
