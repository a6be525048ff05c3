"""Incremental slim conversion == full convertFromHNSW, across updates.

The incremental path (graph/incremental.py) must produce bit-identical CHAL
content to a fresh convert_to_slim over the same vanilla graph — that is its
whole contract (the reference always does the full pass,
hnswalg_slim.h:1110-1424)."""

import numpy as np
import pytest

from hnsw_slim_tpu.config import HnswConfig, SlimConfig
from hnsw_slim_tpu.graph.incremental import IncrementalSlim
from hnsw_slim_tpu.graph.prune import convert_to_slim
from hnsw_slim_tpu.index.hnsw import HnswIndex
from hnsw_slim_tpu.persist.patch import _level_rows, to_np


def canon(graph):
    """Canonical per-level rows + metadata for graph equality."""
    c = to_np(graph)
    n = graph.n
    out = {"level": c["level"], "n": n, "max_level": graph.max_level}
    for l in range(graph.max_level + 1):
        cap = graph.cap0 if l == 0 else graph.cap
        out[f"rows{l}"] = _level_rows(c, l, n, cap)
    return out


def assert_same(a, b):
    ca, cb = canon(a), canon(b)
    assert ca["n"] == cb["n"]
    assert ca["max_level"] == cb["max_level"]
    np.testing.assert_array_equal(ca["level"], cb["level"])
    for l in range(a.max_level + 1):
        mism = (ca[f"rows{l}"] != cb[f"rows{l}"]).any(axis=1)
        assert not mism.any(), (
            f"level {l}: {mism.sum()} rows differ, e.g. node "
            f"{np.nonzero(mism)[0][:5]}"
        )


@pytest.fixture(scope="module")
def base_setup():
    rng = np.random.default_rng(3)
    base = rng.standard_normal((2500, 24)).astype(np.float32)
    cfg = HnswConfig(M=8, ef_construction=48, branching_factor="8", seed=5)
    idx = HnswIndex(cfg, strategy="insert", max_batch=512)
    idx.build(base)
    return idx, cfg, rng


def _full(idx, scfg):
    return convert_to_slim(
        idx.graph, idx.vectors, idx.vn, scfg, metric=idx.cfg.metric
    )


def test_full_matches_convert(base_setup):
    idx, cfg, _ = base_setup
    scfg = SlimConfig(top_M0=10, low_m0=4, top_M=6, low_m=3)
    inc = IncrementalSlim(scfg, metric=cfg.metric)
    g_inc = inc.full(
        idx.host_adj(), np.asarray(idx.levels),
        int(np.asarray(idx.graph.entry)), idx.vectors, idx.vn,
    )
    assert_same(g_inc, _full(idx, scfg))


def test_update_matches_full_reconvert(base_setup):
    idx0, cfg, rng = base_setup
    # independent copy so module-scope fixture stays pristine
    idx = HnswIndex(cfg, strategy="insert", max_batch=512)
    idx.build(np.asarray(idx0.vectors))
    scfg = SlimConfig(top_M0=10, low_m0=4, top_M=6, low_m=3)
    inc = IncrementalSlim(scfg, metric=cfg.metric)
    inc.full(
        idx.host_adj(), np.asarray(idx.levels),
        int(np.asarray(idx.graph.entry)), idx.vectors, idx.vn,
    )
    for trial in range(3):
        batch = rng.standard_normal((120, 24)).astype(np.float32)
        touched = idx.add_points(batch)
        assert len(touched) > 0
        g_inc, changed = inc.update(
            idx.host_adj(), np.asarray(idx.levels),
            int(np.asarray(idx.graph.entry)), idx.vectors, idx.vn,
            touched=touched,
        )
        g_full = _full(idx, scfg)
        assert_same(g_inc, g_full)
        # changed set covers every node whose CHAL content differs vs the
        # running state (patch membership, hnswalg_slim.h:1360-1382)
        assert len(changed) >= 120


def test_update_preserves_repair_bridges():
    """Repair edges added by full() must survive update() even when the
    touched set includes the bridge endpoints (ADVICE r2: stage 4/5 rebuilds
    rows from the union, which never contained the bridges)."""
    from hnsw_slim_tpu.graph.build import _components

    rng = np.random.default_rng(11)
    half, dim = 150, 8
    n = 2 * half
    base = np.concatenate([
        rng.standard_normal((half, dim)),
        rng.standard_normal((half, dim)) + 100.0,  # far-away island
    ]).astype(np.float32)
    # vanilla adjacency: 6-NN strictly within each cluster -> two components
    import jax.numpy as jnp

    from hnsw_slim_tpu.ops import distance

    vecs = jnp.asarray(base)
    vn = distance.sq_norms(vecs)
    rows = np.full((n, 12), -1, np.int32)
    for s in (slice(0, half), slice(half, n)):
        d = np.array(distance.pairwise_dist(vecs[s], vecs[s], "l2"))
        np.fill_diagonal(d, np.inf)
        rows[s, :6] = np.argsort(d, axis=1)[:, :6] + s.start
    levels = np.zeros(n, np.int32)

    scfg = SlimConfig(top_M0=10, low_m0=4, top_M=6, low_m=3)
    inc = IncrementalSlim(scfg, metric="l2")
    g = inc.full([rows], levels, 0, vecs, vn)
    assert len(inc.repair_keys) > 0, "repair should have bridged the island"

    def n_components(graph):
        c = to_np(graph)
        r = _level_rows(c, 0, graph.n, graph.cap0)
        return len(np.unique(_components(r)))

    assert n_components(g) == 1
    # touch every bridge endpoint (worst case: all bridge rows recomputed)
    srcs = np.unique(inc.repair_keys >> np.int64(31))
    g2, changed = inc.update([rows], levels, 0, vecs, vn, touched=srcs)
    assert n_components(g2) == 1, "update dropped the repair bridges"


def test_update_after_replace(base_setup):
    idx0, cfg, rng = base_setup
    idx = HnswIndex(cfg, strategy="insert", max_batch=512)
    idx.build(np.asarray(idx0.vectors))
    scfg = SlimConfig(top_M0=10, low_m0=4, top_M=6, low_m=3)
    inc = IncrementalSlim(scfg, metric=cfg.metric)
    inc.full(
        idx.host_adj(), np.asarray(idx.levels),
        int(np.asarray(idx.graph.entry)), idx.vectors, idx.vn,
    )
    slots = rng.choice(2500, size=60, replace=False)
    batch = rng.standard_normal((60, 24)).astype(np.float32)
    touched, level_changed = idx.replace_points(slots, batch)
    g_inc, _ = inc.update(
        idx.host_adj(), np.asarray(idx.levels),
        int(np.asarray(idx.graph.entry)), idx.vectors, idx.vn,
        touched=touched, level_changed=level_changed,
    )
    assert_same(g_inc, _full(idx, scfg))
