"""Per-call cost of the reverse-connect overflow prune (build hot path).

The 1M insertion build spends ~236 s in "rev"; each level's overflow prune
is 1-3 canonical [2048, cap_l+64] prune_batch calls, and batch logs suggest
~0.35-0.45 s per call — ~100x its compute. Bisects: dispatch+sync wall of
prune_batch at canonical shapes, the same under a no-sync chain, and the
host-side numpy grouping at realistic pair counts.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_prune.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D = 1_000_000, 128
B = int(os.environ.get("XPR_B", 2048))
CAPL = int(os.environ.get("XPR_CAP", 60))
WNEW = 64


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from hnsw_slim_tpu.graph.heuristic import prune_batch

    rng = np.random.default_rng(0)
    vecs = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    vn = jnp.sum(vecs * vecs, axis=1)
    jax.block_until_ready(vn)

    W = CAPL + WNEW
    cand = rng.integers(0, N, size=(B, W)).astype(np.int32)
    cand[:, CAPL + 8:] = -1  # realistic: ~8 new edges
    base = rng.integers(0, N, size=(B,)).astype(np.int32)

    def call():
        sel, _ = prune_batch(
            vecs, vn, jnp.asarray(base), jnp.asarray(cand),
            jnp.asarray(cand >= 0), M=CAPL, keep_all_under_m=False,
            metric="l2", out_width=CAPL,
        )
        return np.asarray(sel)

    call()  # compile
    t0 = time.perf_counter()
    for _ in range(5):
        call()
    print(f"prune_batch+sync   {(time.perf_counter()-t0)/5*1e3:8.1f} ms",
          flush=True)

    # without the per-call host sync (device chain, one sync at the end)
    base_d, cand_d, val_d = (jnp.asarray(base), jnp.asarray(cand),
                             jnp.asarray(cand >= 0))

    def nosync():
        sel, _ = prune_batch(
            vecs, vn, base_d, cand_d, val_d, M=CAPL,
            keep_all_under_m=False, metric="l2", out_width=CAPL,
        )
        return sel

    nosync().block_until_ready()
    t0 = time.perf_counter()
    outs = [nosync() for _ in range(5)]
    jax.block_until_ready(outs)
    print(f"prune_batch chain  {(time.perf_counter()-t0)/5*1e3:8.1f} ms",
          flush=True)

    # host numpy grouping at realistic pair counts (8192 inserts x 24 edges)
    P = 8192 * 24
    pu = rng.integers(0, N, size=P)
    pp = np.repeat(np.arange(8192), 24)
    t0 = time.perf_counter()
    for _ in range(5):
        order = np.argsort(pu, kind="stable")
        us, ps = pu[order], pp[order]
        uniq, starts, counts = np.unique(us, return_index=True,
                                         return_counts=True)
        adjl = np.full((N, CAPL), -1, np.int32)
        existing = adjl[uniq]
        ne = (existing >= 0).sum(axis=1)
    print(f"host grouping      {(time.perf_counter()-t0)/5*1e3:8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
