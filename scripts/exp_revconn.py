"""Measure device-side reverse-connect building blocks on the real chip.

The insert build's reverse-connect is host-planned today: sel D2H, numpy
sort/unique planning, fit cols/vals H2D (~9 MB/batch through a 76 MB/s
tunnel), 8-12 dispatch+sync pairs per batch (~84 ms each) — the measured
~1 s/batch median L0.scatter at 1M. This times the device-side
alternatives at steady-state shapes (batch 8192, M=30, cap 64, N=1M):

  sort_edges   : lax.sort of (u, p) edge list, E = 262144 lanes
  run_rank     : searchsorted(us, us) run-rank (graph/nnd.py trick)
  deg_gather   : deg[us] per-element gather, E lanes
  flat_scatter : adj.reshape(-1).at[u*cap+col].set(p), E unique indices
  row_rebuild  : per-target [T, cap] gather-from-ps rebuild + row scatter
  fused_append : sort+rank+deg+flat_scatter as ONE jitted program

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_revconn.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, CAP, B, M = 1_000_000, 64, 8192, 30
E = 1 << (B * M - 1).bit_length()  # 262144


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    rng = np.random.default_rng(0)
    adj = jnp.full((N, CAP), -1, jnp.int32)
    deg = jnp.zeros((N,), jnp.int32)
    jax.block_until_ready((adj, deg))
    # realistic edge list: 8192 inserters x 30 targets, clustered targets
    u_np = rng.integers(0, N, size=E).astype(np.int32)
    p_np = rng.integers(0, N, size=E).astype(np.int32)
    u_d, p_d = jnp.asarray(u_np), jnp.asarray(p_np)

    def timeit(fn, name, reps=5):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:14s} {dt*1e3:9.1f} ms", flush=True)
        return dt

    sort2 = jax.jit(lambda u, p: lax.sort((u, p), dimension=0, num_keys=1))
    timeit(lambda: sort2(u_d, p_d), "sort_edges")

    us, ps = sort2(u_d, p_d)

    @jax.jit
    def rank_of(us):
        return jnp.arange(E, dtype=jnp.int32) - jnp.searchsorted(
            us, us, side="left"
        ).astype(jnp.int32)

    timeit(lambda: rank_of(us), "run_rank")

    @jax.jit
    def deg_g(deg, us):
        return deg[us]

    timeit(lambda: deg_g(deg, us), "deg_gather")

    rank = rank_of(us)
    col = jnp.minimum(deg_g(deg, us) + rank, CAP - 1)

    @jax.jit
    def flat_scatter(adj, us, col, ps):
        flat = adj.reshape(-1)
        idx = us.astype(jnp.int64) * CAP + col.astype(jnp.int64)
        flat = flat.at[idx].set(ps, unique_indices=True)
        return flat.reshape(N, CAP)

    timeit(lambda: flat_scatter(adj, us, col, ps), "flat_scatter")

    # row-rebuild variant: unique targets (pad T), gather cur rows, overlay
    T = E  # worst case: all targets unique
    first = jnp.concatenate(
        [jnp.ones((1,), bool), us[1:] != us[:-1]]
    )

    @jax.jit
    def row_rebuild(adj, us, ps, deg):
        # compact unique target ids to the front (sort by (not-first, pos))
        key = jnp.where(first, us, jnp.int32(2**30))
        ut = lax.sort(key, dimension=0)[:T]
        start = jnp.searchsorted(us, ut, side="left").astype(jnp.int32)
        cnt = jnp.searchsorted(us, ut, side="right").astype(jnp.int32) - start
        safe_ut = jnp.where(ut < 2**30, ut, 0)
        cur = adj[safe_ut]                     # [T, CAP] row gather
        d0 = deg[safe_ut]
        j = jax.lax.broadcasted_iota(jnp.int32, (T, CAP), 1)
        srcpos = start[:, None] + (j - d0[:, None])
        hit = (j >= d0[:, None]) & (j < (d0 + cnt)[:, None])
        vals = ps[jnp.clip(srcpos, 0, E - 1)]  # [T, CAP] element gather
        rows = jnp.where(hit, vals, cur)
        return adj.at[safe_ut].set(rows)

    timeit(lambda: row_rebuild(adj, us, ps, deg), "row_rebuild")

    @jax.jit
    def fused_append(adj, deg, u, p):
        us, ps = lax.sort((u, p), dimension=0, num_keys=1)
        rank = jnp.arange(E, dtype=jnp.int32) - jnp.searchsorted(
            us, us, side="left"
        ).astype(jnp.int32)
        col = deg[us] + rank
        ok = col < CAP
        flat = adj.reshape(-1)
        idx = jnp.where(
            ok, us.astype(jnp.int64) * CAP + col.astype(jnp.int64),
            jnp.int64(N) * CAP - 1,
        )
        pv = jnp.where(ok, ps, flat[-1])
        flat = flat.at[idx].set(pv)
        new_deg = deg.at[us].add(ok.astype(jnp.int32))
        return flat.reshape(N, CAP), new_deg

    timeit(lambda: fused_append(adj, deg, u_d, p_d), "fused_append")


if __name__ == "__main__":
    main()
