"""Bisect the beam-search per-iteration cost on the real chip at 1M scale.

Builds stripped variants of the beam body (fetch-only / +gather / +score /
full merge) inside the same fixed-trip while_loop and times each, so the
residual per-iteration overhead is attributable (VERDICT round-1 weak #3:
the engine is iteration-bound and no accounting was emitted).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_search.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from hnsw_slim_tpu.graph.import_ref import slim_index_from_ref
    from hnsw_slim_tpu.utils.data import clustered

    import os as _os
    N, DIM, B = 1_000_000, 128, 1024
    EF = int(_os.environ.get("PS_EF", 64))
    POP = int(_os.environ.get("PS_POP", 4))
    ITERS = int(_os.environ.get("PS_ITERS", 44))
    CW_ENV = int(_os.environ.get("PS_CW", 0))
    base, queries = clustered(N, DIM, n_queries=B, n_clusters=N // 1000, seed=7)
    g = "/root/repo/.bench_cache/ref_1000000_128_1024_v2.slimgraph"
    if not os.path.exists(g):
        g = "/root/repo/.bench_cache/ref_1000000_128_1024_v3.slimgraph"
    idx = slim_index_from_ref(g, base)
    idx.densify_level0()
    dense0 = idx.dense0                      # i32[N, cap0]
    vectors = idx.vectors                    # f32[N, D]
    W = dense0.shape[1]
    q = jnp.asarray(queries)
    qn = jnp.sum(q * q, axis=1)

    cw = CW_ENV or max(2 * EF, 128)
    print(f"cap0={W} pop={POP} cw={cw} iters={ITERS}", flush=True)

    def mk(level):
        """level: 0 fetch, 1 +gather, 2 +score, 3 +sorts (full body)."""

        def body_of(dense0, vectors, q, qn):
          def body(carry, _):
              buf_d, buf_id, buf_chk, acc = carry
              unchk = (buf_chk == 0) & (buf_id >= 0)
              rank = jnp.cumsum(unchk.astype(jnp.int32), axis=1) - 1
              selmask = unchk & (rank < POP)
              buf_chk = jnp.where(selmask, 1, buf_chk)
              pops = jnp.stack([
                  jnp.max(jnp.where(selmask & (rank == j), buf_id, -1), axis=1)
                  for j in range(POP)
              ], axis=1)
              ids = jnp.concatenate([
                  jnp.where(pops[:, j:j+1] >= 0, dense0[jnp.maximum(pops[:, j], 0)], -1)
                  for j in range(POP)
              ], axis=1)
              if level == 0:
                  return (buf_d, buf_id, buf_chk, acc + jnp.sum(ids)), None
              dup = jnp.any(ids[:, :, None] == buf_id[:, None, :], axis=2)
              if level == 1:  # dup-check only
                  return (buf_d, buf_id, buf_chk,
                          acc + jnp.sum(dup.astype(jnp.int32))), None
              cand_ids = jnp.where((ids >= 0) & ~dup, ids, jnp.int32(2**30))
              cand_sorted = lax.sort(cand_ids, dimension=1)[:, :cw]
              cand = cand_sorted < 2**30
              safe = jnp.where(cand, cand_sorted, 0)
              if level == 2:  # + compaction sort
                  return (buf_d, buf_id, buf_chk, acc + jnp.sum(safe)), None
              vecs = vectors[safe]
              if level == 3:  # + vector row gather
                  return (buf_d, buf_id, buf_chk,
                          acc + jnp.sum(vecs[:, :, 0].astype(jnp.int32))), None
              d = (qn[:, None] + jnp.sum(vecs * vecs, -1)
                   - 2.0 * jnp.einsum("bd,bed->be", q, vecs,
                                      preferred_element_type=jnp.float32,
                                      precision=lax.Precision.HIGHEST))
              d = jnp.where(cand, d, jnp.inf)
              if level == 4:  # + score
                  return (buf_d, buf_id, buf_chk,
                          acc + jnp.sum(jnp.min(d, 1).astype(jnp.int32))), None
              cat_d = jnp.concatenate([buf_d, d], axis=1)
              cat_i = jnp.concatenate([buf_id, jnp.where(cand, cand_sorted, -1)], 1)
              cat_c = jnp.concatenate([buf_chk, jnp.zeros_like(cand_sorted)], 1)
              sd, si, sc = lax.sort((cat_d, cat_i, cat_c), dimension=1, num_keys=1)
              return (sd[:, :EF], si[:, :EF], sc[:, :EF], acc), None

          return body

        @jax.jit
        def run(dense0, vectors, q, qn, seed_id, seed_d):
            # big arrays passed as ARGUMENTS (captured constants get embedded
            # in the HLO and blow the remote compiler's request size limit)
            buf_d = jnp.full((B, EF), jnp.inf).at[:, 0].set(seed_d)
            buf_id = jnp.full((B, EF), -1, jnp.int32).at[:, 0].set(seed_id)
            buf_chk = jnp.zeros((B, EF), jnp.int32)
            carry, _ = lax.scan(body_of(dense0, vectors, q, qn),
                                (buf_d, buf_id, buf_chk, jnp.int32(0)),
                                None, length=ITERS)
            return carry[3] + carry[1].sum()

        return run

    seed_id = np.random.default_rng(0).integers(0, N, B).astype(np.int32)
    seed_d = np.zeros(B, np.float32)
    names = ["fetch", "+dup", "+csort", "+vgather", "+score", "full-body"]
    prev = 0.0
    for lvl in range(6):
        run = mk(lvl)
        out = run(dense0, vectors, q, qn, seed_id, seed_d)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3):
            out = run(dense0, vectors, q, qn, seed_id, seed_d)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 3
        print(f"{names[lvl]:24s} {dt*1e3:8.1f} ms total  "
              f"{dt/ITERS*1e6:8.0f} us/iter  (+{(dt-prev)/ITERS*1e6:.0f} us)",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
