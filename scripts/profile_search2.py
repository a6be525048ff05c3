"""Bisect the CURRENT beam-iteration body at the headline point (r4).

profile_search.py predates the round-3 kernel (it times the full-sort
merge and full-width dup); this version mirrors graph/search.py
beam_level_scored exactly — multi-pop one-hot selection, one fused row
gather, candidate compaction sort + 2*cw-window buffer dedup + final
pack sort, bf-free exact scoring, bitonic merge — and times cumulative
prefixes of the body inside one fixed-trip scan, so each phase's
per-iteration cost is attributable at the exact headline shapes
(B=1024, P=512 phys / ef=384, pop=16, scan=128, dense0 cap=64).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_search2.py
Env: PS_EF (phys buffer, default 512), PS_POP, PS_CW, PS_ITERS, PS_B.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("PS_B", 1024))
EF = int(os.environ.get("PS_EF", 512))
POP = int(os.environ.get("PS_POP", 16))
CW = int(os.environ.get("PS_CW", 128))
ITERS = int(os.environ.get("PS_ITERS", 30))
BIG = 2**30


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from hnsw_slim_tpu.graph.import_ref import slim_index_from_ref
    from hnsw_slim_tpu.graph.search import BeamState, merge_sorted
    from hnsw_slim_tpu.utils.data import clustered

    N, DIM = 1_000_000, 128
    base, queries = clustered(N, DIM, n_queries=B, n_clusters=N // 1000,
                              seed=7, scale=0.3)
    g = "/root/repo/.bench_cache/ref_1000000_128_1024_v3.slimgraph"
    idx = slim_index_from_ref(g, base)
    idx.densify_level0()
    dense0 = idx.dense0
    vectors = idx.vectors
    W = int(dense0.shape[1])
    q = jnp.asarray(queries)
    qn = jnp.sum(q * q, axis=1)
    EW = POP * W
    print(f"B={B} P={EF} pop={POP} W={W} EW={EW} cw={CW} iters={ITERS}",
          flush=True)

    def mk(level):
        def body_of(dense0, vectors, q, qn):
            def body(carry, _):
                # the buffer stays FULL and rolls one lane per iteration so
                # every phase touches fresh data every iteration (a seeded
                # near-empty buffer converges to an empty frontier in one
                # step without the merge feeding back, and XLA elides the
                # whole prefix — the bug in profile_search.py's levels)
                buf_d, buf_id, buf_chk, acc = carry
                unchk = (buf_chk == 0) & (buf_id >= 0)
                rank = jnp.cumsum(unchk.astype(jnp.int32), axis=1) - 1
                selmask = unchk & (rank < POP)
                pops = jnp.stack([
                    jnp.max(jnp.where(selmask & (rank == j), buf_id, -1), axis=1)
                    for j in range(POP)
                ], axis=1)

                def out(extra):
                    # roll the buffer so the next iteration's inputs differ
                    # (defeats CSE/hoisting); chk stays 0 = always-full
                    # frontier, the worst-case per-iteration cost
                    return ((jnp.roll(buf_d, 1, axis=1),
                             jnp.roll(buf_id, 1, axis=1), buf_chk,
                             acc + extra), None)

                if level == 0:  # pop selection only
                    return out(jnp.sum(pops))
                idsf = dense0[jnp.maximum(pops, 0).reshape(B * POP)]
                ids = jnp.where((pops >= 0)[:, :, None],
                                idsf.reshape(B, POP, W), -1).reshape(B, EW)
                if level == 1:  # + row fetch
                    return out(jnp.sum(ids))
                valid = ids >= 0
                cs0 = lax.sort(jnp.where(valid, ids, jnp.int32(BIG)),
                               dimension=1)
                dup0 = jnp.concatenate(
                    [jnp.zeros((B, 1), bool), cs0[:, 1:] == cs0[:, :-1]],
                    axis=1)
                pre = jnp.where(dup0, jnp.int32(BIG), cs0)[:, : 2 * CW]
                if level == 2:  # + compaction sort (EW lanes)
                    return out(jnp.sum(pre))
                dupb = jnp.any(pre[:, :, None] == buf_id[:, None, :], axis=2)
                pre2 = jnp.where(dupb, jnp.int32(BIG), pre)
                if level == 3:  # + window buffer-dedup broadcast
                    return out(jnp.sum(pre2))
                cand_sorted = lax.sort(pre2, dimension=1)[:, :CW]
                cand = cand_sorted < BIG
                safe = jnp.where(cand, cand_sorted, 0)
                if level == 4:  # + final pack sort (2cw lanes)
                    return out(jnp.sum(safe))
                vecs = vectors[safe]
                if level == 5:  # + vector row gather
                    return out(jnp.sum(vecs[:, :, 0].astype(jnp.int32)))
                d = (qn[:, None] + jnp.sum(vecs * vecs, -1)
                     - 2.0 * jnp.einsum("bd,bed->be", q, vecs,
                                        preferred_element_type=jnp.float32,
                                        precision=lax.Precision.HIGHEST))
                d = jnp.where(cand, d, jnp.inf)
                if level == 6:  # + score
                    return out(jnp.sum(jnp.min(d, 1).astype(jnp.int32)))
                st = merge_sorted(BeamState(buf_d, buf_id, buf_chk), d,
                                  jnp.where(cand, cand_sorted, -1))
                return (st.buf_d, st.buf_id, st.buf_chk, acc), None

            return body

        @jax.jit
        def run(dense0, vectors, q, qn, buf_id0, buf_d0, salt):
            # salt defeats any runtime-level memoization of identical
            # (executable, args) dispatches (prefix levels measured an
            # impossible 2 us/iter with constant args)
            buf_d = buf_d0
            buf_id = jnp.remainder(buf_id0 + salt, jnp.int32(N))
            buf_chk = jnp.zeros((B, EF), jnp.int32)
            carry, _ = lax.scan(body_of(dense0, vectors, q, qn),
                                (buf_d, buf_id, buf_chk, jnp.int32(0)),
                                None, length=ITERS)
            return carry[3] + carry[1].sum()

        return run

    rng = np.random.default_rng(0)
    seed_id = jnp.asarray(rng.integers(0, N, (B, EF)).astype(np.int32))
    seed_d = jnp.asarray(
        np.sort(rng.random((B, EF)).astype(np.float32), axis=1)
    )
    names = ["pops", "+fetch", "+csort", "+bufdedup", "+packsort",
             "+vgather", "+score", "full-body"]
    prev = 0.0
    for lvl in range(8):
        run = mk(lvl)
        t0 = time.perf_counter()
        out = run(dense0, vectors, q, qn, seed_id, seed_d, jnp.int32(0))
        out.block_until_ready()
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for it in range(3):
            out = run(dense0, vectors, q, qn, seed_id, seed_d,
                      jnp.int32(it + 1))
            out.block_until_ready()
        dt = (time.perf_counter() - t0) / 3
        print(f"{names[lvl]:12s} {dt*1e3:8.1f} ms total  "
              f"{dt/ITERS*1e6:8.0f} us/iter  (+{(dt-prev)/ITERS*1e6:.0f} us)"
              f"  [compile {tc:.0f}s]", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
