"""Distance-vs-bound distribution of scored candidates at the 0.95 point.

Decides whether an estimate-first filter (cheap per-edge codes -> exact
gather only for candidates whose estimate beats bound*(1+margin)) can cut
the transaction-bound vector gather (exp_gather: ~11-13 ns/row regardless
of bytes; profile_search3: the gather is 53% of the iteration). If most
scored candidates land within ~1.25x of the termination bound, no honest
estimator can filter them and the idea dies here.

Reports, per iteration bucket and overall: fraction of scored candidate
rows with d > bound * (1+m) for m in {0.0, 0.1, 0.25, 0.5, 1.0} (bound =
the query's current ef_eff-th buffer distance at scoring time; inf bounds
before the buffer fills count as "cannot filter").

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_candmargin.py
Env: CM_EF (384), CM_POP (16), CM_CW (128), CM_ITERS (40), CM_B (256).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EF = int(os.environ.get("CM_EF", 384))
POP = int(os.environ.get("CM_POP", 16))
CW = int(os.environ.get("CM_CW", 128))
ITERS = int(os.environ.get("CM_ITERS", 40))
B = int(os.environ.get("CM_B", 256))
MARGINS = (0.0, 0.1, 0.25, 0.5, 1.0)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from hnsw_slim_tpu.graph import search as S
    from hnsw_slim_tpu.graph.import_ref import slim_index_from_ref
    from hnsw_slim_tpu.ops import distance
    from hnsw_slim_tpu.utils.data import clustered

    N, DIM = 1_000_000, 128
    base, queries = clustered(N, DIM, n_queries=B, n_clusters=N // 1000,
                              seed=7, scale=0.3)
    g = "/root/repo/.bench_cache/ref_1000000_128_1024_v3.slimgraph"
    idx = slim_index_from_ref(g, base)
    idx.densify_level0()
    vectors, vn, dense0 = idx.vectors, idx.vn, idx.dense0
    q = jnp.asarray(queries)
    qn = distance.sq_norms(q)
    gg = idx.graph
    ef_pad = 1 << (EF - 1).bit_length()

    @jax.jit
    def descend(nbr, lvl_off, vectors, vn, q, qn):
        sc = S.make_exact_scorer(vectors, None, q, qn, idx.metric, None)
        cur = jnp.broadcast_to(gg.entry.astype(jnp.int32), (B,))
        curdist = distance.gathered_dist(
            q, vectors[cur][:, None, :], idx.metric, qn=qn,
            vn=vn[cur][:, None], precision=None)[:, 0]
        always = jnp.ones((B,), bool)
        for l in range(gg.max_level, 0, -1):
            f_l = S.make_chal_fetch(nbr, lvl_off, l, gg.cap)
            cur, curdist = S.greedy_level_scored(f_l, sc, cur, curdist, always)
        return cur, curdist

    cur, curdist = descend(gg.nbr, gg.lvl_off, vectors, vn, q, qn)
    state = S.beam_init(cur, curdist, ef_pad)

    @jax.jit
    def run(state, vectors, dense0, q, qn):
        pos = lax.broadcasted_iota(jnp.int32, (B, ef_pad), 1)
        ef_eff = jnp.int32(EF)
        fetch = S.make_dense_fetch(dense0)
        score = S.make_exact_scorer(vectors, None, q, qn, idx.metric, None)

        def body(carry, _):
            st, done = carry
            buf_d, buf_id, buf_chk = st
            unchk = (buf_chk == 0) & (buf_id >= 0) & (pos < ef_eff)
            bound = jnp.take_along_axis(
                buf_d, jnp.broadcast_to(ef_eff - 1, (B,))[:, None], axis=1
            )[:, 0]
            rank = jnp.cumsum(unchk.astype(jnp.int32), axis=1) - 1
            first = unchk & (rank == 0)
            has = jnp.any(first, axis=1)
            sel_d = jnp.max(jnp.where(first, buf_d, -S.INF), axis=1)
            qdone = done | ~has | (sel_d > bound)
            selmask = unchk & (rank < POP) & (buf_d <= bound[:, None]) & (
                ~qdone[:, None])
            buf_chk = jnp.where(selmask, 1, buf_chk)
            popkey = jnp.where(selmask, rank, jnp.int32(2**30))
            sk, sv = lax.sort((popkey, buf_id), dimension=1, num_keys=1)
            pops = jnp.where(sk[:, :POP] < 2**30, sv[:, :POP], -1)
            idsf = fetch(jnp.maximum(pops, 0).reshape(B * POP))
            w = idsf.shape[1]
            ids = jnp.where((pops >= 0)[:, :, None],
                            idsf.reshape(B, POP, w), -1).reshape(B, POP * w)
            valid = (ids >= 0) & ~qdone[:, None]
            dup = jnp.any(ids[:, :, None] == buf_id[:, None, :], axis=2)
            cand_ids = jnp.where(valid & ~dup, ids, jnp.int32(2**30))
            cs = lax.sort(cand_ids, dimension=1)
            dup2 = jnp.concatenate(
                [jnp.zeros((B, 1), bool), cs[:, 1:] == cs[:, :-1]], axis=1)
            cs = jnp.where(dup2, jnp.int32(2**30), cs)[:, :CW]
            cand = cs < 2**30
            safe = jnp.where(cand, cs, 0)
            d = score(safe, cand)
            st2 = S.merge_sorted(
                S.BeamState(buf_d, buf_id, buf_chk), d,
                jnp.where(cand, cs, -1))
            # stats: scored rows and how far beyond the CURRENT bound
            scored = cand
            n_scored = jnp.sum(scored, axis=1)
            fracs = []
            for m in MARGINS:
                far = scored & (d > bound[:, None] * (1.0 + m)) & (
                    bound[:, None] < S.INF)
                fracs.append(jnp.sum(far, axis=1))
            return (st2, qdone), (n_scored, jnp.stack(fracs, 0))

        (st, done), (ns, far) = lax.scan(
            body, (state, jnp.zeros((B,), bool)), None, length=ITERS)
        return ns, far  # [ITERS, B], [ITERS, len(M), B]

    ns, far = run(state, vectors, dense0, q, qn)
    ns = np.asarray(ns).astype(np.int64)          # [I, B]
    far = np.asarray(far).astype(np.int64)        # [I, M, B]
    tot = ns.sum()
    print(f"ef={EF} pop={POP} cw={CW} iters={ITERS} b={B} "
          f"scored_rows={tot} (/query {tot/B:.0f})", flush=True)
    for mi, m in enumerate(MARGINS):
        f = far[:, mi].sum() / max(tot, 1)
        print(f"  frac(d > bound*{1+m:.2f}) = {f:.3f}", flush=True)
    # phase split: early (first 8 iters) vs late
    e = ns[:8].sum()
    for mi, m in enumerate(MARGINS):
        fe = far[:8, mi].sum() / max(e, 1)
        fl = far[8:, mi].sum() / max(tot - e, 1)
        print(f"  m={m:>4}: early={fe:.3f} late={fl:.3f}", flush=True)


if __name__ == "__main__":
    main()
