"""Measure the cross-iteration re-score rate of the beam at 1M.

The r3 gather microbench (exp_gather.py) shows the candidate vector gather
is transaction-bound (~10 ns/row regardless of row bytes), so the only way
to speed it up is to gather FEWER rows. The buffer dedup already skips
candidates currently resident in the top-ef buffer, but a node that was
scored and never inserted (or evicted) is re-scored on every re-proposal —
the cost the reference's epoch-tagged VisitedList avoids
(visited_list_pool.h:10-77). This measures how many scored rows per query
are repeats: the ceiling for a history-ring dedup.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_revisit.py
Env: RV_EF (384), RV_POP (16), RV_CW (128), RV_ITERS (40), RV_B (256).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EF = int(os.environ.get("RV_EF", 384))
POP = int(os.environ.get("RV_POP", 16))
CW = int(os.environ.get("RV_CW", 128))
ITERS = int(os.environ.get("RV_ITERS", 40))
B = int(os.environ.get("RV_B", 256))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from hnsw_slim_tpu.graph.import_ref import slim_index_from_ref
    from hnsw_slim_tpu.graph import search as S
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
    # NB: big arrays are jit ARGUMENTS everywhere below — a closed-over
    # device array is embedded as a program constant and must be shipped
    # to the remote compiler (512 MB request: exp_gather's HTTP 413)
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
            cur, curdist = S.greedy_level_scored(
                f_l, sc, cur, curdist, always)
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
            pops = jnp.stack(
                [jnp.max(jnp.where(selmask & (rank == j), buf_id, -1), axis=1)
                 for j in range(POP)], axis=1)
            ids = jnp.concatenate(
                [jnp.where(pops[:, j:j+1] >= 0,
                           fetch(jnp.maximum(pops[:, j], 0)), -1)
                 for j in range(POP)], axis=1)
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
            return (st2, qdone), jnp.where(cand, cs, -1)  # scored ids/iter

        (st, done), scored = lax.scan(body, (state, jnp.zeros((B,), bool)),
                                      None, length=ITERS)
        return st, done, scored  # scored: [ITERS, B, CW]

    st, done, scored = run(state, vectors, dense0, q, qn)
    scored = np.asarray(scored)  # [ITERS, B, CW]
    done = np.asarray(done)
    total = 0
    uniq = 0
    # revisit temporal distance: how many iterations since the previous
    # score of the same id — a shift-register ring of H recent iterations
    # catches revisits with distance <= H without any TPU scatter
    dist_hist = np.zeros(ITERS + 1, np.int64)
    for b in range(B):
        flat = scored[:, b, :]  # [ITERS, CW]
        ids = flat.ravel()
        ok = ids >= 0
        ids_v = ids[ok]
        total += len(ids_v)
        uniq += len(np.unique(ids_v))
        it_of = np.repeat(np.arange(flat.shape[0]), flat.shape[1])[ok]
        order = np.lexsort((it_of, ids_v))
        sid, sit = ids_v[order], it_of[order]
        same = sid[1:] == sid[:-1]
        d = (sit[1:] - sit[:-1])[same]
        np.add.at(dist_hist, np.minimum(d, ITERS), 1)
    rev_total = dist_hist.sum()
    if rev_total:
        c = np.cumsum(dist_hist) / rev_total
        marks = {h: round(float(c[h]), 3) for h in (1, 2, 4, 8, 16)
                 if h < len(c)}
        print(f"revisit distance CDF (frac of revisits within h iters): "
              f"{marks}", flush=True)
    print(f"ef={EF} pop={POP} cw={CW} iters={ITERS} b={B} "
          f"done={done.mean():.2f}", flush=True)
    print(f"scored rows/query: {total/B:.0f}  unique: {uniq/B:.0f}  "
          f"revisit rate: {1 - uniq/max(total,1):.3f}", flush=True)


if __name__ == "__main__":
    main()
