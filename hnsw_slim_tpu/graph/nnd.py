"""NN-descent kNN-graph construction — the TPU-native build path.

The reference builds its graph by sequential locked inserts
(hnswalg.h:1248-1376). On TPU that shape is wrong: the idiomatic equivalent
(cf. GPU CAGRA / GGNN) is to build an approximate kNN graph with NN-descent —
every round is batched gathers + one fused distance einsum + one multi-operand
sort across ALL nodes at once — then prune it into a navigable HNSW hierarchy
(graph/build.py knn_to_level_graph).

Each round, every node scores:
  * forward samples: random neighbors-of-neighbors (2-hop),
  * reverse samples: nodes that list it as a neighbor (computed with one
    device-wide sort over all edges),
and merges them into its sorted top-K list. Converges in ~8-15 rounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import distance

INF = jnp.float32(jnp.inf)


def _chunked_cand_merge(vectors, vn, ids, dists, cand, chunk, metric, precision):
    """Score candidates [N, C] against each node's own vector and merge into
    the sorted top-K state. Runs in node chunks to bound the [chunk, C, d]
    gather. Returns (ids, dists, n_changed)."""
    n, k = ids.shape
    c = cand.shape[1]
    n_chunks = n // chunk

    def body(i, carry):
        ids_a, d_a, changed = carry
        s = i * chunk
        idc = lax.dynamic_slice_in_dim(ids_a, s, chunk, 0)
        dc = lax.dynamic_slice_in_dim(d_a, s, chunk, 0)
        cc = lax.dynamic_slice_in_dim(cand, s, chunk, 0)
        q = lax.dynamic_slice_in_dim(vectors, s, chunk, 0)
        qn = lax.dynamic_slice_in_dim(vn, s, chunk, 0)

        self_ids = s + lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        # dedup: drop self hits, in-candidate duplicates, already-known ids
        sc = jnp.sort(jnp.where(cc < 0, jnp.int32(2**30), cc), axis=1)
        dup_in = jnp.concatenate(
            [jnp.zeros((chunk, 1), bool), sc[:, 1:] == sc[:, :-1]], axis=1
        )
        sc = jnp.where(dup_in, -1, jnp.where(sc == 2**30, -1, sc))
        known = jnp.any(sc[:, :, None] == idc[:, None, :], axis=2)
        valid = (sc >= 0) & ~known & (sc != self_ids)

        safe = jnp.maximum(sc, 0)
        d = distance.gathered_dist(
            q, vectors[safe], metric, qn=qn, vn=vn[safe], precision=precision
        )
        d = jnp.where(valid, d, INF)

        cat_d = jnp.concatenate([dc, d], axis=1)
        cat_i = jnp.concatenate([idc, jnp.where(valid, sc, -1)], axis=1)
        sd, si = lax.sort((cat_d, cat_i), dimension=1, num_keys=1)
        sd, si = sd[:, :k], si[:, :k]
        changed += jnp.sum((si != idc).astype(jnp.int32))
        ids_a = lax.dynamic_update_slice_in_dim(ids_a, si, s, 0)
        d_a = lax.dynamic_update_slice_in_dim(d_a, sd, s, 0)
        return ids_a, d_a, changed

    return lax.fori_loop(0, n_chunks, body, (ids, dists, jnp.int32(0)))


@functools.partial(
    jax.jit, static_argnames=("s_fwd", "r_rev", "chunk", "metric")
)
def nnd_round(
    key,
    ids: jnp.ndarray,  # i32[N, K] sorted by dist
    dists: jnp.ndarray,  # f32[N, K]
    vectors: jnp.ndarray,
    vn: jnp.ndarray,
    n_valid: jnp.ndarray,  # real node count (rows >= n_valid are padding)
    *,
    s_fwd: int,
    r_rev: int,
    chunk: int,
    metric: str,
):
    n, k = ids.shape
    k1, k2 = jax.random.split(key)

    # forward: 2-hop samples adj[adj[v, r1], r2] via two scalar gathers
    r1 = jax.random.randint(k1, (n, s_fwd), 0, k)
    r2 = jax.random.randint(k2, (n, s_fwd), 0, k)
    mid = jnp.take_along_axis(ids, r1, axis=1)  # [n, s]
    flat = ids.reshape(-1)
    fwd = jnp.where(
        mid >= 0, flat[jnp.maximum(mid, 0) * k + r2], -1
    )

    # reverse: one global sort of all (target, source) edges, keep first
    # r_rev sources per target
    tgt = ids.reshape(-1)
    src = jnp.repeat(
        lax.broadcasted_iota(jnp.int32, (n, 1), 0), k, axis=1
    ).reshape(-1)
    tgt_s = jnp.where(tgt >= 0, tgt, n)
    st, ss = lax.sort((tgt_s, src), dimension=0, num_keys=1)
    iota = lax.broadcasted_iota(jnp.int32, (n * k, 1), 0)[:, 0]
    first = jnp.concatenate([jnp.ones((1,), bool), st[1:] != st[:-1]])
    runstart = lax.associative_scan(jnp.maximum, jnp.where(first, iota, 0))
    rank = iota - runstart
    keep = (rank < r_rev) & (st < n) & (ss < n_valid)  # padded rows never leak
    rev = jnp.full((n + 1, r_rev), -1, jnp.int32)
    rev = rev.at[jnp.where(keep, st, n), jnp.where(keep, rank, 0)].set(
        jnp.where(keep, ss, -1)
    )[:n]

    cand = jnp.concatenate([fwd, rev], axis=1)
    ids, dists, changed = _chunked_cand_merge(
        vectors, vn, ids, dists, cand, chunk, metric,
        jax.lax.Precision.DEFAULT,
    )
    return ids, dists, changed


@functools.partial(jax.jit, static_argnames=("k", "chunk", "metric"))
def nnd_init(key, vectors, vn, n_valid, *, k: int, chunk: int, metric: str):
    """Random initial kNN lists (self-free), scored and sorted."""
    n = vectors.shape[0]
    ids = jax.random.randint(key, (n, k), 0, n_valid, dtype=jnp.int32)
    init_i = jnp.full((n, k), -1, jnp.int32)
    init_d = jnp.full((n, k), INF)
    ids_out, d_out, _ = _chunked_cand_merge(
        vectors, vn, init_i, init_d, ids, chunk, metric,
        jax.lax.Precision.DEFAULT,
    )
    return ids_out, d_out


def nn_descent(
    vectors: jnp.ndarray,
    vn: jnp.ndarray,
    k: int = 64,
    rounds: int = 15,
    s_fwd: int | None = None,
    r_rev: int | None = None,
    chunk: int = 8192,
    metric: str = "l2",
    seed: int = 0,
    min_change_frac: float = 0.001,
    verbose: bool = False,
):
    """Approximate kNN graph: (ids i32[N, K], dists f32[N, K]) sorted asc.

    N is padded internally to a multiple of `chunk`; padded rows are
    self-contained junk and are dropped before returning.
    """
    n = vectors.shape[0]
    npad = -(-n // chunk) * chunk
    if npad != n:
        pad = jnp.broadcast_to(vectors[:1], (npad - n, vectors.shape[1]))
        vectors = jnp.concatenate([vectors, pad])
        vn = jnp.concatenate([vn, jnp.broadcast_to(vn[:1], (npad - n,))])
    s_fwd = s_fwd or k
    r_rev = r_rev or k // 2
    key = jax.random.PRNGKey(seed)
    nv = jnp.int32(n)
    ids, dists = nnd_init(key, vectors, vn, nv, k=k, chunk=chunk, metric=metric)
    for r in range(rounds):
        key, sub = jax.random.split(key)
        ids, dists, changed = nnd_round(
            sub, ids, dists, vectors, vn, nv,
            s_fwd=s_fwd, r_rev=r_rev, chunk=chunk, metric=metric,
        )
        c = int(changed)
        if verbose:
            print(f"  nnd round {r}: {c} updates")
        if c < min_change_frac * n * k:
            break
    return ids[:n], dists[:n]
