"""Vectorized relative-neighborhood (RNG) heuristic pruning.

Port of getNeighborsByHeuristic2 (reference hnswalg.h:481-523) and
PruneByHeuristic (hnswalg_slim.h:836-865): walk candidates in ascending
distance order; keep a candidate iff no already-kept neighbor is closer to it
than the base point is. On TPU this is a vmapped O(C²) pairwise-distance
matmul + a fori_loop over sorted positions, batched over thousands of nodes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import distance

INF = jnp.float32(jnp.inf)


def _prune_one(cand_d, pd, valid, m, keep_all_under_m: bool):
    """Single-node prune. cand_d f32[C], pd f32[C, C] pairwise candidate
    distances, valid bool[C], m = budget (scalar, may be traced).
    Returns kept bool[C] and kept count."""
    c = cand_d.shape[0]
    masked_d = jnp.where(valid, cand_d, INF)
    order = jnp.argsort(masked_d)

    def body(i, carry):
        kept, cnt = carry
        ci = order[i]
        di = cand_d[ci]
        # reference: reject if any kept neighbor is closer to ci than base
        conflict = jnp.any(kept & (pd[:, ci] < di))
        good = valid[ci] & (cnt < m) & ~conflict
        kept = kept.at[ci].set(kept[ci] | good)
        return kept, cnt + good.astype(jnp.int32)

    kept, cnt = lax.fori_loop(0, c, body, (jnp.zeros((c,), bool), jnp.int32(0)))
    if keep_all_under_m:
        # getNeighborsByHeuristic2 early-out: fewer than M candidates -> keep all
        nvalid = jnp.sum(valid.astype(jnp.int32))
        under = nvalid < m
        kept = jnp.where(under, valid, kept)
        cnt = jnp.where(under, nvalid, cnt)
    return kept, cnt


def _prune_one_guarded(cand_d, pd, valid, guard, m):
    """SlimZero variant (hnswalg_slimzero.h PruneByHeuristic :820-894):
    pass 1 reserves every candidate whose in-degree guard is set,
    unconditionally and in distance order; pass 2 fills the rest by the RNG
    rule against ALL kept entries, capped at m total."""
    c = cand_d.shape[0]
    masked_d = jnp.where(valid, cand_d, INF)
    order = jnp.argsort(masked_d)

    kept0 = valid & guard  # pass 1: reserved low-indegree nodes
    cnt0 = jnp.sum(kept0.astype(jnp.int32))

    def body(i, carry):
        kept, cnt = carry
        ci = order[i]
        di = cand_d[ci]
        conflict = jnp.any(kept & (pd[:, ci] < di))
        good = valid[ci] & ~guard[ci] & (cnt < m) & ~conflict
        kept = kept.at[ci].set(kept[ci] | good)
        return kept, cnt + good.astype(jnp.int32)

    kept, cnt = lax.fori_loop(0, c, body, (kept0, cnt0))
    return kept, cnt


@functools.partial(
    jax.jit, static_argnames=("M", "metric", "out_width")
)
def prune_batch_guarded(
    vectors: jnp.ndarray,
    vn: jnp.ndarray,
    base_ids: jnp.ndarray,
    cand_ids: jnp.ndarray,
    valid: jnp.ndarray,
    guard: jnp.ndarray,  # bool[B, C]: candidate indegree <= min_indegree
    *,
    M: int,
    metric: str = "l2",
    out_width: int = 0,
    precision=jax.lax.Precision.HIGHEST,
    m_per_row: jnp.ndarray | None = None,
):
    """Batched SlimZero guarded prune. Guarded candidates are always kept
    (connectivity preserved by the in-degree floor instead of reverse-edge
    augmentation, hnswalg_slimzero.h:966-1000)."""
    return _prune_batch_guarded_impl(
        vectors, vn, base_ids, cand_ids, valid, guard, M, metric,
        out_width or M, precision, m_per_row,
    )


def _prune_batch_guarded_impl(vectors, vn, base_ids, cand_ids, valid, guard,
                              M, metric, w, precision, m_per_row):
    safe = jnp.maximum(cand_ids, 0)
    cvecs = vectors[safe].astype(jnp.float32)
    cn = vn[safe]
    bvec = vectors[base_ids].astype(jnp.float32)
    bn = vn[base_ids]
    cand_d = distance.gathered_dist(
        bvec, cvecs, metric, qn=bn, vn=cn, precision=precision
    )
    dots = jnp.einsum(
        "bcd,bed->bce", cvecs, cvecs, preferred_element_type=jnp.float32,
        precision=precision,
    )
    pd = 1.0 - dots if metric == "ip" else (
        cn[:, :, None] + cn[:, None, :] - 2.0 * dots
    )
    valid = valid & (cand_ids >= 0) & (cand_ids != base_ids[:, None])
    if m_per_row is None:
        m_per_row = jnp.full((cand_ids.shape[0],), M, jnp.int32)
    kept, cnt = jax.vmap(_prune_one_guarded)(cand_d, pd, valid, guard & valid,
                                             m_per_row)
    key = jnp.where(kept, cand_d, INF)
    order = jnp.argsort(key, axis=1)[:, :w]
    sel = jnp.take_along_axis(cand_ids, order, axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 1)
    sel = jnp.where(pos < cnt[:, None], sel, -1)
    if sel.shape[1] < w:
        sel = jnp.pad(sel, ((0, 0), (0, w - sel.shape[1])), constant_values=-1)
    return sel, cnt


@functools.partial(
    jax.jit,
    static_argnames=("M", "keep_all_under_m", "metric", "out_width", "chunk",
                     "keep_pruned"),
)
def prune_all(
    vectors: jnp.ndarray,
    vn: jnp.ndarray,
    base_ids: jnp.ndarray,  # i32[Npad] (pad with 0)
    cand_ids: jnp.ndarray,  # i32[Npad, C] (pad with -1)
    m_per_row: jnp.ndarray,  # i32[Npad] (pad with 1)
    *,
    M: int,
    keep_all_under_m: bool,
    metric: str = "l2",
    out_width: int = 0,
    chunk: int = 2048,
    precision=jax.lax.Precision.HIGHEST,
    keep_pruned: bool = False,
):
    """Whole-array heuristic prune with internal fori chunking: ONE device
    dispatch for all nodes (the per-chunk python loop costs ~30ms of host
    sync per chunk through the axon tunnel). Npad must be a multiple of
    `chunk`."""
    w = out_width or M
    n = base_ids.shape[0]
    out = jnp.full((n, w), -1, jnp.int32)

    def body(i, out):
        s = i * chunk
        b = lax.dynamic_slice_in_dim(base_ids, s, chunk, 0)
        c = lax.dynamic_slice_in_dim(cand_ids, s, chunk, 0)
        m = lax.dynamic_slice_in_dim(m_per_row, s, chunk, 0)
        sel, _ = _prune_batch_impl(
            vectors, vn, b, c, c >= 0, M, keep_all_under_m, metric, w,
            precision, m, keep_pruned,
        )
        return lax.dynamic_update_slice_in_dim(out, sel, s, 0)

    return lax.fori_loop(0, n // chunk, body, out)


@functools.partial(
    jax.jit,
    static_argnames=("M", "keep_all_under_m", "metric", "out_width",
                     "keep_pruned"),
)
def prune_batch(
    vectors: jnp.ndarray,
    vn: jnp.ndarray,
    base_ids: jnp.ndarray,  # i32[B]
    cand_ids: jnp.ndarray,  # i32[B, C]
    valid: jnp.ndarray,  # bool[B, C]
    *,
    M: int,
    keep_all_under_m: bool,
    metric: str = "l2",
    out_width: int = 0,
    precision=jax.lax.Precision.HIGHEST,
    m_per_row: jnp.ndarray | None = None,  # i32[B] overrides M per node
    keep_pruned: bool = False,
):
    """Heuristic-prune candidate lists for a batch of base nodes.

    Distances are recomputed on device (one [B,C,d] gather + einsum for
    base→cand, one [B,C,C] matmul for cand pairwise). Returns
    sel_ids i32[B, W] in ascending distance order, -1 padded
    (W = out_width or M). m_per_row supports the Slim hub/low budgets
    (hnswalg_slim.h:966-971).
    """
    return _prune_batch_impl(
        vectors, vn, base_ids, cand_ids, valid, M, keep_all_under_m, metric,
        out_width or M, precision, m_per_row, keep_pruned,
    )


def _prune_batch_impl(vectors, vn, base_ids, cand_ids, valid, M,
                      keep_all_under_m, metric, w, precision, m_per_row,
                      keep_pruned=False):
    safe = jnp.maximum(cand_ids, 0)
    cvecs = vectors[safe].astype(jnp.float32)  # [B, C, d]
    cn = vn[safe]
    bvec = vectors[base_ids].astype(jnp.float32)  # [B, d]
    bn = vn[base_ids]
    cand_d = distance.gathered_dist(
        bvec, cvecs, metric, qn=bn, vn=cn, precision=precision
    )
    dots = jnp.einsum(
        "bcd,bed->bce", cvecs, cvecs, preferred_element_type=jnp.float32,
        precision=precision,
    )
    if metric == "ip":
        pd = 1.0 - dots
    else:
        pd = cn[:, :, None] + cn[:, None, :] - 2.0 * dots

    valid = valid & (cand_ids >= 0) & (cand_ids != base_ids[:, None])
    if m_per_row is None:
        m_per_row = jnp.full((cand_ids.shape[0],), M, jnp.int32)
    kept, cnt = jax.vmap(
        lambda d, p, v, m: _prune_one(d, p, v, m, keep_all_under_m)
    )(cand_d, pd, valid, m_per_row)

    if keep_pruned:
        # backfill RNG-rejected candidates (nearest first) up to the budget.
        # NOT reference semantics (getNeighborsByHeuristic2 keeps only RNG
        # survivors) — used by the NND build path, whose candidate sets are
        # exact kNN lists: maximally tight, so the RNG rule intercepts almost
        # everything and leaves rows far sparser than the insertion build's
        # (measured at 1M clustered: mean degree 16 vs 24, 2-hop GT coverage
        # 0.72 vs 0.92). The slim conversion re-prunes with its own budgets.
        c = cand_ids.shape[1]
        lt = jnp.arange(c)[:, None] < jnp.arange(c)[None, :]  # [j, i]: j < i
        eq = cand_ids[:, :, None] == cand_ids[:, None, :]  # [B, j, i]
        dup = jnp.any(eq & valid[:, :, None] & lt[None], axis=1)
        dup_of_kept = jnp.any(eq & kept[:, :, None], axis=1)
        fill_ok = valid & ~kept & ~dup & ~dup_of_kept
        key2 = jnp.where(fill_ok, cand_d, INF)
        rank2 = jnp.argsort(jnp.argsort(key2, axis=1), axis=1)
        extra = fill_ok & (rank2 < (m_per_row - cnt)[:, None])
        kept = kept | extra
        cnt = cnt + jnp.sum(extra, axis=1).astype(jnp.int32)

    key = jnp.where(kept, cand_d, INF)
    order = jnp.argsort(key, axis=1)[:, :w]
    sel = jnp.take_along_axis(cand_ids, order, axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, sel.shape, 1)
    sel = jnp.where(pos < cnt[:, None], sel, -1)
    if sel.shape[1] < w:  # fewer candidates than the requested output width
        sel = jnp.pad(sel, ((0, 0), (0, w - sel.shape[1])), constant_values=-1)
    return sel, cnt
