"""Batched on-device HNSW construction.

Reference: HierarchicalNSW::addPoint (hnswalg.h:1248-1376) inserts one point at
a time under fine-grained locks. The TPU build replaces locks with
bulk-synchronous rounds: a batch of points searches the frozen pre-batch graph
in lockstep (greedy descent + per-level beam with ef_construction), then all
connections (forward + reverse with heuristic prune) are applied at once.
This matches the semantics of hnswlib's OpenMP-parallel build, where
concurrent inserts also read slightly stale neighborhoods.

Level sampling: level = floor(-ln(U) * mult), mult = 1/ln(branching_factor)
(hnswalg.h getRandomLevel :1285, ctor :143-158).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HnswConfig
from ..ops import distance
from . import search as gs
from .heuristic import prune_batch
from .types import LevelGraph

INF = jnp.float32(jnp.inf)


def _next_pow2(x: int) -> int:
    return 1 if x <= 1 else 1 << (x - 1).bit_length()


def _pad_rows(a: np.ndarray, fill: int = -1) -> tuple[np.ndarray, int]:
    """Pad the leading dim to the next power of two (bounds jit recompiles)."""
    n = a.shape[0]
    m = _next_pow2(n)
    if m == n:
        return a, n
    pad = np.full((m - n,) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad]), n


def sample_levels(n: int, mult: float, seed: int, cap: int = 12) -> np.ndarray:
    """Geometric level sampling (hnswalg.h:1285 getRandomLevel)."""
    rng = np.random.default_rng(seed)
    u = rng.random(n)
    u = np.clip(u, 1e-12, 1.0)
    return np.minimum((-np.log(u) * mult).astype(np.int32), cap)


@functools.partial(
    jax.jit,
    static_argnames=("max_level", "efc", "max_iters", "visited_slots", "metric"),
)
def _build_search(
    adjs: tuple,
    entry: jnp.ndarray,
    vectors: jnp.ndarray,
    vn: jnp.ndarray,
    q: jnp.ndarray,
    lp_eff: jnp.ndarray,
    *,
    max_level: int,
    efc: int,
    max_iters: int,
    visited_slots: int,
    metric: str,
):
    """Per-batch candidate discovery: greedy descent above each point's level,
    beam (ef_construction) at and below it. Returns per-level candidate
    buffers stacked [max_level+1, B, efc] (ids, dists)."""
    b = q.shape[0]
    precision = jax.lax.Precision.HIGHEST
    qn = distance.sq_norms(q)
    cur = jnp.broadcast_to(entry.astype(jnp.int32), (b,))
    curdist = distance.gathered_dist(
        q, vectors[cur][:, None, :], metric, qn=qn, vn=vn[cur][:, None],
        precision=precision,
    )[:, 0]

    state = gs.beam_init(cur, curdist, efc, visited_slots)
    out_d, out_i = [], []
    for l in range(max_level, -1, -1):
        fetch = gs.make_dense_fetch(adjs[l])
        greedy_active = lp_eff < l
        cur, curdist = greedy_level(
            fetch, vectors, vn, q, qn, cur, curdist, greedy_active, metric, precision
        )
        state = gs.beam_reseed(state, cur, curdist, lp_eff == l)
        beam_active = lp_eff >= l
        state = gs.beam_level(
            fetch, vectors, vn, q, qn, state, beam_active, efc, max_iters,
            metric, precision,
        )
        out_d.append(state.buf_d)
        out_i.append(state.buf_id)
        if l > 0:
            state = gs.BeamState(
                state.buf_d, state.buf_id, jnp.zeros_like(state.buf_chk), state.vis
            )
    # out[j] corresponds to level max_level - j; flip to index by level
    return jnp.stack(out_d[::-1]), jnp.stack(out_i[::-1])


# thin alias so _build_search reads naturally
greedy_level = gs.greedy_level


class HnswBuilder:
    """Builds a LevelGraph over a vector set in batched rounds."""

    def __init__(self, cfg: HnswConfig, max_batch: int = 4096):
        self.cfg = cfg
        self.max_batch = max_batch

    def build(self, vectors: np.ndarray, verbose: bool = False):
        """Returns (LevelGraph, levels np.int32[N])."""
        cfg = self.cfg
        n, dim = vectors.shape
        levels = sample_levels(n, cfg.mult, cfg.seed)
        lmax = int(levels.max(initial=0))
        caps = [cfg.maxM0] + [cfg.maxM] * lmax

        vecs = jnp.asarray(np.asarray(vectors, np.float32))
        vn = distance.sq_norms(vecs)
        adj_np = [np.full((n, caps[l]), -1, np.int32) for l in range(lmax + 1)]
        adj_dev = [jnp.asarray(a) for a in adj_np]

        entry = 0
        cur_maxlevel = int(levels[0])
        done = 1  # point 0 inserted trivially (no peers to link)
        while done < n:
            bsz = min(self._batch_size(done), n - done)
            ids = np.arange(done, done + bsz)
            self._insert_batch(
                ids, levels, entry, cur_maxlevel, vecs, vn, adj_np, adj_dev, lmax
            )
            # entry-point update (hnswalg.h:1369-1374): each insert whose level
            # exceeds the running max becomes the new enterpoint, in order.
            for p in ids:
                if levels[p] > cur_maxlevel:
                    cur_maxlevel = int(levels[p])
                    entry = int(p)
            done += bsz
            if verbose and done % 65536 < bsz:
                print(f"  built {done}/{n}")

        return LevelGraph(
            adjs=tuple(jnp.asarray(a) for a in adj_np),
            level=jnp.asarray(levels),
            entry=jnp.asarray(np.int32(entry)),
            max_level=lmax,
        ), levels

    def _batch_size(self, cur: int) -> int:
        # batch never exceeds current graph size: early rounds stay
        # high-quality, later rounds amortize to max_batch
        return max(1, min(cur, self.max_batch))

    def _insert_batch(
        self, ids, levels, entry, cur_maxlevel, vecs, vn, adj_np, adj_dev, lmax
    ):
        cfg = self.cfg
        b = len(ids)
        lp = levels[ids].astype(np.int32)
        lp_eff = np.minimum(lp, cur_maxlevel)
        ids_pad, _ = _pad_rows(ids.astype(np.int32), fill=int(ids[-1]))
        lp_pad, _ = _pad_rows(lp_eff, fill=-1)  # padded queries never beam
        q = vecs[jnp.asarray(ids_pad)]

        cand_d, cand_i = _build_search(
            tuple(adj_dev),
            jnp.asarray(np.int32(entry)),
            vecs,
            vn,
            q,
            jnp.asarray(lp_pad),
            max_level=lmax,
            efc=cfg.ef_construction,
            max_iters=2 * cfg.ef_construction + 64,
            visited_slots=1024,
            metric=cfg.metric,
        )

        for l in range(int(lp_eff.max(initial=0)), -1, -1):
            active = lp_eff >= l
            if not active.any():
                continue
            aidx = np.nonzero(active)[0]
            a_ids = ids[aidx]
            cap_l = cfg.maxM0 if l == 0 else cfg.maxM
            ci_np = np.asarray(cand_i[l])[aidx]
            ci_pad, na = _pad_rows(ci_np)
            aid_pad, _ = _pad_rows(a_ids.astype(np.int32), fill=0)
            # forward selection: heuristic to M with the under-M early-out
            # (mutuallyConnectNewElement -> getNeighborsByHeuristic2,
            #  hnswalg.h:549-560)
            sel, _ = prune_batch(
                vecs, vn, jnp.asarray(aid_pad), jnp.asarray(ci_pad),
                jnp.asarray(ci_pad >= 0),
                M=cfg.M, keep_all_under_m=True, metric=cfg.metric,
            )
            sel = np.asarray(sel)[:na]
            fwd_rows = np.full((len(a_ids), cap_l), -1, np.int32)
            fwd_rows[:, : sel.shape[1]] = sel

            # reverse targets live in the pre-batch graph, disjoint from a_ids
            rev_targets, rev_rows = self._reverse_connect(
                l, a_ids, sel, adj_np[l], cap_l, vecs, vn
            )

            upd_ids = np.concatenate([a_ids, rev_targets]).astype(np.int32)
            upd_rows = np.concatenate([fwd_rows, rev_rows], axis=0)
            adj_np[l][upd_ids] = upd_rows
            adj_dev[l] = adj_dev[l].at[jnp.asarray(upd_ids)].set(
                jnp.asarray(upd_rows)
            )

    def _reverse_connect(self, l, a_ids, sel, adj_l, cap_l, vecs, vn):
        """Reverse edges u->p for each forward edge p->u (hnswalg.h:618-687):
        append while the target row has room, else heuristic-prune
        {existing ∪ new} down to the level cap."""
        cfg = self.cfg
        mask = sel >= 0
        pairs_u = sel[mask]
        pairs_p = np.repeat(a_ids, mask.sum(axis=1))
        if len(pairs_u) == 0:
            return np.zeros((0,), np.int32), np.zeros((0, cap_l), np.int32)

        order = np.argsort(pairs_u, kind="stable")
        us, ps = pairs_u[order], pairs_p[order]
        uniq, starts, counts = np.unique(us, return_index=True, return_counts=True)
        max_new = _next_pow2(int(counts.max()))
        newmat = np.full((len(uniq), max_new), -1, np.int32)
        col = np.arange(len(us)) - np.repeat(starts, counts)
        row = np.repeat(np.arange(len(uniq)), counts)
        newmat[row, col] = ps

        existing = adj_l[uniq]  # [U, cap_l]
        ne = (existing >= 0).sum(axis=1)
        total = ne + counts
        out_rows = existing.copy()

        fits = total <= cap_l
        pair_fits = fits[row]
        r, c = row[pair_fits], col[pair_fits]
        out_rows[r, ne[r] + c] = newmat[r, c]

        of = np.nonzero(~fits)[0]
        if len(of):
            cand = np.concatenate([existing[of], newmat[of]], axis=1)
            for s in range(0, len(of), 1024):
                ck = slice(s, min(s + 1024, len(of)))
                cpad, _ = _pad_rows(cand[ck])
                upad, _ = _pad_rows(uniq[of][ck], fill=0)
                sel_r, _ = prune_batch(
                    vecs, vn,
                    jnp.asarray(upad),
                    jnp.asarray(cpad),
                    jnp.asarray(cpad >= 0),
                    M=cap_l, keep_all_under_m=False, metric=cfg.metric,
                    out_width=cap_l,
                )
                out_rows[of[ck]] = np.asarray(sel_r)[: ck.stop - ck.start]
        return uniq.astype(np.int32), out_rows
