"""Measure buffer-dedup strategies for the beam iteration on the real chip.

The per-iteration candidate dedup is a [B, E*W, P] broadcast compare
(graph/search.py beam_level_scored: `dup = any(ids[:,:,None] == buf_id[:,None,:])`)
— ~5e8 comparisons at the 1M headline point (B=1024, E*W=1024, P=512).
Variants measured here, all producing the same (cand_sorted[:, :CW], mask):

  bcast    current: broadcast compare + 1-op sort(EW) + adjacent-dedup
  merge2   2-key sort over P+EW (buffer tags first), flag prev-equal,
           second 1-op sort to compact novel ids
  bsearch  sort buffer ids (P) once, then log2(P) take_along_axis binary
           search per candidate lane + 1-op sort(EW)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_dedup.py
Env: XD_B, XD_P, XD_EW, XD_CW, XD_ITERS.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("XD_B", 1024))
P = int(os.environ.get("XD_P", 512))
EW = int(os.environ.get("XD_EW", 1024))
CW = int(os.environ.get("XD_CW", 128))
ITERS = int(os.environ.get("XD_ITERS", 30))
BIG = 2**30


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    rng = np.random.default_rng(0)
    buf_id0 = rng.integers(0, 1_000_000, (B, P)).astype(np.int32)
    ids0 = rng.integers(0, 1_000_000, (B, EW)).astype(np.int32)
    # make ~60% of candidate lanes buffer-duplicates and ~25% invalid,
    # approximating the real mix
    take = rng.random((B, EW)) < 0.6
    cols = rng.integers(0, P, (B, EW))
    ids0 = np.where(take, np.take_along_axis(buf_id0, cols, axis=1), ids0)
    ids0 = np.where(rng.random((B, EW)) < 0.25, -1, ids0).astype(np.int32)

    def bcast(buf_id, ids):
        valid = ids >= 0
        dup = jnp.any(ids[:, :, None] == buf_id[:, None, :], axis=2)
        cand_ids = jnp.where(valid & ~dup, ids, jnp.int32(BIG))
        cs = lax.sort(cand_ids, dimension=1)
        dup2 = jnp.concatenate(
            [jnp.zeros((B, 1), bool), cs[:, 1:] == cs[:, :-1]], axis=1)
        cs = jnp.where(dup2, jnp.int32(BIG), cs)[:, :CW]
        return cs

    def merge2(buf_id, ids):
        keys = jnp.concatenate(
            [jnp.where(buf_id >= 0, buf_id, BIG),
             jnp.where(ids >= 0, ids, BIG)], axis=1)
        tags = jnp.concatenate(
            [jnp.zeros((B, P), jnp.int32), jnp.ones((B, EW), jnp.int32)],
            axis=1)
        sk, st = lax.sort((keys, tags), dimension=1, num_keys=2)
        eq_prev = jnp.concatenate(
            [jnp.zeros((B, 1), bool), sk[:, 1:] == sk[:, :-1]], axis=1)
        novel = (st == 1) & ~eq_prev & (sk < BIG)
        out = jnp.where(novel, sk, BIG)
        return lax.sort(out, dimension=1)[:, :CW]

    def bsearch(buf_id, ids):
        sid = lax.sort(buf_id, dimension=1)
        lo = jnp.zeros((B, EW), jnp.int32)
        hi = jnp.full((B, EW), P, jnp.int32)
        for _ in range(P.bit_length()):
            mid = (lo + hi) >> 1
            mv = jnp.take_along_axis(sid, jnp.minimum(mid, P - 1), axis=1)
            right = mv < ids
            lo = jnp.where(right, mid + 1, lo)
            hi = jnp.where(right, hi, mid)
        found = jnp.take_along_axis(sid, jnp.minimum(lo, P - 1), axis=1) == ids
        cand_ids = jnp.where((ids >= 0) & ~found, ids, jnp.int32(BIG))
        cs = lax.sort(cand_ids, dimension=1)
        dup2 = jnp.concatenate(
            [jnp.zeros((B, 1), bool), cs[:, 1:] == cs[:, :-1]], axis=1)
        return jnp.where(dup2, jnp.int32(BIG), cs)[:, :CW]

    fns = {"bcast": bcast, "merge2": merge2, "bsearch": bsearch}
    outs = {}
    for name, fn in fns.items():
        @jax.jit
        def run(buf_id, ids, fn=fn):
            def body(carry, _):
                acc, b_id, i_d = carry
                cs = fn(b_id, i_d)
                # rotate inputs so iterations aren't CSE'd away
                return (acc + cs.sum(), jnp.roll(b_id, 1, axis=0),
                        jnp.roll(i_d, 1, axis=0)), None
            (acc, _, _), _ = lax.scan(
                body, (jnp.int32(0), buf_id, ids), None, length=ITERS)
            return acc

        bj, ij = jnp.asarray(buf_id0), jnp.asarray(ids0)
        out = run(bj, ij)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            out = run(bj, ij)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 5
        outs[name] = np.asarray(fns[name](bj, ij))
        print(f"{name:8s} {dt/ITERS*1e6:8.0f} us/iter", flush=True)

    # result equivalence (sets of surviving novel ids per row, ignoring order)
    a, b, c = (np.sort(np.where(o < BIG, o, BIG), axis=1)
               for o in (outs["bcast"], outs["merge2"], outs["bsearch"]))
    print("bcast==bsearch:", bool((a == c).all()))
    # merge2 may keep a different subset when novel count > CW (it has no
    # buffer-lane competition inside the cap) — compare counts instead
    print("novel counts equal (bcast vs merge2):",
          bool(((a < BIG).sum(1) == (b < BIG).sum(1)).all()))


if __name__ == "__main__":
    main()
