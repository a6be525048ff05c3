"""Candidate compaction: full [B,EW] sort vs prefix-pack gather.

At pop_width=16 the per-iteration candidate stream is [B, E*W] = [B,1024]
lanes of which only ~8% are valid (mean slim degree ~24, minus buffer dups).
The current kernel packs+dedups via one lax.sort over all EW lanes — a
~55-pass sorting network. But every fetched row arrives with its valid ids
as a CONTIGUOUS ASCENDING PREFIX (dense0/_level_rows canonical form), so the
valid lanes can be packed with a tiny per-row offset cumsum + one gather,
then sorted at the 2*cw window width only.

Times three variants of the candidate-processing stage inside a fixed-trip
scan at serving shapes (B=1024, E=16, W=64, buffer P=512, cw=128):
  sortfull : sort [B,EW] -> adj-dedup -> window 2cw -> buffer-dedup -> sort
  pack     : offset-pack gather [B,2cw] -> buffer-dedup -> sort [B,2cw]
             -> adj-dedup (one small sort total)
Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_pack.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("XP_B", 1024))
E = int(os.environ.get("XP_E", 16))
W = int(os.environ.get("XP_W", 64))
P = int(os.environ.get("XP_P", 512))
CW = int(os.environ.get("XP_CW", 128))
ITERS = int(os.environ.get("XP_ITERS", 50))
BIG = 2**30


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    rng = np.random.default_rng(0)
    # realistic rows: ascending valid prefix (mean ~24 of W) then -1 pad
    cnt = np.clip(rng.poisson(24, size=(B, E)), 0, W)
    lane = np.arange(W)[None, None, :]
    vals = np.sort(rng.integers(0, 1_000_000, size=(B, E, W)), axis=2)
    rows = np.where(lane < cnt[:, :, None], vals, -1).astype(np.int32)
    buf_id = np.sort(rng.integers(0, 1_000_000, size=(B, P))).astype(np.int32)
    rows_d = jnp.asarray(rows)
    buf_d = jnp.asarray(buf_id)

    def sortfull(rows3, buf):
        ids = rows3.reshape(B, E * W)
        valid = ids >= 0
        cs0 = lax.sort(jnp.where(valid, ids, jnp.int32(BIG)), dimension=1)
        dup0 = jnp.concatenate(
            [jnp.zeros((B, 1), bool), cs0[:, 1:] == cs0[:, :-1]], axis=1)
        pre = jnp.where(dup0, jnp.int32(BIG), cs0)[:, : 2 * CW]
        dupb = jnp.any(pre[:, :, None] == buf[:, None, :], axis=2)
        pre = jnp.where(dupb, jnp.int32(BIG), pre)
        return lax.sort(pre, dimension=1)[:, :CW]

    def pack(rows3, buf):
        c = jnp.sum(rows3 >= 0, axis=2)                    # [B,E]
        offs = jnp.cumsum(c, axis=1) - c                   # [B,E] exclusive
        t = jnp.arange(2 * CW)[None, :]                    # [1,2cw]
        j = jnp.sum(offs[:, None, :] <= t[:, :, None], axis=2) - 1
        i = t - jnp.take_along_axis(offs, j, axis=1)
        ok = i < jnp.take_along_axis(c, j, axis=1)
        flat = rows3.reshape(B, E * W)
        idx = jnp.clip(j * W + i, 0, E * W - 1)
        pre = jnp.where(ok, jnp.take_along_axis(flat, idx, axis=1),
                        jnp.int32(BIG))
        dupb = jnp.any(pre[:, :, None] == buf[:, None, :], axis=2)
        pre = jnp.where(dupb, jnp.int32(BIG), pre)
        cs = lax.sort(pre, dimension=1)
        dup = jnp.concatenate(
            [jnp.zeros((B, 1), bool), cs[:, 1:] == cs[:, :-1]], axis=1)
        return jnp.where(dup, jnp.int32(BIG), cs)[:, :CW]

    def bench(fn, name):
        @jax.jit
        def run(rows3, buf):
            def body(acc, i):
                out = fn(jnp.where(rows3 >= 0, rows3 + i, rows3), buf)
                return acc + jnp.sum(out & 0xFF), None
            return lax.scan(body, jnp.int32(0), jnp.arange(ITERS))[0]

        run(rows_d, buf_d).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3):
            run(rows_d, buf_d).block_until_ready()
        us = (time.perf_counter() - t0) / 3 / ITERS * 1e6
        print(f"{name:10s} {us:8.0f} us/iter", flush=True)
        return us

    # equivalence check (sets must match: pack output is sorted+deduped too)
    a = np.asarray(jax.jit(sortfull)(rows_d, buf_d))
    b = np.asarray(jax.jit(pack)(rows_d, buf_d))
    sa = [set(x[x < BIG].tolist()) for x in a]
    sb = [set(x[x < BIG].tolist()) for x in b]
    mism = sum(1 for x, y in zip(sa, sb) if x != y)
    print(f"set mismatch rows: {mism}/{B} (expected 0 when no window "
          f"overflow)", flush=True)

    bench(sortfull, "sortfull")
    bench(pack, "pack")


if __name__ == "__main__":
    main()
