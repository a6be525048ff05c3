"""Micro-bench: HBM row-gather formulations for the search hot loop.

The r3 bisect (profile_search.py) shows the [B, cw] vector row gather is the
single largest per-iteration cost (1505 us at cw=96, B=1024 = 33 GB/s
effective vs the 300 GB/s ceiling) and the 16 separate per-pop dense0 row
fetches cost 681 us (3 GB/s). Variants measured here:
  vgather2d   - current: vectors[safe] with safe i32[B, cw]
  vgatherflat - flat index reshape
  vgatherbf16 - bf16 vector table (half the bytes)
  fetch16     - 16 separate dense0[pops[:, j]] gathers (current build)
  fetch1      - one dense0[pops] gather i32[B, 16]

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_gather.py
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
    N, DIM, B, CW, POP, W, ITERS = 1_000_000, 128, 1024, 96, 16, 32, 30
    rng = np.random.default_rng(0)
    vecs = jnp.asarray(rng.standard_normal((N, DIM)).astype(np.float32))
    vecs16 = vecs.astype(jnp.bfloat16)
    dense0 = jnp.asarray(rng.integers(0, N, (N, W)).astype(np.int32))
    # per-iteration fresh indices derived in-loop (defeats CSE), locality
    # mimicking a beam: indices clustered around a random center per row
    centers = jnp.asarray(rng.integers(0, N, (B,)).astype(np.int32))

    def idx_of(i, width):
        off = (jnp.arange(width, dtype=jnp.int32)[None, :] * 37 + i * 101) % 4096
        return (centers[:, None] + off) % N

    def timeit(fn):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / 3 / ITERS * 1e6

    @jax.jit
    def vgather2d(vecs):
        def body(acc, i):
            safe = idx_of(i, CW)
            v = vecs[safe]
            return acc + jnp.sum(v[:, :, 0]), None
        return lax.scan(body, jnp.float32(0), jnp.arange(ITERS))[0]

    @jax.jit
    def vgather_sorted(vecs):
        # the real kernel gathers cand_sorted (ids ascending per row)
        def body(acc, i):
            safe = jnp.sort(idx_of(i, CW), axis=1)
            v = vecs[safe]
            return acc + jnp.sum(v[:, :, 0]), None
        return lax.scan(body, jnp.float32(0), jnp.arange(ITERS))[0]

    @jax.jit
    def vgatherflat(vecs):
        def body(acc, i):
            safe = idx_of(i, CW).reshape(-1)
            v = vecs[safe].reshape(B, CW, DIM)
            return acc + jnp.sum(v[:, :, 0]), None
        return lax.scan(body, jnp.float32(0), jnp.arange(ITERS))[0]

    @jax.jit
    def vgatherbf16(vecs16):
        def body(acc, i):
            safe = idx_of(i, CW)
            v = vecs16[safe]
            return acc + jnp.sum(v[:, :, 0].astype(jnp.float32)), None
        return lax.scan(body, jnp.float32(0), jnp.arange(ITERS))[0]

    @jax.jit
    def fetch16(dense0):
        def body(acc, i):
            pops = idx_of(i, POP)
            ids = jnp.concatenate(
                [dense0[pops[:, j]] for j in range(POP)], axis=1
            )
            return acc + jnp.sum(ids), None
        return lax.scan(body, jnp.int32(0), jnp.arange(ITERS))[0]

    @jax.jit
    def fetch1(dense0):
        def body(acc, i):
            pops = idx_of(i, POP)
            ids = dense0[pops].reshape(B, POP * W)
            return acc + jnp.sum(ids), None
        return lax.scan(body, jnp.int32(0), jnp.arange(ITERS))[0]

    for name, fn, arg in [
            ("vgather2d", vgather2d, vecs),
            ("vgather_sorted", vgather_sorted, vecs),
            ("vgatherflat", vgatherflat, vecs),
            ("vgatherbf16", vgatherbf16, vecs16),
            ("fetch16", fetch16, dense0),
            ("fetch1", fetch1, dense0)]:
        us = timeit(lambda fn=fn, arg=arg: fn(arg))
        print(f"{name:14s} {us:8.0f} us/iter", flush=True)


if __name__ == "__main__":
    main()
