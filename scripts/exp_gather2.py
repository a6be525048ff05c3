"""Round-5 micro-bench: the two levers left on the transaction-bound gather.

r4 attribution (profile_search3.py): the [B, cw] vector row gather is ~53%
of a beam iteration and is transaction-bound at ~11-13 ns/row INDEPENDENT of
row bytes (exp_gather.py: bf16 rows gather no faster). Two hypotheses:

  1. occupancy: more in-flight rows (bigger B) amortize transaction latency
     -> measure ns/row at B = 1024 / 2048 / 4096.
  2. row-byte flatness extends UP: if a 1024B or 2048B row costs the same
     transaction as 512B, packing P vectors per row (graph-locality node
     ordering) fetches P candidates per transaction
     -> measure gather from [N/P, P*DIM] tables at the same lane count.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_gather2.py
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
    N, DIM, ITERS = 1_000_000, 128, 30
    rng = np.random.default_rng(0)
    base = rng.standard_normal((N, DIM)).astype(np.float32)
    tables = {
        1: jnp.asarray(base),                          # 512 B rows
        2: jnp.asarray(base.reshape(N // 2, 2 * DIM)),   # 1 KiB rows
        4: jnp.asarray(base.reshape(N // 4, 4 * DIM)),   # 2 KiB rows
    }

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / 3 / ITERS * 1e6

    for B in (1024, 2048, 4096):
        centers = jnp.asarray(rng.integers(0, N, (B,)).astype(np.int32))
        for pack in (1, 2, 4):
            for CW in (64, 128):
                npack = N // pack

                @jax.jit
                def g(tab, centers=centers, CW=CW, npack=npack):
                    def body(acc, i):
                        off = (jnp.arange(CW, dtype=jnp.int32)[None, :] * 37
                               + i * 101) % 4096
                        safe = jnp.sort(
                            (centers[:, None] + off) % npack, axis=1
                        )
                        v = tab[safe]
                        return acc + jnp.sum(v[:, :, 0]), None
                    return lax.scan(body, jnp.float32(0),
                                    jnp.arange(ITERS))[0]

                us = timeit(g, tables[pack])
                rows = B * CW
                print(
                    f"B={B:5d} pack={pack} rowB={512*pack:5d} CW={CW:4d}: "
                    f"{us:7.0f} us/iter  {us*1e3/rows:6.2f} ns/row  "
                    f"{rows*512*pack/us/1e3:7.1f} GB/s",
                    flush=True,
                )


if __name__ == "__main__":
    main()
