"""Bisect the insert-build adjacency scatter cost on the real chip.

The 1M insertion build spends ~200 s (old full-row path) to ~800 s (sparse
column variants) in "scatter" — far above the H2D arithmetic (~0.5 s/batch).
Times each piece in isolation at steady-state shapes (batch 8192 at 1M):

  h2d_rows   : jnp.asarray of the [131072, 64] i32 padded row block
  rowset     : eager a.at[ids].set(rows) row scatter into [1M, 64]
  rowset_jit : the same under jit (donated buffer; no 256 MB copy)
  fitcomb    : gather + dense compare-combine + row scatter (fit path)
  full_chain : asarray + rowset eager (what _insert_batch actually does)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_scatter.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, W = 1_000_000, 64
R = int(os.environ.get("XS_R", 131072))   # padded upd rows
F = int(os.environ.get("XS_F", 65536))    # padded fit rows
K = int(os.environ.get("XS_K", 8))        # fit kmax


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    rng = np.random.default_rng(0)
    a = jnp.full((N, W), -1, jnp.int32)
    a.block_until_ready()
    ids_np = rng.permutation(N)[:R].astype(np.int32)
    rows_np = rng.integers(-1, N, size=(R, W)).astype(np.int32)
    fi_np = rng.permutation(N)[:F].astype(np.int32)
    fc_np = rng.integers(0, W, size=(F, K)).astype(np.int32)
    fv_np = rng.integers(0, N, size=(F, K)).astype(np.int32)

    def timeit(fn, name, reps=5):
        fn()  # warm/compile
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:12s} {dt*1e3:9.1f} ms", flush=True)
        return dt

    # 1. pure H2D of the row block
    timeit(lambda: jnp.asarray(rows_np).block_until_ready(), "h2d_rows")
    timeit(lambda: jnp.asarray(ids_np).block_until_ready(), "h2d_ids")

    # 2. eager row scatter (device-resident operands)
    ids_d = jnp.asarray(ids_np)
    rows_d = jnp.asarray(rows_np)
    timeit(lambda: a.at[ids_d].set(rows_d).block_until_ready(), "rowset")

    # 3. jitted row scatter with donated target
    @jax.jit
    def rs(a, i, r):
        return a.at[i].set(r)

    timeit(lambda: rs(a, ids_d, rows_d).block_until_ready(), "rowset_jit")

    rsd = jax.jit(rs, donate_argnums=0)
    b = jnp.full((N, W), -1, jnp.int32)

    def dn():
        nonlocal b
        b = rsd(b, ids_d, rows_d)
        return b

    timeit(dn, "rowset_don")

    # 4. fit combine chain (device-resident)
    fi_d, fc_d, fv_d = map(jnp.asarray, (fi_np, fc_np, fv_np))

    def fit():
        cur = a[fi_d]
        hitc = fc_d[:, :, None] == jnp.arange(W)[None, None, :]
        upd = jnp.max(jnp.where(hitc, fv_d[:, :, None], -1), axis=1)
        return a.at[fi_d].set(jnp.where(upd >= 0, upd, cur)).block_until_ready()

    timeit(fit, "fitcomb")

    # 5. the full eager chain as _insert_batch runs it (H2D + scatter)
    def chain():
        return a.at[jnp.asarray(ids_np)].set(
            jnp.asarray(rows_np)
        ).block_until_ready()

    timeit(chain, "full_chain")


if __name__ == "__main__":
    main()
