"""Micro-bench: buffer-merge strategies at high ef (VERDICT r2 item 5).

Times ITERS iterations of just the merge step (the measured bottleneck at
ef=384) over synthetic candidates: current lax.sort over ef+cw lanes vs the
bitonic merge_sorted network over a pow2 buffer.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_merge.py
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
    from hnsw_slim_tpu.graph.search import BeamState, merge_sorted

    B, ITERS = 1024, 32
    rng = np.random.default_rng(0)

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / 5

    for EF, CW in [(384, 96), (384, 128), (512, 128), (256, 128), (128, 128)]:
        P = 1 << (EF - 1).bit_length()
        buf_d = np.sort(rng.random((B, P)).astype(np.float32), axis=1)
        buf_id = rng.integers(0, 10**6, (B, P)).astype(np.int32)
        buf_chk = np.zeros((B, P), np.int32)
        # fresh pseudo-candidates each iteration derived from the iter index
        @jax.jit
        def run_sort(bd, bi, bc):
            bd, bi, bc = bd[:, :EF], bi[:, :EF], bc[:, :EF]
            def body(carry, i):
                bd, bi, bc = carry
                cd = bd[:, :CW] * 0.99 + i.astype(jnp.float32) * 1e-4
                ci = bi[:, :CW] + 1
                cat_d = jnp.concatenate([bd, cd], axis=1)
                cat_i = jnp.concatenate([bi, ci], axis=1)
                cat_c = jnp.concatenate([bc, jnp.zeros_like(ci)], axis=1)
                sd, si, sc = lax.sort((cat_d, cat_i, cat_c), dimension=1, num_keys=1)
                return (sd[:, :EF], si[:, :EF], sc[:, :EF]), None
            carry, _ = lax.scan(body, (bd, bi, bc), jnp.arange(ITERS))
            return carry[0].sum() + carry[1].sum()

        @jax.jit
        def run_bitonic(bd, bi, bc):
            def body(carry, i):
                st = BeamState(*carry)
                cd = st.buf_d[:, :CW] * 0.99 + i.astype(jnp.float32) * 1e-4
                ci = st.buf_id[:, :CW] + jnp.int32(1)
                st = merge_sorted(st, cd, ci)
                return tuple(st), None
            carry, _ = lax.scan(body, (bd, bi, bc), jnp.arange(ITERS))
            return carry[0].sum() + carry[1].sum()

        a = timeit(run_sort, jnp.asarray(buf_d), jnp.asarray(buf_id), jnp.asarray(buf_chk))
        b = timeit(run_bitonic, jnp.asarray(buf_d), jnp.asarray(buf_id), jnp.asarray(buf_chk))
        print(f"ef={EF:4d} cw={CW:4d} P={P:4d}: lax.sort {a/ITERS*1e6:7.0f} us/iter   "
              f"bitonic {b/ITERS*1e6:7.0f} us/iter   speedup {a/b:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
