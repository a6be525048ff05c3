"""Ablation profiler for the beam iteration body (r4).

profile_search2's cumulative-prefix method measured an impossible 2 us/iter
for every prefix: its carry evolved only by jnp.roll, so XLA could hoist or
collapse the phase work that fed nothing but a scalar accumulator. This
version keeps the FULL body dataflow live (the merge output IS the next
carry) and neutralizes exactly ONE phase per variant; the saving vs the
full body attributes that phase's per-iteration cost at the exact headline
shapes (B=1024, P=512 phys / ef=384, pop=16, scan cw=128, dense0 cap 64).

Phases mirror graph/search.py beam_level_scored's body:
  pops      one-hot multi-pop selection over the sorted buffer
  csort     EW-wide candidate id sort + adjacent intra-dedup
  dupb      2cw x P broadcast dedup against buffer ids
  packsort  2cw-wide final pack sort
  vgather   [B, cw] x f32[N, d] neighbor row gather
  score     fused dist einsum
  merge     bitonic buffer merge (merge_sorted)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_search3.py
Env: PS_EF, PS_POP, PS_CW, PS_ITERS, PS_B, PS3_ONLY (comma list of variants),
     PS3_COMPILE_ONLY=1 (AOT-compile all variants into the cache, no runs).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("PS_B", 1024))
EF = int(os.environ.get("PS_EF", 512))
POP = int(os.environ.get("PS_POP", 16))
CW = int(os.environ.get("PS_CW", 128))
ITERS = int(os.environ.get("PS_ITERS", 30))
BIG = 2**30


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from hnsw_slim_tpu.graph.import_ref import slim_index_from_ref
    from hnsw_slim_tpu.graph.search import BeamState, merge_sorted
    from hnsw_slim_tpu.utils.data import clustered

    N, DIM = 1_000_000, 128
    base, queries = clustered(N, DIM, n_queries=B, n_clusters=N // 1000,
                              seed=7, scale=0.3)
    g = "/root/repo/.bench_cache/ref_1000000_128_1024_v3.slimgraph"
    idx = slim_index_from_ref(g, base)
    idx.densify_level0()
    dense0 = idx.dense0
    vectors = idx.vectors
    W = int(dense0.shape[1])
    q = jnp.asarray(queries)
    qn = jnp.sum(q * q, axis=1)
    EW = POP * W
    print(f"B={B} P={EF} pop={POP} W={W} EW={EW} cw={CW} iters={ITERS}",
          flush=True)

    def mk(skip):
        def body_of(dense0, vectors, q, qn):
          def body(carry, _):
            buf_d, buf_id, buf_chk = carry
            # real pop semantics over the carried buffer; chk bits are real
            # so the frontier stays live across iterations
            unchk = (buf_chk == 0) & (buf_id >= 0)
            if skip == "pops":
                pops = jnp.where(buf_id[:, :POP] >= 0, buf_id[:, :POP], -1)
                selmask = jnp.zeros_like(buf_chk, bool).at[:, :POP].set(True)
            else:
                rank = jnp.cumsum(unchk.astype(jnp.int32), axis=1) - 1
                selmask = unchk & (rank < POP)
                pops = jnp.stack([
                    jnp.max(jnp.where(selmask & (rank == j), buf_id, -1),
                            axis=1)
                    for j in range(POP)
                ], axis=1)
            buf_chk = jnp.where(selmask, 1, buf_chk)
            idsf = dense0[jnp.maximum(pops, 0).reshape(B * POP)]
            ids = jnp.where((pops >= 0)[:, :, None],
                            idsf.reshape(B, POP, W), -1).reshape(B, EW)
            valid = ids >= 0
            if skip == "csort":
                pre = jnp.where(valid[:, : 2 * CW], ids[:, : 2 * CW],
                                jnp.int32(BIG))
            else:
                cs0 = lax.sort(jnp.where(valid, ids, jnp.int32(BIG)),
                               dimension=1)
                dup0 = jnp.concatenate(
                    [jnp.zeros((B, 1), bool), cs0[:, 1:] == cs0[:, :-1]],
                    axis=1)
                pre = jnp.where(dup0, jnp.int32(BIG), cs0)[:, : 2 * CW]
            if skip == "dupb":
                pre2 = pre
            else:
                dupb = jnp.any(pre[:, :, None] == buf_id[:, None, :], axis=2)
                pre2 = jnp.where(dupb, jnp.int32(BIG), pre)
            if skip == "packsort":
                cand_sorted = pre2[:, :CW]
            else:
                cand_sorted = lax.sort(pre2, dimension=1)[:, :CW]
            cand = cand_sorted < BIG
            safe = jnp.where(cand, cand_sorted, 0)
            if skip == "vgather":
                vecs = q[:, None, :] + safe[:, :, None].astype(jnp.float32)
            else:
                vecs = vectors[safe]
            if skip == "score":
                d = jnp.where(cand, safe.astype(jnp.float32)
                              + vecs[:, :, 0] * 1e-30, jnp.inf)
            else:
                d = (qn[:, None] + jnp.sum(vecs * vecs, -1)
                     - 2.0 * jnp.einsum("bd,bed->be", q, vecs,
                                        preferred_element_type=jnp.float32,
                                        precision=lax.Precision.HIGHEST))
                d = jnp.where(cand, d, jnp.inf)
            cid = jnp.where(cand, cand_sorted, -1)
            if skip == "merge":
                # keep the dataflow: fold the scored candidates into the
                # buffer without a sort network
                buf_d = jnp.minimum(buf_d, jnp.roll(
                    jnp.pad(d, ((0, 0), (0, EF - CW)),
                            constant_values=np.inf), 1, axis=1))
                buf_id = jnp.maximum(buf_id, jnp.roll(
                    jnp.pad(cid, ((0, 0), (0, EF - CW)),
                            constant_values=-1), 1, axis=1))
                st = BeamState(buf_d, buf_id, buf_chk)
            else:
                st = merge_sorted(BeamState(buf_d, buf_id, buf_chk), d, cid)
            return (st.buf_d, st.buf_id, st.buf_chk), None

          return body

        @jax.jit
        def run(dense0, vectors, q, qn, buf_d0, buf_id0, salt):
            buf_id = jnp.remainder(buf_id0 + salt, jnp.int32(N))
            buf_chk = jnp.zeros((B, EF), jnp.int32)
            carry, _ = lax.scan(body_of(dense0, vectors, q, qn),
                                (buf_d0, buf_id, buf_chk), None,
                                length=ITERS)
            return carry[0].sum() + carry[1].sum()

        return run

    rng = np.random.default_rng(0)
    seed_id = jnp.asarray(rng.integers(0, N, (B, EF)).astype(np.int32))
    seed_d = jnp.asarray(
        np.sort(rng.random((B, EF)).astype(np.float32), axis=1))

    variants = ["full", "pops", "csort", "dupb", "packsort", "vgather",
                "score", "merge"]
    if os.environ.get("PS3_ONLY"):
        variants = os.environ["PS3_ONLY"].split(",")
    compile_only = os.environ.get("PS3_COMPILE_ONLY") == "1"
    base_t = None
    for v in variants:
        run = mk(None if v == "full" else v)
        t0 = time.perf_counter()
        if compile_only:
            run.lower(dense0, vectors, q, qn, seed_d, seed_id, jnp.int32(0)).compile()
            print(f"{v:10s} compiled in {time.perf_counter()-t0:.0f}s",
                  flush=True)
            continue
        out = run(dense0, vectors, q, qn, seed_d, seed_id, jnp.int32(0))
        out.block_until_ready()
        tc = time.perf_counter() - t0
        ts = []
        for it in range(3):
            t0 = time.perf_counter()
            out = run(dense0, vectors, q, qn, seed_d, seed_id, jnp.int32(it + 1))
            out.block_until_ready()
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        per = dt / ITERS * 1e6
        if v == "full":
            base_t = per
            print(f"{v:10s} {per:8.0f} us/iter  [compile {tc:.0f}s]",
                  flush=True)
        else:
            print(f"{v:10s} {per:8.0f} us/iter  saves "
                  f"{(base_t or 0) - per:6.0f} us  [compile {tc:.0f}s]",
                  flush=True)


if __name__ == "__main__":
    main()
