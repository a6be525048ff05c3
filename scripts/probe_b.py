"""Round-5 probe: batch-size occupancy at the 1M recall-0.95 operating point.

The r4 attribution says the vector row gather dominates the beam iteration
and runs at ~3% of the measured gather roof; with the per-query work fixed,
the free lever is more in-flight queries per dispatch. Serve the cached
reference-built 1M graph at ef in {320, 352} with B in {1024, 2048, 4096}
and report recall/qps/effort.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_b.py
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, DIM = 1_000_000, 128
BS = [int(x) for x in os.environ.get("PROBE_BS", "1024,2048,4096").split(",")]
EFS = [int(x) for x in os.environ.get("PROBE_EFS", "320,352").split(",")]
POP = int(os.environ.get("PROBE_POP", 16))
SCAN = int(os.environ.get("PROBE_SCAN", 128))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hnsw_slim_tpu.graph.import_ref import slim_index_from_ref
    from hnsw_slim_tpu.index.bruteforce import BruteForceIndex
    from hnsw_slim_tpu.utils.data import clustered

    nq = max(BS)
    base, queries = clustered(N, DIM, n_queries=nq,
                              n_clusters=max(64, N // 1000), seed=7, scale=0.3)
    gpath = f"/root/repo/.bench_cache/ref_{N}_{DIM}_1024_v3.slimgraph"
    idx = slim_index_from_ref(gpath, base)
    idx.densify_level0()
    idx.densify_upper()
    bf = BruteForceIndex(base)
    _, gt = bf.search(queries, k=10)

    def recall(ids, g):
        return sum(len(set(a.tolist()) & set(b.tolist()))
                   for a, b in zip(ids, g)) / g.size

    for b in BS:
        q = queries[:b]
        for ef in EFS:
            idx.scfg = dataclasses.replace(
                idx.scfg, ef=ef, straggler_stages=(2, 8, 32),
                scan_width=SCAN, pop_width=POP,
            )
            t0 = time.perf_counter()
            _, ids = idx.search(q, k=10)  # compile + warm
            warm = time.perf_counter() - t0
            dt = []
            for _ in range(3):
                t0 = time.perf_counter()
                idx.search(q, k=10)
                dt.append(time.perf_counter() - t0)
            dt = min(dt)
            print(f"B={b:5d} ef={ef}: recall={recall(ids, gt[:b]):.4f} "
                  f"qps={b/dt:.0f} hops={idx.last_stats['hops']} "
                  f"dcomp={idx.last_stats['distance_computations']} "
                  f"(compile+warm {warm:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
