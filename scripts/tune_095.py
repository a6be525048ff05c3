"""Sweep straggler-stages / scan_width / pop_width at the recall>=0.95
operating point (ef=384, 1M reference-built graph from the bench cache).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tune_095.py
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, DIM, NQ = 1_000_000, 128, 1024
EF = int(os.environ.get("TUNE_EF", 384))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hnsw_slim_tpu.graph.import_ref import slim_index_from_ref
    from hnsw_slim_tpu.index.bruteforce import BruteForceIndex
    from hnsw_slim_tpu.utils.data import clustered

    base, queries = clustered(N, DIM, n_queries=NQ,
                              n_clusters=max(64, N // 1000), seed=7, scale=0.3)
    gpath = f"/root/repo/.bench_cache/ref_{N}_{DIM}_{NQ}_v3.slimgraph"
    idx = slim_index_from_ref(gpath, base)
    idx.densify_level0()
    bf = BruteForceIndex(base)
    _, gt = bf.search(queries, k=10)

    def recall(ids):
        return sum(len(set(a.tolist()) & set(b.tolist()))
                   for a, b in zip(ids, gt)) / gt.size

    configs = [
        dict(ef=384, straggler_stages=(4, 16), scan_width=128, pop_width=24),
        dict(ef=384, straggler_stages=(4, 16), scan_width=160, pop_width=32),
        dict(ef=384, straggler_stages=(4, 16), scan_width=96, pop_width=16),
        dict(ef=320, straggler_stages=(4, 16), scan_width=128, pop_width=16),
        dict(ef=352, straggler_stages=(4, 16), scan_width=128, pop_width=16),
        dict(ef=320, straggler_stages=(4, 16), scan_width=128, pop_width=24),
    ]
    for cfg in configs:
        idx.scfg = dataclasses.replace(idx.scfg, **cfg)
        t0 = time.perf_counter()
        _, ids = idx.search(queries, k=10)  # compile + warm
        warm = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            idx.search(queries, k=10)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"{cfg} -> qps={NQ/dt:.0f} recall={recall(ids):.4f} "
              f"hops={idx.last_stats['hops']} "
              f"dcomp={idx.last_stats['distance_computations']} "
              f"(compile+warm {warm:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
