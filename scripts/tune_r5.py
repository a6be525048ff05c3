"""Round-5 knob sweep at the 1M recall-0.95 operating point.

After the 384-lane merge (qps 7555 -> 8201 @0.95) the remaining levers are
batch occupancy (B=4096 measured +7%), pop/scan retune at the new buffer
width, straggler-stage depth at large B, and the ef=288 point (buffer 384,
fewer hops than 320). Sweep and print recall/qps/effort per config.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tune_r5.py
Env: T5_CFGS="B:ef:pop:scan:f1,f2,f3;..." to override the grid.
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, DIM = 1_000_000, 128

DEFAULT = (
    "4096:320:16:128:2,8,32",
    "4096:320:16:128:2,8,32,128",
    "4096:288:16:128:2,8,32,128",
    "4096:320:24:160:2,8,32,128",
    "4096:320:32:192:2,8,32,128",
    "4096:352:16:128:2,8,32,128",
    "2048:320:16:128:2,8,32,64",
    "4096:320:16:96:2,8,32,128",
)
CFGS = os.environ.get("T5_CFGS", ";".join(DEFAULT)).split(";")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hnsw_slim_tpu.graph.import_ref import slim_index_from_ref
    from hnsw_slim_tpu.index.bruteforce import BruteForceIndex
    from hnsw_slim_tpu.utils.data import clustered

    base, queries = clustered(N, DIM, n_queries=4096,
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

    for cfg in CFGS:
        parts = cfg.split(":")
        bs, ef, pop, scan, fs = parts[:5]
        seed = int(parts[5]) if len(parts) > 5 else 0
        b, ef, pop, scan = int(bs), int(ef), int(pop), int(scan)
        stages = tuple(int(x) for x in fs.split(","))
        q = queries[:b]
        idx.scfg = dataclasses.replace(
            idx.scfg, ef=ef, straggler_stages=stages,
            scan_width=scan, pop_width=pop, seed_width=seed,
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
        print(f"B={b:5d} ef={ef} pop={pop} scan={scan} f={fs} seed={seed}: "
              f"recall={recall(ids, gt[:b]):.4f} qps={b/dt:.0f} "
              f"hops={idx.last_stats['hops']} "
              f"dcomp={idx.last_stats['distance_computations']} "
              f"(compile+warm {warm:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
