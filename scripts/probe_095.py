"""One-point QPS probe at the headline 0.95 operating point (ef=384) on the
cached reference-built 1M graph — fast end-to-end check for kernel edits
without bench.py's full ef ladder.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_095.py
Env: PB_EF (384), PB_AUTOTUNE (1), PB_POP / PB_CW (override knobs, skip
autotune when both set), PB_STAGES (e.g. "4,16").
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from hnsw_slim_tpu.graph.import_ref import slim_index_from_ref
    from hnsw_slim_tpu.utils.data import clustered
    from hnsw_slim_tpu.utils.io import read_ivecs

    N, DIM, NQ = 1_000_000, 128, 1024
    EF = int(os.environ.get("PB_EF", 384))
    base, queries = clustered(N, DIM, n_queries=NQ, n_clusters=N // 1000,
                              seed=7, scale=0.3)
    tag = f"/root/repo/.bench_cache/ref_{N}_{DIM}_{NQ}_v3"
    idx = slim_index_from_ref(f"{tag}.slimgraph", base)
    idx.densify_level0()
    idx.densify_upper()
    gt_path = f"{tag}_gt10.ivecs"
    if os.path.exists(gt_path):
        gt = read_ivecs(gt_path)[:, :10]
    else:
        from hnsw_slim_tpu.index.bruteforce import exact_topk
        from hnsw_slim_tpu.utils.io import write_ivecs
        _, gt = exact_topk(idx.vectors, idx.vn, queries, k=10, metric="l2",
                           n_valid=idx.graph.n)
        gt = np.asarray(gt)
        write_ivecs(gt_path, gt.astype(np.int32))

    stages = tuple(int(s) for s in
                   os.environ.get("PB_STAGES", "4,16").split(",") if s)
    idx.scfg = dataclasses.replace(idx.scfg, straggler_stages=stages)
    if os.environ.get("PB_POP") and os.environ.get("PB_CW"):
        idx.scfg = dataclasses.replace(
            idx.scfg, pop_width=int(os.environ["PB_POP"]),
            scan_width=int(os.environ["PB_CW"]))
        idx.set_ef(EF)
    elif os.environ.get("PB_AUTOTUNE", "1") == "1":
        t0 = time.time()
        tune = idx.autotune(EF)
        print(f"autotune ef={EF}: {tune['knobs']} ({time.time()-t0:.0f}s)",
              flush=True)
        idx.set_ef(EF)
    else:
        idx.set_ef(EF)

    _, ids = idx.search(queries, k=10)  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        idx.search(queries, k=10)
        times.append(time.perf_counter() - t0)
    ids = np.asarray(ids)
    rec = sum(len(set(a.tolist()) & set(b.tolist()))
              for a, b in zip(ids, gt)) / gt.size
    print(json.dumps({
        "ef": EF, "recall": round(rec, 4),
        "qps": round(NQ / min(times), 1),
        "pop_width": idx.scfg.pop_width, "scan_width": idx.scfg.scan_width,
        "stages": list(stages),
        "hops": idx.last_stats.get("hops"),
        "dcomp": idx.last_stats.get("distance_computations"),
    }), flush=True)


if __name__ == "__main__":
    main()
