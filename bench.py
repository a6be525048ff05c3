"""Benchmark entry point (driver-run, real TPU).

Builds an HNSW-Slim index over a synthetic clustered dataset (SIFT-like:
128-d), finds the smallest ef reaching recall@10 >= 0.95 against exact
ground truth, and reports batched-search QPS at that operating point.

Default N=20k keeps the run inside the already-cached XLA programs (the
remote compiler in this environment can stall for an hour on a cold
program); set BENCH_N=100000 for the larger sweep once its programs cache.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference's constrained-client QPS at 95% recall on SIFT-6M
(log-interpolated between Table 5's 9690 @ 90% and 2783 @ 98%, k=3) ≈ 4450.
Datasets/scales differ (synthetic 100k here vs SIFT-6M there), so
vs_baseline is indicative, not apples-to-apples; it tightens as the harness
grows into the real datasets.
"""

import json
import os
import sys
import time

def _timed(search_fn, queries):
    import time as _t

    t0 = _t.perf_counter()
    search_fn(queries, k=10)
    return _t.perf_counter() - t0


N = int(os.environ.get("BENCH_N", 20_000))
DIM = int(os.environ.get("BENCH_DIM", 128))
NQ = int(os.environ.get("BENCH_NQ", 1024))
BASELINE_QPS = 4450.0


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hnsw_slim_tpu.config import HnswConfig, SlimConfig
    from hnsw_slim_tpu.index.bruteforce import BruteForceIndex
    from hnsw_slim_tpu.index.hnsw import HnswIndex
    from hnsw_slim_tpu.index.slim import HnswSlimIndex
    from hnsw_slim_tpu.utils.data import clustered

    print(f"# backend={jax.default_backend()} n={N} dim={DIM}", file=sys.stderr)
    base, queries = clustered(
        N, DIM, n_queries=NQ, n_clusters=max(64, N // 1000), seed=7
    )

    # disk-cache the built index: remote-compile latency makes cold builds
    # slow; later rounds re-measure search on the same index (build_s is the
    # original measured build time, kept in a sidecar)
    from hnsw_slim_tpu.persist import checkpoint

    cdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    os.makedirs(cdir, exist_ok=True)
    tag = f"slim_{N}_{DIM}_v1"
    idx_path = os.path.join(cdir, tag + ".npz")
    meta_path = os.path.join(cdir, tag + ".json")
    if os.path.exists(idx_path) and os.path.exists(meta_path):
        slim = checkpoint.load_slim(idx_path)
        side = json.load(open(meta_path))
        build_s, convert_s = side["build_s"], side["convert_s"]
        print(f"# loaded cached index (orig build {build_s:.1f}s)",
              file=sys.stderr)
    else:
        t0 = time.perf_counter()
        hnsw = HnswIndex(HnswConfig(M=30, ef_construction=128), strategy="nnd")
        hnsw.build(base)
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        slim = HnswSlimIndex.from_hnsw(hnsw, SlimConfig.from_ratios())
        convert_s = time.perf_counter() - t0
        checkpoint.save_slim(idx_path, slim)
        json.dump({"build_s": build_s, "convert_s": convert_s},
                  open(meta_path, "w"))
        print(f"# build {build_s:.1f}s convert {convert_s:.1f}s",
              file=sys.stderr)

    bf = BruteForceIndex(base)
    _, gt = bf.search(queries, k=10)

    best = None
    for ef in (32, 48, 64, 96, 128, 192, 256):
        slim.set_ef(ef)
        _, ids = slim.search(queries, k=10)  # compile + warm
        dt = min(  # best-of-3: the tunnel adds large run-to-run variance
            _timed(slim.search, queries)
            for _ in range(3)
        )
        hits = sum(
            len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, gt)
        )
        recall = hits / gt.size
        qps = NQ / dt
        print(f"# ef={ef} recall={recall:.4f} qps={qps:.0f}", file=sys.stderr)
        best = {"ef": ef, "recall": recall, "qps": qps}
        if recall >= 0.95:
            break

    out = {
        "metric": f"qps@recall0.95_synth{N//1000}k_d{DIM}",
        "value": round(best["qps"], 1),
        "unit": "qps",
        "vs_baseline": round(best["qps"] / BASELINE_QPS, 3),
        "recall": round(best["recall"], 4),
        "ef": best["ef"],
        "build_s": round(build_s, 1),
        "convert_s": round(convert_s, 1),
        "index_bytes": slim.index_size(),
        "n": N,
        "dim": DIM,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
