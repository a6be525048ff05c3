"""Benchmark entry point (driver-run, real TPU).

Measures batched-search QPS at the smallest ef reaching recall@10 >= 0.95 on
a synthetic clustered dataset (SIFT-like: 128-d), against TWO baselines:

1. A LIVE reference baseline: parity/ref_harness compiles the unmodified
   reference C++ engine and runs the same sweep on the same data on this
   machine's CPU. The served graph is the reference's own exported slim
   graph, so the comparison isolates pure search-engine throughput on an
   identical index. vs_baseline = tpu_qps / reference_cpu_qps.
2. If the harness cannot build, falls back to the paper-interpolated
   constant (Table 5 client, ~4450 QPS @ 95% on SIFT-6M).

Compile-latency mitigations (this environment's remote compiler can stall
minutes-to-hours on cold programs): persistent XLA cache in .jax_cache/,
reference-built graph cached in .bench_cache/.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import subprocess
import sys
import time

N = int(os.environ.get("BENCH_N", 1_000_000))
DIM = int(os.environ.get("BENCH_DIM", 128))
NQ = int(os.environ.get("BENCH_NQ", 1024))
PAPER_BASELINE_QPS = 4450.0
REPO = os.path.dirname(os.path.abspath(__file__))
EFS = [32, 48, 64, 96, 128, 192]


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def recall(ids, gt):
    return sum(
        len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, gt)
    ) / gt.size


def build_harness():
    r = subprocess.run(
        ["make", "-C", os.path.join(REPO, "parity")], capture_output=True,
        timeout=300,
    )
    binary = os.path.join(REPO, "parity", "ref_harness")
    return binary if r.returncode == 0 and os.path.exists(binary) else None


def main():
    import jax

    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hnsw_slim_tpu.graph.import_ref import slim_index_from_ref
    from hnsw_slim_tpu.index.bruteforce import BruteForceIndex
    from hnsw_slim_tpu.utils.data import clustered
    from hnsw_slim_tpu.utils.io import read_ivecs, write_fvecs

    log(f"backend={jax.default_backend()} n={N} dim={DIM} nq={NQ}")
    base, queries = clustered(
        N, DIM, n_queries=NQ, n_clusters=max(64, N // 1000), seed=7
    )

    cdir = os.path.join(REPO, ".bench_cache")
    os.makedirs(cdir, exist_ok=True)
    tag = f"ref_{N}_{DIM}_{NQ}_v2"
    gpath = os.path.join(cdir, tag + ".slimgraph")
    spath = os.path.join(cdir, tag + ".json")

    harness = build_harness()
    ref = {}
    if harness and not (os.path.exists(gpath) and os.path.exists(spath)):
        bp = os.path.join(cdir, tag + "_b.fvecs")
        qp = os.path.join(cdir, tag + "_q.fvecs")
        rp = os.path.join(cdir, tag + "_r.ivecs")
        write_fvecs(bp, base)
        write_fvecs(qp, queries)
        out = subprocess.run(
            [harness, bp, qp, rp, "slim", "30", "128",
             ",".join(map(str, EFS)), "10", gpath],
            capture_output=True, text=True, timeout=1800,
        )
        if out.returncode == 0:
            stats = dict(
                l.split() for l in out.stdout.strip().splitlines()
                if len(l.split()) == 2
            )
            ref = {
                "build_ms": float(stats["build_ms"]),
                "convert_ms": float(stats["convert_ms"]),
                "index_bytes": int(stats["slim_index_bytes"]),
                "solve_ms": {
                    e: float(stats[f"solve_ms_ef{e}"]) for e in EFS
                    if f"solve_ms_ef{e}" in stats
                },
                "result_files": {e: f"{rp}.ef{e}" for e in EFS},
            }
            json.dump(ref, open(spath, "w"))
        else:
            log(f"reference harness failed: {out.stderr[-200:]}")
    elif os.path.exists(spath):
        ref = json.load(open(spath))
        ref["solve_ms"] = {int(k): v for k, v in ref["solve_ms"].items()}
        ref["result_files"] = {int(k): v for k, v in ref["result_files"].items()}

    bf = BruteForceIndex(base)
    _, gt = bf.search(queries, k=10)

    # reference operating point. Small N: smallest ef with recall >= 0.95.
    # Large N (>= 500k): matched-ef comparison at ef=64 — same graph + same
    # ef means provably identical traversal frontiers, so the ratio isolates
    # engine throughput.
    matched_ef = N >= 500_000
    target = 0.0 if matched_ef else 0.95
    ref_point = None
    if ref:
        for e in EFS:
            if e not in ref.get("solve_ms", {}):
                continue
            try:
                ids = read_ivecs(ref["result_files"][e])
            except FileNotFoundError:
                continue
            r = recall(ids, gt)
            q = NQ / (ref["solve_ms"][e] / 1e3)
            log(f"reference ef={e}: recall={r:.4f} qps={q:.0f} (1-core CPU)")
            if matched_ef and e == 64:
                ref_point = {"ef": e, "recall": r, "qps": q}
                break
            if not matched_ef and r >= target:
                ref_point = {"ef": e, "recall": r, "qps": q}
                break

    # TPU serves the reference-built graph (identical index)
    if ref and os.path.exists(gpath):
        idx = slim_index_from_ref(gpath, base)
        if os.environ.get("BENCH_DENSE0", "1") == "1":
            extra = idx.densify_level0()
            log(f"dense level-0 serving layout (+{extra/1e6:.0f} MB HBM)")
        log(f"serving reference-built graph ({idx.index_size()} bytes)")
    else:
        from hnsw_slim_tpu.config import HnswConfig, SlimConfig
        from hnsw_slim_tpu.index.hnsw import HnswIndex
        from hnsw_slim_tpu.index.slim import HnswSlimIndex

        t0 = time.perf_counter()
        h = HnswIndex(HnswConfig(M=30, ef_construction=128), strategy="nnd")
        h.build(base)
        idx = HnswSlimIndex.from_hnsw(h, SlimConfig.from_ratios())
        log(f"nnd build {time.perf_counter() - t0:.1f}s")

    best = None
    sweep = [64] if matched_ef else EFS
    for ef in sweep:
        idx.set_ef(ef)
        _, ids = idx.search(queries, k=10)  # compile + warm
        dt = min(_timed(idx.search, queries) for _ in range(3))
        r = recall(ids, gt)
        qps = NQ / dt
        log(f"tpu ef={ef}: recall={r:.4f} qps={qps:.0f}")
        best = {"ef": ef, "recall": r, "qps": qps}
        if not matched_ef and r >= 0.95:
            break

    baseline_qps = ref_point["qps"] if ref_point else PAPER_BASELINE_QPS
    out = {
        "metric": (
            f"qps@ef64_same_graph_synth{N//1000}k_d{DIM}" if matched_ef
            else f"qps@recall0.95_synth{N//1000}k_d{DIM}"
        ),
        "value": round(best["qps"], 1),
        "unit": "qps",
        "vs_baseline": round(best["qps"] / baseline_qps, 3),
        "baseline": "reference-c++-1core-same-data" if ref_point
        else "paper-table5-interpolated",
        "baseline_qps": round(baseline_qps, 1),
        "recall": round(best["recall"], 4),
        "ef": best["ef"],
        "ref_build_ms": ref.get("build_ms"),
        "index_bytes": int(idx.index_size()),
        "n": N,
        "dim": DIM,
        "batch": NQ,
    }
    print(json.dumps(out))


def _timed(search_fn, queries):
    t0 = time.perf_counter()
    search_fn(queries, k=10)
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
