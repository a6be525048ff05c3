// Parity benchmark harness: compiles the UNMODIFIED reference engine headers
// (mounted read-only at /root/reference) and runs build + slim conversion +
// search on a dataset, so the TPU engine can be compared against the actual
// reference implementation on identical data. This binary is evaluation
// tooling only — no reference code is incorporated into hnsw_slim_tpu.
//
// Usage:
//   ref_harness <base.fvecs> <query.fvecs> <out.ivecs> <mode: hnsw|slim>
//               <M> <efc> <ef> <k> [threads]
// Prints: build_ms, convert_ms (slim), index_bytes, solve_ms.

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>

#include "hnswlib/hnswlib.h"
#include "hnswlib/hnswalg_slim.h"

static std::vector<float> read_fvecs(const char* path, int& dim, int& num) {
  std::ifstream f(path, std::ios::binary);
  if (!f) { std::cerr << "cannot open " << path << "\n"; exit(1); }
  f.read(reinterpret_cast<char*>(&dim), 4);
  f.seekg(0, std::ios::end);
  const long long sz = f.tellg();
  const long long row = 4 + 4LL * dim;
  num = static_cast<int>(sz / row);
  std::vector<float> out(static_cast<size_t>(num) * dim);
  f.seekg(0);
  for (int i = 0; i < num; ++i) {
    int d;
    f.read(reinterpret_cast<char*>(&d), 4);
    f.read(reinterpret_cast<char*>(out.data() + static_cast<size_t>(i) * dim),
           4LL * dim);
  }
  return out;
}

static void write_ivecs(const char* path, const std::vector<int>& data,
                        int num, int k) {
  std::ofstream f(path, std::ios::binary);
  for (int i = 0; i < num; ++i) {
    f.write(reinterpret_cast<const char*>(&k), 4);
    f.write(reinterpret_cast<const char*>(data.data() + 1LL * i * k), 4LL * k);
  }
}

extern "C" int dump_slim_graph(hnswlib::HierarchicalNSWSlim<float>&, const char*);

using Clock = std::chrono::steady_clock;
static double ms_since(Clock::time_point t0) {
  return std::chrono::duration<double, std::milli>(Clock::now() - t0).count();
}

int main(int argc, char** argv) {
  if (argc < 9) {
    std::cerr << "usage: ref_harness base query out mode M efc ef k [threads]\n";
    return 2;
  }
  const char* base_path = argv[1];
  const char* query_path = argv[2];
  const char* out_path = argv[3];
  const std::string mode = argv[4];
  const int M = atoi(argv[5]);
  const int efc = atoi(argv[6]);
  const std::string ef_list = argv[7];  // comma-separated ef sweep
  const int k = atoi(argv[8]);

  int dim = 0, n = 0, qdim = 0, nq = 0;
  auto base = read_fvecs(base_path, dim, n);
  auto queries = read_fvecs(query_path, qdim, nq);

  hnswlib::L2Space space(dim);
  hnswlib::HierarchicalNSW<float> hnsw(&space, n, M, efc);

  auto t0 = Clock::now();
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < n; ++i) {
    hnsw.addPoint(base.data() + static_cast<size_t>(i) * dim, i);
  }
  printf("build_ms %.1f\n", ms_since(t0));
  printf("hnsw_index_bytes %zu\n", hnsw.indexSize());

  std::vector<int> results(static_cast<size_t>(nq) * k);

  if (mode == "slim") {
    hnswlib::HierarchicalNSWSlim<float> slim(
        &space, static_cast<size_t>(n), M, efc, /*threshold_level=*/0,
        /*top_degree_percent0=*/0.02f, /*top_degree_percent=*/0.02f,
        /*top_degree_M0=*/32, /*low_degree_m0=*/8,
        /*top_degree_M=*/16, /*low_degree_m=*/4);
    t0 = Clock::now();
    slim.convertFromHNSW(&hnsw);
    printf("convert_ms %.1f\n", ms_since(t0));
    printf("slim_index_bytes %zu\n", slim.indexSize());
    std::vector<unsigned> out(k);
    size_t pos = 0;
    while (pos < ef_list.size()) {
      size_t comma = ef_list.find(',', pos);
      if (comma == std::string::npos) comma = ef_list.size();
      const int ef = atoi(ef_list.substr(pos, comma - pos).c_str());
      pos = comma + 1;
      slim.setEf(ef);
      t0 = Clock::now();
      for (int i = 0; i < nq; ++i) {
        slim.searchKnn(queries.data() + static_cast<size_t>(i) * qdim, k,
                       out.data());
        for (int j = 0; j < k; ++j) results[1LL * i * k + j] = out[j];
      }
      printf("solve_ms_ef%d %.1f\n", ef, ms_since(t0));
      char path[512];
      snprintf(path, sizeof path, "%s.ef%d", out_path, ef);
      write_ivecs(path, results, nq, k);
    }
    if (argc > 9 && std::strlen(argv[9]) > 1) {
      dump_slim_graph(slim, argv[9]);
      printf("dumped %s\n", argv[9]);
    }
  } else {
    const int ef = atoi(ef_list.c_str());
    hnsw.setEf(ef);
    t0 = Clock::now();
    for (int i = 0; i < nq; ++i) {
      auto pq = hnsw.searchKnn(queries.data() + static_cast<size_t>(i) * qdim, k);
      for (int j = k - 1; j >= 0 && !pq.empty(); --j) {
        results[1LL * i * k + j] = static_cast<int>(pq.top().second);
        pq.pop();
      }
    }
    printf("solve_ms %.1f\n", ms_since(t0));
  }

  write_ivecs(out_path, results, nq, k);
  return 0;
}

// ---------------------------------------------------------------------------
// dump mode: export the reference-built slim CHAL graph so the TPU engine can
// serve the exact same graph (same-graph CPU-vs-TPU search comparison, and
// reference-scale builds without paying our device build path).
// Format: u32 magic 'HSLG' | u32 n | i32 maxlevel | u32 entry | i32 Lt |
//   u32 maxM | u32 maxM0 | per node: i32 level | u32 total |
//   u32 end_off[level+1] | i32 ids[total]
// ---------------------------------------------------------------------------
extern "C" int dump_slim_graph(hnswlib::HierarchicalNSWSlim<float>& slim,
                               const char* path) {
  std::ofstream f(path, std::ios::binary);
  const uint32_t magic = 0x48534C47;
  const uint32_t n = static_cast<uint32_t>(slim.cur_element_count_);
  const int32_t maxlevel = slim.maxlevel_;
  const uint32_t entry = static_cast<uint32_t>(slim.enterpoint_node_);
  const int32_t lt = slim.threshold_level_;
  const uint32_t mm = static_cast<uint32_t>(slim.maxM_);
  const uint32_t mm0 = static_cast<uint32_t>(slim.maxM0_);
  f.write(reinterpret_cast<const char*>(&magic), 4);
  f.write(reinterpret_cast<const char*>(&n), 4);
  f.write(reinterpret_cast<const char*>(&maxlevel), 4);
  f.write(reinterpret_cast<const char*>(&entry), 4);
  f.write(reinterpret_cast<const char*>(&lt), 4);
  f.write(reinterpret_cast<const char*>(&mm), 4);
  f.write(reinterpret_cast<const char*>(&mm0), 4);
  for (uint32_t i = 0; i < n; ++i) {
    char* element = slim.elements_ + 1ULL * i * slim.size_data_per_element_;
    const int32_t lv = static_cast<int32_t>(slim.get_element_level(element));
    const uint32_t total = slim.get_total_neighbor(element);
    f.write(reinterpret_cast<const char*>(&lv), 4);
    f.write(reinterpret_cast<const char*>(&total), 4);
    char* nbrs = slim.get_neighbors(element);
    std::vector<uint32_t> ends(lv + 1, 0);
    if (nbrs != nullptr) {
      for (int32_t l = 0; l < lv; ++l) {
        ends[l] = reinterpret_cast<hnswlib::offsetint*>(nbrs)[l];
      }
    }
    ends[lv] = total;
    f.write(reinterpret_cast<const char*>(ends.data()), 4LL * (lv + 1));
    if (total > 0 && nbrs != nullptr) {
      const auto* ids = reinterpret_cast<const int32_t*>(
          nbrs + sizeof(hnswlib::offsetint) * lv);
      f.write(reinterpret_cast<const char*>(ids), 4LL * total);
    }
  }
  return 0;
}
