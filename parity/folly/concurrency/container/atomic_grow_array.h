// Minimal stand-in for folly::atomic_grow_array, used ONLY to compile the
// read-only reference headers for the parity benchmark harness
// (parity/ref_harness.cc). The reference uses nothing but operator[] with
// concurrent growth (hnswalg_slim.h:74-75, 1361-1375); this shim provides
// exactly that via lazily-allocated fixed-size segments.
#pragma once

#include <atomic>
#include <cstddef>
#include <mutex>
#include <vector>

namespace folly {

template <typename T>
class atomic_grow_array {
  static constexpr size_t kSegBits = 16;  // 65536 entries per segment
  static constexpr size_t kSegSize = 1ULL << kSegBits;
  static constexpr size_t kMaxSegs = 1ULL << 15;

 public:
  atomic_grow_array() : segs_(kMaxSegs) {
    for (auto& s : segs_) s.store(nullptr, std::memory_order_relaxed);
  }
  ~atomic_grow_array() {
    for (auto& s : segs_) delete[] s.load(std::memory_order_relaxed);
  }
  atomic_grow_array(const atomic_grow_array&) = delete;
  atomic_grow_array& operator=(const atomic_grow_array&) = delete;

  T& operator[](size_t i) {
    const size_t seg = i >> kSegBits;
    T* p = segs_[seg].load(std::memory_order_acquire);
    if (p == nullptr) {
      std::lock_guard<std::mutex> g(grow_mu_);
      p = segs_[seg].load(std::memory_order_acquire);
      if (p == nullptr) {
        p = new T[kSegSize]();
        segs_[seg].store(p, std::memory_order_release);
      }
    }
    return p[i & (kSegSize - 1)];
  }

 private:
  std::vector<std::atomic<T*>> segs_;
  std::mutex grow_mu_;
};

}  // namespace folly
