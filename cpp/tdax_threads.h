// tdax_threads.h — shared threading + profiling helpers for the native
// Rips engines (tdax_rips.cc dense f64/f32, tdax_rips_sparse.cc CSR).
//
// TDAX_THREADS env overrides the worker count; default = hardware
// concurrency.  Every parallel phase in the engines is embarrassingly
// parallel over disjoint chunks (apparent-pair detection is a pure
// function of the filtration, not of the pivot map), so there are no
// locks anywhere.

#ifndef TDAX_THREADS_H_
#define TDAX_THREADS_H_

#include <algorithm>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <thread>
#include <vector>

namespace tdax_threads {

inline int thread_count() {
  static int t = [] {
    const char* env = std::getenv("TDAX_THREADS");
    if (env) return std::max(1, atoi(env));
    unsigned hc = std::thread::hardware_concurrency();
    return hc ? static_cast<int>(hc) : 1;
  }();
  return t;
}

template <typename F>
void run_chunks(size_t n, size_t min_grain, F&& f) {
  int T = thread_count();
  if (T <= 1 || n < min_grain * 2) {
    f(0, n);
    return;
  }
  size_t chunk = (n + T - 1) / T;
  if (chunk < min_grain) {
    chunk = min_grain;
    T = static_cast<int>((n + chunk - 1) / chunk);
  }
  std::vector<std::thread> ths;
  ths.reserve(T);
  for (int t = 0; t < T; ++t) {
    size_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ths.emplace_back([&f, lo, hi] { f(lo, hi); });
  }
  for (auto& th : ths) th.join();
}

template <typename T, typename Cmp>
void parallel_sort(std::vector<T>& v, Cmp cmp) {
  int threads = thread_count();
  size_t n = v.size();
  if (threads <= 1 || n < (1u << 16)) {
    std::sort(v.begin(), v.end(), cmp);
    return;
  }
  // sort chunks in parallel, then inplace_merge pairwise
  size_t chunk = (n + threads - 1) / threads;
  std::vector<size_t> bounds{0};
  {
    std::vector<std::thread> ths;
    for (size_t lo = 0; lo < n; lo += chunk) {
      size_t hi = std::min(n, lo + chunk);
      bounds.push_back(hi);
      ths.emplace_back([&v, lo, hi, &cmp] {
        std::sort(v.begin() + lo, v.begin() + hi, cmp);
      });
    }
    for (auto& th : ths) th.join();
  }
  while (bounds.size() > 2) {
    std::vector<size_t> nb{0};
    std::vector<std::thread> ths;
    for (size_t i = 0; i + 2 < bounds.size(); i += 2) {
      size_t lo = bounds[i], mid = bounds[i + 1], hi = bounds[i + 2];
      ths.emplace_back([&v, lo, mid, hi, &cmp] {
        std::inplace_merge(v.begin() + lo, v.begin() + mid, v.begin() + hi,
                           cmp);
      });
      nb.push_back(hi);
    }
    if (bounds.size() % 2 == 0) nb.push_back(bounds.back());
    for (auto& th : ths) th.join();
    bounds.swap(nb);
  }
}

// stage profiling to stderr when TDAX_PROF is set
inline bool prof_enabled() {
  static bool p = std::getenv("TDAX_PROF") != nullptr;
  return p;
}

struct StageTimer {
  const char* tag;
  const char* name;
  std::chrono::steady_clock::time_point t0;
  StageTimer(const char* engine_tag, const char* n)
      : tag(engine_tag), name(n), t0(std::chrono::steady_clock::now()) {}
  ~StageTimer() {
    if (prof_enabled())
      fprintf(stderr, "[%s] %-22s %.3fs\n", tag, name,
              std::chrono::duration<double>(std::chrono::steady_clock::now() -
                                            t0).count());
  }
};

}  // namespace tdax_threads

#endif  // TDAX_THREADS_H_
