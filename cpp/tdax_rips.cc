// tdax_rips.cc — native Vietoris–Rips persistent (co)homology engine.
//
// From-scratch implementation of the ripser-class algorithm family
// (persistent cohomology + clearing + emergent-pair shortcut), built as
// the TPU framework's counterpart of the reference's ripser C++
// dependency (SURVEY §2.2, §2.3): the TPU computes the distance matrix
// (tdax.ops.distances); this engine does the irregular combinatorial
// reduction the MXU can't express.
//
// Algorithm outline:
//   dim 0:  union-find over edges sorted ascending by (diameter, index);
//           non-merging edges become the dim-1 columns (clearing).
//   dim p:  p-simplex columns processed in decreasing (diameter, index);
//           pivot = minimal-(diameter, index) (p+1)-cofacet; emergent
//           shortcut claims an equal-diameter unowned pivot during the
//           first enumeration pass; otherwise full heap reduction with
//           V-column re-expansion.  Pivots clear dimension p+1.
//   thresh=inf uses the enclosing radius min_i max_j d(i,j).
//
// Z/2 coefficients.  Pairs with death <= birth are not emitted
// (ripser's ratio=1 behavior); essential classes emit death = -1.
//
// C API (ctypes): tdax_rips_dense(dist, n, maxdim, thresh, &out, &len)
// writes malloc'd records (dim, birth, death)*; tdax_free releases.

#include <algorithm>
#ifdef TDAX_PROF
#include <chrono>
#endif
#include <cmath>
#include <functional>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <limits>
#include <queue>
#include <thread>
#include <vector>

#include "tdax_threads.h"

// Value-type parameterization: the same TU compiles as the f64 engine
// (default) or, with TDAX_VALUE_T/TDAX_ENTRY set, as the f32 engine
// (cpp/tdax_rips_f32.cc).  The engine only compares and maxes distance
// values — never rounds — so the f32 instantiation is exactly as
// accurate on float32-derived inputs while halving memory traffic
// (this box is single-core and bandwidth-bound).
#ifndef TDAX_VALUE_T
#define TDAX_VALUE_T double
#define TDAX_ENTRY tdax_rips_dense
#define TDAX_DEFINE_FREE 1
#endif

namespace {

using tdax_threads::parallel_sort;
using tdax_threads::run_chunks;
using tdax_threads::thread_count;

using index_t = int64_t;
using value_t = TDAX_VALUE_T;

constexpr value_t kInf = std::numeric_limits<value_t>::infinity();

struct DiamIdx {
  value_t diam;
  index_t idx;
};

inline bool ascending(const DiamIdx& a, const DiamIdx& b) {
  return a.diam < b.diam || (a.diam == b.diam && a.idx < b.idx);
}

struct HeapGreater {  // min-heap on (diam, idx)
  bool operator()(const DiamIdx& a, const DiamIdx& b) const {
    return ascending(b, a);
  }
};

// --- binomial table ---------------------------------------------------------

class Binomial {
 public:
  Binomial(index_t n, index_t k) : n_(n + 1), k_(k + 1), tab_(n_ * k_, 0) {
    for (index_t i = 0; i < n_; ++i) {
      tab_[i * k_] = 1;
      for (index_t j = 1; j < std::min(i + 1, k_); ++j)
        tab_[i * k_ + j] = tab_[(i - 1) * k_ + j - 1] + tab_[(i - 1) * k_ + j];
    }
  }
  inline index_t operator()(index_t i, index_t j) const {
    if (j < 0 || j >= k_ || i < j) return (j == 0) ? 1 : 0;
    return tab_[i * k_ + j];
  }

 private:
  index_t n_, k_;
  std::vector<index_t> tab_;
};

// --- flat open-addressing pivot map (idx -> column id) -----------------------

class PivotMap {
 public:
  explicit PivotMap(size_t expected) {
    size_t cap = 64;
    while (cap < expected * 2) cap <<= 1;
    mask_ = cap - 1;
    keys_.assign(cap, kEmpty);
    vals_.resize(cap);
  }
  // returns column id or -1
  inline int64_t find(index_t key) const {
    size_t h = hash(key);
    while (true) {
      index_t k = keys_[h];
      if (k == kEmpty) return -1;
      if (k == key) return vals_[h];
      h = (h + 1) & mask_;
    }
  }
  inline void insert(index_t key, int64_t val) {
    if ((size_ + 1) * 3 > (mask_ + 1) * 2) grow();
    size_t h = hash(key);
    while (keys_[h] != kEmpty) {
      if (keys_[h] == key) { vals_[h] = val; return; }
      h = (h + 1) & mask_;
    }
    keys_[h] = key;
    vals_[h] = val;
    ++size_;
  }
  template <typename F>
  void for_each(F&& f) const {
    for (size_t i = 0; i <= mask_; ++i)
      if (keys_[i] != kEmpty) f(keys_[i], vals_[i]);
  }
  size_t size() const { return size_; }

 private:
  static constexpr index_t kEmpty = -1;
  inline size_t hash(index_t key) const {
    uint64_t x = static_cast<uint64_t>(key);
    x ^= x >> 33; x *= 0xff51afd7ed558ccdULL; x ^= x >> 33;
    return static_cast<size_t>(x) & mask_;
  }
  void grow() {
    size_t cap = (mask_ + 1) << 1;
    std::vector<index_t> nk(cap, kEmpty);
    std::vector<int64_t> nv(cap);
    size_t om = mask_;
    mask_ = cap - 1;
    for (size_t i = 0; i <= om; ++i) {
      if (keys_[i] == kEmpty) continue;
      size_t h = hash(keys_[i]);
      while (nk[h] != kEmpty) h = (h + 1) & mask_;
      nk[h] = keys_[i];
      nv[h] = vals_[i];
    }
    keys_.swap(nk);
    vals_.swap(nv);
  }
  size_t mask_, size_ = 0;
  std::vector<index_t> keys_;
  std::vector<int64_t> vals_;
};

// --- adjacency bitsets --------------------------------------------------------

class Adjacency {
 public:
  Adjacency(const value_t* dist, index_t n, value_t thresh)
      : n_(n), words_(static_cast<size_t>((n + 63) / 64)), bits_(words_ * n, 0) {
    for (index_t i = 0; i < n; ++i)
      for (index_t j = 0; j < n; ++j)
        if (i != j && dist[i * n + j] <= thresh)
          bits_[i * words_ + (j >> 6)] |= (1ULL << (j & 63));
  }
  const uint64_t* row(index_t v) const { return bits_.data() + v * words_; }
  size_t words() const { return words_; }

 private:
  index_t n_;
  size_t words_;
  std::vector<uint64_t> bits_;
};

// --- engine ----------------------------------------------------------------

struct Bar {
  int32_t dim;
  value_t birth, death;  // death = -1 encodes +inf
};

class RipsEngine {
 public:
  RipsEngine(const value_t* dist, index_t n, int maxdim, value_t thresh)
      : dist_(dist), n_(n), maxdim_(maxdim),
        binom_(std::max<index_t>(n, 2), maxdim + 3) {
    if (std::isinf(thresh)) {
      essential_allowed_ = false;
      thresh_ = enclosing_radius();
    } else {
      essential_allowed_ = true;
      thresh_ = thresh;
    }
    adj_ = new Adjacency(dist_, n_, thresh_);
  }
  ~RipsEngine() { delete adj_; }

  std::vector<Bar> run() {
    std::vector<Bar> bars;
    std::vector<DiamIdx> columns = dim0(bars);
    for (int p = 1; p <= maxdim_; ++p) {
      PivotMap pivots(columns.size() + 16);
      reduce_dimension(p, columns, bars, pivots);
      if (p < maxdim_) columns = assemble_columns(p + 1, pivots);
    }
    return bars;
  }

 private:
  inline value_t d(index_t i, index_t j) const { return dist_[i * n_ + j]; }

  value_t enclosing_radius() const {
    value_t r = kInf;
    for (index_t i = 0; i < n_; ++i) {
      value_t m = 0;
      for (index_t j = 0; j < n_; ++j) m = std::max(m, d(i, j));
      r = std::min(r, m);
    }
    return r;
  }

  inline index_t edge_index(index_t i, index_t j) const {  // i < j
    return binom_(j, 2) + i;
  }

  // largest v <= hi with binom(v, k) <= idx, seeded by the closed-form
  // float inversion of v^k/k! ~= idx with integer fix-up loops (exact;
  // the float seed is off by at most a step or two) — replaces the
  // ~17-iteration binary search, which decode runs per column per
  // dimension (see the sparse engine for the measured impact at scale).
  inline index_t max_vertex(index_t idx, int k, index_t hi) const {
    index_t v;
    switch (k) {
      case 1:
        v = idx < hi ? idx : hi;
        break;
      case 2:
        v = static_cast<index_t>(
            (1.0 + std::sqrt(1.0 + 8.0 * static_cast<double>(idx))) * 0.5);
        break;
      case 3:
        v = static_cast<index_t>(
            std::cbrt(6.0 * static_cast<double>(idx)) + 1.0);
        break;
      default: {  // k == 4 (H3 columns): plain binary search
        index_t lo = k - 1;  // binom(k-1, k) == 0 <= idx always holds
        while (lo < hi) {
          index_t mid = (lo + hi + 1) >> 1;
          if (binom_(mid, k) <= idx) lo = mid; else hi = mid - 1;
        }
        return lo;
      }
    }
    if (v > hi) v = hi;
    if (v < k - 1) v = k - 1;
    while (binom_(v, k) > idx) --v;          // float seed may overshoot
    while (v < hi && binom_(v + 1, k) <= idx) ++v;  // or undershoot
    return v;
  }

  void decode(index_t idx, int dim, index_t* verts) const {
    // verts filled descending: verts[0] = largest vertex
    index_t hi = n_ - 1;
    for (int k = dim + 1; k > 0; --k) {
      index_t lo = max_vertex(idx, k, hi);
      verts[dim + 1 - k] = lo;
      idx -= binom_(lo, k);
      hi = lo - 1;
    }
  }

  inline index_t encode(const index_t* verts, int count) const {
    // verts descending
    index_t idx = 0;
    for (int i = 0; i < count; ++i) idx += binom_(verts[i], count - i);
    return idx;
  }

  // --- dim 0: union-find ----------------------------------------------------

  struct UF {
    std::vector<index_t> parent;
    explicit UF(index_t n) : parent(n) {
      for (index_t i = 0; i < n; ++i) parent[i] = i;
    }
    index_t find(index_t x) {
      index_t r = x;
      while (parent[r] != r) r = parent[r];
      while (parent[x] != r) { index_t nx = parent[x]; parent[x] = r; x = nx; }
      return r;
    }
    bool unite(index_t a, index_t b) {
      index_t ra = find(a), rb = find(b);
      if (ra == rb) return false;
      parent[ra] = rb;
      return true;
    }
  };

  std::vector<DiamIdx> dim0(std::vector<Bar>& bars) {
    std::vector<DiamIdx> edges;
    edges.reserve(static_cast<size_t>(n_) * (n_ - 1) / 2 / 4 + 16);
    for (index_t j = 1; j < n_; ++j)
      for (index_t i = 0; i < j; ++i) {
        value_t dij = d(i, j);
        if (dij <= thresh_) edges.push_back({dij, edge_index(i, j)});
      }
    parallel_sort(edges, [](const DiamIdx& a, const DiamIdx& b) {
      return ascending(a, b);
    });

    UF uf(n_);
    std::vector<DiamIdx> positive;
    positive.reserve(edges.size());
    index_t verts[2];
    for (const DiamIdx& e : edges) {
      decode(e.idx, 1, verts);
      if (uf.unite(verts[1], verts[0])) {
        if (e.diam > 0) bars.push_back({0, 0.0, e.diam});
      } else {
        positive.push_back(e);
      }
    }
    index_t n_comp = 0;
    for (index_t v = 0; v < n_; ++v)
      if (uf.find(v) == v) ++n_comp;
    for (index_t c = 0; c < n_comp; ++c) bars.push_back({0, 0.0, -1.0});
    return positive;
  }

  // --- cofacet enumeration ----------------------------------------------------
  // Push all (p+1)-cofacets of a p-simplex into the heap.  Uses adjacency
  // bitset intersection of the simplex's vertices; ascending w order is
  // ascending colex index order.

  template <typename Push>
  void enumerate_cofacets(index_t idx, value_t simplex_diam, int p,
                          Push&& push) const {
    index_t verts[4];  // descending, p+1 entries (p <= 2 columns here)
    decode(idx, p, verts);
    size_t words = adj_->words();
    scratch_.resize(words);
    const uint64_t* r0 = adj_->row(verts[0]);
    std::memcpy(scratch_.data(), r0, words * sizeof(uint64_t));
    for (int i = 1; i <= p; ++i) {
      const uint64_t* ri = adj_->row(verts[i]);
      for (size_t w = 0; w < words; ++w) scratch_[w] &= ri[w];
    }
    index_t nverts[5];
    for (size_t wi = 0; wi < words; ++wi) {
      uint64_t bitsw = scratch_[wi];
      while (bitsw) {
        index_t w = static_cast<index_t>(wi * 64 + __builtin_ctzll(bitsw));
        bitsw &= bitsw - 1;
        // diameter of cofacet = max(facet diameter, new-vertex distances)
        value_t diam = simplex_diam;
        for (int i = 0; i <= p; ++i) diam = std::max(diam, d(verts[i], w));
        // merge w into descending verts
        int pos = 0;
        while (pos <= p && verts[pos] > w) { nverts[pos] = verts[pos]; ++pos; }
        nverts[pos] = w;
        for (int i = pos; i <= p; ++i) nverts[i + 1] = verts[i];
        index_t cidx = encode(nverts, p + 2);
        if (!push(diam, cidx)) return;  // early exit (emergent shortcut)
      }
    }
  }

  // Phase-A probe: find the FIRST (ascending w == ascending colex)
  // cofacet with diameter equal to the simplex diameter — the minimal
  // (diam, idx) entry of the raw coboundary whenever an equal-diameter
  // cofacet exists — touching only the p+1 contiguous distance rows;
  // no bitsets, no per-w encode.  Independent of the pivot map, so it
  // parallelizes over columns.  With check_apparent, additionally test
  // the apparent-pair condition (σ is also the maximal equal-diameter
  // facet of τ): apparent pairs are persistence pairs of the
  // filtration, claimable without any map lookup.
  void find_candidate(const DiamIdx& col, int p, bool check_apparent,
                      index_t* out_cand, uint8_t* out_apparent) const {
    index_t verts[4];
    decode(col.idx, p, verts);
    const value_t* rows[4];
    for (int i = 0; i <= p; ++i) rows[i] = dist_ + verts[i] * n_;
    *out_cand = -1;
    *out_apparent = 0;
    index_t w_found = -1;
    for (index_t w = 0; w < n_; ++w) {
      value_t m = rows[0][w];
      for (int i = 1; i <= p; ++i) m = std::max(m, rows[i][w]);
      if (m > col.diam) continue;  // cofacet diam = max(diam, m) > diam
      bool member = false;
      for (int i = 0; i <= p; ++i) member |= (w == verts[i]);
      if (member) continue;
      w_found = w;
      break;
    }
    if (w_found < 0) return;
    index_t tv[5];
    int pos = 0;
    while (pos <= p && verts[pos] > w_found) { tv[pos] = verts[pos]; ++pos; }
    tv[pos] = w_found;
    for (int i = pos; i <= p; ++i) tv[i + 1] = verts[i];
    *out_cand = encode(tv, p + 2);
    if (!check_apparent) return;  // one map lookup beats the facet scan

    const int m = p + 2;  // τ vertex count; facet diam <= τ diam always
    index_t fv[4];
    for (int u = 0; u < m; ++u) {
      if (tv[u] == w_found) continue;  // that facet IS σ
      value_t fdiam = 0;
      for (int i = 0; i < m; ++i) {
        if (i == u) continue;
        for (int j = i + 1; j < m; ++j)
          if (j != u) fdiam = std::max(fdiam, d(tv[i], tv[j]));
      }
      if (fdiam != col.diam) continue;
      int k = 0;
      for (int i = 0; i < m; ++i)
        if (i != u) fv[k++] = tv[i];
      if (encode(fv, p + 1) > col.idx) return;  // σ not maximal
    }
    *out_apparent = 1;
  }

  // --- reduction ----------------------------------------------------------------

  // Lazy working column: a k-way merge over SORTED runs instead of an
  // eager element heap (same design as the sparse engine's LazyCol —
  // see tdax_rips_sparse.cc).  Most eagerly-heaped elements were never
  // popped: chains settle long before consuming the stored remainders
  // they splice in, so copying each remainder into the heap plus the
  // O(heap) re-heapify per splice and the periodic mod-2 compaction
  // sorts were almost entirely wasted motion.  An insert is one cursor
  // push (stored remainders referenced ZERO-COPY; immutable once
  // stored); the merge pops equal (diam, idx) entries adjacently —
  // within a run elements are strictly increasing, so all copies of a
  // value head distinct runs simultaneously — making pop_pivot's
  // pairwise mod-2 cancellation identical to the eager heap's.
  struct LazyCol {
    struct Cursor {
      DiamIdx head;
      const DiamIdx* pos;  // next element after head (may equal end)
      const DiamIdx* end;
    };
    std::vector<Cursor> cur;                  // min-heap on head
    std::vector<std::vector<DiamIdx>> owned;  // column-local run storage

    static bool cur_after(const Cursor& a, const Cursor& b) {
      return ascending(b.head, a.head);  // min-heap via max-comparator
    }
    void clear() {
      cur.clear();
      owned.clear();
    }
    bool empty() const { return cur.empty(); }
    size_t size() const { return cur.size(); }  // run count (debug only)
    DiamIdx pop() {
      std::pop_heap(cur.begin(), cur.end(), cur_after);
      Cursor& c = cur.back();
      DiamIdx out = c.head;
      if (c.pos != c.end) {
        c.head = *c.pos++;
        std::push_heap(cur.begin(), cur.end(), cur_after);
      } else {
        cur.pop_back();
      }
      return out;
    }
    // add a sorted ascending run by reference; [b, e) must stay valid
    // and unmodified for the lifetime of this column
    void add_sorted_ref(const DiamIdx* b, const DiamIdx* e) {
      if (b == e) return;
      cur.push_back({*b, b + 1, e});
      std::push_heap(cur.begin(), cur.end(), cur_after);
    }
    void add_sorted_own(std::vector<DiamIdx>&& v) {
      if (v.empty()) return;
      owned.push_back(std::move(v));
      const std::vector<DiamIdx>& s = owned.back();
      add_sorted_ref(s.data(), s.data() + s.size());
    }
    // single element: the cursor's head IS the storage (pos == end)
    void add_single(const DiamIdx& e) {
      cur.push_back({e, nullptr, nullptr});
      std::push_heap(cur.begin(), cur.end(), cur_after);
    }
    // pop the minimal surviving entry mod 2 (equal pairs cancel)
    bool pop_pivot(DiamIdx& out) {
      while (!cur.empty()) {
        DiamIdx t = pop();
        if (!cur.empty() && cur.front().head.idx == t.idx &&
            cur.front().head.diam == t.diam) {
          pop();
          continue;
        }
        out = t;
        return true;
      }
      return false;
    }
    // drain the remaining content into a sorted mod-2-compacted vector.
    // Shortest-first pairwise std::merge over the already-sorted runs
    // (~n log k, k = live runs) instead of re-sorting a flat copy; a
    // backed cursor's remaining run is the contiguous [pos-1, end)
    // since head == *(pos-1), and single-element pivots form one
    // ascending run (pops strictly increase along a chain).  Mod-2
    // cancellation happens in the final copy — equal entries are
    // adjacent after merging.
    std::vector<DiamIdx> materialize() {
      struct Run {
        const DiamIdx* b;
        const DiamIdx* e;
        size_t len() const { return static_cast<size_t>(e - b); }
      };
      std::vector<Run> runs;
      std::vector<DiamIdx> singles;
      runs.reserve(cur.size());
      for (const Cursor& c : cur) {
        if (c.pos == nullptr) singles.push_back(c.head);
        else runs.push_back({c.pos - 1, c.end});
      }
      std::sort(singles.begin(), singles.end(), ascending);  // insurance
      if (!singles.empty())
        runs.push_back({singles.data(), singles.data() + singles.size()});
      std::deque<std::vector<DiamIdx>> scratch;
      while (runs.size() > 1) {
        size_t a = 0, b = 1;
        if (runs[b].len() < runs[a].len()) std::swap(a, b);
        for (size_t i = 2; i < runs.size(); ++i) {
          if (runs[i].len() < runs[a].len()) { b = a; a = i; }
          else if (runs[i].len() < runs[b].len()) b = i;
        }
        scratch.emplace_back(runs[a].len() + runs[b].len());
        std::vector<DiamIdx>& m = scratch.back();
        std::merge(runs[a].b, runs[a].e, runs[b].b, runs[b].e, m.begin(),
                   ascending);
        runs[a] = {m.data(), m.data() + m.size()};
        runs.erase(runs.begin() + b);
      }
      std::vector<DiamIdx> out;
      if (!runs.empty()) {
        const Run r = runs[0];
        out.reserve(r.len());
        for (const DiamIdx* i = r.b; i != r.e;) {
          if (i + 1 != r.e && i->idx == (i + 1)->idx &&
              i->diam == (i + 1)->diam) {
            i += 2;  // cancelled mod-2 pair
            continue;
          }
          out.push_back(*i++);
        }
      }
      cur.clear();
      owned.clear();
      return out;
    }
  };

  void reduce_dimension(int p, std::vector<DiamIdx>& columns,
                        std::vector<Bar>& bars, PivotMap& pivots) {
    // decreasing (diam, idx)
    parallel_sort(columns, [](const DiamIdx& a, const DiamIdx& b) {
      return ascending(b, a);
    });

    // Phase A (parallel, lock-free): the minimal raw coboundary entry
    // of each column when an equal-diameter cofacet exists, plus the
    // apparent-pair flag under multithreading — a pure function of the
    // filtration, independent of the pivot map.
    const bool check_apparent = thread_count() > 1;
    std::vector<index_t> cand(columns.size());
    std::vector<uint8_t> apparent(columns.size());
#ifdef TDAX_PROF
    auto _t0 = std::chrono::steady_clock::now();
#endif
    run_chunks(columns.size(), 1024, [&](size_t lo, size_t hi) {
      for (size_t ci = lo; ci < hi; ++ci)
        find_candidate(columns[ci], p, check_apparent,
                       &cand[ci], &apparent[ci]);
    });
#ifdef TDAX_PROF
    prof_probe += std::chrono::duration<double>(
        std::chrono::steady_clock::now() - _t0).count();
    prof_cols += static_cast<long>(columns.size());
#endif

    // Phase B (sequential commit): per claimed pivot id, the source
    // column and — for full-reduced columns — the REMAINDER of the
    // working coboundary after its pivot was popped, moved out of the
    // heap in O(1).  A later column colliding on that pivot pushes the
    // stored remainder directly instead of re-enumerating the cofacets
    // of the owner's whole V-column (which made long chains quadratic).
    std::vector<DiamIdx> owner_col;
    std::vector<std::vector<DiamIdx>> owner_rem;
    // owner_stored: 0 = unreduced claim (R = raw coboundary), 1 =
    // materialized remainder, 2 = FROZEN remainder — the claim-time
    // working column kept as-is; a large share of remainders are never
    // referenced again, so the copy + sort + mod-2 compaction is
    // deferred until first use (memoized to state 1).  Phase B is
    // sequential here, so freezing is unconditionally sound (see the
    // sparse engine for the invariant argument).
    std::vector<uint8_t> owner_stored;
    std::vector<int64_t> owner_frozen;
    std::deque<LazyCol> frozen_store;
    owner_col.reserve(columns.size());
    owner_rem.reserve(columns.size());
    owner_stored.reserve(columns.size());
    owner_frozen.reserve(columns.size());

    auto ensure_materialized = [&](int64_t owner) {
      if (owner_stored[owner] != 2) return;
      owner_rem[owner] = frozen_store[owner_frozen[owner]].materialize();
      owner_stored[owner] = 1;
    };

    LazyCol heap;
    for (size_t ci = 0; ci < columns.size(); ++ci) {
      const DiamIdx col = columns[ci];
#ifdef TDAX_DEBUG_STAGE
      TDAX_DEBUG_STAGE("column start");
#endif
      // apparent pairs skip even the map lookup; otherwise the cached
      // candidate is emergent iff still unowned (the first equal-diam
      // cofacet is the minimal raw entry, so no re-enumeration needed)
      if (cand[ci] >= 0 && (apparent[ci] || pivots.find(cand[ci]) < 0)) {
#ifdef TDAX_PROF
        prof_emergent += 1;
#endif
        owner_col.push_back(col);
        owner_rem.emplace_back();
        owner_stored.push_back(0);
        owner_frozen.push_back(-1);
        pivots.insert(cand[ci], static_cast<int64_t>(owner_col.size() - 1));
        continue;  // death == birth: no bar emitted
      }

      // full reduction: seed the lazy column with the sorted coboundary
#ifdef TDAX_PROF
      auto _t1 = std::chrono::steady_clock::now();
#endif
      heap.clear();
      {
        std::vector<DiamIdx> cob;
        enumerate_cofacets(col.idx, col.diam, p,
                           [&](value_t diam, index_t cidx) {
          if (diam <= thresh_) cob.push_back({diam, cidx});
          return true;
        });
        std::sort(cob.begin(), cob.end(), ascending);
        heap.add_sorted_own(std::move(cob));
      }
#ifdef TDAX_PROF
      prof_phase2_init += std::chrono::duration<double>(
          std::chrono::steady_clock::now() - _t1).count();
      _t1 = std::chrono::steady_clock::now();
#endif

      long dbg_iters = 0;
      (void)dbg_iters;
      while (true) {
        DiamIdx pivot;
        if (!heap.pop_pivot(pivot)) {
          // zero column: essential class.  Impossible under the
          // enclosing-radius mode (the complex cones off) — flag the
          // invariant violation so the caller fails loudly instead of
          // silently emitting a bogus infinite bar (mirrors the python
          // oracle's AssertionError).  Owns no pivot, so it never
          // participates in later additions.
          if (!essential_allowed_) invariant_violation_ = true;
          bars.push_back({static_cast<int32_t>(p), col.diam,
                          static_cast<value_t>(-1.0)});
          break;
        }
#ifdef TDAX_DEBUG_HOOK
        ++dbg_iters;
        TDAX_DEBUG_HOOK(col, dbg_iters, heap.size(), 0, pivot.diam, pivot.idx);
#endif
        int64_t owner = pivots.find(pivot.idx);
        if (owner < 0) {
          owner_col.push_back(col);
          // freeze the working column ≡ R(col) \ {pivot}; materialized
          // lazily on first reference (often never)
          frozen_store.emplace_back(std::move(heap));
          heap = LazyCol();
          owner_rem.emplace_back();
          owner_stored.push_back(2);
          owner_frozen.push_back(
              static_cast<int64_t>(frozen_store.size() - 1));
          pivots.insert(pivot.idx, static_cast<int64_t>(owner_col.size() - 1));
          if (pivot.diam > col.diam)
            bars.push_back({static_cast<int32_t>(p), col.diam, pivot.diam});
#ifdef TDAX_PROF
          prof_reduce += std::chrono::duration<double>(
              std::chrono::steady_clock::now() - _t1).count();
#endif
          break;
        }
#ifdef TDAX_PROF
        prof_additions += 1;
#endif
        ensure_materialized(owner);
        if (owner_stored[owner]) {
          // W_new = (W \ {pivot}) + (R_owner \ {pivot}): the two pivot
          // copies cancel mod 2, so neither is re-added; the stored
          // remainder is referenced zero-copy
          const std::vector<DiamIdx>& rem = owner_rem[owner];
          heap.add_sorted_ref(rem.data(), rem.data() + rem.size());
        } else {
          // claimed column: its R is the raw coboundary of its simplex,
          // which regenerates the pivot — re-add ours so they cancel
          heap.add_single(pivot);
          std::vector<DiamIdx> cob;
          const DiamIdx oc = owner_col[owner];
          enumerate_cofacets(oc.idx, oc.diam, p,
                             [&](value_t diam, index_t cidx) {
            if (diam <= thresh_) cob.push_back({diam, cidx});
            return true;
          });
          std::sort(cob.begin(), cob.end(), ascending);
          heap.add_sorted_own(std::move(cob));
        }
      }
    }
  }

  // --- clearing: assemble next dimension's columns ---------------------------

  std::vector<DiamIdx> assemble_columns(int p, const PivotMap& pivots) const {
    // enumerate all p-simplices <= thresh via edge extension with
    // bitsets; pivots is read-only here, so starting-vertex chunks run
    // in parallel with per-chunk output buffers.
    int T = thread_count();
    size_t n_parts = (T <= 1 || n_ < 512) ? 1 : static_cast<size_t>(T);
    std::vector<std::vector<DiamIdx>> parts(n_parts);

    auto work = [&](size_t part, index_t v_lo, index_t v_hi) {
      std::vector<DiamIdx>& out = parts[part];
      index_t verts[4];
      // p == 2 (triangles) or p == 3 (tetrahedra); generic recursive grow
      std::function<void(std::vector<index_t>&, value_t, std::vector<uint64_t>&)> grow =
          [&](std::vector<index_t>& cur, value_t diam, std::vector<uint64_t>& cand) {
            if (static_cast<int>(cur.size()) == p + 1) {
              for (size_t i = 0; i < cur.size(); ++i)
                verts[i] = cur[cur.size() - 1 - i];  // descending
              index_t idx = encode(verts, p + 1);
              if (pivots.find(idx) < 0) out.push_back({diam, idx});
              return;
            }
            index_t top = cur.back();
            size_t words = adj_->words();
            for (size_t wi = (top + 1) >> 6; wi < words; ++wi) {
              uint64_t bitsw = cand[wi];
              if (wi == static_cast<size_t>((top + 1) >> 6)) {
                int shift = (top + 1) & 63;
                bitsw &= ~((shift ? (1ULL << shift) : 1ULL) - 1ULL);
              }
              while (bitsw) {
                index_t w = static_cast<index_t>(wi * 64 + __builtin_ctzll(bitsw));
                bitsw &= bitsw - 1;
                value_t nd = diam;
                bool ok = true;
                for (index_t v : cur) {
                  value_t dv = d(v, w);
                  if (dv > thresh_) { ok = false; break; }
                  nd = std::max(nd, dv);
                }
                if (!ok) continue;
                std::vector<uint64_t> ncand(words);
                const uint64_t* rw = adj_->row(w);
                for (size_t k = 0; k < words; ++k) ncand[k] = cand[k] & rw[k];
                cur.push_back(w);
                grow(cur, nd, ncand);
                cur.pop_back();
              }
            }
          };
      std::vector<index_t> cur;
      std::vector<uint64_t> cand(adj_->words());
      for (index_t v = v_lo; v < v_hi && v + p <= n_ - 1; ++v) {
        cur = {v};
        std::memcpy(cand.data(), adj_->row(v), adj_->words() * sizeof(uint64_t));
        grow(cur, 0.0, cand);
      }
    };

    if (n_parts == 1) {
      work(0, 0, n_);
    } else {
      std::vector<std::thread> ths;
      index_t chunk = (n_ + n_parts - 1) / n_parts;
      for (size_t part = 0; part < n_parts; ++part) {
        index_t lo = part * chunk, hi = std::min<index_t>(n_, lo + chunk);
        if (lo >= hi) break;
        ths.emplace_back(work, part, lo, hi);
      }
      for (auto& th : ths) th.join();
    }
    size_t total = 0;
    for (const auto& pt : parts) total += pt.size();
    std::vector<DiamIdx> out;
    out.reserve(total);
    for (const auto& pt : parts)
      out.insert(out.end(), pt.begin(), pt.end());
    return out;
  }

#ifdef TDAX_PROF
 public:
  double prof_probe = 0, prof_phase2_init = 0, prof_reduce = 0;
  long prof_cols = 0, prof_emergent = 0, prof_additions = 0;

 private:
#endif
 public:
  bool invariant_violation_ = false;

 private:
  const value_t* dist_;
  index_t n_;
  int maxdim_;
  Binomial binom_;
  value_t thresh_;
  bool essential_allowed_;
  Adjacency* adj_;
  mutable std::vector<uint64_t> scratch_;
};

}  // namespace

extern "C" {

int TDAX_ENTRY(const value_t* dist, int n, int maxdim, double thresh,
               double** out, long* out_len) {
  // fixed vertex buffers support simplices up to dim 4 (maxdim 3)
  if (maxdim < 0 || maxdim > 3) return 3;
  try {
    RipsEngine engine(dist, n, maxdim, thresh);
    std::vector<Bar> bars = engine.run();
    if (engine.invariant_violation_) return 4;
    double* buf = static_cast<double*>(malloc(sizeof(double) * 3 * bars.size()));
    if (!buf && !bars.empty()) return 2;
    for (size_t i = 0; i < bars.size(); ++i) {
      buf[3 * i] = bars[i].dim;
      buf[3 * i + 1] = bars[i].birth;
      buf[3 * i + 2] = bars[i].death;
    }
    *out = buf;
    *out_len = static_cast<long>(3 * bars.size());
    return 0;
  } catch (const std::bad_alloc&) {
    return 5;  // rc 4 is the invariant-violation code in this engine
  } catch (...) {
    return 1;
  }
}

#ifdef TDAX_DEFINE_FREE
void tdax_free(double* p) { free(p); }
#endif

}  // extern "C"
