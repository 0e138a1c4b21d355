// tdax_rips_sparse.cc — CSR-input Vietoris–Rips persistent cohomology.
//
// Same algorithm family as the dense engine (tdax_rips.cc: clearing +
// emergent pairs + V-column cohomology reduction) re-based on a sparse
// thresholded neighborhood graph: the TPU computes k-NN neighbor lists
// (tdax.parallel.sharded_ops / top-k) and only those cross the host
// boundary (~10 MB at 10k points vs 400 MB for the dense matrix through
// this box's relay).  All simplices of the thresholded filtration have
// every edge in the graph, so CSR lookups cover every diameter query:
//   d(i, j)   : binary search in row i (rows sorted by column);
//   cofacets  : (p+1)-way sorted-row merge, ascending w == ascending
//               colex, diameters accumulated during the merge.
//
// Input contract: symmetric CSR (both (i,j) and (j,i) present), rows
// sorted by column index, no self-entries, all values <= thresh.
// Z/2; pairs with death <= birth dropped; essential bars death = -1.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <limits>
#include <thread>
#include <vector>

#include "tdax_threads.h"

namespace tdax_sparse {

using tdax_threads::parallel_sort;
using tdax_threads::prof_enabled;
using tdax_threads::run_chunks;
using tdax_threads::thread_count;

struct StageTimer : tdax_threads::StageTimer {
  explicit StageTimer(const char* n)
      : tdax_threads::StageTimer("tdax_sparse", n) {}
};

using index_t = int64_t;
using value_t = float;  // values come from f32 device top-k lists

constexpr value_t kInf = std::numeric_limits<value_t>::infinity();

struct DiamIdx {
  value_t diam;
  index_t idx;
};

inline bool ascending(const DiamIdx& a, const DiamIdx& b) {
  return a.diam < b.diam || (a.diam == b.diam && a.idx < b.idx);
}

struct HeapGreater {
  bool operator()(const DiamIdx& a, const DiamIdx& b) const {
    return ascending(b, a);
  }
};

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

class PivotMap {
 public:
  explicit PivotMap(size_t expected) {
    size_t cap = 64;
    while (cap < expected * 2) cap <<= 1;
    mask_ = cap - 1;
    keys_.assign(cap, kEmpty);
    vals_.resize(cap);
  }
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

struct Bar {
  int32_t dim;
  value_t birth, death;  // death = -1 encodes +inf
};

class SparseRips {
 public:
  SparseRips(index_t n, const int64_t* indptr, const int32_t* indices,
             const float* data, int maxdim)
      : n_(n), indptr_(indptr), indices_(indices), data_(data),
        maxdim_(maxdim), binom_(std::max<index_t>(n, 2), maxdim + 3) {}

  bool invariant_ok = true;

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
  // d(i, j) for a graph edge: binary search row i.  Returns inf if absent.
  inline value_t d(index_t i, index_t j) const {
    const int32_t* lo = indices_ + indptr_[i];
    const int32_t* hi = indices_ + indptr_[i + 1];
    const int32_t* it = std::lower_bound(lo, hi, static_cast<int32_t>(j));
    if (it == hi || *it != j) return kInf;
    return data_[indptr_[i] + (it - lo)];
  }

  inline index_t edge_index(index_t i, index_t j) const {  // i < j
    return binom_(j, 2) + i;
  }

  // largest v <= hi with binom(v, k) <= idx.  Seeded by the closed-form
  // float inversion of v^k/k! ~= idx (exactness restored by the integer
  // fix-up loops), which replaces the ~17-iteration binary search that
  // dominated the per-column candidate scans at scale: decode runs for
  // every column of every dimension (10M+ triangles at 100k points).
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
      default: {  // k == 4 (maxdim 3 headroom): plain binary search
        index_t lo = k - 1;
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
    index_t hi = n_ - 1;
    for (int k = dim + 1; k > 0; --k) {
      index_t lo = max_vertex(idx, k, hi);
      verts[dim + 1 - k] = lo;
      idx -= binom_(lo, k);
      hi = lo - 1;
    }
  }

  inline index_t encode(const index_t* verts, int count) const {
    index_t idx = 0;
    for (int i = 0; i < count; ++i) idx += binom_(verts[i], count - i);
    return idx;
  }

  // --- dim 0 ------------------------------------------------------------------

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
    struct Edge { value_t d; index_t i, j; };
    std::vector<Edge> edges;
    edges.reserve(indptr_[n_] / 2);
    for (index_t i = 0; i < n_; ++i)
      for (index_t k = indptr_[i]; k < indptr_[i + 1]; ++k) {
        index_t j = indices_[k];
        if (i < j) edges.push_back({data_[k], i, j});
      }
    parallel_sort(edges, [this](const Edge& a, const Edge& b) {
      if (a.d != b.d) return a.d < b.d;
      return edge_index(a.i, a.j) < edge_index(b.i, b.j);
    });

    UF uf(n_);
    std::vector<DiamIdx> positive;
    positive.reserve(edges.size());
    for (const Edge& e : edges) {
      if (uf.unite(e.i, e.j)) {
        if (e.d > 0) bars.push_back({0, 0.0f, e.d});
      } else {
        positive.push_back({e.d, edge_index(e.i, e.j)});
      }
    }
    index_t n_comp = 0;
    for (index_t v = 0; v < n_; ++v)
      if (uf.find(v) == v) ++n_comp;
    for (index_t c = 0; c < n_comp; ++c) bars.push_back({0, 0.0f, -1.0f});
    return positive;
  }

  // --- cofacet merge-enumeration -------------------------------------------------
  // Common neighbors of the simplex's vertices in ascending w, with the
  // cofacet diameter accumulated from the merged row values.

  // tight two-pointer intersect for the dominant 2-vertex case (edge
  // columns' cofacets, triangle assembly): same visit contract as the
  // generic merge below, without its per-iteration count loops
  template <typename Visit>
  void common_neighbors2(index_t a, index_t b, value_t sdiam,
                         Visit&& visit) const {
    const int32_t* ia = indices_ + indptr_[a];
    const int32_t* ea = indices_ + indptr_[a + 1];
    const int32_t* ib = indices_ + indptr_[b];
    const int32_t* eb = indices_ + indptr_[b + 1];
    const float* va = data_ + indptr_[a];
    const float* vb = data_ + indptr_[b];
    while (ia != ea && ib != eb) {
      const int32_t ca = *ia, cb = *ib;
      if (ca < cb) { ++ia; continue; }
      if (cb < ca) { ++ib; continue; }
      value_t diam = std::max(
          sdiam, std::max(va[ia - (indices_ + indptr_[a])],
                          vb[ib - (indices_ + indptr_[b])]));
      if (!visit(diam, static_cast<index_t>(ca))) return;
      ++ia;
      ++ib;
    }
  }

  // unrolled 3-row merge (triangle columns' cofacet scans at p = 2)
  template <typename Visit>
  void common_neighbors3(index_t a, index_t b, index_t c, value_t sdiam,
                         Visit&& visit) const {
    const int32_t* ia = indices_ + indptr_[a];
    const int32_t* ea = indices_ + indptr_[a + 1];
    const int32_t* ib = indices_ + indptr_[b];
    const int32_t* eb = indices_ + indptr_[b + 1];
    const int32_t* ic = indices_ + indptr_[c];
    const int32_t* ec = indices_ + indptr_[c + 1];
    const float* va = data_ + indptr_[a];
    const float* vb = data_ + indptr_[b];
    const float* vc = data_ + indptr_[c];
    if (ia == ea || ib == eb || ic == ec) return;
    while (true) {
      int32_t w = *ia;
      if (*ib > w) w = *ib;
      if (*ic > w) w = *ic;
      while (*ia < w) { if (++ia == ea) return; }
      while (*ib < w) { if (++ib == eb) return; }
      while (*ic < w) { if (++ic == ec) return; }
      if (*ia == w && *ib == w && *ic == w) {
        value_t diam = std::max(va[ia - (indices_ + indptr_[a])],
                                vb[ib - (indices_ + indptr_[b])]);
        diam = std::max(diam, vc[ic - (indices_ + indptr_[c])]);
        diam = std::max(diam, sdiam);
        if (!visit(diam, static_cast<index_t>(w))) return;
        if (++ia == ea || ++ib == eb || ++ic == ec) return;
      }
      // else: some pointer advanced past w — recompute the new max
    }
  }

  template <typename Visit>
  void for_common_neighbors(const index_t* verts, int count, value_t sdiam,
                            Visit&& visit) const {
    if (count == 2) {
      common_neighbors2(verts[0], verts[1], sdiam,
                        static_cast<Visit&&>(visit));
      return;
    }
    if (count == 3) {
      common_neighbors3(verts[0], verts[1], verts[2], sdiam,
                        static_cast<Visit&&>(visit));
      return;
    }
    const int32_t* it[5];
    const int32_t* end[5];
    const float* val[5];
    for (int i = 0; i < count; ++i) {
      it[i] = indices_ + indptr_[verts[i]];
      end[i] = indices_ + indptr_[verts[i] + 1];
      val[i] = data_ + indptr_[verts[i]];
    }
    while (true) {
      // advance to a common column
      int32_t w = -1;
      for (int i = 0; i < count; ++i) {
        if (it[i] == end[i]) return;
        w = std::max(w, *it[i]);
      }
      bool aligned = true;
      for (int i = 0; i < count; ++i) {
        while (it[i] != end[i] && *it[i] < w) ++it[i];
        if (it[i] == end[i]) return;
        if (*it[i] != w) aligned = false;
      }
      if (!aligned) continue;
      // common neighbor w: diameter = max(simplex diam, row values)
      value_t diam = sdiam;
      for (int i = 0; i < count; ++i)
        diam = std::max(diam, val[i][it[i] - (indices_ + indptr_[verts[i]])]);
      if (!visit(diam, static_cast<index_t>(w))) return;
      for (int i = 0; i < count; ++i) ++it[i];
    }
  }

  template <typename Push>
  void enumerate_cofacets(index_t idx, value_t sdiam, int p, Push&& push) const {
    index_t verts[4];
    decode(idx, p, verts);
    index_t nv[5];
    for_common_neighbors(verts, p + 1, sdiam, [&](value_t diam, index_t w) {
      int pos = 0;
      while (pos <= p && verts[pos] > w) { nv[pos] = verts[pos]; ++pos; }
      nv[pos] = w;
      for (int i = pos; i <= p; ++i) nv[i + 1] = verts[i];
      return push(diam, encode(nv, p + 2));
    });
  }

  // --- phase A: map-free pivot candidate + apparent-pair detection ---------
  // For column σ (a p-simplex), find its first equal-diameter cofacet τ
  // — the minimal (diam, idx) entry of σ's raw coboundary whenever an
  // equal-diameter cofacet exists (all cofacet diameters are >= diam σ,
  // and ascending-w merge order == ascending colex index) — and check
  // the apparent-pair condition: σ is also the maximal (diam, idx)
  // facet of τ among its equal-diameter facets.  Apparent pairs are
  // persistence pairs of the filtration (no facet of τ sorts above σ,
  // so no earlier column's reduction can reach row τ): they are
  // claimable without consulting the pivot map, which makes this whole
  // phase a pure function of the filtration — embarrassingly parallel.
  void find_candidate(const DiamIdx& col, int p, bool check_apparent,
                      index_t* out_cand, uint8_t* out_apparent) const {
    index_t verts[4];
    decode(col.idx, p, verts);
    index_t w_found = -1;
    for_common_neighbors(verts, p + 1, col.diam, [&](value_t cd, index_t w) {
      if (cd > col.diam) return true;
      w_found = w;
      return false;  // first equal-diam cofacet settles the candidate
    });
    if (w_found < 0) {
      *out_cand = -1;
      *out_apparent = 0;
      return;
    }
    if (!check_apparent) {
      // single-threaded phase B resolves the claim with one pivot-map
      // lookup, which is cheaper than the facet scan below; the scan
      // only pays off by making claims map-free for parallel phase A.
      index_t tv0[5];
      int pos0 = 0;
      while (pos0 <= p && verts[pos0] > w_found) { tv0[pos0] = verts[pos0]; ++pos0; }
      tv0[pos0] = w_found;
      for (int i = pos0; i <= p; ++i) tv0[i + 1] = verts[i];
      *out_cand = encode(tv0, p + 2);
      *out_apparent = 0;
      return;
    }
    // τ vertices, descending
    index_t tv[5];
    int pos = 0;
    while (pos <= p && verts[pos] > w_found) { tv[pos] = verts[pos]; ++pos; }
    tv[pos] = w_found;
    for (int i = pos; i <= p; ++i) tv[i + 1] = verts[i];
    *out_cand = encode(tv, p + 2);

    // apparent-pair check: every other equal-diameter facet of τ must
    // sort below σ (facet diam <= τ diam == col.diam always)
    const int m = p + 2;  // vertices of τ
    value_t pd[5][5];
    for (int i = 0; i < m; ++i)
      for (int j = i + 1; j < m; ++j) pd[i][j] = d(tv[j], tv[i]);
    index_t fv[4];
    for (int u = 0; u < m; ++u) {
      if (tv[u] == w_found) continue;  // that facet IS σ
      value_t fdiam = 0;
      for (int i = 0; i < m; ++i) {
        if (i == u) continue;
        for (int j = i + 1; j < m; ++j)
          if (j != u) fdiam = std::max(fdiam, pd[i][j]);
      }
      if (fdiam != col.diam) continue;
      int k = 0;
      for (int i = 0; i < m; ++i)
        if (i != u) fv[k++] = tv[i];
      if (encode(fv, p + 1) > col.idx) {
        *out_apparent = 0;
        return;
      }
    }
    *out_apparent = 1;
  }

  // --- reduction -----------------------------------------------------------------

  // Lazy working column: a k-way merge over SORTED runs instead of an
  // eager element heap.  Profiling the 30k/100k H1 reductions showed
  // ~90% of eagerly-heaped elements are never popped (1.24M pops vs
  // ~13M inserted at 30k): chains settle long before consuming the
  // stored remainders they splice in, so copying each ~500-element
  // remainder into the heap (plus the O(heap) re-heapify per splice and
  // the periodic mod-2 compaction sorts) was almost entirely wasted
  // motion.  Here an insert is one cursor push (stored remainders are
  // referenced ZERO-COPY; they are immutable once stored), a pop is
  // O(log #runs), and the merge pops equal (diam, idx) entries
  // adjacently — within a run elements are strictly increasing, so all
  // copies of a value head distinct runs simultaneously — which makes
  // pop_pivot's pairwise mod-2 cancellation semantics identical to the
  // eager heap's.  Claim-time materialization (pop everything that
  // remains) directly emits the sorted, mod-2-compacted remainder.
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
    const DiamIdx& peek() const { return cur.front().head; }
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
    // and unmodified for the lifetime of this column (stored remainders
    // are immutable after storage, so referencing them is safe)
    void add_sorted_ref(const DiamIdx* b, const DiamIdx* e) {
      if (b == e) return;
      cur.push_back({*b, b + 1, e});
      std::push_heap(cur.begin(), cur.end(), cur_after);
    }
    // take ownership of a sorted ascending vector and add it as a run
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
    // The content is already a set of SORTED runs, so shortest-first
    // pairwise std::merge costs ~n log k sequential comparisons versus
    // the n log n of re-sorting a flat copy (k = live runs, typically
    // single digits; a backed cursor's full remaining run is the
    // contiguous [pos-1, end) since head == *(pos-1), and the single-
    // element pivots form one ascending run of their own because pops
    // strictly increase along a chain).  Mod-2 cancellation happens in
    // the final copy pass — equal entries are adjacent after merging.
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
        // merge the two shortest runs (Huffman order minimizes total work)
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
            i += 2;  // cancelled mod-2 pair (runs of 2k collapse pairwise)
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

  // seed a lazy column with the sorted raw coboundary of `col`
  void init_column(LazyCol& h, const DiamIdx col, int p) const {
    h.clear();
    std::vector<DiamIdx> cob;
    enumerate_cofacets(col.idx, col.diam, p,
                       [&](value_t diam, index_t cidx) {
      cob.push_back({diam, cidx});
      return true;
    });
    std::sort(cob.begin(), cob.end(), ascending);
    h.add_sorted_own(std::move(cob));
  }

  // one collision step of the reduction: add the owner's column to the
  // working heap after OUR copy of the shared pivot was popped (the two
  // pivot copies cancel mod 2).  Shared verbatim by the sequential
  // reducer, the parallel pre-reducer, and the commit pass.
  // phase-B attribution counters (printed under TDAX_PROF); updated on
  // the sequential path only — the parallel pre-reducer's copies are
  // not separated, which is fine for the single-core profile they serve
  mutable size_t ctr_add_stored_ = 0, ctr_add_raw_ = 0;
  mutable size_t ctr_stored_elems_ = 0, ctr_raw_pushes_ = 0;
  mutable size_t ctr_mat_elems_ = 0;
  mutable double ctr_mat_s_ = 0.0;
  mutable std::vector<uint8_t> ctr_referenced_;
  mutable std::vector<uint8_t> ctr_raw_ref_;
  mutable size_t ctr_raw_repeat_ = 0;

  void add_owner(LazyCol& h, const DiamIdx& pivot, int64_t owner,
                 const std::vector<DiamIdx>& owner_col_v,
                 const std::vector<std::vector<DiamIdx>>& owner_rem_v,
                 const std::vector<uint8_t>& owner_stored_v, int p) const {
    if (owner_stored_v[owner]) {
      // W_new = (W \ {pivot}) + (R_owner \ {pivot}): neither re-added.
      // Stored remainders are sorted, compacted, and immutable — one
      // zero-copy cursor instead of splicing ~hundreds of elements
      const std::vector<DiamIdx>& rem = owner_rem_v[owner];
      ++ctr_add_stored_;
      ctr_stored_elems_ += rem.size();
      if (prof_enabled() && thread_count() == 1) {  // profiling only
        if (static_cast<size_t>(owner) >= ctr_referenced_.size())
          ctr_referenced_.resize(owner + 1, 0);
        ctr_referenced_[owner] = 1;
      }
      h.add_sorted_ref(rem.data(), rem.data() + rem.size());
    } else {
      // claimed column: R_owner = raw coboundary of its simplex, which
      // regenerates the pivot — re-add ours so they cancel
      ++ctr_add_raw_;
      if (prof_enabled() && thread_count() == 1) {  // profiling only
        if (static_cast<size_t>(owner) >= ctr_raw_ref_.size())
          ctr_raw_ref_.resize(owner + 1, 0);
        if (ctr_raw_ref_[owner]) ++ctr_raw_repeat_;
        ctr_raw_ref_[owner] = 1;
      }
      h.add_single(pivot);
      std::vector<DiamIdx> cob;
      const DiamIdx oc = owner_col_v[owner];
      enumerate_cofacets(oc.idx, oc.diam, p,
                         [&](value_t diam, index_t cidx) {
        ++ctr_raw_pushes_;
        cob.push_back({diam, cidx});
        return true;
      });
      std::sort(cob.begin(), cob.end(), ascending);
      h.add_sorted_own(std::move(cob));
    }
  }

  // pre-reduction against a FROZEN pivot map (no writes anywhere):
  // follow collision chains through already-claimed pivots and stop at
  // the first unclaimed one.  kind: 1 = stopped at (pivot, remainder),
  // 2 = column vanished (essential).  Pure function of the frozen state
  // — safe to run for a whole block of columns in parallel.
  struct PreResult {
    int8_t kind = 0;
    DiamIdx pivot{};
    std::vector<DiamIdx> rem;
  };

  void pre_reduce(const DiamIdx col, int p, const PivotMap& pivots,
                  const std::vector<DiamIdx>& owner_col_v,
                  const std::vector<std::vector<DiamIdx>>& owner_rem_v,
                  const std::vector<uint8_t>& owner_stored_v,
                  LazyCol& h, PreResult* out) const {
    init_column(h, col, p);
    while (true) {
      DiamIdx pivot;
      if (!h.pop_pivot(pivot)) {
        out->kind = 2;
        return;
      }
      int64_t owner = pivots.find(pivot.idx);
      if (owner < 0) {
        out->kind = 1;
        out->pivot = pivot;
        out->rem = h.materialize();
        return;
      }
      add_owner(h, pivot, owner, owner_col_v, owner_rem_v,
                owner_stored_v, p);
    }
  }

  void reduce_dimension(int p, std::vector<DiamIdx>& columns,
                        std::vector<Bar>& bars, PivotMap& pivots) {
    {
      StageTimer t(p == 1 ? "sort columns p=1" : "sort columns p>=2");
      parallel_sort(columns, [](const DiamIdx& a, const DiamIdx& b) {
        return ascending(b, a);  // decreasing (diam, idx)
      });
    }

    // phase A (parallel, lock-free): pivot candidates + apparent pairs
    const bool check_apparent = thread_count() > 1;
    std::vector<index_t> cand(columns.size());
    std::vector<uint8_t> apparent(columns.size());
    {
      StageTimer t("phase A candidates");
      run_chunks(columns.size(), 2048, [&](size_t lo, size_t hi) {
        for (size_t ci = lo; ci < hi; ++ci)
          find_candidate(columns[ci], p, check_apparent,
                         &cand[ci], &apparent[ci]);
      });
    }

    StageTimer t_b("phase B reduction");
    size_t n_apparent = 0, n_emergent = 0, n_full = 0;
    // per claimed pivot id: the source column, and (for full-reduced
    // columns) the REMAINDER of its working coboundary after the pivot
    // was popped — moved out of the heap in O(1) at claim time.  A later
    // column that collides on this pivot adds the owner by pushing the
    // stored remainder directly (the popped pivot and the owner's pivot
    // copy cancel mod 2 by construction), instead of re-enumerating the
    // cofacets of the owner's whole V-column — which turned long
    // reduction chains quadratic.
    std::vector<DiamIdx> owner_col;
    std::vector<std::vector<DiamIdx>> owner_rem;
    // owner_stored states: 0 = unreduced claim (R = raw coboundary of
    // the owner's simplex), 1 = materialized remainder in owner_rem,
    // 2 = FROZEN remainder (sequential mode only): the claim-time
    // working column kept as-is in frozen_store — ~40% of remainders
    // are never referenced by a later collision, so the copy + sort +
    // mod-2 compaction is deferred until first use (memoized to state
    // 1).  Frozen cursors only ever reference the column's own moved
    // run storage and ALREADY-materialized owner_rem vectors (an owner
    // is materialized before add_owner references it), so freezing is
    // sound; the parallel path never freezes because pre_reduce reads
    // stored remainders concurrently.
    std::vector<uint8_t> owner_stored;
    std::vector<int64_t> owner_frozen;  // index into frozen_store (or -1)
    std::deque<LazyCol> frozen_store;
    owner_col.reserve(columns.size());
    owner_rem.reserve(columns.size());
    owner_stored.reserve(columns.size());
    owner_frozen.reserve(columns.size());
    const bool defer_materialize = thread_count() <= 1;
    LazyCol heap;

    auto ensure_materialized = [&](int64_t owner) {
      if (owner_stored[owner] != 2) return;
      const bool prof = prof_enabled();
      auto t0 = prof ? std::chrono::steady_clock::now()
                     : std::chrono::steady_clock::time_point();
      owner_rem[owner] = frozen_store[owner_frozen[owner]].materialize();
      if (prof) {
        ctr_mat_s_ += std::chrono::duration<double>(
            std::chrono::steady_clock::now() - t0).count();
        ctr_mat_elems_ += owner_rem[owner].size();
      }
      owner_stored[owner] = 1;
    };

    // settle one column whose working column is populated: claim / bar /
    // essential against the LIVE state.  Returns after the column is
    // fully settled (the sequential path's inner loop).
    auto finish_reduction = [&](const DiamIdx col, LazyCol& h) {
      while (true) {
        DiamIdx pivot;
        if (!h.pop_pivot(pivot)) {
          // essential class (legitimate under a finite threshold); owns
          // no pivot, so it never participates in later additions
          bars.push_back({static_cast<int32_t>(p), col.diam, -1.0f});
          break;
        }
        int64_t owner = pivots.find(pivot.idx);
        if (owner < 0) {
          owner_col.push_back(col);
          if (defer_materialize) {
            // freeze the working column ≡ R(col) \ {pivot}; materialize
            // lazily on first reference (often never)
            frozen_store.emplace_back(std::move(h));
            h = LazyCol();
            owner_rem.emplace_back();
            owner_stored.push_back(2);
            owner_frozen.push_back(
                static_cast<int64_t>(frozen_store.size() - 1));
          } else {
            // drain the merge: sorted + compacted ≡ R(col) \ {pivot}
            const bool prof = prof_enabled();
            auto t0 = prof ? std::chrono::steady_clock::now()
                           : std::chrono::steady_clock::time_point();
            owner_rem.push_back(h.materialize());
            if (prof) {
              ctr_mat_s_ += std::chrono::duration<double>(
                  std::chrono::steady_clock::now() - t0).count();
              ctr_mat_elems_ += owner_rem.back().size();
            }
            owner_stored.push_back(1);
            owner_frozen.push_back(-1);
          }
          pivots.insert(pivot.idx, static_cast<int64_t>(owner_col.size() - 1));
          if (pivot.diam > col.diam)
            bars.push_back({static_cast<int32_t>(p), col.diam, pivot.diam});
          break;
        }
        ensure_materialized(owner);
        add_owner(h, pivot, owner, owner_col, owner_rem, owner_stored, p);
      }
    };

    auto claim_unreduced = [&](const DiamIdx col, index_t pivot_idx) {
      owner_col.push_back(col);
      owner_rem.emplace_back();
      owner_stored.push_back(0);
      owner_frozen.push_back(-1);
      pivots.insert(pivot_idx, static_cast<int64_t>(owner_col.size() - 1));
    };

    if (thread_count() > 1 && columns.size() >= 4096) {
      // ---- blocked-parallel phase B ------------------------------------
      // Process columns in blocks: a parallel pass pre-reduces every
      // full-reduction column of the block against the pivot map FROZEN
      // at the block boundary (pure reads), then a sequential commit
      // pass claims pivots in exact filtration order — columns whose
      // stopping pivot was claimed by an earlier in-block column resume
      // inline from their pre-reduced remainder.  Commit order ==
      // sequential order, so the pairing is identical to the
      // single-threaded reduction (and the diagrams bit-equal).
      const size_t kBlock = std::max<size_t>(
          256, static_cast<size_t>(thread_count()) * 128);
      std::vector<PreResult> pre(kBlock);
      std::vector<int8_t> mode(kBlock);  // 0 claim-now, 1 deferred, 2 pre
      for (size_t b0 = 0; b0 < columns.size(); b0 += kBlock) {
        const size_t b1 = std::min(columns.size(), b0 + kBlock);
        run_chunks(b1 - b0, 4, [&](size_t lo, size_t hi) {
          LazyCol h;
          for (size_t i = lo; i < hi; ++i) {
            const size_t ci = b0 + i;
            pre[i].rem.clear();
            if (cand[ci] >= 0 &&
                (apparent[ci] || pivots.find(cand[ci]) < 0)) {
              // apparent claims are unconditional; emergent candidates
              // are re-checked at commit (an earlier in-block column may
              // have claimed the pivot meanwhile)
              mode[i] = apparent[ci] ? 0 : 1;
              continue;
            }
            mode[i] = 2;
            pre_reduce(columns[ci], p, pivots, owner_col, owner_rem,
                       owner_stored, h, &pre[i]);
          }
        });
        for (size_t i = 0; i < b1 - b0; ++i) {
          const size_t ci = b0 + i;
          const DiamIdx col = columns[ci];
          if (mode[i] == 0) {  // apparent
            ++n_apparent;
            claim_unreduced(col, cand[ci]);
            continue;
          }
          if (mode[i] == 1) {  // deferred emergent: re-check live map
            if (pivots.find(cand[ci]) < 0) {
              ++n_emergent;
              claim_unreduced(col, cand[ci]);
              continue;
            }
            // lost the candidate to an earlier in-block column: run the
            // full reduction inline (rare)
            ++n_full;
            init_column(heap, col, p);
            finish_reduction(col, heap);
            continue;
          }
          ++n_full;
          if (pre[i].kind == 2) {
            // vanished against the frozen map; additions only ever pull
            // in already-claimed owners, so this is final
            bars.push_back({static_cast<int32_t>(p), col.diam, -1.0f});
            continue;
          }
          const DiamIdx pivot = pre[i].pivot;
          int64_t owner = pivots.find(pivot.idx);
          if (owner < 0) {
            owner_col.push_back(col);
            owner_rem.push_back(std::move(pre[i].rem));  // ≡ R(col)\{pivot}
            owner_stored.push_back(1);
            owner_frozen.push_back(-1);
            pre[i].rem = std::vector<DiamIdx>();
            pivots.insert(pivot.idx,
                          static_cast<int64_t>(owner_col.size() - 1));
            if (pivot.diam > col.diam)
              bars.push_back({static_cast<int32_t>(p), col.diam, pivot.diam});
            continue;
          }
          // stopping pivot got claimed within the block: resume from the
          // pre-reduced remainder (sorted + compacted by materialize)
          heap.clear();
          heap.add_sorted_own(std::move(pre[i].rem));
          pre[i].rem = std::vector<DiamIdx>();
          add_owner(heap, pivot, owner, owner_col, owner_rem, owner_stored,
                    p);
          finish_reduction(col, heap);
        }
      }
    } else {
      // ---- sequential phase B ------------------------------------------
      for (size_t ci = 0; ci < columns.size(); ++ci) {
        const DiamIdx col = columns[ci];
        // apparent pairs skip even the map lookup; otherwise the cached
        // candidate (the column's minimal raw entry) is emergent iff it
        // is still unowned — no re-enumeration needed.
        if (cand[ci] >= 0 && (apparent[ci] || pivots.find(cand[ci]) < 0)) {
          apparent[ci] ? ++n_apparent : ++n_emergent;
          claim_unreduced(col, cand[ci]);
          continue;
        }
        ++n_full;

        init_column(heap, col, p);
        finish_reduction(col, heap);
      }
    }
    if (prof_enabled()) {
      fprintf(stderr,
              "[tdax_sparse] dim %d: %zu cols = %zu apparent + %zu emergent "
              "+ %zu full\n",
              p, columns.size(), n_apparent, n_emergent, n_full);
      fprintf(stderr,
              "[tdax_sparse] dim %d chains: add_owner stored=%zu "
              "(elems %zu) raw=%zu (pushes %zu)\n",
              p, ctr_add_stored_, ctr_stored_elems_, ctr_add_raw_,
              ctr_raw_pushes_);
      size_t n_ref = 0;
      for (uint8_t b : ctr_referenced_) n_ref += b;
      fprintf(stderr,
              "[tdax_sparse] dim %d materialize: %.3fs, %zu elems stored, "
              "%zu/%zu owners ever referenced, raw repeats %zu\n",
              p, ctr_mat_s_, ctr_mat_elems_, n_ref, owner_col.size(),
              ctr_raw_repeat_);
      ctr_add_stored_ = ctr_add_raw_ = 0;
      ctr_stored_elems_ = ctr_raw_pushes_ = 0;
      ctr_mat_elems_ = 0;
      ctr_mat_s_ = 0.0;
      ctr_referenced_.clear();
      ctr_raw_ref_.clear();
      ctr_raw_repeat_ = 0;
    }
  }

  // --- clearing: next dimension's columns -------------------------------------

  std::vector<DiamIdx> assemble_columns(int p, const PivotMap& pivots) const {
    StageTimer t("assemble columns");
    // grow p-simplices from (p-1)-simplices by appending common neighbors
    // larger than the top vertex (each simplex enumerated exactly once);
    // pivots is read-only here, so vertex-chunks run in parallel with
    // per-chunk output buffers.
    struct Grow {
      const SparseRips* self;
      int target_p;
      const PivotMap* pivots;
      std::vector<DiamIdx>* out;
      void operator()(index_t* vs, int count, value_t diam) {
        // vs ascending here; count vertices so far
        if (count == target_p + 1) {
          index_t desc[5];
          for (int i = 0; i < count; ++i) desc[i] = vs[count - 1 - i];
          index_t idx = self->encode(desc, count);
          if (pivots->find(idx) < 0) out->push_back({diam, idx});
          return;
        }
        index_t desc[5];
        for (int i = 0; i < count; ++i) desc[i] = vs[count - 1 - i];
        self->for_common_neighbors(desc, count, diam,
                                   [&](value_t nd, index_t w) {
          if (w > vs[count - 1]) {
            vs[count] = w;
            (*this)(vs, count + 1, nd);
          }
          return true;
        });
      }
    };

    int T = thread_count();
    size_t n_parts = (T <= 1 || n_ < 2048) ? 1 : static_cast<size_t>(T);
    std::vector<std::vector<DiamIdx>> parts(n_parts);
    auto work = [&](size_t part, index_t v_lo, index_t v_hi) {
      index_t verts[5];
      Grow grow{this, p, &pivots, &parts[part]};
      for (index_t i = v_lo; i < v_hi; ++i)
        for (index_t k = indptr_[i]; k < indptr_[i + 1]; ++k) {
          index_t j = indices_[k];
          if (i < j) {
            verts[0] = i;
            verts[1] = j;
            grow(verts, 2, data_[k]);
          }
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

  index_t n_;
  const int64_t* indptr_;
  const int32_t* indices_;
  const float* data_;
  int maxdim_;
  Binomial binom_;
};

}  // namespace tdax_sparse

extern "C" {

int tdax_rips_sparse(int64_t n, const int64_t* indptr, const int32_t* indices,
                     const float* data, int maxdim,
                     double** out, long* out_len) {
  if (maxdim < 0 || maxdim > 3) return 3;
  try {
    tdax_sparse::SparseRips engine(n, indptr, indices, data, maxdim);
    auto bars = engine.run();
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
    return 4;
  } catch (...) {
    return 1;
  }
}

}  // extern "C"
