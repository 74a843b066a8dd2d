// Native HNSW graph builder + host search.
//
// TPU-native equivalent of the reference's Rust `hnsw` crate usage
// (reference: src/index/hnsw.rs:176-195 wraps hnsw 0.11): graph
// construction and single-query host search are inherently sequential
// pointer-chasing, so they run as native code on the host CPU, while the
// batched level-0 beam search runs on the TPU (kernels/beam.py).
//
// Memory contract: Python owns the level-0 adjacency [cap, M0], vector
// matrix [cap, D], per-node levels, and squared-norm/norm arrays; this
// library mutates them in place (so the JAX device cache can sync straight
// from the same buffers). Upper-level adjacency and all search scratch are
// C++-owned. Rows whose level-0 adjacency changed are reported through a
// dirty list that Python drains for incremental device sync.
//
// Distances (smaller = closer) mirror index/hnsw.py::_dist_to_many —
// the reference's formulas without the u64 x1000 fixed-point quantization
// (reference: src/index/hnsw.rs:113-174):
//   euclidean = L2, manhattan = L1, cosine = 1 - cos (zero-norm -> 1.0),
//   dotproduct = 1000 - clamp(dot, -1000, 1000).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC (see native/__init__.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <utility>
#include <vector>

namespace {

enum Metric : int32_t {
  METRIC_COSINE = 0,
  METRIC_EUCLIDEAN = 1,
  METRIC_MANHATTAN = 2,
  METRIC_DOT = 3,
};

struct Builder {
  int32_t dim = 0;
  int32_t metric = 0;
  int32_t m = 16;
  int32_t m0 = 32;
  int32_t efc = 100;
  double ml = 0.0;

  // Python-owned buffers (rebound on capacity growth)
  float* vecs = nullptr;       // [cap, dim]
  float* sqnorms = nullptr;    // [cap]
  float* norms = nullptr;      // [cap]
  int32_t* levels = nullptr;   // [cap]
  int32_t* adj0 = nullptr;     // [cap, m0]
  int64_t cap = 0;

  // C++-owned upper levels: adj_upper[l][node*m + j], level l+1
  std::vector<std::vector<int32_t>> adj_upper;

  int64_t num_nodes = 0;
  int64_t entry = -1;
  int32_t top_level = -1;

  std::mt19937_64 rng;
  std::uniform_real_distribution<double> unif{0.0, 1.0};

  // visited-epoch trick: no clearing between searches. The scratch is
  // shared Builder state, so every entry point that touches it (search,
  // descend, insert) serializes on this mutex — Python's per-collection
  // RW lock allows concurrent readers, and two concurrent searches would
  // otherwise race on visited[]/epoch (and ensure_visited's resize).
  std::mutex scratch_mu;
  std::vector<uint32_t> visited;
  uint32_t epoch = 0;

  std::vector<int32_t> dirty;  // level-0 rows touched since last drain

  float dist(const float* q, float q_norm, int64_t node) const {
    const float* v = vecs + node * dim;
    switch (metric) {
      case METRIC_EUCLIDEAN: {
        float s = 0.f;
        for (int i = 0; i < dim; ++i) {
          float d = q[i] - v[i];
          s += d * d;
        }
        return std::sqrt(s);
      }
      case METRIC_MANHATTAN: {
        float s = 0.f;
        for (int i = 0; i < dim; ++i) s += std::fabs(q[i] - v[i]);
        return s;
      }
      case METRIC_DOT: {
        float s = 0.f;
        for (int i = 0; i < dim; ++i) s += q[i] * v[i];
        s = std::min(std::max(s, -1000.f), 1000.f);
        return 1000.f - s;
      }
      default: {  // cosine; clamp: f32 cos can exceed 1 by an ulp
        float s = 0.f;
        for (int i = 0; i < dim; ++i) s += q[i] * v[i];
        float denom = q_norm * norms[node];
        if (denom <= 0.f) return 1.f;
        return std::max(0.f, 1.f - s / denom);
      }
    }
  }

  const int32_t* row(int level, int64_t node) const {
    if (level == 0) return adj0 + node * m0;
    return adj_upper[level - 1].data() + node * m;
  }
  int32_t* row_mut(int level, int64_t node) {
    if (level == 0) {
      dirty.push_back(static_cast<int32_t>(node));
      return adj0 + node * m0;
    }
    return adj_upper[level - 1].data() + node * m;
  }
  int degree_cap(int level) const { return level == 0 ? m0 : m; }

  void ensure_level(int level) {
    while (static_cast<int>(adj_upper.size()) < level) {
      adj_upper.emplace_back(cap * m, -1);
    }
  }
  void ensure_visited() {
    if (static_cast<int64_t>(visited.size()) < cap) visited.resize(cap, 0);
  }

  using DistNode = std::pair<float, int64_t>;

  // classic ef-search on one layer; result ascending by distance
  void search_layer(const float* q, float q_norm,
                    const std::vector<int64_t>& eps, int ef, int level,
                    std::vector<DistNode>& out) {
    ensure_visited();
    ++epoch;
    // min-heap candidates, max-heap results
    std::priority_queue<DistNode, std::vector<DistNode>,
                        std::greater<DistNode>> cand;
    std::priority_queue<DistNode> result;
    for (int64_t ep : eps) {
      if (visited[ep] == epoch) continue;
      visited[ep] = epoch;
      float d = dist(q, q_norm, ep);
      cand.emplace(d, ep);
      result.emplace(d, ep);
      while (static_cast<int>(result.size()) > ef) result.pop();
    }
    while (!cand.empty()) {
      DistNode c = cand.top();
      if (static_cast<int>(result.size()) >= ef &&
          c.first > result.top().first) {
        break;
      }
      cand.pop();
      const int32_t* nbrs = row(level, c.second);
      int deg = degree_cap(level);
      for (int j = 0; j < deg; ++j) {
        int32_t nb = nbrs[j];
        if (nb < 0) continue;
        if (visited[nb] == epoch) continue;
        visited[nb] = epoch;
        float d = dist(q, q_norm, nb);
        if (static_cast<int>(result.size()) < ef ||
            d < result.top().first) {
          cand.emplace(d, nb);
          result.emplace(d, nb);
          while (static_cast<int>(result.size()) > ef) result.pop();
        }
      }
    }
    out.clear();
    out.reserve(result.size());
    while (!result.empty()) {
      out.push_back(result.top());
      result.pop();
    }
    std::reverse(out.begin(), out.end());
  }

  // Malkov diversity heuristic (no closest-backfill, as in hnswlib's
  // neighbor shrink): a candidate is kept only if it is closer to the
  // query than to every already-kept neighbor. This preserves the
  // long-range inter-cluster edges that plain closest-M pruning severs —
  // closest-M was measured to fragment clustered corpora into per-cluster
  // components (entry BFS reached 109 of 30000 nodes).
  void select_heuristic(const std::vector<DistNode>& cands, int mmax,
                        std::vector<int64_t>& out) {
    out.clear();
    if (static_cast<int>(cands.size()) <= mmax) {
      for (auto& dn : cands) out.push_back(dn.second);
      return;
    }
    for (auto& dn : cands) {
      if (static_cast<int>(out.size()) >= mmax) break;
      bool keep = true;
      const float* cv = vecs + dn.second * dim;
      float cn = norms[dn.second];
      for (int64_t s : out) {
        if (dist(cv, cn, s) < dn.first) {
          keep = false;
          break;
        }
      }
      if (keep) out.push_back(dn.second);
    }
  }

  void link(int64_t node, const std::vector<int64_t>& neighbors, int level) {
    int mmax = degree_cap(level);
    int32_t* r = row_mut(level, node);
    int n = std::min<int>(neighbors.size(), mmax);
    for (int j = 0; j < n; ++j) r[j] = static_cast<int32_t>(neighbors[j]);
    for (int64_t nb : neighbors) {
      int32_t* nr = row_mut(level, nb);
      int free_slot = -1;
      for (int j = 0; j < mmax; ++j) {
        if (nr[j] < 0) {
          free_slot = j;
          break;
        }
      }
      if (free_slot >= 0) {
        nr[free_slot] = static_cast<int32_t>(node);
        continue;
      }
      // prune the overflowing row with the diversity heuristic — plain
      // closest-M here disconnects clusters (see select_heuristic note)
      const float* nv = vecs + nb * dim;
      float nn = norms[nb];
      std::vector<DistNode> all;
      all.reserve(mmax + 1);
      for (int j = 0; j < mmax; ++j) all.emplace_back(dist(nv, nn, nr[j]), nr[j]);
      all.emplace_back(dist(nv, nn, node), node);
      std::stable_sort(all.begin(), all.end(),
                       [](const DistNode& a, const DistNode& b) {
                         return a.first < b.first;
                       });
      std::vector<int64_t> kept;
      select_heuristic(all, mmax, kept);
      for (int j = 0; j < mmax; ++j) {
        nr[j] = j < static_cast<int>(kept.size())
                    ? static_cast<int32_t>(kept[j])
                    : -1;
      }
    }
  }

  int draw_level() {
    return static_cast<int>(-std::log(std::max(unif(rng), 1e-300)) * ml);
  }

  void register_node(int64_t node) {
    const float* v = vecs + node * dim;
    float sq = 0.f;
    for (int i = 0; i < dim; ++i) sq += v[i] * v[i];
    sqnorms[node] = sq;
    norms[node] = std::sqrt(sq);
    num_nodes = std::max(num_nodes, node + 1);
  }

  // insert node `node` whose vector Python already wrote into vecs[node]
  // (exclusive with searches via scratch_mu; Python's write lock already
  // excludes concurrent inserts). forced_level < 0 draws from the rng.
  void insert(int64_t node, int forced_level = -1) {
    std::lock_guard<std::mutex> lock(scratch_mu);
    register_node(node);
    int level = forced_level >= 0 ? forced_level : draw_level();
    levels[node] = level;
    ensure_level(level);
    // mark the (still-empty) level-0 row dirty so the device picks it up
    dirty.push_back(static_cast<int32_t>(node));

    if (entry < 0) {
      entry = node;
      top_level = level;
      return;
    }

    const float* v = vecs + node * dim;
    float q_norm = norms[node];
    std::vector<int64_t> eps{entry};
    std::vector<DistNode> cands;
    for (int l = top_level; l > level; --l) {
      search_layer(v, q_norm, eps, 1, l, cands);
      if (!cands.empty()) {
        eps.assign(1, cands[0].second);
      }
    }
    std::vector<int64_t> selected;
    for (int l = std::min(level, top_level); l >= 0; --l) {
      search_layer(v, q_norm, eps, efc, l, cands);
      select_heuristic(cands, degree_cap(l), selected);
      link(node, selected, l);
      eps.clear();
      for (auto& dn : cands) eps.push_back(dn.second);
      if (eps.empty()) eps.push_back(entry);
    }
    if (level > top_level) {
      entry = node;
      top_level = level;
    }
  }

  int64_t descend(const float* q) {
    std::lock_guard<std::mutex> lock(scratch_mu);
    if (entry < 0) return -1;
    float q_sq = 0.f;
    for (int i = 0; i < dim; ++i) q_sq += q[i] * q[i];
    float q_norm = std::sqrt(q_sq);
    std::vector<int64_t> eps{entry};
    std::vector<DistNode> cands;
    for (int l = top_level; l > 0; --l) {
      search_layer(q, q_norm, eps, 1, l, cands);
      if (!cands.empty()) eps.assign(1, cands[0].second);
    }
    return eps[0];
  }

  // full search: descend + level-0 ef-search; returns count written
  int search(const float* q, int ef, int32_t* out_ids, float* out_dists) {
    std::lock_guard<std::mutex> lock(scratch_mu);
    if (entry < 0) return 0;
    float q_sq = 0.f;
    for (int i = 0; i < dim; ++i) q_sq += q[i] * q[i];
    float q_norm = std::sqrt(q_sq);
    std::vector<int64_t> eps{entry};
    std::vector<DistNode> cands;
    for (int l = top_level; l > 0; --l) {
      search_layer(q, q_norm, eps, 1, l, cands);
      if (!cands.empty()) eps.assign(1, cands[0].second);
    }
    search_layer(q, q_norm, eps, ef, 0, cands);
    int n = static_cast<int>(cands.size());
    for (int i = 0; i < n; ++i) {
      out_ids[i] = static_cast<int32_t>(cands[i].second);
      out_dists[i] = cands[i].first;
    }
    return n;
  }
};

}  // namespace

extern "C" {

Builder* hnsw_new(int32_t dim, int32_t metric, int32_t m, int32_t m0,
                  int32_t efc, uint64_t seed) {
  Builder* b = new Builder();
  b->dim = dim;
  b->metric = metric;
  b->m = m;
  b->m0 = m0;
  b->efc = efc;
  b->ml = 1.0 / std::log(static_cast<double>(m));
  b->rng.seed(seed);
  return b;
}

void hnsw_free(Builder* b) { delete b; }

// (Re)bind the Python-owned buffers; called at init and on capacity growth.
void hnsw_bind(Builder* b, float* vecs, float* sqnorms, float* norms,
               int32_t* levels, int32_t* adj0, int64_t cap) {
  b->vecs = vecs;
  b->sqnorms = sqnorms;
  b->norms = norms;
  b->levels = levels;
  b->adj0 = adj0;
  int64_t old_cap = b->cap;
  b->cap = cap;
  if (cap > old_cap) {
    for (auto& lvl : b->adj_upper) lvl.resize(cap * b->m, -1);
  }
}

void hnsw_insert_batch(Builder* b, int64_t start, int64_t count) {
  for (int64_t i = 0; i < count; ++i) b->insert(start + i);
}

void hnsw_insert_leveled(Builder* b, int64_t node, int32_t level) {
  b->insert(node, level);
}

void hnsw_draw_levels(Builder* b, int64_t count, int32_t* out) {
  for (int64_t i = 0; i < count; ++i) {
    out[i] = static_cast<int32_t>(b->draw_level());
  }
}

// Bulk-link level-0 nodes from device-computed candidate lists
// (ascending by distance). The diversity heuristic runs here with
// on-demand distance evaluation and early termination — C++ owns the
// vector buffers, so random row reads are cheap, unlike TPU gathers.
void hnsw_bulk_link_heuristic_l0(Builder* b, const int64_t* node_ids,
                                 int64_t count, int32_t c,
                                 const int32_t* cand_idx,
                                 const float* cand_dist) {
  std::lock_guard<std::mutex> lock(b->scratch_mu);
  std::vector<int64_t> kept;
  for (int64_t i = 0; i < count; ++i) {
    int64_t node = node_ids[i];
    b->register_node(node);
    b->levels[node] = 0;
    b->dirty.push_back(static_cast<int32_t>(node));
    const int32_t* ci = cand_idx + i * c;
    const float* cd = cand_dist + i * c;
    kept.clear();
    for (int32_t j = 0; j < c; ++j) {
      if (ci[j] < 0) continue;
      if (static_cast<int>(kept.size()) >= b->m0) break;
      const float* cv = b->vecs + static_cast<int64_t>(ci[j]) * b->dim;
      float cn = b->norms[ci[j]];
      bool keep = true;
      for (int64_t s : kept) {
        if (b->dist(cv, cn, s) < cd[j]) {
          keep = false;
          break;
        }
      }
      if (keep) kept.push_back(ci[j]);
    }
    b->link(node, kept, 0);
    if (b->entry < 0) {
      b->entry = node;
      b->top_level = 0;
    }
  }
}

int64_t hnsw_entry(Builder* b) { return b->entry; }
int32_t hnsw_top_level(Builder* b) { return b->top_level; }
int64_t hnsw_num_nodes(Builder* b) { return b->num_nodes; }
int32_t hnsw_num_upper_levels(Builder* b) {
  return static_cast<int32_t>(b->adj_upper.size());
}

// copy upper-level adjacency (level >= 1) into caller buffer [n, m]
void hnsw_get_upper(Builder* b, int32_t level, int32_t* out, int64_t n) {
  const auto& src = b->adj_upper[level - 1];
  std::memcpy(out, src.data(), sizeof(int32_t) * n * b->m);
}

int64_t hnsw_descend(Builder* b, const float* q) { return b->descend(q); }

void hnsw_descend_batch(Builder* b, const float* qs, int64_t count,
                        int64_t* out) {
  for (int64_t i = 0; i < count; ++i) {
    out[i] = b->descend(qs + i * b->dim);
  }
}

int32_t hnsw_search(Builder* b, const float* q, int32_t ef,
                    int32_t* out_ids, float* out_dists) {
  return b->search(q, ef, out_ids, out_dists);
}

// Restore a previously exported graph (the .vlc "graph" extension —
// avoids the reference's O(N·insert) rebuild-on-load). Level-0 adjacency
// and levels are already in the Python-owned buffers; upper levels are
// loaded here.
void hnsw_restore(Builder* b, int64_t num_nodes, int64_t entry,
                  int32_t top_level, int32_t num_upper,
                  const int32_t* upper /* [num_upper, num_nodes, m] */) {
  b->num_nodes = num_nodes;
  b->entry = entry;
  b->top_level = top_level;
  b->adj_upper.clear();
  for (int32_t l = 0; l < num_upper; ++l) {
    b->adj_upper.emplace_back(b->cap * b->m, -1);
    std::memcpy(b->adj_upper.back().data(),
                upper + static_cast<int64_t>(l) * num_nodes * b->m,
                sizeof(int32_t) * num_nodes * b->m);
  }
  // recompute norms for the restored vectors
  for (int64_t i = 0; i < num_nodes; ++i) {
    const float* v = b->vecs + i * b->dim;
    float sq = 0.f;
    for (int j = 0; j < b->dim; ++j) sq += v[j] * v[j];
    b->sqnorms[i] = sq;
    b->norms[i] = std::sqrt(sq);
  }
}

// drain the level-0 dirty row list; returns count copied (deduped by caller)
int64_t hnsw_drain_dirty(Builder* b, int32_t* out, int64_t max_out) {
  int64_t n = std::min<int64_t>(b->dirty.size(), max_out);
  std::memcpy(out, b->dirty.data(), sizeof(int32_t) * n);
  if (n == static_cast<int64_t>(b->dirty.size())) {
    b->dirty.clear();
  } else {
    b->dirty.erase(b->dirty.begin(), b->dirty.begin() + n);
  }
  return n;
}

int64_t hnsw_dirty_count(Builder* b) {
  return static_cast<int64_t>(b->dirty.size());
}

}  // extern "C"
