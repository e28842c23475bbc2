// Constellation-hash place recognition index — native host-side component
// of tpu-slam (graph/placerec.py's hot path).
//
// Role: drift-independent relocalization for the submap engine probes a
// triangle-hash database at EVERY submap closure (and the db grows with
// the map: ~10^5..10^7 entries at BASELINE config-5 scales).  The Python
// dict implementation costs ~0.1-1 s per probe at 20k-100k scale; this
// C++ twin (identical semantics, asserted in tests/test_placerec.py)
// keeps the per-closure probe in the milliseconds so the constant-cost-
// per-closure claim survives place recognition.
//
// Semantics mirror placerec._triangle_keys / ConstellationDB exactly:
//   * per center, the k nearest neighbors within (min_edge, max_edge];
//   * all neighbor pairs (a < b) with d_ab in (min_edge, max_edge];
//   * canonical side order d1 <= d2 (center-anchored), quantized at
//     bin_size, clamped to [0, 1023], packed (q1<<20 | q2<<10 | q3);
//   * values packed (src << 12 | local_index);
//   * query probes the 27-neighborhood (+-1 bin per side), votes for
//     (query_center << 38 | value) pairs, returns pairs with
//     >= min_votes, sorted votes-desc then key-asc, capped.
//
// C ABI, consumed via ctypes (tpuslam/native/__init__.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct ConstelDB {
  int k;
  double min_edge, max_edge, bin_size;
  std::unordered_map<int64_t, std::vector<int64_t>> db;
  int64_t n_entries = 0;
};

// Emit one triangle key per (center, neighbor-pair); calls fn(key).
template <typename F>
void for_triangles(const double* pts, int64_t n, const int64_t* centers,
                   int64_t m, int k, double min_edge, double max_edge,
                   double bin_size, F&& fn) {
  if (n < 3 || m == 0) return;
  std::vector<std::pair<double, int64_t>> cand;
  std::vector<std::pair<double, int64_t>> nb;  // (dist, idx) kept
  for (int64_t ci = 0; ci < m; ++ci) {
    int64_t c = centers[ci];
    double cx = pts[2 * c], cy = pts[2 * c + 1];
    cand.clear();
    for (int64_t j = 0; j < n; ++j) {
      double dx = pts[2 * j] - cx, dy = pts[2 * j + 1] - cy;
      double d = std::sqrt(dx * dx + dy * dy);
      if (d > min_edge && d <= max_edge) cand.emplace_back(d, j);
    }
    int kk = static_cast<int>(std::min<int64_t>(k, cand.size()));
    std::partial_sort(cand.begin(), cand.begin() + kk, cand.end());
    nb.assign(cand.begin(), cand.begin() + kk);
    for (int a = 0; a < kk; ++a) {
      for (int b = a + 1; b < kk; ++b) {
        double ax = pts[2 * nb[a].second], ay = pts[2 * nb[a].second + 1];
        double bx = pts[2 * nb[b].second], by = pts[2 * nb[b].second + 1];
        double dab = std::hypot(ax - bx, ay - by);
        if (dab <= min_edge || dab > max_edge) continue;
        double d1 = nb[a].first, d2 = nb[b].first;
        if (d1 > d2) std::swap(d1, d2);
        auto q = [&](double v) {
          int64_t t = static_cast<int64_t>(v / bin_size);
          return t < 0 ? int64_t(0) : (t > 1023 ? int64_t(1023) : t);
        };
        fn(c, (q(d1) << 20) | (q(d2) << 10) | q(dab));
      }
    }
  }
}

}  // namespace

extern "C" {

void* tpuslam_constel_new(int64_t k, double min_edge, double max_edge,
                          double bin_size) {
  auto* h = new ConstelDB();
  h->k = static_cast<int>(k);
  h->min_edge = min_edge;
  h->max_edge = max_edge;
  h->bin_size = bin_size;
  return h;
}

void tpuslam_constel_free(void* handle) {
  delete static_cast<ConstelDB*>(handle);
}

int64_t tpuslam_constel_entries(void* handle) {
  return static_cast<ConstelDB*>(handle)->n_entries;
}

// pts: (n, 2) xy-interleaved cloud; centers: m indices to index; src:
// submap id (values packed src<<12 | center).
void tpuslam_constel_add(void* handle, const double* pts, int64_t n,
                         const int64_t* centers, int64_t m, int64_t src) {
  auto* h = static_cast<ConstelDB*>(handle);
  for_triangles(pts, n, centers, m, h->k, h->min_edge, h->max_edge,
                h->bin_size, [&](int64_t c, int64_t key) {
                  h->db[key].push_back((src << 12) | c);
                  ++h->n_entries;
                });
}

// Query: votes for (query_center -> db value) pairs over the
// 27-neighborhood of each query triangle key, db entries with
// src < src_max AND src outside [skip_lo, skip_hi] only (the skip range
// is the caller's leave-self-out window; pass skip_lo > skip_hi to
// disable).  Outputs the >= min_votes pairs (votes desc, key asc),
// capped at cap.  Returns the emitted count.
// center_stride > 1 probes every stride-th query landmark as a triangle
// center (neighbors still come from the FULL cloud, so descriptors stay
// exact) — the cost knob for dbs whose bucket density has grown with
// the map (query cost ~ triangles x mean bucket size).
int64_t tpuslam_constel_query(void* handle, const double* pts, int64_t n,
                              int64_t src_max, int64_t min_votes,
                              int64_t cap, int64_t skip_lo,
                              int64_t skip_hi, int64_t center_stride,
                              int64_t* out_q,
                              int64_t* out_src, int64_t* out_lidx,
                              int64_t* out_votes) {
  auto* h = static_cast<ConstelDB*>(handle);
  if (n < 3 || h->db.empty()) return 0;
  if (center_stride < 1) center_stride = 1;
  std::vector<int64_t> centers;
  centers.reserve(n / center_stride + 1);
  for (int64_t i = 0; i < n; i += center_stride) centers.push_back(i);
  const int64_t m = centers.size();
  const int64_t src_lim = src_max << 12;
  const int64_t lo_lim = skip_lo << 12;
  const int64_t hi_lim = (skip_hi + 1) << 12;
  const bool has_skip = skip_lo <= skip_hi;
  // Vote pairs are overwhelmingly random-collision singletons; counting
  // them all in a hash map is the measured cost.  Two passes instead:
  // (1) collect pairs + approximate counts in a flat saturating array
  // (hash collisions only create false SURVIVORS), (2) exact counts for
  // pairs whose bucket reached min_votes.
  std::vector<int64_t> pairs;
  pairs.reserve(1 << 20);
  for_triangles(
      pts, n, centers.data(), m, h->k, h->min_edge, h->max_edge,
      h->bin_size, [&](int64_t qc, int64_t key) {
        for (int dz = -1; dz <= 1; ++dz)
          for (int dy = -1; dy <= 1; ++dy)
            for (int dx = -1; dx <= 1; ++dx) {
              auto it = h->db.find(key + int64_t(dz) * (1 << 20)
                                   + int64_t(dy) * (1 << 10) + dx);
              if (it == h->db.end()) continue;
              for (int64_t v : it->second)
                if (v < src_lim && !(has_skip && v >= lo_lim && v < hi_lim))
                  pairs.push_back((qc << 38) | v);
            }
      });
  constexpr int kBits = 22;
  std::vector<uint8_t> approx(size_t(1) << kBits, 0);
  auto bucket = [](int64_t p) {
    return size_t(uint64_t(p) * 0x9E3779B97F4A7C15ull >> (64 - kBits));
  };
  for (int64_t p : pairs) {
    uint8_t& c = approx[bucket(p)];
    if (c != 255) ++c;
  }
  std::unordered_map<int64_t, int32_t> votes;
  votes.reserve(1 << 12);
  for (int64_t p : pairs)
    if (approx[bucket(p)] >= min_votes) ++votes[p];
  std::vector<std::pair<int64_t, int32_t>> sel;
  sel.reserve(votes.size());
  for (auto& kv : votes)
    if (kv.second >= min_votes) sel.push_back(kv);
  std::sort(sel.begin(), sel.end(), [](const auto& a, const auto& b) {
    if (a.second != b.second) return a.second > b.second;
    return a.first < b.first;
  });
  int64_t out_n = std::min<int64_t>(cap, sel.size());
  for (int64_t i = 0; i < out_n; ++i) {
    int64_t pair = sel[i].first;
    out_q[i] = pair >> 38;
    out_src[i] = (pair >> 12) & ((int64_t(1) << 26) - 1);
    out_lidx[i] = pair & 0xFFF;
    out_votes[i] = sel[i].second;
  }
  return out_n;
}

}  // extern "C"
