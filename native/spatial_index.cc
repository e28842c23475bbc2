// Uniform-grid spatial index for 2-D landmark maps — native host-side
// component of tpu-slam.
//
// Role: the reference generates observations by scanning every landmark per
// query (sim/sim-utils.jl:12-28, O(N) per pose).  At the engine's target
// scales (100k-1M landmarks, BASELINE configs 4-5) the HOST-side users of
// visibility queries — ground-truth dataset generation and the BA keyframe
// factor builder (graph/keyframes.py) — need sub-linear queries; this grid
// hash gives O(cell + hits).  (The on-device sensor path stays a masked
// TPU kernel; this is the data/setup plane, not the compute plane.)
//
// C ABI, consumed via ctypes (tpuslam/native/__init__.py).
//
// Build: make -C native   (produces build/libtpuslam_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct GridIndex {
  double xmin, ymin, inv_cell;
  int nx, ny;
  const double* pts;  // borrowed (2*n doubles, xy pairs)
  int64_t n;
  // CSR layout: cell_start[c]..cell_start[c+1] indexes into cell_items.
  std::vector<int64_t> cell_start;
  std::vector<int64_t> cell_items;

  inline int cell_of(double x, double y) const {
    int cx = static_cast<int>((x - xmin) * inv_cell);
    int cy = static_cast<int>((y - ymin) * inv_cell);
    if (cx < 0) cx = 0;
    if (cy < 0) cy = 0;
    if (cx >= nx) cx = nx - 1;
    if (cy >= ny) cy = ny - 1;
    return cy * nx + cx;
  }
};

}  // namespace

extern "C" {

// Build an index over n points (xy interleaved).  cell_size should be on
// the order of the query radius.  Returns an opaque handle.
void* tpuslam_grid_build(const double* pts, int64_t n, double cell_size) {
  auto* g = new GridIndex();
  g->pts = pts;
  g->n = n;
  double xmin = 1e300, ymin = 1e300, xmax = -1e300, ymax = -1e300;
  for (int64_t i = 0; i < n; ++i) {
    double x = pts[2 * i], y = pts[2 * i + 1];
    if (x < xmin) xmin = x;
    if (x > xmax) xmax = x;
    if (y < ymin) ymin = y;
    if (y > ymax) ymax = y;
  }
  if (n == 0) { xmin = ymin = 0; xmax = ymax = 1; }
  g->xmin = xmin;
  g->ymin = ymin;
  // Cap the table at ~16M cells: a single outlier point (e.g. a diverged
  // estimate fed by a caller) must not stretch the span into a
  // petabyte-sized allocation.  Wider cells only mean more candidates
  // scanned per query — results are identical.
  double cs = cell_size;
  while (((xmax - xmin) / cs + 2.0) * ((ymax - ymin) / cs + 2.0) > 16e6) {
    cs *= 2.0;
  }
  g->inv_cell = 1.0 / cs;
  g->nx = std::max(1, static_cast<int>((xmax - xmin) * g->inv_cell) + 1);
  g->ny = std::max(1, static_cast<int>((ymax - ymin) * g->inv_cell) + 1);

  const int64_t ncells = static_cast<int64_t>(g->nx) * g->ny;
  std::vector<int64_t> counts(ncells + 1, 0);
  std::vector<int> cells(n);
  for (int64_t i = 0; i < n; ++i) {
    cells[i] = g->cell_of(pts[2 * i], pts[2 * i + 1]);
    counts[cells[i] + 1]++;
  }
  for (int64_t c = 0; c < ncells; ++c) counts[c + 1] += counts[c];
  g->cell_start = counts;
  g->cell_items.resize(n);
  std::vector<int64_t> cursor(g->cell_start.begin(), g->cell_start.end() - 1);
  for (int64_t i = 0; i < n; ++i) g->cell_items[cursor[cells[i]]++] = i;
  return g;
}

void tpuslam_grid_free(void* handle) {
  delete static_cast<GridIndex*>(handle);
}

// Visible-landmark query with the reference's sensor acceptance
// (sim/sim-utils.jl:12-28): front half-plane of the heading AND inside
// range.  Writes ascending landmark indices into out (capacity out_cap);
// returns the total number of visible landmarks (may exceed out_cap).
int64_t tpuslam_grid_visible(const void* handle, double px, double py,
                             double phi, double range, int64_t* out,
                             int64_t out_cap) {
  const auto* g = static_cast<const GridIndex*>(handle);
  const double r2 = range * range;
  const double c = std::cos(phi), s = std::sin(phi);

  int cx0 = static_cast<int>((px - range - g->xmin) * g->inv_cell);
  int cx1 = static_cast<int>((px + range - g->xmin) * g->inv_cell);
  int cy0 = static_cast<int>((py - range - g->ymin) * g->inv_cell);
  int cy1 = static_cast<int>((py + range - g->ymin) * g->inv_cell);
  if (cx0 < 0) cx0 = 0;
  if (cy0 < 0) cy0 = 0;
  if (cx1 >= g->nx) cx1 = g->nx - 1;
  if (cy1 >= g->ny) cy1 = g->ny - 1;

  // Gather candidate hits per cell, then sort (cells already store
  // ascending ids; visiting cells in id-order is not guaranteed, so
  // collect + sort for the reference's ascending-index ordering).
  std::vector<int64_t> hits;
  for (int cy = cy0; cy <= cy1; ++cy) {
    for (int cx = cx0; cx <= cx1; ++cx) {
      const int64_t cell = static_cast<int64_t>(cy) * g->nx + cx;
      for (int64_t k = g->cell_start[cell]; k < g->cell_start[cell + 1];
           ++k) {
        const int64_t i = g->cell_items[k];
        const double dx = g->pts[2 * i] - px;
        const double dy = g->pts[2 * i + 1] - py;
        if (dx * c + dy * s > 0 && dx * dx + dy * dy < r2) {
          hits.push_back(i);
        }
      }
    }
  }
  std::sort(hits.begin(), hits.end());
  const int64_t m = static_cast<int64_t>(hits.size());
  const int64_t take = m < out_cap ? m : out_cap;
  std::memcpy(out, hits.data(), take * sizeof(int64_t));
  return m;
}

// Radius-nearest-neighbor match: for each of nq query points (xy
// interleaved), write the index of the NEAREST indexed point within
// `radius` into out_idx (or -1 if none).  Used by the submap layer
// (graph/submaps.py) to associate landmarks across submap boundaries
// before the anchor-graph solve.  O(cells-touched + hits) per query.
void tpuslam_grid_match(const void* handle, const double* qpts, int64_t nq,
                        double radius, int64_t* out_idx) {
  const auto* g = static_cast<const GridIndex*>(handle);
  const double r2 = radius * radius;
  for (int64_t q = 0; q < nq; ++q) {
    const double px = qpts[2 * q], py = qpts[2 * q + 1];
    int cx0 = static_cast<int>((px - radius - g->xmin) * g->inv_cell);
    int cx1 = static_cast<int>((px + radius - g->xmin) * g->inv_cell);
    int cy0 = static_cast<int>((py - radius - g->ymin) * g->inv_cell);
    int cy1 = static_cast<int>((py + radius - g->ymin) * g->inv_cell);
    if (cx0 < 0) cx0 = 0;
    if (cy0 < 0) cy0 = 0;
    if (cx1 >= g->nx) cx1 = g->nx - 1;
    if (cy1 >= g->ny) cy1 = g->ny - 1;
    int64_t best = -1;
    double best_d2 = r2;
    for (int cy = cy0; cy <= cy1; ++cy) {
      for (int cx = cx0; cx <= cx1; ++cx) {
        const int64_t cell = static_cast<int64_t>(cy) * g->nx + cx;
        for (int64_t k = g->cell_start[cell]; k < g->cell_start[cell + 1];
             ++k) {
          const int64_t i = g->cell_items[k];
          const double dx = g->pts[2 * i] - px;
          const double dy = g->pts[2 * i + 1] - py;
          const double d2 = dx * dx + dy * dy;
          // Strict < keeps the lowest index on exact ties (ids ascend
          // within a cell), matching the NumPy fallback's argmin.
          if (d2 < best_d2) {
            best_d2 = d2;
            best = i;
          }
        }
      }
    }
    out_idx[q] = best;
  }
}

// Like tpuslam_grid_match but skipping one excluded index per query
// (exclude[i], or -1 for none) — the self-match case when querying an
// index with its own points (duplicate-merge pass, graph/submaps.py).
void tpuslam_grid_match_excl(const void* handle, const double* qpts,
                             int64_t nq, double radius,
                             const int64_t* exclude, int64_t* out_idx) {
  const auto* g = static_cast<const GridIndex*>(handle);
  const double r2 = radius * radius;
  for (int64_t q = 0; q < nq; ++q) {
    const double px = qpts[2 * q], py = qpts[2 * q + 1];
    const int64_t ex = exclude ? exclude[q] : -1;
    int cx0 = static_cast<int>((px - radius - g->xmin) * g->inv_cell);
    int cx1 = static_cast<int>((px + radius - g->xmin) * g->inv_cell);
    int cy0 = static_cast<int>((py - radius - g->ymin) * g->inv_cell);
    int cy1 = static_cast<int>((py + radius - g->ymin) * g->inv_cell);
    if (cx0 < 0) cx0 = 0;
    if (cy0 < 0) cy0 = 0;
    if (cx1 >= g->nx) cx1 = g->nx - 1;
    if (cy1 >= g->ny) cy1 = g->ny - 1;
    int64_t best = -1;
    double best_d2 = r2;
    for (int cy = cy0; cy <= cy1; ++cy) {
      for (int cx = cx0; cx <= cx1; ++cx) {
        const int64_t cell = static_cast<int64_t>(cy) * g->nx + cx;
        for (int64_t k = g->cell_start[cell]; k < g->cell_start[cell + 1];
             ++k) {
          const int64_t i = g->cell_items[k];
          if (i == ex) continue;
          const double dx = g->pts[2 * i] - px;
          const double dy = g->pts[2 * i + 1] - py;
          const double d2 = dx * dx + dy * dy;
          if (d2 < best_d2) {
            best_d2 = d2;
            best = i;
          }
        }
      }
    }
    out_idx[q] = best;
  }
}

// Translation-voting registration (landmark-cloud scan matching): for
// each query point, every indexed point within `radius` casts a vote for
// the offset (indexed - query) into a (2*radius/bin)^2 histogram; the
// returned offset is the refined mean of votes near the peak.  Robust to
// drift LARGER than the landmark spacing where nearest-neighbor matching
// locks in wrong pairs (graph/submaps.py registration pass).  Returns
// the peak vote count; writes the offset into out_dxy[2].
int64_t tpuslam_grid_offset_vote(const void* handle, const double* qpts,
                                 int64_t nq, double radius, double bin,
                                 double* out_dxy) {
  const auto* g = static_cast<const GridIndex*>(handle);
  const double r2 = radius * radius;
  const int nb = std::max(1, static_cast<int>(2.0 * radius / bin) + 1);
  std::vector<int32_t> hist(static_cast<size_t>(nb) * nb, 0);
  std::vector<double> dxs, dys;
  dxs.reserve(256);
  dys.reserve(256);

  for (int64_t q = 0; q < nq; ++q) {
    const double px = qpts[2 * q], py = qpts[2 * q + 1];
    int cx0 = static_cast<int>((px - radius - g->xmin) * g->inv_cell);
    int cx1 = static_cast<int>((px + radius - g->xmin) * g->inv_cell);
    int cy0 = static_cast<int>((py - radius - g->ymin) * g->inv_cell);
    int cy1 = static_cast<int>((py + radius - g->ymin) * g->inv_cell);
    if (cx0 < 0) cx0 = 0;
    if (cy0 < 0) cy0 = 0;
    if (cx1 >= g->nx) cx1 = g->nx - 1;
    if (cy1 >= g->ny) cy1 = g->ny - 1;
    for (int cy = cy0; cy <= cy1; ++cy) {
      for (int cx = cx0; cx <= cx1; ++cx) {
        const int64_t cell = static_cast<int64_t>(cy) * g->nx + cx;
        for (int64_t k = g->cell_start[cell]; k < g->cell_start[cell + 1];
             ++k) {
          const int64_t i = g->cell_items[k];
          const double dx = g->pts[2 * i] - px;
          const double dy = g->pts[2 * i + 1] - py;
          if (dx * dx + dy * dy >= r2) continue;
          int bx = static_cast<int>((dx + radius) / bin);
          int by = static_cast<int>((dy + radius) / bin);
          if (bx < 0) bx = 0;
          if (by < 0) by = 0;
          if (bx >= nb) bx = nb - 1;
          if (by >= nb) by = nb - 1;
          hist[static_cast<size_t>(by) * nb + bx]++;
          dxs.push_back(dx);
          dys.push_back(dy);
        }
      }
    }
  }

  // Peak cell (3x3 smoothed to tolerate bin-edge splits).
  int64_t best = -1;
  int bbx = 0, bby = 0;
  for (int by = 0; by < nb; ++by) {
    for (int bx = 0; bx < nb; ++bx) {
      int64_t s = 0;
      for (int oy = -1; oy <= 1; ++oy) {
        for (int ox = -1; ox <= 1; ++ox) {
          const int x = bx + ox, y = by + oy;
          if (x >= 0 && x < nb && y >= 0 && y < nb) {
            s += hist[static_cast<size_t>(y) * nb + x];
          }
        }
      }
      if (s > best) {
        best = s;
        bbx = bx;
        bby = by;
      }
    }
  }
  const double cx = (bbx + 0.5) * bin - radius;
  const double cy = (bby + 0.5) * bin - radius;
  // Refine: mean of votes within 1.5*bin of the peak center.
  double sx = 0.0, sy = 0.0;
  int64_t cnt = 0;
  const double rr = 1.5 * bin;
  for (size_t k = 0; k < dxs.size(); ++k) {
    if (std::abs(dxs[k] - cx) <= rr && std::abs(dys[k] - cy) <= rr) {
      sx += dxs[k];
      sy += dys[k];
      cnt++;
    }
  }
  out_dxy[0] = cnt ? sx / cnt : 0.0;
  out_dxy[1] = cnt ? sy / cnt : 0.0;
  return cnt;
}

// Batch BA observation-factor generation: for K keyframe poses (x,y,phi
// triples), emit (pose_idx, landmark_idx, range, bearing) per visible
// pair, with optional Gaussian noise supplied by the caller as
// pre-generated standard-normal pairs indexed per emitted factor.
// Returns the number of factors emitted (<= cap).  noise may be null.
int64_t tpuslam_ba_factors(const void* handle, const double* poses,
                           int64_t n_poses, double range,
                           const double* noise, double sigma_r,
                           double sigma_b, int32_t* out_p, int32_t* out_l,
                           double* out_z, int64_t cap) {
  const auto* g = static_cast<const GridIndex*>(handle);
  std::vector<int64_t> buf(g->n);
  int64_t f = 0;
  for (int64_t k = 0; k < n_poses; ++k) {
    const double px = poses[3 * k], py = poses[3 * k + 1],
                 phi = poses[3 * k + 2];
    int64_t m = tpuslam_grid_visible(g, px, py, phi, range, buf.data(),
                                     static_cast<int64_t>(buf.size()));
    if (m > static_cast<int64_t>(buf.size()))
      m = static_cast<int64_t>(buf.size());
    for (int64_t j = 0; j < m && f < cap; ++j, ++f) {
      const int64_t i = buf[j];
      const double dx = g->pts[2 * i] - px;
      const double dy = g->pts[2 * i + 1] - py;
      double r = std::sqrt(dx * dx + dy * dy);
      double b = std::atan2(dy, dx) - phi;
      if (noise != nullptr) {
        r += noise[2 * f] * sigma_r;
        b += noise[2 * f + 1] * sigma_b;
      }
      out_p[f] = static_cast<int32_t>(k);
      out_l[f] = static_cast<int32_t>(i);
      out_z[2 * f] = r;
      out_z[2 * f + 1] = b;
    }
  }
  return f;
}

// Union-find over a sparse nearest-neighbor edge list: nn[i] >= 0 links
// node i with node nn[i] (the duplicate-merge graph from
// graph/submaps.py:merge_duplicates).  Writes each node's root into
// out_roots, with the smallest member index as the canonical root —
// matching the NumPy fallback's min-root convention exactly.
void tpuslam_union_find(const int64_t* nn, int64_t n, int64_t* out_roots) {
  std::vector<int64_t> parent(n);
  for (int64_t i = 0; i < n; ++i) parent[i] = i;
  auto find = [&](int64_t i) {
    while (parent[i] != i) {
      parent[i] = parent[parent[i]];
      i = parent[i];
    }
    return i;
  };
  for (int64_t i = 0; i < n; ++i) {
    if (nn[i] >= 0 && nn[i] < n) {
      int64_t ri = find(i), rj = find(nn[i]);
      if (ri != rj) parent[std::max(ri, rj)] = std::min(ri, rj);
    }
  }
  for (int64_t i = 0; i < n; ++i) out_roots[i] = find(i);
}

}  // extern "C"
