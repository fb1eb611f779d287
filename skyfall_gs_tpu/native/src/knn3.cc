// Grid-hashed 3-nearest-neighbor mean squared distance.
//
// Native counterpart of the reference's `simple-knn` CUDA extension
// (simple_knn._C.distCUDA2, reference scene/gaussian_model.py:25,324):
// used once per scene to initialize Gaussian log-scales from local point
// density.  On this framework's host path a multithreaded uniform-grid
// search is faster than a KD-tree for the ~1e5-1e6 near-uniform satellite
// clouds and has no Python-layer dependencies.
//
// Exposed C ABI:
//   void mean_sq_dist_3nn(const float* pts, int64 n, float* out, int threads)
//     pts: (n, 3) row-major float32; out: (n,) mean of squared distances to
//     the 3 nearest distinct-index neighbors.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

struct Grid {
  float mn[3];
  float inv_cell;
  int dims[3];
  std::vector<int> cell_start;   // prefix offsets, size ncells+1
  std::vector<int> order;        // point indices sorted by cell
};

inline int cell_index(const Grid& g, const float* p) {
  int c[3];
  for (int d = 0; d < 3; ++d) {
    int v = static_cast<int>((p[d] - g.mn[d]) * g.inv_cell);
    c[d] = std::min(std::max(v, 0), g.dims[d] - 1);
  }
  return (c[2] * g.dims[1] + c[1]) * g.dims[0] + c[0];
}

Grid build_grid(const float* pts, int64_t n) {
  Grid g;
  // Percentile-clipped bounds (sampled): outliers otherwise inflate the
  // bbox and starve the dense region of grid resolution.  Points outside
  // clamp into edge cells, which stays correct (just denser edge cells).
  float mx[3];
  const int64_t sample = std::min<int64_t>(n, 20000);
  const int64_t stride = std::max<int64_t>(n / sample, 1);
  std::vector<float> vals(static_cast<size_t>((n + stride - 1) / stride));
  for (int d = 0; d < 3; ++d) {
    size_t m = 0;
    for (int64_t i = 0; i < n; i += stride) vals[m++] = pts[3 * i + d];
    size_t lo = static_cast<size_t>(m * 0.01);
    size_t hi = static_cast<size_t>(m * 0.99);
    hi = std::min(hi, m - 1);
    std::nth_element(vals.begin(), vals.begin() + lo, vals.begin() + m);
    g.mn[d] = vals[lo];
    std::nth_element(vals.begin(), vals.begin() + hi, vals.begin() + m);
    mx[d] = std::max(vals[hi], g.mn[d] + 1e-6f);
  }
  float ext[3];
  double vol = 1.0;
  for (int d = 0; d < 3; ++d) {
    ext[d] = std::max(mx[d] - g.mn[d], 1e-9f);
    vol *= ext[d];
  }
  // ~2 points per cell on average.
  float cell = static_cast<float>(std::cbrt(vol / std::max<double>(n, 1) * 2.0));
  cell = std::max(cell, 1e-9f);
  int64_t ncells = 1;
  for (int d = 0; d < 3; ++d) {
    g.dims[d] = std::max(1, std::min(512, static_cast<int>(ext[d] / cell) + 1));
    ncells *= g.dims[d];
  }
  g.inv_cell = 1.0f / cell;

  std::vector<int> counts(ncells + 1, 0);
  std::vector<int> idx_of(n);
  for (int64_t i = 0; i < n; ++i) {
    int c = cell_index(g, pts + 3 * i);
    idx_of[i] = c;
    counts[c + 1]++;
  }
  for (int64_t c = 0; c < ncells; ++c) counts[c + 1] += counts[c];
  g.cell_start = counts;
  g.order.resize(n);
  std::vector<int> cursor(g.cell_start.begin(), g.cell_start.end() - 1);
  for (int64_t i = 0; i < n; ++i) g.order[cursor[idx_of[i]]++] = static_cast<int>(i);
  return g;
}

inline void consider(float d2, float* best) {
  // keep the 3 smallest in best[0..2] (sorted ascending)
  if (d2 >= best[2]) return;
  if (d2 < best[0]) {
    best[2] = best[1]; best[1] = best[0]; best[0] = d2;
  } else if (d2 < best[1]) {
    best[2] = best[1]; best[1] = d2;
  } else {
    best[2] = d2;
  }
}

void knn_point(const Grid& g, const float* pts, int64_t i, float* out) {
  const float* p = pts + 3 * i;
  int base[3];
  for (int d = 0; d < 3; ++d) {
    int v = static_cast<int>((p[d] - g.mn[d]) * g.inv_cell);
    base[d] = std::min(std::max(v, 0), g.dims[d] - 1);
  }
  float best[3] = {std::numeric_limits<float>::max(),
                   std::numeric_limits<float>::max(),
                   std::numeric_limits<float>::max()};
  const float cell = 1.0f / g.inv_cell;
  int max_ring = std::max(std::max(g.dims[0], g.dims[1]), g.dims[2]);
  for (int ring = 0; ring <= max_ring; ++ring) {
    // Stop once the 3rd-best distance is closer than the nearest possible
    // point in the next unexplored ring.
    if (ring > 0) {
      float ring_min = (ring - 1) * cell;  // conservative
      if (best[2] < ring_min * ring_min) break;
    }
    int z0 = std::max(base[2] - ring, 0), z1 = std::min(base[2] + ring, g.dims[2] - 1);
    int y0 = std::max(base[1] - ring, 0), y1 = std::min(base[1] + ring, g.dims[1] - 1);
    int x0 = std::max(base[0] - ring, 0), x1 = std::min(base[0] + ring, g.dims[0] - 1);
    for (int z = z0; z <= z1; ++z) {
      for (int y = y0; y <= y1; ++y) {
        for (int x = x0; x <= x1; ++x) {
          // only the shell of this ring (interior was visited before)
          if (ring > 0 && std::max({std::abs(x - base[0]), std::abs(y - base[1]),
                                    std::abs(z - base[2])}) != ring) {
            continue;
          }
          int c = (z * g.dims[1] + y) * g.dims[0] + x;
          for (int k = g.cell_start[c]; k < g.cell_start[c + 1]; ++k) {
            int j = g.order[k];
            if (j == static_cast<int>(i)) continue;
            const float* q = pts + 3 * j;
            float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
            consider(dx * dx + dy * dy + dz * dz, best);
          }
        }
      }
    }
  }
  float s = 0.0f;
  int cnt = 0;
  for (int k = 0; k < 3; ++k) {
    if (best[k] < std::numeric_limits<float>::max()) {
      s += best[k];
      ++cnt;
    }
  }
  out[i] = cnt > 0 ? s / cnt : 0.0f;
}

}  // namespace

extern "C" void mean_sq_dist_3nn(const float* pts, int64_t n, float* out,
                                 int threads) {
  if (n <= 0) return;
  Grid g = build_grid(pts, n);
  if (threads <= 0) {
    threads = static_cast<int>(std::thread::hardware_concurrency());
    if (threads <= 0) threads = 4;
  }
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    const int64_t block = 1024;
    while (true) {
      int64_t start = next.fetch_add(block);
      if (start >= n) break;
      int64_t end = std::min(start + block, n);
      for (int64_t i = start; i < end; ++i) knn_point(g, pts, i, out);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
}
