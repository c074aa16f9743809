// fplnative: host-side native kernels for the fpl_plus_tpu runtime.
//
// Provides the algorithmic native components the reference framework pulled
// from third-party native libraries (SURVEY.md section 2.9):
//   * raster-scan (geodesic/Euclidean) distance transform, 2D + 3D —
//     equivalent of GeodisTK::geodesic{2d,3d}_raster_scan as used by the
//     evaluation path (reference PyMIC/pymic/util/evaluation_seg_train.py:
//     122-126,158-162 — always called with lamb=0 on a zero image, i.e. a
//     pure spacing-weighted chamfer distance, two forward/backward passes).
//   * connected-component labeling (6/26-connectivity union-find) and
//     largest-component extraction — equivalent of scipy.ndimage.label /
//     get_largest_k_components (reference util/image_process.py:139-212).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: make -C fpl_plus_tpu/native  (g++ -O3 -shared -fPIC)

#include <array>
#include <cstdint>
#include <cmath>
#include <cstring>
#include <functional>
#include <vector>
#include <algorithm>

namespace {

inline float local_cost(float spatial2, float gray_diff, float lamb) {
  // lamb = 0 -> pure spatial distance (the only mode the eval path uses);
  // lamb > 0 adds an intensity-difference term (geodesic blend).
  float g = lamb * gray_diff;
  return std::sqrt(spatial2 + g * g);
}

constexpr float kInf = 1e10f;

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Raster-scan distance transform, 3D.
//   img:     [D*H*W] float32 intensity image (may be all zeros)
//   seeds:   [D*H*W] uint8 (nonzero = seed, distance 0)
//   dist:    [D*H*W] float32 output
//   spacing: [3] float32 (sz, sy, sx)
//   lamb:    intensity blend (0 = Euclidean/chamfer)
//   iters:   number of forward+backward raster-scan pairs (reference: 2)
// ---------------------------------------------------------------------------
void raster_scan_distance_3d(const float* img, const uint8_t* seeds,
                             float* dist, int64_t D, int64_t H, int64_t W,
                             const float* spacing, float lamb, int iters) {
  const int64_t n = D * H * W;
  const float sz = spacing[0], sy = spacing[1], sx = spacing[2];
  for (int64_t i = 0; i < n; ++i) dist[i] = seeds[i] ? 0.0f : kInf;

  // 13 causal neighbours for the forward scan (mirrored for backward):
  // all offsets (dz,dy,dx) lexicographically before (0,0,0).
  struct Nb { int dz, dy, dx; float sp2; };
  std::vector<Nb> nbs;
  for (int dz = -1; dz <= 0; ++dz)
    for (int dy = -1; dy <= 1; ++dy)
      for (int dx = -1; dx <= 1; ++dx) {
        if (dz == 0 && (dy > 0 || (dy == 0 && dx >= 0))) continue;
        float s2 = dz * dz * sz * sz + dy * dy * sy * sy + dx * dx * sx * sx;
        nbs.push_back({dz, dy, dx, s2});
      }

  auto relax = [&](int64_t z, int64_t y, int64_t x, int sign) {
    const int64_t idx = (z * H + y) * W + x;
    float best = dist[idx];
    const float g0 = img[idx];
    for (const Nb& nb : nbs) {
      const int64_t zz = z + sign * nb.dz;
      const int64_t yy = y + sign * nb.dy;
      const int64_t xx = x + sign * nb.dx;
      if (zz < 0 || zz >= D || yy < 0 || yy >= H || xx < 0 || xx >= W)
        continue;
      const int64_t nidx = (zz * H + yy) * W + xx;
      const float cand =
          dist[nidx] + local_cost(nb.sp2, g0 - img[nidx], lamb);
      if (cand < best) best = cand;
    }
    dist[idx] = best;
  };

  for (int it = 0; it < iters; ++it) {
    for (int64_t z = 0; z < D; ++z)
      for (int64_t y = 0; y < H; ++y)
        for (int64_t x = 0; x < W; ++x) relax(z, y, x, +1);
    for (int64_t z = D - 1; z >= 0; --z)
      for (int64_t y = H - 1; y >= 0; --y)
        for (int64_t x = W - 1; x >= 0; --x) relax(z, y, x, -1);
  }
}

// 2D variant (H, W); spacing = [sy, sx].
void raster_scan_distance_2d(const float* img, const uint8_t* seeds,
                             float* dist, int64_t H, int64_t W,
                             const float* spacing, float lamb, int iters) {
  float sp3[3] = {1.0f, spacing[0], spacing[1]};
  raster_scan_distance_3d(img, seeds, dist, 1, H, W, sp3, lamb, iters);
}

// ---------------------------------------------------------------------------
// Connected components, 3D union-find.
//   mask:  [D*H*W] uint8 binary input
//   labels:[D*H*W] int32 output, 0 = background, components numbered from 1
//          in decreasing size order (label 1 = largest).
//   connectivity: 6 or 26 (2D images pass D=1 with 4/8 mapped to 6/26).
// returns number of components.
int64_t connected_components_3d(const uint8_t* mask, int32_t* labels,
                                int64_t D, int64_t H, int64_t W,
                                int connectivity) {
  const int64_t n = D * H * W;
  std::vector<int64_t> parent(n, -1);

  std::vector<std::array<int, 3>> offs;
  if (connectivity >= 26) {
    for (int dz = -1; dz <= 0; ++dz)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dx = -1; dx <= 1; ++dx) {
          if (dz == 0 && (dy > 0 || (dy == 0 && dx >= 0))) continue;
          offs.push_back({dz, dy, dx});
        }
  } else {
    offs.push_back({-1, 0, 0});
    offs.push_back({0, -1, 0});
    offs.push_back({0, 0, -1});
  }

  std::vector<int64_t> root(n);
  std::function<int64_t(int64_t)> find = [&](int64_t i) {
    int64_t r = i;
    while (parent[r] != r) r = parent[r];
    while (parent[i] != r) { int64_t next = parent[i]; parent[i] = r; i = next; }
    return r;
  };

  for (int64_t z = 0; z < D; ++z)
    for (int64_t y = 0; y < H; ++y)
      for (int64_t x = 0; x < W; ++x) {
        const int64_t idx = (z * H + y) * W + x;
        if (!mask[idx]) continue;
        parent[idx] = idx;
        for (auto& o : offs) {
          const int64_t zz = z + o[0], yy = y + o[1], xx = x + o[2];
          if (zz < 0 || zz >= D || yy < 0 || yy >= H || xx < 0 || xx >= W)
            continue;
          const int64_t nidx = (zz * H + yy) * W + xx;
          if (parent[nidx] < 0) continue;
          int64_t ra = find(idx), rb = find(nidx);
          if (ra != rb) parent[std::max(ra, rb)] = std::min(ra, rb);
        }
      }

  // compact labels; order components by size (largest = 1)
  std::vector<int64_t> sizes;
  std::vector<int32_t> remap(n, 0);
  std::vector<int64_t> roots;
  for (int64_t i = 0; i < n; ++i) {
    if (parent[i] < 0) { labels[i] = 0; continue; }
    int64_t r = find(i);
    if (remap[r] == 0) {
      roots.push_back(r);
      sizes.push_back(0);
      remap[r] = static_cast<int32_t>(roots.size());
    }
    labels[i] = remap[r];
    sizes[remap[r] - 1] += 1;
  }
  const int64_t ncomp = static_cast<int64_t>(roots.size());
  // rank by size descending
  std::vector<int32_t> order(ncomp);
  for (int32_t i = 0; i < ncomp; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int32_t a, int32_t b) { return sizes[a] > sizes[b]; });
  std::vector<int32_t> rank(ncomp);
  for (int32_t i = 0; i < ncomp; ++i) rank[order[i]] = i + 1;
  for (int64_t i = 0; i < n; ++i)
    if (labels[i] > 0) labels[i] = rank[labels[i] - 1];
  return ncomp;
}

}  // extern "C"
