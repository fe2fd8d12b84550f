// s3g_native: host-side data-plane kernels for s3gaussian_tpu.
//
// Native analog of the reference's simple-knn CUDA extension
// (submodules/simple-knn/simple_knn.cu) plus the CPU-hot parts of the
// Waymo reader (lidar -> sparse depth projection,
// scene/dataset_readers.py:823-906).  Exposed through a plain C ABI and
// loaded from Python via ctypes (no pybind11 in this image).
//
// Build: make -C native   (g++ -O3 -fPIC -shared -pthread)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline uint64_t expand_bits(uint64_t x) {
  x = (x | (x << 16)) & 0x030000FFull;
  x = (x | (x << 8)) & 0x0300F00Full;
  x = (x | (x << 4)) & 0x030C30C3ull;
  x = (x | (x << 2)) & 0x09249249ull;
  return x;
}

// 30-bit Morton code from [0,1)^3 (simple_knn.cu:45-70 equivalent).
inline uint64_t morton30(float x, float y, float z) {
  auto q = [](float v) {
    int i = static_cast<int>(v * 1024.0f);
    return static_cast<uint64_t>(std::min(std::max(i, 0), 1023));
  };
  return expand_bits(q(x)) | (expand_bits(q(y)) << 1) |
         (expand_bits(q(z)) << 2);
}

void parallel_for(int64_t n, int n_threads,
                  const std::function<void(int64_t, int64_t)>& fn) {
  if (n_threads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Mean squared distance of the k nearest neighbors, approximate via a
// Morton-sorted +/- window search. points: [n,3] f32, out: [n] f32.
void knn_mean_dist2(const float* points, int64_t n, int k, int window,
                    float* out, int n_threads) {
  if (n <= 1) {
    for (int64_t i = 0; i < n; ++i) out[i] = 0.f;
    return;
  }
  float lo[3] = {points[0], points[1], points[2]};
  float hi[3] = {points[0], points[1], points[2]};
  for (int64_t i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      lo[d] = std::min(lo[d], points[3 * i + d]);
      hi[d] = std::max(hi[d], points[3 * i + d]);
    }
  float span[3];
  for (int d = 0; d < 3; ++d) span[d] = std::max(hi[d] - lo[d], 1e-9f);

  std::vector<std::pair<uint64_t, int64_t>> codes(n);
  parallel_for(n, n_threads, [&](int64_t a, int64_t b) {
    for (int64_t i = a; i < b; ++i) {
      const float* p = points + 3 * i;
      codes[i] = {morton30((p[0] - lo[0]) / span[0], (p[1] - lo[1]) / span[1],
                           (p[2] - lo[2]) / span[2]),
                  i};
    }
  });
  std::sort(codes.begin(), codes.end());

  int kk = std::min<int>(k, static_cast<int>(n) - 1);
  parallel_for(n, n_threads, [&](int64_t a, int64_t b) {
    std::vector<float> best(kk);
    for (int64_t s = a; s < b; ++s) {
      int64_t i = codes[s].second;
      const float* p = points + 3 * i;
      std::fill(best.begin(), best.end(), 1e30f);
      int64_t w0 = std::max<int64_t>(0, s - window);
      int64_t w1 = std::min<int64_t>(n - 1, s + window);
      for (int64_t t = w0; t <= w1; ++t) {
        if (t == s) continue;
        const float* q = points + 3 * codes[t].second;
        float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
        float d2 = dx * dx + dy * dy + dz * dz;
        // insertion into the k-best list
        if (d2 < best[kk - 1]) {
          int j = kk - 1;
          while (j > 0 && best[j - 1] > d2) {
            best[j] = best[j - 1];
            --j;
          }
          best[j] = d2;
        }
      }
      float acc = 0.f;
      for (int j = 0; j < kk; ++j) acc += best[j];
      out[i] = acc / kk;
    }
  });
}

// Project world-space lidar points into a pinhole camera and write a
// sparse depth map (last writer wins per pixel, like the reference's
// numpy assignment, dataset_readers.py:884-887).
// w2c: [3,4] row-major, K: [3,3] row-major, pts: [n,3], depth: [h,w].
void lidar_depth_map(const float* pts, int64_t n, const float* w2c,
                     const float* K, int h, int w, float* depth) {
  std::memset(depth, 0, sizeof(float) * h * w);
  for (int64_t i = 0; i < n; ++i) {
    const float* p = pts + 3 * i;
    float cx = w2c[0] * p[0] + w2c[1] * p[1] + w2c[2] * p[2] + w2c[3];
    float cy = w2c[4] * p[0] + w2c[5] * p[1] + w2c[6] * p[2] + w2c[7];
    float cz = w2c[8] * p[0] + w2c[9] * p[1] + w2c[10] * p[2] + w2c[11];
    float px = K[0] * cx + K[1] * cy + K[2] * cz;
    float py = K[3] * cx + K[4] * cy + K[5] * cz;
    float pz = K[6] * cx + K[7] * cy + K[8] * cz;
    if (pz <= 0.f) continue;
    float u = px / pz, v = py / pz;
    if (u < 0.f || u >= static_cast<float>(w) || v < 0.f ||
        v >= static_cast<float>(h))
      continue;
    depth[static_cast<int>(v) * w + static_cast<int>(u)] = pz;
  }
}

// Voxel dedup: writes indices of the first point per voxel (sorted by
// voxel id) into keep[], returns the kept count (GridSample3D,
// dataset_readers.py:1102-1132).
int64_t voxel_dedup(const float* pts, int64_t n, float voxel,
                    int64_t* keep, int n_threads) {
  if (n == 0) return 0;
  double lo[3] = {1e300, 1e300, 1e300};
  double hi[3] = {-1e300, -1e300, -1e300};
  std::vector<double> q(3 * n);
  for (int64_t i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      double v = std::round(pts[3 * i + d] / voxel);
      q[3 * i + d] = v;
      lo[d] = std::min(lo[d], v);
      hi[d] = std::max(hi[d], v);
    }
  double b1 = hi[1] - lo[1], b2 = hi[2] - lo[2];
  std::vector<std::pair<double, int64_t>> vid(n);
  parallel_for(n, n_threads, [&](int64_t a, int64_t b) {
    for (int64_t i = a; i < b; ++i) {
      double x = q[3 * i] - lo[0], y = q[3 * i + 1] - lo[1],
             z = q[3 * i + 2] - lo[2];
      vid[i] = {x * b1 * b2 + y * b2 + z, i};
    }
  });
  std::stable_sort(vid.begin(), vid.end(),
                   [](const auto& a, const auto& b) { return a.first < b.first; });
  int64_t m = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (i == 0 || vid[i].first != vid[i - 1].first) keep[m++] = vid[i].second;
  }
  return m;
}

}  // extern "C"
