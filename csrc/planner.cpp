// Native planner core for pymra-tpu.
//
// The host-side tree planner (pymra_tpu/tree/plan.py) spends nearly all of
// its time in thousands of small k-means fits (knot selection and J-way
// domain splits, the counterparts of the reference's sklearn KMeans calls at
// pyMRA/MRANode.py:195,316). This file provides a deterministic
// kmeans++/Lloyd implementation plus a batched driver so a whole tree
// level's nodes can be clustered in one native call, and a quadtree-style
// coordinate-split partitioner. Exposed as plain C symbols for ctypes.
//
// Build: see pymra_tpu/ops/native/__init__.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

namespace {

// SplitMix64 — deterministic, seedable, portable.
struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed + 0x9E3779B97f4A7C15ULL) {}
  uint64_t next() {
    uint64_t z = (state += 0x9E3779B97f4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
  }
  double uniform() {  // in [0, 1)
    return (next() >> 11) * 0x1.0p-53;
  }
  int64_t below(int64_t n) { return (int64_t)(uniform() * n); }
};

inline double sqdist(const double* a, const double* b, int d) {
  double s = 0.0;
  for (int j = 0; j < d; ++j) {
    double diff = a[j] - b[j];
    s += diff * diff;
  }
  return s;
}

}  // namespace

extern "C" {

// k-means++ seeding + Lloyd iterations on an [n, d] row-major point set.
// centers: [k, d] out; labels: [n] out. Returns iterations used, or -1 on
// bad arguments.
int pymra_kmeans(const double* pts, int64_t n, int32_t d, int32_t k,
                 int32_t max_iter, uint64_t seed, double* centers,
                 int32_t* labels) {
  if (n <= 0 || d <= 0 || k <= 0 || k > n) return -1;
  Rng rng(seed);
  std::vector<double> d2(n);

  // k-means++ seeding
  int64_t first = rng.below(n);
  std::memcpy(centers, pts + first * d, sizeof(double) * d);
  for (int64_t i = 0; i < n; ++i) d2[i] = sqdist(pts + i * d, centers, d);
  for (int32_t c = 1; c < k; ++c) {
    double total = 0.0;
    for (int64_t i = 0; i < n; ++i) total += d2[i];
    int64_t pick;
    if (total <= 0.0) {
      pick = rng.below(n);
    } else {
      double u = rng.uniform() * total;
      double acc = 0.0;
      pick = n - 1;
      for (int64_t i = 0; i < n; ++i) {
        acc += d2[i];
        if (acc >= u) { pick = i; break; }
      }
    }
    double* ctr = centers + c * d;
    std::memcpy(ctr, pts + pick * d, sizeof(double) * d);
    for (int64_t i = 0; i < n; ++i)
      d2[i] = std::min(d2[i], sqdist(pts + i * d, ctr, d));
  }

  // Lloyd
  std::vector<double> sums((size_t)k * d);
  std::vector<int64_t> counts(k);
  int32_t it = 0;
  for (; it < max_iter; ++it) {
    bool changed = false;
    for (int64_t i = 0; i < n; ++i) {
      const double* p = pts + i * d;
      double best = sqdist(p, centers, d);
      int32_t arg = 0;
      for (int32_t c = 1; c < k; ++c) {
        double v = sqdist(p, centers + c * d, d);
        if (v < best) { best = v; arg = c; }
      }
      if (it == 0 || labels[i] != arg) { changed = true; labels[i] = arg; }
    }
    if (!changed && it > 0) break;
    std::fill(sums.begin(), sums.end(), 0.0);
    std::fill(counts.begin(), counts.end(), 0);
    for (int64_t i = 0; i < n; ++i) {
      int32_t c = labels[i];
      counts[c]++;
      const double* p = pts + i * d;
      for (int32_t j = 0; j < d; ++j) sums[(size_t)c * d + j] += p[j];
    }
    for (int32_t c = 0; c < k; ++c) {
      if (counts[c] > 0)
        for (int32_t j = 0; j < d; ++j)
          centers[(size_t)c * d + j] = sums[(size_t)c * d + j] / counts[c];
    }
  }
  return it;
}

// Batched k-means over many independent point sets (one tree level's nodes
// in a single native call). Sets are concatenated; offsets[i]..offsets[i+1]
// delimit set i. centers: [n_sets, k, d]; labels: [total_points].
int pymra_kmeans_batch(const double* pts, const int64_t* offsets,
                       int64_t n_sets, int32_t d, int32_t k,
                       int32_t max_iter, uint64_t seed, double* centers,
                       int32_t* labels) {
  for (int64_t s = 0; s < n_sets; ++s) {
    int64_t lo = offsets[s], hi = offsets[s + 1];
    int64_t n = hi - lo;
    int32_t kk = (int32_t)std::min<int64_t>(k, n);
    int rc = pymra_kmeans(pts + lo * d, n, d, kk, max_iter, seed + (uint64_t)s,
                          centers + (size_t)s * k * d, labels + lo);
    if (rc < 0) return -1;
  }
  return 0;
}

// Mean-quadrant coordinate split of an [n, 2] point set (the planner's
// large-node path, counterpart of pyMRA/MRANode.py:230-239): labels 0..3 by
// (x <= mean_x, y <= mean_y).
int pymra_quadrant_split(const double* pts, int64_t n, int32_t* labels) {
  if (n <= 0) return -1;
  double mx = 0.0, my = 0.0;
  for (int64_t i = 0; i < n; ++i) { mx += pts[i * 2]; my += pts[i * 2 + 1]; }
  mx /= n; my /= n;
  for (int64_t i = 0; i < n; ++i) {
    int gx = pts[i * 2] <= mx ? 0 : 1;
    int gy = pts[i * 2 + 1] <= my ? 0 : 1;
    labels[i] = gx * 2 + gy;
  }
  return 0;
}

}  // extern "C"
