// Exact weighted 1-D k-means via dynamic programming with
// divide-and-conquer optimization: O(k * n log n).
//
// TPU-native replacement for the reference's `kmeans1d` pip dependency
// (C++ pybind11), used by the ISW sensitive-covariance selection
// (reference: network/cov_settings.py:58).  Called through ctypes from
// pinthememory_tpu/native/__init__.py.
//
// Input: values sorted ascending with nonnegative weights.  Output: cluster
// assignment per value (0-based, ordered by value) and centroids.

#include <cstdint>
#include <cstdlib>
#include <limits>
#include <vector>

namespace {

struct Prefix {
  std::vector<double> w;    // cumulative weight
  std::vector<double> wx;   // cumulative weight*x
  std::vector<double> wxx;  // cumulative weight*x^2

  explicit Prefix(const double* x, const double* wgt, int64_t n)
      : w(n + 1, 0.0), wx(n + 1, 0.0), wxx(n + 1, 0.0) {
    for (int64_t i = 0; i < n; ++i) {
      w[i + 1] = w[i] + wgt[i];
      wx[i + 1] = wx[i] + wgt[i] * x[i];
      wxx[i + 1] = wxx[i] + wgt[i] * x[i] * x[i];
    }
  }

  // weighted SSE of segment [l, r) around its weighted mean
  double cost(int64_t l, int64_t r) const {
    double W = w[r] - w[l];
    if (W <= 0.0) return 0.0;
    double S = wx[r] - wx[l];
    double Q = wxx[r] - wxx[l];
    return Q - S * S / W;
  }
};

// divide & conquer DP layer: cur[i] = min_{j<=i} prev[j] + cost(j, i)
void dc_layer(const Prefix& pf, const std::vector<double>& prev,
              std::vector<double>& cur, std::vector<int64_t>& arg,
              int64_t lo, int64_t hi, int64_t opt_lo, int64_t opt_hi) {
  if (lo > hi) return;
  int64_t mid = (lo + hi) / 2;
  double best = std::numeric_limits<double>::infinity();
  int64_t best_j = opt_lo;
  int64_t jmax = std::min(mid, opt_hi);
  for (int64_t j = opt_lo; j <= jmax; ++j) {
    double c = prev[j] + pf.cost(j, mid);
    if (c < best) {
      best = c;
      best_j = j;
    }
  }
  cur[mid] = best;
  arg[mid] = best_j;
  dc_layer(pf, prev, cur, arg, lo, mid - 1, opt_lo, best_j);
  dc_layer(pf, prev, cur, arg, mid + 1, hi, best_j, opt_hi);
}

}  // namespace

extern "C" {

// x: sorted values (n), w: weights (n), k clusters.
// out_assign: n int64 cluster ids; out_centroids: k doubles.
// Returns the number of clusters actually used (<= k).
int64_t kmeans1d_cluster(const double* x, const double* w, int64_t n,
                         int64_t k, int64_t* out_assign,
                         double* out_centroids) {
  if (n <= 0) return 0;
  if (k > n) k = n;
  Prefix pf(x, w, n);

  const double inf = std::numeric_limits<double>::infinity();
  std::vector<double> prev(n + 1, inf), cur(n + 1, inf);
  std::vector<std::vector<int64_t>> args(k, std::vector<int64_t>(n + 1, 0));
  prev[0] = 0.0;
  // layer 1 directly: cost(0, i)
  for (int64_t i = 0; i <= n; ++i) {
    cur[i] = pf.cost(0, i);
    args[0][i] = 0;
  }
  std::swap(prev, cur);
  for (int64_t layer = 1; layer < k; ++layer) {
    std::fill(cur.begin(), cur.end(), inf);
    dc_layer(pf, prev, cur, args[layer], layer, n, layer - 1, n - 1);
    cur[0] = inf;
    std::swap(prev, cur);
  }

  // backtrack segment boundaries
  std::vector<int64_t> bounds(k + 1, 0);
  bounds[k] = n;
  for (int64_t layer = k - 1; layer >= 0; --layer) {
    bounds[layer] = args[layer][bounds[layer + 1]];
  }
  for (int64_t c = 0; c < k; ++c) {
    int64_t l = bounds[c], r = bounds[c + 1];
    double W = pf.w[r] - pf.w[l];
    out_centroids[c] = W > 0 ? (pf.wx[r] - pf.wx[l]) / W : 0.0;
    for (int64_t i = l; i < r; ++i) out_assign[i] = c;
  }
  return k;
}

}  // extern "C"
