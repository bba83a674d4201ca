// Native host-side image resampling for style_transfer2_tpu.
//
// The reference fans PIL's C resampling core across a Python thread pool
// (reference utils.py:130-160). This library is the equivalent native
// component: separable Lanczos3/bilinear resampling of float32 planes with
// PIL-compatible semantics (filter support scales with the downsampling
// ratio, i.e. antialiased), multithreaded across planes in C++ instead of
// Python threads. Loaded via ctypes (style_transfer2_tpu/native/resample.py);
// PIL remains the fallback when the library isn't built.
//
// Build: make -C native    (outputs style_transfer2_tpu/native/libst2resample.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kLanczos3 = 0;
constexpr int kBilinear = 1;

double sinc(double x) {
  if (x == 0.0) return 1.0;
  const double pix = M_PI * x;
  return std::sin(pix) / pix;
}

double filter_value(int method, double x) {
  if (method == kLanczos3) {
    if (x <= -3.0 || x >= 3.0) return 0.0;
    return sinc(x) * sinc(x / 3.0);
  }
  // bilinear (triangle)
  x = std::abs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

double filter_support(int method) { return method == kLanczos3 ? 3.0 : 1.0; }

// Precomputed sparse weight table: for each output index, the input window
// [bounds[2i], bounds[2i]+bounds[2i+1]) and its normalized weights.
struct WeightTable {
  std::vector<int> bounds;       // 2 * out: (start, size)
  std::vector<double> weights;   // out * ksize
  int ksize = 0;
};

WeightTable make_weights(int in_size, int out_size, int method) {
  WeightTable t;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);  // antialias on downscale
  const double support = filter_support(method) * filterscale;
  t.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  t.bounds.resize(2 * out_size);
  t.weights.assign(static_cast<size_t>(out_size) * t.ksize, 0.0);

  for (int i = 0; i < out_size; i++) {
    const double center = (i + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    const int size = xmax - xmin;
    double* w = &t.weights[static_cast<size_t>(i) * t.ksize];
    double total = 0.0;
    for (int j = 0; j < size; j++) {
      const double x = (xmin + j + 0.5 - center) / filterscale;
      w[j] = filter_value(method, x);
      total += w[j];
    }
    if (total != 0.0) {
      for (int j = 0; j < size; j++) w[j] /= total;
    }
    t.bounds[2 * i] = xmin;
    t.bounds[2 * i + 1] = size;
  }
  return t;
}

// Horizontal pass: (h, in_w) -> (h, out_w).
void resample_horizontal(const float* src, int h, int in_w, float* dst,
                         int out_w, const WeightTable& t) {
  for (int y = 0; y < h; y++) {
    const float* row = src + static_cast<size_t>(y) * in_w;
    float* out = dst + static_cast<size_t>(y) * out_w;
    for (int x = 0; x < out_w; x++) {
      const int xmin = t.bounds[2 * x];
      const int size = t.bounds[2 * x + 1];
      const double* w = &t.weights[static_cast<size_t>(x) * t.ksize];
      double acc = 0.0;
      for (int j = 0; j < size; j++) acc += row[xmin + j] * w[j];
      out[x] = static_cast<float>(acc);
    }
  }
}

// Vertical pass: (in_h, w) -> (out_h, w).
void resample_vertical(const float* src, int in_h, int w, float* dst,
                       int out_h, const WeightTable& t) {
  for (int y = 0; y < out_h; y++) {
    const int ymin = t.bounds[2 * y];
    const int size = t.bounds[2 * y + 1];
    const double* wt = &t.weights[static_cast<size_t>(y) * t.ksize];
    float* out = dst + static_cast<size_t>(y) * w;
    std::vector<double> acc(w, 0.0);
    for (int j = 0; j < size; j++) {
      const float* row = src + static_cast<size_t>(ymin + j) * w;
      const double wj = wt[j];
      for (int x = 0; x < w; x++) acc[x] += row[x] * wj;
    }
    for (int x = 0; x < w; x++) out[x] = static_cast<float>(acc[x]);
  }
}

void resample_one(const float* src, int sh, int sw, float* dst, int dh,
                  int dw, const WeightTable& th, const WeightTable& tv,
                  float* tmp /* sh * dw */) {
  resample_horizontal(src, sh, sw, tmp, dw, th);
  resample_vertical(tmp, sh, dw, dst, dh, tv);
}

}  // namespace

extern "C" {

// Resamples `n` independent float32 planes of (sh, sw) to (dh, dw).
// method: 0 = lanczos3, 1 = bilinear. n_threads <= 0 = hardware count.
// Returns 0 on success.
int st2_resample_planes_f32(const float* src, int n, int sh, int sw,
                            float* dst, int dh, int dw, int method,
                            int n_threads) {
  if (n <= 0 || sh <= 0 || sw <= 0 || dh <= 0 || dw <= 0) return 1;
  if (method != kLanczos3 && method != kBilinear) return 2;

  const WeightTable th = make_weights(sw, dw, method);
  const WeightTable tv = make_weights(sh, dh, method);

  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  n_threads = std::min(n_threads, n);

  auto work = [&](int start, int step) {
    std::vector<float> tmp(static_cast<size_t>(sh) * dw);
    for (int i = start; i < n; i += step) {
      resample_one(src + static_cast<size_t>(i) * sh * sw, sh, sw,
                   dst + static_cast<size_t>(i) * dh * dw, dh, dw, th, tv,
                   tmp.data());
    }
  };

  if (n_threads == 1) {
    work(0, 1);
  } else {
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int k = 0; k < n_threads; k++) threads.emplace_back(work, k, n_threads);
    for (auto& thr : threads) thr.join();
  }
  return 0;
}

int st2_resample_plane_f32(const float* src, int sh, int sw, float* dst,
                           int dh, int dw, int method) {
  return st2_resample_planes_f32(src, 1, sh, sw, dst, dh, dw, method, 1);
}

}  // extern "C"
