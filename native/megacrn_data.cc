// Native host-side data-pipeline kernels for megacrn-tpu.
//
// The TPU compute path is JAX/XLA; this library is the runtime around it:
// the host input pipeline (window gather, shuffle gather, batch assembly,
// normalisation) implemented in C++ so feeding the device never bottlenecks
// on Python loops. Exposed with a plain C ABI and loaded via ctypes
// (megacrn_tpu/data/native.py) — no pybind11 dependency.
//
// Semantics mirror the reference pipeline exactly:
//   * window gather = generate_training_data.py:44-50 / EXPY getXSYS
//   * permutation gather = model/utils.py:25-27 shuffle
//   * scale = StandardScaler transform (model/utils.py:50-54)
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// out[s, w, :] = data[anchors[s] + offsets[w], :] where a "row" is the
// contiguous (N * C) feature block of one time step.
// data: (T, row) float32; out: (S, W, row) float32.
void mcrn_window_gather(const float* data, int64_t row,
                        const int64_t* anchors, int64_t num_windows,
                        const int64_t* offsets, int64_t window_len,
                        float* out) {
  const size_t row_bytes = static_cast<size_t>(row) * sizeof(float);
  int64_t nthreads = std::min<int64_t>(
      std::max(1u, std::thread::hardware_concurrency()), num_windows);
  std::vector<std::thread> threads;
  threads.reserve(nthreads);
  for (int64_t t = 0; t < nthreads; ++t) {
    threads.emplace_back([=]() {
      for (int64_t s = t; s < num_windows; s += nthreads) {
        float* dst = out + (s * window_len) * row;
        const int64_t anchor = anchors[s];
        for (int64_t w = 0; w < window_len; ++w) {
          std::memcpy(dst + w * row, data + (anchor + offsets[w]) * row,
                      row_bytes);
        }
      }
    });
  }
  for (auto& th : threads) th.join();
}

// dst[i, :] = src[perm[i], :] — shuffle / batch-assembly gather.
// src: (S, row); dst: (B, row).
void mcrn_index_gather(const float* src, int64_t row, const int64_t* perm,
                       int64_t count, float* dst) {
  const size_t row_bytes = static_cast<size_t>(row) * sizeof(float);
  for (int64_t i = 0; i < count; ++i) {
    std::memcpy(dst + i * row, src + perm[i] * row, row_bytes);
  }
}

// In-place standard scaling of a strided channel:
// data[i*stride + offset] = (x - mean) * inv_std for i in [0, count).
void mcrn_scale_channel(float* data, int64_t count, int64_t stride,
                        int64_t offset, float mean, float inv_std) {
  float* p = data + offset;
  for (int64_t i = 0; i < count; ++i) {
    p[i * stride] = (p[i * stride] - mean) * inv_std;
  }
}

// Fused batch prep (prepare_x_y, model/traintest_MegaCRN.py:33-48):
// from raw windows x (B, T, N, C) and y (B, T, N, C) produce
//   x0 (B, T, N, in_dim), y0 (B, T, N, out_dim), ycov (B, T, N, C - out_dim)
// in one pass.
void mcrn_prepare_xy(const float* x, const float* y, int64_t b, int64_t t,
                     int64_t n, int64_t c, int64_t in_dim, int64_t out_dim,
                     float* x0, float* y0, float* ycov) {
  const int64_t cells = b * t * n;
  const int64_t cov = c - out_dim;
  for (int64_t i = 0; i < cells; ++i) {
    const float* xs = x + i * c;
    const float* ys = y + i * c;
    for (int64_t k = 0; k < in_dim; ++k) x0[i * in_dim + k] = xs[k];
    for (int64_t k = 0; k < out_dim; ++k) y0[i * out_dim + k] = ys[k];
    for (int64_t k = 0; k < cov; ++k) ycov[i * cov + k] = ys[out_dim + k];
  }
}

int64_t mcrn_version() { return 1; }

}  // extern "C"
