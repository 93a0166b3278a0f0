// Native host-side image preprocessing for burn_depth_tpu.
//
// Role of the reference's native (Rust) preprocessing path: the packed-RGB →
// normalized-NCHW conversion (`src/inference.rs:79-121`), the shortest-side
// CatmullRom resize + center crop (`src/model/mod.rs:162-210`), and the
// realtime frame prep (`crates/bevy_burn_depth/src/lib.rs:76-132`).  The JAX
// serving path resizes on device; this library is for the host ingest lane
// (camera frames / image files → staged NCHW buffers) where Python-side
// numpy becomes the bottleneck at streaming rates.
//
// Semantics match burn_depth_tpu/api/preprocess.py bit-for-bit for u8:
// half-pixel sampling, cubic kernel with parameter `a` (CatmullRom a=-0.5,
// torch a=-0.75), clamped borders, per-axis weight normalization, single
// floor(x+0.5) rounding at the end.
//
// Build: `make -C native` → libburn_depth_host.so (ctypes-loaded by
// burn_depth_tpu/api/native.py, numpy fallback when absent).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline double cubic_weight(double x, double a) {
  double ax = std::fabs(x);
  if (ax <= 1.0) return (a + 2.0) * ax * ax * ax - (a + 3.0) * ax * ax + 1.0;
  if (ax < 2.0) return a * ax * ax * ax - 5.0 * a * ax * ax + 8.0 * a * ax - 4.0 * a;
  return 0.0;
}

struct AxisTaps {
  std::vector<int> idx;      // [dst * 4]
  std::vector<double> w;     // [dst * 4], normalized per output element
};

AxisTaps axis_taps(int src, int dst, double a) {
  AxisTaps t;
  t.idx.resize(static_cast<size_t>(dst) * 4);
  t.w.resize(static_cast<size_t>(dst) * 4);
  const double scale = static_cast<double>(src) / dst;
  for (int o = 0; o < dst; ++o) {
    const double coord = (o + 0.5) * scale - 0.5;
    const int base = static_cast<int>(std::floor(coord));
    double sum = 0.0;
    for (int k = 0; k < 4; ++k) {
      const int i = base - 1 + k;
      const double wk = cubic_weight(coord - i, a);
      t.idx[o * 4 + k] = std::clamp(i, 0, src - 1);
      t.w[o * 4 + k] = wk;
      sum += wk;
    }
    for (int k = 0; k < 4; ++k) t.w[o * 4 + k] /= sum;
  }
  return t;
}

void parallel_rows(int rows, const std::function<void(int, int)>& fn) {
  unsigned n = std::max(1u, std::min(std::thread::hardware_concurrency(),
                                     static_cast<unsigned>(rows)));
  if (n <= 1) {
    fn(0, rows);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(n);
  const int chunk = (rows + static_cast<int>(n) - 1) / static_cast<int>(n);
  for (unsigned i = 0; i < n; ++i) {
    const int lo = static_cast<int>(i) * chunk;
    const int hi = std::min(rows, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back(fn, lo, hi);
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// [sh, sw, c] u8 → [dh, dw, c] u8, bicubic kernel parameter `a`.
void bd_resize_bicubic_u8(const uint8_t* src, int sh, int sw, int c,
                          uint8_t* dst, int dh, int dw, double a) {
  const AxisTaps ty = axis_taps(sh, dh, a);
  const AxisTaps tx = axis_taps(sw, dw, a);
  // Row pass into a double intermediate [dh, sw, c] — double accumulation
  // keeps the final floor(x+0.5) rounding bit-identical to the float64
  // numpy reference (api/preprocess.py).
  std::vector<double> tmp(static_cast<size_t>(dh) * sw * c);
  parallel_rows(dh, [&](int lo, int hi) {
    for (int y = lo; y < hi; ++y) {
      double* out_row = &tmp[static_cast<size_t>(y) * sw * c];
      std::memset(out_row, 0, sizeof(double) * static_cast<size_t>(sw) * c);
      for (int k = 0; k < 4; ++k) {
        const double wy = ty.w[y * 4 + k];
        const uint8_t* in_row = src + static_cast<size_t>(ty.idx[y * 4 + k]) * sw * c;
        for (int i = 0; i < sw * c; ++i) out_row[i] += wy * in_row[i];
      }
    }
  });
  // Column pass + rounding.
  parallel_rows(dh, [&](int lo, int hi) {
    for (int y = lo; y < hi; ++y) {
      const double* in_row = &tmp[static_cast<size_t>(y) * sw * c];
      uint8_t* out_row = dst + static_cast<size_t>(y) * dw * c;
      for (int x = 0; x < dw; ++x) {
        for (int ch = 0; ch < c; ++ch) {
          double acc = 0.0;
          for (int k = 0; k < 4; ++k)
            acc += tx.w[x * 4 + k] * in_row[tx.idx[x * 4 + k] * c + ch];
          const double r = std::floor(acc + 0.5);
          out_row[x * c + ch] = static_cast<uint8_t>(std::clamp(r, 0.0, 255.0));
        }
      }
    }
  });
}

// Packed [h, w, 3] u8 RGB → normalized [3, h, w] f32 NCHW
// (reference rgb_to_input_tensor, inference.rs:79-121).
void bd_rgb_to_nchw_norm(const uint8_t* rgb, int h, int w, float* out,
                         const float* mean, const float* stddev) {
  const float inv255 = 1.0f / 255.0f;
  float inv_std[3] = {1.0f / stddev[0], 1.0f / stddev[1], 1.0f / stddev[2]};
  parallel_rows(h, [&](int lo, int hi) {
    for (int y = lo; y < hi; ++y) {
      const uint8_t* row = rgb + static_cast<size_t>(y) * w * 3;
      for (int ch = 0; ch < 3; ++ch) {
        float* dst = out + (static_cast<size_t>(ch) * h + y) * w;
        const float m = mean[ch], s = inv_std[ch];
        for (int x = 0; x < w; ++x) dst[x] = (row[x * 3 + ch] * inv255 - m) * s;
      }
    }
  });
}

// Fused DA3 ingest: shortest-side bicubic resize + center crop to
// `target`x`target` + ImageNet normalize → [3, target, target] f32
// (prepare_depth_anything3_image + rgb_to_input_tensor in one pass).
void bd_prepare_image_nchw(const uint8_t* rgb, int h, int w, int target,
                           double a, float* out, const float* mean,
                           const float* stddev) {
  if (h == target && w == target) {
    bd_rgb_to_nchw_norm(rgb, h, w, out, mean, stddev);
    return;
  }
  const int shortest = std::max(std::min(h, w), 1);
  const double scale = static_cast<double>(target) / shortest;
  const int sw = std::max(static_cast<int>(std::lround(w * scale)), target);
  const int sh = std::max(static_cast<int>(std::lround(h * scale)), target);
  std::vector<uint8_t> resized(static_cast<size_t>(sh) * sw * 3);
  bd_resize_bicubic_u8(rgb, h, w, 3, resized.data(), sh, sw, a);
  const int cx = (sw - target) / 2;
  const int cy = (sh - target) / 2;
  std::vector<uint8_t> cropped(static_cast<size_t>(target) * target * 3);
  for (int y = 0; y < target; ++y)
    std::memcpy(&cropped[static_cast<size_t>(y) * target * 3],
                &resized[(static_cast<size_t>(y + cy) * sw + cx) * 3],
                static_cast<size_t>(target) * 3);
  bd_rgb_to_nchw_norm(cropped.data(), target, target, out, mean, stddev);
}

int bd_version() { return 3; }  // 2: +fast_jpeg; 3: +exif_rotate

}  // extern "C"
