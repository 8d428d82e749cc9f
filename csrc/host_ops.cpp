// Native host-side data-pipeline kernels for vibertgrid_tpu.
//
// The reference's host pipeline is pure Python (PIL/torchvision transforms,
// pandas CSV); at production scale the host becomes the bottleneck feeding
// the TPU, so the hot per-sample ops live here as a small C++ library bound
// via ctypes (vibertgrid_tpu/data/native.py) with numpy fallbacks:
//
//  - bilinear_resize_f32: torch `F.interpolate(..., mode='bilinear',
//    align_corners=False)` semantics (half-pixel source grid, edge clamp) —
//    must match vibertgrid_tpu/data/transform.py::bilinear_resize exactly.
//  - rasterize_winner_i32: later-box-wins winner map (the host-side oracle of
//    ops/rasterize.py::box_winner_map), used for CPU-side label generation.
//  - pad_batch_f32: copy a sample into the top-left corner of a padded
//    bucket image (collation hot loop).
//
// Build: csrc/build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// src: [h, w, c] float32 row-major → dst: [oh, ow, c]
void bilinear_resize_f32(const float* src, int h, int w, int c, float* dst,
                         int oh, int ow) {
  const double sy = static_cast<double>(h) / oh;
  const double sx = static_cast<double>(w) / ow;

  // Precompute x-axis taps once per row sweep.
  int* xlo = new int[ow];
  int* xhi = new int[ow];
  float* xf = new float[ow];
  for (int j = 0; j < ow; ++j) {
    double srcx = (j + 0.5) * sx - 0.5;
    srcx = std::min(std::max(srcx, 0.0), static_cast<double>(w - 1));
    int lo = static_cast<int>(std::floor(srcx));
    xlo[j] = lo;
    xhi[j] = std::min(lo + 1, w - 1);
    xf[j] = static_cast<float>(srcx - lo);
  }

  for (int i = 0; i < oh; ++i) {
    double srcy = (i + 0.5) * sy - 0.5;
    srcy = std::min(std::max(srcy, 0.0), static_cast<double>(h - 1));
    const int ylo = static_cast<int>(std::floor(srcy));
    const int yhi = std::min(ylo + 1, h - 1);
    const float fy = static_cast<float>(srcy - ylo);
    const float* top_row = src + static_cast<size_t>(ylo) * w * c;
    const float* bot_row = src + static_cast<size_t>(yhi) * w * c;
    float* out_row = dst + static_cast<size_t>(i) * ow * c;
    for (int j = 0; j < ow; ++j) {
      const float fx = xf[j];
      const float* tl = top_row + static_cast<size_t>(xlo[j]) * c;
      const float* tr = top_row + static_cast<size_t>(xhi[j]) * c;
      const float* bl = bot_row + static_cast<size_t>(xlo[j]) * c;
      const float* br = bot_row + static_cast<size_t>(xhi[j]) * c;
      float* o = out_row + static_cast<size_t>(j) * c;
      for (int k = 0; k < c; ++k) {
        const float topv = tl[k] * (1.0f - fx) + tr[k] * fx;
        const float botv = bl[k] * (1.0f - fx) + br[k] * fx;
        o[k] = topv * (1.0f - fy) + botv * fy;
      }
    }
  }
  delete[] xlo;
  delete[] xhi;
  delete[] xf;
}

// boxes: [s, 4] int32 (x0, y0, x1, y1) image px; mask: [s] uint8.
// out: [h, w] int32, 0 = uncovered, else 1 + index of last covering box.
void rasterize_winner_i32(const int32_t* boxes, const uint8_t* mask, int s,
                          int32_t* out, int h, int w, int stride) {
  std::memset(out, 0, static_cast<size_t>(h) * w * sizeof(int32_t));
  for (int i = 0; i < s; ++i) {
    if (!mask[i]) continue;
    // floor-div semantics of int(coor / stride) for non-negative coords
    int x0 = boxes[i * 4 + 0] / stride;
    int y0 = boxes[i * 4 + 1] / stride;
    int x1 = boxes[i * 4 + 2] / stride;
    int y1 = boxes[i * 4 + 3] / stride;
    x0 = std::max(x0, 0);
    y0 = std::max(y0, 0);
    x1 = std::min(x1, w);
    y1 = std::min(y1, h);
    for (int y = y0; y < y1; ++y) {
      int32_t* row = out + static_cast<size_t>(y) * w;
      for (int x = x0; x < x1; ++x) row[x] = i + 1;
    }
  }
}

// src: [h, w, c] → copy into dst: [bh, bw, c] at the top-left (dst already
// zeroed by the caller or zero_first != 0).
void pad_batch_f32(const float* src, int h, int w, int c, float* dst, int bh,
                   int bw, int zero_first) {
  if (zero_first) {
    std::memset(dst, 0, static_cast<size_t>(bh) * bw * c * sizeof(float));
  }
  for (int i = 0; i < h; ++i) {
    std::memcpy(dst + static_cast<size_t>(i) * bw * c,
                src + static_cast<size_t>(i) * w * c,
                static_cast<size_t>(w) * c * sizeof(float));
  }
}

// Fused resize + per-channel normalize: o = (bilinear(src) - mean) / std,
// written into a row-strided destination (dst_row_elems floats between row
// starts). Lets collation resize each sample DIRECTLY into its slot of the
// padded batch canvas -- the former pad_batch_f32 copy (a full extra
// write+read of the canvas) disappears from the hot loop. Same taps as
// bilinear_resize_f32; oh==h && ow==w degenerates to a pure normalize copy.
void bilinear_resize_norm_strided_f32(const float* src, int h, int w, int c,
                                      float* dst, int oh, int ow,
                                      long dst_row_elems, const float* mean,
                                      const float* std_) {
  float inv_std_local[16];
  float* inv_std = inv_std_local;
  float* heap = nullptr;
  if (c > 16) {
    heap = new float[c];
    inv_std = heap;
  }
  for (int k = 0; k < c; ++k) inv_std[k] = 1.0f / std_[k];

  if (oh == h && ow == w) {
    for (int i = 0; i < h; ++i) {
      const float* srow = src + static_cast<size_t>(i) * w * c;
      float* orow = dst + static_cast<size_t>(i) * dst_row_elems;
      for (int j = 0; j < w; ++j) {
        const float* s = srow + static_cast<size_t>(j) * c;
        float* o = orow + static_cast<size_t>(j) * c;
        for (int k = 0; k < c; ++k) o[k] = (s[k] - mean[k]) * inv_std[k];
      }
    }
    delete[] heap;
    return;
  }

  const double sy = static_cast<double>(h) / oh;
  const double sx = static_cast<double>(w) / ow;
  int* xlo = new int[ow];
  int* xhi = new int[ow];
  float* xf = new float[ow];
  for (int j = 0; j < ow; ++j) {
    double srcx = (j + 0.5) * sx - 0.5;
    srcx = std::min(std::max(srcx, 0.0), static_cast<double>(w - 1));
    int lo = static_cast<int>(std::floor(srcx));
    xlo[j] = lo;
    xhi[j] = std::min(lo + 1, w - 1);
    xf[j] = static_cast<float>(srcx - lo);
  }
  for (int i = 0; i < oh; ++i) {
    double srcy = (i + 0.5) * sy - 0.5;
    srcy = std::min(std::max(srcy, 0.0), static_cast<double>(h - 1));
    const int ylo = static_cast<int>(std::floor(srcy));
    const int yhi = std::min(ylo + 1, h - 1);
    const float fy = static_cast<float>(srcy - ylo);
    const float* top_row = src + static_cast<size_t>(ylo) * w * c;
    const float* bot_row = src + static_cast<size_t>(yhi) * w * c;
    float* out_row = dst + static_cast<size_t>(i) * dst_row_elems;
    for (int j = 0; j < ow; ++j) {
      const float fx = xf[j];
      const float* tl = top_row + static_cast<size_t>(xlo[j]) * c;
      const float* tr = top_row + static_cast<size_t>(xhi[j]) * c;
      const float* bl = bot_row + static_cast<size_t>(xlo[j]) * c;
      const float* br = bot_row + static_cast<size_t>(xhi[j]) * c;
      float* o = out_row + static_cast<size_t>(j) * c;
      for (int k = 0; k < c; ++k) {
        const float topv = tl[k] * (1.0f - fx) + tr[k] * fx;
        const float botv = bl[k] * (1.0f - fx) + br[k] * fx;
        o[k] = (topv * (1.0f - fy) + botv * fy - mean[k]) * inv_std[k];
      }
    }
  }
  delete[] xlo;
  delete[] xhi;
  delete[] xf;
  delete[] heap;
}

void bilinear_resize_norm_f32(const float* src, int h, int w, int c,
                              float* dst, int oh, int ow, const float* mean,
                              const float* std_) {
  bilinear_resize_norm_strided_f32(src, h, w, c, dst, oh, ow,
                                   static_cast<long>(ow) * c, mean, std_);
}

}  // extern "C"
