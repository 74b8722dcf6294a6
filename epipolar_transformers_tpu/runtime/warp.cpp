// Native host data-path kernels for the input pipeline.
//
// The reference's loader spends its time in cv2.undistort / cv2.warpAffine /
// Gaussian-target rendering inside 15-20 python worker processes
// (reference data/datasets/joints_dataset.py:273-380, SURVEY §7 hard parts).
// These are the same operations as portable C++ with OpenMP threading,
// callable from the Python pipeline via ctypes (runtime/loader.py) — no
// Python-per-pixel work, no pickling across process boundaries.
//
// Build: make -C epipolar_transformers_tpu/runtime  (or auto-built on import)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Bilinear affine warp: dst(x,y) = src(M^{-1} [x,y,1]).
// `trans` is the FORWARD 2x3 map src->dst (cv2.warpAffine convention);
// we invert it here. Images are float32 HWC.
void warp_affine_bilinear(
    const float* src, int src_h, int src_w, int channels,
    const double* trans,  // 2x3 row-major, src->dst
    float* dst, int dst_h, int dst_w) {
  // invert [a b c; d e f]
  const double a = trans[0], b = trans[1], c = trans[2];
  const double d = trans[3], e = trans[4], f = trans[5];
  const double det = a * e - b * d;
  const double ia = e / det, ib = -b / det;
  const double id = -d / det, ie = a / det;
  const double ic = -(ia * c + ib * f);
  const double iff = -(id * c + ie * f);

#pragma omp parallel for schedule(static)
  for (int y = 0; y < dst_h; ++y) {
    for (int x = 0; x < dst_w; ++x) {
      const double sx = ia * x + ib * y + ic;
      const double sy = id * x + ie * y + iff;
      float* out = dst + (static_cast<int64_t>(y) * dst_w + x) * channels;
      const int x0 = static_cast<int>(std::floor(sx));
      const int y0 = static_cast<int>(std::floor(sy));
      const float wx = static_cast<float>(sx - x0);
      const float wy = static_cast<float>(sy - y0);
      for (int ch = 0; ch < channels; ++ch) out[ch] = 0.f;
      for (int dy = 0; dy <= 1; ++dy) {
        const int yy = y0 + dy;
        if (yy < 0 || yy >= src_h) continue;
        const float wyv = dy ? wy : 1.f - wy;
        for (int dx = 0; dx <= 1; ++dx) {
          const int xx = x0 + dx;
          if (xx < 0 || xx >= src_w) continue;
          const float w = wyv * (dx ? wx : 1.f - wx);
          const float* p = src + (static_cast<int64_t>(yy) * src_w + xx) * channels;
          for (int ch = 0; ch < channels; ++ch) out[ch] += w * p[ch];
        }
      }
    }
  }
}

// Gaussian target heatmaps with the reference's exact semantics
// (keypoints2d.py:17-36): grid in image coords via pix2coord, effective
// sigma' = sigma*sqrt(2), squared distance clipped at 4.60517019 before exp.
void gaussian_heatmaps(
    const float* coords_xy, const float* visibility, int num_joints,
    int hm_h, int hm_w, float sigma, float downsample,
    float* out /* J x H x W */) {
  const float sig = sigma * 1.41421356237f;
  const float offset = downsample / 2.0f - 0.5f;
  const float clip = 4.60517019f;
#pragma omp parallel for schedule(static)
  for (int j = 0; j < num_joints; ++j) {
    float* plane = out + static_cast<int64_t>(j) * hm_h * hm_w;
    if (visibility && visibility[j] <= 0.f) {
      std::memset(plane, 0, sizeof(float) * hm_h * hm_w);
      continue;
    }
    const float cx = coords_xy[2 * j] / sig;
    const float cy = coords_xy[2 * j + 1] / sig;
    for (int y = 0; y < hm_h; ++y) {
      const float gy = (y * downsample + offset) / sig;
      const float dy2 = (gy - cy) * (gy - cy);
      for (int x = 0; x < hm_w; ++x) {
        const float gx = (x * downsample + offset) / sig;
        float dist = dy2 + (gx - cx) * (gx - cx);
        if (dist > clip) dist = clip;
        plane[y * hm_w + x] = std::exp(-dist);
      }
    }
  }
}

// Generic bilinear remap: dst(i) = src(map_x(i), map_y(i)) — the
// undistortion hot path once the inverse-distortion maps are precomputed.
void remap_bilinear(
    const float* src, int src_h, int src_w, int channels,
    const float* map_x, const float* map_y,
    float* dst, int dst_h, int dst_w) {
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dst_h; ++y) {
    for (int x = 0; x < dst_w; ++x) {
      const int64_t idx = static_cast<int64_t>(y) * dst_w + x;
      const float sx = map_x[idx];
      const float sy = map_y[idx];
      float* out = dst + idx * channels;
      const int x0 = static_cast<int>(std::floor(sx));
      const int y0 = static_cast<int>(std::floor(sy));
      const float wx = sx - x0;
      const float wy = sy - y0;
      for (int ch = 0; ch < channels; ++ch) out[ch] = 0.f;
      for (int dy = 0; dy <= 1; ++dy) {
        const int yy = y0 + dy;
        if (yy < 0 || yy >= src_h) continue;
        const float wyv = dy ? wy : 1.f - wy;
        for (int dx = 0; dx <= 1; ++dx) {
          const int xx = x0 + dx;
          if (xx < 0 || xx >= src_w) continue;
          const float w = wyv * (dx ? wx : 1.f - wx);
          const float* p = src + (static_cast<int64_t>(yy) * src_w + xx) * channels;
          for (int ch = 0; ch < channels; ++ch) out[ch] += w * p[ch];
        }
      }
    }
  }
}

}  // extern "C"
