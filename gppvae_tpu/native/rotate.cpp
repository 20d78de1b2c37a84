// Native batch bilinear rotation for the dataset builder.
//
// Bit-compatible (up to float rounding order) with the numpy reference in
// gppvae_tpu/data/transforms.py::rotate_bilinear — the Python side tests the
// two against each other. The reference framework leans on PyTorch's native
// ops for its data path (SURVEY.md §2.2); this is the rebuild's native
// data-plane equivalent for bulk dataset builds (rotating P·Q images at
// FacePlace scale), exposed through ctypes (no pybind11 in this image).
//
// Build: see gppvae_tpu/native/build.py (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstdint>

extern "C" {

// src: B*H*W float32, angles: B float32 (radians, CCW). dst: B*H*W.
// Out-of-bounds samples are zero. Rotation about the image center.
void rotate_bilinear_f32(const float* src, float* dst, int64_t B, int64_t H,
                         int64_t W, const float* angles) {
  const float cy = (static_cast<float>(H) - 1.0f) / 2.0f;
  const float cx = (static_cast<float>(W) - 1.0f) / 2.0f;
  for (int64_t b = 0; b < B; ++b) {
    const float c = std::cos(angles[b]);
    const float s = std::sin(angles[b]);
    const float* img = src + b * H * W;
    float* out = dst + b * H * W;
    for (int64_t y = 0; y < H; ++y) {
      const float yy = static_cast<float>(y) - cy;
      for (int64_t x = 0; x < W; ++x) {
        const float xx = static_cast<float>(x) - cx;
        const float sx = c * xx + s * yy + cx;
        const float sy = -s * xx + c * yy + cy;
        const int64_t x0 = static_cast<int64_t>(std::floor(sx));
        const int64_t y0 = static_cast<int64_t>(std::floor(sy));
        const float fx = sx - static_cast<float>(x0);
        const float fy = sy - static_cast<float>(y0);
        float acc = 0.0f;
        for (int dy = 0; dy <= 1; ++dy) {
          const int64_t yi = y0 + dy;
          if (yi < 0 || yi >= H) continue;
          const float wy = dy ? fy : 1.0f - fy;
          for (int dx = 0; dx <= 1; ++dx) {
            const int64_t xi = x0 + dx;
            if (xi < 0 || xi >= W) continue;
            const float wx = dx ? fx : 1.0f - fx;
            acc += wy * wx * img[yi * W + xi];
          }
        }
        out[y * W + x] = acc;
      }
    }
  }
}

}  // extern "C"
