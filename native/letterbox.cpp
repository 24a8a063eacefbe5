// Native host-side image preprocessing for the TPU input pipeline.
//
// Capability parity with the reference's LetterBox transform
// (ultralytics/data/augment.py LetterBox + cv2.resize INTER_LINEAR): bilinear
// resize of HWC uint8 images, pad-to-square with value 114, and fused
// uint8 -> float32/255 normalization directly into the batch buffer the JAX
// host transfer reads from. Exposed through ctypes (data/native.py).
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>

extern "C" {

// Bilinear-resize src (h x w x c, uint8) to (uh x uw) and write it, padded
// with pad_value and normalized to [0,1], into dst (S x S x c, float32) at
// offset (top, left). dst must hold S*S*c floats.
void letterbox_u8_to_f32(const uint8_t* src, int h, int w, int c,
                         float* dst, int S, int uh, int uw,
                         int top, int left, float pad_value) {
  const float pv = pad_value / 255.0f;
  // fill padding
  for (int i = 0; i < S * S * c; ++i) dst[i] = pv;

  const float sy = (float)h / (float)uh;
  const float sx = (float)w / (float)uw;
  for (int y = 0; y < uh; ++y) {
    // cv2 INTER_LINEAR sampling: src_y = (y + 0.5) * scale - 0.5
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    int y0c = std::min(std::max(y0, 0), h - 1);
    int y1c = std::min(y0 + 1, h - 1);
    if (y1c < 0) y1c = 0;
    float* drow = dst + ((top + y) * S + left) * c;
    const uint8_t* r0 = src + y0c * w * c;
    const uint8_t* r1 = src + y1c * w * c;
    for (int x = 0; x < uw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - x0;
      int x0c = std::min(std::max(x0, 0), w - 1);
      int x1c = std::min(x0 + 1, w - 1);
      if (x1c < 0) x1c = 0;
      const float w00 = (1 - wx) * (1 - wy), w01 = wx * (1 - wy);
      const float w10 = (1 - wx) * wy, w11 = wx * wy;
      for (int k = 0; k < c; ++k) {
        float v = w00 * r0[x0c * c + k] + w01 * r0[x1c * c + k] +
                  w10 * r1[x0c * c + k] + w11 * r1[x1c * c + k];
        drow[x * c + k] = v * (1.0f / 255.0f);
      }
    }
  }
}

// Batched variant: n images with per-image geometry tables.
void letterbox_batch_u8_to_f32(const uint8_t* const* srcs, const int* hs,
                               const int* ws, int c, float* dst, int S,
                               const int* uhs, const int* uws,
                               const int* tops, const int* lefts, int n,
                               float pad_value) {
  const long plane = (long)S * S * c;
  for (int i = 0; i < n; ++i) {
    letterbox_u8_to_f32(srcs[i], hs[i], ws[i], c, dst + i * plane, S, uhs[i],
                        uws[i], tops[i], lefts[i], pad_value);
  }
}

}  // extern "C"
