// Native host-side image preprocessing for the data pipeline.
//
// The reference inherits all image work from PIL/torchvision C extensions
// (reference training/dataset.py:238-316, 692-737). This library provides
// the hot per-batch kernels — bicubic/bilinear resize, uint8 -> float32
// [-1, 1] normalization, horizontal flip — as vectorizable C++ loops,
// exposed through a plain C ABI consumed via ctypes
// (view_neti_tpu/data/native.py). Images are interleaved RGB uint8, HWC.
//
// Build: make -C native (produces libimageproc.so).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Catmull-Rom cubic kernel (a = -0.5), matching PIL's bicubic filter family.
static inline float cubic(float x) {
    const float a = -0.5f;
    x = std::fabs(x);
    if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
    if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
    return 0.0f;
}

// Precompute antialiased filter taps for one output axis (PIL-style: the
// filter support widens by the downscale factor).
struct Taps {
    int* start;     // (dn,) first source index
    float* weights; // (dn, max_taps)
    int max_taps;
};

static Taps make_taps(int sn, int dn, int mode) {
    const float scale = static_cast<float>(sn) / dn;
    const float filt = std::max(scale, 1.0f);
    const float base_support = mode == 1 ? 2.0f : 1.0f;
    const float support = base_support * filt;
    const int max_taps = static_cast<int>(std::ceil(support)) * 2 + 1;
    Taps t;
    t.start = new int[dn];
    t.weights = new float[static_cast<size_t>(dn) * max_taps]();
    t.max_taps = max_taps;
    for (int x = 0; x < dn; ++x) {
        const float center = (x + 0.5f) * scale - 0.5f;
        int x0 = static_cast<int>(std::floor(center - support)) + 1;
        x0 = std::clamp(x0, 0, sn - 1);
        int x1 = static_cast<int>(std::ceil(center + support)) + 1;
        x1 = std::min(x1, sn);
        t.start[x] = x0;
        float wsum = 0.0f;
        float* w = t.weights + static_cast<size_t>(x) * max_taps;
        for (int k = 0; k < x1 - x0 && k < max_taps; ++k) {
            const float d = (center - (x0 + k)) / filt;
            w[k] = mode == 1 ? cubic(d)
                             : std::max(0.0f, 1.0f - std::fabs(d));
            wsum += w[k];
        }
        if (wsum > 0)
            for (int k = 0; k < max_taps; ++k) w[k] /= wsum;
    }
    return t;
}

// Separable antialiased resize, uint8 HWC -> uint8 HWC.
// mode: 0 = bilinear, 1 = bicubic.
void resize_u8(const uint8_t* src, int sh, int sw, int c,
               uint8_t* dst, int dh, int dw, int mode) {
    Taps tx = make_taps(sw, dw, mode);
    Taps ty = make_taps(sh, dh, mode);
    // horizontal pass into a float intermediate (sh, dw, c)
    float* tmp = new float[static_cast<size_t>(sh) * dw * c];
    for (int y = 0; y < sh; ++y) {
        const uint8_t* row = src + static_cast<size_t>(y) * sw * c;
        for (int x = 0; x < dw; ++x) {
            const float* w = tx.weights
                + static_cast<size_t>(x) * tx.max_taps;
            const int x0 = tx.start[x];
            float* out = tmp + (static_cast<size_t>(y) * dw + x) * c;
            for (int ch = 0; ch < c; ++ch) {
                float acc = 0.0f;
                for (int k = 0; k < tx.max_taps; ++k) {
                    const int xi = std::min(x0 + k, sw - 1);
                    acc += w[k] * row[xi * c + ch];
                }
                out[ch] = acc;
            }
        }
    }
    // vertical pass
    for (int y = 0; y < dh; ++y) {
        const float* w = ty.weights + static_cast<size_t>(y) * ty.max_taps;
        const int y0 = ty.start[y];
        for (int x = 0; x < dw; ++x) {
            for (int ch = 0; ch < c; ++ch) {
                float acc = 0.0f;
                for (int k = 0; k < ty.max_taps; ++k) {
                    const int yi = std::min(y0 + k, sh - 1);
                    acc += w[k] * tmp[(static_cast<size_t>(yi) * dw + x) * c
                                      + ch];
                }
                dst[(static_cast<size_t>(y) * dw + x) * c + ch] =
                    static_cast<uint8_t>(
                        std::clamp(acc + 0.5f, 0.0f, 255.0f));
            }
        }
    }
    delete[] tmp;
    delete[] tx.start;
    delete[] tx.weights;
    delete[] ty.start;
    delete[] ty.weights;
}

// uint8 HWC -> float32 HWC in [-1, 1] (reference dataset.py:735:
// img / 127.5 - 1).
void normalize_f32(const uint8_t* src, float* dst, int64_t n) {
    const float scale = 1.0f / 127.5f;
    for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * scale - 1.0f;
}

// horizontal mirror, uint8 HWC in place-safe copy.
void hflip_u8(const uint8_t* src, uint8_t* dst, int h, int w, int c) {
    for (int y = 0; y < h; ++y) {
        const uint8_t* row = src + static_cast<size_t>(y) * w * c;
        uint8_t* out = dst + static_cast<size_t>(y) * w * c;
        for (int x = 0; x < w; ++x)
            std::memcpy(out + x * c, row + (w - 1 - x) * c, c);
    }
}

}  // extern "C"
