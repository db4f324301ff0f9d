// Native host ops for the data pipeline.
//
// Fused exact euclidean distance transform -> sigmoid barrier map, the
// per-sample host hot spot of the reference training loop (the reference
// calls scipy.ndimage.distance_transform_edt twice per sample per step,
// ref: utils/image.py:130-141, train_s2.py:196-199). One call computes
// sigmoid(k * (EDT(1-mask) - EDT(mask)) / max(H, W)) with the
// Felzenszwalb–Huttenlocher O(n) exact EDT.
//
// Built as a shared library, called via ctypes (no pybind11 dependency).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr float INF = 1e12f;  // large finite: inf breaks the parabola
                              // intersection formula (inf - inf = nan)

// 1-D squared distance transform (lower envelope of parabolas).
void dt1d(const float* f, float* d, int n, int* v, float* z) {
    int k = 0;
    v[0] = 0;
    z[0] = -INF;
    z[1] = INF;
    for (int q = 1; q < n; q++) {
        float s;
        while (true) {
            s = ((f[q] + q * (float)q) - (f[v[k]] + v[k] * (float)v[k]))
                / (2.0f * q - 2.0f * v[k]);
            if (s <= z[k]) {
                k--;
            } else {
                break;
            }
        }
        k++;
        v[k] = q;
        z[k] = s;
        z[k + 1] = INF;
    }
    k = 0;
    for (int q = 0; q < n; q++) {
        while (z[k + 1] < q) k++;
        float dq = q - (float)v[k];
        d[q] = dq * dq + f[v[k]];
    }
}

// 2-D squared EDT of the zero set of `ind` (ind[i]=0 -> distance 0).
void edt2d_sq(const uint8_t* ind, float* out, int H, int W) {
    std::vector<float> f(std::max(H, W));
    std::vector<float> d(std::max(H, W));
    std::vector<int> v(std::max(H, W));
    std::vector<float> z(std::max(H, W) + 1);

    // columns
    for (int x = 0; x < W; x++) {
        for (int y = 0; y < H; y++)
            f[y] = ind[y * W + x] ? INF : 0.0f;
        dt1d(f.data(), d.data(), H, v.data(), z.data());
        for (int y = 0; y < H; y++) out[y * W + x] = d[y];
    }
    // rows
    for (int y = 0; y < H; y++) {
        for (int x = 0; x < W; x++) f[x] = out[y * W + x];
        dt1d(f.data(), d.data(), W, v.data(), z.data());
        for (int x = 0; x < W; x++) out[y * W + x] = d[x];
    }
}

}  // namespace

extern "C" {

// mask: [H, W] float (0/1); out: [H, W] float barrier map.
void edt_barrier(const float* mask, float* out, int H, int W, float k) {
    std::vector<uint8_t> fg(H * W), bg(H * W);
    for (int i = 0; i < H * W; i++) {
        // scipy computes EDT of nonzero pixels to the nearest zero:
        // dist_out = edt(1 - mask): nonzero where mask == 0
        fg[i] = mask[i] == 0.0f ? 1 : 0;   // dist_out support
        bg[i] = mask[i] != 0.0f ? 1 : 0;   // dist_in support
    }
    std::vector<float> dout(H * W), din(H * W);
    edt2d_sq(fg.data(), dout.data(), H, W);
    edt2d_sq(bg.data(), din.data(), H, W);
    float norm = (float)(H > W ? H : W);
    for (int i = 0; i < H * W; i++) {
        float diff = (std::sqrt(dout[i]) - std::sqrt(din[i])) / norm;
        out[i] = 1.0f / (1.0f + std::exp(-k * diff));
    }
}

// Batch version: masks [B, H, W] -> out [B, H, W].
void edt_barrier_batch(const float* masks, float* out, int B, int H, int W,
                       float k) {
    for (int b = 0; b < B; b++) {
        edt_barrier(masks + (size_t)b * H * W, out + (size_t)b * H * W,
                    H, W, k);
    }
}

// Plain normalized EDT of the background (ref utils/image.py compute_dt).
void edt_background(const float* mask, float* out, int H, int W) {
    std::vector<uint8_t> fg(H * W);
    for (int i = 0; i < H * W; i++) fg[i] = mask[i] == 0.0f ? 1 : 0;
    std::vector<float> dsq(H * W);
    edt2d_sq(fg.data(), dsq.data(), H, W);
    float norm = (float)(H > W ? H : W);
    for (int i = 0; i < H * W; i++) out[i] = std::sqrt(dsq[i]) / norm;
}

}  // extern "C"
