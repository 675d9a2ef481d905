// ctnative — independent CPU implementations used as oracles and fast paths.
//
// The reference leans on tomopy's C kernels (ray-driven Radon, gridrec) and
// xdesign's slow Python foam rasterizer (SURVEY.md §2.3).  This library plays
// the equivalent role for the rebuild:
//
//   * radon_oracle: fine-step ray-marching projector with bilinear sampling —
//     a deliberately DIFFERENT discretization from the JAX/Pallas projectors,
//     used by tests to cross-validate them (the tomopy_forward_compare role,
//     reference ctvae/tomopy_forward_compare.py).
//   * backproject_oracle: pixel-driven backprojection (FBP building block).
//   * foam_rasterize: antialiased circle-void rasterizer for foam phantom
//     batches (the xdesign.discrete_phantom role) — circle packing stays in
//     Python (distribution-defining), rasterization is the hot loop.
//
// Geometry matches ops/radon.py: image f[x, y] (row-major), centered
// coordinates, theta=0 projects to column sums, a point (X, Y) hits detector
// t_hat = Y cos(theta) - X sin(theta).
//
// Build: make -C native   (produces libctnative.so; loaded via ctypes)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Bilinear sample of f (h x w, row-major) at (x, y); zero outside support.
static inline float sample_bilinear(const float* f, int h, int w, float x, float y) {
    int x0 = (int)std::floor(x);
    int y0 = (int)std::floor(y);
    float wx = x - x0, wy = y - y0;
    float acc = 0.0f;
    for (int dx = 0; dx <= 1; ++dx) {
        int xi = x0 + dx;
        if (xi < 0 || xi >= h) continue;
        float wxx = dx ? wx : 1.0f - wx;
        for (int dy = 0; dy <= 1; ++dy) {
            int yi = y0 + dy;
            if (yi < 0 || yi >= w) continue;
            float wyy = dy ? wy : 1.0f - wy;
            acc += wxx * wyy * f[xi * w + yi];
        }
    }
    return acc;
}

// Ray-marching Radon transform.
//   images: (n, h, w) row-major float32
//   theta:  (a,) radians
//   out:    (n, a, n_det)
//   step:   integration step in pixels (0.25 = oracle-grade)
void radon_oracle(const float* images, int n, int h, int w,
                  const double* theta, int a,
                  int n_det, float step, float* out) {
    const double cx = (h - 1) / 2.0;
    const double cy = (w - 1) / 2.0;
    const double ct = (n_det - 1) / 2.0;
    const double half_diag = 0.5 * std::sqrt((double)h * h + (double)w * w) + 2.0;
    const int n_steps = (int)(2.0 * half_diag / step) + 1;

    for (int ia = 0; ia < a; ++ia) {
        const double c = std::cos(theta[ia]);
        const double s = std::sin(theta[ia]);
        for (int in_img = 0; in_img < n; ++in_img) {
            const float* img = images + (size_t)in_img * h * w;
            float* dst = out + ((size_t)in_img * a + ia) * n_det;
            for (int t = 0; t < n_det; ++t) {
                const double t_hat = t - ct;
                double acc = 0.0;
                for (int k = 0; k < n_steps; ++k) {
                    const double sp = -half_diag + k * step;
                    const double x = sp * c - t_hat * s + cx;
                    const double y = sp * s + t_hat * c + cy;
                    acc += sample_bilinear(img, h, w, (float)x, (float)y);
                }
                dst[t] = (float)(acc * step);
            }
        }
    }
}

// Pixel-driven backprojection with linear detector interpolation.
//   sino: (n, a, p);  out: (n, x_size, y_size)
void backproject_oracle(const float* sino, int n, int a, int p,
                        const double* theta, int x_size, int y_size, float* out) {
    const double cx = (x_size - 1) / 2.0;
    const double cy = (y_size - 1) / 2.0;
    const double ct = (p - 1) / 2.0;
    std::memset(out, 0, sizeof(float) * (size_t)n * x_size * y_size);
    for (int ia = 0; ia < a; ++ia) {
        const double c = std::cos(theta[ia]);
        const double s = std::sin(theta[ia]);
        for (int in_img = 0; in_img < n; ++in_img) {
            const float* src = sino + ((size_t)in_img * a + ia) * p;
            float* dst = out + (size_t)in_img * x_size * y_size;
            for (int x = 0; x < x_size; ++x) {
                const double xh = x - cx;
                for (int y = 0; y < y_size; ++y) {
                    const double yh = y - cy;
                    double t = yh * c - xh * s + ct;
                    // clamp-to-edge (constant extension), like the JAX op
                    if (t < 0) t = 0;
                    if (t > p - 1) t = p - 1;
                    const int t0 = (int)t;
                    const int t1 = std::min(t0 + 1, p - 1);
                    const double wt = t - t0;
                    dst[x * y_size + y] += (float)((1.0 - wt) * src[t0] + wt * src[t1]);
                }
            }
        }
    }
}

// Antialiased foam rasterization: unit material disk minus circular voids.
//   centers: (k, 2) in [-1, 1]^2, radii: (k,), out: (n_pixel, n_pixel)
void foam_rasterize(const double* centers, const double* radii, int k,
                    int n_pixel, int supersample, float* out) {
    const int nss = n_pixel * supersample;
    const double inv = 2.0 / nss;
    for (int i = 0; i < n_pixel; ++i)
        for (int j = 0; j < n_pixel; ++j) {
            double acc = 0.0;
            for (int si = 0; si < supersample; ++si) {
                const double x = ((i * supersample + si) + 0.5) * inv - 1.0;
                for (int sj = 0; sj < supersample; ++sj) {
                    const double y = ((j * supersample + sj) + 0.5) * inv - 1.0;
                    double v = (x * x + y * y <= 1.0) ? 1.0 : 0.0;
                    if (v > 0.0) {
                        for (int m = 0; m < k; ++m) {
                            const double dx = x - centers[2 * m];
                            const double dy = y - centers[2 * m + 1];
                            if (dx * dx + dy * dy <= radii[m] * radii[m]) { v = 0.0; break; }
                        }
                    }
                    acc += v;
                }
            }
            out[i * n_pixel + j] = (float)(acc / (supersample * supersample));
        }
}

}  // extern "C"
