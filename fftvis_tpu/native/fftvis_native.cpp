// Native host-side helpers for fftvis-tpu.
//
// The reference's performance substrate is native C++ (finufft's spreader;
// ref SURVEY section 2.3). On TPU the spreading itself runs on-device
// (Pallas), but the host-side planning around it benefits from native code
// when problems get large: binning millions of nonuniform points into grid
// tiles (the permutation fed to the tiled device spreader) and evaluating
// exponential-of-semicircle kernel tap tables for big static target sets.
//
// Exposed via ctypes (no pybind11 in this environment); every entry point
// has a NumPy fallback in native/__init__.py.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Counting-sort n 2D points into (nty x ntx) tiles of size (ty, tx) on an
// (nfy, nfx) grid. Outputs:
//   perm[n]     : point indices ordered tile-by-tile
//   offsets[nt+1]: CSR-style tile boundaries into perm
// Returns 0 on success.
int bin_points_2d(const double* uy, const double* ux, int64_t n,
                  int64_t nfy, int64_t nfx, int64_t ty, int64_t tx,
                  int64_t* perm, int64_t* offsets) {
    const int64_t nty = (nfy + ty - 1) / ty;
    const int64_t ntx = (nfx + tx - 1) / tx;
    const int64_t ntiles = nty * ntx;

    // Pass 1: counts.
    for (int64_t t = 0; t <= ntiles; ++t) offsets[t] = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t iy = static_cast<int64_t>(uy[i]) / ty;
        int64_t ix = static_cast<int64_t>(ux[i]) / tx;
        if (iy < 0) iy = 0; if (iy >= nty) iy = nty - 1;
        if (ix < 0) ix = 0; if (ix >= ntx) ix = ntx - 1;
        offsets[iy * ntx + ix + 1]++;
    }
    // Prefix sum.
    for (int64_t t = 0; t < ntiles; ++t) offsets[t + 1] += offsets[t];
    // Pass 2: scatter indices (stable within tile).
    int64_t* cursor = new int64_t[ntiles];
    std::memcpy(cursor, offsets, ntiles * sizeof(int64_t));
    for (int64_t i = 0; i < n; ++i) {
        int64_t iy = static_cast<int64_t>(uy[i]) / ty;
        int64_t ix = static_cast<int64_t>(ux[i]) / tx;
        if (iy < 0) iy = 0; if (iy >= nty) iy = nty - 1;
        if (ix < 0) ix = 0; if (ix >= ntx) ix = ntx - 1;
        perm[cursor[iy * ntx + ix]++] = i;
    }
    delete[] cursor;
    return 0;
}

// Exponential-of-semicircle kernel taps for m targets:
//   for each target with fractional position v[i], computes the w tap
//   indices k0[i] = ceil(v[i] - w/2) (stored) and the kernel values
//   psi(v - (k0 + t)) for t in [0, w).
int es_taps(const double* v, int64_t m, int w, double beta,
            int64_t* k0, double* vals) {
    const double half = 0.5 * w;
    for (int64_t i = 0; i < m; ++i) {
        const double start = std::ceil(v[i] - half);
        k0[i] = static_cast<int64_t>(start);
        for (int t = 0; t < w; ++t) {
            const double z = 2.0 * (v[i] - (start + t)) / w;
            const double arg = 1.0 - z * z;
            vals[i * w + t] =
                (arg > 0.0) ? std::exp(beta * (std::sqrt(arg) - 1.0)) : 0.0;
        }
    }
    return 0;
}

// Fused direct-DFT accumulation for the host oracle's inner loop:
//   out[k] += sum_j w_re/im[j] * exp(i phase_scale * (x.b_k)) over 2D/3D.
// Kept simple (compilers vectorize the trig via libmvec when available).
int direct_dft_accum(const double* x, const double* wre, const double* wim,
                     int64_t n, const double* targets, int64_t m, int d,
                     double* out_re, double* out_im) {
    for (int64_t k = 0; k < m; ++k) {
        double acc_re = 0.0, acc_im = 0.0;
        const double* b = targets + k * d;
        for (int64_t j = 0; j < n; ++j) {
            double ph = 0.0;
            for (int dd = 0; dd < d; ++dd) ph += x[dd * n + j] * b[dd];
            const double c = std::cos(ph), s = std::sin(ph);
            acc_re += wre[j] * c - wim[j] * s;
            acc_im += wre[j] * s + wim[j] * c;
        }
        out_re[k] += acc_re;
        out_im[k] += acc_im;
    }
    return 0;
}

}  // extern "C"
