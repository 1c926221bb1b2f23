// band_ops — fused stencil-band algebra for the structured AMG setup.
//
// The Python BandMatrix does these as k^2 NumPy slice expressions, each
// allocating temporaries and re-walking memory.  These C++ versions fuse
// each output band's accumulation into one pass and parallelize rows with
// OpenMP — the host-side analog of the reference's OpenMP'd RAP
// (fasp_blas_dcsr_rap, BlaSpmvCSR.c:999).
//
// Kernels are written once for 3-D (nz, ny, nx) row-major grids with
// (dz, dy, dx) coordinates; 2-D calls route through them with nz=1.
// A band's value at grid point p multiplies x[p + coord].

#include <cstdint>
#include <cstring>
#include <map>
#include <utility>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

// ---------------------------------------------------------------------------
// 3-D variants: coords are (dz, dy, dx); bands are (nz, ny, nx) row-major.
// ---------------------------------------------------------------------------

namespace {

struct Coord3 {
    int32_t z, y, x;
    bool operator<(const Coord3& o) const {
        if (z != o.z) return z < o.z;
        if (y != o.y) return y < o.y;
        return x < o.x;
    }
};

template <typename T>
int band_matmul_3d_impl(int nz, int ny, int nx,
                        int ka, const int32_t* ca, const T* A,
                        int kb, const int32_t* cb, const T* B,
                        int max_kc, int32_t* cc, T* C) {
    const int64_t n = (int64_t)nz * ny * nx;
    std::map<Coord3, int> out_idx;
    for (int i = 0; i < ka; ++i)
        for (int j = 0; j < kb; ++j) {
            Coord3 c{ca[3 * i] + cb[3 * j], ca[3 * i + 1] + cb[3 * j + 1],
                     ca[3 * i + 2] + cb[3 * j + 2]};
            if (!out_idx.count(c)) {
                int idx = (int)out_idx.size();
                if (idx >= max_kc) return -1;
                out_idx[c] = idx;
            }
        }
    const int kc = (int)out_idx.size();
    for (auto& kv : out_idx) {
        cc[3 * kv.second] = kv.first.z;
        cc[3 * kv.second + 1] = kv.first.y;
        cc[3 * kv.second + 2] = kv.first.x;
    }
    std::memset(C, 0, sizeof(T) * (size_t)kc * n);

    const int64_t sy = nx, sz = (int64_t)ny * nx;
    for (int i = 0; i < ka; ++i) {
        const int dz = ca[3 * i], dy = ca[3 * i + 1], dx = ca[3 * i + 2];
        const int z0 = dz >= 0 ? 0 : -dz, z1 = dz >= 0 ? nz - dz : nz;
        const int y0 = dy >= 0 ? 0 : -dy, y1 = dy >= 0 ? ny - dy : ny;
        const int x0 = dx >= 0 ? 0 : -dx, x1 = dx >= 0 ? nx - dx : nx;
        if (z1 <= z0 || y1 <= y0 || x1 <= x0) continue;
        const T* __restrict__ Ai = A + (int64_t)i * n;
        for (int j = 0; j < kb; ++j) {
            Coord3 c{dz + cb[3 * j], dy + cb[3 * j + 1], dx + cb[3 * j + 2]};
            T* __restrict__ Cc = C + (int64_t)out_idx[c] * n;
            const T* __restrict__ Bj = B + (int64_t)j * n;
            const int64_t shift = (int64_t)dz * sz + (int64_t)dy * sy + dx;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) collapse(2)
#endif
            for (int z = z0; z < z1; ++z)
                for (int y = y0; y < y1; ++y) {
                    const int64_t r = (int64_t)z * sz + (int64_t)y * sy;
                    const T* __restrict__ a = Ai + r;
                    const T* __restrict__ b = Bj + r + shift;
                    T* __restrict__ out = Cc + r;
#ifdef _OPENMP
#pragma omp simd
#endif
                    for (int x = x0; x < x1; ++x)
                        out[x] += a[x] * b[x];
                }
        }
    }
    return kc;
}

template <typename T>
int pair_rap_3d_impl(int nz, int ny, int nx, int k, const int32_t* cf,
                     const T* F, int ax, int s, int max_kc, int32_t* cc,
                     T* C) {
    const int dims_f[3] = {nz, ny, nx};
    int dims_c[3] = {nz, ny, nx};
    dims_c[ax] = (dims_f[ax] + s - 1) / s;
    const int64_t nc = (int64_t)dims_c[0] * dims_c[1] * dims_c[2];
    const int64_t n = (int64_t)nz * ny * nx;

    std::map<Coord3, int> out_idx;
    for (int i = 0; i < k; ++i) {
        const int comp = cf[3 * i + ax];
        for (int a = 0; a < s; ++a) {
            int bb = ((comp + a) % s + s) % s;
            int oc = (comp + a - bb) / s;
            Coord3 c{cf[3 * i], cf[3 * i + 1], cf[3 * i + 2]};
            (ax == 0 ? c.z : ax == 1 ? c.y : c.x) = oc;
            if (!out_idx.count(c)) {
                int idx = (int)out_idx.size();
                if (idx >= max_kc) return -1;
                out_idx[c] = idx;
            }
        }
    }
    const int kc = (int)out_idx.size();
    for (auto& kv : out_idx) {
        cc[3 * kv.second] = kv.first.z;
        cc[3 * kv.second + 1] = kv.first.y;
        cc[3 * kv.second + 2] = kv.first.x;
    }
    std::memset(C, 0, sizeof(T) * (size_t)kc * nc);

    const int64_t fy = nx, fz = (int64_t)ny * nx;
    const int64_t cy = dims_c[2], cz = (int64_t)dims_c[1] * dims_c[2];
    for (int i = 0; i < k; ++i) {
        const int comp = cf[3 * i + ax];
        const T* __restrict__ Fi = F + (int64_t)i * n;
        for (int a = 0; a < s; ++a) {
            int bb = ((comp + a) % s + s) % s;
            int oc = (comp + a - bb) / s;
            Coord3 c{cf[3 * i], cf[3 * i + 1], cf[3 * i + 2]};
            (ax == 0 ? c.z : ax == 1 ? c.y : c.x) = oc;
            T* __restrict__ Cc = C + (int64_t)out_idx[c] * nc;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) collapse(2)
#endif
            for (int Z = 0; Z < dims_c[0]; ++Z)
                for (int Y = 0; Y < dims_c[1]; ++Y) {
                    int z = ax == 0 ? s * Z + a : Z;
                    int y = ax == 1 ? s * Y + a : Y;
                    if (z >= nz || y >= ny) continue;
                    const T* __restrict__ src = Fi + (int64_t)z * fz
                                                + (int64_t)y * fy;
                    T* __restrict__ dst = Cc + (int64_t)Z * cz
                                          + (int64_t)Y * cy;
                    if (ax == 2) {
                        for (int X = 0; X < dims_c[2]; ++X) {
                            const int x = s * X + a;
                            if (x < nx) dst[X] += src[x];
                        }
                    } else {
#ifdef _OPENMP
#pragma omp simd
#endif
                        for (int x = 0; x < nx; ++x) dst[x] += src[x];
                    }
                }
        }
    }
    return kc;
}

}  // namespace

extern "C" {

int fasp_band_matmul_3d_f64(int nz, int ny, int nx, int ka,
                            const int32_t* ca, const double* A, int kb,
                            const int32_t* cb, const double* B, int max_kc,
                            int32_t* cc, double* C) {
    return band_matmul_3d_impl<double>(nz, ny, nx, ka, ca, A, kb, cb, B,
                                       max_kc, cc, C);
}

int fasp_band_matmul_3d_f32(int nz, int ny, int nx, int ka,
                            const int32_t* ca, const float* A, int kb,
                            const int32_t* cb, const float* B, int max_kc,
                            int32_t* cc, float* C) {
    return band_matmul_3d_impl<float>(nz, ny, nx, ka, ca, A, kb, cb, B,
                                      max_kc, cc, C);
}

int fasp_pair_rap_3d_f64(int nz, int ny, int nx, int k, const int32_t* cf,
                         const double* F, int ax, int s, int max_kc,
                         int32_t* cc, double* C) {
    return pair_rap_3d_impl<double>(nz, ny, nx, k, cf, F, ax, s, max_kc,
                                    cc, C);
}

int fasp_pair_rap_3d_f32(int nz, int ny, int nx, int k, const int32_t* cf,
                         const float* F, int ax, int s, int max_kc,
                         int32_t* cc, float* C) {
    return pair_rap_3d_impl<float>(nz, ny, nx, k, cf, F, ax, s, max_kc,
                                   cc, C);
}

}  // extern "C"
