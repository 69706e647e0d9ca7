// raider-tpu native host runtime: multithreaded interpolation + ray-point
// generation for the host (CPU) side of the pipeline.
//
// Capability parity with the reference's native extensions:
//   * RAiDER.interpolate (pybind11 C++: interpolate_along_axis and N-D
//     regular-grid interpolation with std::async data-parallel chunking;
//     reference: tools/bindings/interpolate/src/*.cpp)
//   * RAiDER.makePoints (Cython batch ray-point generator;
//     reference: tools/bindings/utils/makePoints.pyx)
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this build).
// All hot loops are data-parallel over independent output slices, so the
// thread fork/join needs no synchronization.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <thread>
#include <vector>

namespace {

constexpr double kNaN = std::numeric_limits<double>::quiet_NaN();

// Number of worker threads for n independent work items: mirrors the
// measured ladder the reference bakes in (1/2/4/8 threads at 1e4/4e6/1.6e8
// points; reference: module.cpp:73-87), capped by hardware concurrency.
int pick_threads(std::int64_t n, int max_threads) {
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw <= 0) hw = 1;
  int cap = max_threads > 0 ? std::min(max_threads, hw) : hw;
  int want;
  if (n < 10'000) want = 1;
  else if (n < 4'000'000) want = 2;
  else if (n < 160'000'000) want = 4;
  else want = 8;
  return std::min(want, cap);
}

template <typename Body>
void parallel_for(std::int64_t n, int max_threads, Body body) {
  const int nthreads = pick_threads(n, max_threads);
  if (nthreads <= 1) {
    body(0, n);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(nthreads);
  const std::int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    const std::int64_t lo = t * chunk;
    const std::int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back(body, lo, hi);
  }
  for (auto& th : pool) th.join();
}

// branchless bisection for the cell index of v in ascending grid[0..n-1];
// returns i in [0, n-2] such that grid[i] <= v (clamped).
inline std::int64_t locate(const double* grid, std::int64_t n, double v) {
  std::int64_t lo = 0, hi = n - 1;
  while (hi - lo > 1) {
    const std::int64_t mid = (lo + hi) / 2;
    if (grid[mid] <= v) lo = mid; else hi = mid;
  }
  return lo;
}

}  // namespace

extern "C" {

// Linear interpolation along the last axis of a (rows, n) array with
// per-row sample coordinates, fill_value outside; equivalent to the
// reference's interpolate_along_axis (interpolate.cpp:260-332).
void interpolate_along_axis_d(
    const double* xs,      // (rows, n) ascending per row
    const double* ys,      // (rows, n)
    const double* new_xs,  // (rows, m)
    double* out,           // (rows, m)
    std::int64_t rows, std::int64_t n, std::int64_t m,
    double fill_value, int max_threads) {
  parallel_for(rows, max_threads, [=](std::int64_t r0, std::int64_t r1) {
    for (std::int64_t r = r0; r < r1; ++r) {
      const double* x = xs + r * n;
      const double* y = ys + r * n;
      const double* q = new_xs + r * m;
      double* o = out + r * m;
      for (std::int64_t k = 0; k < m; ++k) {
        const double v = q[k];
        if (!(v >= x[0]) || !(v <= x[n - 1])) {  // catches NaN too
          o[k] = fill_value;
          continue;
        }
        const std::int64_t i = locate(x, n, v);
        const double t = (v - x[i]) / (x[i + 1] - x[i]);
        o[k] = y[i] + t * (y[i + 1] - y[i]);
      }
    }
  });
}

// Trilinear interpolation of a (nz, ny, nx) cube on rectilinear ascending
// axes at scattered (y, x, z) points; NaN outside. Matches scipy
// RegularGridInterpolator semantics (the reference delay engine's
// interpolator; delayFcns.py:55-56).
void interp3d_d(
    const double* cube,  // (nz, ny, nx)
    const double* zs, std::int64_t nz,
    const double* ys, std::int64_t ny,
    const double* xs, std::int64_t nx,
    const double* pts_y, const double* pts_x, const double* pts_z,
    double* out, std::int64_t npts, int max_threads) {
  const std::int64_t sy = nx;
  const std::int64_t sz = ny * nx;
  parallel_for(npts, max_threads, [=](std::int64_t k0, std::int64_t k1) {
    for (std::int64_t k = k0; k < k1; ++k) {
      const double py = pts_y[k], px = pts_x[k], pz = pts_z[k];
      if (!(py >= ys[0]) || !(py <= ys[ny - 1]) ||
          !(px >= xs[0]) || !(px <= xs[nx - 1]) ||
          !(pz >= zs[0]) || !(pz <= zs[nz - 1])) {
        out[k] = kNaN;
        continue;
      }
      const std::int64_t iy = std::min(locate(ys, ny, py), ny - 2);
      const std::int64_t ix = std::min(locate(xs, nx, px), nx - 2);
      const std::int64_t iz = std::min(locate(zs, nz, pz), nz - 2);
      const double fy = (py - ys[iy]) / (ys[iy + 1] - ys[iy]);
      const double fx = (px - xs[ix]) / (xs[ix + 1] - xs[ix]);
      const double fz = (pz - zs[iz]) / (zs[iz + 1] - zs[iz]);
      const double* base = cube + iz * sz + iy * sy + ix;
      const double c000 = base[0],       c001 = base[1];
      const double c010 = base[sy],      c011 = base[sy + 1];
      const double c100 = base[sz],      c101 = base[sz + 1];
      const double c110 = base[sz + sy], c111 = base[sz + sy + 1];
      const double c00 = c000 + fx * (c001 - c000);
      const double c01 = c010 + fx * (c011 - c010);
      const double c10 = c100 + fx * (c101 - c100);
      const double c11 = c110 + fx * (c111 - c110);
      const double c0 = c00 + fy * (c01 - c00);
      const double c1 = c10 + fy * (c11 - c10);
      out[k] = c0 + fz * (c1 - c0);
    }
  });
}

// Generic N-D multilinear interpolation on a rectilinear ascending grid at
// scattered query points; fill_value outside. The capability of the
// reference's RAiDER.interpolate.interpolate() for any rank (its 1/2/3-D
// specializations and generic corner-weight loop, interpolate.cpp:18-258):
// per point, locate the cell along each axis, then accumulate the 2^ndim
// corner products. assume_sorted enables a forward-scan start hint per
// thread chunk (queries that arrive in ascending order skip the bisection).
void interpn_d(
    const double* grids,       // concatenated axes, ascending each
    const std::int64_t* grid_sizes,  // (ndim,)
    std::int64_t ndim,         // 1..8
    const double* values,      // row-major (grid_sizes[0], ..., grid_sizes[ndim-1])
    const double* points,      // (npts, ndim)
    double* out,               // (npts,)
    std::int64_t npts,
    double fill_value, int assume_sorted, int max_threads) {
  if (ndim < 1 || ndim > 8) {
    for (std::int64_t k = 0; k < npts; ++k) out[k] = kNaN;
    return;
  }
  // per-axis offsets into `grids` and row-major strides of `values`
  std::int64_t offs[8], strides[8];
  std::int64_t off = 0;
  for (std::int64_t d = 0; d < ndim; ++d) {
    offs[d] = off;
    off += grid_sizes[d];
  }
  std::int64_t stride = 1;
  for (std::int64_t d = ndim - 1; d >= 0; --d) {
    strides[d] = stride;
    stride *= grid_sizes[d];
  }
  parallel_for(npts, max_threads, [=](std::int64_t k0, std::int64_t k1) {
    std::int64_t hint[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    for (std::int64_t k = k0; k < k1; ++k) {
      const double* p = points + k * ndim;
      std::int64_t idx[8];
      double frac[8];
      bool oob = false;
      for (std::int64_t d = 0; d < ndim; ++d) {
        const double* g = grids + offs[d];
        const std::int64_t n = grid_sizes[d];
        const double v = p[d];
        if (!(v >= g[0]) || !(v <= g[n - 1])) {  // catches NaN too
          oob = true;
          break;
        }
        std::int64_t i;
        if (assume_sorted && hint[d] < n - 1 && g[hint[d]] <= v) {
          i = hint[d];
          while (i < n - 2 && g[i + 1] <= v) ++i;
        } else {
          i = std::min(locate(g, n, v), n - 2);
        }
        hint[d] = i;
        idx[d] = i;
        frac[d] = (v - g[i]) / (g[i + 1] - g[i]);
      }
      if (oob) {
        out[k] = fill_value;
        continue;
      }
      double acc = 0.0;
      const std::int64_t ncorner = std::int64_t{1} << ndim;
      for (std::int64_t c = 0; c < ncorner; ++c) {
        double w = 1.0;
        std::int64_t flat = 0;
        for (std::int64_t d = 0; d < ndim; ++d) {
          const int hi = (c >> d) & 1;
          w *= hi ? frac[d] : (1.0 - frac[d]);
          flat += (idx[d] + hi) * strides[d];
        }
        acc += w * values[flat];
      }
      out[k] = acc;
    }
  });
}

// Batch ray-point generation: rays[b, :, k] = start[b, :] + k * step *
// direction[b, :] for npts equally spaced samples. Capability of the
// reference's makePoints0D/1D/2D/3D (makePoints.pyx:15-148) with the batch
// dimensions pre-flattened.
void make_ray_points_d(
    const double* start,      // (nrays, 3)
    const double* direction,  // (nrays, 3) unit vectors
    double step, std::int64_t npts,
    double* out,              // (nrays, 3, npts)
    std::int64_t nrays, int max_threads) {
  parallel_for(nrays, max_threads, [=](std::int64_t r0, std::int64_t r1) {
    for (std::int64_t r = r0; r < r1; ++r) {
      const double* sp = start + 3 * r;
      const double* sv = direction + 3 * r;
      double* o = out + 3 * npts * r;
      for (int c = 0; c < 3; ++c) {
        double* oc = o + c * npts;
        const double s0 = sp[c];
        const double dv = sv[c] * step;
        for (std::int64_t k = 0; k < npts; ++k) {
          oc[k] = s0 + dv * static_cast<double>(k);
        }
      }
    }
  });
}

}  // extern "C"
