"""ctypes bindings for the native host runtime (libraider_host.so).

Capability parity with the reference's native extensions: the pybind11
``RAiDER.interpolate`` module (reference: tools/bindings/interpolate/src/)
and the Cython ``RAiDER.makePoints`` generators (reference:
tools/bindings/utils/makePoints.pyx). Built from native/raider_host.cpp via
``make -C native``; if the shared library is absent every entry point falls
back to an equivalent NumPy implementation, so the native build is an
optimization, never a requirement.
"""

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from raider_tpu.logger import logger

_LIB_PATH = Path(__file__).parent / 'libraider_host.so'
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False

_c_double_p = ctypes.POINTER(ctypes.c_double)


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.interpolate_along_axis_d.argtypes = [
            _c_double_p, _c_double_p, _c_double_p, _c_double_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_int,
        ]
        lib.interp3d_d.argtypes = [
            _c_double_p,
            _c_double_p, ctypes.c_int64,
            _c_double_p, ctypes.c_int64,
            _c_double_p, ctypes.c_int64,
            _c_double_p, _c_double_p, _c_double_p,
            _c_double_p, ctypes.c_int64, ctypes.c_int,
        ]
        lib.make_ray_points_d.argtypes = [
            _c_double_p, _c_double_p, ctypes.c_double, ctypes.c_int64,
            _c_double_p, ctypes.c_int64, ctypes.c_int,
        ]
        lib.interpn_d.argtypes = [
            _c_double_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            _c_double_p, _c_double_p, _c_double_p, ctypes.c_int64,
            ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
    except OSError as e:
        logger.debug('Native host runtime unavailable: %s', e)
        _lib = None
    except AttributeError as e:
        logger.debug('Native host runtime is stale (rebuild with '
                     'native.build()): %s', e)
        _lib = None
    return _lib


def build(force: bool = False) -> bool:
    """Compile the native library in-tree (requires g++).

    Always runs make (incremental: recompiles only when the source is newer
    than the library, so a stale .so from an older source never lingers).
    """
    native_dir = Path(__file__).parents[2] / 'native'
    if not (native_dir / 'Makefile').exists():
        return _LIB_PATH.exists()
    try:
        args = ['make', '-C', str(native_dir)] + (['--always-make'] if force else [])
        subprocess.run(args, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError) as e:
        logger.warning('Could not build native host runtime: %s', e)
        return _LIB_PATH.exists()
    global _lib, _load_attempted
    _lib, _load_attempted = None, False
    return _try_load() is not None


def available() -> bool:
    return _try_load() is not None


def _as_c(arr) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(arr, dtype=np.float64))


def interpolate_along_axis(xs, ys, new_xs, axis: int = -1,
                           fill_value: float = np.nan, max_threads: int = 0) -> np.ndarray:
    """Per-column linear interpolation (native when built, NumPy otherwise).

    Equivalent to the reference C++ interpolate_along_axis
    (interpolate.cpp:260-332) including the fill-value semantics.
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    new_xs = np.asarray(new_xs, dtype=np.float64)
    xs_m = np.moveaxis(xs, axis, -1)
    ys_m = np.moveaxis(np.broadcast_to(ys, xs.shape), axis, -1)
    q_m = np.moveaxis(new_xs, axis, -1)

    lead = xs_m.shape[:-1]
    n = xs_m.shape[-1]
    m = q_m.shape[-1]
    rows = int(np.prod(lead)) if lead else 1

    lib = _try_load()
    if lib is not None:
        xs_c = _as_c(xs_m.reshape(rows, n))
        ys_c = _as_c(ys_m.reshape(rows, n))
        q_c = _as_c(np.broadcast_to(q_m, lead + (m,)).reshape(rows, m))
        out = np.empty((rows, m), dtype=np.float64)
        lib.interpolate_along_axis_d(
            xs_c.ctypes.data_as(_c_double_p), ys_c.ctypes.data_as(_c_double_p),
            q_c.ctypes.data_as(_c_double_p), out.ctypes.data_as(_c_double_p),
            rows, n, m, float(fill_value), int(max_threads),
        )
        return np.moveaxis(out.reshape(lead + (m,)), -1, axis)

    # NumPy fallback
    out = np.empty(lead + (m,), dtype=np.float64)
    xs_f = xs_m.reshape(rows, n)
    ys_f = ys_m.reshape(rows, n)
    q_f = np.broadcast_to(q_m, lead + (m,)).reshape(rows, m)
    out_f = out.reshape(rows, m)
    for r in range(rows):
        out_f[r] = np.interp(q_f[r], xs_f[r], ys_f[r], left=np.nan, right=np.nan)
        bad = ~((q_f[r] >= xs_f[r][0]) & (q_f[r] <= xs_f[r][-1]))
        out_f[r][bad] = fill_value
    return np.moveaxis(out, -1, axis)


def interp3d(cube_zyx, zs, ys, xs, pts_y, pts_x, pts_z, max_threads: int = 0) -> np.ndarray:
    """Trilinear cube interpolation at scattered points (native or scipy)."""
    pts_y = np.asarray(pts_y, dtype=np.float64)
    shape = pts_y.shape
    lib = _try_load()
    if lib is not None:
        cube_c = _as_c(cube_zyx)
        zs_c, ys_c, xs_c = _as_c(zs), _as_c(ys), _as_c(xs)
        py = _as_c(pts_y).ravel()
        px = _as_c(pts_x).ravel()
        pz = _as_c(pts_z).ravel()
        out = np.empty(py.size, dtype=np.float64)
        lib.interp3d_d(
            cube_c.ctypes.data_as(_c_double_p),
            zs_c.ctypes.data_as(_c_double_p), zs_c.size,
            ys_c.ctypes.data_as(_c_double_p), ys_c.size,
            xs_c.ctypes.data_as(_c_double_p), xs_c.size,
            py.ctypes.data_as(_c_double_p), px.ctypes.data_as(_c_double_p),
            pz.ctypes.data_as(_c_double_p),
            out.ctypes.data_as(_c_double_p), out.size, int(max_threads),
        )
        return out.reshape(shape)

    from scipy.interpolate import RegularGridInterpolator

    rgi = RegularGridInterpolator(
        (np.asarray(ys), np.asarray(xs), np.asarray(zs)),
        np.asarray(cube_zyx).transpose(1, 2, 0),
        bounds_error=False, fill_value=np.nan,
    )
    pts = np.stack([np.ravel(pts_y), np.ravel(pts_x), np.ravel(pts_z)], axis=-1)
    return rgi(pts).reshape(shape)


def interpolate(grid_axes, values, interp_points, fill_value: float = np.nan,
                assume_sorted: bool = False, max_threads: int = 0) -> np.ndarray:
    """Generic N-D multilinear regular-grid interpolation (1..8 dims).

    The full capability of the reference's C++ ``RAiDER.interpolate.
    interpolate(points, values, interp_points, fill_value, assume_sorted,
    max_threads)`` (module.cpp:26-294): per-point cell location on each
    ascending axis and a 2^ndim corner-weight accumulation, multithreaded
    over query points. ``assume_sorted`` enables the forward-scan fast path
    for ascending query streams. Falls back to scipy when the native
    library is absent.
    """
    axes = [np.ascontiguousarray(np.asarray(a, dtype=np.float64).ravel())
            for a in grid_axes]
    vals = _as_c(values)
    ndim = len(axes)
    if vals.ndim != ndim or any(vals.shape[d] != axes[d].size for d in range(ndim)):
        raise ValueError(
            f'values shape {vals.shape} does not match grid sizes '
            f'{[a.size for a in axes]}')
    pts = _as_c(interp_points)
    if pts.ndim == 1:
        pts = pts.reshape(-1, ndim) if ndim > 1 else pts.reshape(-1, 1)
    lead = pts.shape[:-1]
    if pts.shape[-1] != ndim:
        raise ValueError(f'interp_points last axis {pts.shape[-1]} != ndim {ndim}')
    pts2 = pts.reshape(-1, ndim)

    lib = _try_load()
    if lib is not None and 1 <= ndim <= 8:
        grids = np.ascontiguousarray(np.concatenate(axes))
        sizes = np.asarray([a.size for a in axes], dtype=np.int64)
        out = np.empty(pts2.shape[0], dtype=np.float64)
        lib.interpn_d(
            grids.ctypes.data_as(_c_double_p),
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ndim,
            vals.ctypes.data_as(_c_double_p),
            pts2.ctypes.data_as(_c_double_p),
            out.ctypes.data_as(_c_double_p),
            pts2.shape[0], float(fill_value),
            int(bool(assume_sorted)), int(max_threads),
        )
        return out.reshape(lead)

    from scipy.interpolate import RegularGridInterpolator

    rgi = RegularGridInterpolator(tuple(axes), vals, bounds_error=False,
                                  fill_value=fill_value)
    out = np.asarray(rgi(pts2), dtype=np.float64)
    # match the native backend: NaN query coordinates fail the bounds test
    # and take fill_value (scipy would propagate NaN instead)
    bad = np.isnan(pts2).any(axis=1)
    if bad.any():
        out[bad] = fill_value
    return out.reshape(lead)


def make_ray_points(start, direction, step: float, npts: int,
                    max_threads: int = 0) -> np.ndarray:
    """Equally-spaced ray sample points: out[..., :, k] = start + k*step*dir.

    Capability of the reference makePoints0D/1D/2D/3D (makePoints.pyx);
    batch dims of ``start``/``direction`` are arbitrary; output has an extra
    trailing sample axis: shape (..., 3, npts).
    """
    start = np.asarray(start, dtype=np.float64)
    direction = np.asarray(direction, dtype=np.float64)
    lead = start.shape[:-1]
    nrays = int(np.prod(lead)) if lead else 1

    lib = _try_load()
    if lib is not None:
        sp = _as_c(start.reshape(nrays, 3))
        sv = _as_c(direction.reshape(nrays, 3))
        out = np.empty((nrays, 3, npts), dtype=np.float64)
        lib.make_ray_points_d(
            sp.ctypes.data_as(_c_double_p), sv.ctypes.data_as(_c_double_p),
            float(step), int(npts),
            out.ctypes.data_as(_c_double_p), nrays, int(max_threads),
        )
        return out.reshape(lead + (3, npts))

    ks = np.arange(npts, dtype=np.float64)
    return start[..., :, None] + step * direction[..., :, None] * ks
