"""Regular/rectilinear-grid linear interpolation as XLA-friendly JAX ops.

Capability-equivalents of the reference's native interpolation stack:
  * C++ ``interpolate_along_axis`` (reference:
    tools/bindings/interpolate/src/interpolate.cpp:260-332, used by
    ``_uniform_in_z`` at models/weatherModel.py:603-623) ->
    :func:`interp_along_axis`: a fully vectorized compare-and-gather kernel
    batched over all columns at once instead of std::async over slabs.
  * scipy ``RegularGridInterpolator`` over weather cubes (reference:
    tools/RAiDER/delayFcns.py:23-58) -> :func:`interp3d_points` (general
    scattered points; 8-corner gather) and :func:`interp3d_separable`
    (axis-aligned query grids; evaluated as three small dense contractions
    that map onto the TPU MXU instead of gathers).

Semantics match scipy RGI with ``bounds_error=False, fill_value=nan``:
out-of-range queries return NaN. Grid axes must be ascending.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def interp_along_axis(xs, ys, new_xs, axis: int = -1, fill_value=jnp.nan):
    """Linear interpolation along ``axis`` with per-column sample points.

    Args:
        xs:      sample coordinates, broadcast-compatible with ``ys``;
                 ascending along ``axis``. May vary per column.
        ys:      sample values.
        new_xs:  query coordinates along ``axis`` (same leading dims).
        axis:    interpolation axis.
        fill_value: value for out-of-range queries.

    Returns:
        Interpolated values, shaped like ``new_xs``.
    """
    xs = jnp.moveaxis(jnp.asarray(xs), axis, -1)
    ys = jnp.moveaxis(jnp.asarray(ys), axis, -1)
    new_xs = jnp.moveaxis(jnp.asarray(new_xs), axis, -1)
    xs, ys = jnp.broadcast_arrays(xs, ys)

    n = xs.shape[-1]
    # Vectorized bracketing: count of grid points <= query. O(n*m) compares,
    # fully parallel on the VPU; n (model levels) is small so this beats a
    # serial binary search on TPU.
    idx = jnp.sum(xs[..., None, :] <= new_xs[..., :, None], axis=-1)
    idx = jnp.clip(idx, 1, n - 1)

    x_lo = jnp.take_along_axis(xs, idx - 1, axis=-1)
    x_hi = jnp.take_along_axis(xs, idx, axis=-1)
    y_lo = jnp.take_along_axis(ys, idx - 1, axis=-1)
    y_hi = jnp.take_along_axis(ys, idx, axis=-1)

    t = (new_xs - x_lo) / (x_hi - x_lo)
    out = y_lo + t * (y_hi - y_lo)

    oob = (new_xs < xs[..., :1]) | (new_xs > xs[..., -1:])
    out = jnp.where(oob, fill_value, out)
    return jnp.moveaxis(out, -1, axis)


def axis_uniform_step(axis_np) -> float | None:
    """The uniform-axis fast-path predicate, shared by every consumer.

    Returns the FMA-locate step ``(hi - lo) / (n - 1)`` when the axis is
    uniform enough for :func:`_locate`'s fast path, else None. The Pallas
    integrate kernel (delay/raytrace.py) replicates the fast path's exact
    formula in-kernel, so its gate (`_axis_uniformish`) and `_locate` MUST
    share this single predicate — a tolerance drift between them would let
    the kernel's FMA locate disagree with XLA's searchsorted branch by
    whole cells.
    """
    axis_np = np.asarray(axis_np)
    n = axis_np.shape[0]
    if n < 2:
        return None
    d = np.diff(axis_np)
    if not np.allclose(d, d[0], rtol=1e-6, atol=0.0):
        return None
    return (float(axis_np[-1]) - float(axis_np[0])) / (n - 1)


def _locate(axis_np: np.ndarray, coords):
    """Bracketing cell index + fractional offset along one rectilinear axis.

    ``axis_np`` is static (trace-time numpy): uniform axes compile to one
    fused multiply-add; non-uniform axes to a vectorized searchsorted.
    Returns (idx in [0, n-2], frac, in_bounds).
    """
    axis_np = np.asarray(axis_np)
    n = axis_np.shape[0]
    lo = float(axis_np[0])
    hi = float(axis_np[-1])
    coords = jnp.asarray(coords)
    in_bounds = (coords >= lo) & (coords <= hi)

    if n < 2:
        # degenerate single-node axis: everything clamps to cell 0
        return jnp.zeros_like(coords, jnp.int32), jnp.zeros_like(coords), in_bounds

    step = axis_uniform_step(axis_np)
    if step is not None:
        pos = (coords - lo) / step
        idx = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
        frac = pos - idx
    else:
        grid = jnp.asarray(axis_np, dtype=coords.dtype)
        idx = jnp.clip(jnp.searchsorted(grid, coords, side='right') - 1, 0, n - 2)
        x_lo = grid[idx]
        x_hi = grid[idx + 1]
        frac = (coords - x_lo) / (x_hi - x_lo)
    return idx, frac, in_bounds


@partial(jax.jit, static_argnames=('ys', 'xs', 'zs'))
def _interp3d_points_impl(cube_zyx, pts_y, pts_x, pts_z, ys, xs, zs):
    ys = np.asarray(ys)
    xs = np.asarray(xs)
    zs = np.asarray(zs)
    iy, fy, by = _locate(ys, pts_y)
    ix, fx, bx = _locate(xs, pts_x)
    iz, fz, bz = _locate(zs, pts_z)

    nz, ny, nx = cube_zyx.shape
    flat = cube_zyx.reshape(-1)

    def corner(dz, dy, dx):
        lin = ((iz + dz) * ny + (iy + dy)) * nx + (ix + dx)
        return jnp.take(flat, lin)

    fy = fy.astype(cube_zyx.dtype)
    fx = fx.astype(cube_zyx.dtype)
    fz = fz.astype(cube_zyx.dtype)

    # trilinear blend, 8 corners
    c00 = corner(0, 0, 0) * (1 - fx) + corner(0, 0, 1) * fx
    c01 = corner(0, 1, 0) * (1 - fx) + corner(0, 1, 1) * fx
    c10 = corner(1, 0, 0) * (1 - fx) + corner(1, 0, 1) * fx
    c11 = corner(1, 1, 0) * (1 - fx) + corner(1, 1, 1) * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    out = c0 * (1 - fz) + c1 * fz

    ok = by & bx & bz
    return jnp.where(ok, out, jnp.nan)


def interp3d_points(cube_zyx, ys, xs, zs, pts_y, pts_x, pts_z):
    """Trilinear interpolation of a (z, y, x) cube at scattered points.

    Matches scipy RegularGridInterpolator((ys, xs, zs), cube.T(y,x,z),
    bounds_error=False, fill_value=nan) as used by the reference delay
    engine (reference: tools/RAiDER/delayFcns.py:55-56).

    Grid axes are passed as static tuples/arrays (baked into the compiled
    program); point coordinate arrays may have any common shape.
    """
    return _interp3d_points_impl(
        cube_zyx,
        jnp.asarray(pts_y),
        jnp.asarray(pts_x),
        jnp.asarray(pts_z),
        tuple(np.asarray(ys).tolist()),
        tuple(np.asarray(xs).tolist()),
        tuple(np.asarray(zs).tolist()),
    )


def grid_weights(axis_np: np.ndarray, query_np) -> tuple:
    """Dense interpolation weight matrix W (nq, n) for one axis.

    W has at most two non-zeros per row: out[q] = sum_k W[q, k] f[k].
    Out-of-range rows are all-NaN so NaN fill propagates through matmuls.
    Built host-side (static grids); used by :func:`interp3d_separable`.
    """
    axis_np = np.asarray(axis_np, dtype=np.float64)
    q = np.asarray(query_np, dtype=np.float64).ravel()
    n = axis_np.shape[0]
    idx = np.clip(np.searchsorted(axis_np, q, side='right') - 1, 0, n - 2)
    x_lo = axis_np[idx]
    x_hi = axis_np[idx + 1]
    frac = (q - x_lo) / (x_hi - x_lo)
    w = np.zeros((q.size, n))
    rows = np.arange(q.size)
    w[rows, idx] = 1.0 - frac
    w[rows, idx + 1] = frac
    oob = (q < axis_np[0]) | (q > axis_np[-1])
    w[oob, :] = np.nan
    return w


@jax.jit
def interp3d_separable(cube_zyx, w_z, w_y, w_x):
    """Axis-aligned grid-to-grid interpolation as three dense contractions.

    For query grids aligned with the cube axes (the ZTD cube-build fast path
    when output CRS == weather-model CRS), trilinear interpolation is
    separable and evaluates as chained matmuls on the MXU - no gathers:

        out[l, j, i] = W_z[l, c] W_y[j, b] W_x[i, a] cube[c, b, a]

    Weight matrices come from :func:`grid_weights`.
    """
    dt = cube_zyx.dtype
    w_z = w_z.astype(dt)
    w_y = w_y.astype(dt)
    w_x = w_x.astype(dt)
    out = jnp.einsum('zyx,az->ayx', cube_zyx, w_z, precision='highest')
    out = jnp.einsum('ayx,by->abx', out, w_y, precision='highest')
    out = jnp.einsum('abx,cx->abc', out, w_x, precision='highest')
    return out
