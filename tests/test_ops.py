"""Interpolation/integration kernels vs scipy ground truth."""

import numpy as np
import pytest
from scipy.interpolate import RegularGridInterpolator, interp1d

from raider_tpu.ops import (
    cumtrapz_from_top,
    grid_weights,
    interp3d_points,
    interp3d_separable,
    interp_along_axis,
)


class TestInterpAlongAxis:
    def test_matches_scipy_per_column(self, rng):
        ny, nx, nz = 4, 5, 30
        zs = np.sort(rng.uniform(0, 30000, (ny, nx, nz)), axis=-1)
        vals = rng.normal(size=(ny, nx, nz))
        new_z = np.broadcast_to(np.linspace(-100, 31000, 25), (ny, nx, 25))

        out = np.asarray(interp_along_axis(zs, vals, new_z, axis=-1))
        for i in range(ny):
            for j in range(nx):
                f = interp1d(zs[i, j], vals[i, j], bounds_error=False, fill_value=np.nan)
                np.testing.assert_allclose(out[i, j], f(new_z[i, j]), atol=1e-12, equal_nan=True)

    def test_axis_argument(self, rng):
        zs = np.sort(rng.uniform(0, 10, (20, 3)), axis=0)
        vals = rng.normal(size=(20, 3))
        q = np.broadcast_to(np.linspace(0.5, 9.5, 7)[:, None], (7, 3))
        out = np.asarray(interp_along_axis(zs, vals, q, axis=0))
        for j in range(3):
            f = interp1d(zs[:, j], vals[:, j], bounds_error=False, fill_value=np.nan)
            np.testing.assert_allclose(out[:, j], f(q[:, j]), atol=1e-12)

    def test_exact_at_nodes(self, rng):
        zs = np.sort(rng.uniform(0, 1, (2, 2, 9)), axis=-1)
        vals = rng.normal(size=(2, 2, 9))
        out = np.asarray(interp_along_axis(zs, vals, zs, axis=-1))
        np.testing.assert_allclose(out, vals, atol=1e-9)


def _rgi(cube_zyx, ys, xs, zs):
    """scipy RGI in the reference's (y, x, z) convention
    (reference: delayFcns.py:40-56)."""
    return RegularGridInterpolator(
        (ys, xs, zs), cube_zyx.transpose(1, 2, 0), bounds_error=False, fill_value=np.nan
    )


class TestInterp3dPoints:
    def test_matches_scipy_uniform_grid(self, rng):
        ys = np.linspace(30, 36, 13)
        xs = np.linspace(-120, -114, 25)
        zs = np.linspace(-500, 25000, 40)
        cube = rng.normal(size=(40, 13, 25))

        n = 5000
        py = rng.uniform(29, 37, n)      # some out of bounds
        px = rng.uniform(-121, -113, n)
        pz = rng.uniform(-1000, 26000, n)

        ours = np.asarray(interp3d_points(cube, ys, xs, zs, py, px, pz))
        ref = _rgi(cube, ys, xs, zs)(np.stack([py, px, pz], axis=-1))
        np.testing.assert_allclose(ours, ref, atol=1e-12, equal_nan=True)

    def test_matches_scipy_nonuniform_z(self, rng):
        ys = np.linspace(0, 10, 6)
        xs = np.linspace(0, 10, 7)
        zs = np.unique(np.concatenate([[0.0], np.cumsum(rng.uniform(1, 500, 30))]))
        cube = rng.normal(size=(zs.size, 6, 7))

        n = 2000
        py = rng.uniform(0, 10, n)
        px = rng.uniform(0, 10, n)
        pz = rng.uniform(-10, zs.max() + 10, n)
        ours = np.asarray(interp3d_points(cube, ys, xs, zs, py, px, pz))
        ref = _rgi(cube, ys, xs, zs)(np.stack([py, px, pz], axis=-1))
        np.testing.assert_allclose(ours, ref, atol=1e-10, equal_nan=True)

    def test_upper_bound_inclusive(self, rng):
        ys = np.linspace(0, 1, 3)
        xs = np.linspace(0, 1, 3)
        zs = np.linspace(0, 1, 3)
        cube = rng.normal(size=(3, 3, 3))
        out = np.asarray(interp3d_points(cube, ys, xs, zs, [1.0], [1.0], [1.0]))
        np.testing.assert_allclose(out, cube[-1, -1, -1])


class TestSeparable:
    def test_matches_pointwise(self, rng):
        ys = np.linspace(30, 36, 13)
        xs = np.linspace(-120, -114, 25)
        zs = np.concatenate([[-500.0], np.cumsum(rng.uniform(10, 800, 30))])
        cube = rng.normal(size=(zs.size, 13, 25))

        qy = np.linspace(31, 35, 9)
        qx = np.linspace(-119, -115, 11)
        qz = np.array([0.0, 100.0, 500.0, 1000.0])
        out = np.asarray(
            interp3d_separable(
                cube, grid_weights(zs, qz), grid_weights(ys, qy), grid_weights(xs, qx)
            )
        )
        rgi = _rgi(cube, ys, xs, zs)
        for a, z in enumerate(qz):
            for b, y in enumerate(qy):
                for c, x in enumerate(qx):
                    np.testing.assert_allclose(out[a, b, c], rgi([y, x, z])[0], atol=1e-10)

    def test_oob_rows_nan(self, rng):
        zs = np.linspace(0, 10, 5)
        w = grid_weights(zs, np.array([-1.0, 5.0, 11.0]))
        assert np.isnan(w[0]).all() and np.isnan(w[2]).all()
        assert np.isfinite(w[1]).all()


class TestCumtrapz:
    def test_matches_reference_loop(self, rng):
        """Reference: per-level np.trapz (weatherModel.py:398-401)."""
        ny, nx, nz = 3, 4, 20
        vals = rng.uniform(0.1, 3, size=(ny, nx, nz))
        zs = np.concatenate([[-100.0], np.cumsum(rng.uniform(10, 2000, nz - 1)) - 100.0])

        ours = np.asarray(cumtrapz_from_top(vals, zs))
        ref = np.zeros_like(vals)
        for level in range(nz):
            ref[..., level] = 1e-6 * np.trapezoid(vals[..., level:], x=zs[level:], axis=2)
        np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-18)
