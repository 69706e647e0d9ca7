"""Native host runtime (C++ via ctypes) vs scipy/NumPy ground truth.

Mirrors the reference's native-extension property tests
(test/test_interpolator.py:320-985, test/test_util.py:201-237).
"""

import numpy as np
import pytest
from scipy.interpolate import RegularGridInterpolator, interp1d

from raider_tpu import native


@pytest.fixture(scope='module', autouse=True)
def built():
    if not native.available():
        if not native.build():
            pytest.skip('native library could not be built')


class TestInterpAlongAxis:
    def test_matches_scipy(self, rng):
        rows, n, m = 40, 30, 25
        xs = np.sort(rng.uniform(0, 1000, (rows, n)), axis=-1)
        ys = rng.normal(size=(rows, n))
        q = rng.uniform(-50, 1050, (rows, m))
        out = native.interpolate_along_axis(xs, ys, q, axis=-1, fill_value=np.nan)
        for r in range(rows):
            f = interp1d(xs[r], ys[r], bounds_error=False, fill_value=np.nan)
            np.testing.assert_allclose(out[r], f(q[r]), atol=1e-12, equal_nan=True)

    def test_3d_axis2(self, rng):
        """The wx pipeline shape: (y, x, z) cubes with per-column zs."""
        ny, nx, nz = 5, 6, 20
        zs = np.sort(rng.uniform(0, 30000, (ny, nx, nz)), axis=-1)
        vals = rng.normal(size=(ny, nx, nz))
        q = np.broadcast_to(np.linspace(0, 31000, 12), (ny, nx, 12))
        out = native.interpolate_along_axis(zs, vals, q, axis=2)
        for i in range(ny):
            for j in range(nx):
                f = interp1d(zs[i, j], vals[i, j], bounds_error=False, fill_value=np.nan)
                np.testing.assert_allclose(out[i, j], f(q[i, j]), atol=1e-12, equal_nan=True)

    def test_threads_consistent(self, rng):
        xs = np.sort(rng.uniform(0, 1, (100, 50)), axis=-1)
        ys = rng.normal(size=(100, 50))
        q = rng.uniform(0, 1, (100, 10))
        a = native.interpolate_along_axis(xs, ys, q, max_threads=1)
        b = native.interpolate_along_axis(xs, ys, q, max_threads=8)
        np.testing.assert_array_equal(a, b)


class TestInterp3d:
    def test_matches_scipy(self, rng):
        nz, ny, nx = 20, 15, 17
        zs = np.cumsum(rng.uniform(10, 500, nz))
        ys = np.linspace(30, 40, ny)
        xs = np.linspace(-120, -110, nx)
        cube = rng.normal(size=(nz, ny, nx))
        n = 5000
        py = rng.uniform(29, 41, n)
        px = rng.uniform(-121, -109, n)
        pz = rng.uniform(zs[0] - 100, zs[-1] + 100, n)

        ours = native.interp3d(cube, zs, ys, xs, py, px, pz)
        rgi = RegularGridInterpolator((ys, xs, zs), cube.transpose(1, 2, 0),
                                      bounds_error=False, fill_value=np.nan)
        ref = rgi(np.stack([py, px, pz], axis=-1))
        np.testing.assert_allclose(ours, ref, atol=1e-12, equal_nan=True)


class TestMakeRayPoints:
    def test_golden_formula(self, rng):
        """ray[..., k] = SP + k*step*SLV (reference: makePoints.pyx)."""
        start = rng.normal(size=(4, 5, 3)) * 1e6
        direction = rng.normal(size=(4, 5, 3))
        direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
        step, npts = 15.0, 100
        out = native.make_ray_points(start, direction, step, npts)
        assert out.shape == (4, 5, 3, npts)
        ks = np.arange(npts)
        expected = start[..., :, None] + step * direction[..., :, None] * ks
        np.testing.assert_allclose(out, expected, rtol=1e-15)

    def test_single_ray(self):
        out = native.make_ray_points(np.zeros(3), np.array([1.0, 0, 0]), 2.0, 5)
        np.testing.assert_allclose(out[0], [0, 2, 4, 6, 8])


class TestInterpN:
    """Generic N-D interpolation vs scipy, mirroring the reference's
    exhaustive property tests (test/test_interpolator.py:320-985)."""

    @pytest.mark.parametrize('ndim', [1, 2, 3, 4])
    def test_matches_scipy(self, rng, ndim):
        sizes = [7, 6, 5, 4][:ndim]
        axes = [np.sort(rng.uniform(0, 100, s)) for s in sizes]
        vals = rng.normal(size=sizes)
        pts = np.stack([rng.uniform(-5, 105, 4000) for _ in range(ndim)], axis=-1)
        got = native.interpolate(axes, vals, pts, fill_value=np.nan)
        rgi = RegularGridInterpolator(tuple(axes), vals, bounds_error=False,
                                      fill_value=np.nan)
        np.testing.assert_allclose(got, rgi(pts), atol=1e-12, equal_nan=True)

    def test_fill_value(self, rng):
        axes = [np.linspace(0, 1, 5), np.linspace(0, 1, 5)]
        vals = rng.normal(size=(5, 5))
        pts = np.array([[0.5, 0.5], [2.0, 0.5], [0.5, -1.0], [np.nan, 0.5]])
        got = native.interpolate(axes, vals, pts, fill_value=-9999.0)
        assert got[1] == -9999.0 and got[2] == -9999.0 and got[3] == -9999.0
        assert np.isfinite(got[0]) and got[0] != -9999.0

    def test_assume_sorted_matches_unsorted(self, rng):
        axes = [np.sort(rng.uniform(0, 100, 40))]
        vals = rng.normal(size=40)
        q = np.sort(rng.uniform(0, 100, 5000))
        a = native.interpolate(axes, vals, q[:, None], assume_sorted=True)
        b = native.interpolate(axes, vals, q[:, None], assume_sorted=False)
        np.testing.assert_array_equal(a, b)

    def test_threads_consistent(self, rng):
        axes = [np.sort(rng.uniform(0, 1, 12)) for _ in range(3)]
        vals = rng.normal(size=(12, 12, 12))
        pts = rng.uniform(0, 1, (200_000, 3))
        a = native.interpolate(axes, vals, pts, max_threads=1)
        b = native.interpolate(axes, vals, pts, max_threads=8)
        np.testing.assert_array_equal(a, b)

    def test_exact_at_grid_nodes(self, rng):
        axes = [np.sort(rng.uniform(0, 10, 6)), np.sort(rng.uniform(0, 10, 7))]
        vals = rng.normal(size=(6, 7))
        yy, xx = np.meshgrid(axes[0], axes[1], indexing='ij')
        pts = np.stack([yy.ravel(), xx.ravel()], axis=-1)
        got = native.interpolate(axes, vals, pts)
        np.testing.assert_allclose(got, vals.ravel(), atol=1e-9)

    def test_shape_validation(self):
        with pytest.raises(ValueError):
            native.interpolate([np.arange(3.0)], np.zeros((4,)), np.zeros((2, 1)))
        with pytest.raises(ValueError):
            native.interpolate([np.arange(3.0), np.arange(4.0)],
                               np.zeros((3, 4)), np.zeros((2, 3)))
