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

    def test_reference_makePoints3D_golden_matrix(self):
        """Bit-level parity with the reference's CHECKED-IN 3-D golden
        result (test/test_result_makePoints3D.txt, driven by
        test/test_util.py:115-237): max_len=100, step=5 rays from the
        fixture's start/direction grids must reproduce the stored
        (3, 3, 3, 3, 20) matrix exactly."""
        import pathlib

        golden = pathlib.Path(
            '/root/reference/test/test_result_makePoints3D.txt')
        if not golden.exists():
            pytest.skip('reference golden data unavailable')
        true_rays = np.loadtxt(golden).reshape((3, 3, 3, 3, 20))

        sp = np.zeros((3, 3, 3, 3))
        sp[:, :, 1, 2] = 10
        sp[:, :, 2, 2] = 100
        slv = np.zeros((3, 3, 3, 3))
        slv[0, :, :, 2] = 1
        slv[1, :, :, 1] = 1
        slv[2, :, :, 0] = 1
        max_len, step = 100.0, 5
        npts = int(max_len // step)

        out = native.make_ray_points(sp, slv, float(step), npts)
        assert out.shape == true_rays.shape
        np.testing.assert_array_equal(out, true_rays)


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


class TestInterpNAdversarial:
    """The reference's exhaustive property surface
    (test/test_interpolator.py:320-985): every rank x sorted/unsorted
    query streams x fill-value case, boundary-exact queries, the thread
    ladder, and native-vs-fallback agreement."""

    @pytest.mark.parametrize('ndim', [1, 2, 3, 4, 5])
    @pytest.mark.parametrize('fill', [np.nan, -9999.0])
    @pytest.mark.parametrize('sorted_q', [False, True])
    def test_rank_sorted_fill_matrix(self, rng, ndim, fill, sorted_q):
        sizes = [9, 8, 7, 5, 4][:ndim]
        axes = [np.sort(rng.uniform(-50, 50, s)) for s in sizes]
        vals = rng.normal(size=sizes)
        pts = np.stack([rng.uniform(-60, 60, 3000) for _ in range(ndim)], axis=-1)
        if sorted_q:
            # ascending stream on the FIRST axis engages the scan fast path
            pts = pts[np.argsort(pts[:, 0])]
        got = native.interpolate(axes, vals, pts, fill_value=fill,
                                 assume_sorted=sorted_q)
        rgi = RegularGridInterpolator(tuple(axes), vals, bounds_error=False,
                                      fill_value=np.nan)
        ref = rgi(pts)
        ref[np.isnan(ref)] = fill
        np.testing.assert_allclose(got, ref, atol=1e-12, equal_nan=True)

    @pytest.mark.parametrize('ndim', [1, 2, 3, 4])
    def test_boundary_exact_queries(self, rng, ndim):
        """Queries exactly ON the grid edges are in-bounds (never fill)."""
        sizes = [6, 5, 4, 3][:ndim]
        axes = [np.sort(rng.uniform(0, 10, s)) for s in sizes]
        vals = rng.normal(size=sizes)
        lowc = np.array([a[0] for a in axes])
        highc = np.array([a[-1] for a in axes])
        pts = np.stack([lowc, highc,
                        np.array([a[0] if i % 2 else a[-1]
                                  for i, a in enumerate(axes)])])
        got = native.interpolate(axes, vals, pts, fill_value=-1e30)
        assert np.all(got > -1e29), got
        # corner values are exact
        np.testing.assert_allclose(got[0], vals[(0,) * ndim], atol=1e-12)
        np.testing.assert_allclose(got[1], vals[(-1,) * ndim], atol=1e-12)

    def test_epsilon_outside_is_fill(self, rng):
        axes = [np.linspace(0, 1, 5), np.linspace(0, 1, 6)]
        vals = rng.normal(size=(5, 6))
        eps = 1e-9
        pts = np.array([[0.0 - eps, 0.5], [1.0 + eps, 0.5],
                        [0.5, -eps], [0.5, 1.0 + eps]])
        got = native.interpolate(axes, vals, pts, fill_value=-7.0)
        np.testing.assert_array_equal(got, -7.0)

    @pytest.mark.parametrize('threads', [1, 2, 4, 8])
    def test_forced_threads_match_auto(self, rng, threads):
        """Every forced thread count reproduces the auto thread-ladder
        result bit for bit (reference ladder: module.cpp:73-87)."""
        axes = [np.sort(rng.uniform(0, 1, 16)) for _ in range(2)]
        vals = rng.normal(size=(16, 16))
        pts = rng.uniform(-0.1, 1.1, (50_000, 2))
        auto = native.interpolate(axes, vals, pts, max_threads=0)
        forced = native.interpolate(axes, vals, pts, max_threads=threads)
        np.testing.assert_array_equal(auto, forced)

    def test_thread_ladder_boundary_sizes(self, rng):
        """Sizes either side of the 1e4 ladder rung give identical values
        regardless of how many threads the ladder picks."""
        axes = [np.sort(rng.uniform(0, 1, 9))]
        vals = rng.normal(size=9)
        for n in (9_999, 10_001):
            pts = rng.uniform(0, 1, (n, 1))
            a = native.interpolate(axes, vals, pts, max_threads=0)
            b = native.interpolate(axes, vals, pts, max_threads=1)
            np.testing.assert_array_equal(a, b)

    def test_native_matches_numpy_fallback(self, rng, monkeypatch):
        """The scipy/NumPy fallback and the C++ path are interchangeable -
        including fill_value for NaN query points (advisor r1 finding)."""
        axes = [np.sort(rng.uniform(0, 10, 7)) for _ in range(3)]
        vals = rng.normal(size=(7, 7, 7))
        pts = rng.uniform(-1, 11, (2000, 3))
        pts[::97] = np.nan
        got_native = native.interpolate(axes, vals, pts, fill_value=-4.5)
        monkeypatch.setattr(native, '_try_load', lambda: None)
        got_fallback = native.interpolate(axes, vals, pts, fill_value=-4.5)
        np.testing.assert_allclose(got_native, got_fallback, atol=1e-12)
        assert np.all(got_native[::97] == -4.5)

    def test_single_point_and_empty(self, rng):
        axes = [np.linspace(0, 1, 4), np.linspace(0, 1, 4)]
        vals = rng.normal(size=(4, 4))
        one = native.interpolate(axes, vals, np.array([[0.3, 0.7]]))
        rgi = RegularGridInterpolator(tuple(axes), vals)
        np.testing.assert_allclose(one, rgi([[0.3, 0.7]]), atol=1e-12)
        empty = native.interpolate(axes, vals, np.empty((0, 2)))
        assert empty.shape == (0,)


class TestInterpAlongAxisAdversarial:
    def test_axis0_and_fill_edges(self, rng):
        n, cols = 25, 30
        xs = np.sort(rng.uniform(0, 100, (n, cols)), axis=0)
        ys = rng.normal(size=(n, cols))
        q = rng.uniform(-10, 110, (12, cols))
        out = native.interpolate_along_axis(xs, ys, q, axis=0, fill_value=-3.25)
        for c in range(cols):
            f = interp1d(xs[:, c], ys[:, c], bounds_error=False, fill_value=-3.25)
            np.testing.assert_allclose(out[:, c], f(q[:, c]), atol=1e-12)

    def test_queries_at_exact_samples(self, rng):
        xs = np.sort(rng.uniform(0, 1, (8, 12)), axis=-1)
        ys = rng.normal(size=(8, 12))
        out = native.interpolate_along_axis(xs, ys, xs, axis=-1)
        np.testing.assert_allclose(out, ys, atol=1e-9)

    def test_fallback_matches_native(self, rng, monkeypatch):
        xs = np.sort(rng.uniform(0, 1, (20, 16)), axis=-1)
        ys = rng.normal(size=(20, 16))
        q = rng.uniform(-0.2, 1.2, (20, 9))
        a = native.interpolate_along_axis(xs, ys, q, fill_value=-1.5)
        monkeypatch.setattr(native, '_try_load', lambda: None)
        b = native.interpolate_along_axis(xs, ys, q, fill_value=-1.5)
        np.testing.assert_allclose(a, b, atol=1e-12)


class TestInterp3dAdversarial:
    def test_nan_query_and_boundary(self, rng):
        nz, ny, nx = 8, 7, 6
        zs = np.cumsum(rng.uniform(10, 500, nz))
        ys = np.linspace(0, 10, ny)
        xs = np.linspace(0, 10, nx)
        cube = rng.normal(size=(nz, ny, nx))
        py = np.array([ys[0], ys[-1], 5.0, np.nan])
        px = np.array([xs[0], xs[-1], 5.0, 5.0])
        pz = np.array([zs[0], zs[-1], zs[3], zs[3]])
        out = native.interp3d(cube, zs, ys, xs, py, px, pz)
        np.testing.assert_allclose(out[0], cube[0, 0, 0], atol=1e-12)
        np.testing.assert_allclose(out[1], cube[-1, -1, -1], atol=1e-12)
        assert np.isfinite(out[2]) and np.isnan(out[3])

    def test_large_batch_threads(self, rng):
        nz, ny, nx = 12, 11, 10
        zs = np.cumsum(rng.uniform(1, 10, nz))
        ys = np.linspace(0, 1, ny)
        xs = np.linspace(0, 1, nx)
        cube = rng.normal(size=(nz, ny, nx))
        n = 300_000  # crosses the 4e6/thread=2 rung? exercises mt path anyway
        py = rng.uniform(-0.1, 1.1, n)
        px = rng.uniform(-0.1, 1.1, n)
        pz = rng.uniform(zs[0] - 5, zs[-1] + 5, n)
        a = native.interp3d(cube, zs, ys, xs, py, px, pz, max_threads=1)
        b = native.interp3d(cube, zs, ys, xs, py, px, pz, max_threads=8)
        np.testing.assert_array_equal(a, b)
        rgi = RegularGridInterpolator((ys, xs, zs), cube.transpose(1, 2, 0),
                                      bounds_error=False, fill_value=np.nan)
        sel = rng.integers(0, n, 2000)
        ref = rgi(np.stack([py[sel], px[sel], pz[sel]], -1))
        np.testing.assert_allclose(a[sel], ref, atol=1e-12, equal_nan=True)
