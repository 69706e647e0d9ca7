"""Windowed Pallas integrate kernel (interpret mode) vs the brick kernel.

The windowed kernel must reproduce delay.raytrace's brick results (same
plan, same NaN semantics) for spatially coherent ray batches, and decline
(used=False) for incoherent ones or non-uniform axes.
"""

import numpy as np
import pytest

from raider_tpu.delay.pallas_window import integrate_rays_windowed
from raider_tpu.delay.raytrace import build_group_plan, integrate_rays, pack_cubes
from raider_tpu.delay.raytrace import _pad_group_plan, _PLAN_BUCKET
from raider_tpu.geometry.rays import level_heights


def make_scene(rng, nyo=40, nxo=48, azimuth=0.7, azi_jitter=0.02,
               zen=(20.0, 40.0), ny_cube=64, ypix_band=(33.1, 33.2)):
    """Coherent ray grid over a cube big enough for the window kernel."""
    zs = np.concatenate([np.arange(-500.0, 3000.0, 500.0),
                         np.arange(3000.0, 12001.0, 1500.0)])
    ys = 33.0 + 0.01 * np.arange(ny_cube)      # uniform, ny >= 48 gate
    xs = -118.0 + 0.01 * np.arange(140)        # uniform, nx=140 >= 128
    wet = rng.uniform(0.5, 2.0, (zs.size, ys.size, xs.size))
    hydro = rng.uniform(1.0, 4.0, (zs.size, ys.size, xs.size))

    heights = level_heights(zs, 0.0, 11000.0)
    L = heights.size - 1
    n = nyo * nxo
    # output pixels finer than cube cells (the production shape: 2 km
    # output cubes on >= 3 km weather grids)
    ypix = np.linspace(*ypix_band, nyo)
    xpix = np.linspace(-117.9, -117.7, nxo)
    y0 = np.repeat(ypix, nxo)
    x0 = np.tile(xpix, nyo)
    zenith = np.deg2rad(rng.uniform(*zen, n))
    azi = azimuth + rng.uniform(-azi_jitter, azi_jitter, n)
    dzv = np.diff(heights)
    dh = dzv[:, None] * np.tan(zenith)[None, :]
    deg_per_m = 1.0 / 111000.0
    ycum = np.vstack([np.zeros((1, n)),
                      np.cumsum(dh * np.cos(azi) * deg_per_m, axis=0)])
    xcum = np.vstack([np.zeros((1, n)),
                      np.cumsum(dh * np.sin(azi) * deg_per_m, axis=0)])
    zbc = np.broadcast_to(heights[:, None], (L + 1, n))
    bnd_y, bnd_x, bnd_z = y0 + ycum, x0 + xcum, zbc.copy()
    low = np.stack([bnd_y[:-1], bnd_x[:-1], bnd_z[:-1]], axis=-1)
    high = np.stack([bnd_y[1:], bnd_x[1:], bnd_z[1:]], axis=-1)
    ray_len = dzv[:, None] / np.cos(zenith)[None, :]
    d2 = dh ** 2
    re = np.full(n, 6371000.0)
    hstep_max = np.nanmax(np.hypot(np.diff(bnd_y, axis=0),
                                   np.diff(bnd_x, axis=0)), axis=1)
    return dict(zs=zs, ys=ys, xs=xs, wet=wet, hydro=hydro, heights=heights,
                low=low, high=high, d2=d2, ray_len=ray_len, re=re,
                bnd_y=bnd_y, bnd_x=bnd_x, bnd_z=bnd_z,
                hstep_max=hstep_max, shape=(nyo, nxo))


def run_window(sc, interpret=True):
    per_level_max = np.nanmax(sc['ray_len'], axis=1)
    plan = build_group_plan(per_level_max, sc['heights'], sc['hstep_max'],
                            sc['ys'], sc['xs'], sc['zs'])
    plan = _pad_group_plan(plan, _PLAN_BUCKET)
    f32 = lambda a: np.asarray(a, np.float32)
    return integrate_rays_windowed(
        f32(sc['wet']), f32(sc['hydro']), sc['ys'], sc['xs'], sc['zs'],
        f32(sc['low']), f32(sc['high']), f32(sc['d2']), f32(sc['ray_len']),
        f32(sc['re']), plan, sc['shape'], interpret=interpret)


def run_brick(sc):
    per_level_max = np.nanmax(sc['ray_len'], axis=1)
    f32 = lambda a: np.asarray(a, np.float32)
    wet32, hyd32 = f32(sc['wet']), f32(sc['hydro'])
    packed, mode = pack_cubes(wet32, hyd32, mode='brick')
    return integrate_rays(
        wet32, hyd32, sc['ys'], sc['xs'], sc['zs'],
        f32(sc['bnd_y']), f32(sc['bnd_x']), f32(sc['bnd_z']),
        f32(sc['d2']), f32(sc['ray_len']),
        f32(sc['re']), per_level_max, packed2d=packed, mode=mode,
        heights=sc['heights'], hstep_max=sc['hstep_max'])


class TestWindowedEquivalence:
    def test_matches_brick(self, rng):
        sc = make_scene(rng)
        w_w, h_w, used = run_window(sc)
        assert used
        w_b, h_b = run_brick(sc)
        w_w, h_w = np.asarray(w_w), np.asarray(h_w)
        w_b, h_b = np.asarray(w_b), np.asarray(h_b)
        assert np.isfinite(w_w).all()
        np.testing.assert_allclose(w_w, w_b, rtol=3e-6)
        np.testing.assert_allclose(h_w, h_b, rtol=3e-6)

    def test_nan_and_oob_rays(self, rng):
        sc = make_scene(rng)
        # low/high (windowed kernel) and bnd_* (brick kernel) are separate
        # views of the same geometry: mutate both
        sc['low'][:, :5, :] = np.nan
        sc['high'][:, :5, :] = np.nan
        sc['ray_len'][:, :5] = np.nan
        sc['low'][:, 7, 1] += 5.0    # out of the grid
        sc['high'][:, 7, 1] += 5.0
        for k in ('bnd_y', 'bnd_x', 'bnd_z'):
            sc[k][:, :5] = np.nan
        sc['bnd_x'][:, 7] += 5.0
        w_w, h_w, used = run_window(sc)
        assert used
        w_b, _ = run_brick(sc)
        w_w = np.asarray(w_w)
        w_b = np.asarray(w_b)
        np.testing.assert_array_equal(np.isnan(w_w), np.isnan(w_b))
        assert np.isnan(w_w[:5]).all() and np.isnan(w_w[7])
        fin = np.isfinite(w_b)
        np.testing.assert_allclose(w_w[fin], w_b[fin], rtol=3e-6)

    def test_incoherent_batch_declines(self, rng):
        """Fully random azimuths at steep incidence spread each tile far
        past the largest window; the wrapper must hand back used=False
        (caller falls back to brick)."""
        sc = make_scene(rng, azimuth=0.0, azi_jitter=np.pi, zen=(60.0, 72.0))
        _, _, used = run_window(sc)
        assert used is False

    def test_nonuniform_axis_declines(self, rng):
        sc = make_scene(rng)
        sc['ys'] = np.sort(rng.uniform(33.0, 33.64, 64))
        _, _, used = run_window(sc)
        assert used is False

    def test_odd_grid_padding(self, rng):
        """Non-multiple-of-32 pixel grids pad with edge rays and unpad."""
        sc = make_scene(rng, nyo=33, nxo=41)
        w_w, _, used = run_window(sc)
        assert used
        w_b, _ = run_brick(sc)
        np.testing.assert_allclose(np.asarray(w_w), np.asarray(w_b),
                                   rtol=3e-6)


class TestTopRowAnchors:
    def test_top_rows_never_silently_nan(self, rng):
        """Rays near the cube's top y rows on a non-multiple-of-8 ny: the
        anchor in-bounds clip moves windows DOWN, growing the effective
        spread past the measured one. The kernel must either fit a bigger
        bucket or decline (used=False) - never return used=True with NaNs
        for in-bounds rays (regression: the spread check ran pre-clip)."""
        # ny=54: top rows 48..53 are unreachable by an 8-aligned window
        sc = make_scene(rng, ny_cube=54, ypix_band=(33.50, 33.52),
                        azimuth=np.pi)   # southward rays stay in the cube
        w_w, h_w, used = run_window(sc)
        if used:
            w_b, h_b = run_brick(sc)
            w_w, h_w = np.asarray(w_w), np.asarray(h_w)
            assert np.isfinite(w_w).all()
            np.testing.assert_allclose(w_w, np.asarray(w_b), rtol=3e-6)
            np.testing.assert_allclose(h_w, np.asarray(h_b), rtol=3e-6)
        # else: declined safely - the engine falls back to the brick kernel
