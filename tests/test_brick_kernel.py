"""Brick (grouped-gather) raytrace kernel vs the per-sample pack16 kernel.

The brick kernel (raider_tpu/delay/raytrace.py) must reproduce pack16
bit-near-exactly on adversarial inputs: thin layers dropped by the
level_heights chain (a chain level then spans TWO grid cells), zref capping
a level mid-cell, the output height starting mid-cell, interior samples
(nparts > 2), out-of-bounds rays, and NaN (non-converged) rays.
"""

import numpy as np
import pytest

from raider_tpu.delay.raytrace import (
    build_group_plan,
    integrate_rays,
    pack_cubes,
)
from raider_tpu.geometry.rays import level_heights


def contiguous_rays(heights, n_rays, rng, azimuth=None, zenith_deg=(20, 50)):
    """Contiguous slant segments through the level chain, degrees grid."""
    L = heights.size - 1
    zen = np.deg2rad(rng.uniform(*zenith_deg, n_rays))
    azi = rng.uniform(0, 2 * np.pi, n_rays) if azimuth is None else np.full(n_rays, azimuth)
    dzv = np.diff(heights)
    dh = dzv[:, None] * np.tan(zen)[None, :]
    deg_per_m = 1.0 / 111000.0
    ycum = np.vstack([np.zeros((1, n_rays)), np.cumsum(dh * np.cos(azi) * deg_per_m, axis=0)])
    xcum = np.vstack([np.zeros((1, n_rays)), np.cumsum(dh * np.sin(azi) * deg_per_m, axis=0)])
    y0 = rng.uniform(33.2, 33.8, n_rays)
    x0 = rng.uniform(-117.8, -117.2, n_rays)
    bnd_y = y0 + ycum
    bnd_x = x0 + xcum
    bnd_z = np.broadcast_to(heights[:, None], (L + 1, n_rays)).copy()
    ray_len = dzv[:, None] / np.cos(zen)[None, :]
    d2 = dh**2
    hstep_max = np.nanmax(np.hypot(np.diff(bnd_y, axis=0),
                                   np.diff(bnd_x, axis=0)), axis=1)
    return bnd_y, bnd_x, bnd_z, d2, ray_len, hstep_max


def run_both(zs, heights, n_rays=257, seed=0, mutate=None):
    rng = np.random.default_rng(seed)
    ys = np.arange(33.0, 34.01, 0.1)
    xs = np.arange(-118.0, -116.99, 0.1)
    wet = rng.uniform(0.5, 2.0, (zs.size, ys.size, xs.size))
    hydro = rng.uniform(1.0, 4.0, (zs.size, ys.size, xs.size))
    bnd_y, bnd_x, bnd_z, d2, ray_len, hstep_max = contiguous_rays(
        heights, n_rays, rng)
    if mutate is not None:
        mutate(bnd_y, bnd_x, bnd_z, ray_len)
    re = np.full(n_rays, 6371000.0)
    per_level_max = np.nanmax(ray_len, axis=1)
    out = {}
    for mode in ('pack16', 'brick'):
        packed, _ = pack_cubes(wet, hydro, mode=mode)
        out[mode] = integrate_rays(
            wet, hydro, ys, xs, zs, bnd_y, bnd_x, bnd_z, d2, ray_len, re,
            per_level_max, packed2d=packed, mode=mode,
            heights=heights, hstep_max=hstep_max,
        )
    (w_p, h_p), (w_b, h_b) = out['pack16'], out['brick']
    return (np.asarray(w_p), np.asarray(h_p)), (np.asarray(w_b), np.asarray(h_b))


class TestBrickEquivalence:
    def test_regular_chain(self):
        zs = np.arange(-500.0, 10001.0, 500.0)
        heights = level_heights(zs, 0.0, 9000.0)
        (w_p, h_p), (w_b, h_b) = run_both(zs, heights)
        assert np.isfinite(w_b).all()
        np.testing.assert_allclose(w_b, w_p, rtol=1e-12)
        np.testing.assert_allclose(h_b, h_p, rtol=1e-12)

    def test_thin_layer_dropped_spans_two_cells(self):
        """A <1 m grid layer drops out of the chain (losreader.py:811-815):
        the surviving chain level spans two z-cells and the static hints
        must follow the samples, not the levels."""
        zs = np.array([-500.0, 0.0, 500.0, 500.5, 1000.0, 2000.0, 4000.0, 8000.0])
        heights = level_heights(zs, -100.0, 7000.0)
        # the 500->500.5 sliver is gone: one chain level spans 500->1000
        assert 500.5 not in heights and 500.0 in heights and 1000.0 in heights
        (w_p, h_p), (w_b, h_b) = run_both(zs, heights)
        assert np.isfinite(w_b).all()
        np.testing.assert_allclose(w_b, w_p, rtol=1e-12)
        np.testing.assert_allclose(h_b, h_p, rtol=1e-12)

    def test_midcell_start_and_zref_cap_with_interiors(self):
        """ht mid-cell, zref mid-cell, and thick layers (nparts > 2)."""
        zs = np.array([-500.0, 0.0, 3000.0, 9000.0, 18000.0, 30000.0])
        heights = level_heights(zs, 1500.0, 21234.5)
        assert heights[0] == 1500.0 and heights[-1] == 21234.5
        (w_p, h_p), (w_b, h_b) = run_both(zs, heights)
        assert np.isfinite(w_b).all()
        np.testing.assert_allclose(w_b, w_p, rtol=1e-12)
        np.testing.assert_allclose(h_b, h_p, rtol=1e-12)

    def test_nan_rays_propagate(self):
        zs = np.arange(-500.0, 10001.0, 1000.0)
        heights = level_heights(zs, 0.0, 9000.0)

        def mutate(bnd_y, bnd_x, bnd_z, ray_len):
            bnd_y[:, :7] = np.nan
            bnd_x[:, :7] = np.nan
            bnd_z[:, :7] = np.nan
            ray_len[:, :7] = np.nan

        (w_p, _), (w_b, _) = run_both(zs, heights, mutate=mutate)
        assert np.isnan(w_b[:7]).all() and np.isnan(w_p[:7]).all()
        assert np.isfinite(w_b[7:]).all()
        np.testing.assert_allclose(w_b[7:], w_p[7:], rtol=1e-12)

    def test_out_of_bounds_rays_are_nan(self):
        zs = np.arange(-500.0, 10001.0, 1000.0)
        heights = level_heights(zs, 0.0, 9000.0)

        def mutate(bnd_y, bnd_x, bnd_z, ray_len):
            bnd_x[:, 0] += 5.0   # push ray 0 east out of the grid

        (w_p, _), (w_b, _) = run_both(zs, heights, mutate=mutate)
        assert np.isnan(w_b[0]) and np.isnan(w_p[0])
        assert np.isfinite(w_b[1:]).all()

    def test_group_plan_structure(self):
        """All points covered once; anchors/offsets within the brick."""
        zs = np.arange(-500.0, 26001.0, 500.0)
        heights = level_heights(zs, 0.0, 25000.0)
        L = heights.size - 1
        nparts = (np.ceil(np.full(L, 800.0) / 1000.0) + 1).astype(int)
        hstep = np.full(L, 0.004)
        plan = build_group_plan(np.full(L, 800.0), heights, hstep,
                                np.arange(33.0, 34.01, 0.1),
                                np.arange(-118.0, -116.99, 0.1), zs)
        n_expected = int(nparts.sum() - (L - 1))
        assert plan.n_points == n_expected
        assert plan.mean_group_size > 1.5
        assert (plan.dzoff >= 0).all() and (plan.dzoff <= plan.planes - 2).all()
        # weights of non-pad points sum to the full trapezoid mass:
        # sum over levels of ray_len * 1.0 (uniform unit lengths here)
        mass = (plan.wa[~plan.pad].sum() + plan.wb[~plan.pad].sum())
        np.testing.assert_allclose(mass, L, rtol=1e-12)


class TestBrickFuzz:
    """Seeded property fuzz: random z-ladders (incl. near-degenerate layers),
    random start heights / zref caps, and random ray geometry must give
    brick == pack16 to f64-roundoff on CPU."""

    @pytest.mark.parametrize('seed', range(8))
    def test_random_configs(self, seed):
        rng = np.random.default_rng(100 + seed)
        # random ascending ladder with occasional thin layers
        nz = int(rng.integers(8, 40))
        steps = rng.uniform(30.0, 2500.0, nz - 1)
        thin = rng.random(nz - 1) < 0.15
        steps[thin] = rng.uniform(0.2, 5.0, thin.sum())
        zs = np.concatenate([[rng.uniform(-600, -100)],
                             np.cumsum(steps)]).astype(np.float64)
        zs += rng.uniform(-50, 50)
        ht = float(rng.uniform(zs[0] - 200.0, zs[min(3, nz - 2)]))
        zref = float(rng.uniform(zs[max(2, nz // 2)], zs[-1] + 500.0))
        heights = level_heights(zs, ht, zref)
        if heights is None or heights.size < 3:
            pytest.skip('degenerate chain')

        (w_p, h_p), (w_b, h_b) = run_both(
            zs, heights, n_rays=97, seed=seed,
        )
        both = np.isfinite(w_p) & np.isfinite(w_b)
        nan_match = np.isnan(w_p) == np.isnan(w_b)
        assert nan_match.all(), 'NaN patterns must agree'
        if both.any():
            np.testing.assert_allclose(w_b[both], w_p[both], rtol=1e-10)
            np.testing.assert_allclose(h_b[both], h_p[both], rtol=1e-10)
