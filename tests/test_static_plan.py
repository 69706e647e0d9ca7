"""Static-plan brick kernel + clip_chain (the cube-global plan machinery).

The production TPU engine bakes ONE sampling plan per cube into a compiled
integrate (raytrace.static_plan_from / _static_brick_fn) and uses
full-length clamped chains (rays.clip_chain) so every slice shares the
plan's structure. These tests pin:

  * static kernel == traced brick kernel bit-near-exactly on adversarial
    inputs (NaN rays, out-of-bounds rays, interior samples, random ladders)
  * clip_chain reproduces level_heights' kept-interval geometry (reference
    losreader.py:772-835 clamp + <1 m drop rules) with zero-length padding
  * a higher slice integrated under the LOWEST slice's plan (the engine's
    cube-global reuse) matches its own per-slice plan
"""

import numpy as np
import pytest

from raider_tpu.delay.raytrace import (
    build_group_plan,
    integrate_rays,
    pack_cubes,
    static_plan_from,
)
from raider_tpu.geometry.rays import clip_chain, level_heights

from test_brick_kernel import contiguous_rays


def run_pair(zs, heights, n_rays=257, seed=0, mutate=None):
    """(traced brick, static brick) outputs on the same random scene."""
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
    packed, mode = pack_cubes(wet, hydro, mode='brick')
    out = {}
    for static in (False, True):
        out[static] = integrate_rays(
            wet, hydro, ys, xs, zs, bnd_y, bnd_x, bnd_z, d2, ray_len, re,
            per_level_max, packed2d=packed, mode=mode,
            heights=heights, hstep_max=hstep_max, static_plan=static,
        )
    (w_t, h_t), (w_s, h_s) = out[False], out[True]
    return (np.asarray(w_t), np.asarray(h_t)), (np.asarray(w_s), np.asarray(h_s))


class TestStaticKernelEquivalence:
    def test_regular_chain(self):
        zs = np.arange(-500.0, 10001.0, 500.0)
        heights = level_heights(zs, 0.0, 9000.0)
        (w_t, h_t), (w_s, h_s) = run_pair(zs, heights)
        assert np.isfinite(w_s).all()
        np.testing.assert_allclose(w_s, w_t, rtol=1e-5)
        np.testing.assert_allclose(h_s, h_t, rtol=1e-5)

    def test_clip_chain_with_pads(self):
        """Zero-length pad levels (clamped chain) contribute exactly zero."""
        zs = np.arange(-500.0, 10001.0, 500.0)
        heights = clip_chain(zs, 1200.0, 8600.0)
        assert heights.size == zs.size
        (w_t, h_t), (w_s, h_s) = run_pair(zs, heights)
        assert np.isfinite(w_s).all()
        np.testing.assert_allclose(w_s, w_t, rtol=1e-5)
        np.testing.assert_allclose(h_s, h_t, rtol=1e-5)

    def test_irregular_ladder_interior_samples(self):
        zs = -500.0 + 27000.0 * np.linspace(0.0, 1.0, 18) ** 1.6
        heights = clip_chain(zs, 0.0, 26000.0)
        (w_t, h_t), (w_s, h_s) = run_pair(zs, heights, seed=3)
        np.testing.assert_allclose(w_s, w_t, rtol=1e-5)
        np.testing.assert_allclose(h_s, h_t, rtol=1e-5)

    def test_mid_chain_zero_length_level(self):
        """A chain with a mid-chain collapsed (absorbed <1 m) level: the
        zero-length level contributes exactly zero and the kernel pair still
        agrees (the absorbing level's segment spans two model cells)."""
        zs = np.array([-500.0, 500.0, 1500.0, 1500.8, 2500.0, 3500.0,
                       4500.0, 5500.0])
        heights = clip_chain(zs, 0.0, 5000.0)
        assert (np.diff(heights) == 0.0).any()        # the absorbed level
        (w_t, h_t), (w_s, h_s) = run_pair(zs, heights, seed=5)
        assert np.isfinite(w_s).all()
        np.testing.assert_allclose(w_s, w_t, rtol=1e-5)
        np.testing.assert_allclose(h_s, h_t, rtol=1e-5)

    def test_nan_and_oob_rays(self):
        zs = np.arange(-500.0, 10001.0, 500.0)
        heights = clip_chain(zs, 0.0, 9000.0)

        def mutate(bnd_y, bnd_x, bnd_z, ray_len):
            bnd_y[:, 7] = np.nan          # non-converged ray
            bnd_x[:, 11] += 30.0          # walks off the cube
            ray_len[:, 13] = np.nan

        (w_t, h_t), (w_s, h_s) = run_pair(zs, heights, mutate=mutate)
        assert np.isnan(w_s[7]) and np.isnan(w_s[11]) and np.isnan(w_s[13])
        np.testing.assert_array_equal(np.isnan(w_s), np.isnan(w_t))
        m = ~np.isnan(w_s)
        np.testing.assert_allclose(w_s[m], w_t[m], rtol=1e-5)

    def test_plan_structure_is_hashable_and_cached(self):
        zs = np.arange(0.0, 5001.0, 1000.0)
        heights = clip_chain(zs, 0.0, 5000.0)
        plm = np.full(heights.size - 1, 1100.0)
        hsm = np.full(heights.size - 1, 1e-3)
        ys = xs = np.arange(0.0, 1.01, 0.1)
        p1 = build_group_plan(plm, heights, hsm, ys, xs, zs)
        p2 = build_group_plan(plm.copy(), heights.copy(), hsm.copy(), ys, xs, zs)
        k1, k2 = static_plan_from(p1), static_plan_from(p2)
        assert k1 == k2 and hash(k1) == hash(k2)


class TestClipChain:
    def test_matches_level_heights_real_part(self):
        """The non-degenerate part of the clip chain IS the level_heights
        chain (reference losreader.py:772-835)."""
        zs = np.arange(-500.0, 10001.0, 500.0)
        for ht, zref in ((0.0, 9000.0), (-500.0, 8600.0), (750.0, 10000.0),
                         (1499.5, 9000.0)):
            ref = level_heights(zs, ht, zref)
            cc = clip_chain(zs, ht, zref)
            assert cc.size == zs.size
            # strip leading/trailing duplicates -> the real chain
            real = cc[np.concatenate([[True], np.diff(cc) > 0])]
            real = real[real <= ref[-1] + 1e-9]
            np.testing.assert_allclose(real, ref, atol=1e-9)

    def test_bottom_thin_interval_dropped(self):
        """A <1 m clamped bottom interval is excluded (losreader.py:798)."""
        zs = np.array([0.0, 1000.0, 2000.0, 3000.0])
        cc = clip_chain(zs, 999.5, 3000.0)
        ref = level_heights(zs, 999.5, 3000.0)
        assert ref[0] == 1000.0           # reference dropped [999.5, 1000)
        assert cc[0] == 1000.0 and cc[1] == 1000.0

    def test_top_thin_interval_dropped(self):
        zs = np.array([0.0, 1000.0, 2000.0, 3000.0])
        cc = clip_chain(zs, 0.0, 2000.5)
        ref = level_heights(zs, 0.0, 2000.5)
        assert ref[-1] == 2000.0          # reference dropped [2000, 2000.5)
        assert cc[-1] == 2000.0

    def test_no_contribution_returns_none(self):
        zs = np.array([0.0, 1000.0, 2000.0])
        assert clip_chain(zs, 5000.0, 26000.0) is None
        assert clip_chain(zs, 0.0, 0.5) is None

    def test_all_intervals_thin_returns_none(self):
        """Every cell <1 m: the reference skips them all (losreader.py:807)
        even though the total span exceeds 1 m."""
        zs = np.array([0.0, 0.6, 1.2, 1.8])
        assert clip_chain(zs, 0.0, 26000.0) is None
        assert level_heights(zs, 0.0, 26000.0) is None

    def test_mid_chain_thin_interval_absorbed(self):
        """A <1 m interval mid-chain is skipped and its span absorbed into
        the NEXT kept segment via the carried boundary (losreader.py:807-815),
        matching level_heights on the same grid."""
        zs = np.array([0.0, 1000.0, 1000.5, 2000.0, 3000.0])
        ref = level_heights(zs, 0.0, 26000.0)
        # reference chain: [0, 1000, 2000, 2999.99] - the [1000, 1000.5)
        # interval is dropped and [1000.5, 2000] becomes [1000, 2000]
        np.testing.assert_allclose(ref, [0.0, 1000.0, 2000.0, 2999.99])
        cc = clip_chain(zs, 0.0, 26000.0)
        assert cc.size == zs.size
        np.testing.assert_allclose(cc, [0.0, 1000.0, 1000.0, 2000.0, 2999.99])
        # kept-interval structure (nonzero spans) matches the reference chain
        real = cc[np.concatenate([[True], np.diff(cc) > 0])]
        np.testing.assert_allclose(real, ref, atol=1e-9)

    def test_random_grids_match_level_heights(self):
        """Property: on random z grids (incl. sub-1 m cells anywhere) the
        nonzero-span structure of clip_chain equals the level_heights chain."""
        rng = np.random.default_rng(4)
        for _ in range(200):
            nz = int(rng.integers(3, 30))
            steps = 10.0 ** rng.uniform(-1.0, 3.5, nz - 1)
            zs = -500.0 + np.concatenate([[0.0], np.cumsum(steps)])
            ht = float(rng.uniform(-600.0, 500.0))
            zref = float(rng.uniform(ht + 0.5, zs[-1] + 1000.0))
            ref = level_heights(zs, ht, zref)
            cc = clip_chain(zs, float(ht), zref)
            if ref is None:
                assert cc is None or not (np.diff(cc) > 0).any()
                continue
            assert cc is not None and cc.size == zs.size
            real = cc[np.concatenate([[True], np.diff(cc) > 0])]
            np.testing.assert_allclose(real, ref, atol=1e-9)

    def test_top_level_nudge(self):
        zs = np.array([0.0, 1000.0, 2000.0])
        cc = clip_chain(zs, 0.0, 26000.0)
        assert cc[-1] == pytest.approx(1999.99)


class TestCubeGlobalPlanReuse:
    def test_higher_slice_under_lowest_plan(self):
        """Integrating a higher slice with the LOWEST slice's plan (what the
        engine does) matches integrating it with its own plan."""
        rng = np.random.default_rng(7)
        zs = np.arange(-500.0, 10001.0, 500.0)
        ys = np.arange(33.0, 34.01, 0.1)
        xs = np.arange(-118.0, -116.99, 0.1)
        wet = rng.uniform(0.5, 2.0, (zs.size, ys.size, xs.size))
        hydro = rng.uniform(1.0, 4.0, (zs.size, ys.size, xs.size))
        packed, mode = pack_cubes(wet, hydro, mode='brick')
        lo = clip_chain(zs, 0.0, 9000.0)
        hi = clip_chain(zs, 1200.0, 9000.0)
        n = 193
        # identical ray directions through both chains (same seeded rng), as
        # in the engine where one pixel grid feeds every slice
        bnd_y, bnd_x, bnd_z, d2, ray_len, hsm_hi = contiguous_rays(
            hi, n, np.random.default_rng(11))
        re = np.full(n, 6371000.0)
        plm_hi = np.nanmax(ray_len, axis=1)
        # the lowest slice's plan: maxima from the full (unclamped) chain
        _, _, _, _, rl_lo, hsm_lo = contiguous_rays(
            lo, n, np.random.default_rng(11))
        plm_lo = np.nanmax(rl_lo, axis=1)
        assert (plm_lo + 1e-9 >= plm_hi).all()
        own = integrate_rays(wet, hydro, ys, xs, zs, bnd_y, bnd_x, bnd_z,
                             d2, ray_len, re, plm_hi, packed2d=packed,
                             mode=mode, heights=hi, hstep_max=hsm_hi,
                             static_plan=True)
        reused = integrate_rays(wet, hydro, ys, xs, zs, bnd_y, bnd_x, bnd_z,
                                d2, ray_len, re, plm_lo, packed2d=packed,
                                mode=mode, heights=lo, hstep_max=hsm_lo,
                                static_plan=True)
        # same integral, possibly finer quadrature under the global plan
        np.testing.assert_allclose(np.asarray(reused[0]), np.asarray(own[0]),
                                   rtol=2e-4)
        np.testing.assert_allclose(np.asarray(reused[1]), np.asarray(own[1]),
                                   rtol=2e-4)
