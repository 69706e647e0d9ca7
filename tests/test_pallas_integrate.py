"""Pallas static-brick integrate kernel (interpret mode) vs the XLA kernel.

The TPU production path for the cube-global static plan runs the brick
contraction as a Pallas kernel (raytrace._static_brick_pallas_fn: rays on
lanes, static brick-row MACs, coordinate math in VMEM). On-chip equivalence
and timing live in scripts/kernel_profile.py; these tests pin the same
kernel in interpret mode on CPU against the XLA static kernel, mirroring the
reference's tolerance discipline (reference: test/test_synthetic.py:218-432).
"""

import jax
import numpy as np
import pytest

from raider_tpu.delay.raytrace import (
    integrate_rays,
    pack_cubes,
    pallas_integrate_mode,
)
from raider_tpu.geometry.rays import clip_chain, level_heights

from test_brick_kernel import contiguous_rays


def run_pair(zs, heights, monkeypatch, n_rays=257, seed=0, mutate=None,
             stacked=False):
    """(XLA static, Pallas-interpret static) outputs on one random scene."""
    rng = np.random.default_rng(seed)
    ys = np.arange(33.0, 34.01, 0.1)
    xs = np.arange(-118.0, -116.99, 0.1)
    wet = rng.uniform(0.5, 2.0, (zs.size, ys.size, xs.size)).astype(np.float32)
    hydro = rng.uniform(1.0, 4.0, (zs.size, ys.size, xs.size)).astype(np.float32)
    bnd_y, bnd_x, bnd_z, d2, ray_len, hstep_max = contiguous_rays(
        heights, n_rays, rng)
    if mutate is not None:
        mutate(bnd_y, bnd_x, bnd_z, ray_len)
    re = np.full(n_rays, 6371000.0)
    per_level_max = np.nanmax(ray_len, axis=1)
    packed, mode = pack_cubes(wet, hydro, mode='brick')
    assert mode == 'brick'
    out = {}
    on_tpu = jax.default_backend() == 'tpu'   # conftest pins CPU in CI
    for env in ('0', '1'):
        monkeypatch.setenv('RAIDER_TPU_PALLAS_INTEGRATE', env)
        expect = ('' if env == '0'
                  else 'tpu' if on_tpu else 'interpret')
        assert pallas_integrate_mode(ys, xs) == expect
        out[env] = integrate_rays(
            wet, hydro, ys, xs, zs, bnd_y, bnd_x, bnd_z, d2, ray_len, re,
            per_level_max, packed2d=packed, mode=mode,
            heights=heights, hstep_max=hstep_max, static_plan=True,
            stacked_out=stacked,
        )
    if stacked:
        (w_x, h_x), (w_p, h_p) = np.asarray(out['0']), np.asarray(out['1'])
    else:
        (w_x, h_x), (w_p, h_p) = out['0'], out['1']
    return ((np.asarray(w_x), np.asarray(h_x)),
            (np.asarray(w_p), np.asarray(h_p)))


class TestPallasIntegrateEquivalence:
    def test_regular_chain(self, monkeypatch):
        zs = np.arange(-500.0, 10001.0, 500.0)
        heights = level_heights(zs, 0.0, 9000.0)
        (w_x, h_x), (w_p, h_p) = run_pair(zs, heights, monkeypatch)
        assert np.isfinite(w_p).all()
        np.testing.assert_allclose(w_p, w_x, rtol=2e-5)
        np.testing.assert_allclose(h_p, h_x, rtol=2e-5)

    def test_clip_chain_with_pads(self, monkeypatch):
        zs = np.arange(-500.0, 10001.0, 500.0)
        heights = clip_chain(zs, 1200.0, 8600.0)
        (w_x, h_x), (w_p, h_p) = run_pair(zs, heights, monkeypatch)
        assert np.isfinite(w_p).all()
        np.testing.assert_allclose(w_p, w_x, rtol=2e-5)
        np.testing.assert_allclose(h_p, h_x, rtol=2e-5)

    def test_irregular_ladder(self, monkeypatch):
        zs = -500.0 + 27000.0 * np.linspace(0.0, 1.0, 18) ** 1.6
        heights = clip_chain(zs, 0.0, 26000.0)
        (w_x, h_x), (w_p, h_p) = run_pair(zs, heights, monkeypatch, seed=3)
        np.testing.assert_allclose(w_p, w_x, rtol=2e-5)
        np.testing.assert_allclose(h_p, h_x, rtol=2e-5)

    def test_nan_and_oob_rays(self, monkeypatch):
        """NaN/out-of-bounds rays NaN in BOTH kernels, never silently zero."""
        zs = np.arange(-500.0, 10001.0, 500.0)
        heights = clip_chain(zs, 0.0, 9000.0)

        def mutate(bnd_y, bnd_x, bnd_z, ray_len):
            bnd_y[:, 7] = np.nan
            bnd_x[:, 11] += 30.0
            ray_len[:, 13] = np.nan

        (w_x, h_x), (w_p, h_p) = run_pair(zs, heights, monkeypatch,
                                          mutate=mutate)
        assert np.isnan(w_p[7]) and np.isnan(w_p[11]) and np.isnan(w_p[13])
        np.testing.assert_array_equal(np.isnan(w_p), np.isnan(w_x))
        m = ~np.isnan(w_p)
        np.testing.assert_allclose(w_p[m], w_x[m], rtol=2e-5)

    def test_stacked_output(self, monkeypatch):
        """stacked_out returns one (2, N) buffer from the Pallas path too
        (the engine's single-bulk-copy contract)."""
        zs = np.arange(-500.0, 8001.0, 1000.0)
        heights = level_heights(zs, 0.0, 7500.0)
        (w_x, h_x), (w_p, h_p) = run_pair(zs, heights, monkeypatch,
                                          stacked=True)
        np.testing.assert_allclose(w_p, w_x, rtol=2e-5)
        np.testing.assert_allclose(h_p, h_x, rtol=2e-5)

    def test_non_uniform_axes_fall_back(self, monkeypatch):
        """Non-uniform y/x axes must not take the Pallas path (in-kernel
        locate is the uniform FMA only)."""
        monkeypatch.setenv('RAIDER_TPU_PALLAS_INTEGRATE', '1')
        ys_bad = np.array([0.0, 1.0, 2.5, 4.5])
        xs = np.arange(0.0, 1.01, 0.1)
        assert pallas_integrate_mode(ys_bad, xs) == ''
        assert pallas_integrate_mode(xs, ys_bad) == ''
        assert pallas_integrate_mode(xs, xs) == (
            'tpu' if jax.default_backend() == 'tpu' else 'interpret')


class TestPallasIntegrateSharded:
    def test_sharded_matches_unsharded(self, monkeypatch):
        """shard_map-wrapped Pallas integrate over the 8-device CPU mesh ==
        single-device, bit-exact (no collectives, per-ray SPMD)."""
        import jax

        from raider_tpu.parallel.mesh import place_ray_arrays, replicate

        if len(jax.devices()) < 2:
            pytest.skip('needs the multi-device CPU mesh')
        monkeypatch.setenv('RAIDER_TPU_PALLAS_INTEGRATE', '1')
        zs = np.arange(-500.0, 9001.0, 500.0)
        heights = level_heights(zs, 0.0, 8500.0)
        rng = np.random.default_rng(11)
        ys = np.arange(33.0, 34.01, 0.1)
        xs = np.arange(-118.0, -116.99, 0.1)
        wet = rng.uniform(0.5, 2.0, (zs.size, ys.size, xs.size)).astype(np.float32)
        hydro = rng.uniform(1.0, 4.0, (zs.size, ys.size, xs.size)).astype(np.float32)
        n_rays = 8 * 37
        bnd_y, bnd_x, bnd_z, d2, ray_len, hstep_max = contiguous_rays(
            heights, n_rays, rng)
        re = np.full(n_rays, 6371000.0)
        per_level_max = np.nanmax(ray_len, axis=1)
        packed, mode = pack_cubes(wet, hydro, mode='brick')

        def call(args, packed2d):
            return integrate_rays(
                wet, hydro, ys, xs, zs, *args,
                ray_lengths_max=per_level_max, packed2d=packed2d, mode=mode,
                heights=heights, hstep_max=hstep_max, static_plan=True,
                stacked_out=True)

        base = np.asarray(call((bnd_y, bnd_x, bnd_z, d2, ray_len, re),
                               packed))
        placed, orig_n = place_ray_arrays(
            [bnd_y, bnd_x, bnd_z, d2, ray_len], ray_axis=1)
        (re_s,), _ = place_ray_arrays([re], ray_axis=0)
        sharded = np.asarray(call((*placed, re_s), replicate(packed)))
        np.testing.assert_array_equal(sharded[:, :orig_n], base)
