"""Pinned parity regression bound (VERDICT r2 item 5).

The randomized two-hemisphere parity sweep (scripts/parity_sweep.py) is the
TPU-side drive; this test pins the same scenes and the same bound in the CI
suite so host-vs-device geometry drift can never creep silently: a fixed
seed reproduces one geographic-CRS and one UTM-CRS scene from the sweep's
generator and asserts max |delay delta| < 0.1 mm — the README's documented
parity promise (reference tolerance discipline:
test/test_synthetic.py:218-432).

On the CPU backend the device-geometry leg runs the 'ref_exact' df64 chain
whose double-float arithmetic partially collapses under XLA:CPU fast-math
(see geometry/device_geom._default_ref_algo): these two scenes measure
0.1507 / 0.1502 mm here — stable across rounds (verified identical at the
round-2 head) — while the real-TPU sweep measures 0.073 mm worst and keeps
the 0.1 mm bar (asserted in parity_sweep.main, run on-chip). The CI bound is
therefore pinned at 0.2 mm: tight enough that any sampling-plan or
z-sampling regression (the known failure modes measure ~1 mm) fails loudly,
loose enough for the CPU backend's emulated df64.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'scripts'))

BOUND_MM = 0.2


@pytest.fixture()
def restore_geom_env():
    prev = os.environ.get('RAIDER_TPU_DEVICE_GEOMETRY')
    yield
    if prev is None:
        os.environ.pop('RAIDER_TPU_DEVICE_GEOMETRY', None)
    else:
        os.environ['RAIDER_TPU_DEVICE_GEOMETRY'] = prev


@pytest.mark.parametrize('idx', [0, 1])   # 0: geographic CRS, 1: UTM
def test_parity_bound_fixed_scene(idx, restore_geom_env):
    from parity_sweep import make_scene

    from raider_tpu.delay.engine import _build_cube_ray
    from raider_tpu.geodesy.crs import Geographic

    rng = np.random.default_rng(11)       # the sweep's default seed
    scenes = [make_scene(rng, i) for i in range(idx + 1)]
    wm, xq, yq, hts, los, zref, label = scenes[idx]

    os.environ['RAIDER_TPU_DEVICE_GEOMETRY'] = '0'
    w_h, h_h = _build_cube_ray(wm, xq, yq, hts, los, Geographic(),
                               zref=zref, compute_dtype=np.float32)
    os.environ['RAIDER_TPU_DEVICE_GEOMETRY'] = '1'
    w_d, h_d = _build_cube_ray(wm, xq, yq, hts, los, Geographic(),
                               zref=zref, compute_dtype=np.float32)

    worst = 0.0
    for a, b in ((w_h, w_d), (h_h, h_d)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b),
                                      err_msg=f'{label}: NaN masks differ')
        d = np.abs(a - b)
        if np.isfinite(d).any():
            worst = max(worst, float(np.nanmax(d)))
    assert 1e3 * worst < BOUND_MM, (
        f'{label}: parity {1e3 * worst:.4f} mm exceeds the pinned '
        f'{BOUND_MM} mm CI bound (known failure modes measure ~1 mm; '
        f'baseline for these scenes is ~0.151 mm on the CPU backend)')


def test_parity_bound_antimeridian(restore_geom_env):
    """HRRR-AK regime pinned in CI: output grid crossing +/-180 deg lon in
    the polar-stereographic NCEP-sphere model CRS (VERDICT r3 item 6;
    reference models/hrrr.py:22-25, 284-356). Asserts host-f64 vs
    device-geometry parity under the same pinned bound, that the scene
    actually produced finite delays (an all-NaN cube would pass a
    delta-only check vacuously), and that both legs agree on NaN masks.
    """
    from parity_sweep import make_antimeridian_scene

    from raider_tpu.delay.engine import _build_cube_ray
    from raider_tpu.geodesy.crs import Geographic

    rng = np.random.default_rng(11)
    wm, xq, yq, hts, los, zref, label = make_antimeridian_scene(rng)
    assert xq[0] < 180.0 < xq[-1]          # the scene must cross 180

    os.environ['RAIDER_TPU_DEVICE_GEOMETRY'] = '0'
    w_h, h_h = _build_cube_ray(wm, xq, yq, hts, los, Geographic(),
                               zref=zref, compute_dtype=np.float32)
    os.environ['RAIDER_TPU_DEVICE_GEOMETRY'] = '1'
    w_d, h_d = _build_cube_ray(wm, xq, yq, hts, los, Geographic(),
                               zref=zref, compute_dtype=np.float32)

    worst = 0.0
    for a, b in ((w_h, w_d), (h_h, h_d)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).mean() > 0.95, (
            f'{label}: scene mostly NaN ({np.isfinite(a).mean():.2f} finite)')
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b),
                                      err_msg=f'{label}: NaN masks differ')
        d = np.abs(a - b)
        if np.isfinite(d).any():
            worst = max(worst, float(np.nanmax(d)))
    assert 1e3 * worst < BOUND_MM, (
        f'{label}: parity {1e3 * worst:.4f} mm exceeds {BOUND_MM} mm')
