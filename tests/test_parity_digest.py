"""Fixed-scene numeric digest of the production raytrace path.

VERDICT r4 item 8: the CPU-backend analytic parity bound is 0.2 mm
(tests/test_parity_bound.py) - too loose to catch a 0.15 mm-class
regression. This test pins EXACT delay values (atol 1e-6 m = 0.001 mm) of
a deterministic synthetic scene through the full production
``_build_cube_ray`` chain (geo2rdr + chain Newton + CRS + sampling plan +
integrate), committed from the current TPU-verified state of the CPU
path. ANY numeric drift anywhere in the geometry/integrate chain fails
here first, long before the analytic bound would notice.

If this fails after an intentional numerical change (or a jax/XLA version
bump that changes float scheduling), re-pin via the printer at the bottom
AND re-run the on-chip parity sweep (scripts/parity_sweep.py) before
committing the new digest - the digest is a tripwire, not the truth.
"""

import datetime as dt
import sys

import numpy as np

from raider_tpu.delay.engine import WeatherCube, _build_cube_ray
from raider_tpu.geodesy.crs import Geographic
from raider_tpu.geometry.los import Raytracing

sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
from test_raytrace import synthetic_orbit, synthetic_wm_dataset  # noqa: E402

T0 = dt.datetime(2020, 1, 30, 13, 52, 45)

# sampled (height, row, col) probe points spread over the output cube
PROBES = [(0, 2, 3), (0, 7, 11), (1, 0, 0), (1, 5, 8), (2, 9, 1),
          (2, 4, 13), (1, 9, 14), (0, 0, 7)]

# exact expected values (m) from the verified state; atol 1e-6 m
DIGEST_WET = [0.01377074, 0.01200683, 0.007421824, 0.007109678,
              0.001161393, 0.001012577, 0.005935031, 0.0134112]
DIGEST_HYDRO = [0.04849261, 0.0540498, 0.03942132, 0.04199454,
                0.02205066, 0.02406148, 0.04742701, 0.05027625]
DIGEST_SUMS = (3.135402, 17.37899)


def _scene():
    """Deterministic smoothly-varying refractivity cubes (closed-form, no
    RNG: numpy generator streams are version-pinned but formulas are
    forever)."""
    ys = np.arange(32.0, 35.01, 0.25)
    xs = np.arange(-120.0, -115.99, 0.25)
    zs = np.concatenate([
        np.arange(-500.0, 3000.0, 250.0),
        np.arange(3000.0, 10000.0, 500.0),
        np.arange(10000.0, 30001.0, 1000.0),
    ])
    zz = zs[:, None, None]
    yy = ys[None, :, None]
    xx = xs[None, None, :]
    wet = (1.0 + 0.5 * np.sin(0.9 * yy) * np.cos(1.3 * xx)) \
        * np.exp(-np.maximum(zz, 0.0) / 2500.0)
    hydro = (2.0 + 0.3 * np.cos(1.7 * yy + 0.4 * xx)) \
        * np.exp(-np.maximum(zz, 0.0) / 8000.0)
    return synthetic_wm_dataset(wet_cube=wet, hydro_cube=hydro)


def _run():
    wm = WeatherCube(_scene())
    los = Raytracing(orbit=synthetic_orbit(T0), time=T0)
    xpts = np.linspace(-118.4, -117.2, 15)
    ypts = np.linspace(33.2, 33.8, 10)
    hts = np.array([0.0, 1500.0, 6000.0])
    wet, hydro = _build_cube_ray(wm, xpts, ypts, hts, los, Geographic(),
                                 zref=25000.0, compute_dtype=np.float32)
    return np.asarray(wet), np.asarray(hydro)


def test_raytrace_digest():
    wet, hydro = _run()
    assert wet.shape == (3, 10, 15)
    assert np.isfinite(wet).all() and np.isfinite(hydro).all()
    got_w = [float(wet[p]) for p in PROBES]
    got_h = [float(hydro[p]) for p in PROBES]
    np.testing.assert_allclose(got_w, DIGEST_WET, rtol=0, atol=1e-6)
    np.testing.assert_allclose(got_h, DIGEST_HYDRO, rtol=0, atol=1e-6)
    np.testing.assert_allclose([wet.sum(), hydro.sum()], DIGEST_SUMS,
                               rtol=0, atol=1e-5)


if __name__ == '__main__':
    # digest printer: python tests/test_parity_digest.py (run under the
    # test conftest env or pin the CPU backend first)
    import jax

    jax.config.update('jax_platforms', 'cpu')
    wet, hydro = _run()
    print('DIGEST_WET =', [float(f'{wet[p]:.6e}') for p in PROBES])
    print('DIGEST_HYDRO =', [float(f'{hydro[p]:.6e}') for p in PROBES])
    print('DIGEST_SUMS =', (float(f'{wet.sum():.6e}'),
                            float(f'{hydro.sum():.6e}')))
