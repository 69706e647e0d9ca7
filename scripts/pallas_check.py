"""On-TPU Pallas equivalence drive (run from /root/repo).

1. ztd_totals (compiled Pallas) vs the XLA cumtrapz composition on random
   cubes - must agree to f32 rounding (~1e-6 relative).
2. The wired production path: WeatherModel._get_ztd on the TPU backend must
   take the Pallas kernel and agree with the forced-XLA path.

Exits non-zero on any mismatch.
"""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    import raider_tpu  # noqa: F401
    from raider_tpu.ops.integrate import cumtrapz_from_top
    from raider_tpu.ops.pallas_ztd import ztd_totals

    backend = jax.default_backend()
    print('backend:', backend)
    assert backend == 'tpu', 'run this drive on the TPU backend'

    rng = np.random.default_rng(3)
    k1, k2, k3 = 0.776, 0.233, 3.75e3
    for (nz, ny, nx) in [(49, 120, 130), (20, 7, 13)]:
        t = rng.uniform(220, 300, (nz, ny, nx)).astype(np.float32)
        p = rng.uniform(1e3, 1e5, (nz, ny, nx)).astype(np.float32)
        e = rng.uniform(1, 1000, (nz, ny, nx)).astype(np.float32)
        zs = np.sort(rng.uniform(-500, 26000, nz)).astype(np.float32)

        wet_p, hyd_p = ztd_totals(jnp.asarray(t), jnp.asarray(p),
                                  jnp.asarray(e), jnp.asarray(zs),
                                  k1=k1, k2=k2, k3=k3)
        wet_n = k2 * e / t + k3 * e / t**2
        hyd_n = k1 * p / t
        wet_x = jnp.moveaxis(cumtrapz_from_top(
            jnp.moveaxis(jnp.asarray(wet_n), 0, -1), jnp.asarray(zs)), -1, 0)
        hyd_x = jnp.moveaxis(cumtrapz_from_top(
            jnp.moveaxis(jnp.asarray(hyd_n), 0, -1), jnp.asarray(zs)), -1, 0)
        for name, a, b in (('wet', wet_p, wet_x), ('hydro', hyd_p, hyd_x)):
            d = float(jnp.max(jnp.abs(a - b)))
            rel = d / max(float(jnp.max(jnp.abs(b))), 1e-30)
            print(f'({nz},{ny},{nx}) {name}: max|d|={d:.3e} rel={rel:.3e}')
            assert rel < 5e-6, f'Pallas/XLA mismatch: {name} rel={rel}'

    # ---- the wired production path
    import os

    tests = pathlib.Path(__file__).resolve().parent.parent / 'tests'
    sys.path.insert(0, str(tests))
    from test_wx import SyntheticModel

    m1 = SyntheticModel()
    m1.load_weather()
    m1._get_wet_refractivity()
    m1._get_hydro_refractivity()
    assert m1._use_pallas_ztd(), 'production gate did not select Pallas on TPU'
    m1._get_ztd()
    wet_pallas = m1._wet_ztd.copy()

    os.environ['RAIDER_TPU_PALLAS_ZTD'] = '0'
    try:
        m1._get_ztd()
    finally:
        del os.environ['RAIDER_TPU_PALLAS_ZTD']
    wet_xla = m1._wet_ztd
    rel = np.nanmax(np.abs(wet_pallas - wet_xla)) / np.nanmax(np.abs(wet_xla))
    print(f'wired _get_ztd pallas-vs-xla rel={rel:.3e}')
    assert rel < 5e-6
    print('PALLAS ZTD EQUIVALENCE OK')


if __name__ == '__main__':
    main()
