"""Antimeridian-AK stereo scene parity across seeds (run on real TPU).

The round-5 BASELINE diagnosis measured 0.067-0.101 mm across seeds for
this scene class with the absolute-frame f32 coordinate entry. With the
origin-relative frame + df64 sphere-stereo transform
(device_geom._stereo_rel_from_df) the class should drop well under the
0.1 mm bar. Usage:

    SOAK_SEEDS=6 timeout 1800 python -u scripts/antimeridian_soak.py
"""

import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))


def main():
    import raider_tpu  # noqa: F401
    from parity_sweep import make_antimeridian_scene

    from raider_tpu.delay.engine import _build_cube_ray
    from raider_tpu.geodesy.crs import Geographic

    n_seeds = int(os.environ.get('SOAK_SEEDS', '5'))
    worst = 0.0
    for seed in range(n_seeds):
        rng = np.random.default_rng(11 + 97 * seed)
        wm, xq, yq, hts, los, zref, label = make_antimeridian_scene(rng)
        t0 = time.perf_counter()
        os.environ['RAIDER_TPU_DEVICE_GEOMETRY'] = '0'
        w_h, h_h = _build_cube_ray(wm, xq, yq, hts, los, Geographic(),
                                   zref=zref, compute_dtype=np.float32)
        os.environ['RAIDER_TPU_DEVICE_GEOMETRY'] = '1'
        w_d, h_d = _build_cube_ray(wm, xq, yq, hts, los, Geographic(),
                                   zref=zref, compute_dtype=np.float32)
        deltas = []
        for a, b in ((w_h, w_d), (h_h, h_d)):
            a, b = np.asarray(a), np.asarray(b)
            assert (np.isnan(a) == np.isnan(b)).all(), 'NaN masks differ'
            d = np.abs(a - b)
            deltas.append(np.nanmax(d) if np.isfinite(d).any() else 0.0)
        mm = 1e3 * float(max(deltas))
        worst = max(worst, mm)
        print(f'seed {seed}: max|d|={mm:.4f} mm '
              f'({time.perf_counter() - t0:.0f}s)', flush=True)
    print(f'worst across {n_seeds} seeds: {worst:.4f} mm', flush=True)


if __name__ == '__main__':
    main()
