"""Isolate the parity failure scenes from parity_sweep.py.

Reproduces a failing scene (seed-deterministic) and ablates:
  host          host-f64 geometry (the truth side)
  dev           device default (surrogate 'ref', cube-global plan)
  dev-exact     RAIDER_TPU_GEOM_ALGO=ref_exact (no surrogate)
  dev-perslice  RAIDER_TPU_CUBE_PLAN=0 (per-slice plans)
  dev-both      both overrides
"""

import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from scripts.parity_sweep import make_scene  # noqa: E402


def main():
    import raider_tpu  # noqa: F401
    from raider_tpu.delay.engine import _build_cube_ray
    from raider_tpu.geodesy.crs import Geographic

    target = int(os.environ.get('DEBUG_SCENE', '2'))
    rng = np.random.default_rng(int(os.environ.get('SWEEP_SEED', '11')))
    for idx in range(target + 1):
        scene = make_scene(rng, idx)
    wm, xq, yq, hts, los, zref, label = scene
    print(label, flush=True)

    def run():
        w, h = _build_cube_ray(wm, xq, yq, hts, los, Geographic(),
                               zref=zref, compute_dtype=np.float32)
        return np.asarray(w), np.asarray(h)

    os.environ['RAIDER_TPU_DEVICE_GEOMETRY'] = '0'
    w_h, h_h = run()

    os.environ['RAIDER_TPU_DEVICE_GEOMETRY'] = '1'
    configs = [
        ('dev-default', {}),
        ('dev-exact', {'RAIDER_TPU_GEOM_ALGO': 'ref_exact'}),
        ('dev-perslice', {'RAIDER_TPU_CUBE_PLAN': '0'}),
        ('dev-both', {'RAIDER_TPU_GEOM_ALGO': 'ref_exact',
                      'RAIDER_TPU_CUBE_PLAN': '0'}),
    ]
    for name, env in configs:
        for k in ('RAIDER_TPU_GEOM_ALGO', 'RAIDER_TPU_CUBE_PLAN'):
            os.environ.pop(k, None)
        os.environ.update(env)
        w_d, h_d = run()
        dm = 1e3 * max(np.nanmax(np.abs(w_d - w_h)), np.nanmax(np.abs(h_d - h_h)))
        # also locate the worst pixel for the default config
        d = np.abs(h_d - h_h)
        ij = np.unravel_index(np.nanargmax(d), d.shape)
        print(f'{name:13s}: max|d|={dm:.4f} mm  worst at slice={ij[0]} '
              f'y={ij[1]} x={ij[2]}', flush=True)


if __name__ == '__main__':
    main()
