"""Full-workflow cross-backend drive: calcDelays (raytrace, YAML, orbit txt)
on CPU-f64 vs TPU, diff the cubes. Per .claude/skills/verify/SKILL.md.

Usage: python scripts/xbackend_drive.py <workdir> <cpu|tpu> [wm_file.nc]
Then:  python scripts/xbackend_drive.py <workdir> compare

The weather-model file defaults to the bundled ERA-5 scenario file but can
be overridden via the third argument or RAIDER_TPU_XB_WM_FILE.
"""
import datetime as dt
import os
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def make_inputs(work: pathlib.Path) -> None:
    import numpy as np

    sys.path.insert(0, str(REPO / 'tests'))
    from test_orbit import synthetic_orbit

    t0 = dt.datetime(2020, 1, 30, 13, 52, 45)
    orb = synthetic_orbit(t0)
    lines = []
    for k in range(orb.times.size):
        t_abs = t0 + dt.timedelta(seconds=float(orb.times[k]))
        p, v = orb.pos[k], orb.vel[k]
        lines.append(
            f'{t_abs.isoformat()} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} '
            f'{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}')
    (work / 'orbit.txt').write_text('\n'.join(lines) + '\n')

    import yaml

    cfg = {
        'look_dir': 'right',
        'weather_model': 'ERA5',
        'date_group': {'date_start': 20200130},
        'time_group': {'time': '13:52:45', 'interpolate_time': 'none'},
        'aoi_group': {'bounding_box': '33.2 33.8 -118.2 -117.0'},
        'height_group': {'height_levels': '0 1000 4000 8000'},
        'los_group': {'ray_trace': True, 'orbit_file': str(work / 'orbit.txt'),
                      'zref': 25000.0},
        'runtime_group': {'output_directory': str(work / 'out'),
                          'weather_model_directory': str(work / 'wm'),
                          'cube_spacing_in_m': 6000.0},
    }
    (work / 'cfg.yaml').write_text(yaml.dump(cfg))


def run(work: pathlib.Path, tag: str) -> None:
    import jax

    if tag == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import raider_tpu  # noqa: F401

    print('backend:', jax.default_backend(), flush=True)
    assert (tag == 'cpu') == (jax.default_backend() == 'cpu')

    import raider_tpu.workflows.calc_delays as cd

    default_wm = (pathlib.Path(os.environ.get('RAIDER_TPU_REFERENCE',
                                              '/root/reference'))
                  / 'test' / 'weather_files'
                  / 'ERA-5_2020_01_30_T13_52_45_32N_35N_120W_115W.nc')
    wm_file = pathlib.Path(
        sys.argv[3] if len(sys.argv) > 3
        else os.environ.get('RAIDER_TPU_XB_WM_FILE', str(default_wm)))
    if not wm_file.exists():
        raise SystemExit(f'weather-model file not found: {wm_file} '
                         '(pass one as argv[3] or RAIDER_TPU_XB_WM_FILE)')
    cd.prepareWeatherModel = lambda *a, **k: str(wm_file)

    outdir = work / 'out'
    outdir.mkdir(exist_ok=True)
    (work / 'wm').mkdir(exist_ok=True)
    files = cd.calcDelays([str(work / 'cfg.yaml')])
    print('outputs:', files, flush=True)
    import shutil

    for f in outdir.glob('*.nc'):
        shutil.copy(f, work / f'{tag}_{f.name}')
        f.unlink()


def compare(work: pathlib.Path) -> None:
    import numpy as np

    from raider_tpu.io import read_nc

    cpu = sorted(work.glob('cpu_*.nc'))
    tpu = sorted(work.glob('tpu_*.nc'))
    assert cpu and tpu, (cpu, tpu)
    worst = 0.0
    for c, t in zip(cpu, tpu):
        dc, dt_ = read_nc(str(c)), read_nc(str(t))
        for var in ('wet', 'hydro'):
            a = np.asarray(dc[var].data, np.float64)
            b = np.asarray(dt_[var].data, np.float64)
            if not np.array_equal(np.isnan(a), np.isnan(b)):
                nd = int((np.isnan(a) != np.isnan(b)).sum())
                print(f'{c.name} {var}: NaN masks differ at {nd} cells')
                worst = max(worst, 1.0)
            d = float(np.nanmax(np.abs(a - b)))
            print(f'{c.name} {var}: max |delta| = {d*1e3:.4f} mm')
            worst = max(worst, d)
    assert worst < 1e-3, f'cross-backend delta {worst} m too large'
    print(f'CROSS-BACKEND WORKFLOW PARITY OK (worst {worst*1e3:.4f} mm)')


if __name__ == '__main__':
    work = pathlib.Path(sys.argv[1])
    mode = sys.argv[2]
    work.mkdir(parents=True, exist_ok=True)
    if mode == 'compare':
        compare(work)
    else:
        if not (work / 'cfg.yaml').exists():
            make_inputs(work)
        run(work, mode)
