"""Cold/warm start probe: time-to-first-slice of the production raytrace
path in a FRESH OS process, under whatever compile cache the caller set via
RAIDER_TPU_COMPILE_CACHE (VERDICT r3 item 4: cold-start cost must be a
recorded artifact number, and the persistent cache's cross-process hit for
the Pallas + static-plan executables must be demonstrated, not assumed).

bench.py runs this twice as a subprocess against ONE cache dir: the first
(cold) run populates it, the second (warm) run is a brand-new process that
can only be fast if the on-disk cache actually serves the executables.

Prints one JSON line:
  {"t_import_s", "t_first_slice_s", "cache_files_before", "cache_files_after"}

Scene: deliberately small (40k rays, 30-level 100x100 cube, 2 heights) so
the COLD leg is dominated by compilation, which is what the probe measures;
throughput has its own bench legs.
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def cache_file_count() -> int:
    d = os.environ.get('RAIDER_TPU_COMPILE_CACHE', '')
    if d in ('', '0', '1'):
        d = os.path.join(os.path.expanduser('~'), '.cache', 'raider_tpu', 'xla')
    try:
        return sum(1 for _ in pathlib.Path(d).iterdir())
    except OSError:
        return 0


def main() -> None:
    n_before = cache_file_count()
    t0 = time.perf_counter()
    import datetime as dt

    import numpy as np

    import raider_tpu  # noqa: F401  (installs the compile-cache config)
    from raider_tpu.delay.engine import WeatherCube, _build_cube_ray
    from raider_tpu.geodesy.crs import Geographic
    from raider_tpu.geometry.los import Raytracing
    from raider_tpu.geometry.orbit import Orbit
    from raider_tpu.io.ncdf import Dataset, Variable

    t_import = time.perf_counter() - t0

    rng = np.random.default_rng(7)
    t_ref = dt.datetime(2020, 1, 1, 12, 0, 0)
    tt = np.arange(-600.0, 601.0, 30.0)
    r_orb = 6378137.0 + 700e3
    ang = 2.0 * np.pi / 5800.0 * tt
    pos = np.stack([r_orb * np.cos(ang), np.zeros_like(ang),
                    r_orb * np.sin(ang)], -1)
    vel = np.gradient(pos, 30.0, axis=0)
    orbit = Orbit(times=tt, pos=pos, vel=vel, ref_time=t_ref)

    nz, ny, nx = 30, 100, 100
    zs = -500.0 + 22500.0 * np.linspace(0.0, 1.0, nz) ** 1.4
    ys = np.linspace(16.0, 24.0, ny)
    xs = np.linspace(1.5, 7.5, nx)
    wm = WeatherCube(Dataset(
        coords={'x': Variable(('x',), xs, {}),
                'y': Variable(('y',), ys, {}),
                'z': Variable(('z',), zs, {})},
        variables={
            'wet': Variable(('z', 'y', 'x'),
                            rng.uniform(0.1, 100.0, (nz, ny, nx)), {}),
            'hydro': Variable(('z', 'y', 'x'),
                              rng.uniform(50.0, 300.0, (nz, ny, nx)), {}),
            'proj': Variable((), np.int64(0), Geographic().to_cf())},
        attrs={}))
    los = Raytracing(orbit=orbit, time=t_ref)
    yq = np.linspace(18.5, 21.5, 200)
    xq = np.linspace(3.5, 6.0, 200)

    t0 = time.perf_counter()
    w, h = _build_cube_ray(wm, xq, yq, np.array([0.0, 100.0]), los,
                           Geographic(), zref=float(zs[-1] - 1.0),
                           compute_dtype=np.float32)
    t_first = time.perf_counter() - t0
    assert np.isfinite(np.asarray(w)).mean() > 0.9, 'probe scene mostly NaN'

    print(json.dumps({
        't_import_s': round(t_import, 3),
        't_first_slice_s': round(t_first, 3),
        'cache_files_before': n_before,
        'cache_files_after': cache_file_count(),
    }), flush=True)


if __name__ == '__main__':
    main()
