"""Shared production scene for the multi-process engine test.

Built identically (fixed seeds) by the single-process golden run in
tests/test_parallel.py::TestMultiHost and by each OS process in
tests/_mh_worker.py, so the only variable is the mesh the engine runs on.
"""

import datetime as dtm
import hashlib

import numpy as np

T0 = dtm.datetime(2020, 1, 30, 13, 52, 45)
HEIGHTS = [0.0, 2000.0, 8000.0]
# inside the synthetic weather grid (ys 32..35, xs -120..-116) and the
# synthetic orbit's zero-Doppler band — the scene the parity drives use
BBOX = [33.2, 33.8, -118.4, -117.2]


def build_inputs():
    """Deterministic weather dataset + orbit (identical in every process)."""
    from raider_tpu.io.ncdf import Variable
    from tests.test_orbit import synthetic_orbit
    from tests.test_raytrace import synthetic_wm_dataset

    rng = np.random.default_rng(11)
    shape = (49, 13, 17)          # synthetic_wm_dataset's (z, y, x) grid
    wet = rng.uniform(1.0, 60.0, shape)
    hydro = rng.uniform(50.0, 300.0, shape)
    ds = synthetic_wm_dataset(wet_cube=wet, hydro_cube=hydro)
    # structured integrated fields so the Zenith leg is non-trivial
    ds.variables['wet_total'] = Variable(
        ('z', 'y', 'x'), rng.uniform(0.0, 0.3, shape), {})
    ds.variables['hydro_total'] = Variable(
        ('z', 'y', 'x'), rng.uniform(0.5, 2.5, shape), {})
    return ds, synthetic_orbit(T0)


def run_production() -> dict:
    """PRODUCTION tropo_delay (Zenith cube + Raytracing cube) on whatever
    device mesh is active; returns bit-level digests of the delay cubes."""
    from raider_tpu.delay.engine import tropo_delay
    from raider_tpu.geometry.aoi import BoundingBox
    from raider_tpu.geometry.los import Raytracing, Zenith

    ds, orbit = build_inputs()
    aoi = BoundingBox(list(BBOX), cube_spacing_in_m=5000)
    z_ds, _ = tropo_delay(T0, ds, aoi, Zenith(), height_levels=HEIGHTS)
    aoi2 = BoundingBox(list(BBOX), cube_spacing_in_m=5000)
    r_ds, _ = tropo_delay(T0, ds, aoi2, Raytracing(orbit=orbit, time=T0),
                          height_levels=HEIGHTS, zref=25000.0)

    # quantized-i16 result stream (the TPU production default) across the
    # same mesh: quantization is order-independent (exact min/max +
    # elementwise round), so sharded-multi-process must stay bit-identical
    # to the unsharded golden here too
    import os

    old_stream = os.environ.get('RAIDER_TPU_STREAM')
    os.environ['RAIDER_TPU_STREAM'] = 'i16'
    try:
        aoi3 = BoundingBox(list(BBOX), cube_spacing_in_m=5000)
        q_ds, _ = tropo_delay(T0, ds, aoi3, Raytracing(orbit=orbit, time=T0),
                              height_levels=HEIGHTS, zref=25000.0)
    finally:
        if old_stream is None:
            os.environ.pop('RAIDER_TPU_STREAM', None)
        else:
            os.environ['RAIDER_TPU_STREAM'] = old_stream

    out = {}
    for name, d in (('zenith', z_ds), ('ray', r_ds), ('ray_q16', q_ds)):
        w = np.ascontiguousarray(np.asarray(d['wet'].data, np.float64))
        h = np.ascontiguousarray(np.asarray(d['hydro'].data, np.float64))
        out[name] = hashlib.md5(w.tobytes() + h.tobytes()).hexdigest()
        out[f'{name}_shape'] = list(w.shape)
        out[f'{name}_finite_frac'] = float(np.isfinite(w).mean())
        out[f'{name}_sum'] = float(np.nansum(w) + np.nansum(h))
    # the quantized stream must track the exact one within its documented
    # bound (range/131068 per slice; delays here are O(1) m)
    wr = np.asarray(r_ds['wet'].data, np.float64)
    wq = np.asarray(q_ds['wet'].data, np.float64)
    both = np.isfinite(wr) & np.isfinite(wq)
    out['ray_q16_close'] = bool(
        (np.isfinite(wr) == np.isfinite(wq)).all()
        and float(np.abs(wq[both] - wr[both]).max()) < 1e-4)
    return out


def run_cli(workdir) -> dict:
    """FULL CLI drive: calcDelays on a YAML config (raytraced cube product,
    synthetic orbit statevector file + mocked weather prep) on whatever
    device mesh is active. Returns content digests of the product files -
    data variables, coords, and attrs except the run-timestamped 'history'
    - so multi-process runs can be asserted bit-identical to the
    single-process golden at the PRODUCT level (VERDICT r4 item 6)."""
    import hashlib
    import os
    import pathlib

    import yaml

    import raider_tpu.workflows.calc_delays as cd
    from raider_tpu.io import read_nc
    from raider_tpu.io.ncdf import write_nc

    wd = pathlib.Path(workdir)
    wd.mkdir(parents=True, exist_ok=True)
    ds, orbit = build_inputs()
    wm_path = wd / 'wm.nc'
    write_nc(ds, str(wm_path))

    # 7-column ISO statevector text (geometry/orbit.py::read_txt_file)
    lines = []
    for t, p, v in zip(orbit.times, orbit.pos, orbit.vel):
        ts = (orbit.ref_time + dtm.timedelta(seconds=float(t))).isoformat()
        lines.append(' '.join([ts] + [f'{c:.6f}' for c in (*p, *v)]))
    orb_path = wd / 'orbit.txt'
    orb_path.write_text('\n'.join(lines) + '\n')

    cfg = {
        'look_dir': 'right',
        'weather_model': 'ERA5',
        'date_group': {'date_start': 20200130},
        'time_group': {'time': '13:52:45', 'interpolate_time': 'none'},
        'aoi_group': {'bounding_box': list(BBOX)},
        'height_group': {'height_levels': list(HEIGHTS)},
        'los_group': {'ray_trace': True, 'orbit_file': str(orb_path),
                      'zref': 25000.0},
        'runtime_group': {'output_directory': str(wd),
                          'weather_model_directory': str(wd),
                          'cube_spacing_in_m': 5000,
                          'verbose': False},
    }
    cfg_path = wd / 'cfg.yaml'
    cfg_path.write_text(yaml.dump(cfg))

    orig_prepare = cd.prepareWeatherModel
    cd.prepareWeatherModel = lambda *a, **k: str(wm_path)
    cwd = os.getcwd()
    os.chdir(wd)
    try:
        paths = cd.calcDelays([str(cfg_path)])
    finally:
        os.chdir(cwd)
        # restore: an in-process golden run (test suite, dryrun) must not
        # leak the mock into later calcDelays tests
        cd.prepareWeatherModel = orig_prepare

    out = {}
    for pth in paths:
        d = read_nc(pth)
        h = hashlib.md5()
        for name in sorted(d.variables):
            h.update(np.ascontiguousarray(np.asarray(d[name].data)).tobytes())
        for name in sorted(d.coords):
            h.update(np.ascontiguousarray(
                np.asarray(d.coords[name].data)).tobytes())
        stable = {k: v for k, v in sorted(d.attrs.items())
                  if k != 'history'}
        h.update(repr(stable).encode())
        key = os.path.basename(pth)
        out[key] = h.hexdigest()
        w = np.asarray(d['wet'].data, np.float64)
        out[f'{key}_finite_frac'] = float(np.isfinite(w).mean())
        out[f'{key}_sum'] = float(np.nansum(w))
    return out
