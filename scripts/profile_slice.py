"""Stage-level profile of the production raytraced-STD slice pipeline.

Replicates bench.py's end-to-end section (1M rays, HRRR-sized cube,
Geographic CRS, GeomSession device geometry) but times each per-slice stage
with explicit synchronization so device-geometry, plan fetch/build, and the
integrate kernel are attributed separately. Used to direct the round-2
geometry optimization (VERDICT r1 item 1).
"""

import datetime as dt
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def sync(tree):
    import jax

    jax.block_until_ready(tree)


def main():
    import jax
    import jax.numpy as jnp

    import raider_tpu  # noqa: F401
    from raider_tpu.delay.engine import WeatherCube
    from raider_tpu.delay.raytrace import (build_group_plan,
                                           build_sampling_plan,
                                           integrate_rays, pack_cubes)
    from raider_tpu.geodesy.crs import Geographic
    from raider_tpu.geometry.device_geom import GeomSession
    from raider_tpu.geometry.orbit import Orbit
    from raider_tpu.geometry.rays import clip_chain
    from raider_tpu.io.ncdf import Dataset, Variable
    from raider_tpu.geodesy.gravity import get_Re

    rng = np.random.default_rng(0)
    nz, ny, nx = 50, 400, 400
    n_rays = 1_000_000
    zs = -500.0 + 26500.0 * np.linspace(0.0, 1.0, nz) ** 1.4

    t_ref = dt.datetime(2020, 1, 1, 12, 0, 0)
    tt = np.arange(-600.0, 601.0, 30.0)
    inc = np.deg2rad(90.0)   # polar orbit; swath at 30-46 deg zenith (bench scene)
    r_orb = 6378137.0 + 700e3
    om = 2.0 * np.pi / 5800.0
    ang = om * tt
    pos_o = np.stack([
        r_orb * np.cos(ang),
        r_orb * np.sin(ang) * np.cos(inc),
        r_orb * np.sin(ang) * np.sin(inc),
    ], -1)
    vel_o = np.gradient(pos_o, 30.0, axis=0)
    orbit = Orbit(times=tt, pos=pos_o, vel=vel_o, ref_time=t_ref)

    ys_e = np.linspace(16.0, 24.0, ny)
    xs_e = np.linspace(1.5, 7.5, nx)
    wet = rng.uniform(0.1, 100.0, (nz, ny, nx))
    hydro = rng.uniform(50.0, 300.0, (nz, ny, nx))
    coords = {'x': Variable(('x',), xs_e, {}), 'y': Variable(('y',), ys_e, {}),
              'z': Variable(('z',), zs, {})}
    variables = {
        'wet': Variable(('z', 'y', 'x'), wet, {}),
        'hydro': Variable(('z', 'y', 'x'), hydro, {}),
        'proj': Variable((), np.int64(0), Geographic().to_cf()),
    }
    wm = WeatherCube(Dataset(coords=coords, variables=variables, attrs={}))

    side = int(np.sqrt(n_rays))
    yq = np.linspace(18.5, 21.5, side)
    xq = np.linspace(3.5, 6.0, side)
    xx, yy = np.meshgrid(xq, yq)
    lat, lon = yy, xx
    re_local = np.asarray(get_Re(lat)).reshape(-1).astype(np.float32)

    zref = float(zs[-1] - 1.0)
    zpts = 100.0 * np.arange(6)
    # trim to the cube's active span, like the engine
    j0 = max(int(np.searchsorted(zs, float(zpts.min()), side='right')) - 1, 0)
    j1 = min(int(np.searchsorted(zs, zref, side='left')), zs.size - 1)
    zs_chain = zs[j0:j1 + 1]
    chains = [clip_chain(zs_chain, float(ht), zref,
                         nudge_top=(j1 == zs.size - 1)) for ht in zpts]

    cube_wet = wm.field('wet', np.float32)
    cube_hydro = wm.field('hydro', np.float32)
    t0 = time.perf_counter()
    packed2d, pack_mode = pack_cubes(cube_wet, cube_hydro, grouped=True)
    sync(packed2d)
    print(f'pack_cubes ({pack_mode}): {time.perf_counter() - t0:7.3f} s')

    t0 = time.perf_counter()
    sess = GeomSession(orbit, lat, lon, wm.crs)
    print(f'GeomSession init:       {time.perf_counter() - t0:7.3f} s')

    for hh, ht in enumerate(zpts):
        print(f'--- slice {hh} (ht={ht}) ---')
        t0 = time.perf_counter()
        geom = sess.slice(float(ht), chains[hh])
        t_disp = time.perf_counter() - t0
        sync(geom)
        t_geom = time.perf_counter() - t0
        print(f'  geometry:  {t_geom:7.3f} s (dispatch {t_disp:6.3f})')

        t0 = time.perf_counter()
        plm, hsm = jax.device_get((geom['per_level_max'], geom['hstep_max']))
        t_fetch = time.perf_counter() - t0
        print(f'  plan fetch:{t_fetch:7.3f} s')
        if hh == 0:
            # cube-global plan from the lowest slice, like the engine
            per_level_max = np.asarray(plm, np.float64)
            hstep_max = np.asarray(hsm, np.float64) * (1.0 + 1e-5) + 1e-7

        plan = build_sampling_plan(per_level_max)
        gp = build_group_plan(per_level_max, chains[0], hstep_max,
                              wm.ys, wm.xs, wm.zs)
        print(f'  plan: {plan[0].size} samples/ray, '
              f'{gp.anchor.size} gathers/ray, '
              f'nan_plm={np.isnan(per_level_max).sum()}, '
              f'max_plm={np.nanmax(per_level_max):.0f} m, '
              f'max_hstep={np.nanmax(hstep_max):.4f} deg')

        t0 = time.perf_counter()
        args = (geom['bnd_y'], geom['bnd_x'], geom['bnd_z'], geom['d2'],
                geom['ray_len'], jnp.asarray(re_local))
        w, h = integrate_rays(
            cube_wet, cube_hydro, wm.ys, wm.xs, wm.zs, *args,
            ray_lengths_max=per_level_max,
            packed2d=packed2d, mode=pack_mode,
            heights=chains[0], hstep_max=hstep_max,
            static_plan=True,
        )
        t_disp = time.perf_counter() - t0
        sync((w, h))
        t_int = time.perf_counter() - t0
        print(f'  integrate: {t_int:7.3f} s (dispatch {t_disp:6.3f})')




def engine_compare():
    """Reproduce bench.py's slope measurement through the engine itself."""
    import json

    import jax

    import raider_tpu  # noqa: F401
    from raider_tpu.delay.engine import WeatherCube, _build_cube_ray
    from raider_tpu.geodesy.crs import Geographic
    from raider_tpu.geometry.los import Raytracing
    from raider_tpu.geometry.orbit import Orbit
    from raider_tpu.io.ncdf import Dataset, Variable
    from raider_tpu.utils.profiling import stage_report

    rng = np.random.default_rng(0)
    nz, ny, nx = 50, 400, 400
    n_rays = 1_000_000
    zs = -500.0 + 26500.0 * np.linspace(0.0, 1.0, nz) ** 1.4
    t_ref = dt.datetime(2020, 1, 1, 12, 0, 0)
    tt = np.arange(-600.0, 601.0, 30.0)
    inc = np.deg2rad(90.0)   # polar orbit; swath at 30-46 deg zenith (bench scene)
    r_orb = 6378137.0 + 700e3
    om = 2.0 * np.pi / 5800.0
    ang = om * tt
    pos_o = np.stack([
        r_orb * np.cos(ang),
        r_orb * np.sin(ang) * np.cos(inc),
        r_orb * np.sin(ang) * np.sin(inc),
    ], -1)
    vel_o = np.gradient(pos_o, 30.0, axis=0)
    orbit = Orbit(times=tt, pos=pos_o, vel=vel_o, ref_time=t_ref)
    ys_e = np.linspace(16.0, 24.0, ny)
    xs_e = np.linspace(1.5, 7.5, nx)
    wet_np = rng.uniform(0.1, 100.0, (nz, ny, nx))
    hydro_np = rng.uniform(50.0, 300.0, (nz, ny, nx))
    los = Raytracing(orbit=orbit, time=t_ref)
    side = int(np.sqrt(n_rays))
    yq = np.linspace(18.5, 21.5, side)
    xq = np.linspace(3.5, 6.0, side)

    def run(bump, n_slices):
        # perturb CUBE VALUES, not the grid: keeps the cube-global static
        # plan bit-identical across calls (bench.py does the same)
        coords = {'x': Variable(('x',), xs_e, {}),
                  'y': Variable(('y',), ys_e, {}),
                  'z': Variable(('z',), zs, {})}
        variables = {
            'wet': Variable(('z', 'y', 'x'), wet_np + bump, {}),
            'hydro': Variable(('z', 'y', 'x'), hydro_np, {}),
            'proj': Variable((), np.int64(0), Geographic().to_cf()),
        }
        wm = WeatherCube(Dataset(coords=coords, variables=variables, attrs={}))
        hts = 100.0 * np.arange(n_slices)
        w, h = _build_cube_ray(wm, xq, yq, hts, los, Geographic(),
                               zref=float(zs[-1] - 1.0),
                               compute_dtype=np.float32)
        return float(np.nansum(np.asarray(w)))

    _ = run(0.0, 2)
    stage_report(reset=True)
    for k, n in ((1, 2), (2, 6), (3, 14), (4, 2)):
        t0 = time.perf_counter()
        _ = run(float(k) * 1e-4, n)
        print(f'{n} slices: {time.perf_counter() - t0:7.3f} s')
        print(json.dumps(stage_report(reset=True), indent=1))


if __name__ == '__main__':
    import sys as _s

    if '--engine' in _s.argv:
        engine_compare()
    else:
        main()
