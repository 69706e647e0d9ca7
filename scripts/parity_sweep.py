"""Randomized multi-scene device-geometry parity sweep (run on real TPU).

The cross-backend drive validates ONE real ERA5 scene at ~75-deg incidence.
This sweep stresses the df64 + Chebyshev-surrogate geometry across the input
space: random orbit altitudes/geometries (incidence ~15-55 deg at the
targets), geographic and projected (UTM) weather CRSs, uneven z grids,
varying output heights, and off-nadir query boxes. Each scene runs the
production ``_build_cube_ray`` twice - host-f64 geometry vs on-device
geometry - and reports the max |delay delta|.

Pass/fail bar: 0.1 mm per scene - the framework's documented parity promise
(README "sub-0.1 mm of the reference semantics"). The single-scene drive
measures 0.014 mm; adversarial coarse-z scenes measure up to ~0.06 mm, the
same level the all-per-slice-plans mode (RAIDER_TPU_CUBE_PLAN=0) shows, i.e.
the intrinsic device-vs-host float path difference at 2 km cells, not a
sampling-plan divergence (which the engine now corrects per slice; it was
~1 mm before the r2 fix).
"""

import datetime as dt
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / 'tests'))


def make_orbit(rng, t_ref):
    from raider_tpu.geometry.orbit import Orbit

    alt = rng.uniform(500e3, 800e3)
    inc = np.deg2rad(rng.uniform(60.0, 120.0))
    phase = rng.uniform(-0.02, 0.02)
    descending = bool(rng.integers(0, 2))
    tt = np.arange(-600.0, 601.0, 30.0)
    r_orb = 6378137.0 + alt
    om = 2.0 * np.pi / (5400.0 + alt / 1e3)
    ang = om * tt + phase
    pos = np.stack([
        r_orb * np.cos(ang),
        r_orb * np.sin(ang) * np.cos(inc),
        r_orb * np.sin(ang) * np.sin(inc),
    ], -1)
    if descending:
        pos = pos[::-1].copy()
    vel = np.gradient(pos, 30.0, axis=0)
    # latitude band the sub-satellite track covers with margin: targets
    # outside it have no zero-Doppler crossing inside the statevector span
    # (geo2rdr correctly NaNs them - see orbit.geo2rdr - but a scene that is
    # ENTIRELY out of coverage is not a valid acquisition to sweep)
    lat_cov = np.rad2deg(np.arcsin(abs(np.sin(om * 520.0) * np.sin(inc))))
    return Orbit(times=tt, pos=pos, vel=vel, ref_time=t_ref), lat_cov


def make_scene(rng, idx):
    """Returns (wm, xq, yq, hts, los, zref, label)."""
    from raider_tpu.delay.engine import WeatherCube
    from raider_tpu.geodesy.crs import Geographic, TransverseMercator
    from raider_tpu.geometry.los import Raytracing
    from raider_tpu.io.ncdf import Dataset, Variable

    t_ref = dt.datetime(2020, 1, 1, 12, 0, 0)
    orbit, lat_cov = make_orbit(rng, t_ref)

    nz = int(rng.integers(20, 60))
    ny = nx = int(rng.integers(40, 90))
    # uneven z spacing, random top
    top = rng.uniform(18000.0, 30000.0)
    zs = -500.0 + (top + 500.0) * np.linspace(0, 1, nz) ** rng.uniform(1.0, 1.8)

    # ground swath: offset from the (polar-ish) ground track by a random
    # cross-track distance -> incidence ~15-55 deg
    # the orbit's ground track runs along lon 0 (polar-ish); latitude spans
    # both hemispheres within the track's covered band and the cross-track
    # offset reaches ~55-deg zenith
    lim = min(0.8 * lat_cov, 62.0)
    lat_c = rng.uniform(-lim, lim)
    cross_deg = rng.uniform(1.5, 6.0)
    lon_c = cross_deg
    half = rng.uniform(0.8, 1.8)
    use_utm = idx % 2 == 1
    ys_wm = np.linspace(lat_c - 2 * half, lat_c + 2 * half, ny)
    xs_wm = np.linspace(lon_c - 2 * half, lon_c + 2 * half, nx)
    wet = rng.uniform(0.1, 100.0, (nz, ny, nx))
    hydro = rng.uniform(50.0, 300.0, (nz, ny, nx))
    if use_utm:
        zone = int((lon_c + 180) // 6) + 1
        crs = TransverseMercator(lon_0=zone * 6 - 183, utm_zone=zone,
                                 utm_south=lat_c < 0)
        # model axes in UTM meters covering the same patch
        from raider_tpu.geodesy import transform_points
        gx, gy, _ = transform_points(Geographic(), crs,
                                     np.array([xs_wm[0], xs_wm[-1]]),
                                     np.array([ys_wm[0], ys_wm[-1]]),
                                     np.zeros(2))
        xs_m = np.linspace(float(np.asarray(gx)[0]), float(np.asarray(gx)[1]), nx)
        ys_m = np.linspace(float(np.asarray(gy)[0]), float(np.asarray(gy)[1]), ny)
        coords = {'x': Variable(('x',), xs_m, {}),
                  'y': Variable(('y',), ys_m, {}),
                  'z': Variable(('z',), zs, {})}
    else:
        crs = Geographic()
        coords = {'x': Variable(('x',), xs_wm, {}),
                  'y': Variable(('y',), ys_wm, {}),
                  'z': Variable(('z',), zs, {})}
    variables = {
        'wet': Variable(('z', 'y', 'x'), wet, {}),
        'hydro': Variable(('z', 'y', 'x'), hydro, {}),
        'proj': Variable((), np.int64(0), crs.to_cf()),
    }
    wm = WeatherCube(Dataset(coords=coords, variables=variables, attrs={}))

    n_side = int(rng.integers(12, 28))
    yq = np.linspace(lat_c - half, lat_c + half, n_side)
    xq = np.linspace(lon_c - half, lon_c + half, n_side + 3)
    n_h = int(rng.integers(2, 5))
    hts = np.sort(rng.uniform(0.0, 4000.0, n_h))
    zref = float(min(rng.uniform(15000.0, 26000.0), zs[-1] - 1.0))
    los = Raytracing(orbit=orbit, time=t_ref)
    label = (f'scene{idx}: nz={nz} grid={ny}x{nx} crs='
             f'{"UTM" if use_utm else "geo"} cross={cross_deg:.1f}deg '
             f'n_h={n_h} zref={zref:.0f}')
    return wm, xq, yq, hts, los, zref, label


def make_lcc_scene(rng):
    """HRRR-CONUS regime: Lambert conformal conic on the NCEP sphere
    (lat_0 = lat_1 = lat_2 = 38.5, lon_0 = 262.5 — reference
    models/hrrr.py:18-21) with the output grid at the domain's western
    edge (~113W, far from the central meridian, where the absolute
    projected x approaches -2e6 m and theta = n*dlon magnifies longitude
    representation noise). Exercises: projected-CRS containment in LCC
    meters and the f32 LCC forward under the origin-relative frame.
    Returns the same tuple shape as make_scene.
    """
    from raider_tpu.delay.engine import WeatherCube
    from raider_tpu.geodesy import transform_points
    from raider_tpu.geodesy.crs import Geographic
    from raider_tpu.geometry.los import Raytracing
    from raider_tpu.geometry.orbit import Orbit
    from raider_tpu.io.ncdf import Dataset, Variable
    from raider_tpu.wx.hrrr import HRRR_CONUS_PROJ

    t_ref = dt.datetime(2020, 1, 1, 12, 0, 0)
    # near-polar orbit over (40N, 247E), heading north (same construction
    # as the antimeridian scene): base track rotated to lat 40 then lon 247
    alt = rng.uniform(550e3, 750e3)
    tt = np.arange(-600.0, 601.0, 30.0)
    r_orb = 6378137.0 + alt
    om = 2.0 * np.pi / (5400.0 + alt / 1e3)
    ang = om * tt
    base = np.stack([r_orb * np.cos(ang), np.zeros_like(ang),
                     r_orb * np.sin(ang)], -1)
    th = np.deg2rad(-40.0)
    ry = np.array([[np.cos(th), 0.0, np.sin(th)],
                   [0.0, 1.0, 0.0],
                   [-np.sin(th), 0.0, np.cos(th)]])
    ph = np.deg2rad(247.0)
    rz = np.array([[np.cos(ph), -np.sin(ph), 0.0],
                   [np.sin(ph), np.cos(ph), 0.0],
                   [0.0, 0.0, 1.0]])
    pos = base @ ry.T @ rz.T
    vel = np.gradient(pos, 30.0, axis=0)
    orbit = Orbit(times=tt, pos=pos, vel=vel, ref_time=t_ref)

    # weather grid in LCC METERS covering 246..252.5E, 37.5..42.5N
    # (generous slant margin east of the track)
    lon_b = np.linspace(246.0, 252.5, 41)
    lat_b = np.linspace(37.5, 42.5, 41)
    blon = np.concatenate([lon_b, lon_b, np.full(41, lon_b[0]),
                           np.full(41, lon_b[-1])])
    blat = np.concatenate([np.full(41, lat_b[0]), np.full(41, lat_b[-1]),
                           lat_b, lat_b])
    gx, gy, _ = transform_points(Geographic(), HRRR_CONUS_PROJ,
                                 blon, blat, np.zeros_like(blon))
    gx, gy = np.asarray(gx), np.asarray(gy)
    nz, ny, nx = 30, 52, 52
    top = rng.uniform(19000.0, 26000.0)
    zs = -500.0 + (top + 500.0) * np.linspace(0, 1, nz) ** 1.4
    xs_m = np.linspace(gx.min(), gx.max(), nx)
    ys_m = np.linspace(gy.min(), gy.max(), ny)
    wet = rng.uniform(0.1, 100.0, (nz, ny, nx))
    hydro = rng.uniform(50.0, 300.0, (nz, ny, nx))
    wm = WeatherCube(Dataset(
        coords={'x': Variable(('x',), xs_m, {}),
                'y': Variable(('y',), ys_m, {}),
                'z': Variable(('z',), zs, {})},
        variables={'wet': Variable(('z', 'y', 'x'), wet, {}),
                   'hydro': Variable(('z', 'y', 'x'), hydro, {}),
                   'proj': Variable((), np.int64(0), HRRR_CONUS_PROJ.to_cf())},
        attrs={}))

    yq = np.linspace(39.0, 40.2, 12)
    xq = np.linspace(-112.9, -111.5, 15)
    hts = np.array([0.0, 1200.0, 3000.0])
    zref = float(min(18000.0, zs[-1] - 1.0))
    los = Raytracing(orbit=orbit, time=t_ref)
    label = ('lcc-CONUS: LCC-NCEP grid '
             f'{ny}x{nx} xq 112.9..111.5W zref={zref:.0f}')
    return wm, xq, yq, hts, los, zref, label


def make_antimeridian_scene(rng):
    """HRRR-Alaska regime: polar-stereographic weather CRS on the NCEP
    sphere (lat_0=90, lon_0=225, lat_ts=60 — reference models/hrrr.py:22-25)
    with the output grid CROSSING the +/-180 antimeridian at ~60N (the
    Aleutian edge of the AK domain, reference hrrr.py:284-356 casting /
    containment). Exercises: lon>180 query coordinates, inverse-projection
    lon normalization along ray chains, and projected-CRS containment with
    no geographic wrap seam (the grid is continuous in stereo meters).
    Returns the same tuple shape as make_scene.
    """
    from raider_tpu.delay.engine import WeatherCube
    from raider_tpu.geodesy import transform_points
    from raider_tpu.geodesy.crs import Geographic
    from raider_tpu.geometry.los import Raytracing
    from raider_tpu.geometry.orbit import Orbit
    from raider_tpu.io.ncdf import Dataset, Variable
    from raider_tpu.wx.hrrr import HRRR_AK_PROJ

    t_ref = dt.datetime(2020, 1, 1, 12, 0, 0)
    # near-polar circular orbit whose t=0 subsatellite point is (60N, 176E),
    # heading north: base track in the lon-0 meridian plane rotated up to
    # lat 60 (Ry) then around to lon 176 (Rz). The scene at lon 179.2-180.8
    # is then ~1.6-2.4 deg cross-track (incidence ~25-45 deg), east of the
    # track, with the zero-Doppler crossing near t=0 for every target.
    alt = rng.uniform(550e3, 750e3)
    tt = np.arange(-600.0, 601.0, 30.0)
    r_orb = 6378137.0 + alt
    om = 2.0 * np.pi / (5400.0 + alt / 1e3)
    ang = om * tt
    base = np.stack([r_orb * np.cos(ang), np.zeros_like(ang),
                     r_orb * np.sin(ang)], -1)
    th = np.deg2rad(-60.0)
    ry = np.array([[np.cos(th), 0.0, np.sin(th)],
                   [0.0, 1.0, 0.0],
                   [-np.sin(th), 0.0, np.cos(th)]])
    ph = np.deg2rad(176.0)
    rz = np.array([[np.cos(ph), -np.sin(ph), 0.0],
                   [np.sin(ph), np.cos(ph), 0.0],
                   [0.0, 0.0, 1.0]])
    pos = base @ ry.T @ rz.T
    vel = np.gradient(pos, 30.0, axis=0)
    orbit = Orbit(times=tt, pos=pos, vel=vel, ref_time=t_ref)

    # weather grid in stereo METERS covering lon 177..183E/W, lat 58..62.5
    # (generous slant margin); projected bounding box over the boundary
    lon_b = np.linspace(177.0, 183.0, 41)
    lat_b = np.linspace(58.0, 62.5, 41)
    blon = np.concatenate([lon_b, lon_b, np.full(41, lon_b[0]),
                           np.full(41, lon_b[-1])])
    blat = np.concatenate([np.full(41, lat_b[0]), np.full(41, lat_b[-1]),
                           lat_b, lat_b])
    gx, gy, _ = transform_points(Geographic(), HRRR_AK_PROJ,
                                 blon, blat, np.zeros_like(blon))
    gx, gy = np.asarray(gx), np.asarray(gy)
    nz, ny, nx = 30, 52, 52
    top = rng.uniform(19000.0, 26000.0)
    zs = -500.0 + (top + 500.0) * np.linspace(0, 1, nz) ** 1.4
    xs_m = np.linspace(gx.min(), gx.max(), nx)
    ys_m = np.linspace(gy.min(), gy.max(), ny)
    wet = rng.uniform(0.1, 100.0, (nz, ny, nx))
    hydro = rng.uniform(50.0, 300.0, (nz, ny, nx))
    wm = WeatherCube(Dataset(
        coords={'x': Variable(('x',), xs_m, {}),
                'y': Variable(('y',), ys_m, {}),
                'z': Variable(('z',), zs, {})},
        variables={'wet': Variable(('z', 'y', 'x'), wet, {}),
                   'hydro': Variable(('z', 'y', 'x'), hydro, {}),
                   'proj': Variable((), np.int64(0), HRRR_AK_PROJ.to_cf())},
        attrs={}))

    yq = np.linspace(59.5, 60.5, 12)
    xq = np.linspace(179.2, 180.8, 15)          # crosses the antimeridian
    hts = np.array([0.0, 1200.0, 3000.0])
    zref = float(min(18000.0, zs[-1] - 1.0))
    los = Raytracing(orbit=orbit, time=t_ref)
    label = ('antimeridian-AK: stereo-NCEP grid '
             f'{ny}x{nx} xq 179.2..180.8E zref={zref:.0f}')
    return wm, xq, yq, hts, los, zref, label


# Per-scene pass bars [mm]: every scene class holds the 0.1 mm README
# promise. The antimeridian-AK scene carried a diagnosed 0.15 mm class bar
# through most of round 5 (absolute-frame f32 coordinate entry ~0.25-1.7 m
# /ulp, amplified by the NCEP-stereo 60N magnification into a measured
# 0.067-0.101 mm spread across seeds); the origin-relative frame + df64
# sphere-stereo transform (device_geom._stereo_rel_from_df) removed the
# term — re-measured 0.0246 mm worst across 5 seeds on a v5e
# (scripts/antimeridian_soak.py, 2026-08-20), so the class bar is retired.
_BAR_DEFAULT_MM = 0.1
_BAR_ANTIMERIDIAN_MM = 0.1


def main():
    import raider_tpu  # noqa: F401
    from raider_tpu.delay.engine import _build_cube_ray
    from raider_tpu.geodesy.crs import Geographic

    n_scenes = int(os.environ.get('SWEEP_SCENES', '6'))
    rng = np.random.default_rng(int(os.environ.get('SWEEP_SEED', '11')))
    worst = 0.0
    failures = []
    scenes = [make_scene(rng, idx) for idx in range(n_scenes)]
    scenes.append(make_antimeridian_scene(rng))   # always: HRRR-AK regime
    scenes.append(make_lcc_scene(rng))            # always: HRRR-CONUS regime
    for wm, xq, yq, hts, los, zref, label in scenes:
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
            if not (np.isnan(a) == np.isnan(b)).all():
                failures.append(f'{label}: NaN masks differ')
            d = np.abs(a - b)
            deltas.append(np.nanmax(d) if np.isfinite(d).any() else 0.0)
        delta_mm = 1e3 * float(max(deltas))
        worst = max(worst, delta_mm)
        bar = (_BAR_ANTIMERIDIAN_MM if label.startswith('antimeridian')
               else _BAR_DEFAULT_MM)
        status = 'ok' if delta_mm < bar else 'FAIL'
        if status == 'FAIL':
            failures.append(f'{label}: {delta_mm:.4f} mm (bar {bar})')
        print(f'{label}: max|d|={delta_mm:.4f} mm [{status}, bar {bar}] '
              f'({time.perf_counter() - t0:.0f}s)', flush=True)
    print(f'worst across {len(scenes)} scenes: {worst:.4f} mm', flush=True)
    if failures:
        print('FAILURES:\n' + '\n'.join(failures), flush=True)
        sys.exit(1)
    print('PARITY SWEEP OK', flush=True)


if __name__ == '__main__':
    main()
