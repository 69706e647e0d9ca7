"""Per-model end-to-end delay goldens: ERA5T / ERAI / HRES / MERRA2 / NCMR.

VERDICT r4 item 4: these five models had loader/metadata tests but no
end-to-end load() -> refractivity -> ZTD regression. The reference keeps
scenario-1 golden rasters per model (/root/reference/test/_scenario_1.py:
17-144) but never checked in the weather files that produce them, and the
reference code itself cannot run in this environment (xarray/pyproj are
not installed), so reference-GENERATED goldens are impossible offline.
Instead each model gets the strongest offline equivalent, three tiers on a
synthetic isothermal moist atmosphere in the model's native RAW format:

  (a) independent rebuild: the expected ZTD is recomputed IN-TEST from the
      loader's native-level columns with plain numpy (np.interp onto the
      model's uniform z ladder + np.trapezoid), touching none of the
      pipeline's interpolation/integration code - sub-mm agreement;
  (b) physics: the hydrostatic column integrates to ~1e-6*k1/T0*P0*H;
  (c) pinned digest: the exact pipeline outputs committed to 0.01 mm, so
      ANY numeric drift in load->e->refractivity->ZTD fails CI even where
      the analytic bounds are loose.

Raw formats (cited so parity is checkable):
  ECMWF family (ERA5T/ERAI/HRES): t/q on model levels + surface z/lnsp,
    heights rebuilt hydrostatically (reference ecmwf.py:58-111,
    utilFcns.py calcgeoh) - the same path test_ecmwf_raw.py closure-tests.
  MERRA2/NCMR: h/q/p/t cubes (the intermediate their _fetch writes from
    OpenDAP; reference merra2.py:140-178, ncmr.py:201-242).
  WRF: a raw wrfout prognostic file (PH/PHB/T/P/PB/QVAPOR; rh humidity
    type) through the single-file reader (wx/wrf.py).
"""

import datetime as dt
import shutil

import numpy as np
import pytest

from raider_tpu.constants import R_D, _g0
from raider_tpu.io.ncdf import Dataset, Variable, write_nc
from raider_tpu.wx.base import find_svp, make_raw_weather_data_filename
from raider_tpu.wx.registry import get_wm_by_name

T0 = 270.0
P0 = 101325.0
Q0 = 0.004          # constant specific humidity: exercises the wet path
BBOX = np.array([33.0, 34.0, -118.0, -117.0])

# tier (c): pipeline hydro/wet ZTD at the z=0 ladder node, (0,0) column,
# committed from the verified state (abs tol 1e-5 m = 0.01 mm). These pin
# the NUMBERS, tiers (a)/(b) pin that the numbers are RIGHT.
DIGEST = {
    'ERA5T': (2.273892, 0.254148),
    'ERAI': (2.215347, 0.248294),
    'HRES': (2.273796, 0.254137),
    'MERRA2': (2.308765, 0.257483),
    'NCMR': (2.309069, 0.258282),
    'WRF': (2.177287, 0.253182),
}

CASES = {
    'ERA5T': dict(kind='ecmwf', nz=137, time=dt.datetime(2020, 1, 30, 14)),
    'ERAI': dict(kind='ecmwf', nz=60, time=dt.datetime(2018, 1, 30, 12)),
    # post-2013 epoch selects the 137-level table (wx/ecmwf.py level switch)
    'HRES': dict(kind='ecmwf', nz=137, time=dt.datetime(2018, 1, 30, 12)),
    'MERRA2': dict(kind='hqpt', z_top_first=True,
                   time=dt.datetime(2020, 1, 30, 12)),
    'NCMR': dict(kind='hqpt', z_top_first=False,
                 time=dt.datetime(2018, 7, 30, 12)),
    'WRF': dict(kind='wrfout', time=dt.datetime(2020, 1, 30, 12)),
}


def _write_ecmwf_raw(path, nz):
    """t/q on model levels + surface z/lnsp (CDS model-level download)."""
    lats = np.arange(32.0, 35.01, 0.5)
    lons = np.arange(-120.0, -114.99, 0.5)
    ny, nx = lats.size, lons.size
    ds = Dataset(
        coords={'latitude': Variable(('latitude',), lats),
                'longitude': Variable(('longitude',), lons),
                'level': Variable(('level',), np.arange(1, nz + 1))},
        variables={
            't': Variable(('level', 'latitude', 'longitude'),
                          np.full((nz, ny, nx), T0)),
            'q': Variable(('level', 'latitude', 'longitude'),
                          np.full((nz, ny, nx), Q0)),
            'z': Variable(('latitude', 'longitude'), np.zeros((ny, nx))),
            'lnsp': Variable(('latitude', 'longitude'),
                             np.full((ny, nx), np.log(P0))),
        })
    write_nc(ds, str(path))


def _write_hqpt_raw(path, z_top_first):
    """h/q/p/t cubes (the MERRA2/NCMR intermediate). Barometric pressure on
    an explicit height grid reaching above the 137-level ladder top so the
    uniform-z interpolation never extrapolates."""
    lats = np.arange(32.0, 35.01, 0.5)
    lons = np.arange(-120.0, -114.99, 0.5)
    ny, nx = lats.size, lons.size
    z = np.concatenate([np.linspace(0.0, 20000.0, 41),
                        np.linspace(21000.0, 85000.0, 33)])
    H = R_D * T0 * (1.0 + 0.61 * Q0) / _g0      # virtual-T scale height
    p = P0 * np.exp(-z / H)
    nzl = z.size
    cube = np.broadcast_to(p[:, None, None], (nzl, ny, nx)).copy()
    hcube = np.broadcast_to(z[:, None, None], (nzl, ny, nx)).copy()
    if z_top_first:        # MERRA2 raw stores top-down; the loader flips
        cube = cube[::-1].copy()
        hcube = hcube[::-1].copy()
    ds = Dataset(
        coords={'latitude': Variable(('latitude',), lats),
                'longitude': Variable(('longitude',), lons),
                'level': Variable(('level',), np.arange(nzl))},
        variables={
            'h': Variable(('level', 'latitude', 'longitude'), hcube),
            'p': Variable(('level', 'latitude', 'longitude'), cube),
            't': Variable(('level', 'latitude', 'longitude'),
                          np.full((nzl, ny, nx), T0)),
            'q': Variable(('level', 'latitude', 'longitude'),
                          np.full((nzl, ny, nx), Q0)),
        })
    write_nc(ds, str(path))


def _write_wrfout_raw(path):
    """Raw wrfout prognostic file: staggered geopotential, base+perturbation
    pressure, potential-temperature perturbation chosen so the FULL
    temperature is exactly T0 (Poisson inverted), constant QVAPOR."""
    from scipy.io import netcdf_file

    lats = np.arange(32.0, 35.01, 0.5)
    lons = np.arange(-120.0, -114.99, 0.5)
    ny, nx = lats.size, lons.size
    nz = 60
    g0 = 9.8066
    zstag = np.linspace(0.0, 30000.0, nz + 1)
    z_mass = 0.5 * (zstag[:-1] + zstag[1:])
    H = R_D * T0 / _g0
    p_full = P0 * np.exp(-z_mass / H)
    theta = T0 * (1e5 / p_full) ** 0.2854          # Poisson inverse
    qv = 0.004

    with netcdf_file(str(path), 'w') as f:
        f.TRUELAT1 = 30.0
        f.TRUELAT2 = 60.0
        f.MOAD_CEN_LAT = 33.5
        f.STAND_LON = -117.5
        f.createDimension('Time', 1)
        f.createDimension('bottom_top', nz)
        f.createDimension('bottom_top_stag', nz + 1)
        f.createDimension('south_north', ny)
        f.createDimension('west_east', nx)

        def var(name, dims, data):
            v = f.createVariable(name, 'f8', dims)
            v[:] = data

        lat2 = np.broadcast_to(lats[:, None], (ny, nx))
        lon2 = np.broadcast_to(lons[None, :], (ny, nx))
        var('XLAT', ('Time', 'south_north', 'west_east'), lat2[None])
        var('XLONG', ('Time', 'south_north', 'west_east'), lon2[None])
        var('PH', ('Time', 'bottom_top_stag', 'south_north', 'west_east'),
            np.zeros((1, nz + 1, ny, nx)))
        var('PHB', ('Time', 'bottom_top_stag', 'south_north', 'west_east'),
            np.broadcast_to((zstag * g0)[None, :, None, None],
                            (1, nz + 1, ny, nx)).copy())
        var('T', ('Time', 'bottom_top', 'south_north', 'west_east'),
            np.broadcast_to((theta - 300.0)[None, :, None, None],
                            (1, nz, ny, nx)).copy())
        var('P', ('Time', 'bottom_top', 'south_north', 'west_east'),
            np.zeros((1, nz, ny, nx)))
        var('PB', ('Time', 'bottom_top', 'south_north', 'west_east'),
            np.broadcast_to(p_full[None, :, None, None],
                            (1, nz, ny, nx)).copy())
        var('QVAPOR', ('Time', 'bottom_top', 'south_north', 'west_east'),
            np.full((1, nz, ny, nx), qv))


def _load_pipeline(name, case, tmp_path):
    _, Model = get_wm_by_name(name)
    m = Model()
    m.setTime(case['time'])
    m.set_latlon_bounds(BBOX)
    m.set_wmLoc(str(tmp_path))
    raw = tmp_path / 'raw.nc'
    if case['kind'] == 'ecmwf':
        _write_ecmwf_raw(raw, case['nz'])
    elif case['kind'] == 'wrfout':
        _write_wrfout_raw(raw)
    else:
        _write_hqpt_raw(raw, case['z_top_first'])
    shutil.copy(raw, make_raw_weather_data_filename(
        str(tmp_path), m.Model(), m.getTime()))
    m.load()
    return m, Model


def _native_columns(name, case, tmp_path):
    """A SECOND loader instance stopped before the uniform-z resampling:
    its native-level (z, p, t, e-inputs) columns are the raw truth the
    pipeline then interpolates/integrates."""
    _, Model = get_wm_by_name(name)
    m2 = Model()
    m2.setTime(case['time'])
    m2.set_latlon_bounds(BBOX)
    m2.load_weather(f=str(tmp_path / 'raw.nc'))
    z = np.asarray(m2._zs[0, 0], dtype=np.float64)
    p = np.asarray(m2._p[0, 0], dtype=np.float64)
    t = np.asarray(m2._t[0, 0], dtype=np.float64)
    svp = np.asarray(find_svp(t), dtype=np.float64)
    if m2._humidityType == 'rh':        # WRF: e = rh/100 * svp
        e = np.asarray(m2._rh[0, 0], dtype=np.float64) / 100.0 * svp
    else:                               # q models: w = q/(1-q); e = w Rv (p-svp)/Rd
        q = np.asarray(m2._q[0, 0], dtype=np.float64)
        e = (q / (1 - q)) * m2._R_v * (p - svp) / m2._R_d
    return z, p, t, e, m2


@pytest.mark.parametrize('name', sorted(CASES))
def test_model_delay_golden(name, tmp_path):
    case = CASES[name]
    m, _ = _load_pipeline(name, case, tmp_path)

    # _zs IS the uniform ladder after _uniform_in_z (+ the zmin pad row
    # _adjust_grid inserts); _zlevels is None for models without a fixed
    # ladder (MERRA2 uses the column-mean of its native heights)
    zl = np.asarray(m._zs, dtype=np.float64)
    # first ladder node at/above the surface (ERAI's 25-level ladder has no
    # exact 0 node - 9.4 m; WRF's column-mean ladder starts at its lowest
    # mass level, 250 m for the fixture's 500 m staggered grid)
    i0 = int(np.searchsorted(zl, 0.0))
    assert 0.0 <= zl[i0] < 300.0
    hydro = float(np.asarray(m._hydrostatic_ztd)[0, 0][i0])
    wet = float(np.asarray(m._wet_ztd)[0, 0][i0])

    # ---- tier (a): independent numpy rebuild from native-level columns.
    # e from q exactly as the reference: w = q/(1-q);
    # e = w R_v (p - svp) / R_d (weatherModel.py _find_e_from_q)
    z_nat, p_nat, t_nat, e_nat, m2 = _native_columns(name, case, tmp_path)
    hyd_n = 1e-6 * m._k1 * p_nat / t_nat
    wet_n = 1e-6 * (m._k2 * e_nat / t_nat + m._k3 * e_nat / t_nat**2)
    # the pipeline linearly interpolates native columns onto the ladder
    # (flat beyond the native range, like its fillna) then trapezoids;
    # np.interp + np.trapezoid rebuild that with zero shared code
    hyd_l = np.interp(zl, z_nat, hyd_n)
    wet_l = np.interp(zl, z_nat, wet_n)
    exp_hydro = float(np.trapezoid(hyd_l[i0:], zl[i0:]))
    exp_wet = float(np.trapezoid(wet_l[i0:], zl[i0:]))
    # f32 refractivity storage + the surface-gap fill handling bound the
    # match; measured ~1e-5 class, asserted at 0.5 mm
    assert abs(hydro - exp_hydro) < 5e-4, (hydro, exp_hydro)
    assert abs(wet - exp_wet) < 5e-4, (wet, exp_wet)

    # ---- tier (b): physics. Analytic isothermal column (loose: the
    # reference pairs upper-half-level pressures with full-level heights,
    # biasing ECMWF columns ~1.4%; see test_ecmwf_raw.py)
    H = R_D * T0 * (1.0 + 0.61 * Q0) / _g0
    if CASES[name]['kind'] == 'wrfout':      # dry-scale-height column
        H = R_D * T0 / _g0
    approx = (1e-6 * m._k1 / T0 * P0 * H
              * (np.exp(-zl[i0] / H) - np.exp(-zl[-1] / H)))
    # ERAI measures ~4% low: the ECMWF upper-half-level pairing bias
    # (~1.4%, test_ecmwf_raw.py) compounds on its 60-level grid + 25-node
    # ladder; correctness at mm-scale is tiers (a)/(c), this is physics
    np.testing.assert_allclose(hydro, approx, rtol=6e-2)
    assert 2.0 < hydro < 2.5
    # e ~ 650 Pa at the surface for q=0.004 -> ~0.25 m wet column
    assert 0.1 < wet < 0.5

    # ---- tier (c): pinned digest - ANY drift in the load -> e ->
    # refractivity -> uniform-z -> ZTD chain fails here first
    exp = DIGEST[name]
    assert abs(hydro - exp[0]) < 1e-5, f'{name} hydro {hydro:.6f} != {exp[0]}'
    assert abs(wet - exp[1]) < 1e-5, f'{name} wet {wet:.6f} != {exp[1]}'


def test_era5t_matches_era5_numerics(tmp_path):
    """ERA5T is ERA5 with a different dataset tag (reference era5t.py): the
    numeric pipeline must be identical on the same raw bytes."""
    case = CASES['ERA5T']
    m_t, _ = _load_pipeline('ERA5T', case, tmp_path)
    sub = tmp_path / 'era5'
    sub.mkdir()
    m_5, _ = _load_pipeline('ERA5', dict(case), sub)
    np.testing.assert_array_equal(np.asarray(m_t._hydrostatic_ztd),
                                  np.asarray(m_5._hydrostatic_ztd))
    np.testing.assert_array_equal(np.asarray(m_t._wet_ztd),
                                  np.asarray(m_5._wet_ztd))
