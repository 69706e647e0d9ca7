"""ERA5 raw model-level parsing: _makeDataCubes -> calcgeoh -> full pipeline.

Exercises the path that normally only runs on live CDS downloads
(reference: ecmwf.py:58-111, utilFcns.py calcgeoh :781-859) using a
synthetic isothermal dry atmosphere where the hydrostatic integration has a
closed form under the reference's conventions: each layer's stored pressure
is its UPPER half-level (utilFcns.py:838), and the full-level geopotential
is phi = R_d T [ln(p0/p_lower) + alpha] with
alpha = 1 - (p_up/(p_low-p_up)) ln(p_low/p_up) (ln 2 at the top).
"""

import datetime as dt
import shutil

import numpy as np
import pytest

from raider_tpu.constants import R_D, _g0
from raider_tpu.io.ncdf import Dataset, Variable, write_nc
from raider_tpu.wx.registry import get_wm_by_name

T0 = 270.0
P0 = 101325.0
BBOX = np.array([33.0, 34.0, -118.0, -117.0])


@pytest.fixture
def raw_era5_file(tmp_path):
    """Raw ERA5 model-level netCDF: t/q on 137 levels + surface z/lnsp."""
    lats = np.arange(32.0, 35.01, 0.25)
    lons = np.arange(-120.0, -114.99, 0.25)
    nz, ny, nx = 137, lats.size, lons.size
    ds = Dataset(
        coords={
            'latitude': Variable(('latitude',), lats),
            'longitude': Variable(('longitude',), lons),
            'level': Variable(('level',), np.arange(1, nz + 1)),
        },
        variables={
            't': Variable(('level', 'latitude', 'longitude'),
                          np.full((nz, ny, nx), T0)),
            'q': Variable(('level', 'latitude', 'longitude'),
                          np.zeros((nz, ny, nx))),
            'z': Variable(('latitude', 'longitude'), np.zeros((ny, nx))),
            'lnsp': Variable(('latitude', 'longitude'),
                             np.full((ny, nx), np.log(P0))),
        },
    )
    path = tmp_path / 'raw_era5.nc'
    write_nc(ds, str(path))
    return str(path)


def test_model_level_hydrostatic_closure(raw_era5_file):
    """Loader output matches the closed-form hydrostatic integration of the
    isothermal atmosphere to float precision (~1e-11 relative)."""
    from raider_tpu.geodesy.gravity import geo_to_ht

    _, Model = get_wm_by_name('ERA5')
    m = Model()
    m.set_latlon_bounds(BBOX)
    m.load_weather(f=raw_era5_file)

    p = m._p[0, 0]    # (z,) bottom-up after the loader's flip
    zs = m._zs[0, 0]
    nz = p.size
    assert (np.diff(p) < 0).all(), 'pressure must decrease with height'
    assert (np.diff(zs) > 0).all(), 'heights must increase bottom-up'

    p_low = np.concatenate([[P0], p[:-1]])  # lower half-level of each layer
    with np.errstate(divide='ignore', invalid='ignore'):
        alpha = 1 - (p / (p_low - p)) * np.log(p_low / p)
    alpha[-1] = np.log(2)  # top-of-model special case (utilFcns.py:841-843)
    phi = R_D * T0 * (np.log(P0 / p_low) + alpha)
    zs_expect = np.asarray(geo_to_ht(np.full(nz, m._lats[0, 0]), phi / _g0))
    np.testing.assert_allclose(zs, zs_expect, rtol=1e-9)


def test_full_pipeline_ztd_analytic(raw_era5_file, tmp_path):
    """load() end to end on the raw file. The per-node ZTD integrates to the
    model top (the reference removed zmax trimming, weatherModel.py:371-403),
    so dry isothermal hydro ZTD ~ 1e-6 k1/T0 * p0 * H."""
    from raider_tpu.wx.base import make_raw_weather_data_filename

    _, Model = get_wm_by_name('ERA5')
    m = Model()
    m.set_latlon_bounds(BBOX)
    m.setTime(dt.datetime(2020, 1, 30, 14, 0, 0))
    m.set_wmLoc(str(tmp_path))
    shutil.copy(raw_era5_file,
                make_raw_weather_data_filename(str(tmp_path), m.Model(), m.getTime()))
    m.load()

    # wet is identically zero (q = 0)
    assert np.nanmax(np.abs(m._wet_ztd)) < 1e-6

    zl = m._zlevels
    i0 = int(np.searchsorted(zl, 0.0))
    assert zl[i0] == 0.0
    hydro = np.asarray(m._hydrostatic_ztd)[0, 0]

    # internal consistency: pipeline value == trapezoid of its own profile
    # (f32 refractivity storage bounds the match at ~1e-7)
    prof = 1e-6 * m._k1 * (m._p / m._t)[0, 0]
    manual = np.trapezoid(prof[i0:], zl[i0:])
    np.testing.assert_allclose(hydro[i0], manual, rtol=1e-6)

    # discretization truth: trapezoid on the NATIVE model levels (second
    # loader instance), extended flat over the 0..zs[0] surface gap
    m2 = Model()
    m2.set_latlon_bounds(BBOX)
    m2.load_weather(f=raw_era5_file)
    p_nat = np.asarray(m2._p[0, 0])
    z_nat = np.asarray(m2._zs[0, 0])
    native = np.trapezoid(1e-6 * m._k1 * p_nat / T0, z_nat) \
        + 1e-6 * m._k1 * p_nat[0] / T0 * z_nat[0]
    np.testing.assert_allclose(hydro[i0], native, rtol=1e-3)

    # physics: analytic integral of the barometric profile. The reference
    # pairs UPPER-half-level pressures with FULL-level heights
    # (utilFcns.py:838 vs :845), biasing the profile ~half a layer low in
    # ln(p) — about 1.4% on the isothermal column — so this is loose.
    H = R_D * T0 / _g0
    expected = 1e-6 * m._k1 / T0 * P0 * H * (1.0 - np.exp(-zl[-1] / H))
    np.testing.assert_allclose(hydro[i0], expected, rtol=2e-2)
    assert 2.0 < hydro[i0] < 2.5


def test_pressure_level_loader(tmp_path):
    """ERA5 pressure-level variant (reference: ecmwf.py:252-303): z/t/q on
    pressure levels, descending lats, 0-360 lons - all normalized."""
    lats = np.arange(35.0, 31.99, -0.25)          # descending like ECMWF
    lons = np.arange(240.0, 245.01, 0.25)         # 0-360 convention
    # CDS pressure-level files list levels in ascending hPa
    levels = np.array([100.0, 300.0, 500.0, 700.0, 850.0, 1000.0])
    nz, ny, nx = levels.size, lats.size, lons.size
    H = R_D * T0 / _g0
    z_m = -H * np.log(levels * 100.0 / P0)        # isothermal geopot heights
    z = np.broadcast_to((z_m * _g0)[:, None, None], (nz, ny, nx)).copy()
    ds = Dataset(
        coords={'latitude': Variable(('latitude',), lats),
                'longitude': Variable(('longitude',), lons),
                'level': Variable(('level',), levels)},
        variables={
            'z': Variable(('level', 'latitude', 'longitude'), z),
            't': Variable(('level', 'latitude', 'longitude'),
                          np.full((nz, ny, nx), T0)),
            'q': Variable(('level', 'latitude', 'longitude'),
                          np.zeros((nz, ny, nx))),
        },
    )
    path = tmp_path / 'raw_pl.nc'
    write_nc(ds, str(path))

    _, Model = get_wm_by_name('ERA5')
    m = Model()
    m.setLevelType('pl')
    m.set_latlon_bounds(BBOX)
    m.load_weather(f=str(path))
    zs = np.asarray(m._zs)
    p = np.asarray(m._p)
    assert np.all(np.diff(zs, axis=2) > 0), 'heights surface-to-top'
    assert np.all(np.diff(p, axis=2) < 0), 'pressure decreasing with height'
    # lons normalized to [-180, 180); lats ascending
    assert np.nanmax(m._lons) <= 180.0 and np.nanmin(m._lons) >= -180.0
    assert m._lats[0, 0] < m._lats[-1, 0]
    # isothermal consistency: the mid-level height matches the barometric form
    np.testing.assert_allclose(
        zs[0, 0], np.sort(z_m), rtol=5e-3)


@pytest.mark.parametrize('name,nz', [('ERAI', 60), ('HRES', 137)])
def test_other_ecmwf_model_level_loaders(tmp_path, name, nz):
    """ERA-I (60-level A/B) and HRES (137-level) share the model-level path
    with their own coefficient tables (reference: erai.py, hres.py)."""
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
                          np.zeros((nz, ny, nx))),
            'z': Variable(('latitude', 'longitude'), np.zeros((ny, nx))),
            'lnsp': Variable(('latitude', 'longitude'),
                             np.full((ny, nx), np.log(P0))),
        },
    )
    path = tmp_path / f'raw_{name}.nc'
    write_nc(ds, str(path))

    _, Model = get_wm_by_name(name)
    m = Model()
    m.setTime(dt.datetime(2018, 1, 30, 12, 0, 0))  # HRES: post-2013 -> 137 lvl
    m.set_latlon_bounds(BBOX)
    m.load_weather(f=str(path))
    assert m._p.shape[2] == nz
    assert np.all(np.diff(m._zs, axis=2) > 0)
    assert np.all(np.diff(m._p, axis=2) < 0)
    # hydrostatic scale: pressure at ~7.9 km should be ~ P0/e
    zcol = m._zs[0, 0]
    pcol = m._p[0, 0]
    H = R_D * T0 / _g0
    k = int(np.argmin(np.abs(zcol - H)))
    np.testing.assert_allclose(pcol[k], P0 * np.exp(-zcol[k] / H), rtol=0.06)
