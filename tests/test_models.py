"""Weather-model classes: metadata, registry, coverage logic (offline).

Mirrors the reference's offline model tests (test/test_weather_model.py:267-370).
"""

import datetime as dt

import numpy as np
import pytest

from raider_tpu.geodesy import Geographic, LambertConformalConic, PolarStereographic
from raider_tpu.wx.registry import ALLOWED_MODELS, get_wm_by_name


@pytest.mark.parametrize('name', ['ERA5', 'ERA5T', 'ERAI', 'HRES', 'HRRR',
                                  'HRRRAK', 'GMAO', 'MERRA2', 'NCMR'])
def test_instantiate_and_metadata(name):
    _, Model = get_wm_by_name(name)
    m = Model()
    # refractivity constants are set
    assert m._k1 is not None and m._k2 is not None and m._k3 is not None
    assert m._k1 == pytest.approx(0.776)
    # humidity type valid
    assert m._humidityType in ('q', 'rh')
    # valid range sane
    start, end = m._valid_range
    assert start.tzinfo is not None
    assert start < dt.datetime(2021, 1, 1, tzinfo=dt.timezone.utc)
    # resolution defined
    assert m._lat_res is not None and m._lat_res > 0


def test_registry_name_normalization():
    for alias in ('ERA-5', 'era5', 'Era-5'):
        _, Model = get_wm_by_name(alias)
        assert Model().Model() == 'ERA-5'
    with pytest.raises(ModuleNotFoundError):
        get_wm_by_name('NOTAMODEL')
    assert 'HRRR' in ALLOWED_MODELS


def test_model_projections():
    _, era5 = get_wm_by_name('ERA5')
    assert isinstance(era5()._proj, Geographic)
    _, hrrr = get_wm_by_name('HRRR')
    assert isinstance(hrrr()._proj, LambertConformalConic)
    _, hrrrak = get_wm_by_name('HRRRAK')
    assert isinstance(hrrrak()._proj, PolarStereographic)


def test_era5_time_checks():
    _, Model = get_wm_by_name('ERA5')
    m = Model()
    from raider_tpu.wx.exceptions import DatetimeOutsideRange

    m.checkTime(dt.datetime(2020, 1, 1))
    with pytest.raises(DatetimeOutsideRange):
        m.checkTime(dt.datetime(1940, 1, 1))
    with pytest.raises(DatetimeOutsideRange):
        m.checkTime(dt.datetime.now())  # inside the 3-month lag


def test_erai_fixed_range():
    _, Model = get_wm_by_name('ERAI')
    m = Model()
    from raider_tpu.wx.exceptions import DatetimeOutsideRange

    m.checkTime(dt.datetime(2015, 6, 1))
    with pytest.raises(DatetimeOutsideRange):
        m.checkTime(dt.datetime(2020, 1, 1))  # after 2019-08-31


def test_hres_level_switch():
    _, Model = get_wm_by_name('HRES')
    m = Model()
    assert m._levels == 137
    m.update_a_b()
    assert m._levels == 91
    assert len(m._a) == 92 and len(m._b) == 92


def test_hrrr_coverage_and_cast():
    _, Model = get_wm_by_name('HRRR')
    m = Model()
    # CONUS box: stays HRRR
    m.checkValidBounds(np.array([36.0, 37.0, -92.0, -91.0]))
    assert m.Model() == 'HRRR'
    # Alaska box: auto-casts to HRRR-AK
    m2 = Model()
    m2.checkValidBounds(np.array([64.0, 66.0, -150.0, -148.0]))
    assert m2.Model() == 'HRRR-AK'
    # middle of the Pacific: rejected
    m3 = Model()
    with pytest.raises(ValueError):
        m3.checkValidBounds(np.array([0.0, 2.0, -150.0, -148.0]))


def test_set_latlon_bounds_buffering():
    _, Model = get_wm_by_name('ERA5')
    m = Model()
    m.set_latlon_bounds(np.array([33.0, 34.0, -118.0, -117.0]))
    S, N, W, E = m.get_latlon_bounds()
    assert S < 33.0 and N > 34.0 and W < -118.0 and E > -117.0


def test_level_tables_loaded():
    from raider_tpu.wx import levels

    assert levels.LEVELS_137_HEIGHTS.shape == (145,)
    assert levels.A_137_ERA5.shape == (138,)
    assert levels.LEVELS_50_HEIGHTS.shape == (57,)
    # heights descend from ~80 km; A/B are half-level coefficients
    assert levels.LEVELS_137_HEIGHTS[0] > 70000
    assert levels.B_137_ERA5[-1] == 1.0


def test_raster_rdr_aoi_on_reference_files():
    """RasterRDR AOI reads the reference's ISCE lat/lon rasters (ENVI)."""
    from tests.conftest import REFERENCE_DIR

    lat = REFERENCE_DIR / 'test' / 'scenario_6' / 'lat.rdr'
    lon = REFERENCE_DIR / 'test' / 'scenario_6' / 'lon.rdr'
    if not lat.exists():
        pytest.skip('reference rasters unavailable')
    from raider_tpu.geometry.aoi import RasterRDR

    aoi = RasterRDR(str(lat), str(lon))
    lats, lons = aoi.readLL()
    assert np.isfinite(lats).any() and np.isfinite(lons).any()
    s, n, w, e = aoi.bounds()
    assert -90 < s < n < 90 and -180 < w < e < 180


def test_conventional_los_on_reference_raster():
    """Conventional (projected) LOS consumes the reference's real 2-band
    ISCE los.rdr (incidence, heading; reference losreader.py:374-397) and
    yields delays amplified by 1/cos(incidence)."""
    from tests.conftest import REFERENCE_DIR

    los_file = REFERENCE_DIR / 'test' / 'test_geom' / 'los.rdr'
    if not los_file.exists():
        pytest.skip('reference los raster unavailable')
    from raider_tpu.geometry.los import Conventional
    from raider_tpu.io.rasters import rio_open

    data, _ = rio_open(str(los_file))
    inc = data[0]
    valid = np.isfinite(inc) & (inc > 0)
    assert valid.any()

    los = Conventional(str(los_file))
    los.setPoints(np.zeros_like(inc), np.zeros_like(inc), np.zeros_like(inc))
    ztd = np.ones_like(inc)
    std = np.asarray(los(ztd))
    # slant delay = ztd / cos(inc), so >= ztd wherever incidence is valid
    np.testing.assert_allclose(std[valid], 1.0 / np.cos(np.deg2rad(inc[valid])), rtol=1e-6)
    assert (std[valid] >= 1.0).all()
