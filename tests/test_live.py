"""Live-integration tier: real network fetches, excluded by default.

The analogue of the reference's ``long`` marker (reference: pytest.ini:1-3;
CI runs ``pytest -m "not long"``, .circleci/config.yml:70-78). These tests
exercise the request constructors the mocked tier (tests/test_fetchers.py)
can only simulate. Run with::

    python -m pytest tests -m live

Each test skips itself when its client library, credentials, or network
egress is unavailable, so the tier is safe to attempt anywhere.
"""

import datetime as dt
import os
import pathlib
import socket

import numpy as np
import pytest

pytestmark = pytest.mark.live


def _has_egress(host: str = 'cds.climate.copernicus.eu', port: int = 443,
                timeout: float = 5.0) -> bool:
    try:
        socket.create_connection((host, port), timeout=timeout).close()
        return True
    except OSError:
        return False


@pytest.fixture()
def la_bounds():
    return [33.0, 34.0, -118.5, -117.0]


class TestLiveERA5:
    def test_cds_download_and_load(self, tmp_path, la_bounds):
        pytest.importorskip('cdsapi')
        if not (pathlib.Path.home() / '.cdsapirc').exists() \
                and 'CDSAPI_KEY' not in os.environ:
            pytest.skip('no CDS credentials')
        if not _has_egress():
            pytest.skip('no network egress')
        from raider_tpu.wx.ecmwf import ERA5

        m = ERA5()
        m.setTime(dt.datetime(2020, 1, 30, 14, 0, 0))
        m.set_latlon_bounds(la_bounds)
        out = tmp_path / 'era5_live.nc'
        m.fetch(str(out), dt.datetime(2020, 1, 30, 14, 0, 0))
        assert out.exists() and out.stat().st_size > 0
        m.load_weather(str(out))
        assert np.isfinite(np.asarray(m._p)).any()


class TestLiveHRRR:
    def test_herbie_download_and_load(self, tmp_path):
        pytest.importorskip('herbie')
        if not _has_egress('noaa-hrrr-bdp-pds.s3.amazonaws.com'):
            pytest.skip('no network egress')
        from raider_tpu.wx.hrrr import HRRR

        m = HRRR()
        t = dt.datetime(2020, 1, 1, 12, 0, 0)
        m.setTime(t)
        m.set_latlon_bounds([36.0, 37.5, -92.5, -91.0])
        out = tmp_path / 'hrrr_live.nc'
        m.fetch(str(out), t)
        assert out.exists() and out.stat().st_size > 0
        m.load_weather(str(out))
        assert np.isfinite(np.asarray(m._p)).any()


class TestLiveGMAO:
    def test_opendap_download(self, tmp_path):
        pytest.importorskip('pydap')
        if not _has_egress('opendap.nccs.nasa.gov'):
            pytest.skip('no network egress')
        from raider_tpu.wx.gmao import GMAO

        m = GMAO()
        t = dt.datetime(2021, 6, 1, 12, 0, 0)
        m.setTime(t)
        m.set_latlon_bounds([33.0, 34.5, -118.5, -117.0])
        out = tmp_path / 'gmao_live.nc'
        m.fetch(str(out), t)
        assert out.exists() and out.stat().st_size > 0


class TestLiveGNSS:
    def test_unr_station_list(self, tmp_path):
        if not _has_egress('geodesy.unr.edu'):
            pytest.skip('no network egress')
        from raider_tpu.workflows.gnss import get_station_list

        # UNR bbox convention: longitudes on [0, 360]
        stats, origin = get_station_list(
            bbox=[33.0, 34.5, 241.5, 243.0], writeLoc=str(tmp_path))
        assert len(stats) > 0

    def test_unr_station_archive(self, tmp_path):
        if not _has_egress('geodesy.unr.edu'):
            pytest.skip('no network egress')
        from raider_tpu.workflows.gnss import download_UNR

        res = download_UNR('TORP', 2020, writeDir=str(tmp_path),
                           download=True)
        assert res.get('path') or res.get('totalTime') is not None


class TestLiveDEM:
    def test_glo30_download(self, tmp_path):
        pytest.importorskip('dem_stitcher')
        if not _has_egress('copernicus-dem-30m.s3.amazonaws.com'):
            pytest.skip('no network egress')
        from raider_tpu.workflows.dem import download_dem

        hgts, meta = download_dem(
            [34.0, 34.1, -118.2, -118.1],
            writeDEM=True, outName=str(tmp_path / 'glo30.dem'))
        assert np.isfinite(np.asarray(hgts)).any()


class TestLiveScenario1ERA5:
    """Reproduce the reference's per-model scenario-1 regression for ERA5
    (reference: test/_scenario_1.py:20-144): fetch the 2020-01-03T23 Mexico
    scene live, run the full pipeline (fetch -> load -> ZTD cube -> sample at
    the scenario's radar-coordinate query rasters), and compare wet/hydro
    against the stored golden rasters at the reference's rtol = 1e-2."""

    SCENARIO = pathlib.Path('/root/reference/test/scenario_1')
    GEOM = pathlib.Path('/root/reference/test/test_geom')

    def test_scenario_1_era5_zenith(self, tmp_path):
        pytest.importorskip('cdsapi')
        if not (pathlib.Path.home() / '.cdsapirc').exists() \
                and 'CDSAPI_KEY' not in os.environ:
            pytest.skip('no CDS credentials')
        if not _has_egress():
            pytest.skip('no network egress')
        if not (self.SCENARIO / 'ERA5' / 'wet.envi').exists():
            pytest.skip('reference scenario_1 data not available')

        from raider_tpu.delay.engine import tropo_delay
        from raider_tpu.geometry.aoi import RasterRDR
        from raider_tpu.geometry.los import Zenith
        from raider_tpu.io.rasters import rio_open
        from raider_tpu.wx.ecmwf import ERA5
        from raider_tpu.wx.process import prepareWeatherModel

        time = dt.datetime(2020, 1, 3, 23, 0)
        ll_bounds = (15.75, 18.25, -103.24, -99.75)

        model = ERA5()
        model.set_wmLoc(str(tmp_path))
        wm_file = prepareWeatherModel(model, time, list(ll_bounds))

        # the warped DEM is stored on the same 11x15 radar grid as lat/lon
        # (reference passes heights=('dem', warpedDEM.dem))
        aoi = RasterRDR(
            str(self.SCENARIO / 'geom' / 'lat.dat'),
            str(self.SCENARIO / 'geom' / 'lon.dat'),
            hgt_file=str(self.GEOM / 'warpedDEM.dem'),
        )
        wet, hydro = tropo_delay(time, wm_file, aoi, Zenith(), zref=20000.0)

        true_wet, _ = rio_open(str(self.SCENARIO / 'ERA5' / 'wet.envi'))
        true_hydro, _ = rio_open(str(self.SCENARIO / 'ERA5' / 'hydro.envi'))
        true_wet = np.where(true_wet == 0.0, np.nan, true_wet)
        true_hydro = np.where(true_hydro == 0.0, np.nan, true_hydro)

        wet = np.asarray(wet).reshape(true_wet.shape)
        hydro = np.asarray(hydro).reshape(true_hydro.shape)
        assert np.nanmax(np.abs((wet - true_wet) / true_wet)) < 1e-2
        assert np.nanmax(np.abs((hydro - true_hydro) / true_hydro)) < 1e-2


class TestLiveScenario1GMAO:
    """Second scenario-1 model leg (VERDICT r3 item 7): GMAO rides NASA's
    OpenDAP (pydap + Earthdata login), not paid CDS credentials, so this is
    the most runnable per-model raster regression after ERA5. Same Mexico
    scene / goldens / rtol as the reference (test/_scenario_1.py:64-144).
    Provenance of which live legs have ever executed is in COVERAGE.md."""

    SCENARIO = pathlib.Path('/root/reference/test/scenario_1')
    GEOM = pathlib.Path('/root/reference/test/test_geom')

    def test_scenario_1_gmao_zenith(self, tmp_path):
        pytest.importorskip('pydap')
        if not _has_egress('opendap.nccs.nasa.gov'):
            pytest.skip('no network egress')
        if not (self.SCENARIO / 'GMAO' / 'wet.envi').exists():
            pytest.skip('reference scenario_1 data not available')

        from raider_tpu.delay.engine import tropo_delay
        from raider_tpu.geometry.aoi import RasterRDR
        from raider_tpu.geometry.los import Zenith
        from raider_tpu.io.rasters import rio_open
        from raider_tpu.wx.gmao import GMAO
        from raider_tpu.wx.process import prepareWeatherModel

        time = dt.datetime(2020, 1, 3, 23, 0)
        ll_bounds = (15.75, 18.25, -103.24, -99.75)

        model = GMAO()
        model.set_wmLoc(str(tmp_path))
        wm_file = prepareWeatherModel(model, time, list(ll_bounds))

        aoi = RasterRDR(
            str(self.SCENARIO / 'geom' / 'lat.dat'),
            str(self.SCENARIO / 'geom' / 'lon.dat'),
            hgt_file=str(self.GEOM / 'warpedDEM.dem'),
        )
        wet, hydro = tropo_delay(time, wm_file, aoi, Zenith(), zref=20000.0)

        true_wet, _ = rio_open(str(self.SCENARIO / 'GMAO' / 'wet.envi'))
        true_hydro, _ = rio_open(str(self.SCENARIO / 'GMAO' / 'hydro.envi'))
        true_wet = np.where(true_wet == 0.0, np.nan, true_wet)
        true_hydro = np.where(true_hydro == 0.0, np.nan, true_hydro)

        wet = np.asarray(wet).reshape(true_wet.shape)
        hydro = np.asarray(hydro).reshape(true_hydro.shape)
        assert np.nanmax(np.abs((wet - true_wet) / true_wet)) < 1e-2
        assert np.nanmax(np.abs((hydro - true_hydro) / true_hydro)) < 1e-2
