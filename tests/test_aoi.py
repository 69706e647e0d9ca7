"""AOI classes against the reference's checked-in data
(mirrors test/test_llreader.py)."""

import os

import numpy as np
import pandas as pd
import pytest

from raider_tpu.geometry.aoi import (
    BoundingBox,
    GeocodedFile,
    RasterRDR,
    StationFile,
    bounds_from_csv,
)
from raider_tpu.io.rasters import bounds_from_latlon_rasters, rio_open

from tests.conftest import REFERENCE_DIR

GEOM_DIR = REFERENCE_DIR / 'test' / 'test_geom'
SCENARIO0_DIR = REFERENCE_DIR / 'test' / 'scenario_0'
STATION_FILE = REFERENCE_DIR / 'test' / 'scenario_2' / 'stations.csv'

pytestmark = pytest.mark.skipif(
    not GEOM_DIR.exists(), reason='reference data unavailable')


class TestBoundingBox:
    def test_type_bounds_projection(self):
        q = BoundingBox([20, 27, -115, -104])
        assert q.type() == 'bounding_box'
        assert q.bounds() == [20, 27, -115, -104]
        assert 'EPSG:4326' in str(q.projection()).upper() or q.projection().to_epsg() == 4326

    def test_output_spacing_epsg_conversion(self):
        """Degrees convert to meters for projected CRS
        (reference: llreader.py:173-191)."""
        r = BoundingBox([20, 27, -115, -104])
        r.set_output_spacing(ll_res=0.05)
        assert r.get_output_spacing(4978) == pytest.approx(0.05 * 1e5)
        assert r.get_output_spacing(4326) == pytest.approx(0.05)

    def test_set_output_directory_and_xygrid(self):
        r = BoundingBox([20, 27, -115, -104])
        r.set_output_directory('dummy_directory')
        assert r._output_directory == 'dummy_directory'
        r.set_output_spacing(ll_res=0.1)
        r.set_output_xygrid(dst_crs=4978)
        r.set_output_xygrid(dst_crs=4326)
        assert r.xpts is not None and r.ypts is not None


class TestRasterRDR:
    def test_latlon_reader(self):
        lat, lon = str(GEOM_DIR / 'lat.rdr'), str(GEOM_DIR / 'lon.rdr')
        lat_true, _ = rio_open(lat)
        lon_true, _ = rio_open(lon)
        q = RasterRDR(lat_file=lat, lon_file=lon)
        assert q.type() == 'radar_rasters'
        lats, lons = q.readLL()
        assert lats.shape == (45, 226) and lons.shape == (45, 226)
        np.testing.assert_allclose(lats, lat_true, equal_nan=True)
        np.testing.assert_allclose(lons, lon_true, equal_nan=True)
        bounds_true = [15.7637, 21.4936, -101.6384, -98.2418]
        np.testing.assert_allclose(q.bounds(), bounds_true, rtol=1e-4)

    def test_bad_files(self):
        with pytest.raises(ValueError):
            RasterRDR(lat_file=None, lon_file=None)
        with pytest.raises(ValueError):
            RasterRDR(lat_file='doesnotexist.rdr', lon_file='doesnotexist.rdr')
        with pytest.raises(ValueError):
            RasterRDR(lat_file=str(GEOM_DIR / 'lat.rdr'),
                      lon_file=str(GEOM_DIR / 'lon_dummy.rdr'))
        with pytest.raises(ValueError):
            RasterRDR(lat_file=str(GEOM_DIR / 'lat.rdr'),
                      lon_file=str(STATION_FILE))

    def test_bounds_from_latlon_rasters(self):
        snwe, _, _ = bounds_from_latlon_rasters(
            str(GEOM_DIR / 'lat.rdr'), str(GEOM_DIR / 'lon.rdr'))
        np.testing.assert_allclose(
            snwe, [15.7637, 21.4936, -101.6384, -98.2418], rtol=1e-4)


class TestStationFile:
    def test_read(self):
        q = StationFile(str(STATION_FILE))
        lats, lons = q.readLL()
        stats = pd.read_csv(str(STATION_FILE)).drop_duplicates(subset=['Lat', 'Lon'])
        np.testing.assert_allclose(lats, stats['Lat'].values)
        np.testing.assert_allclose(lons, stats['Lon'].values)
        np.testing.assert_allclose(
            q.bounds(), [33.746, 36.795, -118.312, -114.892], rtol=1e-4)
        np.testing.assert_allclose(q.readZ(), 0.1)

    def test_bounds_from_csv(self):
        snwe = bounds_from_csv(str(STATION_FILE))
        np.testing.assert_allclose(
            snwe, [33.746, 36.795, -118.312, -114.892], rtol=1e-3)


class TestGeocodedFile:
    def test_dem(self):
        p = SCENARIO0_DIR / 'small_dem.tif'
        if not p.exists():
            pytest.skip('small_dem.tif unavailable')
        aoi = GeocodedFile(str(p), is_dem=True)
        z = aoi.readZ()
        x, y = aoi.readLL()
        assert z.shape == (569, 558)
        assert x.shape == z.shape


def test_stationfile_readz_fills_from_dem(tmp_path):
    """A station CSV without Hgt_m gets heights sampled from the DEM as a
    1-D per-station array (regression: the reference's np.diag applied to
    our pairwise interpolate_dem produced an (n, n) matrix and crashed the
    Hgt_m assignment)."""
    import pandas as pd

    from raider_tpu.geodesy import Geographic
    from raider_tpu.geometry.aoi import StationFile
    from raider_tpu.io.geotiff import write_gtiff

    # 1-deg DEM tile around the stations, height = 100*row + col
    dem = (100.0 * np.arange(20)[:, None] + np.arange(30)[None, :]).astype(np.float32)
    dem_path = tmp_path / 'dem.tif'
    # origin lon -118.5, lat top 34.5, 0.05-deg pixels (north-up)
    write_gtiff(dem, str(dem_path), crs=Geographic(),
                transform=(-118.5, 0.05, 0.0, 34.5, 0.0, -0.05))

    csv = tmp_path / 'stations.csv'
    pd.DataFrame({'ID': ['AAAA', 'BBBB', 'CCCC'],
                  'Lat': [34.475, 34.125, 33.575],
                  'Lon': [-118.475, -117.725, -117.025]}).to_csv(csv, index=False)
    aoi = StationFile(str(csv), demFile=str(dem_path))
    z = aoi.readZ()
    assert np.asarray(z).shape == (3,)
    # nearest pixel centers: rows 0/7/18, cols 0/15/29
    np.testing.assert_allclose(z, [0.0, 715.0, 1829.0])
    # and the CSV was updated in place with the new column
    assert 'Hgt_m' in pd.read_csv(csv).columns
