"""Pure-python GeoTIFF IO: roundtrips, cross-validation against PIL,
and the rio_* dispatch (capability parity with reference utilFcns.py:140-305
GTiff paths)."""

import numpy as np
import pytest

from raider_tpu.geodesy import Geographic
from raider_tpu.geodesy.crs import crs_from_epsg
from raider_tpu.io.geotiff import read_gtiff, write_gtiff
from raider_tpu.io.rasters import GDALAffine, rio_open, rio_profile, writeArrayToRaster

GT = GDALAffine((-118.0, 0.01, 0.0, 36.0, 0.0, -0.01))


def test_roundtrip_multiband_float32(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(3, 21, 17)).astype(np.float32)
    f = str(tmp_path / 'a.tif')
    write_gtiff(data, f, transform=GT, crs=Geographic(), nodata=-9999.0)
    out, prof = read_gtiff(f)
    np.testing.assert_array_equal(out, data)
    assert prof['count'] == 3 and prof['width'] == 17 and prof['height'] == 21
    assert prof['nodata'] == -9999.0
    assert isinstance(prof['crs'], Geographic)
    np.testing.assert_allclose(prof['transform'].to_gdal(), GT, atol=1e-12)


def test_roundtrip_deflate_and_int16(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.integers(-500, 500, size=(1, 64, 200)).astype(np.int16)
    f = str(tmp_path / 'b.tif')
    write_gtiff(data, f, transform=GT, compress=True, nodata=0)
    out, prof = read_gtiff(f)
    np.testing.assert_array_equal(out, data)
    assert out.dtype == np.int16
    assert prof['nodata'] == 0.0


def test_roundtrip_projected_crs(tmp_path):
    data = np.arange(12, dtype=np.float64).reshape(1, 3, 4)
    f = str(tmp_path / 'c.tif')
    utm = crs_from_epsg(32611)
    gt = GDALAffine((400000.0, 30.0, 0.0, 3700000.0, 0.0, -30.0))
    write_gtiff(data, f, transform=gt, crs=utm)
    out, prof = read_gtiff(f)
    np.testing.assert_array_equal(out, data)
    assert prof['crs'] is not None and prof['crs'].to_epsg() == 32611
    np.testing.assert_allclose(prof['transform'].to_gdal(), gt)


def test_pil_reads_our_file(tmp_path):
    PIL = pytest.importorskip('PIL.Image')
    data = (np.arange(30 * 40, dtype=np.float32).reshape(30, 40) / 7.0)[None]
    f = str(tmp_path / 'd.tif')
    write_gtiff(data, f, transform=GT)
    img = PIL.open(f)
    np.testing.assert_array_equal(np.asarray(img), data[0])


def test_our_reader_on_pil_file(tmp_path):
    PIL = pytest.importorskip('PIL.Image')
    rng = np.random.default_rng(2)
    data = rng.normal(size=(50, 33)).astype(np.float32)
    for name, kwargs in [('p1.tif', {}), ('p2.tif', {'compression': 'tiff_adobe_deflate'})]:
        f = str(tmp_path / name)
        PIL.fromarray(data).save(f, **kwargs)
        out, prof = read_gtiff(f)
        np.testing.assert_array_equal(out[0], data)
        assert prof['dtype'] == 'float32'


def test_lzw_reader_vs_pil(tmp_path):
    """TIFF-LZW decode (GDAL's most common compression) against PIL's encoder,
    covering code-width growth and table resets."""
    PIL = pytest.importorskip('PIL.Image')
    rng = np.random.default_rng(7)
    big = np.repeat(rng.integers(0, 40, (300, 211), dtype=np.uint8), 3, axis=1)[:, :211]
    smooth = np.cumsum(np.ones((257, 129), np.float32) * 0.5, axis=0)
    for name, img in [('big.tif', big), ('smooth.tif', smooth)]:
        f = str(tmp_path / name)
        PIL.fromarray(img).save(f, compression='tiff_lzw')
        out, _ = read_gtiff(f)
        np.testing.assert_array_equal(out[0], img)


def test_rio_dispatch_and_nodata(tmp_path):
    data = np.array([[1.0, 2.0], [3.0, -9999.0]], np.float32)
    f = str(tmp_path / 'e.tif')
    writeArrayToRaster(data, f, noDataValue=-9999.0, fmt='GTiff',
                       proj=Geographic(), gt=GT)
    out, prof = rio_open(f)
    assert np.isnan(out[1, 1]) and out[0, 0] == 1.0
    assert rio_profile(f)['driver'] == 'GTiff'


def test_many_strips_layout(tmp_path):
    """Strip offsets spill to the heap once there are more than one strip."""
    rng = np.random.default_rng(3)
    data = rng.normal(size=(2, 700, 300)).astype(np.float32)  # several strips
    f = str(tmp_path / 'f.tif')
    write_gtiff(data, f, transform=GT, compress=True)
    out, _ = read_gtiff(f)
    np.testing.assert_array_equal(out, data)


class TestUserDefinedProjectionKeys:
    """Projected CRSs WITHOUT an EPSG code (HRRR LCC, HRRR-AK polar stereo)
    round-trip through full user-defined GeoKey parameter sets instead of
    silently dropping the georeference."""

    def _roundtrip(self, crs, tmp_path):
        from raider_tpu.io.geotiff import read_gtiff, write_gtiff

        arr = np.arange(12.0, dtype=np.float32).reshape(3, 4)
        p = str(tmp_path / 'udef.tif')
        write_gtiff(arr, p, crs=crs, transform=(0.0, 3000.0, 0, 0.0, 0, -3000.0))
        _, prof = read_gtiff(p)
        assert prof['crs'] is not None, 'CRS was dropped'
        return prof['crs']

    def test_hrrr_lcc_sphere(self, tmp_path):
        from raider_tpu.wx.hrrr import HRRR_CONUS_PROJ

        back = self._roundtrip(HRRR_CONUS_PROJ, tmp_path)
        assert back == HRRR_CONUS_PROJ

    def test_hrrr_ak_polar_stereo(self, tmp_path):
        from raider_tpu.wx.hrrr import HRRR_AK_PROJ

        back = self._roundtrip(HRRR_AK_PROJ, tmp_path)
        assert back == HRRR_AK_PROJ

    def test_custom_tm(self, tmp_path):
        from raider_tpu.geodesy.crs import TransverseMercator

        crs = TransverseMercator(lon_0=9.0, lat_0=0.0, k0=0.9996,
                                 x_0=500000.0, y_0=0.0)
        back = self._roundtrip(crs, tmp_path)
        assert back == crs
