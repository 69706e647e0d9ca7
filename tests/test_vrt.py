"""GDAL VRT reading and the reference's rio_profile path rewrites
(reference: utilFcns.py:140-151, generateGACOSVRT.py)."""

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR

from raider_tpu.io.rasters import read_envi, read_vrt, rio_profile


def test_isce_simplesource_vrts():
    """SimpleSource VRTs over the reference's real ISCE rasters read
    identically to the underlying ENVI files (multiband f32 + f64)."""
    geom = REFERENCE_DIR / 'test' / 'test_geom'
    if not (geom / 'los.rdr.vrt').exists():
        pytest.skip('reference VRTs unavailable')
    for stem in ('los',):
        d, p = read_vrt(str(geom / f'{stem}.rdr.vrt'))
        direct, _ = read_envi(str(geom / f'{stem}.rdr'))
        np.testing.assert_array_equal(d, direct)
        assert p['count'] == d.shape[0]
    lon = REFERENCE_DIR / 'test' / 'scenario_4' / 'lon.rdr.vrt'
    if lon.exists():
        d, p = read_vrt(str(lon))
        assert p['dtype'] == 'float64'


def test_vrt_sidecar_preference():
    """rio_profile('x.rdr') prefers 'x.rdr.vrt' when it exists."""
    f = REFERENCE_DIR / 'test' / 'test_geom' / 'los.rdr'
    if not f.exists():
        pytest.skip('reference rasters unavailable')
    prof = rio_profile(str(f))
    assert prof['driver'] == 'VRT'
    assert prof['count'] == 2


def test_gacos_raw_vrt_roundtrip(tmp_path):
    """GACOS .ztd -> makeVRT -> read_vrt recovers pixels + georeferencing."""
    from raider_tpu.workflows.gacos import makeVRT

    ztd = tmp_path / 'prod.ztd'
    arr = np.arange(20 * 30, dtype=np.float32).reshape(20, 30)
    arr.tofile(str(ztd))
    (tmp_path / 'prod.ztd.rsc').write_text(
        'WIDTH 30\nFILE_LENGTH 20\nX_FIRST -118.0\nY_FIRST 34.0\n'
        'X_STEP 0.01\nY_STEP -0.01\n'
    )
    vrt = makeVRT(str(ztd))
    d, p = read_vrt(vrt)
    np.testing.assert_array_equal(d[0], arr)
    np.testing.assert_allclose(p['transform'].to_gdal(),
                               (-118.0, 0.01, 0.0, 34.0, 0.0, -0.01))
    from raider_tpu.geodesy import Geographic

    assert isinstance(p['crs'], Geographic)


def test_s1_gunw_profile_rewrite(tmp_path):
    """rio_profile on an S1-GUNW*.nc resolves to the unwrappedPhase grid."""
    from tests.test_gunw_gnss import make_synthetic_gunw

    g = tmp_path / 'S1-GUNW-A-R-064-tops-20200130_20200124-0000-v2_0_6.nc'
    make_synthetic_gunw(g)
    p = rio_profile(str(g))
    assert p['driver'] == 'netCDF'
    assert p['width'] == 25 and p['height'] == 20
    assert p['transform'] is not None
