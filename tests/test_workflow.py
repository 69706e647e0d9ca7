"""Full calcDelays workflow from YAML configs, against reference goldens.

Mirrors the reference's integration tests (test/test_slant.py,
test/test_intersect.py): the processed weather file is discovered through the
cache-key filename convention, exactly like the reference's
prepareWeatherModel reuse path.
"""

import datetime as dt
import os
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
import yaml

from tests.conftest import REF_WM_DIR, REFERENCE_DIR

pytestmark = pytest.mark.skipif(not REF_WM_DIR.exists(), reason='reference data unavailable')


def _write_cfg(tmp_path, grp: dict) -> str:
    base = {
        'look_dir': 'right',
        'date_group': {},
        'time_group': {},
        'aoi_group': {},
        'height_group': {},
        'los_group': {},
        'runtime_group': {},
        'weather_model': 'ERA5',
    }
    base.update(grp)
    p = tmp_path / 'cfg.yaml'
    p.write_text(yaml.dump(base))
    return str(p)


def test_bbox_cube_golden(tmp_path, monkeypatch):
    """ZTD cube via the full workflow; golden point from the reference
    (test/test_slant.py:49-57: 2.333865144 m at (33.4, -117.8, 0))."""
    from raider_tpu.workflows.calc_delays import calcDelays
    from raider_tpu.io import read_nc

    cfg = _write_cfg(tmp_path, {
        'date_group': {'date_start': 20200130},
        'height_group': {'height_levels': [0, 100, 500, 1000]},
        'time_group': {'time': '13:52:45', 'interpolate_time': 'none'},
        'aoi_group': {'bounding_box': [33, 34, -118.25, -116.75]},
        'runtime_group': {
            'output_directory': str(tmp_path),
            'weather_model_directory': str(REF_WM_DIR),
            'verbose': False,
        },
    })
    monkeypatch.chdir(tmp_path)
    paths = calcDelays([cfg])
    assert len(paths) == 1

    ds = read_nc(paths[0])
    y = np.asarray(ds.coords['y'].data)
    x = np.asarray(ds.coords['x'].data)
    iy = np.abs(y - 33.4).argmin()
    ix = np.abs(x - (-117.8)).argmin()
    total = float(ds['wet'].data[0, iy, ix] + ds['hydro'].data[0, iy, ix])
    np.testing.assert_almost_equal(total, 2.333865144, decimal=5)
    assert ds.attrs['model_name'] == 'ERA-5'
    assert ds.attrs['interpolation_method'] == 'none'


def test_station_csv_golden(tmp_path, monkeypatch):
    """GNSS station workflow; golden from the reference
    (test/test_intersect.py:103-111: TORP total ZTD 2.34514 m)."""
    from raider_tpu.workflows.calc_delays import calcDelays

    src = REFERENCE_DIR / 'test' / 'scenario_6' / 'stations.csv'
    stations = tmp_path / 'stations.csv'
    stations.write_text(src.read_text())

    cfg = _write_cfg(tmp_path, {
        'date_group': {'date_start': 20200130},
        'time_group': {'time': '13:52:45', 'interpolate_time': 'none'},
        'aoi_group': {'station_file': str(stations)},
        'runtime_group': {
            'output_directory': str(tmp_path),
            'weather_model_directory': str(REF_WM_DIR),
            'verbose': False,
        },
    })
    monkeypatch.chdir(tmp_path)
    paths = calcDelays([cfg])
    assert len(paths) == 1 and str(paths[0]).endswith('.csv')

    df = pd.read_csv(paths[0])
    td = df.loc[df['ID'] == 'TORP', 'totalDelay'].item()
    np.testing.assert_almost_equal(td, 2.34514, decimal=4)


def test_config_validation_errors(tmp_path):
    from raider_tpu.workflows.config import parse_bbox, read_run_config_file

    with pytest.raises(ValueError):
        parse_bbox([34, 33, -118, -117])  # N <= S
    with pytest.raises(ValueError):
        parse_bbox([33, 34, -118])  # wrong length
    with pytest.raises(ValueError):
        parse_bbox([33, 34, 170, 190])  # lon > 180

    cfg = _write_cfg(tmp_path, {
        'date_group': {'date_start': 20200130},
        'time_group': {'time': '13:52:45'},
        # no AOI at all
    })
    with pytest.raises(ValueError):
        read_run_config_file(cfg)


def test_time_interp_none_vs_center(tmp_path):
    """get_nearest_wmtimes + weight math (reference: utilFcns docstring values)."""
    from raider_tpu.utils.timeutils import get_nearest_wmtimes
    from raider_tpu.workflows.calc_delays import get_weights_time_interp

    t0 = dt.datetime(2020, 1, 1, 11, 35, 0)
    times = get_nearest_wmtimes(t0, 3)
    assert times == [dt.datetime(2020, 1, 1, 9, 0), dt.datetime(2020, 1, 1, 12, 0)]

    wgts = get_weights_time_interp(times, t0)
    np.testing.assert_allclose(sum(wgts), 1.0)
    assert wgts[1] > wgts[0]  # closer to 12:00


def test_azimuth_timing_helpers():
    from raider_tpu.workflows.s1_timing import (
        get_inverse_weights_for_dates,
        get_n_closest_datetimes,
        get_times_for_azimuth_interpolation,
    )

    t = dt.datetime(2023, 1, 1, 11, 0, 0)
    out = get_n_closest_datetimes(t, 3, 6)
    assert out == [
        dt.datetime(2023, 1, 1, 12), dt.datetime(2023, 1, 1, 6), dt.datetime(2023, 1, 1, 18)
    ]

    t = dt.datetime(2023, 1, 1, 11, 1, 0)
    out = get_times_for_azimuth_interpolation(t, 1)
    assert out == [
        dt.datetime(2023, 1, 1, 11), dt.datetime(2023, 1, 1, 12), dt.datetime(2023, 1, 1, 10)
    ]
    t = dt.datetime(2023, 1, 1, 11, 30, 0)
    out = get_times_for_azimuth_interpolation(t, 1)
    assert out == [dt.datetime(2023, 1, 1, 11), dt.datetime(2023, 1, 1, 12)]

    dates = [dt.datetime(2023, 1, 1, 11), dt.datetime(2023, 1, 1, 12)]
    az = np.array([np.datetime64('2023-01-01T11:15:00', 'ms')] * 4).reshape(2, 2)
    wgts = get_inverse_weights_for_dates(az, dates)
    np.testing.assert_allclose(wgts[0] + wgts[1], 1.0)
    assert np.all(wgts[0] > wgts[1])  # 11:15 is closer to 11:00


def test_center_time_interpolation(tmp_path, monkeypatch):
    """Two epochs with different constant ZTD fields: the center_time path
    must produce the inverse-time-weighted combination
    (reference: cli/raider.py:792-888)."""
    import yaml

    from raider_tpu.geodesy import Geographic
    from raider_tpu.io import Dataset, read_nc, write_nc
    from raider_tpu.io.ncdf import Variable
    from raider_tpu.workflows.calc_delays import calcDelays
    from raider_tpu.wx.base import make_weather_model_filename

    wm_dir = tmp_path / 'weather_files'
    wm_dir.mkdir()

    ys = np.arange(30.0, 37.01, 0.25)
    xs = np.arange(-120.0, -113.99, 0.25)
    zs = np.linspace(-500.0, 30000.0, 25)
    shape = (zs.size, ys.size, xs.size)

    def make_wm(timestr, value):
        coords = {
            'x': Variable(('x',), xs, {}),
            'y': Variable(('y',), ys, {}),
            'z': Variable(('z',), zs, {}),
        }
        variables = {
            'wet': Variable(('z', 'y', 'x'), np.full(shape, 1.0), {}),
            'hydro': Variable(('z', 'y', 'x'), np.full(shape, 2.0), {}),
            'wet_total': Variable(('z', 'y', 'x'), np.full(shape, value), {}),
            'hydro_total': Variable(('z', 'y', 'x'), np.full(shape, 2 * value), {}),
            'proj': Variable((), np.int64(0), Geographic().to_cf()),
        }
        return Dataset(coords=coords, variables=variables,
                       attrs={'datetime': timestr})

    t1 = dt.datetime(2020, 1, 30, 12, 0, 0)
    t2 = dt.datetime(2020, 1, 30, 13, 0, 0)
    # filenames must match the cache-key convention for the buffered bounds
    for t, val in ((t1, 1.0), (t2, 3.0)):
        # bounds the workflow computes for this config (ERA5, bbox 33-34/-118.25--116.75)
        name = make_weather_model_filename('ERA-5', t, [32.0, 35.0, -120.0, -115.0])
        write_nc(make_wm(t.strftime('%Y_%m_%dT%H_%M_%S'), val), wm_dir / name)

    cfg = _write_cfg(tmp_path, {
        'date_group': {'date_start': 20200130},
        'height_group': {'height_levels': [0]},
        'time_group': {'time': '12:45:00', 'interpolate_time': 'center_time'},
        'aoi_group': {'bounding_box': [33, 34, -118.25, -116.75]},
        'runtime_group': {
            'output_directory': str(tmp_path),
            'weather_model_directory': str(wm_dir),
            'verbose': False,
        },
    })
    monkeypatch.chdir(tmp_path)
    paths = calcDelays([cfg])
    ds = read_nc(paths[0])
    # 12:45 between 12:00 and 13:00 -> weights 0.25 / 0.75 -> 1*0.25 + 3*0.75
    expected = 1.0 * 0.25 + 3.0 * 0.75
    np.testing.assert_allclose(np.asarray(ds['wet'].data), expected, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ds['hydro'].data), 2 * expected, rtol=1e-12)
    # the combined file was written with the timeInterp naming convention
    combined = list(wm_dir.glob('*timeInterp*'))
    assert len(combined) == 1


def test_geocube_ingests_reference_product():
    """Geocube AOI + CRS parsers consume a delay cube produced by the
    reference itself (test/scenario_1/golden_data), proving product-schema
    compatibility in the read direction."""
    from raider_tpu.geodesy import Geographic
    from raider_tpu.geodesy.crs import crs_from_cf, crs_from_wkt
    from raider_tpu.geometry.aoi import Geocube
    from raider_tpu.io import read_nc

    path = (REFERENCE_DIR / 'test' / 'scenario_1' / 'golden_data' /
            'HRRR_tropo_20200101T120000_ztd.nc')
    if not path.exists():
        pytest.skip('reference golden cube unavailable')

    ds = read_nc(str(path))
    assert 'wet' in ds and 'hydro' in ds
    # WKT2 ENSEMBLE-style geographic CRS parses to EPSG:4326
    crs = crs_from_wkt(ds['crs'].attrs['crs_wkt'])
    assert isinstance(crs, Geographic) and crs.to_epsg() == 4326
    assert isinstance(crs_from_cf(ds['crs'].attrs), Geographic)

    g = Geocube(str(path))
    s, n, w, e = g._bounding_box
    assert 35.0 < s < n < 38.0 and -93.0 < w < e < -90.0
    lats, lons = g.readLL()
    assert np.asarray(lats).size == 102 * 101
    z = g.readZ()
    np.testing.assert_array_equal(np.asarray(z), [0, 50, 100, 500, 1000])


def test_hrrr_ztd_scenario1_golden(tmp_path, monkeypatch):
    """The reference's headline HRRR ZTD golden (test/test_HRRR_ztd.py:7-21):
    hydro=2.2622863 m, wet=0.0361021 m at (-91.84, 36.84, z=0), driven through
    the full calcDelays workflow with prepareWeatherModel mocked to the
    checked-in processed HRRR file, exactly like the reference test."""
    import raider_tpu.workflows.calc_delays as cd
    from raider_tpu.io import read_nc

    wm_file = (REFERENCE_DIR / 'test' / 'scenario_1' / 'HRRR_ztd_test' /
               'HRRR_2020_01_01_T12_00_00_35N_38N_93W_90W.nc')
    if not wm_file.exists():
        pytest.skip('reference HRRR file unavailable')
    monkeypatch.setattr(cd, 'prepareWeatherModel',
                        lambda *a, **k: str(wm_file))

    cfg = _write_cfg(tmp_path, {
        'weather_model': 'HRRR',
        'date_group': {'date_start': 20200101},
        'time_group': {'time': '12:00:00', 'interpolate_time': 'none'},
        'aoi_group': {'bounding_box': [36, 37, -92, -91]},
        'height_group': {'height_levels': [0, 50, 100, 500, 1000]},
        'runtime_group': {'output_directory': str(tmp_path), 'verbose': False},
    })
    monkeypatch.chdir(tmp_path)
    paths = cd.calcDelays([cfg])
    assert len(paths) == 1 and paths[0].endswith(
        'HRRR_tropo_20200101T120000_ztd.nc')

    ds = read_nc(paths[0])
    y = np.asarray(ds.coords['y'].data)
    x = np.asarray(ds.coords['x'].data)
    z = np.asarray(ds.coords['z'].data)
    iy = np.abs(y - 36.84).argmin()
    ix = np.abs(x - (-91.84)).argmin()
    iz = np.abs(z - 0.0).argmin()
    np.testing.assert_almost_equal(float(ds['hydro'].data[iz, iy, ix]), 2.2622863)
    np.testing.assert_almost_equal(float(ds['wet'].data[iz, iy, ix]), 0.0361021)


def test_cube_writer_schema_matches_reference_product(tmp_path, monkeypatch):
    """Our delay-cube writer emits the reference's product schema: same
    coords, variable dims/attrs (units/description/grid_mapping), CF
    conventions and a CF grid-mapping variable, checked field-by-field
    against the golden cube the reference itself produced."""
    from raider_tpu.io import read_nc
    from raider_tpu.workflows.calc_delays import calcDelays

    golden_path = (REFERENCE_DIR / 'test' / 'scenario_1' / 'golden_data' /
                   'HRRR_tropo_20200101T120000_ztd.nc')
    if not golden_path.exists():
        pytest.skip('reference golden cube unavailable')
    golden = read_nc(str(golden_path))

    cfg = _write_cfg(tmp_path, {
        'date_group': {'date_start': 20200130},
        'height_group': {'height_levels': [0, 100]},
        'time_group': {'time': '13:52:45', 'interpolate_time': 'none'},
        'aoi_group': {'bounding_box': [33, 34, -118.25, -116.75]},
        'runtime_group': {
            'output_directory': str(tmp_path),
            'weather_model_directory': str(REF_WM_DIR),
            'verbose': False,
        },
    })
    monkeypatch.chdir(tmp_path)
    ours = read_nc(calcDelays([cfg])[0])

    assert set(ours.coords) >= {'x', 'y', 'z'}
    for v in ('wet', 'hydro'):
        assert ours[v].dims == golden[v].dims == ('z', 'y', 'x')
        for key in ('units', 'description', 'grid_mapping'):
            assert ours[v].attrs.get(key) == golden[v].attrs.get(key), (v, key)
    assert ours.attrs.get('Conventions') == golden.attrs.get('Conventions') == 'CF-1.7'
    for key in ('title', 'description'):
        assert ours.attrs.get(key) == golden.attrs.get(key), key
    assert 'reference_time' in ours.attrs
    gm = ours[ours['wet'].attrs['grid_mapping']]
    assert gm.attrs.get('grid_mapping_name') == \
        golden[golden['wet'].attrs['grid_mapping']].attrs.get('grid_mapping_name')


def test_azimuth_time_grid_combination(tmp_path, monkeypatch):
    """combine_weather_files with per-pixel azimuth-time inverse weights
    (reference: cli/raider.py:792-916): voxels acquired nearer an epoch pull
    the combined field toward that epoch's values."""
    import raider_tpu.workflows.s1_timing as s1t
    from raider_tpu.io import read_nc
    from raider_tpu.io.ncdf import Dataset, Variable, write_nc
    from raider_tpu.workflows.calc_delays import combine_weather_files

    t0 = dt.datetime(2020, 1, 30, 14, 0, 0)
    times = [t0 + dt.timedelta(hours=h) for h in (-1, 0, 1)]
    ny, nx, nz = 4, 6, 3
    lat2 = np.linspace(33.0, 34.0, ny)[:, None] + np.zeros((ny, nx))
    lon2 = np.linspace(-118.0, -117.0, nx)[None, :] + np.zeros((ny, nx))
    paths = []
    for i, ti in enumerate(times):
        fields = {
            v: Variable(('z', 'y', 'x'), np.full((nz, ny, nx), float(i + 1)), {})
            for v in ('wet', 'hydro', 'wet_total', 'hydro_total')
        }
        ds = Dataset(
            coords={'z': Variable(('z',), np.array([0.0, 1000.0, 2000.0]), {}),
                    'y': Variable(('y',), lat2[:, 0], {}),
                    'x': Variable(('x',), lon2[0], {})},
            variables={'latitude': Variable(('y', 'x'), lat2, {}),
                       'longitude': Variable(('y', 'x'), lon2, {}),
                       **fields},
            attrs={'datetime': ti.strftime('%Y_%m_%dT%H_%M_%S')},
        )
        p = tmp_path / f'HRRR_{ti.strftime("%Y_%m_%d_T%H_%M_%S")}_33N_34N_118W_117W.nc'
        write_nc(ds, str(p))
        paths.append(str(p))

    # azimuth time: western half imaged at epoch 0's time, eastern at epoch 2's
    def fake_time_grid(lon, lat, hgt, time):
        west = np.asarray(lon) < -117.5
        out = np.where(west, np.datetime64(times[0], 'ms'),
                       np.datetime64(times[2], 'ms'))
        return out

    monkeypatch.setattr(s1t, 'get_s1_azimuth_time_grid', fake_time_grid)
    out_path = combine_weather_files(paths, t0, 'HRRR',
                                     interp_method='azimuth_time_grid')
    assert '_timeInterpAziGrid_' in Path(out_path).name
    out = read_nc(str(out_path))
    wet = np.asarray(out['wet'].data)
    lonb = np.broadcast_to(lon2, wet.shape)
    # exact acquisition at an epoch -> that epoch's value dominates
    np.testing.assert_allclose(wet[lonb < -117.5], 1.0, atol=1e-6)
    np.testing.assert_allclose(wet[lonb > -117.5], 3.0, atol=1e-6)


def test_azimuth_time_grid_requires_hrrr(tmp_path):
    from raider_tpu.workflows.calc_delays import get_time_grid_for_aztime_interp

    with pytest.raises(NotImplementedError, match='HRRR'):
        get_time_grid_for_aztime_interp([], dt.datetime(2020, 1, 30), 'ERA5')


def test_raster_aoi_ztd_golden(tmp_path, monkeypatch):
    """Radar-raster AOI end to end (reference: test_intersect.py:20-72):
    ERA5 hydro ZTD at the scenario-6 grid, golden 2.2787 m near
    (16.15N, -100.6E), written as GTiff rasters."""
    from raider_tpu.io.rasters import rio_open
    from raider_tpu.workflows.calc_delays import calcDelays

    scen = REFERENCE_DIR / 'test' / 'scenario_6'
    wm_file = REF_WM_DIR / 'ERA-5_2020_01_30_T13_52_45.nc'
    if not (scen / 'lat.rdr').exists() or not wm_file.exists():
        pytest.skip('reference scenario_6 data unavailable')

    # the reference downloads a GLO30 DEM here (no egress in CI for us);
    # the golden point is oceanic, so a zero-height raster is equivalent
    from raider_tpu.geodesy.crs import Geographic
    from raider_tpu.io.rasters import rio_open as _ro, writeArrayToRaster

    lat_arr, _ = _ro(str(scen / 'lat.rdr'))
    hgt_path = tmp_path / 'hgt.dat'
    # nodata must NOT be 0: the heights ARE zeros (oceanic golden point)
    writeArrayToRaster(np.zeros_like(lat_arr, dtype=np.float32), str(hgt_path),
                       noDataValue=-9999.0, fmt='ENVI', proj=Geographic())

    # writable weather dir seeded with the reference's RAW model-level file
    # (the reference test downloads it; we must never write to /root/reference)
    import shutil
    wm_dir = tmp_path / 'weather_files'
    wm_dir.mkdir()
    shutil.copy(wm_file, wm_dir / wm_file.name)

    outdir = tmp_path / 'output'
    cfg = _write_cfg(tmp_path, {
        'date_group': {'date_start': 20200130},
        'time_group': {'time': '13:52:45', 'interpolate_time': 'none'},
        'aoi_group': {'lat_file': str(scen / 'lat.rdr'),
                      'lon_file': str(scen / 'lon.rdr')},
        'height_group': {'height_file_rdr': str(hgt_path)},
        'runtime_group': {
            'output_directory': str(outdir),
            'weather_model_directory': str(wm_dir),
            'file_format': 'GTiff',
            'verbose': False,
        },
    })
    monkeypatch.chdir(tmp_path)
    calcDelays([cfg])

    hyd_path = outdir / 'ERA5_hydro_20200130T135245_ztd.tiff'
    assert hyd_path.exists(), list(outdir.iterdir())
    hyd, _ = rio_open(str(hyd_path))
    lats, _ = rio_open(str(scen / 'lat.rdr'))
    lons, _ = rio_open(str(scen / 'lon.rdr'))
    i = np.nanargmin(np.abs(lats - 16.15) + np.abs(lons + 100.6))
    # the reference golden (2.2787) was produced with GLO30 ellipsoidal DEM
    # heights (the ocean surface sits at the geoid, ~-10 m there); with our
    # zero-height raster the delay differs by the hydrostatic gradient over
    # that offset, so the reference comparison is mm-loose and the tight
    # regression anchor is our own measured value
    np.testing.assert_allclose(hyd.ravel()[i], 2.2787, atol=5e-3)
    np.testing.assert_almost_equal(hyd.ravel()[i], 2.27480, decimal=4)


def test_time_interpolation_matches_reference_product(tmp_path):
    """combine_weather_files reproduces a time-interpolated weather file the
    REFERENCE itself produced (checked into gunw_test_data): identical
    output filename, delay totals bit-exact, refractivities to f32 rounding."""
    import shutil

    from raider_tpu.io import read_nc
    from raider_tpu.workflows.calc_delays import combine_weather_files

    src = REFERENCE_DIR / 'test' / 'gunw_test_data' / 'weather_files'
    f12 = 'GMAO_2020_01_24_T12_00_00_32N_36N_121W_114W.nc'
    f15 = 'GMAO_2020_01_24_T15_00_00_32N_36N_121W_114W.nc'
    ref_name = 'GMAO_2020_01_24T13_52_44_timeInterp_32N_36N_121W_114W.nc'
    if not (src / f12).exists():
        pytest.skip('reference GUNW weather files unavailable')
    shutil.copy(src / f12, tmp_path / f12)
    shutil.copy(src / f15, tmp_path / f15)

    out = combine_weather_files(
        [str(tmp_path / f12), str(tmp_path / f15)],
        dt.datetime(2020, 1, 24, 13, 52, 44), 'GMAO', 'center_time')
    assert Path(out).name == ref_name

    ours = read_nc(str(out))
    ref = read_nc(str(src / ref_name))
    for v, tol in (('wet_total', 0.0), ('hydro_total', 0.0),
                   ('wet', 1e-5), ('hydro', 5e-5)):
        a = np.asarray(ours[v].data, np.float64)
        b = np.asarray(ref[v].data, np.float64)
        assert np.nanmax(np.abs(a - b)) <= tol, v


def test_pressure_level_pipeline_with_real_dem(tmp_path, monkeypatch):
    """Scenario-7 real data end to end at the engine level: the checked-in
    raw ERA5 PRESSURE-LEVEL file (z/r/q/t on 37 levels - the reference's own
    test for it is a broken no-op, test_util.py:378-387) runs through the
    pl loader + pipeline + processed writer, then a point query at heights
    interpolated from the checked-in warped DEM."""
    import datetime as _dt
    import shutil

    from raider_tpu.delay.engine import tropo_delay
    from raider_tpu.geometry.aoi import StationFile
    from raider_tpu.geometry.los import Zenith
    from raider_tpu.io.rasters import rio_open
    from raider_tpu.wx.base import make_raw_weather_data_filename
    from raider_tpu.wx.registry import get_wm_by_name

    scen = REFERENCE_DIR / 'test' / 'scenario_7'
    if not (scen / 'warpedDEM.dem').exists():
        pytest.skip('reference scenario_7 unavailable')

    t = _dt.datetime(2018, 3, 27, 13, 0, 0)
    _, Model = get_wm_by_name('ERA5')
    m = Model()
    m.setLevelType('pl')
    m.set_latlon_bounds([16.0, 19.0, -101.0, -98.5])
    m.setTime(t)
    m.set_wmLoc(str(tmp_path))
    shutil.copy(scen / 'ERA-5_2018_03_27_T13_00_00.nc',
                make_raw_weather_data_filename(str(tmp_path), m.Model(), t))
    m.load()
    proc = m.write()

    # query points on land, heights from the real DEM
    lats_r, _ = rio_open(str(scen / 'lat.rdr'))
    lons_r, _ = rio_open(str(scen / 'lon.rdr'))
    ok = (~np.isnan(lats_r) & ~np.isnan(lons_r) & (lats_r > 16.3)
          & (lats_r < 18.8) & (lons_r > -100.8) & (lons_r < -98.8)
          & (lats_r != 0) & (lons_r != 0))
    lats = lats_r[ok][::37]
    lons = lons_r[ok][::37]
    # the warped DEM is pixel-aligned with the lat/lon rasters (it carries
    # no georeference of its own - the radar-coordinate height raster)
    dem_r, _ = rio_open(str(scen / 'warpedDEM.dem'))
    hgts = dem_r[ok][::37]
    fin = np.isfinite(hgts)
    lats, lons, hgts = lats[fin], lons[fin], hgts[fin]
    assert lats.size > 50 and (hgts > 1500).sum() > 5

    csv = tmp_path / 'stations.csv'
    pd.DataFrame({'ID': [f'P{i}' for i in range(lats.size)],
                  'Lat': lats, 'Lon': lons, 'Hgt_m': hgts}).to_csv(csv, index=False)
    aoi = StationFile(str(csv))
    wet, hydro = tropo_delay(t, str(proc), aoi, Zenith(), out_proj=4326)
    wet = np.asarray(wet)
    hydro = np.asarray(hydro)
    assert np.isfinite(wet).all() and np.isfinite(hydro).all()
    assert np.all((hydro > 1.0) & (hydro < 2.5))
    assert np.all((wet > 0.0) & (wet < 0.6))
    # terrain signal: high stations have shorter hydrostatic columns
    hi = hgts > 2000
    lo = hgts < 500
    if hi.any() and lo.any():
        assert hydro[hi].mean() < hydro[lo].mean() - 0.2


class TestWeatherPrefetchPipeline:
    """Acquisition/compute pipelining in the multi-date loop.

    No reference counterpart (the reference loop is strictly serial,
    cli/raider.py:252-303): while date k computes, date k+1's weather
    acquisition runs on a background worker. Results must be identical to
    the serial loop, and the overlap must actually happen.
    """

    WM_FILE = 'ERA-5_2020_01_30_T13_52_45_32N_35N_120W_115W.nc'

    def _cfg(self, tmp_path, out_dir):
        out_dir.mkdir(parents=True, exist_ok=True)
        return _write_cfg(tmp_path, {
            'date_group': {'date_list': [20200130, 20200131]},
            'height_group': {'height_levels': [0, 500]},
            'time_group': {'time': '13:52:45', 'interpolate_time': 'none'},
            'aoi_group': {'bounding_box': [33, 34, -118.25, -116.75]},
            'runtime_group': {
                'output_directory': str(out_dir),
                'weather_model_directory': str(out_dir / 'wm'),
                'verbose': False,
            },
        })

    def _fake_prepare(self, events=None, delay=0.0):
        import threading
        import time as _time

        wm = str(REF_WM_DIR / self.WM_FILE)
        lock = threading.Lock()

        def fake(model, tt, ll_bounds, makePlots=False):
            if events is not None:
                with lock:
                    events.append(('prep_start', tt.day))
            if delay:
                _time.sleep(delay)
            if events is not None:
                with lock:
                    events.append(('prep_end', tt.day))
            return wm

        return fake

    def test_prefetch_matches_serial(self, tmp_path, monkeypatch):
        """Same cubes out of the pipelined and serial loops (both dates
        driven off the same processed file, so date-1 == date-2 too)."""
        import raider_tpu.workflows.calc_delays as cd
        from raider_tpu.io import read_nc

        monkeypatch.setattr(cd, 'prepareWeatherModel', self._fake_prepare())
        results = {}
        for flag in ('0', '1'):
            out_dir = tmp_path / f'out{flag}'
            cfg = self._cfg(tmp_path, out_dir)
            monkeypatch.setenv('RAIDER_TPU_PREFETCH_WM', flag)
            monkeypatch.chdir(tmp_path)
            paths = cd.calcDelays([cfg])
            assert len(paths) == 2
            results[flag] = [read_nc(p) for p in paths]
        for d_serial, d_pref in zip(results['0'], results['1']):
            np.testing.assert_array_equal(np.asarray(d_serial['wet'].data),
                                          np.asarray(d_pref['wet'].data))
            np.testing.assert_array_equal(np.asarray(d_serial['hydro'].data),
                                          np.asarray(d_pref['hydro'].data))

    def test_acquisition_overlaps_compute(self, tmp_path, monkeypatch):
        """Date 2's acquisition must START while date 1's compute is still
        running (the whole point of the pipeline)."""
        import time as _time

        import raider_tpu.workflows.calc_delays as cd

        events = []
        monkeypatch.setattr(cd, 'prepareWeatherModel',
                            self._fake_prepare(events, delay=0.15))
        overlap_seen = []

        def fake_tropo(t, wm_file, aoi, los, **kw):
            if t.day == 30:
                deadline = _time.monotonic() + 10.0
                while _time.monotonic() < deadline:
                    if ('prep_start', 31) in events:
                        overlap_seen.append(True)
                        break
                    _time.sleep(0.01)
            # RuntimeError is the loop's keep-going path: no outputs needed
            raise RuntimeError('synthetic compute')

        monkeypatch.setattr(cd, 'tropo_delay', fake_tropo)
        monkeypatch.setenv('RAIDER_TPU_PREFETCH_WM', '1')
        monkeypatch.chdir(tmp_path)
        cfg = self._cfg(tmp_path, tmp_path / 'out_ov')
        paths = cd.calcDelays([cfg])
        assert paths == []
        assert overlap_seen == [True], (
            f'date-2 acquisition never overlapped date-1 compute: {events}')
        # and the serial loop must NOT overlap
        events.clear()
        overlap_seen.clear()
        monkeypatch.setenv('RAIDER_TPU_PREFETCH_WM', '0')

        def fake_tropo_serial(t, wm_file, aoi, los, **kw):
            if t.day == 30:
                assert ('prep_start', 31) not in events
            raise RuntimeError('synthetic compute')

        monkeypatch.setattr(cd, 'tropo_delay', fake_tropo_serial)
        cfg = self._cfg(tmp_path, tmp_path / 'out_serial')
        assert cd.calcDelays([cfg]) == []
