"""checkArgs semantics, mirroring reference test/test_checkArgs.py."""

import datetime as dt
import os
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
import yaml

from raider_tpu.workflows.check_args import checkArgs, get_raster_ext, makeDelayFileNames
from raider_tpu.workflows.config import read_run_config_file

from tests.conftest import REFERENCE_DIR

SCENARIO_2 = REFERENCE_DIR / 'test' / 'scenario_2'


def make_args(tmp_path, overrides=None):
    base = {
        'look_dir': 'right',
        'date_group': {'date_start': 20180101},
        'time_group': {'time': '00:00:00'},
        'aoi_group': {'bounding_box': [36, 37, -92, -91]},
        'height_group': {},
        'los_group': {},
        'runtime_group': {},
        'weather_model': 'ERA5',
    }
    for k, v in (overrides or {}).items():
        base[k] = {**base.get(k, {}), **v} if isinstance(v, dict) else v
    p = tmp_path / 'cfg.yaml'
    p.write_text(yaml.dump(base))
    return read_run_config_file(str(p))


class TestOutputFormat:
    def test_cube_keeps_h5(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        args = make_args(tmp_path, {
            'runtime_group': {'file_format': 'h5'},
            'height_group': {'height_levels': [10, 100, 1000]},
        })
        args = checkArgs(args)
        assert os.path.splitext(args.wetFilenames[0])[-1] == '.h5'

    def test_cube_falls_back_to_nc(self, tmp_path, monkeypatch):
        """Raster formats are invalid for cubes -> .nc
        (reference: checkArgs.py:60-69)."""
        monkeypatch.chdir(tmp_path)
        args = make_args(tmp_path, {
            'runtime_group': {'file_format': 'GTiff'},
            'height_group': {'height_levels': [10, 100, 1000]},
        })
        args = checkArgs(args)
        assert os.path.splitext(args.wetFilenames[0])[-1] == '.nc'

    def test_missing_station_file_raises(self):
        from raider_tpu.geometry.aoi import StationFile

        with pytest.raises(FileNotFoundError):
            StationFile(os.path.join('fake_dir', 'stations.csv'))

    def test_station_file_writes_template_csv(self, tmp_path, monkeypatch):
        if not SCENARIO_2.exists():
            pytest.skip('reference scenario_2 unavailable')
        monkeypatch.chdir(tmp_path)
        args = make_args(tmp_path, {'runtime_group': {'output_directory': str(tmp_path)}})
        from raider_tpu.geometry.aoi import StationFile

        args.aoi_group.aoi = StationFile(str(SCENARIO_2 / 'stations.csv'))
        args = checkArgs(args)
        out = pd.read_csv(args.wetFilenames[0])
        src = pd.read_csv(str(SCENARIO_2 / 'stations.csv'))
        assert out.shape[0] == src.drop_duplicates(subset=['Lat', 'Lon']).shape[0]
        assert args.wetFilenames[0].endswith('_ztd.csv')
        assert args.hydroFilenames[0] == ''


class TestOutputLocation:
    def test_defaults(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        args = checkArgs(make_args(tmp_path))
        out = args.runtime_group.output_directory
        wm = args.runtime_group.weather_model_directory
        assert os.path.abspath(out) == str(tmp_path)
        assert os.path.abspath(wm) == os.path.join(str(tmp_path), 'weather_files')
        assert Path(wm).is_dir()
        assert os.access(wm, os.W_OK)

    def test_custom_locations_pass_through(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        args = make_args(tmp_path, {'runtime_group': {
            'output_directory': str(tmp_path),
            'weather_model_directory': 'weather_dir',
        }})
        args = checkArgs(args)
        assert str(args.runtime_group.weather_model_directory) == 'weather_dir'
        assert Path('weather_dir').is_dir()


class TestFilenames:
    def test_content(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        args = checkArgs(make_args(tmp_path, {
            'height_group': {'height_levels': [0, 100]},
        }))
        assert 'Delay' not in args.wetFilenames[0]
        assert 'wet' in args.wetFilenames[0]
        assert 'hydro' in args.hydroFilenames[0]
        assert '20180101' in args.wetFilenames[0]
        assert len(args.hydroFilenames) == 1

    def test_make_delay_file_names(self):
        assert makeDelayFileNames(None, None, 'h5', 'name', Path('dir')) == (
            'dir/name_wet_ztd.h5', 'dir/name_hydro_ztd.h5')
        assert makeDelayFileNames(None, (), 'h5', 'name', Path('dir')) == (
            'dir/name_wet_std.h5', 'dir/name_hydro_std.h5')
        assert makeDelayFileNames(dt.datetime(2020, 1, 1, 1, 2, 3), None, 'h5',
                                  'model_name', Path('dir')) == (
            'dir/model_name_wet_20200101T010203_ztd.h5',
            'dir/model_name_hydro_20200101T010203_ztd.h5')
        assert makeDelayFileNames(dt.datetime(1900, 12, 31, 1, 2, 3), 'los', 'h5',
                                  'model_name', Path('dir')) == (
            'dir/model_name_wet_19001231T010203_std.h5',
            'dir/model_name_hydro_19001231T010203_std.h5')

    def test_get_raster_ext_rejects_unknown(self):
        with pytest.raises(ValueError):
            get_raster_ext('dummy_format')
        assert get_raster_ext('GTiff') == '.tiff'
        assert get_raster_ext('ENVI') == '.dat'


class TestValidators:
    """Mirrors reference test/test_validators.py items not covered elsewhere."""

    def test_enforce_wm(self):
        from raider_tpu.workflows.config import parse_weather_model

        with pytest.raises(NotImplementedError):
            parse_weather_model('notamodel', 'fakeaoi')

    def test_time_type(self):
        from raider_tpu.workflows.config import TimeGroup

        expected = dt.time(23, 0, 1)
        for s in ('T23:00:01.000000', 'T230001.000000', '230001.000000',
                  'T23:00:01', '23:00:01', 'T230001', '230001'):
            for tz in ('', 'z', '+0000'):
                assert TimeGroup.coerce_into_time(s + tz) == expected
        for s in ('T23:00', 'T2300', '23:00', '2300'):
            assert TimeGroup.coerce_into_time(s) == dt.time(23, 0, 0)
        with pytest.raises(ValueError):
            TimeGroup.coerce_into_time('foobar')

    def test_date_type(self):
        from raider_tpu.workflows.config import coerce_into_date

        assert coerce_into_date('2020-10-1') == dt.date(2020, 10, 1)
        assert coerce_into_date('2020101') == dt.date(2020, 10, 1)
        with pytest.raises(ValueError):
            coerce_into_date('foobar')

    def test_buffered_extent_and_in_out(self):
        from raider_tpu.workflows.config import getBufferedExtent, isInside, isOutside

        lats, lons = [10, 12], [-72, -74]
        ext = getBufferedExtent(lats, lons)
        assert np.allclose(ext, [10, 12, -74, -72])
        # scalar-pair, reversed, and array forms agree
        assert np.allclose(getBufferedExtent([12, 10], [-74, -72]), ext)
        assert np.allclose(
            getBufferedExtent(np.array(lats), np.array(lons)), ext)
        shifted = tuple(v + 1 for v in ext)
        assert isOutside(ext, shifted)
        assert not isOutside(ext, ext)
        assert isInside(ext, ext)
        assert not isInside(ext, shifted)

    def test_get_los_projected(self, tmp_path):
        from raider_tpu.workflows.config import LOSGroupUnparsed, get_los

        los_file = REFERENCE_DIR / 'test' / 'test_geom' / 'los.rdr'
        if not los_file.exists():
            pytest.skip('reference los raster unavailable')
        los = get_los(LOSGroupUnparsed(los_file=str(los_file),
                                       los_convention='isce',
                                       los_cube={}, ray_trace=False))
        assert not los.ray_trace()
        assert los.is_Projected()
