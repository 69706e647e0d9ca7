"""Remaining AOI/workflow paths: Geocube, NaN pixels, config generation."""

import datetime as dt
import os

import numpy as np
import pytest

from tests.conftest import REF_WM_DIR


class TestGeocubeAoi:
    def test_cube_on_geocube_grid(self, era5_la_file, tmp_path):
        """Geocube AOI: heights come from the cube file; output is a Dataset
        (reference: delay.py:80-82, llreader.py:366-394)."""
        from raider_tpu.delay import tropo_delay
        from raider_tpu.geometry.aoi import Geocube
        from raider_tpu.geometry.los import Zenith
        from raider_tpu.io import Dataset, write_nc
        from raider_tpu.io.ncdf import Variable

        lats = np.linspace(33.0, 34.0, 8)
        lons = np.linspace(-118.2, -117.0, 9)
        heights = np.array([0.0, 250.0, 750.0])
        ds = Dataset(
            coords={
                'latitude': Variable(('latitude',), lats, {}),
                'longitude': Variable(('longitude',), lons, {}),
                'heights': Variable(('heights',), heights, {}),
            },
            variables={}, attrs={},
        )
        cube_path = tmp_path / 'geocube.nc'
        write_nc(ds, cube_path)

        aoi = Geocube(str(cube_path), cube_spacing_in_m=2000.0)
        assert aoi.bounds() == [33.0, 34.0, -118.2, -117.0]
        aoi.add_buffer(0.25)
        aoi.set_output_xygrid(4326)

        out, none = tropo_delay(
            dt.datetime(2020, 1, 30, 13, 52, 45), str(era5_la_file), aoi, Zenith(),
        )
        assert none is None
        assert np.asarray(out['wet'].data).shape[0] == heights.size
        np.testing.assert_array_equal(np.asarray(out.coords['z'].data), heights)


class TestNanPixels:
    def test_raytracing_nan_pixels_propagate(self):
        """NaN target pixels -> NaN look vectors -> NaN delays
        (reference: losreader.py:235-254, delay.py:187-188)."""
        from raider_tpu.geometry.los import Raytracing
        from tests.test_orbit import synthetic_orbit

        orb = synthetic_orbit(dt.datetime(2020, 1, 30, 13, 52, 45))
        los = Raytracing(orbit=orb, time=dt.datetime(2020, 1, 30, 13, 52, 45))
        xyz = np.array([[[-2474852.0, -4713912.0, 3500000.0],
                         [np.nan, np.nan, np.nan]]])
        look = los.getLookVectors(0.0, None, xyz)
        assert np.isfinite(look[0, 0]).all()
        assert np.isnan(look[0, 1]).all()
        np.testing.assert_allclose(np.linalg.norm(look[0, 0]), 1.0, rtol=1e-12)


class TestCliFlows:
    def test_generate_config_copies_examples(self, tmp_path, monkeypatch):
        """calcDelays -g copies the example config into cwd then exits
        (reference: cli/raider.py:212-224)."""
        from raider_tpu.workflows.calc_delays import calcDelays

        monkeypatch.chdir(tmp_path)
        with pytest.raises(SystemExit):
            calcDelays(['--generate_config', 'template'])
        assert (tmp_path / 'template.yaml').exists()

        with pytest.raises(SystemExit):
            calcDelays(['-g', 'example_LA_bbox'])
        assert (tmp_path / 'example_LA_bbox.yaml').exists()

    @pytest.mark.skipif(not REF_WM_DIR.exists(), reason='reference data unavailable')
    def test_download_only_skips_processing(self, tmp_path, monkeypatch):
        import yaml

        from raider_tpu.workflows.calc_delays import calcDelays

        cfg = {
            'look_dir': 'right',
            'weather_model': 'ERA5',
            'date_group': {'date_start': 20200130},
            'time_group': {'time': '13:52:45', 'interpolate_time': 'none'},
            'aoi_group': {'bounding_box': [33, 34, -118.25, -116.75]},
            'height_group': {},
            'los_group': {},
            'runtime_group': {
                'output_directory': str(tmp_path),
                'weather_model_directory': str(REF_WM_DIR),
                'verbose': False,
                'download_only': True,
            },
        }
        p = tmp_path / 'cfg.yaml'
        p.write_text(yaml.dump(cfg))
        monkeypatch.chdir(tmp_path)
        paths = calcDelays([str(p)])
        assert paths == []  # no delay outputs in download-only mode
        assert not list(tmp_path.glob('*_tropo_*'))
