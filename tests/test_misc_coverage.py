"""Coverage for the small subsystems: 2-D geometry predicates, S3 helpers,
the ++process dispatcher, credential rc files, debug plots, WRF reader,
and the file logger."""

import datetime as dt
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))


# ------------------------------------------------------------------ geom2d
class TestGeom2D:
    POLY = [(-10.0, 30.0), (10.0, 30.0), (10.0, 50.0), (-10.0, 50.0)]

    def test_point_in_polygon(self):
        from raider_tpu.utils.geom2d import point_in_polygon

        assert point_in_polygon((0.0, 40.0), self.POLY)
        assert not point_in_polygon((20.0, 40.0), self.POLY)
        assert not point_in_polygon((0.0, 60.0), self.POLY)

    def test_concave_polygon(self):
        from raider_tpu.utils.geom2d import point_in_polygon

        # C-shape: the notch is outside
        poly = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 7), (7, 7), (7, 3), (0, 3)]
        assert point_in_polygon((8.5, 5.0), poly)
        assert not point_in_polygon((3.0, 5.0), poly)

    def test_box_predicates(self):
        from raider_tpu.utils.geom2d import (
            polygon_contains_box,
            polygon_intersects_box,
        )

        inside = (-5.0, 35.0, 5.0, 45.0)     # WSEN
        straddling = (5.0, 45.0, 15.0, 55.0)
        outside = (20.0, 60.0, 25.0, 65.0)
        assert polygon_contains_box(self.POLY, inside)
        assert not polygon_contains_box(self.POLY, straddling)
        assert polygon_intersects_box(self.POLY, inside)
        assert polygon_intersects_box(self.POLY, straddling)
        assert not polygon_intersects_box(self.POLY, outside)
        # box fully surrounding the polygon still intersects
        surrounding = (-20.0, 20.0, 20.0, 60.0)
        assert polygon_intersects_box(self.POLY, surrounding)
        assert not polygon_contains_box(self.POLY, surrounding)


# --------------------------------------------------------------------- aws
class TestAWS:
    def _fake_boto3(self, monkeypatch, calls):
        class Client:
            def upload_file(self, path, bucket, key, extra):
                calls.append(('upload', path, bucket, key, extra))

            def put_object_tagging(self, Bucket, Key, Tagging):
                calls.append(('tag', Bucket, Key, Tagging))

            def list_objects_v2(self, Bucket, Prefix):
                return {'Contents': [
                    {'Key': f'{Prefix}/product.png'},
                    {'Key': f'{Prefix}/product.nc'},
                ]}

            def download_file(self, bucket, key, name):
                calls.append(('download', bucket, key, name))

        monkeypatch.setitem(sys.modules, 'boto3',
                            types.SimpleNamespace(client=lambda kind: Client()))

    def test_upload(self, tmp_path, monkeypatch):
        from raider_tpu.workflows.aws import upload_file_to_s3

        calls = []
        self._fake_boto3(monkeypatch, calls)
        monkeypatch.chdir(tmp_path)   # GUNW jobs upload cwd-relative names
        (tmp_path / 'product.nc').write_bytes(b'x')
        upload_file_to_s3('product.nc', 'bkt', 'jobs/1')
        kind, path, bucket, key, extra = calls[0]
        assert bucket == 'bkt' and key == 'jobs/1/product.nc'
        assert extra == {'ContentType': 'application/x-netcdf'}
        assert calls[1][0] == 'tag' and calls[1][3]['TagSet'][0]['Value'] == 'product'

    def test_get_s3_file_picks_suffix(self, tmp_path, monkeypatch):
        from raider_tpu.workflows.aws import get_s3_file

        calls = []
        self._fake_boto3(monkeypatch, calls)
        monkeypatch.chdir(tmp_path)
        out = get_s3_file('bkt', 'jobs/1', '.nc')
        assert out.name == 'product.nc'
        assert calls[0] == ('download', 'bkt', 'jobs/1/product.nc', 'product.nc')
        assert get_s3_file('bkt', 'jobs/1', '.zip') is None

    def test_get_s3_file_empty_prefix_returns_none(self, monkeypatch):
        """boto3 omits 'Contents' when nothing matches the prefix; the
        caller (calcDelaysGUNW) relies on None for its graceful error."""
        from raider_tpu.workflows.aws import get_s3_file

        class Client:
            def list_objects_v2(self, Bucket, Prefix):
                return {'KeyCount': 0}

        monkeypatch.setitem(sys.modules, 'boto3',
                            types.SimpleNamespace(client=lambda kind: Client()))
        assert get_s3_file('bkt', 'nothing/here', '.nc') is None


# -------------------------------------------------------------- dispatcher
class TestDispatcher:
    def test_routes_and_forwards_args(self, monkeypatch):
        import raider_tpu.workflows.gnss as gnss
        from raider_tpu.cli.__main__ import main

        seen = {}
        monkeypatch.setattr(gnss, 'downloadGNSS', lambda argv: seen.update(argv=argv))
        monkeypatch.setattr(sys, 'argv',
                            ['raider', '++process', 'downloadGNSS', '--date', '20200130'])
        main()
        assert seen['argv'] == ['--date', '20200130']

    def test_rejects_unknown_process(self, monkeypatch):
        from raider_tpu.cli.__main__ import main

        monkeypatch.setattr(sys, 'argv', ['raider', '++process', 'nope'])
        with pytest.raises(SystemExit):
            main()


# ------------------------------------------------------------- credentials
class TestCredentials:
    def test_writes_cds_and_ecmwf_rc(self, tmp_path):
        from raider_tpu.wx.credentials import check_api

        check_api('ERA5', uid='42', key='secret', output_dir=str(tmp_path))
        txt = (tmp_path / '.cdsapirc').read_text()
        assert 'key: secret' in txt and 'url:' in txt

        check_api('HRES', uid='me@x.y', key='k2', output_dir=str(tmp_path))
        txt = (tmp_path / '.ecmwfapirc').read_text()
        assert '"email" : "me@x.y"' in txt and '"key"   : "k2"' in txt

    def test_netrc_appends_once(self, tmp_path):
        from raider_tpu.wx.credentials import check_api

        check_api('GMAO', uid='u', key='p', output_dir=str(tmp_path))
        first = (tmp_path / '.netrc').read_text()
        assert 'urs.earthdata.nasa.gov' in first
        check_api('GMAO', uid='u2', key='p2', output_dir=str(tmp_path),
                  update_rc_file=True)
        assert (tmp_path / '.netrc').read_text().count('urs.earthdata') == 1

    def test_env_fallback_and_error(self, tmp_path, monkeypatch):
        from raider_tpu.wx.credentials import check_api

        monkeypatch.delenv('RAIDER_ECMWF_ERA5_UID', raising=False)
        monkeypatch.delenv('RAIDER_ECMWF_ERA5_API_KEY', raising=False)
        with pytest.raises(ValueError, match='No credentials'):
            check_api('ERA5T', output_dir=str(tmp_path))
        monkeypatch.setenv('RAIDER_ECMWF_ERA5_UID', 'envuid')
        monkeypatch.setenv('RAIDER_ECMWF_ERA5_API_KEY', 'envkey')
        check_api('ERA5T', output_dir=str(tmp_path))
        assert 'envkey' in (tmp_path / '.cdsapirc').read_text()

    def test_unknown_model_is_noop(self, tmp_path):
        from raider_tpu.wx.credentials import check_api

        check_api('HRRR', output_dir=str(tmp_path))  # no rc file needed
        assert list(tmp_path.iterdir()) == []


# ------------------------------------------------------------------- plots
class TestPlots:
    def test_pqt_and_wh(self, tmp_path, monkeypatch):
        import matplotlib
        matplotlib.use('Agg')
        from test_wx import SyntheticModel

        from raider_tpu.wx.plots import plot_pqt, plot_wh

        m = SyntheticModel()
        m.load_weather()
        m._get_wet_refractivity()
        m._get_hydro_refractivity()
        monkeypatch.chdir(tmp_path)
        out1 = plot_pqt(m)
        out2 = plot_wh(m)
        assert (tmp_path / out1).stat().st_size > 0
        assert (tmp_path / out2).stat().st_size > 0


# --------------------------------------------------------------------- WRF
class TestWRF:
    def _write_wrfout(self, path):
        from scipy.io import netcdf_file

        nz, ny, nx = 4, 3, 5
        with netcdf_file(str(path), 'w') as f:
            f.TRUELAT1 = 30.0
            f.TRUELAT2 = 60.0
            f.MOAD_CEN_LAT = 40.0
            f.STAND_LON = -100.0
            f.createDimension('Time', 1)
            f.createDimension('bottom_top', nz)
            f.createDimension('bottom_top_stag', nz + 1)
            f.createDimension('south_north', ny)
            f.createDimension('west_east', nx)

            def var(name, dims, data):
                v = f.createVariable(name, 'f4', dims)
                v[:] = data

            lat2 = np.linspace(39.0, 41.0, ny)[:, None] + np.zeros((ny, nx))
            lon2 = np.linspace(-102.0, -98.0, nx)[None, :] + np.zeros((ny, nx))
            var('XLAT', ('Time', 'south_north', 'west_east'), lat2[None])
            var('XLONG', ('Time', 'south_north', 'west_east'), lon2[None])
            g0 = 9.8066
            zstag = np.linspace(0.0, 8000.0, nz + 1)
            var('PH', ('Time', 'bottom_top_stag', 'south_north', 'west_east'),
                np.zeros((1, nz + 1, ny, nx)))
            var('PHB', ('Time', 'bottom_top_stag', 'south_north', 'west_east'),
                np.broadcast_to((zstag * g0)[None, :, None, None], (1, nz + 1, ny, nx)).copy())
            var('T', ('Time', 'bottom_top', 'south_north', 'west_east'),
                np.zeros((1, nz, ny, nx)))          # theta = 300 K exactly
            pb = np.broadcast_to(
                (1e5 * np.exp(-0.5 * (zstag[:-1] + zstag[1:]) / 8000.0))[None, :, None, None],
                (1, nz, ny, nx)).copy()
            var('P', ('Time', 'bottom_top', 'south_north', 'west_east'),
                np.zeros((1, nz, ny, nx)))
            var('PB', ('Time', 'bottom_top', 'south_north', 'west_east'), pb)
            var('QVAPOR', ('Time', 'bottom_top', 'south_north', 'west_east'),
                np.full((1, nz, ny, nx), 1e-3))
        return pb[0]

    def test_load_weather(self, tmp_path):
        from raider_tpu.geodesy import LambertConformalConic
        from raider_tpu.wx.wrf import WRF

        p = tmp_path / 'wrfout_d01.nc'
        pb = self._write_wrfout(p)
        m = WRF()
        m.load_weather(file1=str(p))
        assert m._t.shape == (3, 5, 4)               # (y, x, z)
        # Poisson conversion: T = 300 * (p/1e5)^0.2854
        expect_t = 300.0 * (pb[:, 0, 0] / 1e5) ** 0.2854
        np.testing.assert_allclose(m._t[0, 0], expect_t, rtol=1e-5)
        # de-staggered heights are mid-levels of the staggered ladder
        np.testing.assert_allclose(np.diff(m._zs[0, 0]), 2000.0, rtol=1e-5)
        assert isinstance(m._proj, LambertConformalConic)
        assert (m._rh > 0).all() and np.isfinite(m._rh).all()

    def _write_plev(self, path, bad_units=False):
        """Post-processed WRF pressure-level file (the reference's input:
        P_PL 1-D, T_PL/RH_PL/GHT_PL cubes, units attrs, -999 nulls)."""
        from scipy.io import netcdf_file

        nz, ny, nx = 4, 3, 5
        with netcdf_file(str(path), 'w') as f:
            f.TRUELAT1 = 30.0
            f.TRUELAT2 = 60.0
            f.MOAD_CEN_LAT = 40.0
            f.STAND_LON = -100.0
            f.createDimension('Time', 1)
            f.createDimension('num_press_levels_stag', nz)
            f.createDimension('south_north', ny)
            f.createDimension('west_east', nx)

            p1d = np.array([1.0e5, 8.5e4, 7.0e4, 5.0e4])
            v = f.createVariable('P_PL', 'f4', ('Time', 'num_press_levels_stag'))
            v[:] = p1d[None]
            v.units = b'hPa' if bad_units else b'Pa'

            t = np.full((nz, ny, nx), 270.0)
            t[0, 0, 0] = -999.0                     # null -> nan
            v = f.createVariable('T_PL', 'f4',
                                 ('Time', 'num_press_levels_stag',
                                  'south_north', 'west_east'))
            v[:] = t[None]
            v.units = b'K'

            rh = np.full((nz, ny, nx), 50.0)
            v = f.createVariable('RH_PL', 'f4',
                                 ('Time', 'num_press_levels_stag',
                                  'south_north', 'west_east'))
            v[:] = rh[None]
            v.units = b'%'

            gh = np.broadcast_to(
                np.array([100.0, 1500.0, 3100.0, 5800.0])[:, None, None],
                (nz, ny, nx)).copy()
            gh[0, 1, 1] = -999.0                    # below-topography null
            v = f.createVariable('GHT_PL', 'f4',
                                 ('Time', 'num_press_levels_stag',
                                  'south_north', 'west_east'))
            v[:] = gh[None]
            v.units = b'm'
        return p1d

    def test_two_file_reference_interface(self, tmp_path):
        """The reference's load_weather(file1, file2) form (wrf.py:37-72):
        nodes file + plev file in either order; nulls -> nan; per-level
        nanmean height fill; 1-D pressure broadcast; spherical-LCC native
        regular grid from averaged transformed coordinates."""
        from raider_tpu.wx.wrf import WRF

        nodes = tmp_path / 'wrfout_d01.nc'
        plev = tmp_path / 'wrfplev_d01.nc'
        self._write_wrfout(nodes)
        p1d = self._write_plev(plev)

        m = WRF()
        m.load_weather(file1=str(nodes), file2=str(plev))
        assert m._t.shape == (3, 5, 4)               # (y, x, z)
        # -999 temperature decoded to nan
        assert np.isnan(m._t[0, 0, 0]) and m._t[1, 1, 0] == 270.0
        # null height filled with the level nanmean (all valid cells 100.0)
        np.testing.assert_allclose(m._zs[1, 1, 0], 100.0)
        # 1-D pressure broadcast across the grid
        np.testing.assert_allclose(m._p[2, 3], p1d, rtol=1e-6)
        # native regular grid: strictly monotonic 1-D LCC coordinates
        assert m._xs.ndim == 1 and m._ys.ndim == 1
        assert (np.diff(m._xs) > 0).all() and (np.diff(m._ys) > 0).all()
        # sphere radius 6370 km (the reference's bug-fixed constant)
        assert m._proj.ellipsoid.a == 6370e3

        # swapped argument order resolves via the KeyError fallback
        m2 = WRF()
        m2.load_weather(file1=str(plev), file2=str(nodes))
        np.testing.assert_array_equal(
            np.isnan(m2._t), np.isnan(m._t))
        np.testing.assert_allclose(m2._zs, m._zs)

    def test_unit_check_raises(self, tmp_path):
        from raider_tpu.wx.wrf import WRF, UnitTypeError

        nodes = tmp_path / 'wrfout_d01.nc'
        plev = tmp_path / 'wrfplev_d01.nc'
        self._write_wrfout(nodes)
        self._write_plev(plev, bad_units=True)
        with pytest.raises(UnitTypeError, match='pressure'):
            WRF().load_weather(file1=str(nodes), file2=str(plev))

    def test_fetch_refuses(self):
        from raider_tpu.wx.wrf import WRF

        with pytest.raises(RuntimeError, match='user-run'):
            WRF()._fetch('x.nc')


# ------------------------------------------------------------------ logger
class TestLogger:
    def test_file_handlers(self, tmp_path):
        from raider_tpu.logger import logger, set_logger_path

        set_logger_path(str(tmp_path))
        logger.error('boom %d', 7)
        assert 'boom 7' in (tmp_path / 'error.log').read_text()
        assert 'boom 7' in (tmp_path / 'debug.log').read_text()


class TestCredentialsNoOverwrite:
    def test_existing_rc_never_overwritten_without_flag(self, tmp_path):
        """Reference PR #652 semantics: an existing credentials file is left
        untouched even when uid/key are passed, unless update_rc_file."""
        from raider_tpu.wx.credentials import check_api

        rc = tmp_path / '.cdsapirc'
        rc.write_text('url: custom\nkey: user-managed\n')
        check_api('ERA5', uid='new', key='new-key', output_dir=str(tmp_path))
        assert 'user-managed' in rc.read_text()
        check_api('ERA5', uid='new', key='new-key', output_dir=str(tmp_path),
                  update_rc_file=True)
        assert 'new-key' in rc.read_text()
