"""Live-download paths exercised offline with mocked provider clients.

Follows the reference's mock-based strategy (test/test_GUNW.py,
test/test_weather_model.py): the provider SDKs (cdsapi, ecmwfapi, pydap,
herbie) are replaced with fakes injected into sys.modules, and each model's
``fetch`` is driven end to end: request construction is asserted against the
reference's conventions (param codes, area ordering, rounding), and for the
OpenDAP/NCMR/HRRR paths the produced raw files are round-tripped through the
real loaders.
"""

import datetime as dt
import sys
import types

import numpy as np
import pytest

from raider_tpu.wx.registry import get_wm_by_name

from tests.conftest import REFERENCE_DIR

BBOX = np.array([33.0, 34.5, -118.0, -116.5])
TIME = dt.datetime(2020, 1, 30, 14, 11, 0)


def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


# --------------------------------------------------------------------- CDS
class TestCDS:
    def test_era5_model_level_request(self, tmp_path, monkeypatch):
        calls = []

        class Client:
            def __init__(self, verify=0):
                pass

            def retrieve(self, name, req, target):
                calls.append((name, req, target))

        monkeypatch.setitem(sys.modules, 'cdsapi', _module('cdsapi', Client=Client))
        _, Model = get_wm_by_name('ERA5')
        m = Model()
        m.set_latlon_bounds(BBOX)
        out = tmp_path / 'era5_raw.nc'
        m.fetch(str(out), TIME)

        name, req, target = calls[0]
        assert name == 'reanalysis-era5-complete'
        # model levels: z/t/q/lnsp as grib codes (reference ecmwf.py:161-213)
        assert req['param'] == '129/130/133/152'
        assert req['levtype'] == 'ml' and req['levelist'] == 'all'
        # area is N/W/S/E
        lat_min, lat_max, lon_min, lon_max = m._ll_bounds
        assert req['area'] == [lat_max, lon_min, lat_min, lon_max]
        # hourly product: 14:11 rounds to 14:00
        assert req['date'] == '2020-01-30' and req['time'] == '14:00'
        assert target == str(out)

    def test_old_api_url_warning(self, tmp_path, monkeypatch, caplog):
        """Legacy /api/v2 CDS endpoints get the expired-credentials warning
        (reference: ecmwf.py:175-180, test_downloaders.py)."""
        import logging

        class Client:
            url = 'https://cds.climate.copernicus.eu/api/v2'

            def __init__(self, verify=0):
                pass

            def retrieve(self, name, req, target):
                pass

        monkeypatch.setitem(sys.modules, 'cdsapi', _module('cdsapi', Client=Client))
        _, Model = get_wm_by_name('ERA5')
        m = Model()
        m.set_latlon_bounds(BBOX)
        with caplog.at_level(logging.WARNING):
            m.fetch(str(tmp_path / 'era5_raw.nc'), TIME)
        assert 'Old CDS API configuration detected' in caplog.text

    def test_era5t_uses_cds_too(self, tmp_path, monkeypatch):
        calls = []

        class Client:
            def __init__(self, verify=0):
                pass

            def retrieve(self, name, req, target):
                calls.append(req)

        monkeypatch.setitem(sys.modules, 'cdsapi', _module('cdsapi', Client=Client))
        _, Model = get_wm_by_name('ERA5T')
        m = Model()
        m.set_latlon_bounds(BBOX)
        m.fetch(str(tmp_path / 'era5t_raw.nc'), TIME)
        assert calls and calls[0]['levtype'] == 'ml'


# -------------------------------------------------------------------- MARS
class TestMARS:
    def test_hres_request(self, tmp_path, monkeypatch):
        calls = []

        class ECMWFService:
            def __init__(self, kind):
                calls.append(('service', kind))

            def execute(self, req, target):
                calls.append(('execute', req, target))

        monkeypatch.setitem(
            sys.modules, 'ecmwfapi', _module('ecmwfapi', ECMWFService=ECMWFService))
        _, Model = get_wm_by_name('HRES')
        m = Model()
        m.set_latlon_bounds(BBOX)
        out = tmp_path / 'hres_raw.nc'
        m.fetch(str(out), TIME)

        assert calls[0] == ('service', 'mars')
        _, req, target = calls[1]
        assert req['param'] == '129/130/133/152'
        assert req['levtype'] == 'ml'
        assert target == str(out)

    def test_erai_legacy_dataserver(self, tmp_path, monkeypatch):
        calls = []

        class ECMWFDataServer:
            def retrieve(self, req):
                calls.append(req)

        monkeypatch.setitem(
            sys.modules, 'ecmwfapi',
            _module('ecmwfapi', ECMWFDataServer=ECMWFDataServer))
        _, Model = get_wm_by_name('ERAI')
        m = Model()
        m.set_latlon_bounds(BBOX)
        # ERA-I ended 2019-08; use an in-range time (6-hourly product)
        t = dt.datetime(2018, 1, 30, 13, 0, 0)
        m.fetch(str(tmp_path / 'erai_raw.nc'), t)
        req = calls[0]
        assert req['dataset'] == 'interim'
        assert req['param'] == 'lnsp/q/z/t'
        # the reference rounds ECMWF-family times at 1 h (TIME_RES['ECMWF'],
        # weatherModel.py:24-31), so 13:00 passes through unchanged
        assert req['time'] == '13:00:00'
        assert req['target'] == str(tmp_path / 'erai_raw.nc')


# ----------------------------------------------------------------- OpenDAP
class _FakeDapVar:
    """pydap-style variable: slicing returns an object with ``.data``.

    Backed by a single (z, lat, lon) cube; the time index (the GEOS/MERRA
    archives have thousands of steps) is accepted and ignored.
    """

    def __init__(self, arr):
        self._arr = arr

    def __getitem__(self, sl):
        t_ind = sl[0]
        assert isinstance(t_ind, (int, np.integer)) and t_ind >= 0
        out = lambda: None  # noqa: E731
        out.data = self._arr[sl[1:]]
        return out


def _install_fake_pydap(monkeypatch, ds, seen):
    def setup_session(user, pw, check_url=None):
        seen['credentials'] = (user, pw)
        return 'session'

    def open_url(url, session=None):
        seen['url'] = url
        return ds

    monkeypatch.setitem(sys.modules, 'pydap', _module('pydap'))
    monkeypatch.setitem(sys.modules, 'pydap.cas', _module('pydap.cas'))
    monkeypatch.setitem(sys.modules, 'pydap.cas.urs',
                        _module('pydap.cas.urs', setup_session=setup_session))
    monkeypatch.setitem(sys.modules, 'pydap.client',
                        _module('pydap.client', open_url=open_url))


class TestOpenDAP:
    @pytest.mark.parametrize('name,varmap', [
        ('GMAO', {'q': 'qv', 'p': 'pl', 't': 't', 'h': 'h'}),
        ('MERRA2', {'q': 'QV', 'p': 'PL', 't': 'T', 'h': 'H'}),
    ])
    def test_fetch_roundtrip(self, tmp_path, monkeypatch, name, varmap):
        _, Model = get_wm_by_name(name)
        m = Model()
        m.set_latlon_bounds(BBOX)

        # global synthetic atmosphere on the model's native index grid
        # (z, lat, lon); _FakeDapVar supplies any requested time index
        nlat = int(180.0 / m._lat_res) + 1
        nlon = int(360.0 / m._lon_res)
        nz = 72
        rng = np.random.default_rng(3)
        shape = (nz, nlat, nlon)
        z_prof = np.linspace(65000.0, -400.0, nz)  # top-down like GEOS
        full = {
            varmap['q']: np.full(shape, 1e-3) + 1e-5 * rng.random(shape),
            varmap['p']: np.broadcast_to(
                101325.0 * np.exp(-z_prof / 8000.0)[:, None, None], shape).copy(),
            varmap['t']: np.full(shape, 270.0),
            varmap['h']: np.broadcast_to(z_prof[:, None, None], shape).copy(),
        }
        ds = {k: _FakeDapVar(v) for k, v in full.items()}
        seen = {}
        _install_fake_pydap(monkeypatch, ds, seen)
        monkeypatch.setattr(
            'raider_tpu.wx.gmao._earthdata_credentials', lambda: ('user', 'pw'))
        # merra2 binds the symbol at import time
        monkeypatch.setattr(
            'raider_tpu.wx.merra2._earthdata_credentials', lambda: ('user', 'pw'))

        out = tmp_path / f'{name}_raw.nc'
        m.fetch(str(out), TIME)
        assert out.exists()
        assert seen['credentials'] == ('user', 'pw')
        assert ('gesdisc' in seen['url']) or ('nccs.nasa.gov' in seen['url'])

        # round-trip: the real loader consumes the file we just wrote
        m2 = Model()
        m2.set_latlon_bounds(BBOX)
        m2.load_weather(f=str(out))
        assert m2._p.ndim == 3 and m2._t.shape == m2._p.shape
        assert np.all(np.diff(m2._zs, axis=2) > 0), 'heights ascending'
        lat_span = (np.nanmin(m2._lats), np.nanmax(m2._lats))
        assert lat_span[0] <= BBOX[0] and lat_span[1] >= BBOX[1]
        np.testing.assert_allclose(np.nanmean(m2._t), 270.0, rtol=1e-6)


# -------------------------------------------------------------------- NCMR
class TestNCMR:
    # 10x-coarsened resolution keeps the synthetic GLOBAL day file small
    # (full NCUM resolution would be a >2 GB netCDF-3); the absolute crop
    # arithmetic (grid origins, 0-360 wrap) is unchanged
    LAT_RES = 1.1718750
    LON_RES = 1.7578125

    def _write_day_file(self, path):
        from scipy.io import netcdf_file

        lats = np.arange(-89.94141, 90.0, self.LAT_RES)
        lons = np.arange(0.087890625, 360.0, self.LON_RES)
        nz = 71
        with netcdf_file(str(path), 'w') as f:
            f.createDimension('level', nz)
            f.createDimension('latitude', lats.size)
            f.createDimension('longitude', lons.size)
            la = f.createVariable('latitude', 'f8', ('latitude',))
            la[:] = lats
            lo = f.createVariable('longitude', 'f8', ('longitude',))
            lo[:] = lons
            # keep the global cube small in RAM: f4 and few levels would be
            # nicer but the loader skips level 0 and wants 71
            for nm, fill in (('air_temperature', 270.0),
                             ('specific_humidity', 1e-3),
                             ('air_pressure', 5e4),
                             ('height_levels', 100.0)):
                v = f.createVariable(nm, 'f4', ('level', 'latitude', 'longitude'))
                arr = np.full((nz, 1, 1), fill, dtype=np.float32)
                if nm == 'height_levels':
                    arr = arr + np.arange(nz, dtype=np.float32)[:, None, None] * 500.0
                if nm == 'air_pressure':
                    arr = arr - np.arange(nz, dtype=np.float32)[:, None, None] * 500.0
                v[:] = np.broadcast_to(arr, (nz, lats.size, lons.size))

    def test_fetch_via_mocked_download(self, tmp_path, monkeypatch):
        login = tmp_path / '.ncmrlogin'
        login.write_text('url: https://ncmr.example\nusername: u\npassword: p\n')
        import raider_tpu.wx.ncmr as ncmr_mod
        monkeypatch.setattr(
            ncmr_mod, 'read_NCMR_loginInfo',
            lambda filepath=None: ('https://ncmr.example', 'u', 'p'))

        fetched = {}

        def fake_urlretrieve(remote, local, reporthook=None):
            fetched['remote'] = remote
            self._write_day_file(local)

        monkeypatch.setattr('urllib.request.urlretrieve', fake_urlretrieve)

        _, Model = get_wm_by_name('NCMR')
        m = Model()
        m._lat_res = self.LAT_RES
        m._lon_res = self.LON_RES
        m.set_latlon_bounds(BBOX)
        out = tmp_path / 'ncmr_raw.nc'
        m.fetch(str(out), TIME)
        assert fetched['remote'] == (
            'https://ncmr.example/20200130/ncum_ana_ml_20200130.nc')
        assert out.exists()

        m2 = Model()
        m2.set_latlon_bounds(BBOX)
        m2.load_weather(f=str(out))
        assert np.all(np.diff(m2._zs, axis=2) > 0)
        # requested bbox (incl. 0-360 -> -180..180 wrap) is covered to within
        # the (coarsened) grid cell the reference's floor-indexing allows
        assert np.nanmin(m2._lons) <= BBOX[2] + self.LON_RES
        assert np.nanmax(m2._lons) >= BBOX[3] - 2 * self.LON_RES


# ---------------------------------------------------------------- GNSS/UNR
class TestGNSSDownload:
    def _llh_out(self, tmp_path):
        d = tmp_path / 'NGLStationPages'
        d.mkdir(exist_ok=True)
        (d / 'llh.out').write_text(
            'TORP  33.80  242.30  50.0\n'
            'FARB  37.70  237.00  10.0\n'
            'POLR  80.00  200.00  5.0\n'
        )
        return str(tmp_path) + '/'

    def test_station_holdings_bbox_filter(self, tmp_path):
        from raider_tpu.workflows.gnss import get_stats_by_llh

        base = self._llh_out(tmp_path)
        df = get_stats_by_llh(llhBox=[33.0, 35.0, 241.0, 243.0], baseURL=base)
        assert list(df['ID']) == ['TORP']
        # UNR lons are 0-360; the holdings are normalized to [-180, 180)
        np.testing.assert_allclose(df['Lon'].values, [-117.7])

    def test_download_tropo_delays_writes_manifest(self, tmp_path, monkeypatch):
        import raider_tpu.workflows.gnss as gnss

        seen = []

        class FakeResp:
            status_code = 200

            def iter_content(self, chunk_size=2048):
                return [b'PK\x03\x04fake']

        class FakeSession:
            def get(self, url, stream=False):
                seen.append(('get', url))
                r = FakeResp()
                r.status_code = 404 if 'POLR' in url else 200
                return r

            def head(self, url):
                seen.append(('head', url))
                return FakeResp()

        monkeypatch.setattr(gnss, '_retry_session', lambda retries=10: FakeSession())

        # virtual-access mode (HEAD only)
        gnss.download_tropo_delays(['torp', 'farb'], [2020], writeDir=str(tmp_path))
        manifest = tmp_path / 'UNRgnssStationList_overbbox_withpaths.csv'
        assert manifest.exists()
        import pandas as pd
        df = pd.read_csv(manifest)
        assert set(df['ID']) == {'torp', 'farb'}
        assert all(p.startswith('https://geodesy.unr.edu/gps_timeseries/trop/')
                   for p in df['path'])
        assert ('head', 'https://geodesy.unr.edu/gps_timeseries/trop/TORP/TORP.2020.trop.zip') in seen

        # download mode writes the archive bytes; 404 stations error out
        out = gnss.download_UNR('torp', 2020, writeDir=str(tmp_path), download=True)
        assert (tmp_path / 'TORP.2020.trop.zip').read_bytes() == b'PK\x03\x04fake'
        assert out['path'].endswith('TORP.2020.trop.zip')
        with pytest.raises(ValueError):
            gnss.download_UNR('polr', 2020, writeDir=str(tmp_path), download=True)


# -------------------------------------------------------------------- HRRR
class _FakeXrVar:
    def __init__(self, data, dims):
        self.data = np.asarray(data)
        self.dims = dims
        self.attrs = {}

    def to_numpy(self):
        return self.data

    @property
    def values(self):
        return self.data


class _FakeXrDataset:
    """The minimal xarray surface download_hrrr_file drives."""

    def __init__(self, variables, coords):
        self._vars = dict(variables)
        self._coords = dict(coords)

    @property
    def _coord_names(self):
        return set(self._coords)

    @property
    def data_vars(self):
        return list(self._vars)

    def __getattr__(self, k):
        for src in ('_vars', '_coords'):
            d = object.__getattribute__(self, src)
            if k in d:
                return d[k]
        raise AttributeError(k)

    def __getitem__(self, k):
        return self._vars.get(k) or self._coords[k]

    def __setitem__(self, k, v):
        if isinstance(v, np.ndarray):
            self._coords[k] = _FakeXrVar(v, (k,))
        else:
            self._vars[k] = _FakeXrVar(np.int64(v), ())

    def rename(self, mapping):
        v = {mapping.get(k, k): x for k, x in self._vars.items()}
        c = {mapping.get(k, k): x for k, x in self._coords.items()}
        for x in list(v.values()) + list(c.values()):
            x.dims = tuple(mapping.get(d, d) for d in x.dims)
        return _FakeXrDataset(v, c)

    def isel(self, x=None, y=None):
        sel = {'x': x or slice(None), 'y': y or slice(None)}

        def cut(var):
            sl = tuple(sel.get(d, slice(None)) for d in var.dims)
            out = _FakeXrVar(var.data[sl], var.dims)
            out.attrs = dict(var.attrs)
            return out

        return _FakeXrDataset({k: cut(v) for k, v in self._vars.items()},
                              {k: cut(v) for k, v in self._coords.items()})

    def to_netcdf(self, path, engine=None):
        from raider_tpu.io.ncdf import Dataset, Variable, write_nc

        coords = {k: Variable(v.dims, v.data, dict(v.attrs))
                  for k, v in self._coords.items() if v.data.ndim <= 1}
        variables = {k: Variable(v.dims, v.data, dict(v.attrs))
                     for k, v in self._vars.items()}
        variables.update({k: Variable(v.dims, v.data, dict(v.attrs))
                          for k, v in self._coords.items() if v.data.ndim > 1})
        write_nc(Dataset(coords=coords, variables=variables, attrs={}), str(path))


class TestHRRR:
    def test_download_roundtrip(self, tmp_path, monkeypatch):
        from raider_tpu.geodesy.crs import Geographic
        from raider_tpu.wx.hrrr import HRRR_CONUS_PROJ, download_hrrr_file, load_weather_hrrr
        from raider_tpu.geodesy import transform_points

        # native LCC grid patch covering the bbox
        proj = HRRR_CONUS_PROJ
        geo = Geographic()
        x0, y0 = (float(np.asarray(v)) for v in transform_points(
            geo, proj, np.array(-117.25), np.array(33.75))[:2])
        xs = x0 + 3000.0 * np.arange(-40, 41)
        ys = y0 + 3000.0 * np.arange(-40, 41)
        xg, yg = np.meshgrid(xs, ys)
        lon2, lat2 = (np.asarray(v) for v in proj.inverse(xg, yg))
        nz = 5
        shp = (nz, ys.size, xs.size)
        variables = {
            'gh': _FakeXrVar(np.linspace(0, 20000, nz)[:, None, None]
                             + np.zeros(shp), ('hybrid', 'y', 'x')),
            't': _FakeXrVar(np.full(shp, 270.0), ('hybrid', 'y', 'x')),
            'q': _FakeXrVar(np.full(shp, 1e-3), ('hybrid', 'y', 'x')),
            'pres': _FakeXrVar(np.linspace(1e5, 5e3, nz)[:, None, None]
                               + np.zeros(shp), ('hybrid', 'y', 'x')),
        }
        coords = {
            'hybrid': _FakeXrVar(np.arange(nz), ('hybrid',)),
            'latitude': _FakeXrVar(lat2, ('y', 'x')),
            'longitude': _FakeXrVar(lon2 % 360.0, ('y', 'x')),
        }
        fake_ds = _FakeXrDataset(variables, coords)
        seen = {}

        class Herbie:
            def __init__(self, date, model=None, product=None, fxx=0,
                         overwrite=False, verbose=False, save_dir=None):
                seen['date'] = date
                seen['model'] = model
                seen['product'] = product

            def xarray(self, regex, verbose=False):
                seen['regex'] = regex
                return [fake_ds]

        monkeypatch.setitem(sys.modules, 'herbie', _module('herbie', Herbie=Herbie))

        out = tmp_path / 'hrrr_raw.nc'
        download_hrrr_file(BBOX, dt.datetime(2020, 1, 30, 14), str(out))
        assert seen['model'] == 'hrrr' and seen['product'] == 'nat'
        assert seen['regex'] == ':(SPFH|PRES|TMP|HGT):'
        assert out.exists()

        xs_l, ys_l, lons, lats, qs, temps, pres, geo_hgt, proj_l = load_weather_hrrr(str(out))
        assert proj_l == HRRR_CONUS_PROJ
        assert np.all(np.diff(geo_hgt, axis=2) > 0)
        assert (lons <= 180.0).all()
        np.testing.assert_allclose(temps, 270.0)


class TestGNSSStationList:
    """Station-list plumbing (reference: test_gnss.py:94-160)."""

    STATIONS = REFERENCE_DIR / 'test' / 'scenario_2' / 'stations.csv'

    def test_lon_convention_enforced(self):
        from raider_tpu.workflows.gnss import get_stats_by_llh

        with pytest.raises(ValueError):
            get_stats_by_llh(llhBox=[10, 18, -93, -88])  # must be 0-360

    def test_get_station_list_from_file(self):
        import pandas as pd

        from raider_tpu.workflows.gnss import get_station_list

        if not self.STATIONS.exists():
            pytest.skip('reference stations.csv unavailable')
        stations, df = get_station_list(stationFile=str(self.STATIONS),
                                        writeStationFile=False)
        assert isinstance(stations, list)
        assert isinstance(df, pd.DataFrame)
        assert 'CAPE' in stations and 'FGNW' in stations

    def test_get_station_list_writes_file(self, tmp_path, monkeypatch):
        from raider_tpu.workflows.gnss import get_station_list

        if not self.STATIONS.exists():
            pytest.skip('reference stations.csv unavailable')
        monkeypatch.chdir(tmp_path)
        stations, output_file = get_station_list(stationFile=str(self.STATIONS))
        assert isinstance(output_file, str)
        assert (tmp_path / 'gnssStationList_overbbox.csv').exists()

    def test_download_rejects_unknown_repo(self):
        from raider_tpu.workflows.gnss import download_tropo_delays

        with pytest.raises(NotImplementedError):
            download_tropo_delays(stats=['GUAT'], years=[2022],
                                  gps_repo='dummy_repo')

    def test_download_no_data_raises(self, monkeypatch):
        import raider_tpu.workflows.gnss as gnss
        from raider_tpu.wx.exceptions import NoStationDataFoundError

        class R404:
            status_code = 404

        class S:
            def head(self, url):
                return R404()

        monkeypatch.setattr(gnss, '_retry_session', lambda retries=10: S())
        with pytest.raises(NoStationDataFoundError):
            gnss.download_tropo_delays(stats=['dummy_station'], years=[2022])

    def test_filter_by_bbox(self):
        import pandas as pd

        from raider_tpu.workflows.gnss import filterToBBox

        df = pd.DataFrame({'ID': ['A', 'B'], 'Lat': [34.0, 50.0],
                           'Lon': [242.0, 242.0]})
        out = filterToBBox(df, [33, 35, 241, 243])
        assert list(out['ID']) == ['A']
        # negative-lon station frames get the box wrapped for them
        df2 = pd.DataFrame({'ID': ['A', 'B'], 'Lat': [34.0, 50.0],
                            'Lon': [-118.0, -118.0]})
        out2 = filterToBBox(df2, [33, 35, 241, 243])
        assert list(out2['ID']) == ['A']
        with pytest.raises(ValueError):
            filterToBBox(df, [33, 35, -119, -117])
        with pytest.raises(KeyError):
            filterToBBox(pd.DataFrame({'ID': ['A']}), [33, 35, 241, 243])
