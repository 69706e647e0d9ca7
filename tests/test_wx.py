"""Weather-model pipeline tests, mirroring the reference's MockWeatherModel
strategy (reference: test/test_weather_model.py:96-403): synthetic cubes with
closed-form refractivities and ZTDs."""

import datetime

import numpy as np
import pytest

from raider_tpu.constants import _ZMIN, _ZREF
from raider_tpu.wx import WeatherModel, find_svp
from raider_tpu.wx.base import fillna3d, pad_lower

_LAT0, _LON0 = 35.0, -100.0


class SyntheticModel(WeatherModel):
    """Analog of the reference's MockWeatherModel with closed-form truth."""

    def __init__(self):
        super().__init__()
        self._k1 = 1
        self._k2 = 1
        self._k3 = 1
        self._Name = 'MOCK'
        self._valid_range = (
            datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc),
            datetime.datetime.now(datetime.timezone.utc),
        )
        self._lag_time = datetime.timedelta(days=15)

    def _fetch(self, out):
        pass

    def load_weather(self, *args, **kwargs):
        n_z = 32
        self._ys = np.arange(-2, 3) + _LAT0
        self._xs = np.arange(-3, 4) + _LON0
        self._zs = np.linspace(0, 1e5, n_z)
        self._t = np.ones((len(self._ys), len(self._xs), n_z))
        self._e = self._t.copy()
        self._e[:, 3:, :] = 2

        _p = np.arange(31, -1, -1)
        self._p = np.broadcast_to(_p, self._t.shape)

        self._true_hydro_refr = np.broadcast_to(_p, self._t.shape)
        self._true_wet_ztd = 1e-6 * 2 * np.broadcast_to(np.flip(self._zs), self._t.shape)
        self._true_wet_ztd = self._true_wet_ztd.copy()
        self._true_wet_ztd[:, 3:] = 2 * self._true_wet_ztd[:, 3:]

        self._true_hydro_ztd = np.zeros(self._t.shape)
        for layer in range(len(self._zs)):
            self._true_hydro_ztd[:, :, layer] = 1e-6 * 0.5 * (self._zs[-1] - self._zs[layer]) * _p[layer]

        self._true_wet_refr = 2 * np.ones(self._t.shape)
        self._true_wet_refr[:, 3:] = 4


@pytest.fixture
def model():
    return SyntheticModel()


def test_defaults(model):
    assert model._zmin == _ZMIN
    assert model._zmax == _ZREF
    assert model.Model() == 'MOCK'
    assert model._humidityType == 'q'


def test_svp_golden():
    """Golden values from the reference test suite
    (test/test_weather_model.py:370-380)."""
    t = np.arange(0, 100, 10) + 273.15
    svp_true = np.array([
        611.21, 1227.5981, 2337.2825, 4243.5093,
        7384.1753, 12369.2295, 20021.443, 31419.297,
        47940.574, 71305.16,
    ])
    assert np.allclose(np.asarray(find_svp(t)), svp_true)


def test_ztd_closed_form(model):
    """Reference test_ztd (test/test_weather_model.py:382-403)."""
    m = model
    m.load_weather()
    m._get_wet_refractivity()
    assert np.allclose(m._wet_refractivity, m._true_wet_refr)
    m._get_hydro_refractivity()
    assert np.allclose(m._hydrostatic_refractivity, m._true_hydro_refr)

    m._get_ztd()
    assert np.allclose(m._wet_ztd, m._true_wet_ztd)
    assert np.allclose(m._hydrostatic_ztd, m._true_hydro_ztd)


def test_uniform_in_z(model):
    m = model
    m.load_weather()
    # perturb one column's zs so interpolation actually does something
    zs3 = np.broadcast_to(m._zs, m._t.shape).copy()
    zs3[0, 0] = m._zs + 500.0
    m._zs = zs3
    m._t = np.linspace(200, 300, 32) * np.ones_like(m._t)
    m._p = np.asarray(m._p, dtype=np.float64).copy()
    m._e = np.asarray(m._e, dtype=np.float64).copy()
    target = np.linspace(0, 1e5, 32)
    m._uniform_in_z(_zlevels=target)
    assert m._zs.shape == (32,)
    # the shifted column should be interpolated (t at z is t((z-500) index space))
    expected = np.interp(target, zs3[0, 0], np.linspace(200, 300, 32), left=np.nan, right=np.nan)
    got = m._t[0, 0]
    mask = ~np.isnan(expected)
    np.testing.assert_allclose(got[mask], expected[mask], rtol=1e-6)
    # out-of-range -> nan
    assert np.isnan(got[0])


def test_checktime(model):
    with pytest.raises(Exception):
        model.checkTime(datetime.datetime(1960, 1, 1))
    with pytest.raises(Exception):
        model.checkTime(datetime.datetime.now())  # within lag
    model.checkTime(datetime.datetime(2020, 1, 1))


def test_fillna3d():
    a = np.array([[[np.nan, np.nan, 1.0, 2.0, np.nan, 3.0, np.nan, np.nan]]])
    out = fillna3d(a, fill_value=9.0)
    np.testing.assert_allclose(out[0, 0], [1, 1, 1, 2, 2.5, 3, 9, 9])


def test_pad_lower():
    a = np.array([[[np.nan, 5.0, 6.0]]])
    out = pad_lower(a)
    # prepends the first non-NaN value (5.0) below the existing column
    np.testing.assert_allclose(out[0, 0], [5.0, np.nan, 5.0, 6.0], equal_nan=True)


def test_filename_convention(model):
    from raider_tpu.wx.base import make_weather_model_filename

    t = datetime.datetime(2020, 1, 30, 13, 52, 45)
    name = make_weather_model_filename('ERA-5', t, [32.1, 34.9, -119.8, -115.4])
    assert name == 'ERA-5_2020_01_30_T13_52_45_32N_35N_120W_115W.nc'


def test_calcgeoh_basic():
    """Pressure decreases with altitude; geoheight increases."""
    from raider_tpu.wx.calcgeoh import calcgeoh

    nl = 5
    a = np.linspace(0, 100.0, nl + 1)[::-1]  # small a
    b = np.linspace(1.0, 0.0, nl + 1)[::-1]  # b: 0 at top... build genuinely
    a = np.array([0.0, 2000, 8000, 12000, 6000, 0.0])
    b = np.array([0.0, 0.0, 0.02, 0.2, 0.6, 1.0])
    lnsp = np.full((2, 2), np.log(1e5))
    t = np.full((nl, 2, 2), 280.0)
    q = np.zeros((nl, 2, 2))
    z = np.zeros((2, 2))
    geopot, pres, geoht = calcgeoh(lnsp, t, q, z, a, b, 287.06, nl)
    # level nl-1 is the bottom
    assert np.all(np.diff(pres[:, 0, 0]) > 0)  # top (idx 0) lowest pressure
    assert np.all(np.diff(geoht[:, 0, 0]) < 0)  # heights decrease toward bottom
    assert geoht[-1, 0, 0] > 0
