"""prepareWeatherModel pipeline: load -> write -> reuse -> containment.

Also closes the loop: the engine consumes weather files written by OUR
writer (not just reference-produced files).
"""

import datetime as dt

import numpy as np
import pytest

from raider_tpu.geodesy import Geographic
from raider_tpu.wx.base import WeatherModel
from raider_tpu.wx.exceptions import ExistingWeatherModelTooSmall
from raider_tpu.wx.process import prepareWeatherModel


class FileBackedSyntheticModel(WeatherModel):
    """Synthetic model whose _fetch writes a marker and load_weather builds
    analytic cubes: T = 280 - 0.0065 z (sub-10km), p barometric, e small."""

    def __init__(self):
        super().__init__()
        self._k1 = 0.776
        self._k2 = 0.233
        self._k3 = 3.75e3
        self._Name = 'MOCK'
        self._dataset = 'mock'
        self._lat_res = 0.25
        self._lon_res = 0.25
        self._valid_range = (
            dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc),
            dt.datetime.now(dt.timezone.utc),
        )
        self._lag_time = dt.timedelta(days=1)
        self._proj = Geographic()
        self.fetch_count = 0

    def _fetch(self, out):
        self.fetch_count += 1
        with open(out, 'wb') as f:
            f.write(b'raw marker')

    def load_weather(self, f=None, *args, **kwargs):
        s, n, w, e = self._ll_bounds
        lats = np.arange(s, n + 1e-9, self._lat_res)
        lons = np.arange(w, e + 1e-9, self._lon_res)
        nz = 30
        zcols = np.linspace(0.0, 25000.0, nz)
        ny, nx = lats.size, lons.size
        self._lons, self._lats = np.meshgrid(lons, lats)
        self._zs = np.broadcast_to(zcols, (ny, nx, nz)).copy()
        t = 280.0 - 0.0065 * zcols
        p = 101325.0 * np.exp(-zcols / 8000.0)
        self._t = np.broadcast_to(t, (ny, nx, nz)).copy()
        self._p = np.broadcast_to(p, (ny, nx, nz)).copy()
        self._q = np.full((ny, nx, nz), 0.005)
        self._xs = self._lons.copy()
        self._ys = self._lats.copy()
        self._zlevels = zcols


@pytest.fixture
def model(tmp_path):
    m = FileBackedSyntheticModel()
    m.set_wmLoc(str(tmp_path))
    return m


def test_prepare_fetch_load_write(model, tmp_path):
    t = dt.datetime(2020, 1, 30, 12, 0, 0)
    out = prepareWeatherModel(model, t, [33.0, 34.0, -118.0, -117.0])
    assert model.fetch_count == 1
    assert out is not None and out.endswith('.nc')

    # written file has the reference schema and is engine-consumable
    from raider_tpu.io import read_nc

    ds = read_nc(out)
    for name in ('t', 'p', 'e', 'wet', 'hydro', 'wet_total', 'hydro_total'):
        assert name in ds
    assert ds['wet'].dims == ('z', 'y', 'x')

    # reuse: second call must NOT fetch again
    m2 = FileBackedSyntheticModel()
    m2.set_wmLoc(str(tmp_path))
    out2 = prepareWeatherModel(m2, t, [33.0, 34.0, -118.0, -117.0])
    assert m2.fetch_count == 0
    assert out2 == out


def test_prepare_containment_failure(model, tmp_path):
    """Bounds larger than the model coverage raise ExistingWeatherModelTooSmall
    after processing (reference: processWM.py:126-133)."""
    t = dt.datetime(2020, 1, 30, 12, 0, 0)
    model.set_latlon_bounds(np.array([33.0, 34.0, -118.0, -117.0]))
    with pytest.raises(ExistingWeatherModelTooSmall):
        # asked containment for a much larger target area
        prepareWeatherModel(model, t, [20.0, 50.0, -130.0, -100.0])


def test_engine_on_our_written_file(model, tmp_path):
    """tropo_delay consumes a weather file produced by OUR writer, and the
    ZTD matches an independent trapezoid of the analytic refractivity."""
    from raider_tpu.delay import tropo_delay
    from raider_tpu.geometry.aoi import BoundingBox
    from raider_tpu.geometry.los import Zenith

    t = dt.datetime(2020, 1, 30, 12, 0, 0)
    wm_file = prepareWeatherModel(model, t, [33.0, 34.0, -118.0, -117.0])

    aoi = BoundingBox([33.2, 33.8, -117.9, -117.2], cube_spacing_in_m=5000.0)
    aoi.add_buffer(0.25)
    aoi.set_output_xygrid(4326)
    ds, _ = tropo_delay(t, wm_file, aoi, Zenith(), height_levels=[0.0])

    total = np.asarray(ds['wet'].data[0]) + np.asarray(ds['hydro'].data[0])
    # independent: delays are horizontally uniform -> compare to 1-D trapezoid
    from raider_tpu.io import read_nc

    wm = read_nc(wm_file)
    zs = np.asarray(wm.coords['z'].data)
    wet_profile = np.asarray(wm['wet'].data)[:, 0, 0]
    hydro_profile = np.asarray(wm['hydro'].data)[:, 0, 0]
    i0 = int(np.searchsorted(zs, 0.0))
    expected = 1e-6 * (
        np.trapezoid(wet_profile[i0:], zs[i0:]) + np.trapezoid(hydro_profile[i0:], zs[i0:])
    )
    np.testing.assert_allclose(np.nanmean(total), expected, rtol=1e-6)
    assert 1.5 < expected < 3.5  # plausible total delay (humid synthetic q)


def test_force_download_reprocesses(model, tmp_path):
    """force_download must refresh the PROCESSED file too: without removing
    the stale crop, load() short-circuits on it and the fresh download is
    never processed (the reference has the same latent gap,
    processWM.py:59 + weatherModel.py:245-246)."""
    import os

    t = dt.datetime(2020, 1, 30, 12, 0, 0)
    out = prepareWeatherModel(model, t, [33.0, 34.0, -118.0, -117.0])
    mtime = os.path.getmtime(out)

    m2 = FileBackedSyntheticModel()
    m2.set_wmLoc(str(tmp_path))
    out2 = prepareWeatherModel(m2, t, [33.0, 34.0, -118.0, -117.0],
                               force_download=True)
    assert m2.fetch_count == 1            # re-downloaded
    assert out2 == out
    assert os.path.getmtime(out2) >= mtime
    # and the processed file is a REAL reprocess, not the stale short-circuit
    from raider_tpu.io import read_nc

    assert 'wet_total' in read_nc(out2)
