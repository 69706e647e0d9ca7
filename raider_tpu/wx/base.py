"""Weather-model base class: the refractivity preprocessing pipeline.

Capability parity with the reference's ``WeatherModel`` ABC (reference:
tools/RAiDER/models/weatherModel.py:35-724), redesigned so the numeric
stages are batched JAX ops:

    load_weather (subclass, host IO)
      -> _find_e          (saturation vapor pressure; jnp)
      -> _uniform_in_z    (per-column z-interp; one vectorized kernel instead
                           of the reference's C++ std::async slabs)
      -> _check_for_nans  (pandas backward-fill + zero top fill; host)
      -> refractivities   (jnp elementwise)
      -> _adjust_grid     (pad a zmin layer below ground)
      -> _get_ztd         (reversed cumulative trapezoid; one pass on device)
      -> write            (netCDF with identical schema to the reference)

In-memory cube layout follows the reference: (y, x, z) with z ascending;
files store (z, y, x).
"""

import datetime as dt
import os
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np
import pandas as pd

from raider_tpu.constants import _ZMIN, _ZREF, R_D, R_V, _g0
from raider_tpu.geodesy import Geographic, geo_to_ht
from raider_tpu.io import Dataset, write_nc
from raider_tpu.io.ncdf import Variable
from raider_tpu.logger import logger
from raider_tpu.ops import cumtrapz_from_top, interp_along_axis
from raider_tpu.utils.jaxutils import host_eager
from raider_tpu.wx.exceptions import DatetimeOutsideRange

TIME_RES = {
    'GMAO': 3,
    'ECMWF': 1,
    'HRES': 6,
    'HRRR': 1,
    'WRF': 1,
    'NCMR': 1,
    'HRRR-AK': 3,
}


@host_eager
def find_svp(t):
    """Saturation vapor pressure [Pa] from temperature [K].

    Buck (1881) over water, Alduchov & Eskridge (1996) AERKi over ice, with a
    quadratic blend between -23 C and 0 C (reference:
    tools/RAiDER/models/weatherModel.py:750-780). Returns float32 like the
    reference.
    """
    t = jnp.asarray(t)
    t1 = 273.15  # 0 C
    t2 = 250.15  # -23 C
    tref = t - t1
    wgt = (t - t2) / (t1 - t2)
    svpw = 6.1121 * jnp.exp((17.502 * tref) / (240.97 + tref))
    svpi = 6.1121 * jnp.exp((22.587 * tref) / (273.86 + tref))
    svp = svpi + (svpw - svpi) * wgt**2
    svp = jnp.where(t > t1, svpw, svp)
    svp = jnp.where(t < t2, svpi, svp)
    return (svp * 100.0).astype(jnp.float32)


def fillna3d(array: np.ndarray, axis: int = -1, fill_value: float = 0.0) -> np.ndarray:
    """Fill NaNs along ``axis``: linear for interior, nearest-below for
    leading ("low") NaNs, ``fill_value`` for trailing ("high") NaNs.

    Matches reference fillna3D (tools/RAiDER/interpolator.py:110-130).
    """
    narr = np.moveaxis(array, axis, -1)
    flat = narr.reshape(-1, narr.shape[-1])
    dfd = pd.DataFrame(data=flat).interpolate(axis=1, limit_direction='backward')
    out = np.array(dfd.to_numpy()).reshape(narr.shape)
    out = np.moveaxis(out, -1, axis).copy()
    out[np.isnan(out)] = fill_value
    return out


def _least_nonzero(a: np.ndarray) -> np.ndarray:
    """First non-NaN value along the last axis (reference: utilFcns.py:342)."""
    idx = (~np.isnan(a)).argmax(-1)
    return np.take_along_axis(a, idx[..., None], axis=-1)[..., 0]


def pad_lower(invar: np.ndarray) -> np.ndarray:
    """Prepend a layer below the lowest z-level holding the deepest valid
    value of each column (reference: utilFcns.py:413-416)."""
    new_var = _least_nonzero(invar)
    return np.concatenate((new_var[:, :, np.newaxis], invar), axis=2)


class WeatherModel:
    """Generic numerical weather model for delay estimation."""

    _dataset: Optional[str] = None

    def __init__(self) -> None:
        self._k1 = None
        self._k2 = None
        self._k3 = None
        self._humidityType = 'q'
        self._a = []
        self._b = []

        self.files = None
        self._time_res = None
        self._lon_res = None
        self._lat_res = None
        self._x_res = None
        self._y_res = None

        self._classname = None
        self._Name = ''
        self._wmLoc = None
        self._model_level_type = 'ml'

        self._valid_range = (
            dt.datetime(1900, 1, 1, tzinfo=dt.timezone.utc),
            dt.datetime.now(dt.timezone.utc),
        )
        self._lag_time = dt.timedelta(days=30)
        self._time = None
        self._bbox = None

        self._R_v = float(R_V)
        self._R_d = float(R_D)
        self._g0 = float(_g0)
        self._zmin = float(_ZMIN)
        self._zmax = float(_ZREF)
        self._proj = Geographic()

        self._levels = []
        self._zlevels = None
        self._xs = np.empty((1, 1, 1))
        self._ys = np.empty((1, 1, 1))
        self._zs = np.empty((1, 1, 1))
        self._lats = None
        self._lons = None
        self._ll_bounds = None
        # valid SNWE-style extent as (W, S, E, N) interval box
        self._valid_bounds = (-180.0, -90.0, 180.0, 90.0)

        self._p = None
        self._q = None
        self._rh = None
        self._t = None
        self._e = None
        self._wet_refractivity = None
        self._hydrostatic_refractivity = None
        self._wet_ztd = None
        self._hydrostatic_ztd = None
        self._out_name = None

    # ------------------------------------------------------------------ meta
    def Model(self) -> str:
        return self._Name

    def dtime(self) -> Optional[int]:
        return self._time_res

    def getLLRes(self) -> float:
        return float(np.max([self._lat_res, self._lon_res]))

    def getTime(self) -> Optional[dt.datetime]:
        return self._time

    def setTime(self, time, fmt: str = '%Y-%m-%dT%H:%M:%S') -> None:
        if isinstance(time, str):
            self._time = dt.datetime.strptime(time, fmt)
        elif isinstance(time, dt.datetime):
            self._time = time
        else:
            raise ValueError('"time" must be a string or a datetime object')
        if self._time.tzinfo is None:
            self._time = self._time.replace(tzinfo=dt.timezone.utc)

    def checkTime(self, time: dt.datetime) -> None:
        """Raise if ``time`` is outside the model's valid range or lag window
        (reference: weatherModel.py:278-308)."""
        if not isinstance(time, dt.datetime):
            raise ValueError(f'"time" should be a datetime object, got {time!r}')
        time = time.replace(tzinfo=dt.timezone.utc) if time.tzinfo is None else time
        start, end = self._valid_range
        logger.info('Weather model %s is available from %s to %s', self.Model(), start, end)
        if time < start or (end is not None and end < time):
            raise DatetimeOutsideRange(self.Model(), time)
        if time > dt.datetime.now(dt.timezone.utc) - self._lag_time:
            raise DatetimeOutsideRange(self.Model(), time)

    def setLevelType(self, levelType: str) -> None:
        if levelType not in ('ml', 'pl', 'nat', 'prs'):
            raise RuntimeError(f'Level type {levelType} is not recognized')
        self._model_level_type = levelType
        if levelType in ('ml', 'nat'):
            self.__model_levels__()
        else:
            self.__pressure_levels__()

    def __model_levels__(self) -> None:
        raise NotImplementedError

    def __pressure_levels__(self) -> None:
        raise NotImplementedError

    # ---------------------------------------------------------------- bounds
    def get_latlon_bounds(self):
        return self._ll_bounds

    def set_latlon_bounds(self, ll_bounds, Nextra: int = 2, output_spacing: Optional[float] = None) -> None:
        """Buffer the query bounds to model-grid margins
        (reference: weatherModel.py:190-220)."""
        from raider_tpu.utils.bbox import clip_bbox

        ex_buffer_lon_max = 0.0
        if self._Name in ('HRRR', 'HRRR-AK', 'HRES'):
            Nextra = 6
        else:
            ex_buffer_lon_max = self._lon_res

        S, N, W, E = ll_bounds
        pixlat, pixlon = Nextra * self._lat_res, Nextra * self._lon_res
        S = np.max([S - pixlat, -90.0 + pixlat])
        N = np.min([N + pixlat, 90.0 - pixlat])
        W = np.max([W - (pixlon + ex_buffer_lon_max), -180.0 + (pixlon + ex_buffer_lon_max)])
        E = np.min([E + (pixlon + ex_buffer_lon_max), 180.0 - pixlon - ex_buffer_lon_max])
        if output_spacing is not None:
            S, N, W, E = clip_bbox([S, N, W, E], output_spacing)
        self._ll_bounds = np.array([S, N, W, E])

    def checkValidBounds(self, ll_bounds) -> None:
        from raider_tpu.utils.bbox import boxes_intersect

        S, N, W, E = ll_bounds
        if not boxes_intersect((W, S, E, N), self._valid_bounds):
            if not boxes_intersect((W + 360, S, E + 360, N), self._valid_bounds):
                raise ValueError(f'The requested location is unavailable for {self._Name}')

    @property
    def bbox(self):
        """(W, S, E, N) extent of the processed weather file
        (reference: weatherModel.py:418-456)."""
        if self._bbox is None:
            from raider_tpu.geodesy import Geographic as _Geo
            from raider_tpu.geodesy import transform_points
            from raider_tpu.io import read_nc

            path = self.out_file(self.get_wmLoc())
            if not Path(path).exists():
                raise ValueError('Need to save cropped weather model as netcdf')
            ds = read_nc(path)
            xs = np.asarray(ds.coords['x'].data, dtype=np.float64)
            ys = np.asarray(ds.coords['y'].data, dtype=np.float64)
            xmin, xmax = xs.min(), xs.max()
            ymin, ymax = ys.min(), ys.max()
            cx = np.array([xmin, xmin, xmax, xmax])
            cy = np.array([ymin, ymax, ymin, ymax])
            lons, lats = transform_points(self._proj, _Geo(), cx, cy)[:2]
            lons, lats = np.asarray(lons), np.asarray(lats)
            self._bbox = (lons.min(), lats.min(), lons.max(), lats.max())
        return self._bbox

    @bbox.setter
    def bbox(self, value) -> None:
        self._bbox = tuple(value)

    def checkContainment(self, ll_bounds, buffer_deg: float = 1e-5) -> bool:
        """True if the processed file covers ``ll_bounds`` (SNWE), considering
        +/-360 longitude translates (reference: weatherModel.py:473-531)."""
        from raider_tpu.utils.bbox import box_contains_with_translates

        s, n, w, e = ll_bounds
        return box_contains_with_translates(self.bbox, (w, s, e, n), buffer_deg)

    # ----------------------------------------------------------------- paths
    def get_wmLoc(self) -> str:
        return self._wmLoc if self._wmLoc is not None else os.path.join(os.getcwd(), 'weather_files')

    def set_wmLoc(self, weather_model_directory: str) -> None:
        self._wmLoc = weather_model_directory

    def out_file(self, outLoc: str) -> str:
        return os.path.join(outLoc, make_weather_model_filename(self._Name, self._time, self._ll_bounds))

    def filename(self, time: Optional[dt.datetime] = None, outLoc: str = 'weather_files') -> str:
        os.makedirs(outLoc, exist_ok=True)
        if time is None:
            if self._time is None:
                raise ValueError('Time must be specified before the file can be written')
            time = self._time
        f = make_raw_weather_data_filename(outLoc, self._Name, time)
        self.files = [f]
        return f

    # --------------------------------------------------------------- fetch/load
    def fetch(self, out, time: dt.datetime) -> None:
        self.checkTime(time)
        self.setTime(time)
        try:
            self._fetch(out)
        except Exception as e:
            logger.exception(e)
            raise

    def _fetch(self, out) -> None:
        raise NotImplementedError

    def load_weather(self, *args, **kwargs) -> None:
        raise NotImplementedError

    def load(self, *args, _zlevels=None, **kwargs):
        """Run the full preprocessing pipeline unless the processed file
        already exists (reference: weatherModel.py:235-261)."""
        outLoc = self.get_wmLoc()
        path_wm_raw = make_raw_weather_data_filename(outLoc, self.Model(), self.getTime())
        self._out_name = self.out_file(outLoc)

        if Path(self._out_name).exists():
            return self._out_name

        self.load_weather(*args, f=path_wm_raw, **kwargs)
        self._find_e()
        self._uniform_in_z(_zlevels=_zlevels)
        self._check_for_nans()
        self._get_wet_refractivity()
        self._get_hydro_refractivity()
        self._adjust_grid(self.get_latlon_bounds())
        self._get_ztd()
        return None

    # ------------------------------------------------------------- numerics
    def _convertmb2Pa(self, pres):
        return 100 * pres

    def _get_heights(self, lats, geo_hgt, geo_ht_fill=np.nan) -> None:
        """Geopotential -> ellipsoidal heights (reference: weatherModel.py:326-330)."""
        geo_ht_fix = np.where(geo_hgt != geo_ht_fill, geo_hgt, np.nan)
        lats_full = np.broadcast_to(lats[..., np.newaxis], geo_ht_fix.shape)
        self._zs = np.asarray(geo_to_ht(lats_full, geo_ht_fix))

    def _find_e(self) -> None:
        if self._humidityType == 'rh':
            self._find_e_from_rh()
        elif self._humidityType == 'q':
            self._find_e_from_q()
        else:
            raise RuntimeError('Not a valid humidity type')
        self._rh = None
        self._q = None

    def _find_e_from_q(self) -> None:
        svp = np.asarray(find_svp(self._t))
        w = self._q / (1 - self._q)
        self._e = w * self._R_v * (self._p - svp) / self._R_d

    def _find_e_from_rh(self) -> None:
        svp = np.asarray(find_svp(self._t))
        self._e = self._rh / 100 * svp

    def _get_wet_refractivity(self) -> None:
        """N_wet = k2 e/T + k3 e/T^2 (reference: weatherModel.py:355-357)."""
        self._wet_refractivity = self._k2 * self._e / self._t + self._k3 * self._e / self._t**2

    def _get_hydro_refractivity(self) -> None:
        """N_hydro = k1 P/T (reference: weatherModel.py:359-361)."""
        self._hydrostatic_refractivity = self._k1 * self._p / self._t

    def getWetRefractivity(self):
        return self._wet_refractivity

    def getHydroRefractivity(self):
        return self._hydrostatic_refractivity

    def _uniform_in_z(self, _zlevels=None) -> None:
        """Interpolate all variables to a fixed set of z levels; one
        vectorized device op over every column at once (replaces the C++
        ``interpolate_along_axis``; reference: weatherModel.py:603-623)."""
        if _zlevels is None:
            if self._zlevels is not None:
                _zlevels = self._zlevels
            else:
                _zlevels = np.nanmean(self._zs, axis=(0, 1))
                # TOP-only clamp: the mean of near-identical columns can
                # land an ulp above the lowest column top (observed with
                # WRF's destaggered heights), where the top node
                # interpolates to NaN and the fill then zeroes that
                # level's refractivity — a 1.7 mm hydro bias on a 30 km
                # WRF column (round 5). The BOTTOM is deliberately NOT
                # clamped: raising it to the highest column bottom would
                # collapse every near-surface ladder node in a
                # terrain-varying domain, and below-native-bottom nodes
                # are already handled by the flat surface-gap fill.
                _zlevels = np.minimum(_zlevels,
                                      np.nanmin(self._zs[:, :, -1]))
        _zlevels = np.asarray(_zlevels, dtype=np.float64)
        new_zs = np.broadcast_to(_zlevels, self._p.shape[:2] + (_zlevels.size,))

        from raider_tpu import native

        for name in ('_t', '_p', '_e'):
            cur = getattr(self, name)
            if native.available():
                # native path scales linearly in columns (the JAX kernel's
                # compare-matrix bracketing is O(n*m) per column)
                out = native.interpolate_along_axis(
                    self._zs, np.asarray(cur, dtype=np.float64), new_zs, axis=2
                )
            else:
                out = interp_along_axis(self._zs, np.asarray(cur, dtype=np.float64), new_zs, axis=2)
            setattr(self, name, np.asarray(out).astype(np.float32))

        self._zs = _zlevels
        self._xs = np.unique(self._xs)
        self._ys = np.unique(self._ys)

    def _check_for_nans(self) -> None:
        self._p = fillna3d(self._p)
        self._t = fillna3d(self._t, fill_value=1e16)  # avoid divide-by-zero
        self._e = fillna3d(self._e)

    def _adjust_grid(self, ll_bounds=None) -> None:
        """Pad the grid with a layer at zmin (reference: weatherModel.py:371-387)."""
        if self._zmin < np.nanmin(self._zs):
            self._zs = np.insert(self._zs, 0, self._zmin)
            self._p = pad_lower(self._p)
            self._t = pad_lower(self._t)
            self._e = pad_lower(self._e)
            self._wet_refractivity = pad_lower(self._wet_refractivity)
            self._hydrostatic_refractivity = pad_lower(self._hydrostatic_refractivity)
            if ll_bounds is not None:
                self._trimExtent(ll_bounds)

    def _trimExtent(self, extent) -> None:
        """Crop the grid to the bounds + 2 cells (reference: weatherModel.py:545-575)."""
        if self._lats is None:
            return
        lat = self._lats.copy()
        lon = self._lons.copy()
        lat[np.isnan(lat)] = np.nanmean(lat)
        lon[np.isnan(lon)] = np.nanmean(lon)
        mask = (lat >= extent[0]) & (lat <= extent[1]) & (lon >= extent[2]) & (lon <= extent[3])
        ma1 = np.sum(mask, axis=1).astype(bool)
        ma2 = np.sum(mask, axis=0).astype(bool)
        if np.sum(ma1) == 0 and np.sum(ma2) == 0:
            return

        ny, nx = self._p.shape[:2]
        index1 = max(np.arange(len(ma1))[ma1][0] - 2, 0)
        index2 = min(np.arange(len(ma1))[ma1][-1] + 2, ny)
        index3 = max(np.arange(len(ma2))[ma2][0] - 2, 0)
        index4 = min(np.arange(len(ma2))[ma2][-1] + 2, nx)

        self._lons = self._lons[index1:index2, index3:index4]
        self._lats = self._lats[index1:index2, index3:index4]
        self._xs = self._xs[index3:index4]
        self._ys = self._ys[index1:index2]
        for name in ('_p', '_t', '_e', '_wet_refractivity', '_hydrostatic_refractivity'):
            setattr(self, name, getattr(self, name)[index1:index2, index3:index4, ...])

    def _getZTD(self) -> None:
        self._get_ztd()

    def _get_ztd(self) -> None:
        """Zenith total delay at every grid node, integrated from each level
        to the model top (replaces the reference's per-level np.trapz loop
        at weatherModel.py:389-403).

        On TPU backends the fused Pallas kernel (ops.pallas_ztd.ztd_totals:
        refractivity + top-down trapezoid scan, one HBM pass) is the
        production path; the XLA reversed-cumsum composition is the fallback
        everywhere else (``RAIDER_TPU_PALLAS_ZTD=0`` forces it)."""
        if self._use_pallas_ztd():
            try:
                from raider_tpu.ops.pallas_ztd import ztd_totals

                def to_dev(a):
                    return jnp.asarray(
                        np.moveaxis(np.asarray(a, dtype=np.float32), -1, 0))

                wet_t, hyd_t = ztd_totals(
                    to_dev(self._t), to_dev(self._p), to_dev(self._e),
                    jnp.asarray(np.asarray(self._zs, dtype=np.float32)),
                    k1=float(self._k1), k2=float(self._k2), k3=float(self._k3))
                self._wet_ztd = np.moveaxis(np.asarray(wet_t, np.float64), 0, -1)
                self._hydrostatic_ztd = np.moveaxis(np.asarray(hyd_t, np.float64), 0, -1)
                return
            except Exception as e:  # noqa: BLE001 - any Mosaic/backend failure
                logger.warning('Pallas ZTD kernel failed (%s); '
                               'falling back to the XLA path', e)
        wet = jnp.asarray(self._wet_refractivity, dtype=jnp.float64)
        hydro = jnp.asarray(self._hydrostatic_refractivity, dtype=jnp.float64)
        zs = jnp.asarray(self._zs, dtype=jnp.float64)
        self._wet_ztd = np.asarray(cumtrapz_from_top(wet, zs))
        self._hydrostatic_ztd = np.asarray(cumtrapz_from_top(hydro, zs))

    def _use_pallas_ztd(self) -> bool:
        import os

        import jax

        if os.environ.get('RAIDER_TPU_PALLAS_ZTD', '') == '0':
            return False
        try:
            backend = jax.default_backend()
        except RuntimeError:
            return False
        return (backend == 'tpu' and self._e is not None
                and np.ndim(self._zs) == 1 and np.ndim(self._t) == 3)

    def _calculategeoh(self, z, lnsp):
        from raider_tpu.wx.calcgeoh import calcgeoh

        return calcgeoh(lnsp, self._t, self._q, z, self._a, self._b, self._R_d, self._levels)

    def getProjection(self):
        return self._proj

    def getPoints(self):
        return self._xs.copy(), self._ys.copy(), self._zs.copy()

    # ------------------------------------------------------------------ write
    def write(self) -> str:
        """Write the processed weather model with the reference's schema
        (reference: weatherModel.py:659-724)."""
        f = self._out_name

        def _zyx(arr):
            return np.asarray(arr).swapaxes(0, 2).swapaxes(1, 2)

        attrs = {
            'Conventions': 'CF-1.6',
            'datetime': dt.datetime.strftime(self._time, '%Y_%m_%dT%H_%M_%S'),
            'date_created': dt.datetime.now().strftime('%Y_%m_%dT%H_%M_%S'),
            'title': 'Weather model data and delay calculations',
            'model_name': self._Name,
        }
        coords = {
            'x': Variable(('x',), np.asarray(self._xs), {}),
            'y': Variable(('y',), np.asarray(self._ys), {}),
            'z': Variable(('z',), np.asarray(self._zs), {}),
        }
        variables = {
            'latitude': Variable(('y', 'x'), np.asarray(self._lats), {}),
            'longitude': Variable(('y', 'x'), np.asarray(self._lons), {}),
            't': Variable(('z', 'y', 'x'), _zyx(self._t), {'units': 'K', 'standard_name': 'temperature'}),
            'p': Variable(('z', 'y', 'x'), _zyx(self._p), {'units': 'Pa', 'standard_name': 'pressure'}),
            'e': Variable(('z', 'y', 'x'), _zyx(self._e), {'units': 'Pa', 'standard_name': 'humidity'}),
            'wet': Variable(('z', 'y', 'x'), _zyx(self._wet_refractivity),
                            {'units': 'dimentionless', 'standard_name': 'wet_refractivity'}),
            'hydro': Variable(('z', 'y', 'x'), _zyx(self._hydrostatic_refractivity),
                              {'units': 'dimentionless', 'standard_name': 'hydrostatic_refractivity'}),
            'wet_total': Variable(('z', 'y', 'x'), _zyx(self._wet_ztd),
                                  {'units': 'm', 'standard_name': 'total_wet_refractivity'}),
            'hydro_total': Variable(('z', 'y', 'x'), _zyx(self._hydrostatic_ztd),
                                    {'units': 'm', 'standard_name': 'total_hydrostatic_refractivity'}),
        }
        proj_attrs = dict(self._proj.to_cf())
        proj_attrs['grid_mapping'] = 'proj'
        variables['proj'] = Variable((), np.int64(0), proj_attrs)
        for name, var in variables.items():
            if name not in ('proj', 'latitude', 'longitude'):
                var.attrs['grid_mapping'] = 'proj'

        ds = Dataset(coords=coords, variables=variables, attrs=attrs)
        write_nc(ds, f)
        return f


def make_weather_model_filename(name: str, time: dt.datetime, ll_bounds) -> str:
    """Processed-file cache key (reference: weatherModel.py:727-740)."""
    s = np.floor(ll_bounds[0])
    S = f'{np.abs(s):.0f}S' if s < 0 else f'{s:.0f}N'
    n = np.ceil(ll_bounds[1])
    N = f'{np.abs(n):.0f}S' if n < 0 else f'{n:.0f}N'
    w = np.floor(ll_bounds[2])
    W = f'{np.abs(w):.0f}W' if w < 0 else f'{w:.0f}E'
    e = np.ceil(ll_bounds[3])
    E = f'{np.abs(e):.0f}W' if e < 0 else f'{e:.0f}E'
    return f'{name}_{time.strftime("%Y_%m_%d_T%H_%M_%S")}_{S}_{N}_{W}_{E}.nc'


def make_raw_weather_data_filename(outLoc: str, name: str, time: dt.datetime) -> str:
    return os.path.join(outLoc, f'{name}_{dt.datetime.strftime(time, "%Y_%m_%d_T%H_%M_%S")}.nc')
