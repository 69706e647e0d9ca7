"""WRF custom-run weather model reader (rh humidity type).

Capability parity: reference tools/RAiDER/models/wrf.py (the reference's WRF
support is likewise partial: it reads user-supplied wrfout files; there is no
download service).
"""

import numpy as np

from raider_tpu.geodesy import LambertConformalConic
from raider_tpu.wx.base import TIME_RES, WeatherModel


class WRF(WeatherModel):
    """User-run WRF output reader (reference: models/wrf.py:17-190)."""

    def __init__(self) -> None:
        super().__init__()
        self._humidityType = 'rh'
        self._model_level_type = 'ml'
        self._classname = 'wrf'
        self._dataset = 'wrf'
        self._Name = 'WRF'
        self._time_res = TIME_RES['WRF']

        # constants for the WRF refractivity formulation
        self._k1 = 0.776
        self._k2 = 0.233
        self._k3 = 3.75e3

    def _fetch(self, out) -> None:
        raise RuntimeError(
            'WRF output is produced by user-run simulations; there is no download '
            'service. Point the model at your wrfout files instead.'
        )

    def load_weather(self, file1=None, file2=None, f=None, *args, **kwargs) -> None:
        """Read pressure/temperature/rh plus projection from wrfout netCDF
        pairs (out + plev files)."""
        from scipy.io import netcdf_file

        file1 = file1 or f
        if file1 is None:
            raise ValueError('WRF.load_weather requires a wrfout file')
        with netcdf_file(str(file1), 'r', maskandscale=True) as f1:
            lats = f1.variables['XLAT'][0].copy()
            lons = f1.variables['XLONG'][0].copy()
            # perturbation + base geopotential -> height
            ph = f1.variables['PH'][0].copy()
            phb = f1.variables['PHB'][0].copy()
            t_pert = f1.variables['T'][0].copy()  # potential temp perturbation
            p_pert = f1.variables['P'][0].copy()
            pb = f1.variables['PB'][0].copy()
            qvapor = f1.variables['QVAPOR'][0].copy()

            # projection from global attrs (WRF LCC standard attrs)
            attrs = {k.decode() if isinstance(k, bytes) else k: v for k, v in f1._attributes.items()}
            truelat1 = float(attrs.get('TRUELAT1', 30.0))
            truelat2 = float(attrs.get('TRUELAT2', 60.0))
            cen_lat = float(attrs.get('MOAD_CEN_LAT', attrs.get('CEN_LAT', 40.0)))
            cen_lon = float(attrs.get('STAND_LON', attrs.get('CEN_LON', -100.0)))
            self._proj = LambertConformalConic(
                lat_0=cen_lat, lon_0=cen_lon, lat_1=truelat1, lat_2=truelat2
            )

        geo_ht = (ph + phb) / self._g0              # staggered (nz+1, ny, nx)
        geo_ht = 0.5 * (geo_ht[:-1] + geo_ht[1:])   # de-stagger to mass levels
        pres = p_pert + pb                           # full pressure [Pa]
        theta = t_pert + 300.0                       # full potential temperature
        temp = theta * (pres / 1e5) ** 0.2854        # Poisson: theta -> T

        # rh from qvapor via saturation vapor pressure
        from raider_tpu.wx.base import find_svp

        svp = np.asarray(find_svp(temp))
        e = qvapor * pres / (0.622 + qvapor)
        rh = 100.0 * e / svp

        def _restack(a):
            return np.transpose(a, (1, 2, 0))

        self._t = _restack(temp)
        self._rh = _restack(rh)
        self._p = _restack(pres)
        self._zs = _restack(geo_ht)
        self._lats = lats
        self._lons = lons
        self._xs = lons.copy()
        self._ys = lats.copy()
