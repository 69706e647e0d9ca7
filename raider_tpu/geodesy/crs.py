"""Coordinate reference systems as closed-form JAX transforms.

The reference delegates every CRS transform to pyproj (reference:
tools/RAiDER/delay.py:404-436, models/hrrr.py:22-25). Here each projection is
a small immutable object with jit-compilable ``forward(lon, lat) -> (x, y)``
and ``inverse(x, y) -> (lon, lat)`` maps, so coordinate transforms can run
inside fused TPU kernels instead of round-tripping to the host.

Supported projections (all weather models in scope use one of these):
  * Geographic (EPSG:4326)                    - ERA5/ERA5T/ERA-I/HRES/GMAO/MERRA2/NCMR
  * Geocentric ECEF (EPSG:4978)               - ray geometry
  * Lambert conformal conic (sphere/ellipsoid) - HRRR CONUS (3 km grid)
  * Polar stereographic                        - HRRR Alaska
  * Transverse Mercator / UTM                  - projected outputs

Angles at the public API are degrees. Math follows Snyder (1987), "Map
Projections: A Working Manual"; inverse series iterations are fixed-count so
they trace to static control flow under jit.

CF grid-mapping attribute round-tripping (``to_cf`` / ``crs_from_cf``)
matches what pyproj emits into the reference's processed weather files, so we
can read those files directly.
"""

import re
from dataclasses import dataclass
from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from raider_tpu.constants import WGS84_A, WGS84_INV_F
from raider_tpu.utils.jaxutils import host_eager

_QUARTER_PI = np.pi / 4.0


@dataclass(frozen=True)
class Ellipsoid:
    """Reference ellipsoid; ``f == 0`` means a sphere."""

    a: float = float(WGS84_A)
    f: float = 1.0 / float(WGS84_INV_F)

    @property
    def b(self) -> float:
        return self.a * (1.0 - self.f)

    @property
    def e2(self) -> float:
        return self.f * (2.0 - self.f)

    @property
    def e(self) -> float:
        return float(np.sqrt(self.e2))

    def cf_attrs(self) -> dict:
        if self.f == 0.0:
            return {'earth_radius': self.a}
        return {
            'semi_major_axis': self.a,
            'semi_minor_axis': self.b,
            'inverse_flattening': 1.0 / self.f,
        }

    def wkt_spheroid(self) -> str:
        """WKT1 SPHEROID fragment (inverse flattening 0 encodes a sphere)."""
        name = 'WGS 84' if self == WGS84 else ('sphere' if self.f == 0.0
                                               else 'ellipsoid')
        inv_f = 0.0 if self.f == 0.0 else 1.0 / self.f
        return f'SPHEROID["{name}",{self.a!r},{inv_f!r}]'


WGS84 = Ellipsoid()
SPHERE_6371229 = Ellipsoid(a=6371229.0, f=0.0)  # NCEP sphere (HRRR grids)


def _norm_lon(lon_deg):
    """Normalize longitudes to [-180, 180) — the PROJ/pyproj convention
    for inverse projections. Without this, a projection with lon_0 far
    from 0 (HRRR's 262.5, HRRR-AK's 225) returns inverse longitudes in
    (lon_0 - 180, lon_0 + 180] (e.g. 370), which breaks downstream
    containment/bounds comparisons on antimeridian-adjacent scenes."""
    return jnp.mod(lon_deg + 180.0, 360.0) - 180.0


def _conformal_t(lat_rad, e):
    """Snyder eq. 15-9: isometric colatitude function t(phi)."""
    s = jnp.sin(lat_rad)
    return jnp.tan(_QUARTER_PI - lat_rad / 2.0) / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)


def _inv_conformal_t(t, e, iterations: int = 12):
    """Invert t(phi) by fixed-point iteration (Snyder eq. 7-9)."""
    lat = np.pi / 2.0 - 2.0 * jnp.arctan(t)
    for _ in range(iterations):
        s = jnp.sin(lat)
        lat = np.pi / 2.0 - 2.0 * jnp.arctan(t * ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))
    return lat


def _m_factor(lat_rad, e2):
    """Snyder eq. 14-15: m = cos(phi)/sqrt(1 - e^2 sin^2 phi)."""
    return jnp.cos(lat_rad) / jnp.sqrt(1.0 - e2 * jnp.sin(lat_rad) ** 2)


class CRS:
    """Base CRS. Subclasses provide forward/inverse maps to/from lon-lat."""

    ellipsoid: Ellipsoid = WGS84
    is_geographic: bool = False
    is_geocentric: bool = False

    @property
    def axis_unit(self) -> str:
        return 'degree' if self.is_geographic else 'metre'

    def forward(self, lon, lat):
        raise NotImplementedError

    def inverse(self, x, y):
        raise NotImplementedError

    def to_cf(self) -> dict:
        raise NotImplementedError

    def to_epsg(self) -> Optional[int]:
        return None

    def _geogcs_wkt(self) -> str:
        """The GEOGCS block shared by geographic and projected WKT1."""
        name = 'WGS 84' if self.ellipsoid == WGS84 else 'unnamed'
        return (
            f'GEOGCS["{name}",DATUM["{name.replace(" ", "_")}",'
            f'{self.ellipsoid.wkt_spheroid()}],'
            'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'
        )

    def to_wkt(self) -> str:
        """WKT1 string for this CRS (round-trips through crs_from_wkt).

        The reference writes GUNW ``crs_wkt`` via pyproj/rioxarray
        (aria/calcGUNW.py:150-158); this is the pyproj-free equivalent for
        product metadata. Projected subclasses emit a PROJCS whose PARAMETER
        names match exactly what :func:`crs_from_wkt` reads back.
        """
        raise NotImplementedError

    def _projcs_wkt(self, name: str, projection: str, params: dict) -> str:
        plist = ','.join(f'PARAMETER["{k}",{float(v)!r}]'
                         for k, v in params.items())
        return (
            f'PROJCS["{name}",{self._geogcs_wkt()},'
            f'PROJECTION["{projection}"],{plist},UNIT["metre",1]]'
        )

    def __eq__(self, other) -> bool:
        return isinstance(other, CRS) and self.to_cf() == other.to_cf()

    def __hash__(self):
        return hash(tuple(sorted((k, str(v)) for k, v in self.to_cf().items())))


@dataclass(frozen=True, eq=False)
class Geographic(CRS):
    """Plain geodetic longitude/latitude (EPSG:4326 when on WGS84)."""

    ellipsoid: Ellipsoid = WGS84
    is_geographic: bool = True

    @host_eager
    def forward(self, lon, lat):
        return lon, lat

    @host_eager
    def inverse(self, x, y):
        return x, y

    def to_cf(self) -> dict:
        return {'grid_mapping_name': 'latitude_longitude', **self.ellipsoid.cf_attrs()}

    def to_epsg(self) -> Optional[int]:
        return 4326 if self.ellipsoid == WGS84 else None

    def to_wkt(self) -> str:
        return self._geogcs_wkt()


@dataclass(frozen=True, eq=False)
class Geocentric(CRS):
    """Earth-centered earth-fixed cartesian (EPSG:4978). 3-D only."""

    ellipsoid: Ellipsoid = WGS84
    is_geocentric: bool = True

    def to_cf(self) -> dict:
        return {'grid_mapping_name': 'geocentric', **self.ellipsoid.cf_attrs()}

    def to_epsg(self) -> Optional[int]:
        return 4978 if self.ellipsoid == WGS84 else None

    def to_wkt(self) -> str:
        name = 'WGS 84' if self.ellipsoid == WGS84 else 'unnamed'
        return (
            f'GEOCCS["{name}",DATUM["{name.replace(" ", "_")}",'
            f'{self.ellipsoid.wkt_spheroid()}],'
            'PRIMEM["Greenwich",0],UNIT["metre",1]]'
        )


@dataclass(frozen=True, eq=False)
class LambertConformalConic(CRS):
    """Lambert conformal conic, 1 or 2 standard parallels (Snyder ch. 15).

    HRRR CONUS uses this on a sphere of radius 6371229 m with
    lat_1 = lat_2 = lat_0 = 38.5, lon_0 = 262.5 (reference:
    tools/RAiDER/models/hrrr.py:115-135, 244-259).
    """

    lat_0: float = 0.0
    lon_0: float = 0.0
    lat_1: float = 0.0
    lat_2: Optional[float] = None
    x_0: float = 0.0
    y_0: float = 0.0
    ellipsoid: Ellipsoid = WGS84

    def _params(self):
        """Projection constants, pure NumPy on python floats: forward() runs
        inside jit traces (device-geometry path), where jnp helpers would
        produce tracers that cannot be concretized."""
        e = self.ellipsoid.e
        e2 = self.ellipsoid.e2
        a = self.ellipsoid.a

        def m_np(phi):
            s = np.sin(phi)
            return np.cos(phi) / np.sqrt(1.0 - e2 * s * s)

        def t_np(phi):
            s = np.sin(phi)
            return np.tan(_QUARTER_PI - phi / 2.0) / (
                (1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)

        phi1 = np.deg2rad(self.lat_1)
        phi2 = np.deg2rad(self.lat_2 if self.lat_2 is not None else self.lat_1)
        phi0 = np.deg2rad(self.lat_0)
        m1 = float(m_np(phi1))
        t1 = float(t_np(phi1))
        if abs(phi1 - phi2) < 1e-12:
            n = float(np.sin(phi1))
        else:
            n = float(np.log(m1 / float(m_np(phi2))) / np.log(t1 / float(t_np(phi2))))
        big_f = m1 / (n * t1**n)
        rho0 = a * big_f * float(t_np(phi0)) ** n
        return e, a, n, big_f, rho0

    @host_eager
    def forward(self, lon, lat):
        e, a, n, big_f, rho0 = self._params()
        lat_rad = jnp.deg2rad(lat)
        t = _conformal_t(lat_rad, e)
        rho = a * big_f * t**n
        dlon = jnp.deg2rad(lon - self.lon_0)
        # wrap to [-180, 180) so cones spanning the antimeridian behave
        dlon = jnp.mod(dlon + np.pi, 2.0 * np.pi) - np.pi
        theta = n * dlon
        x = rho * jnp.sin(theta) + self.x_0
        y = rho0 - rho * jnp.cos(theta) + self.y_0
        return x, y

    @host_eager
    def inverse(self, x, y):
        e, a, n, big_f, rho0 = self._params()
        x = x - self.x_0
        y = y - self.y_0
        sign_n = np.sign(n) if n != 0 else 1.0
        rho = sign_n * jnp.sqrt(x * x + (rho0 - y) ** 2)
        theta = jnp.arctan2(sign_n * x, sign_n * (rho0 - y))
        t = (rho / (a * big_f)) ** (1.0 / n)
        lat = _inv_conformal_t(t, e)
        lon = jnp.rad2deg(theta / n) + self.lon_0
        return _norm_lon(lon), jnp.rad2deg(lat)

    def to_cf(self) -> dict:
        sp = (
            self.lat_1
            if self.lat_2 is None or self.lat_2 == self.lat_1
            else [self.lat_1, self.lat_2]
        )
        return {
            'grid_mapping_name': 'lambert_conformal_conic',
            'standard_parallel': sp,
            'longitude_of_central_meridian': self.lon_0,
            'latitude_of_projection_origin': self.lat_0,
            'false_easting': self.x_0,
            'false_northing': self.y_0,
            **self.ellipsoid.cf_attrs(),
        }

    def to_wkt(self) -> str:
        return self._projcs_wkt(
            'unnamed', 'Lambert_Conformal_Conic_2SP', {
                'latitude_of_origin': self.lat_0,
                'central_meridian': self.lon_0,
                'standard_parallel_1': self.lat_1,
                'standard_parallel_2': (self.lat_1 if self.lat_2 is None
                                        else self.lat_2),
                'false_easting': self.x_0,
                'false_northing': self.y_0,
            })


@dataclass(frozen=True, eq=False)
class PolarStereographic(CRS):
    """Polar stereographic (Snyder ch. 21). HRRR-AK: sphere 6371229 m,
    lat_0 = 90, lon_0 = 225, lat_ts = 60 (reference: models/hrrr.py:22-25).
    """

    lat_0: float = 90.0  # +90 or -90
    lon_0: float = 0.0
    lat_ts: Optional[float] = None  # standard parallel; None -> use k0
    k0: float = 1.0
    x_0: float = 0.0
    y_0: float = 0.0
    ellipsoid: Ellipsoid = WGS84

    def _scale(self):
        """rho = a * _scale() * t   (t evaluated at |lat|-equivalent).

        Pure NumPy on python floats: this runs inside jit traces (the
        device-geometry path calls forward() under jit), where jnp helpers
        would produce tracers that cannot be concretized.
        """
        e = self.ellipsoid.e
        e2 = self.ellipsoid.e2
        if self.lat_ts is not None:
            phi_c = np.deg2rad(abs(self.lat_ts))
            s = np.sin(phi_c)
            m_c = np.cos(phi_c) / np.sqrt(1.0 - e2 * s * s)
            t_c = np.tan(_QUARTER_PI - phi_c / 2.0) / (
                (1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)
            return float(m_c / t_c)
        # k0 form: rho = 2 a k0 t / sqrt((1+e)^(1+e) (1-e)^(1-e))
        return 2.0 * self.k0 / float(np.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e)))

    @host_eager
    def forward(self, lon, lat):
        e = self.ellipsoid.e
        a = self.ellipsoid.a
        south = self.lat_0 < 0
        if south:
            lon, lat = -jnp.asarray(lon), -jnp.asarray(lat)
        lat_rad = jnp.deg2rad(lat)
        t = _conformal_t(lat_rad, e)
        rho = a * self._scale() * t
        dlon = jnp.deg2rad(lon - (-self.lon_0 if south else self.lon_0))
        x = rho * jnp.sin(dlon)
        y = -rho * jnp.cos(dlon)
        if south:
            x, y = -x, -y
        return x + self.x_0, y + self.y_0

    @host_eager
    def inverse(self, x, y):
        e = self.ellipsoid.e
        a = self.ellipsoid.a
        x = jnp.asarray(x) - self.x_0
        y = jnp.asarray(y) - self.y_0
        south = self.lat_0 < 0
        if south:
            x, y = -x, -y
        rho = jnp.sqrt(x * x + y * y)
        t = rho / (a * self._scale())
        lat = _inv_conformal_t(t, e)
        lon0 = -self.lon_0 if south else self.lon_0
        lon = lon0 + jnp.rad2deg(jnp.arctan2(x, -y))
        lat = jnp.rad2deg(lat)
        if south:
            lon, lat = -lon, -lat
        return _norm_lon(lon), lat

    def to_cf(self) -> dict:
        cf = {
            'grid_mapping_name': 'polar_stereographic',
            'straight_vertical_longitude_from_pole': self.lon_0,
            'latitude_of_projection_origin': self.lat_0,
            'false_easting': self.x_0,
            'false_northing': self.y_0,
            **self.ellipsoid.cf_attrs(),
        }
        if self.lat_ts is not None:
            cf['standard_parallel'] = self.lat_ts
        else:
            cf['scale_factor_at_projection_origin'] = self.k0
        return cf

    def to_wkt(self) -> str:
        params = {
            'latitude_of_origin': self.lat_0,
            'central_meridian': self.lon_0,
            'false_easting': self.x_0,
            'false_northing': self.y_0,
        }
        # crs_from_wkt reads standard_parallel_1 as lat_ts (default 60): a
        # k0-form CRS round-trips only through CF attrs, not WKT1
        if self.lat_ts is not None:
            params['standard_parallel_1'] = self.lat_ts
        else:
            params['scale_factor'] = self.k0
        return self._projcs_wkt('unnamed', 'Polar_Stereographic', params)


# 6th-order Krueger series coefficients for transverse Mercator on WGS84-like
# ellipsoids (Karney 2011, "Transverse Mercator with an accuracy of a few
# nanometers"). Computed from n = f / (2 - f).
def _tm_series(n: float):
    n2, n3, n4, n5, n6 = n**2, n**3, n**4, n**5, n**6
    alpha = np.array([
        n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288 + 7891 * n6 / 37800,
        13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630 - 1983433 * n6 / 1935360,
        61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880 + 167603 * n6 / 181440,
        49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
        34729 * n5 / 80640 - 3418889 * n6 / 1995840,
        212378941 * n6 / 319334400,
    ])
    beta = np.array([
        n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512 + 96199 * n6 / 604800,
        n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105 - 1118711 * n6 / 3870720,
        17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
        4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
        4583 * n5 / 161280 - 108847 * n6 / 3991680,
        20648693 * n6 / 638668800,
    ])
    a_cap = (1.0 + n2 / 4 + n4 / 64 + n6 / 256) / (1.0 + n)  # A / a
    return alpha, beta, a_cap


@dataclass(frozen=True, eq=False)
class TransverseMercator(CRS):
    """Transverse Mercator (Krueger series, nm accuracy); basis for UTM."""

    lon_0: float = 0.0
    lat_0: float = 0.0
    k0: float = 0.9996
    x_0: float = 500000.0
    y_0: float = 0.0
    ellipsoid: Ellipsoid = WGS84
    utm_zone: Optional[int] = None
    utm_south: bool = False

    @host_eager
    def forward(self, lon, lat):
        ell = self.ellipsoid
        n = ell.f / (2.0 - ell.f)
        alpha, _, a_cap = _tm_series(n)
        e = ell.e
        lat_rad = jnp.deg2rad(lat)
        lon_rad = jnp.deg2rad(lon - self.lon_0)
        # conformal latitude
        s = jnp.sin(lat_rad)
        t = jnp.sinh(jnp.arctanh(s) - e * jnp.arctanh(e * s))
        xi_p = jnp.arctan2(t, jnp.cos(lon_rad))
        eta_p = jnp.arcsinh(jnp.sin(lon_rad) / jnp.sqrt(t * t + jnp.cos(lon_rad) ** 2))
        xi = xi_p
        eta = eta_p
        for j in range(6):
            xi = xi + alpha[j] * jnp.sin(2 * (j + 1) * xi_p) * jnp.cosh(2 * (j + 1) * eta_p)
            eta = eta + alpha[j] * jnp.cos(2 * (j + 1) * xi_p) * jnp.sinh(2 * (j + 1) * eta_p)
        big_a = a_cap * ell.a
        x = self.k0 * big_a * eta + self.x_0
        y = self.k0 * big_a * xi + self.y_0
        if self.lat_0 != 0.0:
            y = y - self.k0 * big_a * self._xi_of_lat0()
        return x, y

    def _xi_of_lat0(self) -> float:
        ell = self.ellipsoid
        n = ell.f / (2.0 - ell.f)
        alpha, _, _ = _tm_series(n)
        e = ell.e
        lat0 = np.deg2rad(self.lat_0)
        s = np.sin(lat0)
        t = np.sinh(np.arctanh(s) - e * np.arctanh(e * s))
        xi_p = np.arctan2(t, 1.0)
        xi = xi_p
        for j in range(6):
            xi += alpha[j] * np.sin(2 * (j + 1) * xi_p)
        return float(xi)

    @host_eager
    def inverse(self, x, y):
        ell = self.ellipsoid
        n = ell.f / (2.0 - ell.f)
        _, beta, a_cap = _tm_series(n)
        e = ell.e
        big_a = a_cap * ell.a
        y_adj = jnp.asarray(y) - self.y_0
        if self.lat_0 != 0.0:
            y_adj = y_adj + self.k0 * big_a * self._xi_of_lat0()
        xi = y_adj / (self.k0 * big_a)
        eta = (jnp.asarray(x) - self.x_0) / (self.k0 * big_a)
        xi_p = xi
        eta_p = eta
        for j in range(6):
            xi_p = xi_p - beta[j] * jnp.sin(2 * (j + 1) * xi) * jnp.cosh(2 * (j + 1) * eta)
            eta_p = eta_p - beta[j] * jnp.cos(2 * (j + 1) * xi) * jnp.sinh(2 * (j + 1) * eta)
        chi = jnp.arcsin(jnp.sin(xi_p) / jnp.cosh(eta_p))  # conformal latitude
        # invert conformal latitude by fixed-point iteration
        lat = chi
        for _ in range(10):
            s = jnp.sin(lat)
            lat = lat + (
                jnp.arcsin(jnp.clip(jnp.tanh(jnp.arctanh(jnp.sin(chi)) + e * jnp.arctanh(e * s)), -1, 1))
                - lat
            )
        lon = self.lon_0 + jnp.rad2deg(jnp.arctan2(jnp.sinh(eta_p), jnp.cos(xi_p)))
        return _norm_lon(lon), jnp.rad2deg(lat)

    def to_cf(self) -> dict:
        return {
            'grid_mapping_name': 'transverse_mercator',
            'longitude_of_central_meridian': self.lon_0,
            'latitude_of_projection_origin': self.lat_0,
            'scale_factor_at_central_meridian': self.k0,
            'false_easting': self.x_0,
            'false_northing': self.y_0,
            **self.ellipsoid.cf_attrs(),
        }

    def to_epsg(self) -> Optional[int]:
        # EPSG 326xx/327xx are the WGS 84 UTM codes specifically — a UTM
        # grid on another ellipsoid has no code here
        if self.utm_zone is not None and self.ellipsoid == WGS84:
            return (32700 if self.utm_south else 32600) + self.utm_zone
        return None

    def to_wkt(self) -> str:
        name = 'unnamed'
        if self.utm_zone is not None:
            # only claim the WGS 84 EPSG name when the datum actually IS
            # WGS84 — GIS tools classify by PROJCS name, and a mislabeled
            # datum in GUNW crs_wkt metadata would be silently wrong
            zone = f'UTM zone {self.utm_zone}{"S" if self.utm_south else "N"}'
            name = f'WGS 84 / {zone}' if self.ellipsoid == WGS84 else zone
        return self._projcs_wkt(name, 'Transverse_Mercator', {
            'latitude_of_origin': self.lat_0,
            'central_meridian': self.lon_0,
            'scale_factor': self.k0,
            'false_easting': self.x_0,
            'false_northing': self.y_0,
        })


def utm_crs(zone: int, south: bool = False) -> TransverseMercator:
    """UTM zone CRS (EPSG 326xx / 327xx)."""
    if not 1 <= int(zone) <= 60:
        raise ValueError(f'Invalid UTM zone: {zone} (must be 1-60)')
    return TransverseMercator(
        lon_0=-183.0 + 6.0 * zone,
        k0=0.9996,
        x_0=500000.0,
        y_0=10000000.0 if south else 0.0,
        utm_zone=zone,
        utm_south=south,
    )


def crs_from_epsg(code: Union[int, str]) -> CRS:
    code = int(code)
    if code == 4326:
        return Geographic()
    if code == 4978:
        return Geocentric()
    if 32601 <= code <= 32660:
        return utm_crs(code - 32600, south=False)
    if 32701 <= code <= 32760:
        return utm_crs(code - 32700, south=True)
    raise ValueError(f'Unsupported EPSG code: {code}')


def _ellipsoid_from_cf(cf: dict) -> Ellipsoid:
    def _scalar(v):
        return float(np.asarray(v).ravel()[0])

    if 'earth_radius' in cf:
        return Ellipsoid(a=_scalar(cf['earth_radius']), f=0.0)
    a = _scalar(cf.get('semi_major_axis', WGS84.a))
    if 'inverse_flattening' in cf:
        invf = _scalar(cf['inverse_flattening'])
        f = 0.0 if invf == 0 else 1.0 / invf
    elif 'semi_minor_axis' in cf:
        b = _scalar(cf['semi_minor_axis'])
        f = (a - b) / a
    else:
        f = WGS84.f
    if abs(a - WGS84.a) < 1e-3 and abs(f - WGS84.f) < 1e-12:
        return WGS84
    return Ellipsoid(a=a, f=f)


def crs_from_cf(cf: dict) -> CRS:
    """Build a CRS from CF grid-mapping attributes (as pyproj ``to_cf`` emits)."""
    cf = {k: (v.decode() if isinstance(v, bytes) else v) for k, v in cf.items()}
    name = cf.get('grid_mapping_name')
    if name is None and 'crs_wkt' in cf:
        return crs_from_wkt(cf['crs_wkt'])
    ell = _ellipsoid_from_cf(cf)

    def _scalar(key, default=0.0):
        v = cf.get(key, default)
        return float(np.asarray(v).ravel()[0])

    if name == 'latitude_longitude':
        return Geographic(ellipsoid=ell)
    if name == 'geocentric':
        return Geocentric(ellipsoid=ell)
    if name == 'lambert_conformal_conic':
        sp = np.atleast_1d(np.asarray(cf.get('standard_parallel', 0.0), dtype=float))
        return LambertConformalConic(
            lat_0=_scalar('latitude_of_projection_origin'),
            lon_0=_scalar('longitude_of_central_meridian'),
            lat_1=float(sp[0]),
            lat_2=float(sp[1]) if sp.size > 1 else None,
            x_0=_scalar('false_easting'),
            y_0=_scalar('false_northing'),
            ellipsoid=ell,
        )
    if name == 'polar_stereographic':
        lat_ts = cf.get('standard_parallel')
        return PolarStereographic(
            lat_0=_scalar('latitude_of_projection_origin', 90.0),
            lon_0=_scalar('straight_vertical_longitude_from_pole'),
            lat_ts=float(np.asarray(lat_ts).ravel()[0]) if lat_ts is not None else None,
            k0=_scalar('scale_factor_at_projection_origin', 1.0),
            x_0=_scalar('false_easting'),
            y_0=_scalar('false_northing'),
            ellipsoid=ell,
        )
    if name == 'transverse_mercator':
        return TransverseMercator(
            lon_0=_scalar('longitude_of_central_meridian'),
            lat_0=_scalar('latitude_of_projection_origin'),
            k0=_scalar('scale_factor_at_central_meridian', 1.0),
            x_0=_scalar('false_easting'),
            y_0=_scalar('false_northing'),
            ellipsoid=ell,
        )
    raise ValueError(f'Unsupported CF grid mapping: {name!r}')


def crs_from_wkt(wkt: str) -> CRS:
    """Very small WKT reader: classify by projection keyword.

    Only used to read CRS metadata written by other tools (e.g. the
    reference's processed weather files); our own files carry CF attrs.
    """
    w = wkt.lower()
    ell = WGS84
    m = re.search(r'(?:spheroid|ellipsoid)\s*\[\s*"[^"]*"\s*,\s*([-0-9.eE+]+)\s*,\s*([-0-9.eE+]+)', wkt, re.IGNORECASE)
    if m:
        a = float(m.group(1))
        invf = float(m.group(2))
        ell = Ellipsoid(a=a, f=0.0 if invf == 0 else 1.0 / invf)
    if 'geogcrs' in w or 'geogcs' in w or '"wgs 84"' in w and 'projcrs' not in w and 'projcs' not in w:
        if 'projcrs' not in w and 'projcs' not in w and 'geoccs' not in w:
            return Geographic(ellipsoid=ell)
    if 'geocentric' in w or 'geoccs' in w or '4978' in w:
        return Geocentric(ellipsoid=ell)

    def _param(name, default=0.0):
        m = re.search(r'parameter\s*\[\s*"' + name + r'"\s*,\s*([-0-9.eE+]+)', wkt, re.IGNORECASE)
        return float(m.group(1)) if m else default
    if 'lambert' in w:
        return LambertConformalConic(
            lat_0=_param('latitude_of_origin'),
            lon_0=_param('central_meridian'),
            lat_1=_param('standard_parallel_1'),
            lat_2=_param('standard_parallel_2', _param('standard_parallel_1')),
            x_0=_param('false_easting'),
            y_0=_param('false_northing'),
            ellipsoid=ell,
        )
    if 'stereographic' in w or 'stere' in w:
        # the k0 form carries scale_factor and no standard parallel
        has_sp = re.search(r'parameter\s*\[\s*"standard_parallel_1"', wkt,
                           re.IGNORECASE) is not None
        has_k0 = re.search(r'parameter\s*\[\s*"scale_factor"', wkt,
                           re.IGNORECASE) is not None
        return PolarStereographic(
            lat_0=_param('latitude_of_origin', 90.0),
            lon_0=_param('central_meridian'),
            lat_ts=(None if (has_k0 and not has_sp)
                    else _param('standard_parallel_1', 60.0)),
            k0=_param('scale_factor', 1.0),
            x_0=_param('false_easting'),
            y_0=_param('false_northing'),
            ellipsoid=ell,
        )
    if 'transverse' in w or 'utm' in w:
        return TransverseMercator(
            lon_0=_param('central_meridian'),
            lat_0=_param('latitude_of_origin'),
            k0=_param('scale_factor', 0.9996),
            x_0=_param('false_easting', 500000.0),
            y_0=_param('false_northing'),
            ellipsoid=ell,
        )
    raise ValueError('Could not classify WKT CRS')


def crs_from_user(value) -> CRS:
    """Parse int EPSG / 'EPSG:xxxx' / CRS instance (reference: utilFcns.py:968)."""
    if isinstance(value, CRS):
        return value
    if isinstance(value, int):
        return crs_from_epsg(value)
    if isinstance(value, str):
        v = value.strip()
        if v.upper().startswith('EPSG:'):
            return crs_from_epsg(v.split(':')[-1])
        if v.isdigit():
            return crs_from_epsg(v)
        return crs_from_wkt(v)
    if isinstance(value, dict):
        return crs_from_cf(value)
    raise TypeError(f'Cannot interpret {value!r} as a CRS')


@host_eager
def transform_points(src: CRS, dst: CRS, x, y, z=None):
    """Transform coordinate tuples between two CRS (always_xy ordering).

    Equivalent capability to pyproj Transformer.transform (reference:
    tools/RAiDER/delay.py:404-436). Heights pass through unchanged except
    for geocentric conversions. Works under jit.
    """
    from raider_tpu.geodesy.ellipsoid import ecef2lla, lla2ecef

    if src == dst:
        return (x, y) if z is None else (x, y, z)

    # source -> geographic lon/lat(/h)
    if src.is_geocentric:
        lat, lon, h = ecef2lla(x, y, z)
    else:
        lon, lat = src.inverse(x, y)
        h = z

    if dst.is_geocentric:
        if h is None:
            h = jnp.zeros_like(lon)
        return lla2ecef(lat, lon, h)

    xo, yo = dst.forward(lon, lat)
    return (xo, yo) if h is None else (xo, yo, h)
