"""Geodesy correctness: ECEF<->LLA, ENU, gravity, and map projections.

Cross-validates the closed-form JAX implementations against independent
iterative/textbook solutions computed in the tests themselves, plus published
numerical examples from Snyder (1987).
"""

import numpy as np
import pytest

from raider_tpu.constants import WGS84_A, WGS84_E2
from raider_tpu.geodesy import (
    LambertConformalConic,
    PolarStereographic,
    TransverseMercator,
    Geographic,
    Geocentric,
    crs_from_cf,
    crs_from_epsg,
    ecef2enu,
    ecef2lla,
    enu2ecef,
    geo_to_ht,
    get_Re,
    lla2ecef,
    transform_points,
)
from raider_tpu.geodesy.crs import Ellipsoid, utm_crs


def _ecef2lla_iterative(x, y, z):
    """Independent Bowring-style iteration, for cross-validation."""
    lon = np.arctan2(y, x)
    p = np.sqrt(x**2 + y**2)
    lat = np.arctan2(z, p * (1 - WGS84_E2))
    for _ in range(25):
        n = WGS84_A / np.sqrt(1 - WGS84_E2 * np.sin(lat) ** 2)
        h = p / np.cos(lat) - n
        lat = np.arctan2(z, p * (1 - WGS84_E2 * n / (n + h)))
    n = WGS84_A / np.sqrt(1 - WGS84_E2 * np.sin(lat) ** 2)
    h = p / np.cos(lat) - n
    return np.rad2deg(lat), np.rad2deg(lon), h


class TestEcefLla:
    def test_known_points(self):
        x, y, z = (np.asarray(v) for v in lla2ecef(0.0, 0.0, 0.0))
        np.testing.assert_allclose([x, y, z], [WGS84_A, 0, 0], atol=1e-9)

        x, y, z = (np.asarray(v) for v in lla2ecef(90.0, 0.0, 0.0))
        np.testing.assert_allclose(z, 6356752.314245179, atol=1e-6)
        np.testing.assert_allclose([x, y], [0, 0], atol=1e-6)

    def test_roundtrip_random(self, rng):
        lat = rng.uniform(-89.9, 89.9, 1000)
        lon = rng.uniform(-180, 180, 1000)
        h = rng.uniform(-500, 80000, 1000)
        x, y, z = lla2ecef(lat, lon, h)
        lat2, lon2, h2 = (np.asarray(v) for v in ecef2lla(x, y, z))
        np.testing.assert_allclose(lat2, lat, atol=1e-10)
        np.testing.assert_allclose(
            np.mod(np.asarray(lon2) - lon + 180, 360) - 180, 0, atol=1e-10
        )
        np.testing.assert_allclose(h2, h, atol=1e-6)  # sub-micron height

    def test_vs_iterative(self, rng):
        lat = rng.uniform(-89, 89, 200)
        lon = rng.uniform(-180, 180, 200)
        h = rng.uniform(-500, 80000, 200)
        x, y, z = (np.asarray(v) for v in lla2ecef(lat, lon, h))
        la1, lo1, h1 = (np.asarray(v) for v in ecef2lla(x, y, z))
        la2, lo2, h2 = _ecef2lla_iterative(x, y, z)
        np.testing.assert_allclose(la1, la2, atol=1e-9)
        np.testing.assert_allclose(h1, h2, atol=1e-5)


class TestEnu:
    def test_enu_ecef_roundtrip(self, rng):
        e, n, u = rng.normal(size=(3, 100))
        lat0 = rng.uniform(-80, 80, 100)
        lon0 = rng.uniform(-180, 180, 100)
        xyz = np.asarray(enu2ecef(e, n, u, lat0, lon0))
        enu = np.asarray(ecef2enu(xyz, lat0, lon0))
        np.testing.assert_allclose(enu[..., 0], e, atol=1e-12)
        np.testing.assert_allclose(enu[..., 1], n, atol=1e-12)
        np.testing.assert_allclose(enu[..., 2], u, atol=1e-12)

    def test_up_is_normal(self):
        # pure "up" at (0, 0) is +x in ECEF
        v = np.asarray(enu2ecef(0.0, 0.0, 1.0, 0.0, 0.0))
        np.testing.assert_allclose(v, [1, 0, 0], atol=1e-15)


class TestGravity:
    def test_get_Re_limits(self):
        out = np.asarray(get_Re(np.array([0.0, 30, 45, 60, 90])))
        np.testing.assert_allclose(out[0], 6378137.0)
        np.testing.assert_allclose(out[-1], 6356752.0)
        # reference docstring values (tools/RAiDER/utilFcns.py:366-371)
        np.testing.assert_allclose(out[1], 6372770.5219805, atol=1e-4)
        np.testing.assert_allclose(out[2], 6367417.56705189, atol=1e-4)

    def test_geo_to_ht_zero(self):
        np.testing.assert_allclose(np.asarray(geo_to_ht(45.0, 0.0)), 0.0, atol=1e-12)

    def test_geo_to_ht_monotone(self):
        h = np.asarray(geo_to_ht(np.full(5, 40.0), np.linspace(0, 30000, 5)))
        assert np.all(np.diff(h) > 0)


class TestProjections:
    def test_lcc_snyder_example(self):
        """Snyder (1987) p. 296-297: Clarke 1866, SP 33/45, origin (23, -96)."""
        clarke1866 = Ellipsoid(a=6378206.4, f=1 / 294.978698213898)
        crs = LambertConformalConic(
            lat_0=23.0, lon_0=-96.0, lat_1=33.0, lat_2=45.0, ellipsoid=clarke1866
        )
        x, y = (np.asarray(v) for v in crs.forward(-75.0, 35.0))
        np.testing.assert_allclose(x, 1894410.9, atol=0.5)
        np.testing.assert_allclose(y, 1564649.5, atol=0.5)
        lon, lat = (np.asarray(v) for v in crs.inverse(x, y))
        np.testing.assert_allclose([lon, lat], [-75.0, 35.0], atol=1e-9)

    def test_lcc_hrrr_roundtrip(self, rng):
        """HRRR CONUS grid mapping (sphere, SP=38.5)."""
        crs = LambertConformalConic(
            lat_0=38.5, lon_0=262.5, lat_1=38.5, lat_2=38.5,
            ellipsoid=Ellipsoid(a=6371229.0, f=0.0),
        )
        lon = rng.uniform(-130, -60, 500)
        lat = rng.uniform(21, 53, 500)
        x, y = crs.forward(lon, lat)
        lon2, lat2 = (np.asarray(v) for v in crs.inverse(x, y))
        np.testing.assert_allclose(np.mod(lon2 - lon + 180, 360) - 180, 0, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_polar_stereo_snyder_example(self):
        """Snyder (1987) p. 315: International ellipsoid, south polar,
        lat_ts=-71, lon_0=-100, point (-75, 150) -> (-1540033.6, -560526.4)."""
        intl = Ellipsoid(a=6378388.0, f=1 / 297.0)
        crs = PolarStereographic(lat_0=-90.0, lon_0=-100.0, lat_ts=-71.0, ellipsoid=intl)
        x, y = (np.asarray(v) for v in crs.forward(150.0, -75.0))
        np.testing.assert_allclose(x, -1540033.6, atol=0.5)
        np.testing.assert_allclose(y, -560526.4, atol=0.5)
        lon, lat = (np.asarray(v) for v in crs.inverse(x, y))
        np.testing.assert_allclose(np.mod(lon - 150.0 + 180, 360) - 180, 0.0, atol=1e-9)
        np.testing.assert_allclose(lat, -75.0, atol=1e-9)

    def test_polar_stereo_hrrrak_roundtrip(self, rng):
        crs = PolarStereographic(
            lat_0=90.0, lon_0=225.0, lat_ts=60.0, ellipsoid=Ellipsoid(a=6371229.0, f=0.0)
        )
        lon = rng.uniform(-180, -130, 300)
        lat = rng.uniform(45, 75, 300)
        x, y = crs.forward(lon, lat)
        lon2, lat2 = (np.asarray(v) for v in crs.inverse(x, y))
        np.testing.assert_allclose(np.mod(lon2 - lon + 180, 360) - 180, 0, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_utm_known_point(self):
        """UTM 18N of (40.5N, 73.5W): independently-computed Redfearn value."""
        crs = utm_crs(18)
        x, y = (np.asarray(v) for v in crs.forward(-73.5, 40.5))
        xr, yr = _utm_redfearn(-73.5, 40.5, lon0=-75.0)
        np.testing.assert_allclose(x, xr, atol=2e-3)
        np.testing.assert_allclose(y, yr, atol=2e-3)

    def test_utm_roundtrip(self, rng):
        crs = utm_crs(11)  # California
        lon = rng.uniform(-120, -114, 300)
        lat = rng.uniform(30, 45, 300)
        x, y = crs.forward(lon, lat)
        lon2, lat2 = (np.asarray(v) for v in crs.inverse(x, y))
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_cf_roundtrip(self):
        for crs in [
            Geographic(),
            LambertConformalConic(lat_0=38.5, lon_0=262.5, lat_1=38.5,
                                  ellipsoid=Ellipsoid(6371229.0, 0.0)),
            PolarStereographic(lat_0=90, lon_0=225.0, lat_ts=60.0,
                               ellipsoid=Ellipsoid(6371229.0, 0.0)),
            utm_crs(18),
        ]:
            assert crs_from_cf(crs.to_cf()) == crs

    def test_transform_points_geo_to_ecef(self):
        x, y, z = transform_points(crs_from_epsg(4326), crs_from_epsg(4978), 0.0, 0.0, 0.0)
        np.testing.assert_allclose(np.asarray(x), WGS84_A, atol=1e-9)

    def test_transform_points_identity(self):
        g = Geographic()
        out = transform_points(g, Geographic(), 1.0, 2.0, 3.0)
        assert out == (1.0, 2.0, 3.0)


def _utm_redfearn(lon_deg, lat_deg, lon0, a=6378137.0, invf=298.257223563, k0=0.9996):
    """Independent classic Redfearn-series UTM forward, for cross-validation."""
    f = 1.0 / invf
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    lat = np.deg2rad(lat_deg)
    dlon = np.deg2rad(lon_deg - lon0)
    N = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
    T = np.tan(lat) ** 2
    C = ep2 * np.cos(lat) ** 2
    A = np.cos(lat) * dlon
    M = a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * lat
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * lat)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * lat)
        - (35 * e2**3 / 3072) * np.sin(6 * lat)
    )
    x = k0 * N * (A + (1 - T + C) * A**3 / 6 + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120)
    y = k0 * (M + N * np.tan(lat) * (A**2 / 2 + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
                                     + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720))
    return x + 500000.0, y


def test_crs_forward_traceable_under_jit():
    """Projected CRS forwards must be jit-traceable: the device-geometry
    path calls them inside a compiled program (projection constants must be
    computed with NumPy on python floats, never jnp under trace)."""
    import jax
    import jax.numpy as jnp

    from raider_tpu.wx.hrrr import HRRR_AK_PROJ, HRRR_CONUS_PROJ

    lon = jnp.asarray(np.array([-117.8, -148.0]))
    lat = jnp.asarray(np.array([33.4, 65.0]))
    for crs in (HRRR_CONUS_PROJ, HRRR_AK_PROJ, utm_crs(11)):
        fwd = jax.jit(lambda lo, la, c=crs: c.forward(lo, la))
        x, y = fwd(lon, lat)
        xe, ye = crs.forward(np.array([-117.8, -148.0]), np.array([33.4, 65.0]))
        np.testing.assert_allclose(np.asarray(x), np.asarray(xe), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ye), rtol=1e-9)


class TestCrsEdgeCases:
    """Antimeridian, pole, and longitude-normalization behavior of the
    closed-form CRS engine — the regimes where a from-scratch projection
    implementation diverges from PROJ if the wrap handling is wrong
    (reference delegates all of this to pyproj)."""

    def _ps_ak(self):
        return PolarStereographic(lat_0=90.0, lon_0=225.0, lat_ts=60.0,
                                  ellipsoid=Ellipsoid(a=6371229.0, f=0.0))

    def _lcc_conus(self):
        return LambertConformalConic(lat_0=38.5, lon_0=262.5, lat_1=38.5,
                                     lat_2=38.5,
                                     ellipsoid=Ellipsoid(a=6371229.0, f=0.0))

    @staticmethod
    def _rt(crs, lon, lat):
        x, y = (np.asarray(v) for v in crs.forward(np.float64(lon),
                                                   np.float64(lat)))
        lon2, lat2 = (float(np.asarray(v)) for v in crs.inverse(x, y))
        return lon2, lat2

    def test_inverse_lon_normalized(self):
        """PROJ convention: inverse longitudes in [-180, 180) even when
        lon_0 is far from zero (HRRR 262.5, HRRR-AK 225)."""
        for crs, lon, lat in [(self._ps_ak(), 10.0, 65.0),
                              (self._lcc_conus(), 82.6, 38.5),
                              (utm_crs(1), 177.0, 10.0)]:
            lon2, lat2 = self._rt(crs, lon, lat)
            assert -180.0 <= lon2 < 180.0
            np.testing.assert_allclose(np.mod(lon2 - lon + 180, 360) - 180,
                                       0.0, atol=1e-8)
            np.testing.assert_allclose(lat2, lat, atol=1e-8)

    def test_ps_antimeridian_continuity(self):
        """Forward must be continuous across lon = +/-180 (an Alaska scene
        spans the antimeridian)."""
        ps = self._ps_ak()
        xw, yw = (float(np.asarray(v)) for v in ps.forward(np.float64(179.999), np.float64(65.0)))
        xe, ye = (float(np.asarray(v)) for v in ps.forward(np.float64(-179.999), np.float64(65.0)))
        assert np.hypot(xw - xe, yw - ye) < 300.0  # ~0.002 deg at 65N
        for lon in (180.0, -180.0):
            lon2, lat2 = self._rt(ps, lon, 65.0)
            np.testing.assert_allclose(np.mod(lon2 - 180.0 + 180, 360) - 180,
                                       0.0, atol=1e-8)
            np.testing.assert_allclose(lat2, 65.0, atol=1e-8)

    def test_ps_pole(self):
        """The pole maps to the projection origin; its inverse returns
        lat=90 with a finite, normalized longitude."""
        ps = self._ps_ak()
        x, y = (float(np.asarray(v)) for v in ps.forward(np.float64(10.0), np.float64(90.0)))
        np.testing.assert_allclose([x, y], [0.0, 0.0], atol=1e-6)
        lon2, lat2 = (float(np.asarray(v)) for v in ps.inverse(0.0, 0.0))
        np.testing.assert_allclose(lat2, 90.0, atol=1e-9)
        assert -180.0 <= lon2 < 180.0 and np.isfinite(lon2)

    def test_lcc_cone_cut(self):
        """Points on both sides of the cone's cut (lon_0 +/- 180 = 82.5)
        round-trip to the same angle mod 360."""
        lcc = self._lcc_conus()
        for lon in (82.4, 82.6, -277.6):
            lon2, lat2 = self._rt(lcc, lon, 38.5)
            np.testing.assert_allclose(np.mod(lon2 - lon + 180, 360) - 180,
                                       0.0, atol=1e-8)
            assert -180.0 <= lon2 < 180.0

    def test_utm_south_roundtrip(self, rng):
        """UTM 23S (the Brazilian tropics scene's zone): false northing,
        negative latitudes."""
        crs = utm_crs(23, south=True)
        lon = rng.uniform(-45.0, -39.0, 200)
        lat = rng.uniform(-6.0, -1.0, 200)
        x, y = (np.asarray(v) for v in crs.forward(lon, lat))
        assert (y > 0).all() and (y < 10000000.0).all()  # false northing
        lon2, lat2 = (np.asarray(v) for v in crs.inverse(x, y))
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_utm_south_epsg(self):
        c = crs_from_epsg(32723)
        assert c == utm_crs(23, south=True)
        assert c.to_epsg() == 32723


class TestWktEmission:
    """to_wkt round-trips through crs_from_wkt for every CRS family.

    The reference gets WKT emission free from pyproj (GUNW crs_wkt,
    aria/calcGUNW.py:150-158); ours is closed-form WKT1."""

    def _cases(self):
        from raider_tpu.geodesy.crs import (
            SPHERE_6371229, Geocentric, Geographic, LambertConformalConic,
            PolarStereographic)

        return [
            Geographic(),
            Geocentric(),
            LambertConformalConic(lat_0=38.5, lon_0=-97.5, lat_1=38.5,
                                  lat_2=38.5, ellipsoid=SPHERE_6371229),
            PolarStereographic(lat_0=90.0, lon_0=-135.0, lat_ts=60.0,
                               ellipsoid=SPHERE_6371229),
            PolarStereographic(lat_0=-90.0, lon_0=0.0, lat_ts=None, k0=0.994),
            utm_crs(11),
            utm_crs(23, south=True),
        ]

    def test_roundtrip_cf_identical(self):
        from raider_tpu.geodesy.crs import crs_from_wkt

        for crs in self._cases():
            back = crs_from_wkt(crs.to_wkt())
            assert back.to_cf() == crs.to_cf(), crs.to_wkt()

    def test_roundtrip_forward_bitexact(self, rng):
        from raider_tpu.geodesy.crs import crs_from_wkt

        lon = rng.uniform(-170.0, 170.0, 64)
        lat = rng.uniform(-80.0, 80.0, 64)
        for crs in self._cases():
            if crs.is_geocentric:
                continue
            back = crs_from_wkt(crs.to_wkt())
            x1, y1 = (np.asarray(v) for v in crs.forward(lon, lat))
            x2, y2 = (np.asarray(v) for v in back.forward(lon, lat))
            np.testing.assert_array_equal(x1, x2)
            np.testing.assert_array_equal(y1, y2)
