"""Origin-relative coordinate frame + df64 sphere-stereo CRS transform.

Round-5 precision item (BASELINE.md antimeridian-AK diagnosis): horizontal
kernel coordinates used to collapse to f32 in the ABSOLUTE model frame
(~0.25-1.7 m/ulp for stereo meters / antimeridian degrees, amplified by the
NCEP-stereo 60N magnification into the scene class's 0.067-0.101 mm parity
spread). The engine now shifts boundary coords and the kernel's static y/x
axes by the grid origin before the f32 entry, and the sphere-datum stereo
device path runs the whole CRS transform in df64
(device_geom._stereo_rel_from_df — algebraic, no trig: reference CRS
behavior is pyproj's, reference models/hrrr.py:22-25 for the projection).
"""

import datetime as dt
import os

import numpy as np
import pytest

from raider_tpu.geodesy.crs import (Geographic, LambertConformalConic,
                                    PolarStereographic, TransverseMercator)
from raider_tpu.geodesy.ellipsoid import ecef2lla, lla2ecef
from raider_tpu.geometry.device_geom import (
    _crs_df_mode, _geo_rel_from_df, _lcc_rel_from_df, _stereo_rel_from_df,
    _tm_rel_from_df, split_f64)
from raider_tpu.wx.hrrr import HRRR_AK_PROJ, HRRR_CONUS_PROJ


def _host_forward_f64(crs, x, y, z):
    """f64 host truth: ecef2lla -> crs.forward (numpy, eager)."""
    lat, lon, _ = (np.asarray(v) for v in ecef2lla(x, y, z))
    gx, gy = (np.asarray(v) for v in crs.forward(lon, lat))
    return gx.astype(np.float64), gy.astype(np.float64)


def _scene_points(rng, lon_lo, lon_hi, lat_lo, lat_hi, n=400):
    lon = rng.uniform(lon_lo, lon_hi, n)
    lat = rng.uniform(lat_lo, lat_hi, n)
    h = rng.uniform(-200.0, 26000.0, n)
    x, y, z = (np.asarray(v) for v in lla2ecef(lat, lon, h))
    return x, y, z, h


def _rel_coords_df(crs, x, y, z, h, org_yx):
    import jax.numpy as jnp

    fn = {'stereo': _stereo_rel_from_df,
          'lcc': _lcc_rel_from_df,
          'tm': _tm_rel_from_df}[_crs_df_mode(crs)]
    hi, lo = split_f64(np.stack([x, y, z], axis=-1))
    o = np.asarray(org_yx, np.float64)
    o_hi = o.astype(np.float32)
    o_lo = (o - o_hi.astype(np.float64)).astype(np.float32)
    xs, ys = fn(
        jnp.asarray(hi[:, 0]), jnp.asarray(hi[:, 1]), jnp.asarray(hi[:, 2]),
        jnp.asarray(lo[:, 0]), jnp.asarray(lo[:, 1]), jnp.asarray(lo[:, 2]),
        jnp.asarray(h.astype(np.float32)), crs,
        jnp.asarray(o_hi), jnp.asarray(o_lo))
    return np.asarray(xs, np.float64), np.asarray(ys, np.float64)


class TestStereoDf:
    def test_supported_matrix(self):
        assert _crs_df_mode(HRRR_AK_PROJ) == 'stereo'
        assert _crs_df_mode(HRRR_CONUS_PROJ) == 'lcc'
        # ellipsoidal datums ride df64 exp/log for the conformal factor
        assert _crs_df_mode(PolarStereographic(
            lat_0=90.0, lon_0=225.0, lat_ts=60.0)) == 'stereo'
        assert _crs_df_mode(Geographic()) is None  # is_geo dispatch instead
        assert _crs_df_mode(TransverseMercator(lon_0=-117.0)) == 'tm'

    def test_antimeridian_ak_matches_f64_host(self, rng):
        """The diagnosed scene class: AK stereo across the antimeridian."""
        x, y, z, h = _scene_points(rng, 177.0, 183.0, 58.0, 62.5)
        gx, gy = _host_forward_f64(HRRR_AK_PROJ, x, y, z)
        org = (gy.min(), gx.min())
        xs, ys = _rel_coords_df(HRRR_AK_PROJ, x, y, z, h, org)
        # budget: df64 transform ~1e-4 m + origin-relative f32 collapse
        # (~0.03 m at the 5e5 m grid extent). The absolute-frame f32 path
        # this replaces carries ~1-2 m here.
        err = np.hypot(xs - (gx - org[1]), ys - (gy - org[0]))
        assert err.max() < 0.05, err.max()

    def test_far_from_pole_and_low_lat(self, rng):
        """Mid-latitude edge of a stereo domain (larger rho, t not small)."""
        x, y, z, h = _scene_points(rng, 150.0, 160.0, 45.0, 50.0)
        gx, gy = _host_forward_f64(HRRR_AK_PROJ, x, y, z)
        org = (gy.min(), gx.min())
        xs, ys = _rel_coords_df(HRRR_AK_PROJ, x, y, z, h, org)
        err = np.hypot(xs - (gx - org[1]), ys - (gy - org[0]))
        # rho ~ 5e6 m here: relative f32 collapse dominated by the ~1e6 m
        # extent of this box
        assert err.max() < 0.15, err.max()

    def test_south_polar_branch(self, rng):
        crs = PolarStereographic(lat_0=-90.0, lon_0=0.0, lat_ts=-71.0,
                                 ellipsoid=HRRR_AK_PROJ.ellipsoid)
        assert _crs_df_mode(crs) == 'stereo'
        x, y, z, h = _scene_points(rng, -30.0, 30.0, -75.0, -68.0)
        gx, gy = _host_forward_f64(crs, x, y, z)
        org = (gy.min(), gx.min())
        xs, ys = _rel_coords_df(crs, x, y, z, h, org)
        err = np.hypot(xs - (gx - org[1]), ys - (gy - org[0]))
        assert err.max() < 0.3, err.max()  # ~4e6 m extent at 70S

    def test_false_easting_northing(self, rng):
        crs = PolarStereographic(lat_0=90.0, lon_0=225.0, lat_ts=60.0,
                                 x_0=2.0e6, y_0=-1.5e6,
                                 ellipsoid=HRRR_AK_PROJ.ellipsoid)
        x, y, z, h = _scene_points(rng, 200.0, 210.0, 58.0, 62.0)
        gx, gy = _host_forward_f64(crs, x, y, z)
        org = (gy.min(), gx.min())
        xs, ys = _rel_coords_df(crs, x, y, z, h, org)
        err = np.hypot(xs - (gx - org[1]), ys - (gy - org[0]))
        assert err.max() < 0.1, err.max()

    def test_ellipsoidal_stereo_wgs84(self, rng):
        """EPSG-3413-style stereo on WGS84: conformal factor via exp/log."""
        crs = PolarStereographic(lat_0=90.0, lon_0=-45.0, lat_ts=70.0)
        x, y, z, h = _scene_points(rng, -60.0, -30.0, 65.0, 75.0)
        gx, gy = _host_forward_f64(crs, x, y, z)
        org = (gy.min(), gx.min())
        xs, ys = _rel_coords_df(crs, x, y, z, h, org)
        err = np.hypot(xs - (gx - org[1]), ys - (gy - org[0]))
        assert err.max() < 0.3, err.max()  # ~3e6 m extent


class TestLccDf:
    def test_hrrr_conus_matches_f64_host(self, rng):
        """The headline model's CRS: NCEP-sphere LCC at the western edge
        (the measured 0.09-0.12 mm parity regime before this path)."""
        x, y, z, h = _scene_points(rng, 244.0, 250.0, 37.0, 43.0)
        gx, gy = _host_forward_f64(HRRR_CONUS_PROJ, x, y, z)
        org = (gy.min(), gx.min())
        xs, ys = _rel_coords_df(HRRR_CONUS_PROJ, x, y, z, h, org)
        err = np.hypot(xs - (gx - org[1]), ys - (gy - org[0]))
        assert err.max() < 0.1, err.max()  # ~6e5 m extent

    def test_central_meridian_and_east_edge(self, rng):
        for lon_lo, lon_hi in ((260.0, 265.0), (285.0, 292.0)):
            x, y, z, h = _scene_points(rng, lon_lo, lon_hi, 30.0, 45.0)
            gx, gy = _host_forward_f64(HRRR_CONUS_PROJ, x, y, z)
            org = (gy.min(), gx.min())
            xs, ys = _rel_coords_df(HRRR_CONUS_PROJ, x, y, z, h, org)
            err = np.hypot(xs - (gx - org[1]), ys - (gy - org[0]))
            assert err.max() < 0.35, err.max()  # up to ~2e6 m extent

    def test_two_parallel_ellipsoidal_lcc(self, rng):
        """Two standard parallels on WGS84 (n from the log ratio)."""
        crs = LambertConformalConic(lat_0=40.0, lon_0=-96.0,
                                    lat_1=33.0, lat_2=45.0)
        x, y, z, h = _scene_points(rng, -110.0, -100.0, 35.0, 44.0)
        gx, gy = _host_forward_f64(crs, x, y, z)
        org = (gy.min(), gx.min())
        xs, ys = _rel_coords_df(crs, x, y, z, h, org)
        err = np.hypot(xs - (gx - org[1]), ys - (gy - org[0]))
        assert err.max() < 0.3, err.max()

    def test_southern_cone(self, rng):
        """Negative n: southern-hemisphere LCC."""
        crs = LambertConformalConic(lat_0=-35.0, lon_0=140.0,
                                    lat_1=-30.0, lat_2=-40.0,
                                    ellipsoid=HRRR_CONUS_PROJ.ellipsoid)
        x, y, z, h = _scene_points(rng, 130.0, 150.0, -42.0, -28.0)
        gx, gy = _host_forward_f64(crs, x, y, z)
        org = (gy.min(), gx.min())
        xs, ys = _rel_coords_df(crs, x, y, z, h, org)
        err = np.hypot(xs - (gx - org[1]), ys - (gy - org[0]))
        assert err.max() < 0.5, err.max()  # ~3.5e6 m extents


class TestTmDf:
    def test_utm_11n_matches_f64_host(self, rng):
        """UTM zone 11N (the LA regime's zone)."""
        crs = TransverseMercator(lon_0=-117.0, utm_zone=11)
        x, y, z, h = _scene_points(rng, -120.6, -115.4, 32.0, 35.0)
        gx, gy = _host_forward_f64(crs, x, y, z)
        org = (gy.min(), gx.min())
        xs, ys = _rel_coords_df(crs, x, y, z, h, org)
        err = np.hypot(xs - (gx - org[1]), ys - (gy - org[0]))
        assert err.max() < 0.1, err.max()  # ~5e5 m extent

    def test_far_from_central_meridian(self, rng):
        """dlon up to ~12 deg: eta' large, the sinh/cosh recurrence tail."""
        crs = TransverseMercator(lon_0=-117.0, utm_zone=11)
        x, y, z, h = _scene_points(rng, -130.0, -105.0, 30.0, 60.0)
        gx, gy = _host_forward_f64(crs, x, y, z)
        org = (gy.min(), gx.min())
        xs, ys = _rel_coords_df(crs, x, y, z, h, org)
        err = np.hypot(xs - (gx - org[1]), ys - (gy - org[0]))
        assert err.max() < 1.5, err.max()  # ~3.5e6 m extents

    def test_southern_hemisphere_with_lat0(self, rng):
        """Non-UTM TM with lat_0 != 0 (the _xi_of_lat0 offset) + south."""
        crs = TransverseMercator(lon_0=145.0, lat_0=-37.0, k0=1.0,
                                 x_0=2.5e6, y_0=2.5e6)
        x, y, z, h = _scene_points(rng, 141.0, 149.0, -43.0, -34.0)
        gx, gy = _host_forward_f64(crs, x, y, z)
        org = (gy.min(), gx.min())
        xs, ys = _rel_coords_df(crs, x, y, z, h, org)
        err = np.hypot(xs - (gx - org[1]), ys - (gy - org[0]))
        assert err.max() < 0.5, err.max()

    def test_high_latitude_edge(self, rng):
        """UTM validity edge (~lat 80): atanh(sin) cancellation regime."""
        crs = TransverseMercator(lon_0=15.0, utm_zone=33)
        x, y, z, h = _scene_points(rng, 10.0, 20.0, 75.0, 80.0)
        gx, gy = _host_forward_f64(crs, x, y, z)
        org = (gy.min(), gx.min())
        xs, ys = _rel_coords_df(crs, x, y, z, h, org)
        err = np.hypot(xs - (gx - org[1]), ys - (gy - org[0]))
        assert err.max() < 0.3, err.max()


class TestGeoDf:
    def _rel_geo(self, x, y, z, h, org_yx):
        import jax.numpy as jnp

        hi, lo = split_f64(np.stack([x, y, z], axis=-1))
        o = np.asarray(org_yx, np.float64)
        o_hi = o.astype(np.float32)
        o_lo = (o - o_hi.astype(np.float64)).astype(np.float32)
        xs, ys = _geo_rel_from_df(
            jnp.asarray(hi[:, 0]), jnp.asarray(hi[:, 1]),
            jnp.asarray(hi[:, 2]),
            jnp.asarray(lo[:, 0]), jnp.asarray(lo[:, 1]),
            jnp.asarray(lo[:, 2]),
            jnp.asarray(h.astype(np.float32)),
            jnp.asarray(o_hi), jnp.asarray(o_lo))
        return np.asarray(xs, np.float64), np.asarray(ys, np.float64)

    # NOTE: no antimeridian-CROSSING geographic case: a geographic grid
    # crossing +/-180 has discontinuous axes in the (-180, 180] host
    # convention (the engine's locate needs monotonic axes, so loaders
    # never produce one — AK-regime models use stereo METERS instead),
    # and "relative to the min" would span ~360 deg, putting the f32
    # collapse back at the absolute ulp. df64 and host share the atan2
    # seam convention, so near-seam NON-crossing grids are exact.
    @pytest.mark.parametrize('lon_lo,lon_hi,lat_lo,lat_hi', [
        (-120.6, -115.4, 32.0, 35.0),     # the LA regime
        (175.0, 179.95, 58.0, 62.5),      # west of the antimeridian
        (-179.95, -174.0, -5.0, 5.0),     # east of it, at the equator
        (-3.0, 3.0, -35.0, -28.0),        # prime meridian, southern
    ])
    def test_matches_f64_host(self, rng, lon_lo, lon_hi, lat_lo, lat_hi):
        x, y, z, h = _scene_points(rng, lon_lo, lon_hi, lat_lo, lat_hi)
        lat_t, lon_t, _ = (np.asarray(v, np.float64)
                           for v in ecef2lla(x, y, z))
        org = (lat_t.min(), lon_t.min())
        xs, ys = self._rel_geo(x, y, z, h, org)
        # degrees -> meters at this latitude for an honest position bound:
        # the floor is the f32 collapse of the origin-relative value, i.e.
        # ~1 ulp of the grid EXTENT (plus the ~1e-4 m df64 fixed point)
        m_per_deg = 111.3e3
        extent = max(lon_hi - lon_lo, lat_hi - lat_lo)
        bound = m_per_deg * extent * 1.2e-7 * 1.5 + 0.01
        err_m = np.hypot(
            (xs - (lon_t - org[1])) * m_per_deg * np.cos(np.deg2rad(lat_t)),
            (ys - (lat_t - org[0])) * m_per_deg)
        assert err_m.max() < bound, (err_m.max(), bound)


class TestEngineOriginRel:
    @pytest.mark.parametrize('scene_kind', ['geo', 'stereo', 'lcc'])
    def test_host_path_frame_equivalence(self, scene_kind, monkeypatch):
        """ORIGIN_REL on/off: same physics, only f32 sampling jitter.

        The two frames round sampling coordinates differently at the f32
        kernel entry; the delay difference is bounded by that coordinate
        noise times the field gradient — far under the parity promise.
        """
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                        'scripts'))
        from parity_sweep import (make_antimeridian_scene, make_lcc_scene,
                                  make_scene)

        from raider_tpu.delay.engine import _build_cube_ray

        maker = {'geo': lambda r: make_scene(r, 0),
                 'stereo': make_antimeridian_scene,
                 'lcc': make_lcc_scene}[scene_kind]
        wm, xq, yq, hts, los, zref, _ = maker(np.random.default_rng(7))
        monkeypatch.setenv('RAIDER_TPU_DEVICE_GEOMETRY', '0')
        monkeypatch.setenv('RAIDER_TPU_ORIGIN_REL', '0')
        w0, h0 = _build_cube_ray(wm, xq, yq, hts, los, Geographic(),
                                 zref=zref, compute_dtype=np.float32)
        monkeypatch.setenv('RAIDER_TPU_ORIGIN_REL', '1')
        w1, h1 = _build_cube_ray(wm, xq, yq, hts, los, Geographic(),
                                 zref=zref, compute_dtype=np.float32)
        for a, b in ((w0, w1), (h0, h1)):
            a, b = np.asarray(a), np.asarray(b)
            assert (np.isnan(a) == np.isnan(b)).all()
            assert np.nanmax(np.abs(a - b)) < 1e-4  # 0.1 mm
