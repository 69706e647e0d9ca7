"""LOS projection paths: Conventional via orbit statevectors and via 2-band
rasters, plus the radar-raster AOI end-to-end flow."""

import datetime as dt

import numpy as np
import pytest

from raider_tpu.geodesy.ellipsoid import geodetic_normal, lla2ecef
from raider_tpu.geometry.los import Conventional, Raytracing, inc_hd_to_enu
from raider_tpu.geometry.orbit import geo2rdr, state_to_los_factor

from tests.test_orbit import synthetic_orbit


@pytest.fixture(scope='module')
def orb():
    return synthetic_orbit(dt.datetime(2020, 1, 30, 13, 52, 45))


class TestConventionalOrbit:
    def test_projection_factor_matches_geometry(self, orb):
        lats = np.array([33.2, 33.8])
        lons = np.array([-118.0, -117.5])
        hgts = np.zeros(2)
        factor = state_to_los_factor(orb, lats, lons, hgts)

        # independent: cos(incidence) = dot(unit sat->target... target->sat, up)
        x, y, z = (np.asarray(v) for v in lla2ecef(lats, lons, hgts))
        targ = np.stack([x, y, z], axis=-1)
        _, sr, sat_pos, _ = geo2rdr(orb.times, orb.pos, orb.vel, targ)
        los = (np.asarray(sat_pos) - targ) / np.asarray(sr)[:, None]
        up = np.asarray(geodetic_normal(lats, lons))
        expected = np.sum(los * up, axis=-1)
        np.testing.assert_allclose(factor, expected, rtol=1e-12)
        assert np.all((factor > 0.2) & (factor < 1.0))

    def test_conventional_divides_by_cos(self, orb, tmp_path):
        # write statevectors to a 7-column file and go through the class
        t0 = dt.datetime(2020, 1, 30, 13, 52, 45)
        lines = []
        for k in range(orb.times.size):
            t = t0 + dt.timedelta(seconds=float(orb.times[k]))
            p, v = orb.pos[k], orb.vel[k]
            lines.append(
                f'{t.isoformat()} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} '
                f'{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}'
            )
        sv_file = tmp_path / 'orbit_sv.txt'
        sv_file.write_text('\n'.join(lines))

        los = Conventional(str(sv_file), time=t0)
        lats = np.array([33.2, 33.8])
        lons = np.array([-118.0, -117.5])
        hgts = np.zeros(2)
        los.setPoints(lats, lons, hgts)
        delays = np.array([2.3, 2.4])
        projected = los(delays)
        factor = state_to_los_factor(
            synthetic_orbit(t0), lats, lons, hgts
        )
        np.testing.assert_allclose(projected, delays / factor, rtol=1e-9)
        assert np.all(projected > delays)  # slant always longer than zenith


class TestConventionalRaster:
    def test_inc_hd_raster(self, tmp_path):
        """2-band incidence/heading ENVI raster drives the projection."""
        from raider_tpu.io.rasters import write_envi

        inc = np.full((4, 5), 30.0, np.float32)
        hd = np.full((4, 5), 190.0, np.float32)
        los_file = tmp_path / 'los.dat'
        write_envi(np.stack([inc, hd]), str(los_file), nodata=-9999.0)

        los = Conventional(str(los_file))
        los.setPoints(np.zeros((4, 5)), np.zeros((4, 5)), np.zeros((4, 5)))
        delays = np.full((4, 5), 2.0)
        out = los(delays)
        np.testing.assert_allclose(out, 2.0 / np.cos(np.deg2rad(30.0)), rtol=1e-6)

    def test_inc_hd_to_enu_negative_incidence(self):
        with pytest.raises(ValueError):
            inc_hd_to_enu(np.array([-1.0]), np.array([0.0]))


class TestRasterRdrEndToEnd:
    def test_point_delays_on_radar_grid(self, tmp_path, era5_la_file):
        """Radar-coordinate lat/lon/hgt rasters -> point delays -> ENVI rasters."""
        from raider_tpu.delay import tropo_delay
        from raider_tpu.geometry.aoi import RasterRDR
        from raider_tpu.geometry.los import Zenith
        from raider_tpu.io.rasters import rio_open, write_envi
        from raider_tpu.workflows.calc_delays import writeDelays

        ny, nx = 6, 8
        lat = np.linspace(33.2, 33.9, ny)[:, None] * np.ones((1, nx))
        lon = np.ones((ny, 1)) * np.linspace(-118.2, -117.2, nx)[None, :]
        hgt = np.full((ny, nx), 150.0)
        for name, arr in (('lat.dat', lat), ('lon.dat', lon), ('hgt.dat', hgt)):
            write_envi(arr.astype(np.float32), str(tmp_path / name), nodata=-9999.0)

        aoi = RasterRDR(str(tmp_path / 'lat.dat'), str(tmp_path / 'lon.dat'),
                        str(tmp_path / 'hgt.dat'), cube_spacing_in_m=2000.0)
        aoi.add_buffer(0.25)
        aoi.set_output_xygrid(4326)

        wet, hydro = tropo_delay(
            dt.datetime(2020, 1, 30, 13, 52, 45), str(era5_la_file), aoi, Zenith(),
        )
        assert wet.shape == (ny, nx)
        total = np.asarray(wet) + np.asarray(hydro)
        assert 2.0 < np.nanmean(total) < 2.6

        writeDelays(aoi, wet, hydro, tmp_path / 'wet_out.dat', tmp_path / 'hydro_out.dat',
                    outformat='ENVI')
        back, _ = rio_open(str(tmp_path / 'wet_out.dat'))
        np.testing.assert_allclose(back, np.nan_to_num(np.asarray(wet)), atol=1e-6)


class TestLookVectorGoldens:
    """inc/heading -> ENU and zenith vector goldens
    (reference: test_losreader.py:147-265)."""

    def test_inc_hd_to_enu_goldens(self):
        s35, c35 = np.sin(np.radians(35)), np.cos(np.radians(35))
        for hd in (0, -180, 18, -18):
            np.testing.assert_allclose(inc_hd_to_enu(0, hd), [0, 0, 1], atol=1e-12)
        np.testing.assert_allclose(inc_hd_to_enu(35, 0), [0, s35, c35], atol=1e-12)
        np.testing.assert_allclose(inc_hd_to_enu(35, 180), [0, -s35, c35], atol=1e-12)
        np.testing.assert_allclose(inc_hd_to_enu(35, 90), [-s35, 0, c35], atol=1e-12)

    def test_zenith_look_vecs(self):
        from raider_tpu.geometry.los import getZenithLookVecs

        np.testing.assert_allclose(
            getZenithLookVecs(np.array([0]), np.array([0]), np.array([0])),
            [[1, 0, 0]], atol=1e-12)
        np.testing.assert_allclose(
            getZenithLookVecs(np.array([90]), np.array([0]), np.array([0])),
            [[0, 0, 1]], atol=1e-12)
        np.testing.assert_allclose(
            getZenithLookVecs(np.array([0]), np.array([90]), np.array([0])),
            [[0, 1, 0]], atol=1e-12)
        # unit vectors at arbitrary locations
        v = np.asarray(getZenithLookVecs(np.array([34.5]), np.array([-117.2]),
                                         np.array([1000.0])))
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-12)


class TestCutTimes:
    """Orbit statevector time-window padding (reference: losreader.py:610)."""

    def test_window_selection(self):
        from raider_tpu.geometry.orbit import cut_times

        times = np.arange(0.0, 101.0, 10.0)  # 11 SVs, 10 s apart
        assert cut_times(times, times[0], pad=3600 * 3).all()
        assert cut_times(times, times[0], pad=5).sum() == 1
        assert cut_times(times, times[4], pad=15).sum() == 3
        assert cut_times(times, times[0], pad=400).sum() == times.size
