"""Azimuth-time grid (batched geo2rdr), inverse weights, and DEM interp.

Mirrors reference test/test_s1_time_grid.py weighting semantics and the
interpolator DEM path (interpolator.py:133-217).
"""

import datetime as dt
import sys

import numpy as np
import pytest

sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))


class TestAzimuthTimeGrid:
    def test_grid_matches_per_pixel_geo2rdr(self):
        from test_raytrace import synthetic_orbit

        from raider_tpu.workflows.s1_timing import get_azimuth_time_grid

        t = dt.datetime(2020, 1, 30, 13, 52, 45)
        orb = synthetic_orbit(t)
        lons, lats = np.meshgrid(np.linspace(-118.2, -117.3, 4),
                                 np.linspace(33.2, 33.9, 3))
        hgts = np.zeros_like(lats)
        grid = get_azimuth_time_grid(lons, lats, hgts, orb)
        assert grid.shape == lats.shape
        assert grid.dtype == np.dtype('datetime64[ms]')
        # all within a couple of minutes of the overpass
        dt_s = np.abs((grid - np.datetime64(t, 'ms')) / np.timedelta64(1, 's'))
        assert np.nanmax(dt_s) < 120

        # one pixel re-solved alone gives the identical time (batching is
        # a pure vectorization, reference loops per pixel)
        single = get_azimuth_time_grid(lons[1:2, 2:3], lats[1:2, 2:3],
                                       hgts[1:2, 2:3], orb)
        assert single[0, 0] == grid[1, 2]

    def test_varies_along_track(self):
        from test_raytrace import synthetic_orbit

        from raider_tpu.workflows.s1_timing import get_azimuth_time_grid

        t = dt.datetime(2020, 1, 30, 13, 52, 45)
        orb = synthetic_orbit(t)
        lats = np.linspace(32.5, 34.5, 7)[:, None]
        lons = np.full((7, 1), -117.8)
        grid = get_azimuth_time_grid(lons, lats, np.zeros_like(lons), orb)
        secs = (grid - grid.min()) / np.timedelta64(1, 's')
        diffs = np.diff(secs.ravel())
        assert (diffs > 0).all() or (diffs < 0).all(), 'monotone along track'


class TestInverseWeights:
    def test_two_date_weights_sum_and_order(self):
        from raider_tpu.workflows.s1_timing import get_inverse_weights_for_dates

        d0 = dt.datetime(2020, 1, 30, 13, 0, 0)
        d1 = dt.datetime(2020, 1, 30, 14, 0, 0)
        az = np.array([
            np.datetime64('2020-01-30T13:10:00', 'ms'),
            np.datetime64('2020-01-30T13:50:00', 'ms'),
        ])
        w = get_inverse_weights_for_dates(az, [d0, d1])
        assert len(w) == 2
        # pixel 0 is 10 min from d0, 50 min from d1 -> favors d0 5:1
        np.testing.assert_allclose(w[0][0] / w[1][0], 5.0, rtol=1e-6)
        np.testing.assert_allclose(w[0][1] / w[1][1], 0.2, rtol=1e-6)

    def test_rejects_duplicate_or_empty_dates(self):
        from raider_tpu.workflows.s1_timing import get_inverse_weights_for_dates

        az = np.array([np.datetime64('2020-01-30T13:10:00', 'ms')])
        d = dt.datetime(2020, 1, 30, 13)
        with pytest.raises(ValueError):
            get_inverse_weights_for_dates(az, [d, d])
        with pytest.raises(ValueError):
            get_inverse_weights_for_dates(az, [])

    def test_window_semantics(self):
        """All pixels outside the window raise; a mixed grid zero-masks the
        outside pixel (reference: s1_azimuth_timing.py:388-399)."""
        from raider_tpu.workflows.s1_timing import get_inverse_weights_for_dates

        d0 = dt.datetime(2020, 1, 30, 13, 0, 0)
        d1 = dt.datetime(2020, 1, 30, 14, 0, 0)
        far = np.array([np.datetime64('2020-01-30T16:59:00', 'ms')])
        with pytest.raises(ValueError, match='temporal window'):
            get_inverse_weights_for_dates(far, [d0, d1])

        mixed = np.array([np.datetime64('2020-01-30T13:30:00', 'ms'),
                          np.datetime64('2020-01-30T16:59:00', 'ms')])
        with np.errstate(divide='ignore', invalid='ignore'):
            w = get_inverse_weights_for_dates(mixed, [d0, d1])
        np.testing.assert_allclose(w[0][0] + w[1][0], 1.0)
        assert np.isnan(w[0][1]) and np.isnan(w[1][1])


class TestInterpolateDEM:
    def _write_dem(self, path):
        from raider_tpu.geodesy.crs import Geographic
        from raider_tpu.io.rasters import writeArrayToRaster

        lats = np.linspace(34.0, 33.0, 21)   # N->S like a real raster
        lons = np.linspace(-118.0, -117.0, 21)
        dem = lats[:, None] * 100.0 + lons[None, :] * 10.0
        gt = (lons[0] - 0.025, 0.05, 0.0, lats[0] + 0.025, 0.0, -0.05)
        writeArrayToRaster(dem.astype(np.float32), str(path), noDataValue=-9999.0,
                           fmt='GTiff', proj=Geographic(), gt=gt)
        return dem

    def test_nearest_and_linear(self, tmp_path):
        from raider_tpu.workflows.dem import interpolate_dem

        p = tmp_path / 'dem.tif'
        self._write_dem(p)
        q_lats = np.array([33.5, 33.8])
        q_lons = np.array([-117.5, -117.2])
        exact = q_lats * 100.0 + q_lons * 10.0
        out_lin = interpolate_dem(str(p), (q_lats, q_lons), method='linear')
        np.testing.assert_allclose(out_lin, exact, atol=1e-3)
        out_near = interpolate_dem(str(p), (q_lats, q_lons), method='nearest')
        assert np.all(np.abs(out_near - exact) < 100.0 * 0.05)
        # out of bounds -> NaN
        out_oob = interpolate_dem(str(p), (np.array([50.0]), np.array([-117.5])))
        assert np.isnan(out_oob).all()


class TestDownloadDEM:
    """download_dem file-reuse semantics (reference: test_dem.py)."""

    def test_reads_existing_dem(self):
        from pathlib import Path

        from raider_tpu.workflows.dem import download_dem

        p = Path('/root/reference/test/scenario_4/warpedDEM.dem')
        if not p.exists():
            pytest.skip('reference scenario_4 unavailable')
        hts, meta = download_dem(dem_path=p, overwrite=False)
        assert hts.shape[-2:] == (45, 226)
        assert meta is not None
        assert meta.get('crs') is None

    def test_requires_bounds_or_file(self, tmp_path, monkeypatch):
        from raider_tpu.workflows.dem import download_dem

        monkeypatch.chdir(tmp_path)
        with pytest.raises(ValueError):
            download_dem()
        with pytest.raises(ValueError):
            download_dem(dem_path=tmp_path / 'tmp_file.nc')


class TestOrbitFetchWrapper:
    """Mirrors reference test/test_s1_orbits.py: dedupe + sort + mkdir."""

    def test_dedupes_sorts_and_creates_dir(self, tmp_path, monkeypatch):
        import types

        calls = []
        results = iter(['foo.eof', 'bar.eof', 'foo.eof'])

        fake = types.ModuleType('s1_orbits')

        def fetch_for_scene(scene, directory):
            calls.append((scene, directory))
            return next(results)

        fake.fetch_for_scene = fetch_for_scene
        monkeypatch.setitem(sys.modules, 's1_orbits', fake)

        from raider_tpu.workflows.s1_timing import get_orbits_from_slc_ids_hyp3lib

        out = get_orbits_from_slc_ids_hyp3lib(
            ['scene1', 'scene2', 'scene3'], str(tmp_path)
        )
        assert out == ['bar.eof', 'foo.eof']
        assert [c[0] for c in calls] == ['scene1', 'scene2', 'scene3']

        orbit_dir = tmp_path / 'orbits'
        assert not orbit_dir.exists()
        fake.fetch_for_scene = lambda scene, directory: 'a.eof'
        assert get_orbits_from_slc_ids_hyp3lib(['scene4'], str(orbit_dir)) == ['a.eof']
        assert orbit_dir.exists()


class TestProjectedDEM:
    """DEMs stored in a projected CRS are sampled via point transformation
    (the capability of reference interpolator.py reproject_raster :188-217)."""

    def test_utm_dem_sampling(self, tmp_path):
        from raider_tpu.geodesy import Geographic, transform_points
        from raider_tpu.geodesy.crs import utm_crs
        from raider_tpu.io.geotiff import write_gtiff
        from raider_tpu.io.rasters import GDALAffine
        from raider_tpu.workflows.dem import interpolate_dem

        crs = utm_crs(11)  # zone 11N covers LA
        # DEM plane z = 1e-4*(x - x0) + 2e-4*(y0 - y) in UTM meters
        x0, y0 = 370000.0, 3710000.0
        nx, ny, step = 120, 100, 100.0
        xs = x0 + (np.arange(nx) + 0.5) * step
        ys = y0 - (np.arange(ny) + 0.5) * step
        zz = 1e-4 * (xs[None, :] - x0) + 2e-4 * (y0 - ys[:, None])
        p = str(tmp_path / 'utm_dem.tiff')
        write_gtiff(zz.astype(np.float32), p,
                    transform=GDALAffine((x0, step, 0.0, y0, 0.0, -step)),
                    crs=crs, nodata=float('nan'))

        lats = np.linspace(33.45, 33.50, 7)
        lons = np.linspace(-118.38, -118.32, 7)
        got = interpolate_dem(p, (lats, lons), method='linear')

        qx, qy = transform_points(Geographic(), crs, lons, lats)[:2]
        want = 1e-4 * (np.asarray(qx) - x0) + 2e-4 * (y0 - np.asarray(qy))
        np.testing.assert_allclose(got, want, atol=1e-3)
