"""On-device df64 geometry vs the host float64 path (< 0.1 mm)."""

import datetime as dt

import numpy as np
import pytest

from raider_tpu.geodesy.ellipsoid import ecef2lla, lla2ecef
from raider_tpu.geometry import device_geom as dg
from raider_tpu.geometry.orbit import geo2rdr, interpolate_orbit
from raider_tpu.geometry.rays import build_ray, level_heights
from raider_tpu.ops import df64

from tests.test_orbit import synthetic_orbit


@pytest.fixture(scope='module')
def orb():
    return synthetic_orbit(dt.datetime(2020, 1, 30, 13, 52, 45))


@pytest.fixture(scope='module')
def poly(orb):
    return dg.build_orbit_poly(orb)


@pytest.fixture(scope='module')
def targets():
    rng = np.random.default_rng(5)
    lat = rng.uniform(33, 34, 2000)
    lon = rng.uniform(-118.25, -117.25, 2000)
    x, y, z = (np.asarray(v) for v in lla2ecef(lat, lon, np.zeros(lat.size)))
    return np.stack([x, y, z], axis=-1)


class TestOrbitPoly:
    def test_poly_matches_hermite(self, orb, poly, rng):
        """The monomial form reproduces the host Hermite to < 1e-5 m."""
        tq = rng.uniform(orb.times[2], orb.times[-3], 200)
        p_ref, v_ref = interpolate_orbit(orb.times, orb.pos, orb.vel, tq)
        t_df = df64.from_f64(tq)
        pos, vel, acc = dg._eval_pos_vel_acc(
            np.asarray(poly.times, np.float32), poly.t_c, poly.coeffs, t_df
        )
        pos64 = np.stack([df64.to_f64(p) for p in pos], axis=-1)
        vel64 = np.stack([df64.to_f64(v) for v in vel], axis=-1)
        assert np.abs(pos64 - np.asarray(p_ref)).max() < 1e-5
        assert np.abs(vel64 - np.asarray(v_ref)).max() < 1e-6


class TestHeight:
    def test_height_matches_f64(self, rng):
        lat = rng.uniform(-85, 85, 3000)
        lon = rng.uniform(-180, 180, 3000)
        h = rng.uniform(-500, 80000, 3000)
        x, y, z = (np.asarray(v) for v in lla2ecef(lat, lon, h))
        hd = dg.height_df(df64.from_f64(x), df64.from_f64(y), df64.from_f64(z))
        out = df64.to_f64(hd)
        assert np.abs(out - h).max() < 1e-4  # < 0.1 mm


class TestGeo2rdrDevice:
    def test_matches_host(self, orb, poly, targets):
        az_h, sr_h, sat_h, _ = geo2rdr(orb.times, orb.pos, orb.vel, targets)
        az_d, (p_hi, p_lo), sr_d = dg.geo2rdr_device(poly, targets)

        az_dev = df64.to_f64(az_d)
        sr_dev = df64.to_f64(sr_d)
        np.testing.assert_allclose(az_dev, np.asarray(az_h), atol=2e-8)  # ~0.15 mm along-track
        np.testing.assert_allclose(sr_dev, np.asarray(sr_h), atol=1e-4)  # 0.1 mm range
        sat_dev = np.asarray(p_hi, np.float64) + np.asarray(p_lo, np.float64)
        assert np.abs(sat_dev - np.asarray(sat_h)).max() < 2e-4


class TestGeo2rdrDeviceOutOfWindow:
    def test_out_of_window_is_nan(self, orb, poly):
        """Roots outside the statevector span are NaN, matching the host
        geo2rdr / the reference's ISCE3 (losreader.py:252-254); in-window
        roots stay finite."""
        p_out, _ = orb._posvel(700.0)   # outside the +-600 s span
        p_in, _ = orb._posvel(500.0)    # inside
        targ = 6.371e6 * np.stack([p_out / np.linalg.norm(p_out),
                                   p_in / np.linalg.norm(p_in)])
        az_d, (p_hi, _), sr_d = dg.geo2rdr_device(poly, targ)
        az = df64.to_f64(az_d)
        sr = df64.to_f64(sr_d)
        assert np.isnan(az[0]) and np.isnan(sr[0])
        assert np.isnan(np.asarray(p_hi, np.float64)[0]).all()
        assert np.isfinite(az[1]) and np.isfinite(sr[1])
        assert abs(az[1] - 500.0) < 1e-3


class TestGeo2rdrDeviceBatchDims:
    def test_multidim_target_batch(self, poly, targets):
        """geo2rdr_device accepts (..., 3) batches (docstring contract);
        regression for the column-major fetch flattening batch dims."""
        batch = targets[:12].reshape(3, 4, 3)
        az_d, (p_hi, p_lo), sr_d = dg.geo2rdr_device(poly, batch)
        flat_az, _, flat_sr = dg.geo2rdr_device(poly, targets[:12])
        np.testing.assert_allclose(
            df64.to_f64(az_d).reshape(-1), df64.to_f64(flat_az), rtol=0, atol=0)
        np.testing.assert_allclose(
            df64.to_f64(sr_d).reshape(-1), df64.to_f64(flat_sr), rtol=0, atol=0)


class TestBuildRayDevice:
    @pytest.mark.xfail(
        strict=False,
        reason='XLA:CPU LLVM codegen can rewrite df64 error-free transforms '
               'inside fused loops (fusion-shape dependent); the df64 device '
               'path targets TPU backends. See device_geom module docstring.',
    )
    def test_matches_host(self, orb, targets):
        # host look vectors (shared by both paths for a clean comparison)
        _, sr, sat_pos, _ = geo2rdr(orb.times, orb.pos, orb.vel, targets)
        look = (np.asarray(sat_pos) - targets) / np.asarray(sr)[:, None]

        zs = np.concatenate([
            np.arange(-500.0, 3000, 500.0),
            np.arange(3000.0, 26001, 2000.0),
        ])
        ray_h, low_h, high_h = build_ray(zs, 0.0, targets, look, zs[-1] - 1)

        chain = level_heights(zs, 0.0, zs[-1] - 1)
        lengths_d, pts = dg.build_ray_device(chain, targets, look)
        lengths_d = np.asarray(lengths_d)

        # Individual endpoints carry the reference scheme's NON-converged
        # Newton residual (0.1-20 m, present identically in the host/f64
        # path); host-vs-device differences are along-ray and cancel in the
        # integral. The meaningful parities:
        #  * every endpoint within the iteration-scheme envelope
        pts64 = np.asarray(pts[..., 0], np.float64) + np.asarray(pts[..., 1], np.float64)
        assert np.abs(pts64[:-1] - low_h).max() < 1.0
        assert np.abs(pts64[1:] - high_h).max() < 1.0
        #  * total ray length agrees to sub-mm (delay-equivalent metric)
        total_d = lengths_d.sum(axis=0)
        total_h = ray_h.sum(axis=0)
        np.testing.assert_allclose(total_d, total_h, atol=2e-3)
        #  * per-level lengths agree to the ~mm level
        assert np.abs(lengths_d - ray_h).max() < 2.0


class TestFusedEnginePath:
    """The fully-fused device-geometry engine path, forced on via the env
    flag. On XLA:CPU df64 precision degrades (module docstring), but the
    constant-refractivity closure ratio hydro/wet == 2 is precision-free and
    the padded multi-slice plumbing (zero-length pad levels, plan bucketing)
    is exercised exactly as on TPU. Exact <0.1mm parity vs the host path is
    asserted on real TPU hardware in the verify drive."""

    def test_multislice_closure(self, monkeypatch):
        import sys
        sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
        from test_raytrace import synthetic_orbit, synthetic_wm_dataset

        from raider_tpu.delay.engine import WeatherCube, _build_cube_ray
        from raider_tpu.geodesy.crs import Geographic
        from raider_tpu.geometry.los import Raytracing

        monkeypatch.setenv('RAIDER_TPU_DEVICE_GEOMETRY', '1')
        t = dt.datetime(2020, 1, 30, 13, 52, 45)
        wm = WeatherCube(synthetic_wm_dataset(1.0, 2.0))
        los = Raytracing(orbit=synthetic_orbit(t), time=t)
        xpts = np.linspace(-118.4, -117.2, 6)
        ypts = np.linspace(33.2, 33.8, 5)
        wet, hydro = _build_cube_ray(
            wm, xpts, ypts, np.array([0.0, 2000.0, 8000.0]), los,
            Geographic(), zref=25000.0, compute_dtype=np.float32)
        wet = np.asarray(wet)
        hydro = np.asarray(hydro)
        assert np.isfinite(wet).all()
        np.testing.assert_allclose(hydro / wet, 2.0, rtol=1e-5)
        # delays shrink with starting height (shorter columns)
        means = wet.mean(axis=(1, 2))
        assert means[0] > means[1] > means[2] > 0


class TestFusedEnginePathProjectedCRS:
    """Device geometry with a PROJECTED weather CRS: the model-coordinate
    transform (crs.forward) runs inside the fused jit. Uses the HRRR-AK
    polar stereographic projection over Alaska."""

    def test_polar_stereo_closure(self, monkeypatch):
        import sys
        sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
        from test_orbit import synthetic_orbit

        from raider_tpu.delay.engine import WeatherCube, _build_cube_ray
        from raider_tpu.geodesy import Geographic, transform_points
        from raider_tpu.geodesy.crs import Geographic as Geo
        from raider_tpu.geometry.los import Raytracing
        from raider_tpu.io.ncdf import Dataset, Variable
        from raider_tpu.wx.hrrr import HRRR_AK_PROJ

        monkeypatch.setenv('RAIDER_TPU_DEVICE_GEOMETRY', '1')
        # native AK grid patch around (65N, -148E)
        x0, y0 = (float(np.asarray(v)) for v in transform_points(
            Geo(), HRRR_AK_PROJ, np.array(-148.0), np.array(65.0))[:2])
        xs = x0 + 3000.0 * np.arange(-60, 61)
        ys = y0 + 3000.0 * np.arange(-60, 61)
        zs = np.concatenate([np.arange(-500.0, 5000.0, 500.0),
                             np.arange(5000.0, 30001.0, 2500.0)])
        shape = (zs.size, ys.size, xs.size)
        coords = {'x': Variable(('x',), xs, {}), 'y': Variable(('y',), ys, {}),
                  'z': Variable(('z',), zs, {})}
        variables = {
            'wet': Variable(('z', 'y', 'x'), np.full(shape, 1.0), {}),
            'hydro': Variable(('z', 'y', 'x'), np.full(shape, 2.0), {}),
            'wet_total': Variable(('z', 'y', 'x'), np.zeros(shape), {}),
            'hydro_total': Variable(('z', 'y', 'x'), np.zeros(shape), {}),
            'proj': Variable((), np.int64(0), HRRR_AK_PROJ.to_cf()),
        }
        wm = WeatherCube(Dataset(coords=coords, variables=variables, attrs={}))
        assert wm.crs == HRRR_AK_PROJ or wm.crs.to_cf() == HRRR_AK_PROJ.to_cf()

        t = dt.datetime(2020, 1, 30, 13, 52, 45)
        los = Raytracing(orbit=synthetic_orbit(t, incline_deg=98.0,
                                               lon_asc_deg=-102.0, phase0=1.18),
                         time=t)
        xpts = np.linspace(-148.6, -147.4, 6)
        ypts = np.linspace(64.8, 65.2, 5)
        wet, hydro = _build_cube_ray(wm, xpts, ypts, np.array([0.0, 3000.0]),
                                     los, Geographic(), zref=25000.0,
                                     compute_dtype=np.float32)
        wet = np.asarray(wet)
        hydro = np.asarray(hydro)
        assert np.isfinite(wet).all(), f'{np.isnan(wet).sum()} NaNs'
        np.testing.assert_allclose(hydro / wet, 2.0, rtol=1e-5)

        # host-geometry path agrees (CPU df64 is degraded but the constant-N
        # closure is precision-free; the coordinates just need to hit the
        # same cube cells)
        monkeypatch.setenv('RAIDER_TPU_DEVICE_GEOMETRY', '0')
        w_h, _ = _build_cube_ray(wm, xpts, ypts, np.array([0.0, 3000.0]),
                                 los, Geographic(), zref=25000.0,
                                 compute_dtype=np.float32)
        np.testing.assert_allclose(wet, np.asarray(w_h), rtol=2e-3)


class TestQuadraticAlgo:
    """The quadratic-seeded level solver (RAIDER_TPU_GEOM_ALGO=quad) agrees
    with the warm-start scan; kept as an alternative (the scan measured
    faster on the attached v5e - df64 throughput bound)."""

    def test_quad_matches_scan_closure(self, monkeypatch):
        import sys
        sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
        from test_raytrace import synthetic_orbit, synthetic_wm_dataset

        from raider_tpu.delay.engine import WeatherCube, _build_cube_ray
        from raider_tpu.geodesy.crs import Geographic
        from raider_tpu.geometry.los import Raytracing

        monkeypatch.setenv('RAIDER_TPU_DEVICE_GEOMETRY', '1')
        t = dt.datetime(2020, 1, 30, 13, 52, 45)
        wm = WeatherCube(synthetic_wm_dataset(1.0, 2.0))
        los = Raytracing(orbit=synthetic_orbit(t), time=t)
        xpts = np.linspace(-118.4, -117.2, 6)
        ypts = np.linspace(33.2, 33.8, 5)
        outs = {}
        for algo in ('scan', 'quad', 'ref'):
            monkeypatch.setenv('RAIDER_TPU_GEOM_ALGO', algo)
            wet, hydro = _build_cube_ray(
                wm, xpts, ypts, np.array([0.0, 2000.0]), los,
                Geographic(), zref=25000.0, compute_dtype=np.float32)
            outs[algo] = np.asarray(wet)
            np.testing.assert_allclose(np.asarray(hydro) / np.asarray(wet),
                                       2.0, rtol=1e-5)
        # CPU df64 precision is degraded but both algorithms degrade the
        # same way; on TPU the agreement is ~3e-6 m (verify drive)
        np.testing.assert_allclose(outs['quad'], outs['scan'], rtol=5e-4)
        # 'ref' (the default) replicates the reference's 3-iteration
        # intersections, which sit up to ~0.5 m off the exact levels at
        # high incidence - agreement with the exact chains is bounded by
        # the reference's own approximation error, not our precision
        np.testing.assert_allclose(outs['ref'], outs['scan'], rtol=3e-3)


class TestDf64RuntimeGuard:
    """A backend whose compiler destroys df64 (probe fails) must fall back
    to host-f64 geometry with a warning (VERDICT r1 item 5)."""

    def _run(self, monkeypatch):
        import sys
        sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
        from test_raytrace import synthetic_orbit, synthetic_wm_dataset

        from raider_tpu.delay.engine import WeatherCube, _build_cube_ray
        from raider_tpu.geodesy.crs import Geographic
        from raider_tpu.geometry.los import Raytracing

        t = dt.datetime(2020, 1, 30, 13, 52, 45)
        wm = WeatherCube(synthetic_wm_dataset(1.0, 2.0))
        los = Raytracing(orbit=synthetic_orbit(t), time=t)
        return _build_cube_ray(
            wm, np.linspace(-118.4, -117.2, 6), np.linspace(33.2, 33.8, 5),
            np.array([0.0]), los, Geographic(), zref=25000.0,
            compute_dtype=np.float32)

    def test_probe_passes_on_this_backend(self):
        assert dg.df64_backend_ok() is True

    def test_bad_backend_falls_back_to_host(self, monkeypatch, caplog):
        monkeypatch.setenv('RAIDER_TPU_DEVICE_GEOMETRY', '1')
        # 'fresh': a persisted cross-process verdict must not mask the
        # patched probe (df64_backend_ok verdict persistence)
        monkeypatch.setenv('RAIDER_TPU_DF64_PROBE', 'fresh')
        monkeypatch.setattr(dg, '_run_df64_probe', lambda: False)
        monkeypatch.setattr(dg, '_PROBE_OK', {})
        # the device-geometry entry point must NOT be reached
        def boom(*a, **k):
            raise AssertionError('device geometry used despite failed probe')
        monkeypatch.setattr(dg, 'raytrace_slice_device_fused', boom)

        import logging
        with caplog.at_level(logging.WARNING, logger='RAiDER'):
            wet, hydro = self._run(monkeypatch)
        wet = np.asarray(wet)
        assert np.isfinite(wet).all()
        np.testing.assert_allclose(np.asarray(hydro) / wet, 2.0, rtol=1e-5)
        assert any('df64 cancellation probe FAILED' in r.message
                   for r in caplog.records)

    def test_probe_skip_env_trusts_backend(self, monkeypatch):
        monkeypatch.setattr(dg, '_run_df64_probe', lambda: False)
        monkeypatch.setattr(dg, '_PROBE_OK', {})
        monkeypatch.setenv('RAIDER_TPU_DF64_PROBE', 'skip')
        assert dg.df64_backend_ok() is True

    def test_probe_verdict_persists_across_processes(self, monkeypatch,
                                                     tmp_path):
        """The probe verdict is a property of the compiler, so a second
        process (fresh _PROBE_OK) must serve it from the persisted file
        without a device round trip (measured 115 s+ per probe in slow
        remote-tunnel regimes)."""
        vpath = tmp_path / 'probe.verdict'
        monkeypatch.setattr(dg, '_probe_verdict_path', lambda backend: vpath)
        monkeypatch.delenv('RAIDER_TPU_DF64_PROBE', raising=False)

        calls = []
        monkeypatch.setattr(dg, '_run_df64_probe',
                            lambda: calls.append(1) or True)
        monkeypatch.setattr(dg, '_PROBE_OK', {})
        assert dg.df64_backend_ok() is True
        assert len(calls) == 1 and vpath.read_text() == '1'

        # "new process": empty in-memory dict, probe must NOT run again
        monkeypatch.setattr(dg, '_PROBE_OK', {})
        monkeypatch.setattr(dg, '_run_df64_probe', lambda: pytest.fail(
            'probe re-ran despite persisted verdict'))
        assert dg.df64_backend_ok() is True

        # a persisted FAILURE is NOT trusted: one transient hiccup must not
        # pin every future process to the slow host-f64 path, so a '0' (or
        # garbage) file re-runs the probe — and a pass overwrites it
        vpath.write_text('0')
        reruns = []
        monkeypatch.setattr(dg, '_run_df64_probe',
                            lambda: reruns.append(1) or True)
        monkeypatch.setattr(dg, '_PROBE_OK', {})
        assert dg.df64_backend_ok() is True
        assert len(reruns) == 1 and vpath.read_text() == '1'

        # ...and a re-run that fails again does not persist the failure
        vpath.unlink()
        monkeypatch.setattr(dg, '_run_df64_probe', lambda: False)
        monkeypatch.setattr(dg, '_PROBE_OK', {})
        assert dg.df64_backend_ok() is False
        assert not vpath.exists()

        # 'fresh' ignores the file and re-runs the probe
        monkeypatch.setenv('RAIDER_TPU_DF64_PROBE', 'fresh')
        monkeypatch.setattr(dg, '_run_df64_probe', lambda: True)
        monkeypatch.setattr(dg, '_PROBE_OK', {})
        assert dg.df64_backend_ok() is True


class TestDeferredPlanValidation:
    """The slice loop never blocks on per-slice plan fetches: the maxima are
    batch-validated after the loop, and a structural violation of the
    cube-global plan widens it and recomputes the offending slices exactly
    (r2 async slice-loop design; engine._build_cube_ray deferred block)."""

    def test_violation_triggers_recompute_same_results(self, monkeypatch):
        import sys
        sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
        from test_raytrace import synthetic_orbit, synthetic_wm_dataset

        from raider_tpu.delay.engine import WeatherCube, _build_cube_ray
        from raider_tpu.geodesy.crs import Geographic
        from raider_tpu.geometry.los import Raytracing

        monkeypatch.setenv('RAIDER_TPU_DEVICE_GEOMETRY', '1')
        t = dt.datetime(2020, 1, 30, 13, 52, 45)
        wm = WeatherCube(synthetic_wm_dataset(1.0, 2.0))
        los = Raytracing(orbit=synthetic_orbit(t), time=t)
        xpts = np.linspace(-118.4, -117.2, 6)
        ypts = np.linspace(33.2, 33.8, 5)
        hts = np.array([0.0, 1000.0, 2000.0])

        def run():
            w, _ = _build_cube_ray(wm, xpts, ypts, hts, los, Geographic(),
                                   zref=25000.0, compute_dtype=np.float32)
            return np.asarray(w)

        w_base = run()

        calls = {'warm': 0, 'cold': 0}
        orig = dg.GeomSession.slice

        def patched(self, ht, chain, cold=False):
            out = orig(self, ht, chain, cold=cold)
            if cold:
                calls['cold'] += 1        # post-loop exact recompute
            else:
                calls['warm'] += 1
                if calls['warm'] == 2:
                    # inflate the 2nd slice's horizontal-motion bound past
                    # the seed plan's widen margin: a structural violation
                    # that must widen the plan and recompute this slice.
                    # The geometry arrays themselves are untouched, so the
                    # recomputed delays must match the unpatched run.
                    out['hstep_max'] = out['hstep_max'] * 3.0
            return out

        monkeypatch.setattr(dg.GeomSession, 'slice', patched)
        w_forced = run()
        assert calls['cold'] >= 1, 'deferred validation did not recompute'
        # identical samples, only the brick grouping differs: results agree
        # up to f32 accumulation order
        np.testing.assert_allclose(w_forced, w_base, rtol=2e-5, atol=1e-8)

    def test_marginal_violation_still_recomputes(self, monkeypatch):
        """A horizontal-motion excursion only marginally past the plan bound
        the slice integrated with (seed*(1+1e-4)+1e-5, exceeded by ~1e-5)
        must still trigger the recompute: any real excess past the grouping
        guarantee risks brick NaN poisoning. Regression for a flag threshold
        that was 5x looser than the bound the slices actually ran with."""
        import sys
        sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
        from test_raytrace import synthetic_orbit, synthetic_wm_dataset

        from raider_tpu.delay.engine import WeatherCube, _build_cube_ray
        from raider_tpu.geodesy.crs import Geographic
        from raider_tpu.geometry.los import Raytracing

        monkeypatch.setenv('RAIDER_TPU_DEVICE_GEOMETRY', '1')
        t = dt.datetime(2020, 1, 30, 13, 52, 45)
        wm = WeatherCube(synthetic_wm_dataset(1.0, 2.0))
        los = Raytracing(orbit=synthetic_orbit(t), time=t)
        xpts = np.linspace(-118.4, -117.2, 6)
        ypts = np.linspace(33.2, 33.8, 5)
        hts = np.array([0.0, 1000.0])

        calls = {'warm': 0, 'cold': 0}
        orig = dg.GeomSession.slice

        def patched(self, ht, chain, cold=False):
            out = orig(self, ht, chain, cold=cold)
            if cold:
                calls['cold'] += 1
            else:
                calls['warm'] += 1
                if calls['warm'] == 2:
                    # just past the seed plan bound (its inflation is
                    # (1+1e-4)+1e-5 over the seed's measured maxima)
                    out['hstep_max'] = out['hstep_max'] * (1.0 + 1e-4) + 2e-5
            return out

        monkeypatch.setattr(dg.GeomSession, 'slice', patched)
        w, _ = _build_cube_ray(wm, xpts, ypts, hts, los, Geographic(),
                               zref=25000.0, compute_dtype=np.float32)
        assert calls['cold'] >= 1, 'marginal violation escaped the recompute'
        assert np.isfinite(np.asarray(w)).all()

    def test_later_violator_not_masked_by_earlier_widening(self, monkeypatch):
        """Every deferred slice ran under the SEED plan, so each must be
        validated against the seed bounds: a later slice whose maxima exceed
        the seed but fit an EARLIER violator's widened bound must still be
        recomputed (it integrated with the seed plan)."""
        import sys
        sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
        from test_raytrace import synthetic_orbit, synthetic_wm_dataset

        from raider_tpu.delay.engine import WeatherCube, _build_cube_ray
        from raider_tpu.geodesy.crs import Geographic
        from raider_tpu.geometry.los import Raytracing

        monkeypatch.setenv('RAIDER_TPU_DEVICE_GEOMETRY', '1')
        t = dt.datetime(2020, 1, 30, 13, 52, 45)
        wm = WeatherCube(synthetic_wm_dataset(1.0, 2.0))
        los = Raytracing(orbit=synthetic_orbit(t), time=t)
        xpts = np.linspace(-118.4, -117.2, 6)
        ypts = np.linspace(33.2, 33.8, 5)
        hts = np.array([0.0, 1000.0, 2000.0])

        calls = {'warm': 0}
        cold_heights = []
        orig = dg.GeomSession.slice

        def patched(self, ht, chain, cold=False):
            out = orig(self, ht, chain, cold=cold)
            if cold:
                cold_heights.append(ht)
            else:
                calls['warm'] += 1
                if calls['warm'] == 2:      # big violation, widens the plan
                    out['hstep_max'] = out['hstep_max'] * 3.0
                elif calls['warm'] == 3:    # smaller violation: exceeds the
                    # SEED bound but fits inside the x3-widened one - must
                    # still be recomputed
                    out['hstep_max'] = out['hstep_max'] * 1.5
            return out

        monkeypatch.setattr(dg.GeomSession, 'slice', patched)
        w, _ = _build_cube_ray(wm, xpts, ypts, hts, los, Geographic(),
                               zref=25000.0, compute_dtype=np.float32)
        assert sorted(cold_heights) == [1000.0, 2000.0], (
            f'both violators must recompute, got {cold_heights}')
        assert np.isfinite(np.asarray(w)).all()


class TestGroundGeometryCache:
    """Ground ECEF/normal device pairs are cached by grid content: repeated
    tropo_delay calls on one pixel grid (GUNW two-epoch runs, time series)
    skip the ~48 MB re-upload; distinct grids get distinct entries."""

    def test_same_grid_reuses_device_arrays(self):
        lat = np.linspace(33.0, 34.0, 40).reshape(8, 5)
        lon = np.linspace(-118.0, -117.0, 40).reshape(8, 5)
        a = dg._ground_geometry(lat.ravel(), lon.ravel())
        b = dg._ground_geometry(lat.ravel().copy(), lon.ravel().copy())
        assert all(x is y for x, y in zip(a, b))
        c = dg._ground_geometry(lat.ravel() + 0.5, lon.ravel())
        assert a[0] is not c[0]
        assert len(dg._GROUND_CACHE) <= 2


class TestCoarseGridQuadratureParity:
    """Coarse model z grids (cell spans > MAX_SEGMENT_LENGTH) make the
    reference's per-slice nParts rule (delay.py:283) diverge from a naive
    cube-global plan at each slice's partially-clamped bottom cell - a real
    ~1 mm quadrature effect (r2 parity sweep, scene2). The engine must
    integrate such slices with their own per-slice plans: the default path
    and the explicit per-slice mode (RAIDER_TPU_CUBE_PLAN=0) must agree to
    f32 accumulation tolerance."""

    def test_default_matches_per_slice_mode(self, monkeypatch):
        import sys
        sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
        from test_raytrace import synthetic_orbit

        from raider_tpu.delay.engine import WeatherCube, _build_cube_ray
        from raider_tpu.geodesy.crs import Geographic
        from raider_tpu.geometry.los import Raytracing
        from raider_tpu.io.ncdf import Dataset, Variable

        rng = np.random.default_rng(3)
        nz, ny, nx = 14, 30, 30   # ~1.9 km cells: nParts ~2-3 per level
        zs = np.linspace(-500.0, 25000.0, nz)
        ys = np.linspace(32.5, 34.5, ny)
        xs = np.linspace(-119.0, -116.5, nx)
        coords = {'x': Variable(('x',), xs, {}), 'y': Variable(('y',), ys, {}),
                  'z': Variable(('z',), zs, {})}
        variables = {
            'wet': Variable(('z', 'y', 'x'), rng.uniform(0.1, 100.0, (nz, ny, nx)), {}),
            'hydro': Variable(('z', 'y', 'x'), rng.uniform(50.0, 300.0, (nz, ny, nx)), {}),
            'proj': Variable((), np.int64(0), Geographic().to_cf()),
        }
        wm = WeatherCube(Dataset(coords=coords, variables=variables, attrs={}))
        t = dt.datetime(2020, 1, 30, 13, 52, 45)
        los = Raytracing(orbit=synthetic_orbit(t), time=t)
        xpts = np.linspace(-118.4, -117.2, 6)
        ypts = np.linspace(33.2, 33.8, 5)
        # slice heights INSIDE coarse cells so bottom clamping changes the
        # reference rule's nParts vs the full cell
        hts = np.array([0.0, 1400.0, 3100.0])

        monkeypatch.setenv('RAIDER_TPU_DEVICE_GEOMETRY', '1')

        def run():
            w, h = _build_cube_ray(wm, xpts, ypts, hts, los, Geographic(),
                                   zref=24000.0, compute_dtype=np.float32)
            return np.asarray(w), np.asarray(h)

        w_def, h_def = run()
        monkeypatch.setenv('RAIDER_TPU_CUBE_PLAN', '0')
        w_ps, h_ps = run()
        np.testing.assert_allclose(w_def, w_ps, rtol=2e-5, atol=1e-8)
        np.testing.assert_allclose(h_def, h_ps, rtol=2e-5, atol=1e-8)
