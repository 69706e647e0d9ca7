"""Raytracing correctness: synthetic closure + full parity vs reference
semantics.

Closure tests follow the reference's strategy (test/test_synthetic.py): with
constant refractivity N, the raytraced delay must equal N * 1e-6 * (total ray
length), to ~1e-6 relative.

The parity test reimplements the reference's _build_cube_ray exactly (scipy
interpolator, per-level/per-fraction loops, ECEF-lerped sample points
reprojected per sample; reference: tools/RAiDER/delay.py:219-326) in float64
and requires the fused engine to agree to < 0.1 mm.
"""

import datetime as dt

import numpy as np
import pytest
from scipy.interpolate import RegularGridInterpolator

from raider_tpu.delay.engine import WeatherCube, _build_cube_ray, tropo_delay
from raider_tpu.geodesy import Geographic
from raider_tpu.geodesy.ellipsoid import ecef2lla, lla2ecef
from raider_tpu.geometry.aoi import BoundingBox
from raider_tpu.geometry.los import Raytracing
from raider_tpu.geometry.rays import build_ray
from raider_tpu.io import Dataset
from raider_tpu.io.ncdf import Variable

from tests.test_orbit import synthetic_orbit


def synthetic_wm_dataset(wet_value=1.0, hydro_value=2.0, wet_cube=None, hydro_cube=None):
    """Processed weather-model dataset over the LA test area."""
    ys = np.arange(32.0, 35.01, 0.25)
    xs = np.arange(-120.0, -115.99, 0.25)
    zs = np.concatenate([
        np.arange(-500.0, 3000.0, 250.0),
        np.arange(3000.0, 10000.0, 500.0),
        np.arange(10000.0, 30001.0, 1000.0),
    ])
    shape = (zs.size, ys.size, xs.size)
    wet = np.full(shape, wet_value) if wet_cube is None else wet_cube
    hydro = np.full(shape, hydro_value) if hydro_cube is None else hydro_cube
    coords = {
        'x': Variable(('x',), xs, {}),
        'y': Variable(('y',), ys, {}),
        'z': Variable(('z',), zs, {}),
    }
    variables = {
        'wet': Variable(('z', 'y', 'x'), wet, {}),
        'hydro': Variable(('z', 'y', 'x'), hydro, {}),
        'wet_total': Variable(('z', 'y', 'x'), np.zeros(shape), {}),
        'hydro_total': Variable(('z', 'y', 'x'), np.zeros(shape), {}),
        'proj': Variable((), np.int64(0), Geographic().to_cf()),
    }
    return Dataset(coords=coords, variables=variables, attrs={})


@pytest.fixture(scope='module')
def la_orbit():
    return synthetic_orbit(dt.datetime(2020, 1, 30, 13, 52, 45))


@pytest.fixture(scope='module')
def la_los(la_orbit):
    return Raytracing(orbit=la_orbit, time=dt.datetime(2020, 1, 30, 13, 52, 45))


def _length_of_ray(xpts, ypts, hgt_lvls, model_zs, los, max_height):
    """Independent total ray length per pixel (reference:
    test/test_synthetic.py:75-97)."""
    xx, yy = np.meshgrid(xpts, ypts)
    out = np.zeros((len(hgt_lvls), len(ypts), len(xpts)))
    for hh, ht in enumerate(hgt_lvls):
        hts = np.full(yy.shape, float(ht))
        x, y, z = (np.asarray(v) for v in lla2ecef(yy, xx, hts))
        xyz = np.stack([x, y, z], axis=-1)
        look = los.getLookVectors(ht, [xx, yy, hts], xyz, yy)
        ray_lengths = build_ray(model_zs, float(ht), xyz, look, max_height)[0]
        out[hh] = ray_lengths.sum(0)
    return out


class TestClosure:
    def test_constant_refractivity(self, la_los, tmp_path):
        """Constant N => delay = N * 1e-6 * ray_length (both channels)."""
        ds = synthetic_wm_dataset(wet_value=1.0, hydro_value=2.0)
        wm = WeatherCube(ds)

        aoi = BoundingBox([33, 34, -118.25, -117.25], cube_spacing_in_m=10000.0)
        aoi.add_buffer(0.25)
        aoi.set_output_xygrid(4326)

        heights = np.arange(-500.0, 9500.0, 2000.0)
        max_h = wm.zs[-1] - 1

        wet, hydro = _build_cube_ray(wm, aoi.xpts, aoi.ypts, heights, la_los,
                                     Geographic(), zref=max_h)
        lengths = _length_of_ray(aoi.xpts, aoi.ypts, heights, wm.zs, la_los, max_h)

        assert np.all(np.abs(lengths) > 1)
        resid_wet = (lengths * 1.0 - np.asarray(wet) * 1e6) / lengths
        resid_hydro = (lengths * 2.0 - np.asarray(hydro) * 1e6) / (2 * lengths)
        np.testing.assert_almost_equal(0, resid_wet, decimal=6)
        np.testing.assert_almost_equal(0, resid_hydro, decimal=6)


def _reference_build_cube_ray(wm: WeatherCube, xpts, ypts, zpts, los, zref,
                              max_segment_length=1000.0):
    """Float64 reimplementation of the reference triple loop
    (delay.py:219-326) with scipy interpolators and per-sample ECEF->model
    reprojection."""
    if_wet = RegularGridInterpolator((wm.ys, wm.xs, wm.zs),
                                     wm.field('wet').transpose(1, 2, 0),
                                     bounds_error=False, fill_value=np.nan)
    if_hydro = RegularGridInterpolator((wm.ys, wm.xs, wm.zs),
                                       wm.field('hydro').transpose(1, 2, 0),
                                       bounds_error=False, fill_value=np.nan)
    xx, yy = np.meshgrid(xpts, ypts)
    outs = [np.zeros((len(zpts), len(ypts), len(xpts))) for _ in range(2)]
    for hh, ht in enumerate(zpts):
        hts = np.full(yy.shape, float(ht))
        x, y, z = (np.asarray(v) for v in lla2ecef(yy, xx, hts))
        xyz = np.stack([x, y, z], axis=-1)
        look = los.getLookVectors(ht, [xx, yy, hts], xyz, yy)
        ray_lengths, low_xyzs, high_xyzs = build_ray(wm.zs, float(ht), xyz, look, zref)
        if ray_lengths is None:
            continue
        n_parts = np.ceil(ray_lengths.max((1, 2)) / max_segment_length).astype(int) + 1
        for zz, nparts in enumerate(n_parts):
            fracs = np.linspace(0.0, 1.0, num=nparts)
            for findex, ff in enumerate(fracs):
                pts_xyz = low_xyzs[zz] + ff * (high_xyzs[zz] - low_xyzs[zz])
                lat, lon, hgt = (np.asarray(v) for v in ecef2lla(
                    pts_xyz[..., 0], pts_xyz[..., 1], pts_xyz[..., 2]))
                pts = np.stack((lat, lon, hgt), axis=-1)
                if (pts[:, :, -1] < wm.zs.min()).all():
                    pts[:, :, -1] = wm.zs.min()
                if (pts[:, :, -1] > wm.zs.max()).all():
                    pts[:, :, -1] = wm.zs.max()
                wt = 0.5 if findex in (0, fracs.size - 1) else 1.0
                wt = wt * ray_lengths[zz] * 1.0e-6 / (nparts - 1.0)
                outs[0][hh] += wt * if_wet(pts)
                outs[1][hh] += wt * if_hydro(pts)
    return outs


class TestParityVsReference:
    def test_varying_field_parity(self, la_los, rng):
        """Smoothly varying refractivity cubes: fused engine vs the exact
        reference reimplementation, < 0.1 mm everywhere."""
        ys = np.arange(32.0, 35.01, 0.25)
        xs = np.arange(-120.0, -115.99, 0.25)
        zs = np.concatenate([
            np.arange(-500.0, 3000.0, 250.0),
            np.arange(3000.0, 10000.0, 500.0),
            np.arange(10000.0, 30001.0, 1000.0),
        ])
        zz, yy2, xx2 = np.meshgrid(zs, ys, xs, indexing='ij')
        # exponential-ish wet, linear-ish hydro with horizontal gradients
        wet = 100.0 * np.exp(-zz / 2000.0) * (1 + 0.05 * (yy2 - 33.5) + 0.03 * (xx2 + 118))
        hydro = 270.0 * np.exp(-zz / 8000.0) * (1 + 0.02 * (yy2 - 33.5))
        ds = synthetic_wm_dataset(wet_cube=wet, hydro_cube=hydro)
        wm = WeatherCube(ds)

        xpts = np.arange(-118.2, -117.4, 0.2)
        ypts = np.arange(34.0, 33.2, -0.2)
        heights = np.array([-100.0, 500.0, 3000.0])
        max_h = wm.zs[-1] - 1

        wet_ours, hydro_ours = _build_cube_ray(wm, xpts, ypts, heights, la_los,
                                               Geographic(), zref=max_h)
        wet_ref, hydro_ref = _reference_build_cube_ray(wm, xpts, ypts, heights,
                                                       la_los, zref=max_h)
        assert np.nanmax(np.abs(np.asarray(wet_ours) - wet_ref)) < 1e-4
        assert np.nanmax(np.abs(np.asarray(hydro_ours) - hydro_ref)) < 1e-4
        # and the delays themselves are meaningfully large
        assert np.nanmean(wet_ref) > 0.05


class TestClosureRegions:
    """Constant-N closure at the reference's other synthetic regions
    (test_synthetic.py:148-175): near-equator ascending (Fortaleza) and
    high-latitude descending (Alaska) - exercises the geometry at latitudes
    where the LA case cannot (meridian convergence, steeper normals)."""

    REGIONS = {
        'fortaleza': dict(bbox=[-4.5, -3.5, -38.75, -37.75],
                          lat0=-4.0, lon0=-38.25, phase0=-0.07,
                          lon_asc=-48.0, incline=98.0),
        'alaska': dict(bbox=[64.5, 65.5, -148.5, -147.5],
                       lat0=65.0, lon0=-148.0, phase0=1.18,
                       lon_asc=-102.0, incline=98.0),
    }

    @pytest.mark.parametrize('region', list(REGIONS))
    def test_constant_refractivity(self, region):
        import tests.test_orbit as to

        cfg = self.REGIONS[region]
        s, n, w, e = cfg['bbox']
        ys = np.arange(s - 1.5, n + 1.51, 0.25)
        xs = np.arange(w - 1.5, e + 1.51, 0.25)
        zs = np.concatenate([np.arange(-500.0, 3000.0, 250.0),
                             np.arange(3000.0, 10000.0, 500.0),
                             np.arange(10000.0, 30001.0, 1000.0)])
        shape = (zs.size, ys.size, xs.size)
        coords = {'x': Variable(('x',), xs, {}), 'y': Variable(('y',), ys, {}),
                  'z': Variable(('z',), zs, {})}
        variables = {
            'wet': Variable(('z', 'y', 'x'), np.full(shape, 1.0), {}),
            'hydro': Variable(('z', 'y', 'x'), np.full(shape, 2.0), {}),
            'wet_total': Variable(('z', 'y', 'x'), np.zeros(shape), {}),
            'hydro_total': Variable(('z', 'y', 'x'), np.zeros(shape), {}),
            'proj': Variable((), np.int64(0), Geographic().to_cf()),
        }
        wm = WeatherCube(Dataset(coords=coords, variables=variables, attrs={}))

        t = dt.datetime(2020, 1, 30, 13, 52, 45)
        orb = to.synthetic_orbit(t, incline_deg=cfg['incline'],
                                 lon_asc_deg=cfg['lon_asc'],
                                 phase0=cfg['phase0'])
        los = Raytracing(orbit=orb, time=t)

        aoi = BoundingBox(cfg['bbox'], cube_spacing_in_m=20000.0)
        aoi.add_buffer(0.25)
        aoi.set_output_xygrid(4326)
        heights = np.array([0.0, 3000.0])
        max_h = wm.zs[-1] - 1
        wet, hydro = _build_cube_ray(wm, aoi.xpts, aoi.ypts, heights, los,
                                     Geographic(), zref=max_h)
        lengths = _length_of_ray(aoi.xpts, aoi.ypts, heights, wm.zs, los, max_h)
        assert np.all(np.abs(lengths) > 1)
        resid_wet = (lengths * 1.0 - np.asarray(wet) * 1e6) / lengths
        resid_hydro = (lengths * 2.0 - np.asarray(hydro) * 1e6) / (2 * lengths)
        np.testing.assert_almost_equal(0, resid_wet, decimal=6)
        np.testing.assert_almost_equal(0, resid_hydro, decimal=6)


class TestCoverageEdge:
    """A scene straddling the orbit's zero-Doppler coverage band: pixels
    whose crossing falls outside the statevector span become NaN (the
    reference's ISCE3 raises per pixel, losreader.py:252-254), pixels inside
    stay finite, and no exception is raised as long as SOME ray converges.
    Host and device geometry must agree on the NaN mask."""

    def test_partial_coverage_nan_mask(self, monkeypatch):
        from raider_tpu.geometry.orbit import Orbit

        # short polar arc (+-120 s): sub-satellite track covers lat ~ +-7.2
        # deg, so a query box spanning lat 1..13 crosses the coverage edge
        t_ref = dt.datetime(2020, 1, 1, 12, 0, 0)
        tt = np.arange(-120.0, 121.0, 10.0)
        r_orb = 6378137.0 + 700e3
        om = 2.0 * np.pi / 6000.0
        ang = om * tt
        pos = np.stack([r_orb * np.cos(ang),
                        np.zeros_like(ang),
                        r_orb * np.sin(ang)], -1)
        vel = np.gradient(pos, 10.0, axis=0)
        orbit = Orbit(times=tt, pos=pos, vel=vel, ref_time=t_ref)
        los = Raytracing(orbit=orbit, time=t_ref)

        ys = np.linspace(-1.0, 15.0, 40)
        xs = np.linspace(1.0, 5.0, 20)
        zs = np.concatenate([np.arange(-500.0, 3000.0, 500.0),
                             np.arange(3000.0, 20001.0, 1500.0)])
        shape = (zs.size, ys.size, xs.size)
        coords = {'x': Variable(('x',), xs, {}), 'y': Variable(('y',), ys, {}),
                  'z': Variable(('z',), zs, {})}
        variables = {
            'wet': Variable(('z', 'y', 'x'), np.full(shape, 1.0), {}),
            'hydro': Variable(('z', 'y', 'x'), np.full(shape, 2.0), {}),
            'proj': Variable((), np.int64(0), Geographic().to_cf()),
        }
        wm = WeatherCube(Dataset(coords=coords, variables=variables, attrs={}))

        yq = np.linspace(1.0, 13.0, 12)
        xq = np.linspace(2.0, 4.0, 8)
        hts = np.array([0.0, 2000.0])
        out = {}
        for mode in ('0', '1'):
            monkeypatch.setenv('RAIDER_TPU_DEVICE_GEOMETRY', mode)
            w, h = _build_cube_ray(wm, xq, yq, hts, los, Geographic(),
                                   zref=float(zs[-1] - 1.0),
                                   compute_dtype=np.float32)
            out[mode] = (np.asarray(w), np.asarray(h))

        w_h, h_h = out['0']
        nan_mask = np.isnan(w_h)
        # low latitudes are covered and finite; the top of the box is not
        assert np.isfinite(w_h[:, 0, :]).all() and np.isfinite(h_h[:, 0, :]).all()
        assert np.isnan(w_h[:, -1, :]).all() and np.isnan(h_h[:, -1, :]).all()
        assert 0 < nan_mask.sum() < nan_mask.size
        # device geometry: same mask, same finite values (f32 tolerance)
        w_d, h_d = out['1']
        np.testing.assert_array_equal(np.isnan(w_d), nan_mask)
        np.testing.assert_array_equal(np.isnan(h_d), np.isnan(h_h))
        np.testing.assert_allclose(w_d[~nan_mask], w_h[~nan_mask], atol=1e-4)
        np.testing.assert_allclose(h_d[~nan_mask], h_h[~nan_mask], atol=1e-4)
