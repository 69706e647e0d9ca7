"""Quantized int16 result stream (round 4).

The raytrace engine's per-slice (2, N) outputs ride a device->host copy
that does NOT overlap device compute on remote-attached TPUs: the bench
e2e slope measures compute + transfer, so wire bytes are wall time. The
production TPU path therefore streams results as per-(slice, field) affine
int16 (engine._quant16 / _dequant16) — half the bytes at a bounded
range/131068 dequantization error (< 0.1 mm for physical delay slices,
the tests/test_parity_bound.py budget). CPU backends keep exact f32
(device_get is a no-op copy there); RAIDER_TPU_STREAM={i16,f32} overrides.
"""

import datetime as dt
import pathlib
import sys

import numpy as np
import pytest

from raider_tpu.delay.engine import _dequant16, _quant16, _stream_quant16

sys.path.insert(0, str(pathlib.Path(__file__).parent))


def roundtrip(buf):
    q, lo, scale = (np.asarray(a) for a in _quant16(np.asarray(buf)))
    return q, lo, scale, _dequant16(q, lo, scale)


class TestQuantRoundtrip:
    def test_error_bound_and_shapes(self):
        rng = np.random.default_rng(0)
        buf = rng.uniform(1.8, 3.1, (4, 2, 1000)).astype(np.float32)
        q, lo, scale, out = roundtrip(buf)
        assert q.dtype == np.int16 and q.shape == buf.shape
        assert lo.shape == (4, 2) and scale.shape == (4, 2)
        # worst case is half a quantization step per row, plus the f32
        # rounding of the quant/dequant arithmetic itself (a few ulp of the
        # value, ~6% of a step here)
        step = (buf.max(-1) - buf.min(-1))[..., None] / 65534.0
        err = np.abs(out - buf)
        slop = 4 * np.spacing(np.abs(buf).max())
        assert (err <= 0.5 * step + slop).all()
        # meters-scale delays land ~2e-5 m steps: the bound itself is tight
        assert err.max() < 1.5e-5

    def test_endpoints_exact(self):
        buf = np.array([[[0.5, 2.0, 3.75]]], np.float32)
        _, _, _, out = roundtrip(buf)
        np.testing.assert_allclose(out[0, 0, [0, 2]], [0.5, 3.75], rtol=2e-7)

    def test_nan_sentinel(self):
        buf = np.array([[[1.0, np.nan, 2.0, np.nan]]], np.float32)
        q, _, _, out = roundtrip(buf)
        assert (q[0, 0, [1, 3]] == -32768).all()
        assert np.isnan(out[0, 0, [1, 3]]).all()
        np.testing.assert_allclose(out[0, 0, [0, 2]], [1.0, 2.0], atol=1e-4)

    def test_inf_folds_to_nan(self):
        # same intended semantic as the pack16_i16 cube mode: int16 has no
        # inf, all non-finite garbage decodes to NaN
        buf = np.array([[[1.0, np.inf, -np.inf, 1.5]]], np.float32)
        _, lo, scale, out = roundtrip(buf)
        assert np.isnan(out[0, 0, 1:3]).all()
        assert np.isfinite(lo).all() and np.isfinite(scale).all()
        np.testing.assert_allclose(out[0, 0, [0, 3]], [1.0, 1.5], atol=1e-4)

    def test_all_nan_row(self):
        buf = np.full((2, 2, 8), np.nan, np.float32)
        buf[1] = 3.0
        _, lo, scale, out = roundtrip(buf)
        assert np.isnan(out[0]).all()
        assert np.isfinite(lo).all() and (scale > 0).all()
        np.testing.assert_allclose(out[1], 3.0, rtol=1e-6)

    def test_constant_row_exact(self):
        buf = np.full((1, 2, 16), 2.25, np.float32)
        _, _, _, out = roundtrip(buf)
        np.testing.assert_array_equal(out, buf)

    def test_negative_values(self):
        rng = np.random.default_rng(3)
        buf = rng.uniform(-0.01, 0.01, (1, 2, 500)).astype(np.float32)
        _, _, _, out = roundtrip(buf)
        assert np.abs(out - buf).max() < 0.02 / 65534.0

    def test_unbatched_2d(self):
        # the single-slice flush path quantizes a (2, N) buffer directly
        rng = np.random.default_rng(4)
        buf = rng.uniform(0.0, 1.0, (2, 300)).astype(np.float32)
        q, lo, scale, out = roundtrip(buf)
        assert q.shape == (2, 300) and lo.shape == (2,)
        assert np.abs(out - buf).max() < 1.0 / 65534.0


class TestStreamGate:
    def test_env_override(self, monkeypatch):
        monkeypatch.setenv('RAIDER_TPU_STREAM', 'i16')
        assert _stream_quant16() is True
        monkeypatch.setenv('RAIDER_TPU_STREAM', 'f32')
        assert _stream_quant16() is False

    def test_cpu_default_is_exact(self, monkeypatch):
        import jax

        monkeypatch.delenv('RAIDER_TPU_STREAM', raising=False)
        if jax.default_backend() == 'cpu':
            assert _stream_quant16() is False


class TestEnginePath:
    @pytest.mark.parametrize('fetch_batch', ['1', '3'])
    def test_build_cube_ray_stream_i16(self, monkeypatch, fetch_batch):
        """The PRODUCTION engine with the quantized stream: multi-slice
        batches (stacking + repointing), a trailing short batch, and the
        final cube within the documented range/131068 bound of the exact
        f32 stream."""
        from test_raytrace import synthetic_orbit, synthetic_wm_dataset

        from raider_tpu.delay.engine import WeatherCube, _build_cube_ray
        from raider_tpu.geodesy.crs import Geographic
        from raider_tpu.geometry.los import Raytracing

        rng = np.random.default_rng(7)
        shape = (49, 13, 17)
        wet_c = rng.uniform(0.1, 100.0, shape)
        hydro_c = rng.uniform(50.0, 300.0, shape)
        t = dt.datetime(2020, 1, 30, 13, 52, 45)
        los = Raytracing(orbit=synthetic_orbit(t), time=t)
        xpts = np.linspace(-118.4, -117.2, 8)
        ypts = np.linspace(33.2, 33.8, 7)
        zpts = np.array([0.0, 1000.0, 2000.0, 3000.0])

        def run(stream):
            monkeypatch.setenv('RAIDER_TPU_STREAM', stream)
            monkeypatch.setenv('RAIDER_TPU_FETCH_BATCH', fetch_batch)
            wm = WeatherCube(synthetic_wm_dataset(
                wet_cube=wet_c, hydro_cube=hydro_c))
            w, h = _build_cube_ray(wm, xpts, ypts, zpts, los, Geographic(),
                                   zref=25000.0, compute_dtype=np.float32)
            return np.asarray(w), np.asarray(h)

        w_f, h_f = run('f32')
        w_q, h_q = run('i16')

        np.testing.assert_array_equal(np.isnan(w_f), np.isnan(w_q))
        np.testing.assert_array_equal(np.isnan(h_f), np.isnan(h_q))
        ok = np.isfinite(w_f)
        assert ok.mean() > 0.9
        # documented bound: per-(slice, field) finite range / 131068
        for exact, quant in ((w_f, w_q), (h_f, h_q)):
            for hh in range(zpts.size):
                sl_ok = np.isfinite(exact[hh])
                if not sl_ok.any():
                    continue
                rng_sl = exact[hh][sl_ok].max() - exact[hh][sl_ok].min()
                # range/131068 is the round-to-quantum half-step; the rest
                # is the chain's f32 arithmetic: quant (v-lo subtract +
                # divide) and dequant (q*scale product) each round at
                # ~0.5 ulp of the RANGE (1.5 roundings total ~ 1.8e-7 *
                # range, allow 2.5e-7), plus the final lo + m addition at
                # the value's own f32 ulp. (An earlier version used
                # np.spacing on the f64 exact values — ~2e-16, i.e. no
                # headroom at all — and passed on rounding luck.)
                bound = (rng_sl / 131068.0 + 2.5e-7 * rng_sl
                         + 4 * np.spacing(np.float32(
                             np.abs(exact[hh][sl_ok]).max())))
                worst = np.abs(quant[hh][sl_ok] - exact[hh][sl_ok]).max()
                assert worst <= bound, (
                    f'slice {hh}: {worst * 1e3:.5f} mm > {bound * 1e3:.5f} mm')
        # and absolutely: far under the 0.1 mm parity budget
        assert np.abs(w_q[ok] - w_f[ok]).max() < 1e-4

    @pytest.mark.parametrize('path', ['separable', 'general'])
    def test_build_cube_zenith_stream_i16(self, monkeypatch, path):
        """The zenith/projected cube fetch rides the same quantized wire:
        both the separable-MXU fast path and the general gather path,
        per-(z, y) x-row bound (tighter than the raytrace slice rows)."""
        from test_raytrace import synthetic_wm_dataset

        from raider_tpu.delay.engine import WeatherCube, _build_cube
        from raider_tpu.geodesy.crs import Geographic, utm_crs

        rng = np.random.default_rng(11)
        shape = (49, 13, 17)
        wet_c = rng.uniform(0.1, 100.0, shape)
        nan_z, nan_y, nan_x = rng.integers(0, shape, (4, 3)).T
        wm = WeatherCube(synthetic_wm_dataset(wet_cube=wet_c))
        if path == 'separable':
            # same CRS + NaN-free cube -> three MXU contractions
            pts_crs = wm.crs
            assert isinstance(pts_crs, Geographic)
            xpts = np.linspace(-118.4, -117.2, 12)
            ypts = np.linspace(33.2, 33.8, 9)
        else:
            # CRS mismatch forces the gather path; poke NaNs in to cover
            # the sentinel on a whole-cube fetch
            w = np.asarray(wm.ds['wet'].data)
            w[nan_z, nan_y, nan_x] = np.nan
            pts_crs = utm_crs(zone=11)
            xpts = np.linspace(370e3, 480e3, 12)
            ypts = np.linspace(3.67e6, 3.74e6, 9)
        zpts = np.array([0.0, 1000.0, 2500.0, 4000.0])

        def run(stream):
            monkeypatch.setenv('RAIDER_TPU_STREAM', stream)
            return _build_cube(wm, xpts, ypts, zpts, pts_crs,
                               ['wet', 'hydro'], np.float32)

        f32 = run('f32')
        q16 = run('i16')
        for exact, quant in zip(f32, q16):
            exact, quant = np.asarray(exact), np.asarray(quant)
            assert exact.shape == quant.shape == (4, 9, 12)
            np.testing.assert_array_equal(np.isnan(exact), np.isnan(quant))
            okm = np.isfinite(exact)
            assert okm.mean() > 0.5
            # per-x-row bound: range/131068 over each (z, y) row
            rng_row = (np.nanmax(exact, -1) - np.nanmin(exact, -1))
            bound = np.broadcast_to(
                rng_row[..., None] / 131068.0
                + 4 * np.spacing(np.nanmax(np.abs(exact))), exact.shape)
            assert (np.abs(quant - exact)[okm] <= bound[okm]).all()
            # relative: the synthetic cube spans ~100 units/row, so the
            # bound is ~1e-5 of the range (a real delay cube's range is
            # O(m), landing the same relative bound under 0.1 mm)
            rng_all = exact[okm].max() - exact[okm].min()
            assert np.abs(quant[okm] - exact[okm]).max() <= 1e-5 * rng_all

    def test_point_query_stream_i16(self, monkeypatch):
        """Station-point sampling (the GNSS path) over the quantized wire."""
        from test_raytrace import synthetic_wm_dataset

        from raider_tpu.delay.engine import WeatherCube
        from raider_tpu.ops.interp import interp3d_points

        rng = np.random.default_rng(13)
        wm = WeatherCube(synthetic_wm_dataset())
        cube = wm.field('wet', np.float32)
        n = 4096
        py = rng.uniform(33.2, 33.8, n)
        px = rng.uniform(-118.4, -117.2, n)
        pz = rng.uniform(0.0, 8000.0, n)

        from raider_tpu.delay.engine import _fetch_stream

        monkeypatch.setenv('RAIDER_TPU_STREAM', 'f32')
        exact = _fetch_stream(
            interp3d_points(cube, wm.ys, wm.xs, wm.zs, py, px, pz))
        monkeypatch.setenv('RAIDER_TPU_STREAM', 'i16')
        quant = _fetch_stream(
            interp3d_points(cube, wm.ys, wm.xs, wm.zs, py, px, pz))
        okm = np.isfinite(exact)
        np.testing.assert_array_equal(okm, np.isfinite(quant))
        assert okm.mean() > 0.9
        bound = ((exact[okm].max() - exact[okm].min()) / 131068.0
                 + 4 * np.spacing(np.abs(exact[okm]).max()))
        assert np.abs(quant[okm] - exact[okm]).max() <= bound
