"""Double-single (df64) arithmetic accuracy vs true float64."""

import numpy as np
import pytest

from raider_tpu.ops import df64


@pytest.fixture
def vals(rng):
    # ECEF-scale magnitudes plus small values
    a = np.concatenate([rng.uniform(-7e6, 7e6, 500), rng.uniform(-1, 1, 500)])
    b = np.concatenate([rng.uniform(-7e6, 7e6, 500), rng.uniform(-1, 1, 500)])
    return a, b


def _rel(x, ref):
    return np.abs(x - ref) / np.maximum(np.abs(ref), 1e-30)


class TestDf64Ops:
    def test_roundtrip(self, vals):
        a, _ = vals
        x = df64.from_f64(a)
        # lo is itself a rounded float32, so representation error ~3.6e-15 rel
        np.testing.assert_allclose(df64.to_f64(x), a, rtol=1e-14)

    def test_add_sub(self, vals):
        a, b = vals
        x, y = df64.from_f64(a), df64.from_f64(b)
        # under cancellation the achievable error scales with the INPUT
        # magnitude (representation rounding), not the result
        scale = np.maximum(np.abs(a), np.abs(b))
        err_add = np.abs(df64.to_f64(df64.add(x, y)) - (a + b))
        err_sub = np.abs(df64.to_f64(df64.sub(x, y)) - (a - b))
        assert (err_add / scale).max() < 2e-14
        assert (err_sub / scale).max() < 2e-14

    def test_add_catastrophic_cancellation(self):
        # (big + 1) - big == 1 must survive
        big = 6.378137e6
        x = df64.add(df64.from_f64(big), df64.from_f64(1.0))
        r = df64.sub(x, df64.from_f64(big))
        np.testing.assert_allclose(df64.to_f64(r), 1.0, rtol=1e-13)

    def test_mul(self, vals):
        a, b = vals
        x, y = df64.from_f64(a), df64.from_f64(b)
        assert _rel(df64.to_f64(df64.mul(x, y)), a * b).max() < 5e-14

    def test_div(self, vals):
        a, b = vals
        b = np.where(np.abs(b) < 1e-3, 1.0, b)
        x, y = df64.from_f64(a), df64.from_f64(b)
        assert _rel(df64.to_f64(df64.div(x, y)), a / b).max() < 5e-14

    def test_sqrt(self, rng):
        a = rng.uniform(1e-6, 5e13, 1000)
        x = df64.from_f64(a)
        assert _rel(df64.to_f64(df64.sqrt(x)), np.sqrt(a)).max() < 5e-14

    def test_cbrt(self, rng):
        a = rng.uniform(1e-6, 5e13, 1000)
        x = df64.from_f64(a)
        assert _rel(df64.to_f64(df64.cbrt(x)), np.cbrt(a)).max() < 5e-14

    def test_norm3_ecef_scale(self, rng):
        xyz = rng.uniform(-7e6, 7e6, (1000, 3))
        n = df64.norm3(*(df64.from_f64(xyz[:, i]) for i in range(3)))
        ref = np.linalg.norm(xyz, axis=-1)
        # absolute error at ECEF scale: must be < 0.1 mm
        assert np.abs(df64.to_f64(n) - ref).max() < 1e-4

    def test_under_jit(self, vals):
        """The error-free transforms must survive jit compilation."""
        import jax

        a, b = vals

        @jax.jit
        def f(xh, xl, yh, yl):
            r = df64.mul(df64.DF(xh, xl), df64.DF(yh, yl))
            return r.hi, r.lo

        x, y = df64.from_f64(a), df64.from_f64(b)
        hi, lo = f(x.hi, x.lo, y.hi, y.lo)
        out = np.asarray(hi, dtype=np.float64) + np.asarray(lo, dtype=np.float64)
        assert _rel(out, a * b).max() < 5e-14


class TestDf64Transcendental:
    """QD-style elementary functions (added for the df64 CRS transforms).

    CPU-backend df64 holds op-level precision (see TestDf64Ops), so these
    bounds are a few 1e-14 — the real-TPU behavior is additionally pinned
    by the on-chip parity sweep's stereo/LCC scenes.
    """

    def test_log(self, rng):
        # spans several binades incl. the conformal-t range (0.05..1)
        a = np.concatenate([rng.uniform(1e-4, 1.0, 1500),
                            rng.uniform(1.0, 1e4, 500)])
        r = df64.to_f64(df64.log(df64.from_f64(a)))
        # absolute error is what the t^n chain amplifies (|n ln t| <= ~10);
        # relative error blows up only across the ln x = 0 crossing where
        # the absolute bound is the meaningful one
        assert np.abs(r - np.log(a)).max() < 5e-13
        big = np.abs(np.log(a)) > 1e-2
        assert _rel(r[big], np.log(a)[big]).max() < 5e-13

    def test_log_domain(self):
        r = df64.to_f64(df64.log(df64.from_f64(np.array([-1.0, 0.0]))))
        assert np.isnan(r[0]) and not np.isfinite(r[1])

    def test_exp(self, rng):
        a = rng.uniform(-12.0, 6.0, 2000)
        r = df64.to_f64(df64.exp(df64.from_f64(a)))
        assert _rel(r, np.exp(a)).max() < 1e-13

    def test_exp_log_roundtrip_pow(self, rng):
        # t^n as the LCC forward computes it (n = sin(38.5 deg))
        t = rng.uniform(0.05, 0.95, 2000)
        n = 0.6225146366376195
        r = df64.to_f64(df64.exp(df64.mul(df64.const(n),
                                          df64.log(df64.from_f64(t)))))
        assert _rel(r, t ** n).max() < 2e-13

    def test_sincos(self, rng):
        a = rng.uniform(-np.pi, np.pi, 4000)
        s, c = df64.sincos(df64.from_f64(a))
        assert np.abs(df64.to_f64(s) - np.sin(a)).max() < 1e-13
        assert np.abs(df64.to_f64(c) - np.cos(a)).max() < 1e-13
        # quadrant boundaries land exactly on the reduction seams
        b = np.array([-np.pi, -np.pi / 2, 0.0, np.pi / 2, np.pi])
        s, c = df64.sincos(df64.from_f64(b))
        assert np.abs(df64.to_f64(s) - np.sin(b)).max() < 1e-13
        assert np.abs(df64.to_f64(c) - np.cos(b)).max() < 1e-13

    def test_atan2(self, rng):
        y = rng.uniform(-2.0, 2.0, 4000)
        x = rng.uniform(-2.0, 2.0, 4000)
        r = df64.to_f64(df64.atan2(df64.from_f64(y), df64.from_f64(x)))
        assert np.abs(r - np.arctan2(y, x)).max() < 1e-13

    def test_under_jit(self, rng):
        import jax

        a = rng.uniform(0.05, 0.95, 512)

        @jax.jit
        def f(h, l):
            r = df64.exp(df64.mul(df64.const(0.5), df64.log(df64.DF(h, l))))
            return r.hi, r.lo

        x = df64.from_f64(a)
        hi, lo = f(x.hi, x.lo)
        out = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        assert _rel(out, np.sqrt(a)).max() < 2e-13
