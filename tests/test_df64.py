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
