"""Double-single ("df64") arithmetic: ~48-bit mantissa from float32 pairs.

TPU hardware has no native float64 (XLA emulates it at reduced precision on
current targets), but millimeter-accurate ray geometry at ECEF scale
(~6.4e6 m) needs ~40+ mantissa bits. A double-single number represents a
value as an unevaluated sum hi + lo of two float32s (Dekker 1971 / Knuth
TAOCP error-free transformations), giving ~6e-15 relative accuracy for
+,-,*,/ and sqrt - enough for sub-0.1 mm positions.

All building blocks use only exact float32 operations (two-sum and Veltkamp
splitting), so no fused-multiply-add support is assumed. XLA must not
re-associate these operations; jax does not apply unsafe FP rewrites, so the
transformations stay exact under jit on TPU and CPU alike.

The public type is a (hi, lo) pair pytree; helpers are vectorized over any
array shape.
"""

import math
from typing import NamedTuple

import jax.numpy as jnp

_SPLIT = 4097.0  # 2^12 + 1 Veltkamp splitter for float32 (24-bit mantissa)


class DF(NamedTuple):
    """A double-single value: the represented number is hi + lo."""

    hi: jnp.ndarray
    lo: jnp.ndarray


def _two_sum(a, b):
    """Error-free a + b: returns (s, err) with s + err == a + b exactly."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """Error-free a + b assuming |a| >= |b|."""
    s = a + b
    err = b - (s - a)
    return s, err


def _split(a):
    """Veltkamp split of a float32 into high/low 12-bit halves."""
    t = _SPLIT * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def _two_prod(a, b):
    """Error-free a * b: returns (p, err) with p + err == a * b exactly."""
    p = a * b
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    err = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, err


def df(value) -> DF:
    """Promote a float32 array (or python scalar) to df64 with zero error.

    NOTE: for python-float constants that are not exactly representable in
    float32 (1/6, e^2, ...), use :func:`const` - ``df`` keeps only the f32
    rounding of the value.
    """
    v = jnp.asarray(value, dtype=jnp.float32)
    return DF(v, jnp.zeros_like(v))


def const(value: float) -> DF:
    """Exact df64 representation of a python float constant."""
    import numpy as np

    v = np.float64(value)
    hi = np.float32(v)
    lo = np.float32(v - np.float64(hi))
    return DF(jnp.float32(hi), jnp.float32(lo))


def from_f64(value) -> DF:
    """Exact split of float64 host values into (hi, lo) float32 pairs."""
    import numpy as np

    v = np.asarray(value, dtype=np.float64)
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def to_f64(x: DF):
    """Recombine on host into float64 (for verification/output)."""
    import numpy as np

    return np.asarray(x.hi, dtype=np.float64) + np.asarray(x.lo, dtype=np.float64)


def add(x: DF, y: DF) -> DF:
    s, e = _two_sum(x.hi, y.hi)
    e = e + x.lo + y.lo
    hi, lo = _quick_two_sum(s, e)
    return DF(hi, lo)


def sub(x: DF, y: DF) -> DF:
    return add(x, neg(y))


def neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def mul(x: DF, y: DF) -> DF:
    p, e = _two_prod(x.hi, y.hi)
    e = e + x.hi * y.lo + x.lo * y.hi
    hi, lo = _quick_two_sum(p, e)
    return DF(hi, lo)


def sqr(x: DF) -> DF:
    """x * x. NEVER write mul(x, x): when both operands are the same tensor,
    XLA's simplifier recognizes the identical subexpressions and rewrites the
    error-free transformation away (measured: f32-level results under jit).
    The barrier makes the operands structurally distinct.
    """
    from jax import lax

    h2, l2 = lax.optimization_barrier((x.hi, x.lo))
    return mul(x, DF(h2, l2))


def div(x: DF, y: DF) -> DF:
    """One-refinement double-single division (~2^-47 relative error).

    q1 carries f32 accuracy; the residual r = x - q1*y is formed error-free
    in df64, so the f32 correction q2 = r.hi/y.hi lands the total at
    ~|x/y| * 2^-47. A second refinement stage (q3) would only chase the
    last one or two bits of the 48-bit mantissa at ~40% extra cost - the
    geometry needs ~2^-32 relative, so one stage has orders of margin.
    """
    q1 = x.hi / y.hi
    # r = x - q1 * y, computed in df64 (error-free cancellation)
    r = sub(x, mul(df(q1), y))
    q2 = r.hi / y.hi
    hi, lo = _quick_two_sum(q1, q2)
    return DF(hi, lo)


def sqrt(x: DF) -> DF:
    """df64 square root via one Newton refinement of the f32 estimate."""
    s = jnp.sqrt(x.hi)
    # r = (x - s^2) / (2 s), all in df64; guard x == 0 (0/0 in the
    # refinement: zero-length ray segments are legitimate inputs)
    s_df = df(s)
    diff = sub(x, sqr(s_df))
    corr = jnp.where(s == 0.0, 0.0, diff.hi / (2.0 * s))
    hi, lo = _quick_two_sum(s, corr)
    return DF(hi, lo)


def cbrt(x: DF) -> DF:
    """df64 cube root: f32 seed + ONE Newton step with f32 correction.

    The f32 seed y is ~2^-24-relative accurate, so the Newton correction
    (x - y^3) / (3 y^2) is ~2^-24 relative to y - computing it beyond f32
    precision is wasted work (its own rounding lands at ~2^-48 of the
    result). Only the residual x - y^3 needs df64 (catastrophic
    cancellation of the leading 24 bits); the divide runs in plain f32.
    """
    y = jnp.cbrt(x.hi)
    # XLA's f32 cbrt is a few ulp off; one plain-f32 Newton polish brings
    # the seed to ~1 ulp so the df64 step's quadratic term lands at ~2^-48
    y = y - (y * y * y - x.hi) / (3.0 * y * y)
    est = df(y)
    y2 = sqr(est)
    y3 = mul(y2, est)
    num = sub(x, y3)                       # ~2^-24 * x, exact leading bits
    corr = num.hi / (3.0 * y * y)
    hi, lo = _quick_two_sum(y, corr)
    return DF(hi, lo)


def scale(x: DF, c) -> DF:
    """Multiply by an exact float32 constant."""
    return mul(x, df(c))


def dot3(ax: DF, ay: DF, az: DF, bx: DF, by: DF, bz: DF) -> DF:
    return add(add(mul(ax, bx), mul(ay, by)), mul(az, bz))


def norm3(x: DF, y: DF, z: DF) -> DF:
    return sqrt(add(add(sqr(x), sqr(y)), sqr(z)))


def lt(x: DF, y: DF):
    """x < y comparison (hi dominates; ties broken by lo)."""
    return (x.hi < y.hi) | ((x.hi == y.hi) & (x.lo < y.lo))


# --------------------------------------------------------- transcendentals
#
# QD-library-style double-single elementary functions (Hida/Li/Bailey
# 2001 scheme adapted to float32 pairs): range-reduce with two-part
# constants, short Taylor/atanh series in df64, exact power-of-two
# rescales. Added for the df64 CRS transforms (LCC needs t^n = exp(n ln t)
# and sin/cos(n * dlon) — see geometry/device_geom._lcc_rel_from_df);
# accuracy ~1e-13..1e-14 relative, verified against float64 in
# tests/test_df64.py::TestDf64Transcendental.

_LN2 = 0.6931471805599453
_HALF_PI = 1.5707963267948966
_SQRT_HALF = 0.7071067811865476
_SQRT_TWO = 1.4142135623730951


def _ldexp(x: DF, k) -> DF:
    """x * 2^k for integer-valued k in [-126, 127] — exact.

    jnp.exp2 is an APPROXIMATION (measured ~10 ulp off even at integer
    arguments on XLA:CPU), so the power of two is built exactly from the
    float32 exponent field instead.
    """
    from jax import lax

    ki = jnp.clip(jnp.asarray(k, jnp.int32), -126, 127)
    s = lax.bitcast_convert_type((ki + 127) << 23, jnp.float32)
    return DF(x.hi * s, x.lo * s)


def log(x: DF) -> DF:
    """Natural log for x > 0 (NaN propagates for x <= 0).

    Reduction: x = m * 2^k with m in [sqrt(1/2), sqrt(2)), then
    ln m = 2 atanh(z), z = (m-1)/(m+1) in [-0.1716, 0.1716] — a 10-term
    odd series whose truncation sits at ~3e-16 relative.
    """
    k = jnp.round(jnp.log2(x.hi))
    m = _ldexp(x, -k)
    low = m.hi < _SQRT_HALF
    m = where(low, _ldexp(m, 1.0), m)
    k = jnp.where(low, k - 1.0, k)
    high = m.hi >= _SQRT_TWO
    m = where(high, _ldexp(m, -1.0), m)
    k = jnp.where(high, k + 1.0, k)

    one = const(1.0)
    z = div(sub(m, one), add(m, one))
    u = sqr(z)
    # Horner over u: sum_{j=0..9} u^j / (2j+1)
    acc = const(1.0 / 19.0)
    for j in range(8, -1, -1):
        acc = add(mul(acc, u), const(1.0 / (2 * j + 1)))
    ln_m = scale(mul(z, acc), 2.0)
    return add(ln_m, mul(df(k), const(_LN2)))


def exp(x: DF) -> DF:
    """e^x for |x| <~ 80 (exact-f32-integer k range; plenty for t^n).

    Reduction: x = k ln2 + r, |r| <= ln2/2; 14-term Taylor for e^r
    (truncation ~2e-17 relative); exact 2^k rescale.
    """
    k = jnp.round(x.hi / jnp.float32(_LN2))
    r = sub(x, mul(df(k), const(_LN2)))
    acc = const(1.0 / math.factorial(13))
    for j in range(12, -1, -1):
        acc = add(mul(acc, r), const(1.0 / math.factorial(j)))
    return _ldexp(acc, k)


def _sin_poly(r: DF) -> DF:
    """sin r for |r| <= pi/4 + ulp: r * P(r^2), truncation ~9e-20."""
    u = sqr(r)
    acc = const(1.0 / math.factorial(17))
    for j in range(7, 0, -1):
        acc = add(mul(acc, neg(u)), const(1.0 / math.factorial(2 * j + 1)))
    acc = add(mul(acc, neg(u)), const(1.0))
    return mul(r, acc)


def _cos_poly(r: DF) -> DF:
    """cos r for |r| <= pi/4 + ulp: Q(r^2), truncation ~1.6e-18."""
    u = sqr(r)
    acc = const(1.0 / math.factorial(16))
    for j in range(7, 0, -1):
        acc = add(mul(acc, neg(u)), const(1.0 / math.factorial(2 * j)))
    acc = add(mul(acc, neg(u)), const(1.0))
    return acc


def sincos(x: DF):
    """(sin x, cos x) for |x| <~ 1000 (reduction exactness degrades with
    |k|: k * halfpi_lo error ~ |k| * 2e-15; the CRS use has |x| <= pi)."""
    k = jnp.round(x.hi / jnp.float32(_HALF_PI))
    r = sub(x, mul(df(k), const(_HALF_PI)))
    s, c = _sin_poly(r), _cos_poly(r)
    quad = k - 4.0 * jnp.floor(k / 4.0)               # {0, 1, 2, 3}
    sin_x = where(quad == 0.0, s,
                  where(quad == 1.0, c,
                        where(quad == 2.0, neg(s), neg(c))))
    cos_x = where(quad == 0.0, c,
                  where(quad == 1.0, neg(s),
                        where(quad == 2.0, neg(c), s)))
    return sin_x, cos_x


def sin(x: DF) -> DF:
    return sincos(x)[0]


def cos(x: DF) -> DF:
    return sincos(x)[1]


def atan2(y: DF, x: DF) -> DF:
    """atan2(y, x) in (-pi, pi]: f32 seed + one exact-trig refinement.

    The residual d = atan2(y, x) - th0 is ~1e-6 rad (f32 seed ulp), and
    tan(d) = (y cos th0 - x sin th0) / (x cos th0 + y sin th0) is formed
    in df64 from the seed's EXACT df64 sin/cos; atan(tan d) = d to ~1e-18
    at that magnitude, so one correction lands at df64 precision.
    """
    th0 = jnp.arctan2(y.hi, x.hi)
    s0, c0 = sincos(df(th0))
    num = sub(mul(y, c0), mul(x, s0))
    den = add(mul(x, c0), mul(y, s0))
    return add(df(th0), div(num, den))


def where(pred, x: DF, y: DF) -> DF:
    return DF(jnp.where(pred, x.hi, y.hi), jnp.where(pred, x.lo, y.lo))
