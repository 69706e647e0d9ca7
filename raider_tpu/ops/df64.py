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


def where(pred, x: DF, y: DF) -> DF:
    return DF(jnp.where(pred, x.hi, y.hi), jnp.where(pred, x.lo, y.lo))
