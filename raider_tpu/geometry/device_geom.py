"""On-device ray geometry in double-single (df64) arithmetic.

The default pipeline computes orbit/ray geometry on the host CPU in float64
(TPU f64 is emulated at low precision). This module provides the fully
device-resident alternative: millimeter-accurate geometry on TPU using
float32-pair (df64) arithmetic (see raider_tpu.ops.df64), which removes both
the host CPU bottleneck and the per-slice host->device transfer of segment
endpoints.

Pieces:
  * orbit polynomials: the host converts each 4-statevector Hermite window
    into a degree-7 monomial polynomial in tau = t - t_center (exact, f64),
    shipped once as df64 coefficient tables. Evaluation, differentiation and
    the zero-Doppler Newton solve then run on device in df64.
  * height above the WGS84 ellipsoid: Vermeille's closed form restricted to
    the height output needs only +,-,*,/,sqrt,cbrt - all df64-implementable.
  * level intersections (TOA Newton) and ray segment lengths in df64.

STATUS - PRODUCTION DEFAULT ON TPU (since round 2): delay/engine.py selects
this module for the raytrace cube build whenever the backend is TPU (see
engine.py, _use_device_geom), with full-workflow TPU-vs-CPU parity pinned at
0.1 mm in tests/test_parity_bound.py (measured 0.0058 mm on the real ERA5
raytrace scenario).

Caveat - CPU backends only: df64 correctness is compiler-dependent there.
XLA:CPU's LLVM codegen applies floating-point rewrites inside fused loops
that can destroy the error-free transformations (measured: results collapse
to f32 precision for some fusion shapes, varying with XLA fast-math flags;
the HLO itself is intact and jax.lax.optimization_barrier is removed by the
CPU pipeline). On CPU the host-f64 path (geometry.orbit / geometry.rays) is
therefore the default; on any new backend validate tests/test_device_geom.py
before relying on this module.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from raider_tpu.constants import WGS84_A, WGS84_E2
from raider_tpu.geometry.orbit import Orbit, interpolate_orbit
from raider_tpu.ops import df64
from raider_tpu.ops.df64 import DF


class OrbitPoly(NamedTuple):
    """Per-window degree-7 monomial orbit polynomials as df64 tables.

    times:   (n,) float64 statevector times (window selection, host numpy)
    t_c:     (nw, 2) float32 hi/lo window center times
    coeffs:  (nw, 8, 3, 2) float32 hi/lo monomial coefficients (pos in tau)
    """

    times: np.ndarray
    t_c: jnp.ndarray
    coeffs: jnp.ndarray


def split_f64(arr):
    """float64 -> (hi, lo) float32 pair, host-side df64 packing:
    hi = round-to-f32, lo = the exact rounding residual. The ONE definition
    every upload site uses - a subtly inconsistent copy (e.g. skipping the
    .astype(np.float64) round-trip) would silently discard the low word."""
    a = np.asarray(arr, dtype=np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def build_orbit_poly(orbit: Orbit) -> OrbitPoly:
    """Host-side: exact degree-7 monomial form of each Hermite window.

    The window polynomial is recovered by sampling the validated host
    Hermite interpolator at 8 points and interpolating (a degree-7
    polynomial through 8 samples of a degree-7 polynomial is exact).
    """
    times = np.asarray(orbit.times, dtype=np.float64)
    n = times.size
    nw = n - 3
    t_c = np.empty(nw, dtype=np.float64)
    coeffs = np.empty((nw, 8, 3), dtype=np.float64)
    for w in range(nw):
        t0, t1 = times[w + 1], times[w + 2]
        t_c[w] = 0.5 * (t0 + t1)
        # sample within the window span for conditioning
        span = times[w + 3] - times[w]
        taus = np.linspace(-0.5 * span, 0.5 * span, 8)
        pos, _ = interpolate_orbit(orbit.times, orbit.pos, orbit.vel, t_c[w] + taus)
        pos = np.asarray(pos)  # (8, 3)
        # exact Vandermonde solve (degree 7 through 8 samples)
        v = np.vander(taus, 8, increasing=True)
        coeffs[w] = np.linalg.solve(v, pos)

    def _pack(x):
        return jnp.asarray(np.stack(split_f64(x), axis=-1))

    return OrbitPoly(times=times, t_c=_pack(t_c), coeffs=_pack(coeffs))


# ------------------------------------------------------- df64 runtime guard

_PROBE_OK: dict = {}


@jax.jit
def _df64_probe_jit(a, b, p):
    """Cancellation probe: residuals that exist ONLY if the compiler keeps
    the error-free transformations intact.

    Leg 1 (two-sum): (a (+) b) (-) a with b far below a's ulp; exact df64
    recovers b, a fast-math rewrite of ``b - ((a+b) - a)`` collapses to 0.
    Leg 2 (two-prod): p*p - round(p*p) for p = 1 + 2^-12; the exact square
    carries a 2^-24 tail below f32 ulp that only the Dekker product keeps.
    """
    s = df64.add(df64.df(a), df64.df(b))
    r1 = df64.sub(s, df64.df(a))
    q = df64.sqr(df64.df(p))
    r2 = df64.sub(q, df64.const(1.0 + 2.0 ** -11))
    return r1.hi + r1.lo, r2.hi + r2.lo


def _run_df64_probe() -> bool:
    """Execute the probe on the default backend; True = df64 survives."""
    r1, r2 = _df64_probe_jit(jnp.float32(1.0), jnp.float32(2.0 ** -30),
                             jnp.float32(1.0 + 2.0 ** -12))
    ok1 = abs(float(r1) - 2.0 ** -30) < 0.25 * 2.0 ** -30
    ok2 = abs(float(r2) - 2.0 ** -24) < 0.25 * 2.0 ** -24
    return bool(ok1 and ok2)


def _probe_verdict_path(backend: str):
    """Where the probe verdict persists across processes, or None.

    The verdict is a property of the COMPILER, not the process: for a fixed
    compiler identity the same probe HLO compiles to the same executable, so
    one process's verdict holds for every other. Running the probe per
    process instead puts a device round trip on every fresh process's
    critical path — measured 115 s+ time-to-first-result in slow remote-TPU
    tunnel regimes (the single largest warm-start cost). Rides the
    compile-cache dir; no persistence when the cache is disabled.

    The key must cover everything that can change the compiled probe: jax +
    jaxlib versions, the TPU runtime library (libtpu ships independently of
    jaxlib in TPU-VM runtime updates), the concrete device generation
    (``device_kind`` — a cache dir can be shared via NFS or baked VM
    images), and the compiler-relevant env (XLA_FLAGS, LIBTPU_INIT_ARGS).
    A key miss just re-runs the probe — stale trust is the only real hazard.
    """
    import hashlib
    import os
    import pathlib

    d = jax.config.jax_compilation_cache_dir
    if not d:
        return None
    import jaxlib

    import importlib.metadata as _md

    libtpu = 'none'
    for pkg in ('libtpu', 'libtpu-nightly'):
        try:
            libtpu = _md.version(pkg)
            break
        except Exception:  # noqa: BLE001 - not installed / broken metadata
            continue
    try:
        kind = jax.local_devices()[0].device_kind.replace(' ', '_')
    except (RuntimeError, IndexError):
        kind = backend
    env = hashlib.sha256('\x1f'.join((
        os.environ.get('XLA_FLAGS', ''),
        os.environ.get('LIBTPU_INIT_ARGS', ''),
        libtpu, kind)).encode()).hexdigest()[:12]
    return pathlib.Path(d) / (
        f'df64_probe_{backend}-{jax.__version__}-{jaxlib.__version__}'
        f'-{env}.verdict')


def df64_backend_ok() -> bool:
    """Whether the active backend's compiler preserves df64 arithmetic.

    Runs a one-time-per-(backend, compiler-version) cancellation probe (see
    _df64_probe_jit): some XLA pipelines apply floating-point rewrites that
    silently collapse double-single arithmetic to f32 precision (observed on
    XLA:CPU for some fusion shapes - module docstring). A failing probe
    means on-device geometry would silently lose mm precision, so callers
    must fall back to the host-f64 path. A PASSING verdict persists in the
    compile-cache dir (see _probe_verdict_path) so warm processes skip the
    device round trip; failures are never persisted (a transient device
    hiccup must not durably pin the slow path — see tests).
    ``RAIDER_TPU_DF64_PROBE=skip`` bypasses the probe
    (always trusted); ``=fresh`` re-runs it ignoring any persisted verdict.
    Note a tiny probe can't prove every fusion shape is safe - the
    cross-backend parity drive (scripts/xbackend_drive.py) remains the
    authoritative check.
    """
    import os

    mode = os.environ.get('RAIDER_TPU_DF64_PROBE', '')
    if mode == 'skip':
        return True
    backend = jax.default_backend()
    if backend not in _PROBE_OK:
        path = None if mode == 'fresh' else _probe_verdict_path(backend)
        # Only a persisted PASS is trusted: a '0' could be one transient
        # device/runtime hiccup during a past probe, and trusting it would
        # pin every future process to the slow host-f64 path until the
        # cache dir is manually cleared. A failing backend re-probes per
        # process (cheap on CPU, and on TPU a failure is transient anyway).
        verdict = None
        if path is not None:
            try:
                if path.is_file() and path.read_text().strip() == '1':
                    verdict = True
            except OSError:
                verdict = None      # vanished/unreadable: just re-probe
        if verdict is not None:
            _PROBE_OK[backend] = verdict
        else:
            _PROBE_OK[backend] = _run_df64_probe()
            if path is not None and _PROBE_OK[backend]:
                try:
                    # atomic: a concurrent reader must never see a partial
                    # file and misread the verdict
                    tmp = path.with_suffix(f'.tmp{os.getpid()}')
                    tmp.write_text('1')
                    os.replace(tmp, path)
                except OSError:
                    pass
        if not _PROBE_OK[backend]:
            from raider_tpu.logger import logger
            logger.warning(
                'df64 cancellation probe FAILED on backend %r: the compiler '
                'is rewriting error-free float32 transforms. Falling back to '
                'host-f64 ray geometry (slower, same results).', backend)
    return _PROBE_OK[backend]


def _default_ref_algo() -> str:
    """'ref' (reference iterates on the H(s) polynomial surrogate, ~8x
    fewer geometry flops) on accelerator backends; 'ref_exact' (df64
    Vermeille at every iterate) on CPU, where XLA:CPU's fast-math rewrites
    degrade the fit's df64 node combination to ~0.3 m heights while the
    per-iterate Vermeille fusion shapes survive (module doc; measured r2:
    fit error 2e-4 m on v5e vs 0.3 m on XLA:CPU)."""
    return 'ref' if jax.default_backend() != 'cpu' else 'ref_exact'


def _gather_window(times_f32, t_hi):
    """Window index for query times (f32 hi part is plenty: windows are
    seconds apart)."""
    idx = jnp.searchsorted(times_f32, t_hi, side='right') - 1
    return jnp.clip(idx - 1, 0, times_f32.shape[0] - 4)


def _eval_pos_vel_acc(times_f32, t_c, coeffs, t: DF):
    """Evaluate position/velocity/acceleration polynomials at df64 times.

    Coefficient rows are fetched in COLUMN-major (48, N) layout: gathering
    (N, 8, 3, 2) rows and slicing per-coefficient makes every Horner term a
    stride-48 read over the whole gathered array, which measured 80 ms per
    Newton iteration on v5e for 262k rays; transposing the (nw, 48) table
    first and gathering along axis 1 gives contiguous (N,) coefficient
    slices and the identical values at 2.5 ms/iteration (32x). A one-hot
    MXU matmul fetch is faster still (0.5 ms) but is NOT used: TPU matmul
    default precision accumulates in bf16 and corrupts the coefficients.
    """
    nw = t_c.shape[0]
    coeffsT = coeffs.reshape(nw, 48).T                 # (48, nw)
    t_cT = t_c.T                                       # (2, nw)
    w = _gather_window(times_f32, t.hi)
    tc2 = jnp.take(t_cT, w, axis=1)                    # (2, ...batch)
    r4 = jnp.take(coeffsT, w, axis=1).reshape((8, 3, 2) + w.shape)
    tau = df64.sub(t, DF(tc2[0], tc2[1]))

    def c(k, comp):
        return DF(r4[k, comp, 0], r4[k, comp, 1])

    # acceleration only shapes the Newton SLOPE fp (convergence rate, never
    # the root fn(t*) = 0), so its Horner runs in plain f32 - a third of the
    # df64 Horner work for free
    tau_f = tau.hi
    pos, vel, acc = [], [], []
    for comp in range(3):
        # Horner for p, p' (df64) and p'' (f32) simultaneously
        p = c(7, comp)
        d1 = df64.df(jnp.zeros_like(t.hi))
        d2_ = jnp.zeros_like(t.hi)
        for k in range(6, -1, -1):
            d2_ = d2_ * tau_f + 2.0 * d1.hi
            d1 = df64.add(df64.mul(d1, tau), p)
            p = df64.add(df64.mul(p, tau), c(k, comp))
        pos.append(p)
        vel.append(d1)
        acc.append(d2_)
    return pos, vel, acc


@partial(jax.jit, static_argnames=('maxiter',))
def _geo2rdr_df_impl(times_f32, t_c, coeffs, targ_hi, targ_lo, t_init, maxiter: int):
    targ = [DF(targ_hi[..., i], targ_lo[..., i]) for i in range(3)]
    t = DF(t_init, jnp.zeros_like(t_init))

    def body(_, t_pair):
        t = DF(*t_pair)
        pos, vel, acc = _eval_pos_vel_acc(times_f32, t_c, coeffs, t)
        dr = [df64.sub(pos[i], targ[i]) for i in range(3)]
        fn = df64.dot3(*vel, *dr)
        # slope fp in f32: only the root fn(t*) = 0 defines the answer
        vv = vel[0].hi ** 2 + vel[1].hi ** 2 + vel[2].hi ** 2
        fa = acc[0] * dr[0].hi + acc[1] * dr[1].hi + acc[2] * dr[2].hi
        fp = fa + vv
        t2 = df64.sub(t, df64.div(fn, df64.df(fp)))
        return (t2.hi, t2.lo)

    t_hi, t_lo = jax.lax.fori_loop(0, maxiter, body, (t.hi, t.lo))
    # roots outside the statevector span are edge-polynomial extrapolations,
    # not solutions: NaN them like the host geo2rdr / the reference's ISCE3
    # (losreader.py:252-254). NaN poisons the whole ray downstream (look
    # vector, chain Newton, delay) exactly like the host path.
    oob = (t_hi < times_f32[0]) | (t_hi > times_f32[-1])
    t_hi = jnp.where(oob, jnp.nan, t_hi)
    t = DF(t_hi, t_lo)
    pos, vel, _ = _eval_pos_vel_acc(times_f32, t_c, coeffs, t)
    dr = [df64.sub(pos[i], targ[i]) for i in range(3)]
    sr = df64.norm3(*dr)
    return (t.hi, t.lo,
            jnp.stack([p.hi for p in pos], -1), jnp.stack([p.lo for p in pos], -1),
            sr.hi, sr.lo)


def geo2rdr_device(poly: OrbitPoly, targ_xyz_f64: np.ndarray, maxiter: int = 15):
    """Zero-Doppler solve on device in df64.

    Args:
        targ_xyz_f64: (..., 3) float64 target ECEF (host), shipped as pairs.

    Returns (aztime DF, sat_pos (hi, lo) arrays (..., 3), slant_range DF).
    """
    targ = np.asarray(targ_xyz_f64, dtype=np.float64)
    hi, lo = split_f64(targ)
    t_mid = np.float32(0.5 * (poly.times[0] + poly.times[-1]))
    t_init = jnp.full(targ.shape[:-1], t_mid, dtype=jnp.float32)
    out = _geo2rdr_df_impl(
        jnp.asarray(poly.times, jnp.float32),
        poly.t_c, poly.coeffs, jnp.asarray(hi), jnp.asarray(lo), t_init,
        maxiter=maxiter,
    )
    t_hi, t_lo, p_hi, p_lo, sr_hi, sr_lo = out
    return DF(t_hi, t_lo), (p_hi, p_lo), DF(sr_hi, sr_lo)


# ------------------------------------------------------------------- heights

_E2 = float(WGS84_E2)
_E4 = _E2 * _E2
_A2 = float(WGS84_A) ** 2


@jax.jit
def _z_levels_vermeille(pts):
    """df64 Vermeille height of each (L+1, N, 3, 2) chain point.

    Module-level (jitted once) so every slice shares one trace/executable.
    """
    def z_of(q):
        hz = height_df(DF(q[:, 0, 0], q[:, 0, 1]),
                       DF(q[:, 1, 0], q[:, 1, 1]),
                       DF(q[:, 2, 0], q[:, 2, 1]))
        return hz.hi + hz.lo
    return jax.vmap(z_of)(pts)


def height_df(x: DF, y: DF, z: DF) -> DF:
    """Height above the WGS84 ellipsoid, df64 (Vermeille, height output only).

    Matches the f64 closed form (geodesy.ellipsoid.ecef2lla's height) to
    sub-0.1 mm over the troposphere range.
    """
    xy2 = df64.add(df64.sqr(x), df64.sqr(y))
    z2 = df64.sqr(z)
    # exact df64 constants (f32-rounded constants would inject 1e-8 errors
    # that amplify to ~0.1 m through the k + e^2 - 1 cancellation)
    inv_a2 = df64.const(1.0 / _A2)
    e2_c = df64.const(_E2)
    e4_c = df64.const(_E4)
    one = df64.const(1.0)

    p = df64.mul(xy2, inv_a2)
    q = df64.mul(df64.mul(z2, inv_a2), df64.const(1.0 - _E2))
    # r = (p + q - e4) / 6
    r = df64.mul(df64.sub(df64.add(p, q), e4_c), df64.const(1.0 / 6.0))

    # s = e4 p q / (4 r^3)
    r3 = df64.mul(df64.sqr(r), r)
    s = df64.div(df64.mul(df64.mul(p, q), e4_c), df64.scale(r3, 4.0))
    # t = cbrt(1 + s + sqrt(s (2 + s)))
    inner = df64.sqrt(df64.mul(s, df64.add(df64.const(2.0), s)))
    t = df64.cbrt(df64.add(df64.add(one, s), inner))
    # u = r (1 + t + 1/t)
    u = df64.mul(r, df64.add(df64.add(one, t), df64.div(one, t)))
    # v = sqrt(u^2 + e4 q)
    v = df64.sqrt(df64.add(df64.sqr(u), df64.mul(q, e4_c)))
    # w = e2 (u + v - q) / (2 v)
    w = df64.div(df64.mul(df64.sub(df64.add(u, v), q), e2_c), df64.scale(v, 2.0))
    # k = sqrt(u + v + w^2) - w
    k = df64.sub(df64.sqrt(df64.add(df64.add(u, v), df64.sqr(w))), w)
    # D = k sqrt(xy2) / (k + e2)
    big_d = df64.div(df64.mul(k, df64.sqrt(xy2)), df64.add(k, e2_c))
    # h = (k + e2 - 1)/k * sqrt(D^2 + z^2)
    hyp = df64.sqrt(df64.add(df64.sqr(big_d), z2))
    num = df64.add(k, df64.const(_E2 - 1.0))
    return df64.mul(df64.div(num, k), hyp)


@partial(jax.jit, static_argnames=('max_iter',))
def _toa_newton_s(pos_hi, pos_lo, look, heights_f32, factor, max_iter: int):
    """Line-parametrized batched ray/height-level Newton (reference scheme).

    Every iterate of the reference's getTopOfAtmosphere Newton lies on the
    ray line p(s) = pos + s*look (losreader.py:706-733 adds multiples of the
    look vector), so the solve tracks ONE df64 scalar s per (level, ray)
    instead of a 3-D point: same iterates, a third of the df64 state, and
    segment lengths become exact scalar differences s[k+1]-s[k] (|look| is
    f32-unit, off 1 by <2e-7, i.e. <1e-4 delay-mm over a 4 km segment).

    The ellipsoidal height of the FINAL point is also returned for free:
    after the last update s3 = s2 + delta2, height(p(s3)) = height(p(s2))
    + delta2 * (n.look) + O(delta2^2 / Re), with height(p(s2)) the last
    Newton evaluation and n the (f32) ellipsoid normal at p(s2). The
    reference leaves delta2 up to ~meters at grazing incidence, so the
    quadratic term is < 1e-6 m - replacing the fourth per-boundary df64
    Vermeille evaluation the old chain spent on recovering final heights.

    Returns (s_hi, s_lo, z_est), each (L, N).
    """
    px0 = DF(pos_hi[:, 0], pos_lo[:, 0])
    py0 = DF(pos_hi[:, 1], pos_lo[:, 1])
    pz0 = DF(pos_hi[:, 2], pos_lo[:, 2])
    lx, ly, lz = look[:, 0], look[:, 1], look[:, 2]
    ia2 = np.float32(1.0 / _A2)
    ib2 = np.float32(1.0 / (_A2 * (1.0 - _E2)))

    def one_height(h):
        s = df64.df(jnp.full_like(lx, h))   # reference guess: pos + h*look
        z_est = None
        for it in range(max_iter):
            px = df64.add(px0, df64.mul(s, df64.df(lx)))
            py = df64.add(py0, df64.mul(s, df64.df(ly)))
            pz = df64.add(pz0, df64.mul(s, df64.df(lz)))
            hh = height_df(px, py, pz)
            delta = ((h - hh.hi) - hh.lo) / factor
            if it == max_iter - 1:
                gx = px.hi * ia2
                gy = py.hi * ia2
                gz = pz.hi * ib2
                gn = jnp.sqrt(gx * gx + gy * gy + gz * gz)
                cosn = (gx * lx + gy * ly + gz * lz) / gn
                z_est = (hh.hi + hh.lo) + delta * cosn
            s = df64.add(s, df64.df(delta))
        return s.hi, s.lo, z_est

    return jax.vmap(one_height)(heights_f32)


def _boundary_xyz(pos_hi, pos_lo, look, s_hi, s_lo):
    """df64 boundary points p(s) = pos + s*look: 6 x (L, N) f32 (hi + lo).

    The hi parts alone (~0.5 m/ulp at earth radius) feed the f32 CRS
    transforms; the lo parts let the df64 origin-relative transform
    (:func:`_stereo_rel_from_df`) keep sub-cm horizontal positions.
    """
    def one(level_s_hi, level_s_lo):
        s = DF(level_s_hi, level_s_lo)
        hi, lo = [], []
        for i in range(3):
            c = df64.add(DF(pos_hi[:, i], pos_lo[:, i]),
                         df64.mul(s, df64.df(look[:, i])))
            hi.append(c.hi)
            lo.append(c.lo)
        return (*hi, *lo)

    return jax.vmap(one)(s_hi, s_lo)


# ------------------------------------------- H(s) polynomial surrogate (ref)

# Degree-5 per-ray Chebyshev fit of height-along-ray: H is analytic with
# curvature scale Re, so over a <=45 km ray the degree-5 interpolation error
# is O(rad^6 / Re^5) < 1e-7 m - far below the df64 Vermeille noise floor.
# Coefficients live in the CHEBYSHEV basis: the analysis matrix entries are
# bounded by 2/K, so node noise is NOT amplified (the monomial inverse
# Vandermonde amplifies it ~8x - measured 8e-4 m vs 2e-4 m fit error on v5e).
_POLY_K = 6
_POLY_THETA = (2.0 * np.arange(_POLY_K) + 1.0) * np.pi / (2.0 * _POLY_K)
_POLY_NODES = np.cos(_POLY_THETA)
# maps H at the K canonical nodes -> Chebyshev coefficients c_0..c_{K-1}
_POLY_FIT = np.stack([
    (1.0 if k == 0 else 2.0) / _POLY_K * np.cos(k * _POLY_THETA)
    for k in range(_POLY_K)
])


def _fit_height_poly(tx: DF, ty: DF, tz: DF, look, mid, inv_rad):
    """Per-ray polynomial surrogate for height-along-ray H(s).

    The reference Newton chain evaluates the exact ellipsoidal height at
    every (level x iteration) - ~160 df64 Vermeille closed forms per ray.
    H(s) along one straight ray is a single smooth 1-D function, so it is
    fitted ONCE per ray: K exact df64 Vermeille evaluations at Chebyshev
    nodes of u = (s - mid) * inv_rad, then the static inverse Vandermonde
    gives monomial coefficients. Every Newton iterate then costs a handful
    of flops (see _toa_newton_poly) instead of a Vermeille evaluation.

    Precision split: c0/c1 stay df64 (they carry the O(26 km) height scale
    through the catastrophic h - H(s) cancellation; T0 = 1 and T1 = u, so
    they ARE the linear part); c2+ collapse to f32 (the non-linear part of
    H is O(60 m) - earth curvature over the fit span - so f32 keeps it to
    ~1e-5 m). The s<->u map is DEFINED by the f32 pair (mid, inv_rad):
    nodes are placed at mid + u_j / inv_rad with the division done in df64,
    so fit and evaluation see bit-consistent u.

    Returns (c0 DF, c1 DF, tail: list of K-2 f32 Chebyshev coefficients).
    """
    rad = df64.div(df64.const(1.0), df64.df(inv_rad))
    mid_df = df64.df(mid)
    hs = []
    for j in range(_POLY_K):
        sj = df64.add(mid_df, df64.mul(df64.const(float(_POLY_NODES[j])), rad))
        px = df64.add(tx, df64.mul(sj, df64.df(look[:, 0])))
        py = df64.add(ty, df64.mul(sj, df64.df(look[:, 1])))
        pz = df64.add(tz, df64.mul(sj, df64.df(look[:, 2])))
        hs.append(height_df(px, py, pz))
    cs = []
    for k in range(_POLY_K):
        acc = None
        for j in range(_POLY_K):
            t = df64.mul(hs[j], df64.const(float(_POLY_FIT[k, j])))
            acc = t if acc is None else df64.add(acc, t)
        cs.append(acc)
    tail = [c.hi + c.lo for c in cs[2:]]
    return cs[0], cs[1], tail


def _toa_newton_poly(c0: DF, c1: DF, tail, mid, inv_rad,
                     heights_f32, factor, max_iter: int):
    """Reference-scheme Newton chain on the polynomial surrogate.

    Same iterates as :func:`_toa_newton_s` (initial guess s = h, frozen
    ``factor`` slope, fixed iteration counts - reference
    losreader.py:706-733) with H(s) from the per-ray fit: the surrogate
    tracks the exact height to <1e-6 m, so the (not-fully-converged)
    reference iterates are reproduced to the same level - ~1e-8 m of delay.

    The final height comes for free like in _toa_newton_s: after the last
    update s' = s + delta, H(s') = H(s) + delta * dH/ds + O(delta^2 / Re),
    with dH/ds the surrogate derivative (exactly the n.look cosine).

    Returns (s_hi, s_lo, z_est), each (L, N).
    """
    mid_df = df64.df(mid)
    ir_df = df64.df(inv_rad)

    def tail_eval(uh, with_slope: bool):
        """f32 Chebyshev tail sum_{k>=2} c_k T_k(u) (and its u-derivative
        sum c_k k U_{k-1} when requested) via the three-term recurrences."""
        two_u = 2.0 * uh
        t_prev, t_cur = uh, two_u * uh - 1.0          # T1, T2
        u_prev, u_cur = 1.0, two_u                    # U0, U1
        t = tail[0] * t_cur
        dt = 2.0 * tail[0] * u_cur if with_slope else None
        for k, c in enumerate(tail[1:], start=3):
            t_prev, t_cur = t_cur, two_u * t_cur - t_prev
            t = t + c * t_cur
            if with_slope:
                u_prev, u_cur = u_cur, two_u * u_cur - u_prev
                dt = dt + (1.0 * k) * c * u_cur
        return t, dt

    def one_height(h):
        s = df64.df(jnp.full_like(mid, h))
        z_est = None
        for it in range(max_iter):
            u = df64.mul(df64.sub(s, mid_df), ir_df)
            lin = df64.add(c0, df64.mul(c1, u))
            last = it == max_iter - 1
            t, dt = tail_eval(u.hi, with_slope=last)
            delta = (((h - lin.hi) - lin.lo) - t) / factor
            if last:
                slope = (c1.hi + dt) * inv_rad
                z_est = (lin.hi + lin.lo + t) + delta * slope
            s = df64.add(s, df64.df(delta))
        return s.hi, s.lo, z_est

    return jax.vmap(one_height)(heights_f32)


@partial(jax.jit, static_argnames=('max_iter',))
def _toa_newton_df(pos_hi, pos_lo, look, heights_f32, factor, max_iter: int):
    """Batched ray/height-level intersections in df64.

    pos_hi/lo: (N, 3) start positions; look: (N, 3) f32 unit vectors;
    heights_f32: (L,) target heights; factor: (N,) cos factor (1.0 first).
    Returns (L, N, 3, 2) intersection hi/lo.
    """
    def one_height(h):
        # initial guess: pos + h * look
        p = [df64.add(DF(pos_hi[:, i], pos_lo[:, i]),
                      df64.df(h * look[:, i])) for i in range(3)]
        for _ in range(max_iter):
            hh = height_df(p[0], p[1], p[2])
            delta = (h - hh.hi - hh.lo) / factor
            p = [df64.add(p[i], df64.df(delta * look[:, i])) for i in range(3)]
        return jnp.stack(
            [jnp.stack([p[i].hi for i in range(3)], -1),
             jnp.stack([p[i].lo for i in range(3)], -1)], -1)  # (N, 3, 2)

    return jax.vmap(one_height)(heights_f32)


def build_ray_device(heights_chain: np.ndarray, xyz_f64: np.ndarray, look_f32):
    """Device version of geometry.rays.build_ray for a precomputed height
    chain: returns (ray_lengths (L, N) f32, pts (L+1, N, 3, 2) df64 pairs).
    """
    xyz = np.asarray(xyz_f64, dtype=np.float64).reshape(-1, 3)
    hi, lo = (jnp.asarray(v) for v in split_f64(xyz))
    look = jnp.asarray(np.asarray(look_f32, dtype=np.float32).reshape(-1, 3))
    n = xyz.shape[0]

    h01 = jnp.asarray(np.asarray(heights_chain[:2], dtype=np.float32))
    ones = jnp.ones(n, jnp.float32)
    p01 = _toa_newton_df(hi, lo, look, h01, ones, 10)  # (2, N, 3, 2)

    seg0 = _seg_length(p01[0], p01[1])
    cos_factor = (np.float32(heights_chain[1] - heights_chain[0]) / seg0)

    if heights_chain.size > 2:
        rest = _toa_newton_df(
            hi, lo, look,
            jnp.asarray(np.asarray(heights_chain[2:], dtype=np.float32)),
            cos_factor, 3,
        )
        pts = jnp.concatenate([p01, rest], axis=0)
    else:
        pts = p01

    lengths = jax.vmap(_seg_length)(pts[:-1], pts[1:])
    return lengths, pts


@jax.jit
def _seg_length(a, b):
    """|b - a| in df64 for (N, 3, 2) endpoint pairs -> (N,) f32."""
    d = [df64.sub(DF(b[:, i, 0], b[:, i, 1]), DF(a[:, i, 0], a[:, i, 1]))
         for i in range(3)]
    return df64.norm3(*d).hi


# ------------------------------------------------- full slice pipeline (TPU)

def look_vectors_device(poly: OrbitPoly, xyz_f64: np.ndarray):
    """Unit look vectors (target -> sensor) on device, f32.

    Precision: direction error ~1e-7 rad rotates sample points along-ray by
    millimeters over 26 km; the level-intersection Newton pins the z
    coordinate to the target height regardless, and ray LENGTHS are formed
    in df64 from the Newton endpoints, so f32 directions are delay-safe.
    """
    _, (p_hi, p_lo), sr = geo2rdr_device(poly, xyz_f64)
    targ = np.asarray(xyz_f64, dtype=np.float64).reshape(-1, 3)
    t_hi, t_lo = (jnp.asarray(v) for v in split_f64(targ))
    return _look_from_sat(p_hi.reshape(-1, 3), p_lo.reshape(-1, 3),
                          t_hi, t_lo, sr.hi.reshape(-1))


@jax.jit
def _look_from_sat(p_hi, p_lo, t_hi, t_lo, sr):
    comps = []
    for i in range(3):
        d = df64.sub(DF(p_hi[:, i], p_lo[:, i]), DF(t_hi[:, i], t_lo[:, i]))
        comps.append((d.hi + d.lo) / sr)
    return jnp.stack(comps, axis=-1)


def _crs_df_mode(crs):
    """Which df64 origin-relative CRS transform covers this projection.

    'stereo': polar stereographic (HRRR-Alaska: NCEP sphere, reference
    models/hrrr.py:22-25) — fully algebraic on a sphere datum (the
    conformal factor degenerates to 1); the ellipsoidal factor rides the
    df64 exp/log added in ops/df64.
    'lcc': Lambert conformal conic (HRRR CONUS, reference hrrr.py:18-21;
    WRF) — t^n = exp(n ln t) and sin/cos(n dlon) via the df64
    transcendentals.
    'tm': transverse Mercator / UTM (user AOI grids) — the full Krueger
    series in df64 (_tm_rel_from_df).
    Geographic grids take the separate _geo_rel_from_df path (dispatched
    on is_geo in _finish_slice, not through this function).
    """
    from raider_tpu.geodesy.crs import (LambertConformalConic,
                                        PolarStereographic,
                                        TransverseMercator)

    if isinstance(crs, PolarStereographic):
        return 'stereo'
    if isinstance(crs, LambertConformalConic):
        return 'lcc'
    if isinstance(crs, TransverseMercator):
        return 'tm'
    return None


def _stereo_df_supported(crs) -> bool:
    """Back-compat shim: True when the stereo df64 path applies."""
    return _crs_df_mode(crs) == 'stereo'


def _geodetic_trig_df(x: DF, y: DF, z: DF, h_f32):
    """(sin phi, cos phi, p) of the WGS84 geodetic latitude, df64.

    Uses the point's KNOWN geodetic height (the chain Newton pinned the
    boundary point to ``h_f32``), which turns ecef2lla's hard part into a
    fast fixed point: z = (N(1-e2) + h) sin(phi) and p = (N + h) cos(phi)
    hold exactly, so sin(phi) = z / (N(1-e2) + h) contracts at ~e2/2 per
    sweep. Three f32 sweeps from the geocentric seed land at the f32 noise
    floor (~1e-7); two df64 polish sweeps reach ~1e-11 rad (~1e-4 m).
    cos phi = p / (N + h) is exact algebra (no sqrt cancellation near the
    equator), so precision is set by df64, not by f32 trig.
    """
    p2 = df64.add(df64.sqr(x), df64.sqr(y))
    p = df64.sqrt(p2)
    r_hi = jnp.sqrt(p2.hi + z.hi * z.hi)
    a_c = df64.const(float(WGS84_A))
    e2_c = df64.const(_E2)
    one = df64.const(1.0)
    one_m_e2 = df64.const(1.0 - _E2)
    h_df = df64.df(h_f32)
    # f32 sweeps (cheap): geocentric seed -> ~1e-7 rad
    a32 = np.float32(float(WGS84_A))
    e2_32 = np.float32(_E2)
    me2_32 = np.float32(1.0 - _E2)
    s32 = z.hi / r_hi
    for _ in range(3):
        n32 = a32 / jnp.sqrt(1.0 - e2_32 * s32 * s32)
        s32 = z.hi / (n32 * me2_32 + h_f32)
    # df64 polish: contraction ~5e-3 per sweep
    s = df64.df(s32)
    for _ in range(2):
        nn = df64.div(a_c, df64.sqrt(
            df64.sub(one, df64.mul(e2_c, df64.sqr(s)))))
        s = df64.div(z, df64.add(df64.mul(nn, one_m_e2), h_df))
    nn = df64.div(a_c, df64.sqrt(
        df64.sub(one, df64.mul(e2_c, df64.sqr(s)))))
    cosphi = df64.div(p, df64.add(nn, h_df))
    return s, cosphi, p


def _conformal_t_df(s: DF, cosphi: DF, e_proj: float) -> DF:
    """Snyder 15-9 t(phi) in df64 from (sin phi, cos phi).

    tan(pi/4 - phi/2) = cos(phi)/(1 + sin(phi)) is algebraic; the
    ellipsoidal factor ((1 - e s)/(1 + e s))^(e/2) rides df64 exp/log
    (identical to crs._conformal_t's f32 form, e_proj = the PROJECTION
    datum's eccentricity — 0 for the NCEP sphere, where it's skipped).
    """
    one = df64.const(1.0)
    t = df64.div(cosphi, df64.add(one, s))
    if e_proj == 0.0:
        return t
    es = df64.mul(df64.const(e_proj), s)
    # / ((1-es)/(1+es))^(e/2)  ==  * exp((e/2) (ln(1+es) - ln(1-es)))
    expo = df64.mul(df64.const(0.5 * e_proj),
                    df64.sub(df64.log(df64.add(one, es)),
                             df64.log(df64.sub(one, es))))
    return df64.mul(t, df64.exp(expo))


def _stereo_rel_from_df(bx, by, bz, blx, bly, blz, z_levels, crs,
                        org_hi, org_lo):
    """Origin-relative polar-stereographic model coords from df64 ECEF.

    Snyder ch. 21 with WGS84 geodetic input latitude (matching the f32
    chain: ecef2lla -> crs.forward), evaluated entirely in df64 and
    collapsed to f32 only AFTER subtracting the grid origin:
    x - x_org = aF * t * sin(lam - lam0) + (x_0 - x_org), with
    sin(lam - lam0) = (y cos(lam0) - x sin(lam0)) / p algebraic in ECEF —
    the absolute-coordinate and absolute-longitude f32 ulps (~0.25-1.7 m
    at the Alaska antimeridian) never enter. On a sphere datum (HRRR-AK)
    the whole transform is trig-free; the ellipsoidal conformal factor
    rides df64 exp/log. ``org_hi/org_lo`` is the split-f64
    (y_org, x_org) grid origin.

    Returns (xs_rel, ys_rel) f32 arrays shaped like ``bx``.
    """
    x = DF(bx, blx)
    y = DF(by, bly)
    z = DF(bz, blz)
    south = crs.lat_0 < 0
    lon0 = -float(crs.lon_0) if south else float(crs.lon_0)
    if south:
        y = df64.neg(y)
        z = df64.neg(z)
    lam0 = float(np.deg2rad(lon0))
    sin0 = df64.const(float(np.sin(lam0)))
    cos0 = df64.const(float(np.cos(lam0)))
    s, cosphi, p = _geodetic_trig_df(x, y, z, z_levels)
    t = _conformal_t_df(s, cosphi, float(crs.ellipsoid.e))
    a_f = float(crs.ellipsoid.a) * crs._scale()
    rp = df64.div(df64.mul(df64.const(a_f), t), p)   # rho / p
    sin_part = df64.sub(df64.mul(y, cos0), df64.mul(x, sin0))
    cos_part = df64.add(df64.mul(x, cos0), df64.mul(y, sin0))
    xm = df64.mul(rp, sin_part)
    ym = df64.neg(df64.mul(rp, cos_part))
    if south:
        xm = df64.neg(xm)
        ym = df64.neg(ym)
    xm = df64.add(xm, df64.const(float(crs.x_0)))
    ym = df64.add(ym, df64.const(float(crs.y_0)))
    xm = df64.sub(xm, DF(org_hi[1], org_lo[1]))
    ym = df64.sub(ym, DF(org_hi[0], org_lo[0]))
    return xm.hi + xm.lo, ym.hi + ym.lo


def _tm_rel_from_df(bx, by, bz, blx, bly, blz, z_levels, crs,
                    org_hi, org_lo):
    """Origin-relative transverse-Mercator model coords, df64.

    The Krueger series (crs.TransverseMercator.forward) in df64:
    conformal latitude via t = sinh(atanh(sin phi) - e atanh(e sin phi))
    (atanh/sinh ride df64 log/exp), xi'/eta' from atan2/asinh of ECEF
    ratios (atan2 is scale-invariant, so the p-scaled sin/cos(dlon)
    parts are used directly — absolute longitude never appears), and the
    six alpha terms via sin/cos/sinh/cosh angle-addition recurrences
    from ONE df64 sincos + ONE exp. Valid over the UTM domain
    (|lat| <= ~84: the atanh(sin phi) cancellation keeps ~6e-13 rel
    there). Returns (xs_rel, ys_rel).
    """
    from raider_tpu.geodesy.crs import _tm_series

    x = DF(bx, blx)
    y = DF(by, bly)
    z = DF(bz, blz)
    ell = crs.ellipsoid
    n_flat = ell.f / (2.0 - ell.f)
    alpha, _, a_cap = _tm_series(n_flat)
    e_proj = float(ell.e)
    one = df64.const(1.0)
    half = 0.5

    s, cosphi, p = _geodetic_trig_df(x, y, z, z_levels)
    # t = sinh(atanh(s) - e atanh(e s));  atanh(u) = ln((1+u)/(1-u)) / 2
    at_s = df64.scale(df64.log(df64.div(df64.add(one, s),
                                        df64.sub(one, s))), half)
    es = df64.mul(df64.const(e_proj), s)
    at_es = df64.scale(df64.log(df64.div(df64.add(one, es),
                                         df64.sub(one, es))), half)
    w = df64.sub(at_s, df64.mul(df64.const(e_proj), at_es))
    ew = df64.exp(w)
    iew = df64.div(one, ew)
    t = df64.scale(df64.sub(ew, iew), half)               # sinh(w)

    lam0 = float(np.deg2rad(float(crs.lon_0)))
    sin0 = df64.const(float(np.sin(lam0)))
    cos0 = df64.const(float(np.cos(lam0)))
    sin_part = df64.sub(df64.mul(y, cos0), df64.mul(x, sin0))  # p sin(dlon)
    cos_part = df64.add(df64.mul(x, cos0), df64.mul(y, sin0))  # p cos(dlon)
    tp = df64.mul(t, p)
    xi_p = df64.atan2(tp, cos_part)
    # eta' = asinh(sin dlon / hypot(t, cos dlon)) — p-scaled throughout;
    # asinh(u) = sign(u) ln(|u| + sqrt(u^2 + 1))
    hyp = df64.sqrt(df64.add(df64.sqr(tp), df64.sqr(cos_part)))
    u = df64.div(sin_part, hyp)
    sign_u = jnp.where(u.hi < 0.0, -1.0, 1.0)
    au = DF(u.hi * sign_u, u.lo * sign_u)
    eta_p = df64.log(df64.add(au, df64.sqrt(df64.add(df64.sqr(au), one))))
    eta_p = DF(eta_p.hi * sign_u, eta_p.lo * sign_u)

    # Krueger terms: sin/cos(2k xi') and sinh/cosh(2k eta') by recurrence
    s2x, c2x = df64.sincos(df64.scale(xi_p, 2.0))
    e2 = df64.exp(df64.scale(eta_p, 2.0))
    ie2 = df64.div(one, e2)
    ch2 = df64.scale(df64.add(e2, ie2), half)
    sh2 = df64.scale(df64.sub(e2, ie2), half)
    sk, ck, shk, chk = s2x, c2x, sh2, ch2
    xi, eta = xi_p, eta_p
    for j in range(6):
        if j > 0:
            sk, ck = (df64.add(df64.mul(sk, c2x), df64.mul(ck, s2x)),
                      df64.sub(df64.mul(ck, c2x), df64.mul(sk, s2x)))
            shk, chk = (df64.add(df64.mul(shk, ch2), df64.mul(chk, sh2)),
                        df64.add(df64.mul(chk, ch2), df64.mul(shk, sh2)))
        a_j = df64.const(float(alpha[j]))
        xi = df64.add(xi, df64.mul(a_j, df64.mul(sk, chk)))
        eta = df64.add(eta, df64.mul(a_j, df64.mul(ck, shk)))

    k0a = float(crs.k0) * float(a_cap) * float(ell.a)
    xm = df64.mul(df64.const(k0a), eta)
    ym = df64.mul(df64.const(k0a), xi)
    y0_eff = float(crs.y_0)
    if crs.lat_0 != 0.0:
        y0_eff -= float(crs.k0) * float(a_cap) * float(ell.a) \
            * crs._xi_of_lat0()
    xm = df64.add(xm, df64.const(float(crs.x_0)))
    ym = df64.add(ym, df64.const(y0_eff))
    xm = df64.sub(xm, DF(org_hi[1], org_lo[1]))
    ym = df64.sub(ym, DF(org_hi[0], org_lo[0]))
    return xm.hi + xm.lo, ym.hi + ym.lo


def _geo_rel_from_df(bx, by, bz, blx, bly, blz, z_levels, org_hi, org_lo):
    """Origin-relative geographic (lon, lat in degrees) from df64 ECEF.

    Matches the host path's semantics exactly: lon = atan2(y, x) in
    (-180, 180] (numpy and df64.atan2 share the convention, so there is
    no wrap seam between the legs), lat from the known-height fixed point
    (geodetic — identical mathematical value to the host Vermeille).
    Absolute degrees collapse to f32 only AFTER the origin subtraction,
    so the representation ulp is the grid-extent's (~0.03 m at 4 deg)
    instead of the absolute longitude's (~0.85-1.7 m near +/-180).

    Returns (lon_rel_deg, lat_rel_deg) f32 arrays shaped like ``bx``.
    """
    x = DF(bx, blx)
    y = DF(by, bly)
    z = DF(bz, blz)
    s, cosphi, _p = _geodetic_trig_df(x, y, z, z_levels)
    rad2deg = df64.const(180.0 / float(np.pi))
    lat = df64.mul(df64.atan2(s, cosphi), rad2deg)
    lon = df64.mul(df64.atan2(y, x), rad2deg)
    lon = df64.sub(lon, DF(org_hi[1], org_lo[1]))
    lat = df64.sub(lat, DF(org_hi[0], org_lo[0]))
    return lon.hi + lon.lo, lat.hi + lat.lo


def _lcc_rel_from_df(bx, by, bz, blx, bly, blz, z_levels, crs,
                     org_hi, org_lo):
    """Origin-relative Lambert-conformal-conic model coords, df64.

    Snyder ch. 15 with WGS84 geodetic input latitude (matching the f32
    chain ecef2lla -> crs.forward): rho = a F t^n via df64 exp/log,
    theta = n * dlon with dlon from df64 atan2 of ECEF ratios (absolute
    longitude never appears — the wrap matches forward()'s
    mod-to-[-pi,pi) except exactly AT the cone seam dlon = +/-pi, where
    atan2 returns +pi instead of -pi; scenes on the seam meridian of
    their own weather model's cone do not occur). Collapsed to f32 only
    after subtracting the grid origin. Returns (xs_rel, ys_rel).
    """
    x = DF(bx, blx)
    y = DF(by, bly)
    z = DF(bz, blz)
    e_proj, a, n, big_f, rho0 = crs._params()
    lam0 = float(np.deg2rad(float(crs.lon_0)))
    sin0 = df64.const(float(np.sin(lam0)))
    cos0 = df64.const(float(np.cos(lam0)))
    s, cosphi, _p = _geodetic_trig_df(x, y, z, z_levels)
    t = _conformal_t_df(s, cosphi, float(e_proj))
    rho = df64.mul(df64.const(float(a * big_f)),
                   df64.exp(df64.mul(df64.const(float(n)), df64.log(t))))
    sin_part = df64.sub(df64.mul(y, cos0), df64.mul(x, sin0))  # p sin(dlon)
    cos_part = df64.add(df64.mul(x, cos0), df64.mul(y, sin0))  # p cos(dlon)
    dlon = df64.atan2(sin_part, cos_part)
    st, ct = df64.sincos(df64.mul(df64.const(float(n)), dlon))
    xm = df64.mul(rho, st)
    ym = df64.sub(df64.const(float(rho0)), df64.mul(rho, ct))
    xm = df64.add(xm, df64.const(float(crs.x_0)))
    ym = df64.add(ym, df64.const(float(crs.y_0)))
    xm = df64.sub(xm, DF(org_hi[1], org_lo[1]))
    ym = df64.sub(ym, DF(org_hi[0], org_lo[0]))
    return xm.hi + xm.lo, ym.hi + ym.lo


@partial(jax.jit, static_argnames=('crs', 'is_geo', 'hiprec'))
def _finish_slice(lengths, bx, by, bz, blx, bly, blz, z_levels,
                  org_hi, org_lo, crs, is_geo: bool, hiprec: bool = True):
    """Model-CRS kernel inputs from chain boundary points (see caller).

    ``bx/by/bz`` (+``blx/bly/blz`` lo parts): (L+1, N) ECEF df64 components
    of the boundary points. ``z_levels``: (L+1, N) the model-z coordinate of
    each boundary point — the static chain heights for the exactly-converged
    'scan'/'quad' algos, or the ACTUAL heights of the points for the
    reference-exact 'ref' algo (whose intersections, like the reference's,
    sit up to ~0.5 m off the nominal level at high incidence; sampling must
    happen where the points really are or delays drift ~1 mm from the
    reference).

    Horizontal coordinates are emitted ORIGIN-RELATIVE: ``org_hi/org_lo``
    is the split-f64 (y_org, x_org) grid origin the engine also subtracts
    from the kernel's static axes, so the kernel's f32 entry quantizes at
    the grid-extent ulp instead of the absolute-coordinate ulp.
    Every supported CRS runs the whole transform in df64
    (:func:`_geo_rel_from_df` / :func:`_stereo_rel_from_df` /
    :func:`_lcc_rel_from_df` / :func:`_tm_rel_from_df` — geo/stereo/LCC
    measured FASTER than the f32 forwards they replace, BASELINE.md
    round 5); an unrecognized CRS falls back to the f32 forward with a
    frame shift.

    Returns boundary COMPONENTS (bnd_y, bnd_x, bnd_z) of shape (L+1, N)
    plus d2 / per_level_max / hstep_max — the raytrace.integrate_rays
    contract (contiguous segments share boundaries; no low/high stacks)."""
    from raider_tpu.geodesy.ellipsoid import ecef2lla

    mode_df = ('geo' if is_geo else _crs_df_mode(crs)) if hiprec else None
    if mode_df == 'geo':
        xs_m, ys_m = _geo_rel_from_df(bx, by, bz, blx, bly, blz,
                                      z_levels, org_hi, org_lo)
    elif mode_df == 'stereo':
        xs_m, ys_m = _stereo_rel_from_df(bx, by, bz, blx, bly, blz,
                                         z_levels, crs, org_hi, org_lo)
    elif mode_df == 'lcc':
        xs_m, ys_m = _lcc_rel_from_df(bx, by, bz, blx, bly, blz,
                                      z_levels, crs, org_hi, org_lo)
    elif mode_df == 'tm':
        xs_m, ys_m = _tm_rel_from_df(bx, by, bz, blx, bly, blz,
                                     z_levels, crs, org_hi, org_lo)
    else:
        # f32 hi parts (sub-meter), f32 transform; shift after
        lat, lon, _ = ecef2lla(bx, by, bz)
        if is_geo:
            xs_m, ys_m = lon, lat
        else:
            xs_m, ys_m = crs.forward(lon, lat)
        if hiprec:
            xs_m = (xs_m - org_hi[1]) - org_lo[1]
            ys_m = (ys_m - org_hi[0]) - org_lo[0]
    z_pts = z_levels
    # NaN rays: coordinate NaNs must reach every level's coords
    bad = jnp.isnan(lengths).any(axis=0) | jnp.isnan(xs_m).any(axis=0)
    xs_m = jnp.where(bad[None, :], jnp.nan, xs_m)
    ys_m = jnp.where(bad[None, :], jnp.nan, ys_m)
    dz = z_pts[1:] - z_pts[:-1]
    d2 = jnp.maximum(lengths**2 - dz**2, 0.0)
    hstep = jnp.hypot(ys_m[1:] - ys_m[:-1], xs_m[1:] - xs_m[:-1])
    per_level_max = jnp.nanmax(lengths, axis=1)
    hstep_max = jnp.nanmax(hstep, axis=1)
    return ys_m, xs_m, z_pts, d2, per_level_max, hstep_max


def _toa_quadratic(p0_hi, p0_lo, look, ab_hi, ab_lo, heights_f32):
    """Ray/constant-height-surface intersections for ALL levels in parallel.

    Seeds with the exact df64 ray/ellipsoid(a+h, b+h) quadratic (that
    ellipsoid matches the true constant-geodetic-height surface to
    ~e^2 h^2 / 2a <= 0.4 m over the troposphere), then applies ONE Newton
    step with the analytic surface normal, landing within ~1e-8 m. Unlike
    the warm-start scan this has no sequential dependency between levels -
    one fused kernel instead of an L-step scan.

    p0:  (N, 3) df64 ray anchor ON the surface of heights[i0] (phase-1 exact)
    ab:  (L+1, 2) df64 per-level [1/(a+h)^2, 1/(b+h)^2]
    Returns pts (L+1, N, 3, 2).
    """
    x0 = DF(p0_hi[:, 0], p0_lo[:, 0])
    y0 = DF(p0_hi[:, 1], p0_lo[:, 1])
    z0 = DF(p0_hi[:, 2], p0_lo[:, 2])
    dx = df64.df(look[:, 0])
    dy = df64.df(look[:, 1])
    dz = df64.df(look[:, 2])
    # per-ray invariants
    u1 = df64.add(df64.sqr(x0), df64.sqr(y0))
    u2 = df64.sqr(z0)
    v1 = df64.add(df64.mul(x0, dx), df64.mul(y0, dy))
    v2 = df64.mul(z0, dz)
    w1 = df64.add(df64.sqr(dx), df64.sqr(dy))
    w2 = df64.sqr(dz)
    one = df64.const(1.0)

    def one_level(ab_pair, h):
        al = DF(ab_pair[0, 0], ab_pair[0, 1])
        be = DF(ab_pair[1, 0], ab_pair[1, 1])
        A = df64.add(df64.mul(al, w1), df64.mul(be, w2))
        B2 = df64.add(df64.mul(al, v1), df64.mul(be, v2))
        C = df64.sub(df64.add(df64.mul(al, u1), df64.mul(be, u2)), one)
        disc = df64.sqrt(df64.sub(df64.sqr(B2), df64.mul(A, C)))
        s = df64.div(df64.neg(C), df64.add(B2, disc))
        p = [df64.add(q, df64.mul(s, d))
             for q, d in ((x0, dx), (y0, dy), (z0, dz))]
        # one Newton step onto the TRUE constant-height surface, with the
        # analytic (f32) surface normal for the slope
        hh = height_df(p[0], p[1], p[2])
        gx = p[0].hi * al.hi
        gy = p[1].hi * al.hi
        gz = p[2].hi * be.hi
        gn = jnp.sqrt(gx * gx + gy * gy + gz * gz)
        cos = (gx * look[:, 0] + gy * look[:, 1] + gz * look[:, 2]) / gn
        delta = ((h - hh.hi) - hh.lo) / cos
        p = [df64.add(p[i], df64.df(delta * look[:, i].reshape(p[i].hi.shape)))
             for i in range(3)]
        return jnp.stack(
            [jnp.stack([c.hi for c in p], -1),
             jnp.stack([c.lo for c in p], -1)], -1)          # (N, 3, 2)

    return jax.vmap(one_level)(
        jnp.stack([ab_hi, ab_lo], axis=-1).reshape(-1, 2, 2), heights_f32)


@partial(jax.jit,
         static_argnames=('crs', 'is_geo', 'maxiter', 'algo', 'hiprec'))
def _slice_geom_fused(times_f32, t_c, coeffs, targ_hi, targ_lo, t_init,
                      heights_f32, i0, ab_hi, ab_lo, origin2, crs,
                      is_geo: bool, maxiter: int, algo: str = 'scan',
                      hiprec: bool = True):
    """The WHOLE slice geometry as one compiled program.

    Fusing geo2rdr + look vectors + the level-chain Newton + lengths +
    CRS outputs into a single jit is load-bearing on remote-attached TPUs:
    eager glue ops and per-call vmap retracing otherwise cost tens of
    seconds per slice. ``heights_f32`` is an OPERAND (only its length is
    static), so every slice of a cube reuses one executable when the
    engine pads all chains to a common length; ``i0`` indexes the first
    REAL pair of a bottom-padded chain (padding duplicates the start
    height, whose segments are zero-length), anchoring the reference's
    10-iteration/no-factor phase exactly like the unpadded host path.
    """
    # geo2rdr -> satellite position (df64) -> look vectors (f32)
    out = _geo2rdr_df_impl.__wrapped__(times_f32, t_c, coeffs,
                                       targ_hi, targ_lo, t_init, maxiter)
    t_out, _, p_hi, p_lo, sr_hi, _ = out
    look = []
    for i in range(3):
        d = df64.sub(DF(p_hi[..., i], p_lo[..., i]),
                     DF(targ_hi[..., i], targ_lo[..., i]))
        look.append((d.hi + d.lo) / sr_hi)
    look = jnp.stack(look, axis=-1)

    # phase 1: the first REAL height pair at 10 iters, no cos factor
    n = targ_hi.shape[0]
    ones = jnp.ones(n, jnp.float32)
    h01 = jax.lax.dynamic_slice_in_dim(heights_f32, i0, 2)

    if algo in ('ref', 'ref_exact'):
        # REFERENCE-EXACT intersections (the default), line-parametrized:
        # every level boundary solved from the ground point with 3 fixed
        # Newton iterations and the cos factor frozen from the first
        # interval, exactly like build_ray/getTopOfAtmosphere (reference
        # losreader.py:772-835, :706-733). The reference scheme does NOT
        # fully converge at high incidence (~0.5 m height error at thin
        # levels, ~1 mm delay); replicating it keeps device delays within
        # ~0.01 mm of the host/reference path, and sampling happens at the
        # points' ACTUAL heights (z_pts from the Newton itself). The
        # warm-start 'scan' algo below is MORE accurate (intersections
        # exact to <1 mm height) but therefore diverges from the reference
        # by up to ~1 mm delay at grazing incidence — select it with
        # RAIDER_TPU_GEOM_ALGO=scan when accuracy beats parity.
        #
        # 'ref' (default) runs the reference iterates on the per-ray H(s)
        # polynomial surrogate (<1e-6 m off the exact heights, ~8x fewer
        # geometry flops); 'ref_exact' evaluates the df64 Vermeille closed
        # form at every iterate (the ablation/debug reference for 'ref').
        if algo == 'ref':
            tx = DF(targ_hi[..., 0], targ_lo[..., 0])
            ty = DF(targ_hi[..., 1], targ_lo[..., 1])
            tz = DF(targ_hi[..., 2], targ_lo[..., 2])
            # fit DOMAIN from the f32 zenith estimate (domain choice is not
            # precision-critical; it must only CONTAIN every iterate):
            # roots live in [0, (h_top-h_bot)/cos], initial guesses at the
            # raw level heights <= h_top, phase-1/chain overshoot is <1%.
            ia2 = np.float32(1.0 / _A2)
            ib2 = np.float32(1.0 / (_A2 * (1.0 - _E2)))
            gx = targ_hi[..., 0] * ia2
            gy = targ_hi[..., 1] * ia2
            gz = targ_hi[..., 2] * ib2
            gn = jnp.sqrt(gx * gx + gy * gy + gz * gz)
            cos_est = (gx * look[:, 0] + gy * look[:, 1] + gz * look[:, 2]) / gn
            cos_est = jnp.maximum(cos_est, 0.05)
            span = heights_f32[-1] - heights_f32[0]
            hi_dom = 1.05 * jnp.maximum(span / cos_est, heights_f32[-1]) + 10.0
            lo_dom = -0.05 * hi_dom
            mid = 0.5 * (lo_dom + hi_dom)
            inv_rad = 1.0 / (0.5 * (hi_dom - lo_dom))
            c0p, c1p, tailp = _fit_height_poly(tx, ty, tz, look, mid, inv_rad)
            s01_hi, s01_lo, z01 = _toa_newton_poly(
                c0p, c1p, tailp, mid, inv_rad, h01, ones, 10)
            seg0 = df64.sub(DF(s01_hi[1], s01_lo[1]),
                            DF(s01_hi[0], s01_lo[0])).hi
            cos_factor = (h01[1] - h01[0]) / seg0
            s_hi, s_lo, z_pts = _toa_newton_poly(
                c0p, c1p, tailp, mid, inv_rad, heights_f32, cos_factor, 3)
        else:
            s01_hi, s01_lo, z01 = _toa_newton_s.__wrapped__(
                targ_hi, targ_lo, look, h01, ones, 10)
            seg0 = df64.sub(DF(s01_hi[1], s01_lo[1]),
                            DF(s01_hi[0], s01_lo[0])).hi
            cos_factor = (h01[1] - h01[0]) / seg0
            s_hi, s_lo, z_pts = _toa_newton_s.__wrapped__(
                targ_hi, targ_lo, look, heights_f32, cos_factor, 3)
        # splice the exact 10-iteration phase-1 pair back in (for unpadded
        # chains this reproduces the host path at the first two levels)
        s_hi = jax.lax.dynamic_update_slice_in_dim(s_hi, s01_hi, i0, axis=0)
        s_lo = jax.lax.dynamic_update_slice_in_dim(s_lo, s01_lo, i0, axis=0)
        z_pts = jax.lax.dynamic_update_slice_in_dim(z_pts, z01, i0, axis=0)
        d = df64.sub(DF(s_hi[1:], s_lo[1:]), DF(s_hi[:-1], s_lo[:-1]))
        lengths = d.hi
        bx, by, bz, blx, bly, blz = _boundary_xyz(
            targ_hi, targ_lo, look, s_hi, s_lo)
        # pad levels (below the first real pair) are NOT part of the
        # reference's chain: force their contribution to exactly zero
        lvl_idx = jnp.arange(lengths.shape[0], dtype=jnp.int32)[:, None]
        lengths = jnp.where(lvl_idx < i0, 0.0, lengths)
        bnd_y, bnd_x, bnd_z, d2, per_level_max, hstep_max = \
            _finish_slice.__wrapped__(lengths, bx, by, bz, blx, bly, blz,
                                      z_pts, origin2[:, 0], origin2[:, 1],
                                      crs=crs, is_geo=is_geo, hiprec=hiprec)
        return bnd_y, bnd_x, bnd_z, d2, lengths, per_level_max, hstep_max, t_out

    p01 = _toa_newton_df.__wrapped__(targ_hi, targ_lo, look, h01, ones, 10)
    seg0 = _seg_length.__wrapped__(p01[0], p01[1])
    cos_factor = (h01[1] - h01[0]) / seg0

    # phase 2: WARM-START chain scan - each level's intersection starts from
    # the previous one (guess error ~cm from earth curvature vs ~km for the
    # reference's pos + h*look guess), so ONE Vermeille eval per level
    # converges to sub-0.01mm where the reference needs 3. This is the hot
    # loop: 1 df64 height eval per (level x ray).
    def step(carry, h_pair):
        pt_hi, pt_lo, cosf = carry
        h_prev, h_k = h_pair
        dh = h_k - h_prev
        stepv = (dh / cosf)[:, None] * look
        g = [df64.add(DF(pt_hi[:, i], pt_lo[:, i]), df64.df(stepv[:, i]))
             for i in range(3)]
        hh = height_df(g[0], g[1], g[2])
        delta = ((h_k - hh.hi) - hh.lo) / cosf
        p_new = [df64.add(g[i], df64.df(delta * look[:, i])) for i in range(3)]
        d = [df64.sub(p_new[i], DF(pt_hi[:, i], pt_lo[:, i])) for i in range(3)]
        seg = df64.norm3(*d).hi
        cosf = jnp.where(jnp.abs(dh) > 1e-3, dh / seg, cosf)
        new_hi = jnp.stack([p.hi for p in p_new], -1)
        new_lo = jnp.stack([p.lo for p in p_new], -1)
        out = jnp.stack([new_hi, new_lo], -1)          # (N, 3, 2)
        return (new_hi, new_lo, cosf), out

    if algo == 'quad':
        pts = _toa_quadratic(p01[0, :, :, 0], p01[0, :, :, 1], look,
                             ab_hi, ab_lo, heights_f32)   # (L+1, N, 3, 2)
    else:
        init = (p01[0, :, :, 0], p01[0, :, :, 1], cos_factor)
        h_pairs = (heights_f32[:-1], heights_f32[1:])
        # unroll: per-step launch overhead dominates on remote backends;
        # a fully unrolled chain fuses into a few large kernels
        _, chain = jax.lax.scan(step, init, h_pairs, unroll=8)  # (L, N, 3, 2)
        pts = jnp.concatenate([p01[:1], chain], axis=0)  # (L+1, N, 3, 2)
    # splice the exact 10-iteration phase-1 pair back in (for unpadded
    # chains this reproduces the host path at the first two levels)
    pts = jax.lax.dynamic_update_slice_in_dim(pts, p01, i0, axis=0)
    lengths = jax.vmap(_seg_length.__wrapped__)(pts[:-1], pts[1:])
    # pad levels (below the first real pair) are NOT part of the reference's
    # chain: force their contribution to exactly zero (their Newton points
    # are only loosely converged - the target height equals the start)
    lvl_idx = jnp.arange(lengths.shape[0], dtype=jnp.int32)[:, None]
    lengths = jnp.where(lvl_idx < i0, 0.0, lengths)
    # scan/quad intersections converge onto the nominal chain heights
    z_levels = jnp.broadcast_to(heights_f32[:, None],
                                (pts.shape[0], pts.shape[1]))
    bnd_y, bnd_x, bnd_z, d2, per_level_max, hstep_max = \
        _finish_slice.__wrapped__(
            lengths, pts[..., 0, 0], pts[..., 1, 0], pts[..., 2, 0],
            pts[..., 0, 1], pts[..., 1, 1], pts[..., 2, 1],
            z_levels, origin2[:, 0], origin2[:, 1],
            crs=crs, is_geo=is_geo, hiprec=hiprec)
    return bnd_y, bnd_x, bnd_z, d2, lengths, per_level_max, hstep_max, t_out


def _ab_tables(heights_chain: np.ndarray):
    """Per-level [1/(a+h)^2, 1/(b+h)^2] df64 pairs for the quadratic seed."""
    from raider_tpu.constants import WGS84_A, WGS84_E2 as _e2

    b_ax = float(WGS84_A) * np.sqrt(1.0 - float(_e2))
    ab = np.stack([1.0 / (float(WGS84_A) + heights_chain) ** 2,
                   1.0 / (b_ax + heights_chain) ** 2], axis=-1)
    ab_hi, ab_lo = split_f64(ab)
    return ab_hi, ab_lo


def _chain_i0(heights_chain: np.ndarray) -> int:
    """Index of the first real (non-duplicate) pair of a bottom-padded chain."""
    i0 = int(np.searchsorted(heights_chain, heights_chain[0], side='right') - 1)
    return min(i0, heights_chain.size - 2)


@jax.jit
def _offset_targets(x0_hi, x0_lo, n_hi, n_lo, h_hi, h_lo):
    """targ = xyz0 + ht * n in df64 (exact geodesic relation:
    ECEF(lat, lon, h) = ECEF(lat, lon, 0) + h * surface_normal)."""
    ht = DF(h_hi, h_lo)
    out_hi, out_lo = [], []
    for i in range(3):
        q = df64.add(DF(x0_hi[:, i], x0_lo[:, i]),
                     df64.mul(DF(n_hi[:, i], n_lo[:, i]), ht))
        out_hi.append(q.hi)
        out_lo.append(q.lo)
    return jnp.stack(out_hi, -1), jnp.stack(out_lo, -1)


_GROUND_CACHE: 'dict[tuple, tuple]' = {}


def _ground_geometry(lat: np.ndarray, lon: np.ndarray):
    """Ground ECEF + surface normals as df64 device pairs, cached by grid
    CONTENT.

    Production SAR pipelines (GUNW two-epoch runs, time series over one
    frame) call tropo_delay repeatedly on the SAME pixel grid with
    different orbits/cubes; the ground geometry is orbit-independent, and
    its ~48 MB upload is seconds through a remote-TPU tunnel. Two entries
    are kept (reference + secondary grids can differ after buffering)."""
    import hashlib

    key = (lat.shape,
           hashlib.blake2b(lat.tobytes(), digest_size=16).digest(),
           hashlib.blake2b(lon.tobytes(), digest_size=16).digest())
    hit = _GROUND_CACHE.get(key)
    if hit is not None:
        return hit

    from raider_tpu.geodesy.ellipsoid import lla2ecef

    x0, y0, z0 = (np.asarray(v) for v in lla2ecef(lat, lon, np.zeros(lat.size)))
    xyz0 = np.stack([x0, y0, z0], axis=-1)
    phi, lam = np.deg2rad(lat), np.deg2rad(lon)
    nvec = np.stack([np.cos(phi) * np.cos(lam),
                     np.cos(phi) * np.sin(lam),
                     np.sin(phi)], axis=-1)

    def up(a):
        return tuple(jnp.asarray(v) for v in split_f64(a))

    out = (*up(xyz0), *up(nvec))
    while len(_GROUND_CACHE) >= 2:
        _GROUND_CACHE.pop(next(iter(_GROUND_CACHE)))
    _GROUND_CACHE[key] = out
    return out


class GeomSession:
    """Per-cube device-geometry session.

    Everything height-independent is uploaded ONCE (orbit tables, ground
    ECEF, surface normals); each height slice's targets are derived on
    device via ``xyz0 + ht * n``, so a slice costs zero host->device target
    traffic. geo2rdr warm-starts from the previous slice's converged
    azimuth times (the zero-Doppler root moves by << 1e-3 s over a few km
    of height), cutting the cold 15-iteration Newton to ``maxiter_warm``
    with identical converged roots.

    Replaces per-slice :func:`raytrace_slice_device_fused` calls in
    delay.engine._build_cube_ray (reference semantics: delay.py:219-326).
    """

    def __init__(self, orbit: Orbit, lat, lon, crs,
                 maxiter_cold: int = 15, maxiter_warm: int = 3,
                 origin=None) -> None:
        # warm=3 measured BIT-IDENTICAL to warm=5 on LEO scenes with slice
        # spacing up to 500 m (the zero-Doppler root moves << 1e-3 s per
        # slice; quadratic Newton re-converges in 2): scripts note, r2
        from raider_tpu.geodesy.crs import Geographic

        self.poly = build_orbit_poly(orbit)
        self.crs = crs
        self.is_geo = crs == Geographic()
        self.maxiter_cold = maxiter_cold
        self.maxiter_warm = maxiter_warm
        # origin-relative horizontal frame: (y_org, x_org) split to df64
        # operand pairs; None keeps the legacy absolute-frame emission
        self.hiprec = origin is not None
        o = np.zeros(2) if origin is None else np.asarray(origin, np.float64)
        o_hi = o.astype(np.float32)
        o_lo = (o - o_hi.astype(np.float64)).astype(np.float32)
        self._origin2 = jnp.asarray(np.stack([o_hi, o_lo], axis=-1))

        lat = np.asarray(lat, dtype=np.float64).ravel()
        lon = np.asarray(lon, dtype=np.float64).ravel()
        self.x_hi, self.x_lo, self.n_hi, self.n_lo = _ground_geometry(lat, lon)
        self.times_f32 = jnp.asarray(self.poly.times, jnp.float32)
        t_mid = np.float32(0.5 * (self.poly.times[0] + self.poly.times[-1]))
        self._t_cold = jnp.full(lat.size, t_mid, dtype=jnp.float32)
        self._t_prev = None

    def slice(self, ht: float, heights_chain: np.ndarray,
              cold: bool = False) -> dict:
        """Slice geometry at output height ``ht`` (same dict contract as
        :func:`raytrace_slice_device_fused`, with per_level_max/hstep_max
        left as DEVICE arrays - fetch them batched).

        ``cold=True`` forces the full cold-start geo2rdr (fresh mid-orbit
        init, ``maxiter_cold``) and does NOT advance the warm-start chain -
        for out-of-order recomputes (the engine's deferred plan validation),
        where warm-starting from a distant slice could change last-bit
        convergence."""
        import os as _os

        heights_chain = np.asarray(heights_chain, dtype=np.float64)
        ab_hi, ab_lo = _ab_tables(heights_chain)
        algo = _os.environ.get('RAIDER_TPU_GEOM_ALGO') or _default_ref_algo()
        ht = float(ht)
        h_hi = np.float32(ht)
        h_lo = np.float32(ht - np.float64(h_hi))
        targ_hi, targ_lo = _offset_targets(
            self.x_hi, self.x_lo, self.n_hi, self.n_lo,
            jnp.float32(h_hi), jnp.float32(h_lo))
        warm = self._t_prev is not None and not cold
        bnd_y, bnd_x, bnd_z, d2, lengths, per_level_max, hstep_max, t_out = \
            _slice_geom_fused(
                self.times_f32, self.poly.t_c, self.poly.coeffs,
                targ_hi, targ_lo,
                self._t_prev if warm else self._t_cold,
                jnp.asarray(heights_chain, jnp.float32),
                jnp.int32(_chain_i0(heights_chain)),
                jnp.asarray(ab_hi), jnp.asarray(ab_lo), self._origin2,
                crs=self.crs, is_geo=self.is_geo,
                maxiter=self.maxiter_warm if warm else self.maxiter_cold,
                algo=algo, hiprec=self.hiprec,
            )
        if not cold:
            self._t_prev = t_out
        return {
            'bnd_y': bnd_y, 'bnd_x': bnd_x, 'bnd_z': bnd_z,
            'd2': d2, 'ray_len': lengths,
            'per_level_max': per_level_max, 'hstep_max': hstep_max,
        }


def raytrace_slice_device_fused(poly: OrbitPoly, xyz_f64: np.ndarray,
                                heights_chain: np.ndarray, crs,
                                maxiter: int = 10):
    """One-compile-per-shape slice geometry (see `_slice_geom_fused`).

    Same contract as :func:`raytrace_slice_device`; chains of equal length
    (pad them - e.g. by repeating the bottom height, which yields
    zero-length levels that integrate to exactly zero) share an executable.
    """
    from raider_tpu.geodesy.crs import Geographic

    heights_chain = np.asarray(heights_chain, dtype=np.float64)
    targ = np.asarray(xyz_f64, dtype=np.float64).reshape(-1, 3)
    hi, lo = split_f64(targ)
    t_mid = np.float32(0.5 * (poly.times[0] + poly.times[-1]))
    t_init = jnp.full(targ.shape[0], t_mid, dtype=jnp.float32)

    import os as _os

    ab_hi, ab_lo = _ab_tables(heights_chain)
    # 'ref' replicates the reference's intersection semantics exactly
    # (parity default); 'scan' (warm-start, more accurate intersections) and
    # 'quad' remain selectable — see the algo comments in _slice_geom_fused
    algo = _os.environ.get('RAIDER_TPU_GEOM_ALGO') or _default_ref_algo()

    bnd_y, bnd_x, bnd_z, d2, lengths, per_level_max, hstep_max, _ = \
        _slice_geom_fused(
            jnp.asarray(poly.times, jnp.float32), poly.t_c, poly.coeffs,
            jnp.asarray(hi), jnp.asarray(lo), t_init,
            jnp.asarray(heights_chain, jnp.float32),
            jnp.int32(_chain_i0(heights_chain)),
            jnp.asarray(ab_hi), jnp.asarray(ab_lo),
            jnp.zeros((2, 2), jnp.float32),
            crs=crs, is_geo=crs == Geographic(), maxiter=maxiter, algo=algo,
            hiprec=False,
        )
    return {
        'bnd_y': bnd_y, 'bnd_x': bnd_x, 'bnd_z': bnd_z,
        'd2': d2, 'ray_len': lengths,
        'per_level_max': np.asarray(per_level_max, dtype=np.float64),
        'hstep_max': np.asarray(hstep_max, dtype=np.float64) * (1.0 + 1e-5) + 1e-7,
    }


def raytrace_slice_device(poly: OrbitPoly, xyz_f64: np.ndarray,
                          heights_chain: np.ndarray, crs):
    """The whole per-slice ray geometry on device: geo2rdr -> look vectors ->
    level-chain Newton (df64) -> model-CRS coordinates.

    Replaces the host-f64 path (engine._build_cube_ray steps 2-4), which is
    serial-CPU bound. Precision split: z coordinates are each point's ACTUAL
    df64 Vermeille height (the reference-exact Newton leaves points up to
    ~0.5 m off the nominal level at high incidence, and sampling must happen
    where the points are - see _finish_slice), horizontal model coordinates
    are f32 (sub-meter; grid cells are km), segment lengths and the Newton
    itself run in df64 (delay-critical).

    Returns dict with device arrays low/high (L, N, 3) [y, x, z order], d2,
    ray_len (L, N), and host (L,) per_level_max / hstep_max for the static
    sampling plan. NaN targets propagate to NaN rays like the host path.
    """
    from raider_tpu.geodesy.crs import Geographic

    heights_chain = np.asarray(heights_chain, dtype=np.float64)
    look = look_vectors_device(poly, xyz_f64)
    lengths, pts = build_ray_device(heights_chain, xyz_f64, look)

    is_geo = crs == Geographic()

    bnd_y, bnd_x, bnd_z, d2, per_level_max, hstep_max = _finish_slice(
        lengths, pts[..., 0, 0], pts[..., 1, 0], pts[..., 2, 0],
        _z_levels_vermeille(pts), crs=crs, is_geo=is_geo)
    return {
        'bnd_y': bnd_y, 'bnd_x': bnd_x, 'bnd_z': bnd_z,
        'd2': d2, 'ray_len': lengths,
        'per_level_max': np.asarray(per_level_max),
        # inflate by the f32 coordinate quantization so the grouping bound
        # stays conservative
        'hstep_max': np.asarray(hstep_max) * (1.0 + 1e-5) + 1e-7,
    }
