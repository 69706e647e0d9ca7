"""Stage-by-stage profile of the device slice-geometry kernel on the TPU.

Per docs/performance.md: identical executions can be served from a result
cache (perturb an input on device each call) and only SLOPE timings are
trustworthy (time at two iteration counts, divide the difference).

Profiles the WARM-slice configuration the production GeomSession uses
(geo2rdr maxiter=3, 'ref' line-parametrized chain: 2x10 phase-1 iters +
Lx3 chain iters), then each stage standalone.

Usage: python scripts/profile_geom.py [n_rays] [n_levels]
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NLEV = int(sys.argv[2]) if len(sys.argv) > 2 else 50


_CTR = [0]


def slope(fn, *args, iters=(2, 6)):
    """Wall-clock per call via the two-point slope method.

    A scalar is FETCHED after each loop (block_until_ready can return before
    remote completion for pure-argument programs), and the perturbation index
    is globally monotonic so no call within or across loops repeats an input
    (repeats are served from the remote result cache).
    """
    import jax.numpy as jnp

    def force(out):
        leaf = out[0] if isinstance(out, (tuple, list)) else out
        return float(jnp.sum(jnp.ravel(leaf)[:1]))

    _CTR[0] += 1
    force(fn(_CTR[0], *args))
    ts = []
    for k in iters:
        t0 = time.perf_counter()
        for _ in range(k):
            _CTR[0] += 1
            out = fn(_CTR[0], *args)
        force(out)
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (iters[1] - iters[0])


def main():
    import datetime as dt

    import jax
    import jax.numpy as jnp

    import raider_tpu  # noqa: F401
    from raider_tpu.geodesy.crs import Geographic
    from raider_tpu.geodesy.ellipsoid import lla2ecef
    from raider_tpu.geometry import device_geom as dg
    from raider_tpu.geometry.orbit import Orbit
    from raider_tpu.ops import df64
    from raider_tpu.ops.df64 import DF

    print('backend:', jax.default_backend())

    # ---- synthetic orbit + targets (bench.py's geometry scenario)
    t_ref = dt.datetime(2020, 1, 1, 12, 0, 0)
    tt = np.arange(-600.0, 601.0, 30.0)
    inc = np.deg2rad(90.0)
    r_orb = 6378137.0 + 700e3
    om = 2.0 * np.pi / 5800.0
    ang = om * tt
    pos_o = np.stack([
        r_orb * np.cos(ang),
        r_orb * np.sin(ang) * np.cos(inc),
        r_orb * np.sin(ang) * np.sin(inc),
    ], -1)
    vel_o = np.gradient(pos_o, 30.0, axis=0)
    poly = dg.build_orbit_poly(Orbit(times=tt, pos=pos_o, vel=vel_o, ref_time=t_ref))

    rng = np.random.default_rng(0)
    glon = rng.uniform(3.5, 6.0, N)
    glat = rng.uniform(18.5, 21.5, N)
    gx, gy, gz = (np.asarray(v) for v in lla2ecef(glat, glon, np.zeros(N)))
    targ = np.stack([gx, gy, gz], -1)
    hi = jnp.asarray(targ.astype(np.float32))
    lo = jnp.asarray((targ - targ.astype(np.float32).astype(np.float64)).astype(np.float32))
    t_mid = np.float32(0.5 * (poly.times[0] + poly.times[-1]))
    t_init = jnp.full(N, t_mid, jnp.float32)
    times_f32 = jnp.asarray(poly.times, jnp.float32)

    zs = -500.0 + 26500.0 * np.linspace(0.0, 1.0, NLEV) ** 1.4
    chain = np.concatenate([[0.0], zs[zs > 1.0]])
    heights_f32 = jnp.asarray(chain, jnp.float32)
    L1 = chain.size
    print(f'{N} rays, {L1} chain boundaries')

    ab_hi_np, ab_lo_np = dg._ab_tables(chain)
    ab_hi = jnp.asarray(ab_hi_np)
    ab_lo = jnp.asarray(ab_lo_np)

    # pre-built perturbed copies (perturbing per call would add an eager
    # device op and its tunnel round trip inside the timed region)
    K = 16
    los = jax.block_until_ready([lo + np.float32(i) * 1e-7 for i in range(K)])

    # warm-start azimuth times like GeomSession does after slice 0
    t_warm = jax.block_until_ready(dg._geo2rdr_df_impl(
        times_f32, poly.t_c, poly.coeffs, hi, lo, t_init, 15)[0])

    # ---- full fused slice ('ref' algo, warm config)
    def full(i):
        out = dg._slice_geom_fused(
            times_f32, poly.t_c, poly.coeffs, hi, los[i % K],
            t_warm, heights_f32, jnp.int32(0), ab_hi, ab_lo,
            jnp.zeros((2, 2), jnp.float32),
            crs=Geographic(), is_geo=True, maxiter=3, algo='ref')
        return out[3]
    t_full = slope(full)
    print(f'full fused (ref, warm): {t_full*1e3:8.1f} ms  {N/t_full/1e6:6.2f} M rays/s')

    # ---- geo2rdr alone (warm: 3 iters)
    def g2r(i):
        return dg._geo2rdr_df_impl(
            times_f32, poly.t_c, poly.coeffs, hi, los[i % K],
            t_warm, 3)[0]
    t_g2r = slope(g2r)
    print(f'geo2rdr (3 it):         {t_g2r*1e3:8.1f} ms')

    # look vectors for the standalone stages
    out = dg._geo2rdr_df_impl(times_f32, poly.t_c, poly.coeffs, hi, lo, t_init, 15)
    _, _, p_hi, p_lo, sr_hi, _ = out
    look = []
    for i in range(3):
        d = df64.sub(DF(p_hi[..., i], p_lo[..., i]), DF(hi[..., i], lo[..., i]))
        look.append((d.hi + d.lo) / sr_hi)
    look = jax.block_until_ready(jnp.stack(look, -1))

    ones = jnp.ones(N, jnp.float32)

    # ---- phase-1 (2 heights x 10 iters, line-parametrized)
    def ph1(i):
        return dg._toa_newton_s(hi, los[i % K], look,
                                heights_f32[:2], ones, 10)[0]
    t_p1 = slope(ph1)
    print(f'phase-1 s (2x10 it):    {t_p1*1e3:8.1f} ms')

    # ---- 'ref' chain: all levels x 3 iters (line-parametrized)
    def chain3(i):
        return dg._toa_newton_s(hi, los[i % K], look,
                                heights_f32, ones, 3)[0]
    t_ch = slope(chain3)
    print(f'ref chain s (Lx3 it):   {t_ch*1e3:8.1f} ms')

    s_hi, s_lo, z_pts = jax.block_until_ready(
        dg._toa_newton_s(hi, lo, look, heights_f32, ones, 3))

    # ---- boundary xyz from s
    K2 = 8
    shis = jax.block_until_ready([s_hi + np.float32(i) * 1e-4 for i in range(K2)])

    def bxyz(i):
        return dg._boundary_xyz(hi, lo, look, shis[i % K2], s_lo)
    t_bx = slope(bxyz)
    print(f'boundary xyz:           {t_bx*1e3:8.1f} ms')

    bx, by, bz, blx, bly, blz = jax.block_until_ready(
        dg._boundary_xyz(hi, lo, look, s_hi, s_lo))
    d = df64.sub(DF(s_hi[1:], s_lo[1:]), DF(s_hi[:-1], s_lo[:-1]))
    lengths = jax.block_until_ready(d.hi)
    bxs = jax.block_until_ready([bx + np.float32(i) * 1e-4 for i in range(K2)])
    org2 = jnp.zeros((2, 2), jnp.float32)

    # ---- finish_slice (ecef2lla f32 + NaN masks + plan maxima)
    def fin(i):
        return dg._finish_slice(lengths, bxs[i % K2], by, bz, blx, bly, blz,
                                z_pts, org2[:, 0], org2[:, 1],
                                crs=Geographic(), is_geo=True,
                                hiprec=False)[0]
    t_fin = slope(fin)
    print(f'finish_slice:           {t_fin*1e3:8.1f} ms')

    known = t_g2r + t_p1 + t_ch + t_bx + t_fin
    print(f'sum of stages:          {known*1e3:8.1f} ms (full = {t_full*1e3:.1f})')


if __name__ == '__main__':
    main()
