"""Measure the static brick kernel at different gather-serialization depths.

The production `_static_brick_fn` ties each group's gather indices to the
running accumulation with an optimization_barrier so only ONE materialized
brick (N x planes x 18 f32, ~0.5 GB at 1M rays) is live at a time. That
also forbids the scheduler from overlapping group k's gather with group
k-1's weight arithmetic. Depth d = barrier on the accumulation from d
groups back: d=1 is production, d=2 allows one gather in flight ahead
(second brick live), d=0 removes the barrier entirely (scheduler free to
hold all bricks).

Run on the real TPU: python scripts/barrier_ablation.py
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def build(depth: int):
    import jax
    import jax.numpy as jnp

    from raider_tpu.delay import raytrace as rt

    def make_fn(groups, planes, ys, xs, zs, z_clip):
        ys_np, xs_np, zs_np = np.asarray(ys), np.asarray(xs), np.asarray(zs)
        ny, nx = ys_np.size, xs_np.size

        @jax.jit
        def run(table2d, bnd_y, bnd_x, bnd_z, d2, ray_len, re_local):
            cdt = table2d.dtype
            n = bnd_y.shape[1]
            acc_w = jnp.zeros(n, cdt)
            acc_h = jnp.zeros(n, cdt)
            accs = []
            for za, samples in groups:
                persample = []
                ay = ax = None
                for (lv, f, wal, wav, wbl, wbv, zlo, zinv, dzo) in samples:
                    py = bnd_y[lv] + f * (bnd_y[lv + 1] - bnd_y[lv])
                    px = bnd_x[lv] + f * (bnd_x[lv + 1] - bnd_x[lv])
                    pz = bnd_z[lv] + f * (bnd_z[lv + 1] - bnd_z[lv])
                    hbar = 0.5 * (bnd_z[lv] + bnd_z[lv + 1])
                    pz = pz - f * (1.0 - f) * d2[lv] / (2.0 * (re_local + hbar))
                    if z_clip:
                        pz = jnp.clip(pz, zs_np[0], zs_np[-1])
                    bz = (pz >= zs_np[0]) & (pz <= zs_np[-1])
                    iy, fy, by = rt._locate_uniformish(ys_np, py)
                    ix, fx, bx = rt._locate_uniformish(xs_np, px)
                    fz = (pz - zlo) * zinv
                    rl = wav * ray_len[wal] + (wbv * ray_len[wbl] if wbv else 0.0)
                    persample.append((iy, ix, fy.astype(cdt), fx.astype(cdt),
                                      fz.astype(cdt), bz & by & bx,
                                      (1.0e-6 * rl).astype(cdt), dzo))
                    ay = iy if ay is None else jnp.minimum(ay, iy)
                    ax = ix if ax is None else jnp.minimum(ax, ix)
                lin = (za * ny + ay) * nx + ax
                if depth > 0 and len(accs) >= depth:
                    lin = jax.lax.optimization_barrier(
                        (lin, accs[-depth]))[0]
                brick = jnp.take(table2d, lin, axis=0)
                brick = brick.reshape(n, planes, 3, 3, 2)
                U = [[[None] * 3 for _ in range(3)] for _ in range(planes)]
                for (iy, ix, fy, fx, fz, ok, wt, dzo) in persample:
                    dyi = iy - ay
                    dxi = ix - ax
                    ok = ok & (dyi <= 1) & (dxi <= 1)
                    gy = dyi.astype(cdt) + fy
                    gx = dxi.astype(cdt) + fx
                    wte = jnp.where(ok, wt, jnp.nan)
                    wys = [jnp.maximum(0.0, 1.0 - jnp.abs(gy - k)) for k in range(3)]
                    wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(gx - k)) for k in range(3)]
                    w0 = wte * (1.0 - fz)
                    w1 = wte * fz
                    for k in range(3):
                        for l in range(3):
                            wkl = wys[k] * wxs[l]
                            for dj, wj in ((dzo, w0), (dzo + 1, w1)):
                                t = wj * wkl
                                U[dj][k][l] = (t if U[dj][k][l] is None
                                               else U[dj][k][l] + t)
                for j in range(planes):
                    for k in range(3):
                        for l in range(3):
                            if U[j][k][l] is not None:
                                acc_w = acc_w + brick[:, j, k, l, 0] * U[j][k][l]
                                acc_h = acc_h + brick[:, j, k, l, 1] * U[j][k][l]
                accs.append(acc_w)
            return acc_w, acc_h

        return run

    return make_fn


def main():
    import jax
    import jax.numpy as jnp

    import raider_tpu  # noqa: F401
    from raider_tpu.delay.raytrace import (build_group_plan, pack_cubes,
                                           static_plan_from)

    rng = np.random.default_rng(0)
    nz, ny, nx = 50, 400, 400
    n_rays = 1_000_000
    dtype = np.float32
    wet = rng.uniform(0.1, 100.0, (nz, ny, nx)).astype(dtype)
    hydro = rng.uniform(50.0, 300.0, (nz, ny, nx)).astype(dtype)
    zs = -500.0 + 26500.0 * np.linspace(0.0, 1.0, nz) ** 1.4
    ys = np.linspace(30.0, 40.0, ny)
    xs = np.linspace(-125.0, -115.0, nx)
    L = nz - 1
    zen = rng.uniform(np.deg2rad(25.0), np.deg2rad(45.0), n_rays)
    azi = rng.uniform(0.0, 2.0 * np.pi, n_rays)
    y0 = rng.uniform(32.0, 38.0, n_rays)
    x0 = rng.uniform(-123.0, -117.0, n_rays)
    dzv = zs[1:] - zs[:-1]
    deg_per_m = 1.0 / 111000.0
    max_sec = float((1.0 / np.cos(zen)).max())
    max_tan = float(np.tan(zen).max())
    per_level_max = (dzv * max_sec).astype(dtype)
    hstep_max = dzv * max_tan * deg_per_m

    from raider_tpu.delay.raytrace import _pack_bricks
    import jax.numpy as _jnp
    packed2d = _pack_bricks(_jnp.asarray(wet), _jnp.asarray(hydro), 7, 3, 3)
    # this harness's local kernel copy hardcodes the 3x3 brick layout;
    # pin the r2-era spec explicitly
    plan = build_group_plan(per_level_max, zs, hstep_max, ys, xs, zs,
                            group_max=6, planes=7, wy=3, wx=3)
    groups, planes, wy, wx = static_plan_from(plan)
    print(f'{len(groups)} groups, planes={planes}, brick {wy}x{wx}', flush=True)

    @jax.jit
    def build_rays(zen, azi, y0, x0, dzv_j, zs_j):
        dh = dzv_j[:, None] * jnp.tan(zen)[None, :]
        ystep = dh * jnp.cos(azi) * deg_per_m
        xstep = dh * jnp.sin(azi) * deg_per_m
        zero = jnp.zeros((1, zen.size), ystep.dtype)
        ycum = jnp.concatenate([zero, jnp.cumsum(ystep, axis=0)], axis=0)
        xcum = jnp.concatenate([zero, jnp.cumsum(xstep, axis=0)], axis=0)
        bnd_y = (y0 + ycum).astype(dtype)
        bnd_x = (x0 + xcum).astype(dtype)
        bnd_z = jnp.broadcast_to(zs_j[:, None].astype(dtype),
                                 (zs_j.size, zen.size))
        ray_len = (dzv_j[:, None] / jnp.cos(zen)[None, :]).astype(dtype)
        d2 = (dh * dh).astype(dtype)
        re = jnp.full(zen.size, 6371000.0, dtype)
        return bnd_y, bnd_x, bnd_z, d2, ray_len, re

    dev = jax.block_until_ready(build_rays(
        jnp.asarray(zen), jnp.asarray(azi), jnp.asarray(y0), jnp.asarray(x0),
        jnp.asarray(dzv), jnp.asarray(zs)))

    ref = None
    for depth in (1, 2, 3, 0, 1):
        fn = build(depth)(groups, planes,
                          tuple(ys.tolist()), tuple(xs.tolist()),
                          tuple(zs.tolist()), True)

        def run(bump):
            by, bx, bz, d2_d, rl_d, re_d = dev
            w, h = fn(packed2d, by + bump, bx, bz, d2_d, rl_d, re_d)
            return float(jnp.nansum(w) + jnp.nansum(h))

        v = run(jnp.float32(0.0))
        ts = []
        for k in range(1, 4):
            t0 = time.perf_counter()
            run(jnp.float32(k) * 1e-7)
            ts.append(time.perf_counter() - t0)
        if ref is None:
            ref = v
        print(f'depth={depth}: {min(ts) * 1e3:7.1f} ms  '
              f'({n_rays / min(ts) / 1e6:.2f} M rays/s)  sum={v:.6e} '
              f'rel_dev={abs(v - ref) / abs(ref):.2e}', flush=True)


if __name__ == '__main__':
    main()
