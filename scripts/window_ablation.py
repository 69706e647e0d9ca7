"""TPU ablation: windowed Pallas integrate vs the XLA brick kernel.

Coherent 1M-ray batch (single look direction, the production shape) on an
HRRR-sized cube. Slope-method timing with perturbed inputs (result cache)
and scalar fetches (async dispatch). Records the numbers for BASELINE.md.

Usage: python scripts/window_ablation.py [n_side]
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 1000


def main():
    import jax
    import jax.numpy as jnp

    import raider_tpu  # noqa: F401
    from raider_tpu.delay.pallas_window import integrate_rays_windowed
    from raider_tpu.delay.raytrace import (
        _pad_group_plan, _PLAN_BUCKET, build_group_plan, integrate_rays,
        pack_cubes,
    )

    print('backend:', jax.default_backend())
    rng = np.random.default_rng(0)
    nz, ny, nx = 50, 400, 400
    zs = -500.0 + 26500.0 * np.linspace(0.0, 1.0, nz) ** 1.4
    ys = np.linspace(16.0, 24.0, ny)
    xs = np.linspace(-4.0, 4.0, nx)
    wet = rng.uniform(0.1, 100.0, (nz, ny, nx)).astype(np.float32)
    hydro = rng.uniform(50.0, 300.0, (nz, ny, nx)).astype(np.float32)

    heights = zs.copy()
    L = nz - 1
    n = SIDE * SIDE
    ypix = np.linspace(18.5, 21.5, SIDE)
    xpix = np.linspace(-1.5, 1.5, SIDE)
    y0 = np.repeat(ypix, SIDE)
    x0 = np.tile(xpix, SIDE)
    zen = np.deg2rad(rng.uniform(30.0, 40.0, n))
    azi = 0.7 + rng.uniform(-0.01, 0.01, n)       # one look direction
    dzv = np.diff(heights)
    deg_per_m = 1.0 / 111000.0

    # build the (L, N) batch on device (uploading ~1.6 GB via the tunnel
    # would dominate wall time; see docs/performance.md)
    @jax.jit
    def build(zen, azi, y0, x0):
        dh = jnp.asarray(dzv)[:, None] * jnp.tan(zen)[None, :]
        ycum = jnp.concatenate([jnp.zeros((1, n)),
                                jnp.cumsum(dh * jnp.cos(azi) * deg_per_m, 0)], 0)
        xcum = jnp.concatenate([jnp.zeros((1, n)),
                                jnp.cumsum(dh * jnp.sin(azi) * deg_per_m, 0)], 0)
        zbc = jnp.broadcast_to(jnp.asarray(heights)[:, None], (L + 1, n))
        bnd_y = (y0 + ycum).astype(jnp.float32)
        bnd_x = (x0 + xcum).astype(jnp.float32)
        bnd_z = zbc.astype(jnp.float32)
        ray_len = jnp.asarray(dzv)[:, None] / jnp.cos(zen)[None, :]
        d2 = dh * dh
        return (bnd_y, bnd_x, bnd_z,
                d2.astype(jnp.float32), ray_len.astype(jnp.float32))

    bnd_y, bnd_x, bnd_z, d2, rl = jax.block_until_ready(
        build(jnp.asarray(zen), jnp.asarray(azi), jnp.asarray(y0),
              jnp.asarray(x0)))
    re = jnp.full(n, 6371000.0, jnp.float32)

    max_sec = float((1.0 / np.cos(zen)).max())
    max_tan = float(np.tan(zen).max())
    per_level_max = dzv * max_sec
    hstep_max = dzv * max_tan * deg_per_m
    plan = build_group_plan(per_level_max, heights, hstep_max, ys, xs, zs)
    plan = _pad_group_plan(plan, _PLAN_BUCKET)
    print(f'{n} rays, {plan.anchor.size} groups, G={plan.G}')

    packed, mode = pack_cubes(wet, hydro, grouped=True)
    print('brick table bytes:', packed.size * 4)

    def slope(fn, iters=(1, 3)):
        out = fn(0)
        _ = float(jnp.ravel(out[0])[0])
        ts = []
        ctr = [10]
        for k in iters:
            t0 = time.perf_counter()
            for _i in range(k):
                ctr[0] += 1
                out = fn(ctr[0])
            _ = float(jnp.ravel(out[0])[0])
            ts.append(time.perf_counter() - t0)
        return (ts[1] - ts[0]) / (iters[1] - iters[0])

    def run_brick(i):
        return integrate_rays(
            wet, hydro, ys, xs, zs, bnd_y + np.float32(i) * 1e-7,
            bnd_x, bnd_z, d2, rl,
            re, per_level_max, packed2d=packed, mode=mode,
            heights=heights, hstep_max=hstep_max)

    t_brick = slope(run_brick)
    print(f'brick (XLA):     {t_brick*1e3:8.1f} ms  '
          f'{n/t_brick/1e6:6.2f} M rays/s')

    def run_window(i):
        low = jnp.stack([bnd_y[:-1], bnd_x[:-1], bnd_z[:-1]], -1)
        high = jnp.stack([bnd_y[1:], bnd_x[1:], bnd_z[1:]], -1)
        w, h, used = integrate_rays_windowed(
            wet, hydro, ys, xs, zs, low + np.float32(i) * 1e-7, high, d2, rl,
            re, plan, (SIDE, SIDE))
        assert used, 'windowed path declined'
        return w, h

    # free the 4 GB brick table before the windowed runs (HBM pressure)
    import gc

    w_b, h_b = run_brick(0)
    w_b = jnp.asarray(w_b) + 0.0
    del packed
    gc.collect()

    t_win = slope(run_window)
    print(f'windowed Pallas: {t_win*1e3:8.1f} ms  '
          f'{n/t_win/1e6:6.2f} M rays/s  ({t_brick/t_win:.2f}x)')

    # correctness on the same inputs (brick result captured above)
    w_w, h_w = run_window(0)
    d = float(jnp.nanmax(jnp.abs(w_w - w_b)))
    rel = d / float(jnp.nanmax(jnp.abs(w_b)))
    print(f'max |wet delta| = {d:.3e} (rel {rel:.2e})')
    assert rel < 1e-5, 'windowed kernel mismatch'
    print('WINDOWED KERNEL OK')


if __name__ == '__main__':
    main()
