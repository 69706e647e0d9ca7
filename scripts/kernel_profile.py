"""Profile the production static-brick integrate kernel on the bench scenario.

Reports the wall time of the full kernel and of two ablations that bound the
gather/arithmetic split:
  * gather-only: same gathers (one per group), U contraction replaced by a
    trivial sum of the brick rows (keeps the gather + its reduction traffic).
  * arith-only: identical program with every brick gather replaced by a
    broadcast of row 0 (XLA still does the index math; no scattered reads).

Run on the real TPU:  python scripts/kernel_profile.py
"""

import json
import pathlib
import sys
import time
from functools import partial

import numpy as np

sys.setrecursionlimit(100000)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def make_bench_scene(n_rays=1_000_000, seed=0):
    rng = np.random.default_rng(seed)
    nz, ny, nx = 50, 400, 400
    wet = rng.uniform(0.1, 100.0, (nz, ny, nx)).astype(np.float32)
    hydro = rng.uniform(50.0, 300.0, (nz, ny, nx)).astype(np.float32)
    zs = -500.0 + 26500.0 * np.linspace(0.0, 1.0, nz) ** 1.4
    ys = np.linspace(30.0, 40.0, ny)
    xs = np.linspace(-125.0, -115.0, nx)
    zen = rng.uniform(np.deg2rad(25.0), np.deg2rad(45.0), n_rays)
    azi = rng.uniform(0.0, 2.0 * np.pi, n_rays)
    y0 = rng.uniform(32.0, 38.0, n_rays)
    x0 = rng.uniform(-123.0, -117.0, n_rays)
    dzv = zs[1:] - zs[:-1]
    deg_per_m = 1.0 / 111000.0
    max_sec = float((1.0 / np.cos(zen)).max())
    max_tan = float(np.tan(zen).max())
    per_level_max = (dzv * max_sec).astype(np.float32)
    hstep_max = dzv * max_tan * deg_per_m
    return dict(wet=wet, hydro=hydro, ys=ys, xs=xs, zs=zs, zen=zen, azi=azi,
                y0=y0, x0=x0, dzv=dzv, per_level_max=per_level_max,
                heights=zs.copy(), hstep_max=hstep_max, deg_per_m=deg_per_m)


def build_rays_np(sc, dtype=np.float32):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def build(zen, azi, y0, x0, dzv_j, zs_j):
        dh = dzv_j[:, None] * jnp.tan(zen)[None, :]
        ystep = dh * jnp.cos(azi) * sc['deg_per_m']
        xstep = dh * jnp.sin(azi) * sc['deg_per_m']
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

    return jax.block_until_ready(build(
        jnp.asarray(sc['zen']), jnp.asarray(sc['azi']), jnp.asarray(sc['y0']),
        jnp.asarray(sc['x0']), jnp.asarray(sc['dzv']), jnp.asarray(sc['zs'])))


def time_fn(fn, reps=3):
    """fn(bump) -> device result; bump perturbs an input so the remote
    result cache can never serve a repeat. A scalar is FETCHED each rep:
    on remote-attached TPUs block_until_ready alone does not force
    materialization (see bench.py)."""
    import jax
    import jax.numpy as jnp

    def fetch(r):
        leaves = jax.tree_util.tree_leaves(r)
        return float(sum(jnp.nansum(x) for x in leaves))

    _ = fetch(fn(0.0))
    ts = []
    for k in range(1, reps + 1):
        t0 = time.perf_counter()
        _ = fetch(fn(float(k) * 1e-7))
        ts.append(time.perf_counter() - t0)
    return min(ts)


SPECS = [
    (7, 3, 3, 6),        # round-2 production
    (8, 4, 4, 24),       # 256 f32/row = 2 exact tiles, ~7 groups
    (8, 4, 4, 12),       # same brick, tighter unroll
    (7, 4, 4, 12),
    (14, 3, 3, 12),      # 252 f32/row, z-deep
]


def make_tensor_fn(groups, planes, wy, wx, ys_np, xs_np, zs_np):
    """Static-plan brick integrate with a TENSORIZED contraction.

    Instead of building up to planes*wy*wx separate (N,) weight vectors U
    and issuing one multiply-accumulate per brick cell (hundreds of small
    HBM intermediates for XLA to schedule), build ONE (N, width) weight
    tensor per group with lane-constant (dz, dy, dx) decode arrays and
    reduce brick * U in a single fused pass over the gathered rows.
    """
    import jax
    import jax.numpy as jnp

    from raider_tpu.ops.interp import _locate as _loc

    ny, nx = ys_np.size, xs_np.size
    width = planes * wy * wx * 2
    lanes = np.arange(width)
    dyc = ((lanes // (wx * 2)) % wy).astype(np.float32)[None, :]
    dxc = ((lanes // 2) % wx).astype(np.float32)[None, :]
    dzc = lanes // (wy * wx * 2)

    @jax.jit
    def run(table2d, bnd_y, bnd_x, bnd_z, d2, ray_len, re_local):
        cdt = table2d.dtype
        n = bnd_y.shape[1]
        acc_w = jnp.zeros(n, cdt)
        acc_h = jnp.zeros(n, cdt)
        for za, samples in groups:
            persample = []
            ay = ax = None
            for (lv, f, wal, wav, wbl, wbv, zlo, zinv, dzo) in samples:
                py = bnd_y[lv] + f * (bnd_y[lv + 1] - bnd_y[lv])
                px = bnd_x[lv] + f * (bnd_x[lv + 1] - bnd_x[lv])
                pz = bnd_z[lv] + f * (bnd_z[lv + 1] - bnd_z[lv])
                hbar = 0.5 * (bnd_z[lv] + bnd_z[lv + 1])
                pz = pz - f * (1.0 - f) * d2[lv] / (2.0 * (re_local + hbar))
                pz = jnp.clip(pz, zs_np[0], zs_np[-1])
                bz = (pz >= zs_np[0]) & (pz <= zs_np[-1])
                iy, fy, by = _loc(ys_np, py)
                ix, fx, bx = _loc(xs_np, px)
                fz = (pz - zlo) * zinv
                rl = wav * ray_len[wal] + (wbv * ray_len[wbl] if wbv else 0.0)
                persample.append((iy, ix, fy.astype(cdt), fx.astype(cdt),
                                  fz.astype(cdt), bz & by & bx,
                                  (1.0e-6 * rl).astype(cdt), dzo))
                ay = iy if ay is None else jnp.minimum(ay, iy)
                ax = ix if ax is None else jnp.minimum(ax, ix)
            lin = (za * ny + ay) * nx + ax
            lin = jax.lax.optimization_barrier((lin, acc_w))[0]
            brick = jnp.take(table2d, lin, axis=0)        # (N, width)
            U = None
            for (iy, ix, fy, fx, fz, ok, wt, dzo) in persample:
                dyi = iy - ay
                dxi = ix - ax
                ok = ok & (dyi <= wy - 2) & (dxi <= wx - 2)
                gy = dyi.astype(cdt) + fy
                gx = dxi.astype(cdt) + fx
                wte = jnp.where(ok, wt, jnp.nan)
                # static lane masks for the two z-planes this sample touches
                m0 = (dzc == dzo).astype(np.float32)[None, :]
                m1 = (dzc == dzo + 1).astype(np.float32)[None, :]
                wz = m0 * (1.0 - fz)[:, None] + m1 * fz[:, None]
                wyl = jnp.maximum(0.0, 1.0 - jnp.abs(gy[:, None] - dyc))
                wxl = jnp.maximum(0.0, 1.0 - jnp.abs(gx[:, None] - dxc))
                w = wte[:, None] * wz * wyl * wxl
                U = w if U is None else U + w
            prod = (brick * U).reshape(n, width // 2, 2)
            acc_w = acc_w + prod[:, :, 0].sum(axis=1)
            acc_h = acc_h + prod[:, :, 1].sum(axis=1)
        return acc_w, acc_h

    return run


def make_pallas_fn(groups, planes, wy, wx, ys_np, xs_np, zs_np,
                   tile_n=1024, interpret=False):
    """Static-plan brick integrate with a PALLAS contraction stage.

    XLA still does the per-sample coordinate math and the scattered-row
    gather (jnp.take is already near the measured gather floor); the U-build
    + brick contraction — whose XLA form reads the tile-laid-out (N, width)
    brick column-by-column and materializes hundreds of (N,) intermediates
    (118 GB accessed per cost_analysis) — moves into one Pallas kernel per
    group that streams the brick through VMEM exactly once.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from raider_tpu.ops.interp import _locate as _loc

    ny, nx = ys_np.size, xs_np.size
    width = planes * wy * wx * 2

    def contract_kernel(scal_ref, brick_ref, ow_ref, oh_ref, *, dzos):
        # lane decode in pure f32 (no integer ops: Mosaic's i64 convert
        # lowering recurses under x64; captured np constants are rejected)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1).astype(
            jnp.float32)
        dzc = jnp.floor(lane / (wy * wx * 2.0))
        r1 = lane - dzc * (wy * wx * 2.0)
        dyc = jnp.floor(r1 / (wx * 2.0))
        r2 = r1 - dyc * (wx * 2.0)
        dxc = jnp.floor(r2 / 2.0)
        fhyd = r2 - 2.0 * dxc          # 0 on wet lanes, 1 on hydro lanes
        U = None
        for s, dzo in enumerate(dzos):
            gy = scal_ref[:, 4 * s:4 * s + 1]
            gx = scal_ref[:, 4 * s + 1:4 * s + 2]
            fz = scal_ref[:, 4 * s + 2:4 * s + 3]
            wte = scal_ref[:, 4 * s + 3:4 * s + 4]
            m0 = jnp.where(dzc == float(dzo), 1.0, 0.0)
            m1 = jnp.where(dzc == float(dzo + 1), 1.0, 0.0)
            wz = m0 * (1.0 - fz) + m1 * fz
            wyl = jnp.maximum(0.0, 1.0 - jnp.abs(gy - dyc))
            wxl = jnp.maximum(0.0, 1.0 - jnp.abs(gx - dxc))
            w = wte * wz * wyl * wxl
            U = w if U is None else U + w
        prod = brick_ref[:] * U
        ow_ref[:] = jnp.sum(prod * (1.0 - fhyd), axis=1, keepdims=True)
        oh_ref[:] = jnp.sum(prod * fhyd, axis=1, keepdims=True)

    def contract(brick, scal, dzos, n):
        grid = (pl.cdiv(n, tile_n),)
        with jax.enable_x64(False):
            out = _call(brick, scal, dzos, n, grid)
        return out[0][:, 0], out[1][:, 0]

    def _call(brick, scal, dzos, n, grid):
        return pl.pallas_call(
            partial(contract_kernel, dzos=dzos),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_n, scal.shape[1]), lambda i: (i, 0)),
                pl.BlockSpec((tile_n, width), lambda i: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((tile_n, 1), lambda i: (i, 0)),
                pl.BlockSpec((tile_n, 1), lambda i: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, 1), brick.dtype),
                jax.ShapeDtypeStruct((n, 1), brick.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary',)),
            interpret=interpret,
        )(scal, brick)

    @jax.jit
    def run(table2d, bnd_y, bnd_x, bnd_z, d2, ray_len, re_local):
        cdt = table2d.dtype
        n = bnd_y.shape[1]
        acc_w = jnp.zeros(n, cdt)
        acc_h = jnp.zeros(n, cdt)
        for za, samples in groups:
            scal_rows = []
            dzos = []
            ay = ax = None
            persample = []
            for (lv, f, wal, wav, wbl, wbv, zlo, zinv, dzo) in samples:
                py = bnd_y[lv] + f * (bnd_y[lv + 1] - bnd_y[lv])
                px = bnd_x[lv] + f * (bnd_x[lv + 1] - bnd_x[lv])
                pz = bnd_z[lv] + f * (bnd_z[lv + 1] - bnd_z[lv])
                hbar = 0.5 * (bnd_z[lv] + bnd_z[lv + 1])
                pz = pz - f * (1.0 - f) * d2[lv] / (2.0 * (re_local + hbar))
                pz = jnp.clip(pz, zs_np[0], zs_np[-1])
                bz = (pz >= zs_np[0]) & (pz <= zs_np[-1])
                iy, fy, by = _loc(ys_np, py)
                ix, fx, bx = _loc(xs_np, px)
                fz = (pz - zlo) * zinv
                rl = wav * ray_len[wal] + (wbv * ray_len[wbl] if wbv else 0.0)
                persample.append((iy, ix, fy.astype(cdt), fx.astype(cdt),
                                  fz.astype(cdt), bz & by & bx,
                                  (1.0e-6 * rl).astype(cdt), dzo))
                ay = iy if ay is None else jnp.minimum(ay, iy)
                ax = ix if ax is None else jnp.minimum(ax, ix)
            for (iy, ix, fy, fx, fz, ok, wt, dzo) in persample:
                dyi = iy - ay
                dxi = ix - ax
                ok = ok & (dyi <= wy - 2) & (dxi <= wx - 2)
                gy = dyi.astype(cdt) + fy
                gx = dxi.astype(cdt) + fx
                wte = jnp.where(ok, wt, jnp.nan)
                scal_rows += [gy, gx, fz, wte]
                dzos.append(dzo)
            scal = jnp.stack(scal_rows, axis=-1)        # (N, 4S)
            lin = (za * ny + ay) * nx + ax
            lin = jax.lax.optimization_barrier((lin, acc_w))[0]
            brick = jnp.take(table2d, lin, axis=0)      # (N, width)
            pw, ph = contract(brick, scal, tuple(dzos), n)
            acc_w = acc_w + pw
            acc_h = acc_h + ph
        return acc_w, acc_h

    return run


def make_pallas2_fn(groups, planes, wy, wx, ys_np, xs_np, zs_np,
                    tile_n=2048, interpret=False, kernel_transpose=False,
                    barrier_depth=1):
    """v2: transposed brick (width, N) with RAYS ON LANES; everything but
    the gather runs inside one Pallas kernel per group.

    KEPT ONLY for the barrier_depth pipelining ablation (pallas2d<N>) and
    the historical pallas2 baseline — every other variant routes through
    the PRODUCTION rt._static_brick_pallas_fn so ablation numbers track
    the shipped kernel (see the dispatch in main()).

    Every brick-row access is STATIC (z-plane placement static per sample;
    the y/x cells are enumerated statically with per-ray hat weights), so
    the per-sample trilinear turns into ~36 static-row MACs over fully
    packed 1D lane vectors — ~16x less VPU work than the dense 126-lane
    U-build, and zero (N,) intermediates in HBM. Requires uniform y/x axes
    (locate is an FMA in-kernel).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from raider_tpu.ops.interp import _locate as _loc

    ny, nx = ys_np.size, xs_np.size
    width = planes * wy * wx * 2
    y_lo, y_hi = float(ys_np[0]), float(ys_np[-1])
    x_lo, x_hi = float(xs_np[0]), float(xs_np[-1])
    z_lo, z_hi = float(zs_np[0]), float(zs_np[-1])
    inv_sy = (ny - 1) / (y_hi - y_lo)
    inv_sx = (nx - 1) / (x_hi - x_lo)
    for ax_ in (ys_np, xs_np):
        d = np.diff(ax_)
        assert np.allclose(d, d[0], rtol=1e-6), 'pallas2 needs uniform y/x'

    def group_kernel(bt_ref, by_ref, bx_ref, bz_ref, d2_ref, rl_ref,
                     aux_ref, out_ref, *, samples, lv0):
        ay = aux_ref[0, :]
        ax = aux_ref[1, :]
        re_local = aux_ref[2, :]
        acc_w = jnp.zeros_like(ay)
        acc_h = jnp.zeros_like(ay)
        bt = bt_ref[:].T if kernel_transpose else bt_ref
        for (lv_abs, f, wal_abs, wav, wbl_abs, wbv, zlo, zinv, dzo) in samples:
            # level indices remapped into the group's sliced row window
            lv = lv_abs - lv0
            wal = wal_abs - lv0
            wbl = wbl_abs - lv0
            ylo_r = by_ref[lv, :]
            xlo_r = bx_ref[lv, :]
            zlo_r = bz_ref[lv, :]
            yhi_r = by_ref[lv + 1, :]
            xhi_r = bx_ref[lv + 1, :]
            zhi_r = bz_ref[lv + 1, :]
            py = ylo_r + f * (yhi_r - ylo_r)
            px = xlo_r + f * (xhi_r - xlo_r)
            pz = zlo_r + f * (zhi_r - zlo_r)
            hbar = 0.5 * (zlo_r + zhi_r)
            pz = pz - f * (1.0 - f) * d2_ref[lv, :] / (2.0 * (re_local + hbar))
            bndy = (py >= y_lo) & (py <= y_hi)
            bndx = (px >= x_lo) & (px <= x_hi)
            pz = jnp.minimum(jnp.maximum(pz, z_lo), z_hi)
            bndz = (pz >= z_lo) & (pz <= z_hi)
            posy = (py - y_lo) * inv_sy
            iyf = jnp.minimum(jnp.maximum(jnp.floor(posy), 0.0),
                              float(ny - 2))
            fy = posy - iyf
            posx = (px - x_lo) * inv_sx
            ixf = jnp.minimum(jnp.maximum(jnp.floor(posx), 0.0),
                              float(nx - 2))
            fx = posx - ixf
            fz = (pz - zlo) * zinv
            dyi = iyf - ay
            dxi = ixf - ax
            ok = (bndy & bndx & bndz
                  & (dyi <= float(wy - 2)) & (dxi <= float(wx - 2)))
            rl = wav * rl_ref[wal, :]
            if wbv:
                rl = rl + wbv * rl_ref[wbl, :]
            wte = jnp.where(ok, 1.0e-6 * rl, jnp.nan)
            gy = dyi + fy
            gx = dxi + fx
            hy = [jnp.maximum(0.0, 1.0 - jnp.abs(gy - k)) for k in range(wy)]
            hx = [jnp.maximum(0.0, 1.0 - jnp.abs(gx - l)) for l in range(wx)]
            q0 = [wte * (1.0 - fz) * hyk for hyk in hy]
            q1 = [wte * fz * hyk for hyk in hy]
            for k in range(wy):
                for l in range(wx):
                    w0 = q0[k] * hx[l]
                    w1 = q1[k] * hx[l]
                    r0 = ((dzo * wy + k) * wx + l) * 2
                    r1 = (((dzo + 1) * wy + k) * wx + l) * 2
                    acc_w = acc_w + bt[r0, :] * w0
                    acc_h = acc_h + bt[r0 + 1, :] * w0
                    acc_w = acc_w + bt[r1, :] * w1
                    acc_h = acc_h + bt[r1 + 1, :] * w1
        out_ref[0, :] = acc_w
        out_ref[1, :] = acc_h

    def group_call(brickT, bnd_y, bnd_x, bnd_z, d2, ray_len, aux, samples,
                   lv0, n):
        L1 = bnd_y.shape[0]
        L = d2.shape[0]
        rowspec = lambda r: pl.BlockSpec((r, tile_n), lambda i: (0, i))
        return pl.pallas_call(
            partial(group_kernel, samples=samples, lv0=lv0),
            grid=(pl.cdiv(n, tile_n),),
            in_specs=[pl.BlockSpec((tile_n, width), lambda i: (i, 0))
                      if kernel_transpose else rowspec(width),
                      rowspec(L1), rowspec(L1), rowspec(L1),
                      rowspec(L), rowspec(L), rowspec(3)],
            out_specs=rowspec(2),
            out_shape=jax.ShapeDtypeStruct((2, n), brickT.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary',)),
            interpret=interpret,
        )(brickT, bnd_y, bnd_x, bnd_z, d2, ray_len, aux)

    @jax.jit
    def run(table2d, bnd_y, bnd_x, bnd_z, d2, ray_len, re_local):
        cdt = table2d.dtype
        n = bnd_y.shape[1]
        acc = jnp.zeros((2, n), cdt)
        bnd_y32 = bnd_y.astype(cdt)
        bnd_x32 = bnd_x.astype(cdt)
        bnd_z32 = bnd_z.astype(cdt)
        d2_32 = d2.astype(cdt)
        rl_32 = ray_len.astype(cdt)
        L = d2.shape[0]
        parts = []
        for za, samples in groups:
            ay = ax = None
            for (lv, f, *_rest) in samples:
                py = bnd_y[lv] + f * (bnd_y[lv + 1] - bnd_y[lv])
                px = bnd_x[lv] + f * (bnd_x[lv + 1] - bnd_x[lv])
                iy, _fy, _by = _loc(ys_np, py)
                ix, _fx, _bx = _loc(xs_np, px)
                ay = iy if ay is None else jnp.minimum(ay, iy)
                ax = ix if ax is None else jnp.minimum(ax, ix)
            lin = (za * ny + ay) * nx + ax
            # pipelined barrier: allow barrier_depth gathered bricks in
            # flight so gather(g) overlaps the pallas contraction of g-1
            if barrier_depth <= 1:
                lin = jax.lax.optimization_barrier((lin, acc))[0]
            elif len(parts) >= barrier_depth - 1:
                lin = jax.lax.optimization_barrier(
                    (lin, parts[-(barrier_depth - 1)]))[0]
            brick = jnp.take(table2d, lin, axis=0)      # (N, width)
            brickT = brick if kernel_transpose else brick.T
            aux = jnp.stack([ay.astype(cdt), ax.astype(cdt),
                             re_local.astype(cdt)])
            # slice just the level-row window this group touches: the
            # kernel otherwise streams all ~250 boundary rows per group
            lv0 = min(min(s[0], s[2], s[4]) for s in samples)
            hi1 = max(s[0] + 1 for s in samples)            # bnd rows
            hiL = min(max(max(s[0], s[2], s[4]) for s in samples), L - 1)
            with jax.enable_x64(False):
                part = group_call(brickT,
                                  bnd_y32[lv0:hi1 + 1], bnd_x32[lv0:hi1 + 1],
                                  bnd_z32[lv0:hi1 + 1],
                                  d2_32[lv0:hiL + 1], rl_32[lv0:hiL + 1],
                                  aux, samples, lv0, n)
            parts.append(part)
            acc = acc + part
        return acc[0], acc[1]

    return run



def make_merged_fn(groups, planes, wy, wx, ys_np, xs_np, zs_np,
                   tile_n=4096, interpret=False):
    """Ablation (VERDICT r4 item 5): ONE merged ray-rows input per group.

    The production kernel streams six separate row inputs per grid step
    (by/bx/bz/d2/rl/aux) - six block-DMA descriptors per (group, tile) on
    top of the brick block. This variant concatenates them XLA-side into a
    single (3*nb + 2*nl + 3, N) array per group (identical sliced bytes,
    ONE descriptor) to measure whether per-step DMA setup overhead is part
    of the ~18 ms residual over the gather+materialization bound. In-kernel
    transpose form (the production kt1 layout); exact integer window test
    like the XLA kernel.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from raider_tpu.ops.interp import _locate as _loc

    ny, nx = ys_np.size, xs_np.size
    width = planes * wy * wx * 2
    y_lo, y_hi = float(ys_np[0]), float(ys_np[-1])
    x_lo, x_hi = float(xs_np[0]), float(xs_np[-1])
    z_lo, z_hi = float(zs_np[0]), float(zs_np[-1])
    inv_sy = (ny - 1) / (y_hi - y_lo)
    inv_sx = (nx - 1) / (x_hi - x_lo)
    for ax_ in (ys_np, xs_np):
        d = np.diff(ax_)
        assert np.allclose(d, d[0], rtol=1e-6), 'merged needs uniform y/x'

    def group_kernel(bt_ref, m_ref, out_ref, *, samples, lv0, nb, nl):
        oy, ox, oz = 0, nb, 2 * nb
        od2, orl, oaux = 3 * nb, 3 * nb + nl, 3 * nb + 2 * nl
        ay = m_ref[oaux, :]
        ax = m_ref[oaux + 1, :]
        re_local = m_ref[oaux + 2, :]
        acc_w = jnp.zeros_like(ay)
        acc_h = jnp.zeros_like(ay)
        bt = bt_ref[:].T
        for (lv_abs, f, wal_abs, wav, wbl_abs, wbv, zlo, zinv, dzo) in samples:
            lv = lv_abs - lv0
            wal = wal_abs - lv0
            wbl = wbl_abs - lv0
            ylo_r = m_ref[oy + lv, :]
            xlo_r = m_ref[ox + lv, :]
            zlo_r = m_ref[oz + lv, :]
            py = ylo_r + f * (m_ref[oy + lv + 1, :] - ylo_r)
            px = xlo_r + f * (m_ref[ox + lv + 1, :] - xlo_r)
            zhi_r = m_ref[oz + lv + 1, :]
            pz = zlo_r + f * (zhi_r - zlo_r)
            hbar = 0.5 * (zlo_r + zhi_r)
            pz = pz - f * (1.0 - f) * m_ref[od2 + lv, :] / (2.0 * (re_local + hbar))
            bndy = (py >= y_lo) & (py <= y_hi)
            bndx = (px >= x_lo) & (px <= x_hi)
            pz = jnp.minimum(jnp.maximum(pz, z_lo), z_hi)
            bndz = (pz >= z_lo) & (pz <= z_hi)
            posy = (py - y_lo) * inv_sy
            iyf = jnp.minimum(jnp.maximum(jnp.floor(posy), 0.0),
                              float(ny - 2))
            fy = posy - iyf
            posx = (px - x_lo) * inv_sx
            ixf = jnp.minimum(jnp.maximum(jnp.floor(posx), 0.0),
                              float(nx - 2))
            fx = posx - ixf
            fz = (pz - zlo) * zinv
            dyi = iyf - ay
            dxi = ixf - ax
            ok = (bndy & bndx & bndz
                  & (dyi <= float(wy - 2)) & (dxi <= float(wx - 2)))
            rl = wav * m_ref[orl + wal, :]
            if wbv:
                rl = rl + wbv * m_ref[orl + wbl, :]
            wte = jnp.where(ok, 1.0e-6 * rl, jnp.nan)
            gy = dyi + fy
            gx = dxi + fx
            hy = [jnp.maximum(0.0, 1.0 - jnp.abs(gy - k)) for k in range(wy)]
            hx = [jnp.maximum(0.0, 1.0 - jnp.abs(gx - l)) for l in range(wx)]
            q0 = [wte * (1.0 - fz) * hyk for hyk in hy]
            q1 = [wte * fz * hyk for hyk in hy]
            for k in range(wy):
                for l in range(wx):
                    w0 = q0[k] * hx[l]
                    w1 = q1[k] * hx[l]
                    r0 = ((dzo * wy + k) * wx + l) * 2
                    r1 = (((dzo + 1) * wy + k) * wx + l) * 2
                    acc_w = acc_w + bt[r0, :] * w0
                    acc_h = acc_h + bt[r0 + 1, :] * w0
                    acc_w = acc_w + bt[r1, :] * w1
                    acc_h = acc_h + bt[r1 + 1, :] * w1
        out_ref[0, :] = acc_w
        out_ref[1, :] = acc_h

    def group_call(brickT, merged, samples, lv0, nb, nl, n):
        R = merged.shape[0]
        rowspec = lambda r: pl.BlockSpec((r, tile_n), lambda i: (0, i))
        return pl.pallas_call(
            partial(group_kernel, samples=samples, lv0=lv0, nb=nb, nl=nl),
            grid=(pl.cdiv(n, tile_n),),
            in_specs=[pl.BlockSpec((tile_n, width), lambda i: (i, 0)),
                      rowspec(R)],
            out_specs=rowspec(2),
            out_shape=jax.ShapeDtypeStruct((2, n), brickT.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary',)),
            interpret=interpret,
        )(brickT, merged)

    @jax.jit
    def run(table2d, bnd_y, bnd_x, bnd_z, d2, ray_len, re_local):
        cdt = table2d.dtype
        n = bnd_y.shape[1]
        acc = jnp.zeros((2, n), cdt)
        bnd_y32 = bnd_y.astype(cdt)
        bnd_x32 = bnd_x.astype(cdt)
        bnd_z32 = bnd_z.astype(cdt)
        d2_32 = d2.astype(cdt)
        rl_32 = ray_len.astype(cdt)
        re32 = re_local.astype(cdt)
        L = d2.shape[0]
        for za, samples in groups:
            ay = ax = None
            for (lv, f, *_rest) in samples:
                py = bnd_y[lv] + f * (bnd_y[lv + 1] - bnd_y[lv])
                px = bnd_x[lv] + f * (bnd_x[lv + 1] - bnd_x[lv])
                iy, _fy, _by = _loc(ys_np, py)
                ix, _fx, _bx = _loc(xs_np, px)
                ay = iy if ay is None else jnp.minimum(ay, iy)
                ax = ix if ax is None else jnp.minimum(ax, ix)
            lin = (za * ny + ay) * nx + ax
            lin = jax.lax.optimization_barrier((lin, acc))[0]
            brickT = jnp.take(table2d, lin, axis=0)     # (N, width), kt1
            lv0 = min(min(s[0], s[2], s[4]) for s in samples)
            hi1 = max(s[0] + 1 for s in samples)
            hiL = min(max(max(s[0], s[2], s[4]) for s in samples), L - 1)
            nb = hi1 + 1 - lv0
            nl = hiL + 1 - lv0
            merged = jnp.concatenate([
                bnd_y32[lv0:hi1 + 1], bnd_x32[lv0:hi1 + 1],
                bnd_z32[lv0:hi1 + 1], d2_32[lv0:hiL + 1],
                rl_32[lv0:hiL + 1],
                jnp.stack([ay.astype(cdt), ax.astype(cdt), re32]),
            ])
            with jax.enable_x64(False):
                part = group_call(brickT, merged, samples, lv0, nb, nl, n)
            acc = acc + part
        return acc[0], acc[1]

    return run


def main():
    import gc

    import jax.numpy as jnp

    from raider_tpu.delay import raytrace as rt

    sc = make_bench_scene()
    dev = build_rays_np(sc)
    by_d, bx_d, bz_d, d2_d, rl_d, re_d = dev
    axes = dict(ys=tuple(sc['ys'].tolist()), xs=tuple(sc['xs'].tolist()),
                zs=tuple(sc['zs'].tolist()))

    run_specs = SPECS
    variant = sys.argv[2] if len(sys.argv) > 2 else 'prod'
    tensor_mode = variant == 'tensor'
    if len(sys.argv) > 1 and sys.argv[1] == 'split':
        run_specs = []          # split mode: only the gather/arith bounds
    elif len(sys.argv) > 1:
        p, a, b, g = (int(v) for v in sys.argv[1].split(','))
        run_specs = [(p, a, b, g)]
    for (planes, wy_s, wx_s, gmax) in run_specs:
        packed2d = rt._pack_bricks(jnp.asarray(sc['wet']),
                                   jnp.asarray(sc['hydro']),
                                   planes, wy_s, wx_s)
        plan = rt.build_group_plan(sc['per_level_max'], sc['heights'],
                                   sc['hstep_max'], sc['ys'], sc['xs'],
                                   sc['zs'], group_max=gmax, planes=planes,
                                   wy=wy_s, wx=wx_s)
        groups, pl, wy, wx = rt.static_plan_from(plan)
        if variant == 'tensor':
            fn = make_tensor_fn(groups, pl, wy, wx, sc['ys'], sc['xs'],
                                sc['zs'])
        elif variant == 'pallas':
            fn = make_pallas_fn(groups, pl, wy, wx, sc['ys'], sc['xs'],
                                sc['zs'])
        elif variant == 'pallas2':
            fn = make_pallas2_fn(groups, pl, wy, wx, sc['ys'], sc['xs'],
                                 sc['zs'])
        elif variant == 'pallas3':
            # in-kernel transpose — now the production default; route
            # through the production function so the number can't go stale
            fn = rt._static_brick_pallas_fn(
                groups, pl, wy, wx, axes['ys'], axes['xs'], axes['zs'],
                True, False, kernel_transpose=True)
        elif variant.startswith('pallas2t'):
            # tile-size sweep on the production kernel (XLA-side transpose
            # form, matching the historical pallas2 baseline)
            fn = rt._static_brick_pallas_fn(
                groups, pl, wy, wx, axes['ys'], axes['xs'], axes['zs'],
                True, False, tile_n=int(variant[8:]),
                kernel_transpose=False)
        elif variant.startswith('pallas2d'):
            fn = make_pallas2_fn(groups, pl, wy, wx, sc['ys'], sc['xs'],
                                 sc['zs'], tile_n=4096,
                                 barrier_depth=int(variant[8:]))
        elif variant.startswith('prodi16'):
            # the PRODUCTION pallas kernel over the QUANTIZED int16 brick
            # table (brick_i16): same gathers, half the materialization and
            # kernel brick-read bytes; in-kernel dequant + transpose
            packed_f32 = packed2d           # ref check uses the f32 table
            # pack the SPEC UNDER TEST directly (pack_cubes' brick_i16
            # branch would re-derive the ladder spec and ignore argv)
            qw, sw, ow = rt._quantize_i16(jnp.asarray(sc['wet']))
            qh, sh, oh = rt._quantize_i16(jnp.asarray(sc['hydro']))
            deq16 = jnp.stack([sw, ow, sh, oh])
            packed2d = rt._pack_bricks(qw, qh, planes, wy_s, wx_s)
            base = rt._static_brick_pallas_fn(
                groups, pl, wy, wx, axes['ys'], axes['xs'], axes['zs'],
                True, False, kernel_transpose=not variant.endswith('kt0'),
                has_deq=True)
            fn = lambda tbl, *ray: base(tbl, *ray, deq16)
        elif variant == 'prodmerged':
            fn = make_merged_fn(groups, pl, wy, wx, sc['ys'], sc['xs'],
                                sc['zs'])
        elif variant.startswith('prodpallas'):
            # the PRODUCTION pallas kernel (raytrace.py), kt0/kt1 selects
            # the XLA-side vs in-kernel brick transpose
            fn = rt._static_brick_pallas_fn(
                groups, pl, wy, wx, axes['ys'], axes['xs'], axes['zs'],
                True, False, kernel_transpose=not variant.endswith('kt0'))
        else:
            fn = rt._static_brick_fn(groups, pl, wy, wx, axes['ys'],
                                     axes['xs'], axes['zs'], True, False)
        if variant != 'prod':
            # correctness vs the production kernel on a small prefix
            import jax
            ref_fn = rt._static_brick_fn(groups, pl, wy, wx, axes['ys'],
                                         axes['xs'], axes['zs'], True, False)
            k = 4096
            sl = lambda a: a[..., :k]
            i16 = variant.startswith('prodi16')
            got = fn(packed2d, sl(by_d), sl(bx_d), sl(bz_d), sl(d2_d),
                     sl(rl_d), sl(re_d))
            want = ref_fn(packed_f32 if i16 else packed2d,
                          sl(by_d), sl(bx_d), sl(bz_d), sl(d2_d),
                          sl(rl_d), sl(re_d))
            for g, w in zip(jax.tree_util.tree_leaves(got),
                            jax.tree_util.tree_leaves(want)):
                g, w = np.asarray(g), np.asarray(w)
                assert np.array_equal(np.isnan(g), np.isnan(w))
                m = ~np.isnan(g)
                if i16:    # quantized: bound ABS delay error at 0.1 mm
                    assert np.abs(g[m] - w[m]).max() < 1e-4
                    continue
                rel = np.abs(g[m] - w[m]) / np.maximum(np.abs(w[m]), 1e-9)
                assert rel.max() < 1e-5, rel.max()
            print(json.dumps(dict(variant=variant, equiv_ok=True,
                                  checked=k)), flush=True)
            if i16:
                # free the f32 table before timing: it is ref-check-only,
                # and holding ~4 GB f32 + 2 GB i16 through the timed run
                # inflates HBM pressure in the measurement itself
                del packed_f32, want, got
                gc.collect()
        t = time_fn(lambda b: fn(packed2d, by_d + b, bx_d + b, bz_d,
                                 d2_d, rl_d, re_d))
        print(json.dumps(dict(spec=[planes, wy_s, wx_s, gmax],
                              tensor=tensor_mode,
                              n_groups=len(groups),
                              n_samples=plan.n_points,
                              table_gb=round(packed2d.size
                                             * packed2d.dtype.itemsize / 1e9, 2),
                              t_s=round(t, 4))), flush=True)
        del packed2d, fn
        gc.collect()

    if len(sys.argv) > 1 and sys.argv[1] != 'split':
        return
    # gather/arith split for the round-2 production spec
    packed2d = rt._pack_bricks(jnp.asarray(sc['wet']),
                               jnp.asarray(sc['hydro']), 7, 3, 3)
    plan = rt.build_group_plan(sc['per_level_max'], sc['heights'],
                               sc['hstep_max'], sc['ys'], sc['xs'], sc['zs'],
                               group_max=6, planes=7, wy=3, wx=3)
    groups, planes, wy, wx = rt.static_plan_from(plan)

    # gather-only: per group, gather the brick rows and reduce them; skip all
    # per-sample coordinate math and the U contraction. Uses the REAL anchor
    # indices (first sample's locate) so the access pattern matches.
    import jax

    ys_np, xs_np, zs_np = sc['ys'], sc['xs'], sc['zs']
    ny, nx = ys_np.size, xs_np.size
    from raider_tpu.ops.interp import _locate as _loc

    @jax.jit
    def gather_only(table2d, bnd_y, bnd_x, bnd_z, d2, ray_len, re_local):
        n = bnd_y.shape[1]
        acc = jnp.zeros(n, table2d.dtype)
        for za, samples in groups:
            lv, f = samples[0][0], samples[0][1]
            py = bnd_y[lv] + f * (bnd_y[lv + 1] - bnd_y[lv])
            px = bnd_x[lv] + f * (bnd_x[lv + 1] - bnd_x[lv])
            iy, _fy, _by = _loc(ys_np, py)
            ix, _fx, _bx = _loc(xs_np, px)
            lin = (za * ny + iy) * nx + ix
            lin = jax.lax.optimization_barrier((lin, acc))[0]
            brick = jnp.take(table2d, lin, axis=0)
            acc = acc + brick.sum(axis=1)
        return acc

    t_gather = time_fn(lambda b: gather_only(packed2d, by_d + b, bx_d + b,
                                              bz_d, d2_d, rl_d, re_d))
    print(json.dumps(dict(variant='gather_only', t_s=round(t_gather, 4))),
          flush=True)

    # gather+MATERIALIZE: same gathers but the brick is forced out to HBM
    # (optimization_barrier stops XLA fusing the take into the reduce) and
    # read back — the exact traffic pattern the production pallas_call
    # imposes (take writes the (N, width) brick; the kernel reads it).
    @jax.jit
    def gather_mat(table2d, bnd_y, bnd_x, bnd_z, d2, ray_len, re_local):
        n = bnd_y.shape[1]
        acc = jnp.zeros(n, table2d.dtype)
        for za, samples in groups:
            lv, f = samples[0][0], samples[0][1]
            py = bnd_y[lv] + f * (bnd_y[lv + 1] - bnd_y[lv])
            px = bnd_x[lv] + f * (bnd_x[lv + 1] - bnd_x[lv])
            iy, _fy, _by = _loc(ys_np, py)
            ix, _fx, _bx = _loc(xs_np, px)
            lin = (za * ny + iy) * nx + ix
            lin = jax.lax.optimization_barrier((lin, acc))[0]
            brick = jnp.take(table2d, lin, axis=0)
            brick = jax.lax.optimization_barrier(brick)
            acc = acc + brick.sum(axis=1)
        return acc

    t_gm = time_fn(lambda b: gather_mat(packed2d, by_d + b, bx_d + b,
                                        bz_d, d2_d, rl_d, re_d))
    print(json.dumps(dict(variant='gather_materialized', t_s=round(t_gm, 4))),
          flush=True)

    # arith-only: full program with the gather replaced by one broadcast row
    def make_arith_only():
        @jax.jit
        def run(table2d, bnd_y, bnd_x, bnd_z, d2, ray_len, re_local):
            cdt = table2d.dtype
            n = bnd_y.shape[1]
            acc_w = jnp.zeros(n, cdt)
            acc_h = jnp.zeros(n, cdt)
            for za, samples in groups:
                persample = []
                ay = ax = None
                for (lv, f, wal, wav, wbl, wbv, zlo, zinv, dzo) in samples:
                    py = bnd_y[lv] + f * (bnd_y[lv + 1] - bnd_y[lv])
                    px = bnd_x[lv] + f * (bnd_x[lv + 1] - bnd_x[lv])
                    pz = bnd_z[lv] + f * (bnd_z[lv + 1] - bnd_z[lv])
                    hbar = 0.5 * (bnd_z[lv] + bnd_z[lv + 1])
                    pz = pz - f * (1.0 - f) * d2[lv] / (2.0 * (re_local + hbar))
                    pz = jnp.clip(pz, zs_np[0], zs_np[-1])
                    bz = (pz >= zs_np[0]) & (pz <= zs_np[-1])
                    iy, fy, by = _loc(ys_np, py)
                    ix, fx, bx = _loc(xs_np, px)
                    fz = (pz - zlo) * zinv
                    rl = wav * ray_len[wal] + (wbv * ray_len[wbl] if wbv else 0.0)
                    persample.append((iy, ix, fy.astype(cdt), fx.astype(cdt),
                                      fz.astype(cdt), bz & by & bx,
                                      (1.0e-6 * rl).astype(cdt), dzo))
                    ay = iy if ay is None else jnp.minimum(ay, iy)
                    ax = ix if ax is None else jnp.minimum(ax, ix)
                # broadcast of a single row instead of the scattered gather
                brick = jnp.broadcast_to(table2d[0], (n, table2d.shape[1]))
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
                        for li in range(3):
                            wkl = wys[k] * wxs[li]
                            for dj, wj in ((dzo, w0), (dzo + 1, w1)):
                                t = wj * wkl
                                U[dj][k][li] = (t if U[dj][k][li] is None
                                                else U[dj][k][li] + t)
                for j in range(planes):
                    for k in range(3):
                        for li in range(3):
                            if U[j][k][li] is not None:
                                acc_w = acc_w + brick[:, j, k, li, 0] * U[j][k][li]
                                acc_h = acc_h + brick[:, j, k, li, 1] * U[j][k][li]
            return acc_w, acc_h
        return run

    arith = make_arith_only()
    t_arith = time_fn(lambda b: arith(packed2d, by_d + b, bx_d + b, bz_d,
                                       d2_d, rl_d, re_d))
    print(json.dumps(dict(variant='arith_only', t_s=round(t_arith, 4))),
          flush=True)


if __name__ == '__main__':
    main()
