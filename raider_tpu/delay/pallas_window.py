"""Windowed Pallas integration kernel: dense VMEM windows instead of
scattered HBM gathers.

The XLA brick kernel (delay.raytrace._integrate_bricks) is gather-COUNT
bound: ~135M scattered 504-byte rows/s through XLA's gather, ~68 GB/s
effective against ~800 GB/s of HBM (measured ablation in
delay/raytrace.py:23-31). Its own module doc names "a fundamentally denser
access pattern" as the only remaining lever. This kernel is that pattern:

  * Rays are OUTPUT-GRID PIXELS: a 16x64-pixel tile of rays samples a small
    contiguous window of the weather cube at each level group (the group
    plan already bounds per-ray horizontal motion to one cell -
    delay.raytrace.build_group_plan). For real orbit geometry every ray in
    a tile shares (nearly) one look direction, so the tile's whole window
    at a group is ~(planes, <=WY, <=128) cells.
  * Each (tile, group) step DMAs that window VMEM-side ONCE (two dense
    strided copies, ~100 KB) instead of 1024 scattered row-gathers.
  * Per-ray cell selection runs as an exact one-hot x-blend matmul on the
    MXU - lhs rows carry (1-fx, fx) at (dx, dx+1) - with
    ``precision=HIGHEST`` so neither weights nor cube values round through
    bfloat16 (default MXU precision corrupts values; see the
    one-hot-gather note in delay/raytrace.py and docs/performance.md).
    The per-ray (plane, y) mix is a cheap VPU weighted reduction.

Applicability: the window is STATIC per compile (WY buckets); a host-side
pre-pass measures each tile's true per-group spread and the wrapper falls
back to the brick kernel whenever any tile would overflow its window
(e.g. random-azimuth ray batches) or the grid axes are non-uniform.
NaN semantics, the sampling plan, trapezoid weights, and the sagitta
correction replicate delay.raytrace._integrate_bricks exactly.

STATUS - EXPERIMENTAL, NOT the production path. Measured on v5e (262k
coherent rays, 50-level HRRR-sized cube, 12 groups): correct to 4e-7
relative vs the brick kernel but 28x SLOWER (2351 ms vs 84 ms). Two
hardware constraints kill the expected win:
  * HBM arrays are (8,128)-tile addressed, so window DMA anchors must be
    quantized (y to 8, x to 128) - the x window becomes 256 cells wide
    regardless of the true ~24-cell spread, and the one-hot contraction
    pays K=256 for 2 useful lanes (~3.3M MAC/ray at 6-pass f32-exact
    MXU precision, ~1.6x the brick kernel's total cost at BEST);
  * per-sample dynamic slicing of the (L, TILE) ray blocks along the
    SUBLANE dim lowers to expensive per-row shuffles (~0.4 ms/grid-step).
The XLA brick gather therefore remains the production integrate path
(delay/raytrace.py); this module is kept as the measured prototype with
interpret-mode equivalence tests (VERDICT r1 item 2b writeup in
BASELINE.md).

Reference semantics replaced: tools/RAiDER/delay.py:286-323 (triple loop),
scipy RegularGridInterpolator gathers.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

WX = 256          # window width in cube x cells: HBM arrays are stored
                  # (8,128)-tiled, so DMA offsets must be 128-aligned in x
                  # and 8-aligned in y; two lane tiles absorb the x slack
TILE_Y = 8        # ray tile = TILE_Y x TILE_X output pixels: favor x,
TILE_X = 64       # where the window has the most headroom (512 rays/tile
                  # keeps the kernel's VMEM stack well under the 16 MB cap)
TILE = TILE_Y * TILE_X
WY_BUCKETS = (8, 16, 32, 40)


def _uniform_params(axis_np):
    axis_np = np.asarray(axis_np, dtype=np.float64)
    n = axis_np.size
    if n < 2:
        return None
    diffs = np.diff(axis_np)
    if not np.allclose(diffs, diffs[0], rtol=1e-6, atol=0.0):
        return None
    step = (float(axis_np[-1]) - float(axis_np[0])) / (n - 1)
    return float(axis_np[0]), float(axis_np[-1]), step, n


def _kernel(ay_ref, ax_ref, za_ref, lvl_ref, frac_ref, wal_ref, wa_ref,
            wbl_ref, wb_ref, dzo_ref, zlo_ref, zinv_ref, pad_ref,
            low_y, low_x, low_z, high_y, high_x, high_z, d2_ref, rl_ref,
            re_ref, cube_w_hbm, cube_h_hbm,
            out_w, out_h,
            win_w, win_h, sems,
            *, G, planes, WY, ylo, yinv, ny, xlo, xinv, nx,
            zs0, zs1, z_clip):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        out_w[...] = jnp.zeros_like(out_w)
        out_h[...] = jnp.zeros_like(out_h)

    # the wrapper quantizes anchors to the HBM (8,128) tiling; the hint
    # lets Mosaic prove the DMA slice offsets are tile-aligned
    ay = pl.multiple_of(ay_ref[i, g], 8)
    ax = pl.multiple_of(ax_ref[i, g], 128)
    za = za_ref[g]

    cw = pltpu.make_async_copy(
        cube_w_hbm.at[pl.ds(za, planes), pl.ds(ay, WY), pl.ds(ax, WX)],
        win_w, sems.at[0])
    ch = pltpu.make_async_copy(
        cube_h_hbm.at[pl.ds(za, planes), pl.ds(ay, WY), pl.ds(ax, WX)],
        win_h, sems.at[1])
    cw.start()
    ch.start()
    cw.wait()
    ch.wait()

    # matmul RHS per cube: (planes*WY, WX)
    rhs_w = win_w[...].reshape(planes * WY, WX)
    rhs_h = win_h[...].reshape(planes * WY, WX)

    re = re_ref[0, :]

    # samples iterate through a fori_loop (NOT a python unroll): unrolling
    # G iterations keeps every iteration's (TILE, WX)-sized temporaries
    # live at once and overflows the 16 MB VMEM stack
    def sample_body(s, carry):
        acc_w, acc_h = carry
        lanes = jax.lax.broadcasted_iota(jnp.int32, (TILE, WX), 1)
        # flat (plane, y) index decomposition for the 2-D mix weights
        # (Mosaic cannot reshape the matmul result to 4-D)
        jdx = jax.lax.broadcasted_iota(jnp.int32, (TILE, planes * WY), 1)
        jp = jdx // WY
        jk = jdx - jp * WY
        lvl = lvl_ref[g, s]
        f = frac_ref[g, s]
        ly = low_y[pl.ds(lvl, 1), :].reshape(TILE)
        lx = low_x[pl.ds(lvl, 1), :].reshape(TILE)
        lz = low_z[pl.ds(lvl, 1), :].reshape(TILE)
        hy = high_y[pl.ds(lvl, 1), :].reshape(TILE)
        hx = high_x[pl.ds(lvl, 1), :].reshape(TILE)
        hz = high_z[pl.ds(lvl, 1), :].reshape(TILE)
        dd2 = d2_ref[pl.ds(lvl, 1), :].reshape(TILE)

        py = ly + f * (hy - ly)
        px = lx + f * (hx - lx)
        pz = lz + f * (hz - lz)
        hbar = 0.5 * (lz + hz)
        pz = pz - f * (1.0 - f) * dd2 / (2.0 * (re + hbar))
        if z_clip:
            pz = jnp.clip(pz, zs0, zs1)
        bz = (pz >= zs0) & (pz <= zs1)

        posy = (py - ylo) * yinv
        iy = jnp.clip(jnp.floor(posy), 0.0, float(ny - 2))
        fy = posy - iy
        by = (py >= ylo) & (posy <= float(ny - 1))
        posx = (px - xlo) * xinv
        ix = jnp.clip(jnp.floor(posx), 0.0, float(nx - 2))
        fx = posx - ix
        bx = (px >= xlo) & (posx <= float(nx - 1))

        dy = iy.astype(jnp.int32) - ay
        dx = ix.astype(jnp.int32) - ax
        dzo = dzo_ref[g, s]
        fz = (pz - zlo_ref[g, s]) * zinv_ref[g, s]
        ok = (by & bx & bz
              & (dy >= 0) & (dy <= WY - 2)
              & (dx >= 0) & (dx <= WX - 2))

        # exact x one-hot blend rows: (1-fx) at dx, fx at dx+1; zero when
        # the sample is invalid (-2 so neither dxc nor dxc+1 hits a lane;
        # the value is replaced by NaN below)
        dxc = jnp.where(ok, dx, -2)[:, None]
        fxb = fx[:, None].astype(jnp.float32)
        ohx = (jnp.where(lanes == dxc, 1.0 - fxb, 0.0)
               + jnp.where(lanes == dxc + 1, fxb, 0.0))

        dims = (((1,), (1,)), ((), ()))
        sel_w = jax.lax.dot_general(
            ohx, rhs_w, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)     # (TILE, planes*WY)
        sel_h = jax.lax.dot_general(
            ohx, rhs_h, dims, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

        # per-ray (plane, y) one-hot mix weights on the VPU, 2-D over the
        # flattened (plane, y) axis
        fzb = fz[:, None]
        fyb = fy[:, None]
        dyc = dy[:, None]
        wz = (jnp.where(jp == dzo, 1.0 - fzb, 0.0)
              + jnp.where(jp == dzo + 1, fzb, 0.0))
        wyv = (jnp.where(jk == dyc, 1.0 - fyb, 0.0)
               + jnp.where(jk == dyc + 1, fyb, 0.0))
        mix = wz * wyv                               # (TILE, planes*WY)
        vw = jnp.where(ok, jnp.sum(sel_w * mix, axis=1), jnp.nan)
        vh = jnp.where(ok, jnp.sum(sel_h * mix, axis=1), jnp.nan)

        rl = (wa_ref[g, s] * rl_ref[pl.ds(wal_ref[g, s], 1), :].reshape(TILE)
              + wb_ref[g, s] * rl_ref[pl.ds(wbl_ref[g, s], 1), :].reshape(TILE))
        wt = 1.0e-6 * rl
        is_pad = pad_ref[g, s] != 0
        acc_w = acc_w + jnp.where(is_pad, 0.0, wt * vw)
        acc_h = acc_h + jnp.where(is_pad, 0.0, wt * vh)

        return acc_w, acc_h

    acc_w, acc_h = jax.lax.fori_loop(
        0, G, sample_body,
        (jnp.zeros((TILE,), jnp.float32), jnp.zeros((TILE,), jnp.float32)))

    out_w[...] = out_w[...] + acc_w.reshape(1, TILE)
    out_h[...] = out_h[...] + acc_h.reshape(1, TILE)


@partial(jax.jit, static_argnames=('G', 'planes', 'WY', 'yparams', 'xparams',
                                   'zs0', 'zs1', 'z_clip', 'interpret'))
def _run_windowed(ay, ax, za, lvl, frac, wal, wa, wbl, wb, dzo, zlo, zinv,
                  pad, low_y, low_x, low_z, high_y, high_x, high_z, d2, rl,
                  re2, cube_w, cube_h,
                  G: int, planes: int, WY: int, yparams, xparams,
                  zs0: float, zs1: float, z_clip: bool, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles = ay.shape[0]
    n_groups = ay.shape[1]
    L = low_y.shape[0]
    ylo, _, ystep, ny = yparams
    xlo, _, xstep, nx = xparams

    # (1, TILE) blocks must tile a (1, n) array (the TPU lowering requires
    # the sublane block dim to divide 8 or equal the array dim)
    ray_spec = pl.BlockSpec((L, TILE), lambda i, g, *_: (0, i),
                            memory_space=pltpu.VMEM)
    re_spec = pl.BlockSpec((1, TILE), lambda i, g, *_: (0, i),
                           memory_space=pltpu.VMEM)
    cube_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec((1, TILE), lambda i, g, *_: (0, i),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=13,
        grid=(n_tiles, n_groups),
        in_specs=[ray_spec] * 8 + [re_spec, cube_spec, cube_spec],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((planes, WY, WX), jnp.float32),
            pltpu.VMEM((planes, WY, WX), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = partial(
        _kernel, G=G, planes=planes, WY=WY,
        ylo=np.float32(ylo), yinv=np.float32(1.0 / ystep), ny=ny,
        xlo=np.float32(xlo), xinv=np.float32(1.0 / xstep), nx=nx,
        zs0=np.float32(zs0), zs1=np.float32(zs1), z_clip=z_clip,
    )
    out_shape = jax.ShapeDtypeStruct((1, n_tiles * TILE), jnp.float32)
    with jax.enable_x64(False):
        wet, hyd = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=(out_shape, out_shape),
            interpret=interpret,
        )(ay, ax, za, lvl, frac, wal, wa, wbl, wb, dzo, zlo, zinv, pad,
          low_y, low_x, low_z, high_y, high_x, high_z, d2, rl,
          re2, cube_w, cube_h)
    return wet.reshape(-1), hyd.reshape(-1)


@partial(jax.jit, static_argnames=('n_tiles', 'yparams', 'xparams'))
def _window_anchors(low_y, low_x, low_z, high_y, high_x, high_z, d2, re,
                    lvl, frac, pad, n_tiles: int, yparams, xparams):
    """Per-(tile, group) min cell indices + max spreads (XLA pre-pass).

    Replicates the kernel's coordinate math exactly so dy/dx land inside
    the window whenever the reported spread fits it.
    """
    ylo, _, ystep, ny = yparams
    xlo, _, xstep, nx = xparams
    big = np.int32(1 << 30)

    def per_group(args):
        lvl_g, frac_g, pad_g = args   # (G,) each

        def per_sample(s_args):
            lv, f, pd = s_args
            ly = jnp.take(low_y, lv, axis=0)
            lx = jnp.take(low_x, lv, axis=0)
            lz = jnp.take(low_z, lv, axis=0)
            hy = jnp.take(high_y, lv, axis=0)
            hx = jnp.take(high_x, lv, axis=0)
            hz = jnp.take(high_z, lv, axis=0)
            dd2 = jnp.take(d2, lv, axis=0)
            py = ly + f * (hy - ly)
            px = lx + f * (hx - lx)
            pz = lz + f * (hz - lz)
            hbar = 0.5 * (lz + hz)
            pz = pz - f * (1.0 - f) * dd2 / (2.0 * (re + hbar))
            posy = (py - ylo) / ystep
            posx = (px - xlo) / xstep
            iy = jnp.clip(jnp.floor(posy), 0.0, ny - 2)
            ix = jnp.clip(jnp.floor(posx), 0.0, nx - 2)
            # out-of-bounds samples are NaN-destined in the kernel; they
            # must not inflate the window spread
            invalid = (jnp.isnan(py) | jnp.isnan(px) | pd
                       | (py < ylo) | (posy > ny - 1)
                       | (px < xlo) | (posx > nx - 1))
            iy = jnp.where(invalid, jnp.float32(big), iy).astype(jnp.int32)
            ix = jnp.where(invalid, jnp.float32(big), ix).astype(jnp.int32)
            return iy, ix

        iys, ixs = jax.lax.map(per_sample, (lvl_g, frac_g, pad_g))  # (G, N)
        iy_t = iys.reshape(iys.shape[0], n_tiles, TILE)
        ix_t = ixs.reshape(ixs.shape[0], n_tiles, TILE)
        ay = jnp.min(iy_t, axis=(0, 2))
        ax = jnp.min(ix_t, axis=(0, 2))
        my = jnp.max(jnp.where(iy_t >= big, -1, iy_t), axis=(0, 2))
        mx = jnp.max(jnp.where(ix_t >= big, -1, ix_t), axis=(0, 2))
        return ay, ax, my, mx

    ay, ax, my, mx = jax.lax.map(per_group, (lvl, frac, pad != 0))
    # (n_groups, n_tiles) -> (n_tiles, n_groups)
    return ay.T, ax.T, my.T, mx.T


def integrate_rays_windowed(cube_wet, cube_hydro, ys, xs, zs,
                            low_yxz, high_yxz, d2, ray_len, re_local,
                            plan, ray_grid_shape,
                            z_clip: bool = True, interpret: bool = False):
    """Windowed-tile integration over a (ny_out, nx_out) pixel grid of rays.

    Returns (wet, hydro, used) - ``used`` False means a tile's window
    requirement exceeded the largest bucket (incoherent ray batch) or an
    axis is non-uniform; the caller must fall back to the brick kernel.
    """
    ys_np, xs_np, zs_np = (np.asarray(a, np.float64) for a in (ys, xs, zs))
    yparams = _uniform_params(ys_np)
    xparams = _uniform_params(xs_np)
    if yparams is None or xparams is None:
        return None, None, False

    nyo, nxo = ray_grid_shape
    L, n_rays = np.shape(ray_len)[:2]
    if n_rays != nyo * nxo:
        return None, None, False
    nz, ny, nx = np.shape(cube_wet)
    planes = int(plan.planes)
    if nz < planes or ny < max(WY_BUCKETS) + 8:
        return None, None, False

    # ---- tile mapping: (nyo, nxo) pixels -> (n_tiles, TILE) ray order
    typ = -(-nyo // TILE_Y) * TILE_Y
    txp = -(-nxo // TILE_X) * TILE_X
    pix = np.arange(nyo * nxo).reshape(nyo, nxo)
    pix = np.pad(pix, ((0, typ - nyo), (0, txp - nxo)), mode='edge')
    tiles = pix.reshape(typ // TILE_Y, TILE_Y, txp // TILE_X, TILE_X)
    perm = tiles.transpose(0, 2, 1, 3).reshape(-1)      # (n_tiles*TILE,)
    n_tiles = perm.size // TILE

    def reorder(a, axis):
        return jnp.take(jnp.asarray(a, jnp.float32), jnp.asarray(perm),
                        axis=axis)

    low = reorder(low_yxz, 1)
    high = reorder(high_yxz, 1)
    d2_t = reorder(d2, 1)
    rl_t = reorder(ray_len, 1)
    re_t = reorder(re_local, 0).reshape(1, n_tiles * TILE)

    lvl = jnp.asarray(plan.lvl, jnp.int32)
    frac = jnp.asarray(plan.frac, jnp.float32)
    padp = jnp.asarray(plan.pad.astype(np.int32))

    ay, ax, my, mx = _window_anchors(
        low[..., 0], low[..., 1], low[..., 2],
        high[..., 0], high[..., 1], high[..., 2], d2_t,
        jnp.asarray(re_t.reshape(-1)),
        lvl, frac, padp, n_tiles=n_tiles,
        yparams=yparams, xparams=xparams)
    ay_np, ax_np, my_np, mx_np = (np.asarray(v) for v in (ay, ax, my, mx))

    # anchors must land on the HBM (8,128) tiling: quantize down and absorb
    # the slack in the window size. Spreads must fit the windows AFTER the
    # in-bounds clip below - clipping moves anchors down, growing the
    # effective spread, so a pre-clip check wrongly admits rays near the
    # top rows (e.g. ny=54, iy=53: pre-clip anchor 48 passes an 8-bucket,
    # the clip to 40 makes dy=13 and the kernel NaNs those pixels). The +2
    # covers the upper-cell corner; all-invalid (tile, group) pairs have
    # my = -1 << ay and drop out.
    ay_np = (ay_np // 8) * 8
    ax_np = (ax_np // 128) * 128

    nxp = -(-nx // 128) * 128
    if nxp < WX:
        nxp = WX
    ax_np = np.clip(np.minimum(ax_np, nxp - WX), 0, max(nxp - WX, 0))
    spread_x = int(np.maximum(mx_np - ax_np, -1).max(initial=-1)) + 2
    if spread_x > WX:
        return None, None, False

    # pick the smallest y bucket whose CLIPPED anchors still fit the spread
    wy = None
    for b in WY_BUCKETS:
        ay_b = np.clip(np.minimum(ay_np, ((ny - b) // 8) * 8), 0,
                       max(ny - b, 0))
        if int(np.maximum(my_np - ay_b, -1).max(initial=-1)) + 2 <= b:
            wy = b
            ay_np = ay_b
            break
    if wy is None:
        return None, None, False

    # z anchors: shift so [za, za+planes) is in-bounds, adjust dzoff
    za = np.asarray(plan.anchor, np.int32)
    za_s = np.minimum(za, max(nz - planes, 0))
    dzo = np.asarray(plan.dzoff, np.int32) + (za - za_s)[:, None]

    cw = jnp.asarray(cube_wet, jnp.float32)
    chh = jnp.asarray(cube_hydro, jnp.float32)
    if nxp != nx:
        cw = jnp.pad(cw, ((0, 0), (0, 0), (0, nxp - nx)))
        chh = jnp.pad(chh, ((0, 0), (0, 0), (0, nxp - nx)))

    wet_t, hyd_t = _run_windowed(
        jnp.asarray(ay_np, jnp.int32), jnp.asarray(ax_np, jnp.int32),
        jnp.asarray(za_s, jnp.int32), lvl, frac,
        jnp.asarray(plan.wa_lvl, jnp.int32), jnp.asarray(plan.wa, jnp.float32),
        jnp.asarray(plan.wb_lvl, jnp.int32), jnp.asarray(plan.wb, jnp.float32),
        jnp.asarray(dzo, jnp.int32), jnp.asarray(plan.zlo, jnp.float32),
        jnp.asarray(plan.zinv, jnp.float32), padp,
        low[..., 0], low[..., 1], low[..., 2],
        high[..., 0], high[..., 1], high[..., 2],
        d2_t, rl_t, jnp.asarray(re_t),
        cw, chh,
        G=int(plan.G), planes=planes, WY=wy,
        yparams=yparams, xparams=xparams,
        zs0=float(zs_np[0]), zs1=float(zs_np[-1]),
        z_clip=z_clip, interpret=interpret)

    # undo the tile permutation: first tile-order position of each source
    # pixel (edge-padding duplicates some sources; any copy is identical)
    order = np.argsort(perm, kind='stable')
    _, first_pos = np.unique(perm[order], return_index=True)
    sel = jnp.asarray(order[first_pos])
    return jnp.take(wet_t, sel), jnp.take(hyd_t, sel), True
