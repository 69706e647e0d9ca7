"""Fused raytracing integration kernel.

The reference integrates rays with a triple Python loop - per model level,
per segment fraction, per interpolator - calling scipy's gather-based
interpolator each time (reference: tools/RAiDER/delay.py:286-323). Here the
whole sampling plan (every contributing model level x segment fraction) is
flattened into one batched device computation: generate sample coordinates,
trilinearly interpolate both refractivity cubes, and accumulate trapezoid
weights, in a single jit-compiled program over millions of rays.

Performance design (measured on TPU v5e): the kernel is gather-COUNT bound
(~0.15 G gathers/s through XLA regardless of payload size), so both
refractivity fields and all trilinear corner values are packed into one
gather row per sample:

  * PACK16: row(z, y, x) = all 8 cell corners x {wet, hydro} -> 1 gather per
    sample (8x memory; used when the packed cube fits comfortably in HBM)
  * PACK4: row(z, y, x) = {wet, hydro} x {x, x+1} -> 4 gathers per sample
    (2x memory fallback for very large cubes)

measured 3.4x (PACK4) to ~10x (PACK16) over the naive 16-gather form.

Coordinate precision: ray segment ENDPOINTS are computed exactly (f64, host
CPU) in model CRS; interior sample coordinates are linear interpolation in
model space plus an analytic chord-sagitta height correction,

    h(f) = lerp(h0, h1, f) - f (1-f) D^2 / (2 (Re + h))

with D^2 the squared horizontal chord length. This reproduces the reference's
ECEF-lerp-then-reproject sample heights to O(D^4 / R^3) (< 0.1 mm for 5 km
segments) without needing f64 transforms per sample on device.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from raider_tpu.constants import MAX_SEGMENT_LENGTH

# switch to the 4-value packing above this packed-cube size
_PACK16_BYTE_LIMIT = 3 * 1024**3

_CORNERS = [(0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
            (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)]


def build_sampling_plan(ray_lengths_max: np.ndarray,
                        max_segment_length: float = MAX_SEGMENT_LENGTH):
    """Static DEDUPLICATED sampling plan from max ray lengths.

    Mirrors the reference's nParts rule (delay.py:283): per level,
    nparts = ceil(max_len / MAX_SEGMENT_LENGTH) + 1 samples at
    linspace(0, 1, nparts), trapezoid end-weights 0.5.

    Because ``build_ray`` produces CONTIGUOUS segments (high[k] == low[k+1],
    both views of one boundary-point array), the f=1 sample of level k and
    the f=0 sample of level k+1 are the same point. The kernel is
    gather-count bound, so each shared boundary point is evaluated ONCE with
    the combined trapezoid weight of both adjacent levels - cutting the
    sample count from sum(nparts) to sum(nparts) - (L-1) (~2x for typical
    nparts=2 plans) with bit-identical sample coordinates and weights.

    Returns (coord_lvl, fracs, wa_lvl, wa, wb_lvl, wb), all (P,): point p is
    at fraction fracs[p] along level coord_lvl[p]'s segment, with weight
    1e-6 * (wa[p]*ray_len[wa_lvl[p]] + wb[p]*ray_len[wb_lvl[p]]).
    """
    n_parts = np.ceil(np.asarray(ray_lengths_max) / max_segment_length).astype(int) + 1
    L = len(n_parts)
    coord_lvl, fracs, wa_lvl, wa, wb_lvl, wb = [], [], [], [], [], []

    def add(lvl, ff, la, ca, lb, cb):
        coord_lvl.append(lvl)
        fracs.append(ff)
        wa_lvl.append(la)
        wa.append(ca)
        wb_lvl.append(lb)
        wb.append(cb)

    for zz, nparts in enumerate(n_parts):
        inv = 1.0 / (nparts - 1.0)
        if zz == 0:
            add(0, 0.0, 0, 0.5 * inv, 0, 0.0)          # bottom boundary
        for j in range(1, nparts - 1):                  # interior samples
            add(zz, j * inv, zz, inv, zz, 0.0)
        if zz + 1 < L:                                  # shared boundary
            inv_next = 1.0 / (n_parts[zz + 1] - 1.0)
            add(zz + 1, 0.0, zz, 0.5 * inv, zz + 1, 0.5 * inv_next)
        else:                                           # top boundary
            add(zz, 1.0, zz, 0.5 * inv, zz, 0.0)
    return (
        np.asarray(coord_lvl, dtype=np.int32),
        np.asarray(fracs),
        np.asarray(wa_lvl, dtype=np.int32),
        np.asarray(wa),
        np.asarray(wb_lvl, dtype=np.int32),
        np.asarray(wb),
    )


@partial(jax.jit, static_argnames=('mode',))
def _pack_cubes(cube_wet, cube_hydro, mode: str):
    """Assemble the packed corner table on device.

    PACK16 rows: [w(c0), h(c0), w(c1), h(c1), ...] for the 8 corners of the
    cell anchored at each grid node; PACK4 rows: [w, h, w(x+1), h(x+1)].
    Out-of-range shifts are zero-filled; anchor indices are always clipped to
    valid cells so the padding is never addressed.
    """
    nz, ny, nx = cube_wet.shape

    def shifted(cube, dz, dy, dx):
        sl = cube[dz:, dy:, dx:]
        return jnp.pad(sl, ((0, dz), (0, dy), (0, dx)))

    if mode == 'pack16':
        rows = []
        for (dz, dy, dx) in _CORNERS:
            rows.append(shifted(cube_wet, dz, dy, dx))
            rows.append(shifted(cube_hydro, dz, dy, dx))
    else:  # pack4
        rows = [
            cube_wet, cube_hydro,
            shifted(cube_wet, 0, 0, 1), shifted(cube_hydro, 0, 0, 1),
        ]
    packed = jnp.stack(rows, axis=-1)
    return packed.reshape(nz * ny * nx, len(rows))


def _locate_uniformish(axis_np, coords):
    """Cell index + fraction + in-bounds along one static ascending axis."""
    axis_np = np.asarray(axis_np)
    n = axis_np.shape[0]
    lo, hi = float(axis_np[0]), float(axis_np[-1])
    in_b = (coords >= lo) & (coords <= hi)
    diffs = np.diff(axis_np)
    if np.allclose(diffs, diffs[0], rtol=1e-6, atol=0.0) and n > 1:
        step = (hi - lo) / (n - 1)
        pos = (coords - lo) / step
        idx = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
        frac = pos - idx
    else:
        grid = jnp.asarray(axis_np, dtype=coords.dtype)
        idx = jnp.clip(jnp.searchsorted(grid, coords, side='right') - 1, 0, n - 2)
        frac = (coords - grid[idx]) / (grid[idx + 1] - grid[idx])
    return idx, frac, in_b


@partial(jax.jit, static_argnames=('ys', 'xs', 'zs', 'z_clip', 'mode'))
def _integrate_packed(
    packed2d,                   # (nz*ny*nx, 16|4) packed corner table
    low_y, low_x, low_z,        # (L, N) segment lower endpoints, model CRS
    high_y, high_x, high_z,     # (L, N) segment upper endpoints
    d2,                         # (L, N) squared horizontal chord length
    ray_len,                    # (L, N) segment lengths [m]
    re_local,                   # (N,) local earth radius [m]
    coord_lvl, fracs, wa_lvl, wa, wb_lvl, wb,  # (P,) dedup sampling plan
    ys, xs, zs,                 # static grid axes
    z_clip, mode,
):
    compute_dtype = packed2d.dtype
    ys_np, xs_np, zs_np = np.asarray(ys), np.asarray(xs), np.asarray(zs)
    ny, nx = ys_np.size, xs_np.size

    def sample_one(lvl, ff, la, ca, lb, cb):
        ly = jnp.take(low_y, lvl, axis=0)
        lx = jnp.take(low_x, lvl, axis=0)
        lz = jnp.take(low_z, lvl, axis=0)
        hy = jnp.take(high_y, lvl, axis=0)
        hx = jnp.take(high_x, lvl, axis=0)
        hz = jnp.take(high_z, lvl, axis=0)
        dd2 = jnp.take(d2, lvl, axis=0)
        rl = ca * jnp.take(ray_len, la, axis=0) + cb * jnp.take(ray_len, lb, axis=0)

        py = ly + ff * (hy - ly)
        px = lx + ff * (hx - lx)
        pz = lz + ff * (hz - lz)
        # chord sagitta: straight ECEF segments dip below the lerped height
        hbar = 0.5 * (lz + hz)
        pz = pz - ff * (1.0 - ff) * dd2 / (2.0 * (re_local + hbar))
        if z_clip:
            pz = jnp.clip(pz, zs_np[0], zs_np[-1])

        iy, fy, by = _locate_uniformish(ys_np, py)
        ix, fx, bx = _locate_uniformish(xs_np, px)
        iz, fz, bz = _locate_uniformish(zs_np, pz)
        lin = (iz * ny + iy) * nx + ix

        fy = fy.astype(compute_dtype)
        fx = fx.astype(compute_dtype)
        fz = fz.astype(compute_dtype)

        if mode == 'pack16':
            g = jnp.take(packed2d, lin, axis=0)  # (N, 16)
            w00 = (1 - fy) * (1 - fx)
            w01 = (1 - fy) * fx
            w10 = fy * (1 - fx)
            w11 = fy * fx
            wlo = g[:, 0] * w00 + g[:, 2] * w01 + g[:, 4] * w10 + g[:, 6] * w11
            hlo = g[:, 1] * w00 + g[:, 3] * w01 + g[:, 5] * w10 + g[:, 7] * w11
            whi = g[:, 8] * w00 + g[:, 10] * w01 + g[:, 12] * w10 + g[:, 14] * w11
            hhi = g[:, 9] * w00 + g[:, 11] * w01 + g[:, 13] * w10 + g[:, 15] * w11
        else:  # pack4: rows hold {w,h} x {x, x+1}; 4 gathers for y/z corners
            g00 = jnp.take(packed2d, lin, axis=0)
            g01 = jnp.take(packed2d, lin + nx, axis=0)
            g10 = jnp.take(packed2d, lin + ny * nx, axis=0)
            g11 = jnp.take(packed2d, lin + ny * nx + nx, axis=0)

            def xl(g):
                return g[:, 0] * (1 - fx) + g[:, 2] * fx, g[:, 1] * (1 - fx) + g[:, 3] * fx

            w00v, h00v = xl(g00)
            w01v, h01v = xl(g01)
            w10v, h10v = xl(g10)
            w11v, h11v = xl(g11)
            wlo = w00v * (1 - fy) + w01v * fy
            hlo = h00v * (1 - fy) + h01v * fy
            whi = w10v * (1 - fy) + w11v * fy
            hhi = h10v * (1 - fy) + h11v * fy

        vw = wlo * (1 - fz) + whi * fz
        vh = hlo * (1 - fz) + hhi * fz
        ok = by & bx & bz
        vw = jnp.where(ok, vw, jnp.nan)
        vh = jnp.where(ok, vh, jnp.nan)
        wt = 1.0e-6 * rl
        return (wt * vw).astype(compute_dtype), (wt * vh).astype(compute_dtype)

    def body(carry, plan_s):
        acc_w, acc_h = carry
        lvl, ff, la, ca, lb, cb = plan_s
        dw, dh = sample_one(lvl, ff, la, ca, lb, cb)
        return (acc_w + dw, acc_h + dh), None

    n = low_y.shape[1]
    init = (jnp.zeros(n, compute_dtype), jnp.zeros(n, compute_dtype))
    plan = (
        jnp.asarray(coord_lvl, jnp.int32),
        jnp.asarray(fracs, compute_dtype),
        jnp.asarray(wa_lvl, jnp.int32),
        jnp.asarray(wa, compute_dtype),
        jnp.asarray(wb_lvl, jnp.int32),
        jnp.asarray(wb, compute_dtype),
    )
    (wet, hydro), _ = jax.lax.scan(body, init, plan)
    return wet, hydro


def pack_mode_for(cube_shape, dtype) -> str:
    """Choose the packing by HBM footprint of the packed table."""
    nbytes16 = int(np.prod(cube_shape)) * 16 * np.dtype(dtype).itemsize
    return 'pack16' if nbytes16 <= _PACK16_BYTE_LIMIT else 'pack4'


def integrate_rays(
    cube_wet, cube_hydro, ys, xs, zs,
    low_yxz, high_yxz, d2, ray_len, re_local,
    ray_lengths_max,
    max_segment_length: float = MAX_SEGMENT_LENGTH,
    z_clip: bool = True,
    packed2d=None,
    mode=None,
):
    """Integrate wet/hydro delay along all rays for one output height slice.

    Args:
        cube_wet/hydro: (nz, ny, nx) pointwise refractivity cubes.
        ys, xs, zs:     grid axes (numpy, ascending).
        low_yxz/high_yxz: (L, N, 3) segment endpoints in model CRS (y, x, z).
        d2:             (L, N) squared horizontal chord lengths [m^2].
        ray_len:        (L, N) segment lengths [m].
        re_local:       (N,) local earth radii for the sagitta correction.
        ray_lengths_max: (L,) per-level max segment length (sets nParts).
        packed2d/mode:  optionally pass a precomputed pack (see
                        :func:`pack_cubes`) to amortize packing across slices.

    Returns:
        (wet_delay (N,), hydro_delay (N,)) in meters.
    """
    plan = build_sampling_plan(ray_lengths_max, max_segment_length)
    if packed2d is None:
        packed2d, mode = pack_cubes(cube_wet, cube_hydro)
    dtype = packed2d.dtype
    return _integrate_packed(
        packed2d,
        jnp.asarray(low_yxz[..., 0], dtype), jnp.asarray(low_yxz[..., 1], dtype),
        jnp.asarray(low_yxz[..., 2], dtype),
        jnp.asarray(high_yxz[..., 0], dtype), jnp.asarray(high_yxz[..., 1], dtype),
        jnp.asarray(high_yxz[..., 2], dtype),
        jnp.asarray(d2, dtype), jnp.asarray(ray_len, dtype),
        jnp.asarray(re_local, dtype),
        *plan,
        ys=tuple(np.asarray(ys).tolist()),
        xs=tuple(np.asarray(xs).tolist()),
        zs=tuple(np.asarray(zs).tolist()),
        z_clip=z_clip,
        mode=mode,
    )


def pack_cubes(cube_wet, cube_hydro, mode=None):
    """Build the packed corner table; returns (packed2d, mode)."""
    cube_wet = jnp.asarray(cube_wet)
    cube_hydro = jnp.asarray(cube_hydro)
    if mode is None:
        mode = pack_mode_for(cube_wet.shape, cube_wet.dtype)
    return _pack_cubes(cube_wet, cube_hydro, mode), mode
