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
  * PACK16_I16: the same rows quantized to per-field affine int16 -> still
    1 gather per sample at HALF the table bytes (covers full-CONUS-HRRR
    ~95M-cell cubes whose f32 table exceeds the limit); < 0.03 mm
    worst-case quantization impact, NaN via the -32768 sentinel
  * PACK4: row(z, y, x) = {wet, hydro} x {x, x+1} -> 4 gathers per sample
    (2x memory floor for cubes past even the int16 window)
  * BRICK / BRICK_I16: grouped-gather rows (planes x wy x wx x {wet,
    hydro}); one gather serves a whole GROUP of samples (~11 gathers/ray
    vs PACK16's ~58). f32 where its table fits (i16 measured slower
    there: the in-kernel dequant outweighs the halved bytes); the int16
    form auto-covers the CAPACITY band where only the half-size table
    fits (~12.6M-25.2M cells: measured 6.4x over the pack16 fallback,
    0.019 mm max dev, round 5)

measured 3.4x (PACK4) to ~10x (PACK16) over the naive 16-gather form;
16-bit rows gather at the same wall time as f32 rows (gather-count bound,
scripts/probe_f16.py).

Ablation on v5e (1M rays, HRRR-sized cube, 11 brick groups/ray): full kernel
265 ms = gather+index 112 ms + per-sample arithmetic ~98 ms + non-overlap.
A raw jnp.take of the same 11M x 126-f32 rows runs 81 ms (~135 Mrows/s,
68 GB/s — the XLA scattered-row ceiling on this chip; sorted indices don't
help, and a one-per-group coefficient-tensor contraction reproduces the
result to 1e-7 but saves nothing because XLA materializes the temps either
way). The kernel is therefore within ~2.4x of the hardware scattered-gather
limit for this row size; further speedup requires fewer/fatter rows (wider
bricks) or a fundamentally denser access pattern, not instruction tuning.

Coordinate precision: ray segment ENDPOINTS are computed exactly (f64, host
CPU) in model CRS; interior sample coordinates are linear interpolation in
model space plus an analytic chord-sagitta height correction,

    h(f) = lerp(h0, h1, f) - f (1-f) D^2 / (2 (Re + h))

with D^2 the squared horizontal chord length. This reproduces the reference's
ECEF-lerp-then-reproject sample heights to O(D^4 / R^3) (< 0.1 mm for 5 km
segments) without needing f64 transforms per sample on device.
"""

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from raider_tpu.constants import MAX_SEGMENT_LENGTH

# cell location shares ops.interp's bracketing (uniform fast path,
# searchsorted otherwise, degenerate single-node axes clamp to cell 0):
# ONE definition keeps the integrate kernels and interp3d_points on
# identical boundary semantics
from raider_tpu.ops.interp import _locate as _locate_uniformish

# switch to the 4-value packing above this packed-cube size
_PACK16_BYTE_LIMIT = 3 * 1024**3

# Quantized PACK16 (scaled int16 rows): keeps 1-gather-per-sample for cubes
# whose f32 PACK16 table would blow _PACK16_BYTE_LIMIT. Probe verdict
# (scripts/probe_f16.py on v5e, BASELINE.md "16-bit packed rows"): 16-bit
# 128-lane row gathers run at the same wall time as f32 126-lane rows (the
# kernel is gather-COUNT bound), Mosaic loads+converts int16 exactly, and
# f16 is rejected by the compiler — so fixed-point int16 halves the table at
# zero kernel cost. Per-field affine quantization (v ~ raw * scale + off,
# raw in [-32767, 32767]) bounds the delay error by ~range/65534 * path
# length: < 0.03 mm worst-case fully-correlated for refractivity ranges of
# real weather cubes, measured 100x under the 0.1 mm parity promise
# (tests/test_raytrace_i16.py). -32768 is the NaN sentinel.
_PACK16_I16_BYTE_LIMIT = 6 * 1024**3
_I16_NAN = -32768

# Brick (grouped-gather) table geometry: a row holds planes x wy x wx x
# {wet, hydro} corner values. Wider bricks admit more samples per group
# (motion bound min(wy,wx)-2 cells, z-span bound planes-2), i.e. FEWER
# gathers at a larger table — but they LOSE end to end: measured on v5e
# (1M rays, 50-level cube, scripts/kernel_profile.py), (8,4,4,24) = 7
# gathers ran 258 ms (XLA contraction) / 144 ms (Pallas) vs (7,3,3,6) = 11
# gathers at 214 / 134 ms, at double the table (8.2 vs 4.0 GB: rows pad to
# 128-lane tiles in HBM, so 126-f32 rows are pad-free). Fewer-but-fatter
# gathers save less than the wider contraction costs, so the one-tile row
# stays the only production spec; the ladder form remains for re-ablation.
_BRICK_SPECS = (
    # (planes, wy, wx, group_max, byte_limit)
    (7, 3, 3, 6, 6 * 1024**3),
)
# legacy aliases (the final-ladder fallback spec): tests and scripts
# reference these for the conservative geometry
_BRICK_PLANES = 7
_BRICK_GROUP_MAX = 6
_BRICK_BYTE_LIMIT = _BRICK_SPECS[-1][4]


def _padded_row_width(width: int) -> int:
    """HBM rows pad to 128-lane tiles (measured: f32[?,144] stores as 256)."""
    return int(np.ceil(width / 128)) * 128


def _brick_spec_for(cube_shape, dtype):
    """The brick spec (planes, wy, wx, group_max) for this cube, or None.

    Deterministic in (cube_shape, dtype) so ``pack_cubes`` and
    ``integrate_rays`` independently agree on the table layout.
    """
    n_cells = int(np.prod(cube_shape))
    itemsize = np.dtype(dtype).itemsize
    for planes, wy, wx, gmax, limit in _BRICK_SPECS:
        nbytes = n_cells * _padded_row_width(planes * wy * wx * 2) * itemsize
        if nbytes <= limit:
            return planes, wy, wx, gmax
    return None

_CORNERS = [(0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
            (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)]


def _dedup_point_walk(n_parts, gap_bounds=None):
    """The deduplicated sample-point walk that DEFINES the quadrature for
    both the point plan (build_sampling_plan) and the grouped brick plan
    (build_group_plan): bottom boundary, interior samples, shared/top
    boundary per level, with trapezoid end-weights 0.5.

    Yields (lvl, frac, wa_lvl, wa, wb_lvl, wb, gap) tuples; ``gap`` is the
    per-point horizontal-motion bound derived from ``gap_bounds`` (per-level
    max motion; used by the greedy brick grouping), np.inf for the bottom
    boundary (a group can always start there), and 0.0 when no bounds are
    given. One definition: a change to the nParts rule or dedup scheme
    otherwise has to be mirrored by hand in two walks or the brick and
    point kernels integrate different quadratures."""
    L = len(n_parts)
    for zz, nparts in enumerate(n_parts):
        inv = 1.0 / (nparts - 1.0)
        if gap_bounds is None:
            gap = 0.0
        else:
            g = gap_bounds[zz]
            gap = 0.0 if not np.isfinite(g) else float(g) * inv
        if zz == 0:
            yield (0, 0.0, 0, 0.5 * inv, 0, 0.0, np.inf)   # bottom boundary
        for j in range(1, nparts - 1):                      # interior samples
            yield (zz, j * inv, zz, inv, zz, 0.0, gap)
        if zz + 1 < L:                                      # shared boundary
            inv_next = 1.0 / (n_parts[zz + 1] - 1.0)
            yield (zz + 1, 0.0, zz, 0.5 * inv, zz + 1, 0.5 * inv_next, gap)
        else:                                               # top boundary
            yield (zz, 1.0, zz, 0.5 * inv, zz, 0.0, gap)


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
    # clamp to >= 2: padded zero-length levels (device-geometry chains)
    # give ceil(0) + 1 = 1, which would divide by zero below
    n_parts = np.maximum(
        np.ceil(np.asarray(ray_lengths_max) / max_segment_length).astype(int) + 1, 2)
    pts = list(_dedup_point_walk(n_parts))
    coord_lvl, fracs, wa_lvl, wa, wb_lvl, wb, _ = map(list, zip(*pts))
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


@jax.jit
def _quantize_i16(cube):
    """Affine int16 quantization of one refractivity field.

    Returns (raw int16 cube, scale f32, offset f32) with
    ``v ~ raw * scale + off``; non-finite cells map to the ``_I16_NAN``
    sentinel (int16 has no NaN) and decode back to NaN in the kernel.
    """
    finite = jnp.isfinite(cube)
    masked = jnp.where(finite, cube, jnp.nan)
    vmin, vmax = jnp.nanmin(masked), jnp.nanmax(masked)
    scale = jnp.maximum(vmax - vmin, 1e-12) / 65534.0
    off = 0.5 * (vmin + vmax)
    raw = jnp.clip(jnp.round((cube - off) / scale), -32767, 32767)
    raw = jnp.where(finite, raw, float(_I16_NAN)).astype(jnp.int16)
    return raw, scale.astype(jnp.float32), off.astype(jnp.float32)


def _i16_column_deq(n_cols, deq, compute_dtype):
    """Per-column (scale, offset) vectors for a packed i16 row: columns
    alternate {wet, hydro} (see _pack_cubes), deq = [sw, ow, sh, oh]."""
    par = jnp.arange(n_cols, dtype=jnp.int32) % 2
    sc = jnp.where(par == 0, deq[0], deq[2]).astype(compute_dtype)
    of = jnp.where(par == 0, deq[1], deq[3]).astype(compute_dtype)
    return sc, of


def _deq_brick(brick, deq, cdt):
    """int16 brick (..., 2 fields last axis) -> cdt: per-field affine with
    the NaN sentinel. The single source of the dequant form for the XLA
    kernels (the Pallas kernel does the same in VMEM, _static_brick_pallas_fn)."""
    sc2 = jnp.stack([deq[0], deq[2]]).astype(cdt)
    of2 = jnp.stack([deq[1], deq[3]]).astype(cdt)
    return jnp.where(brick == _I16_NAN, jnp.nan, brick.astype(cdt) * sc2 + of2)




@partial(jax.jit, static_argnames=('ys', 'xs', 'zs', 'z_clip', 'mode'))
def _integrate_packed(
    packed2d,                   # (nz*ny*nx, 16|4) packed corner table
    bnd_y, bnd_x, bnd_z,        # (L+1, N) level-boundary points, model CRS
    d2,                         # (L, N) squared horizontal chord length
    ray_len,                    # (L, N) segment lengths [m]
    re_local,                   # (N,) local earth radius [m]
    coord_lvl, fracs, wa_lvl, wa, wb_lvl, wb,  # (P,) dedup sampling plan
    ys, xs, zs,                 # static grid axes
    z_clip, mode,
    deq=None,                   # (4,) [sw, ow, sh, oh] for pack16_i16
):
    compute_dtype = deq.dtype if deq is not None else packed2d.dtype
    ys_np, xs_np, zs_np = np.asarray(ys), np.asarray(xs), np.asarray(zs)
    ny, nx = ys_np.size, xs_np.size

    def sample_one(lvl, ff, la, ca, lb, cb):
        ly = jnp.take(bnd_y, lvl, axis=0)
        lx = jnp.take(bnd_x, lvl, axis=0)
        lz = jnp.take(bnd_z, lvl, axis=0)
        hy = jnp.take(bnd_y, lvl + 1, axis=0)
        hx = jnp.take(bnd_x, lvl + 1, axis=0)
        hz = jnp.take(bnd_z, lvl + 1, axis=0)
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

        if mode in ('pack16', 'pack16_i16'):
            g = jnp.take(packed2d, lin, axis=0)  # (N, 16)
            if mode == 'pack16_i16':
                sc, of = _i16_column_deq(16, deq, compute_dtype)
                g = jnp.where(g == _I16_NAN, jnp.nan,
                              g.astype(compute_dtype) * sc + of)
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

    n = bnd_y.shape[1]
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


class GroupPlan:
    """Static grouped sampling plan for the brick kernel (see module doc).

    Arrays of shape (n_groups, G) unless noted: ``lvl`` (coordinate level),
    ``frac``, ``wa_lvl``/``wa``/``wb_lvl``/``wb`` (weight terms), ``dzoff``
    (static z-plane offset inside the brick row), ``zlo``/``zinv`` (static
    cell-bottom height and inverse thickness), ``pad`` (slot is padding);
    ``anchor`` is (n_groups,) - the static z-cell row of each group's brick.
    ``planes``/``wy``/``wx`` record the brick extent the plan was built for.
    """

    def __init__(self, **kw):
        self.__dict__.update(kw)

    @property
    def n_points(self):
        return int((~self.pad).sum())

    @property
    def mean_group_size(self):
        return self.n_points / self.pad.shape[0]


def build_group_plan(ray_lengths_max, heights, hstep_max, ys, xs, zs,
                     max_segment_length: float = MAX_SEGMENT_LENGTH,
                     group_max: int = None, planes: int = None,
                     wy: int = None, wx: int = None):
    """Group the deduplicated sampling plan for one-gather-per-group bricks.

    Greedy walk over the dedup plan: a group absorbs the next sample while
    (a) its size stays <= group_max, (b) the static z-cells of its samples
    span <= planes-2 brick planes, and (c) the summed per-gap horizontal
    motion bound stays <= (min(wy, wx) - 2) grid cells, which guarantees
    every ray's group touches cells within a (wy-1) x (wx-1) window (an
    interval of length <= k cell widths crosses at most k grid planes).

    Args:
        heights:   (L+1,) the level-boundary chain from ``level_heights``
                   (static, shared by all rays): sample z positions are
                   heights-lerp exact up to the (tiny) sagitta dip.
        hstep_max: (L,) per-level max horizontal motion over all rays, in
                   model CRS units.
        planes/wy/wx/group_max: brick extent; default to the spec
                   :func:`_brick_spec_for` picks for this cube shape (f32).
    """
    if planes is None or wy is None or wx is None or group_max is None:
        spec = _brick_spec_for((len(zs), len(ys), len(xs)), np.float32)
        d_planes, d_wy, d_wx, d_gmax = spec if spec else _BRICK_SPECS[-1][:4]
        planes = d_planes if planes is None else planes
        wy = d_wy if wy is None else wy
        wx = d_wx if wx is None else wx
        group_max = d_gmax if group_max is None else group_max
    # clamp to >= 2: padded zero-length levels (device-geometry chains)
    # give ceil(0) + 1 = 1, which would divide by zero below
    n_parts = np.maximum(
        np.ceil(np.asarray(ray_lengths_max) / max_segment_length).astype(int) + 1, 2)
    L = len(n_parts)
    heights = np.asarray(heights, dtype=np.float64)
    hstep_max = np.asarray(hstep_max, dtype=np.float64)
    zs_np = np.asarray(zs, dtype=np.float64)
    nz = zs_np.size
    ys_np, xs_np = np.asarray(ys), np.asarray(xs)
    cell_sizes = np.concatenate([np.diff(ys_np), np.diff(xs_np)])
    min_cell = float(cell_sizes.min()) if cell_sizes.size else np.inf

    # flat dedup point list: (lvl, frac, wa_lvl, wa, wb_lvl, wb, gap_bound)
    # - the SAME walk build_sampling_plan uses, so both kernels integrate
    # one quadrature
    pts = list(_dedup_point_walk(n_parts, gap_bounds=hstep_max))

    # static z-cell per point from the heights chain (sagitta-free lerp)
    def hint_of(lvl, frac):
        pz = heights[lvl] + frac * (heights[lvl + 1] - heights[lvl])
        return int(np.clip(np.searchsorted(zs_np, pz, side='right') - 1, 0, nz - 2))

    hints = [hint_of(p[0], p[1]) for p in pts]

    # greedy grouping; the motion budget scales with the brick's horizontal
    # extent: a group whose rays drift <= (min(wy,wx)-2) cells stays inside
    # the (wy-1) x (wx-1) corner window from its min-cell anchor
    motion_budget = (min(wy, wx) - 2) * min_cell
    groups, cur, cur_hints, cur_span = [], [], [], 0.0
    for p, h in zip(pts, hints):
        if cur:
            nspan = cur_span + p[6]
            zmin = min(cur_hints + [h])
            zmax = max(cur_hints + [h])
            if (len(cur) < group_max and zmax - zmin <= planes - 2
                    and nspan <= motion_budget):
                cur.append(p)
                cur_hints.append(h)
                cur_span = nspan
                continue
            groups.append((cur, cur_hints))
        cur, cur_hints, cur_span = [p], [h], 0.0
    groups.append((cur, cur_hints))

    G = group_max
    n_g = len(groups)
    arr = {k: np.zeros((n_g, G)) for k in
           ('frac', 'wa', 'wb', 'zlo', 'zinv')}
    iarr = {k: np.zeros((n_g, G), dtype=np.int32) for k in
            ('lvl', 'wa_lvl', 'wb_lvl', 'dzoff')}
    pad = np.ones((n_g, G), dtype=bool)
    anchor = np.zeros(n_g, dtype=np.int32)
    for gi, (grp, gh) in enumerate(groups):
        za = min(gh)
        anchor[gi] = za
        for sj in range(G):
            p, h = (grp[sj], gh[sj]) if sj < len(grp) else (grp[-1], gh[-1])
            lvl, frac, wal, wa, wbl, wb, _ = p
            iarr['lvl'][gi, sj] = lvl
            arr['frac'][gi, sj] = frac
            iarr['wa_lvl'][gi, sj] = wal
            iarr['wb_lvl'][gi, sj] = wbl
            if sj < len(grp):
                arr['wa'][gi, sj] = wa
                arr['wb'][gi, sj] = wb
                pad[gi, sj] = False
            iarr['dzoff'][gi, sj] = h - za
            arr['zlo'][gi, sj] = zs_np[h]
            arr['zinv'][gi, sj] = 1.0 / (zs_np[h + 1] - zs_np[h])
    return GroupPlan(anchor=anchor, pad=pad, G=G, planes=planes,
                     wy=wy, wx=wx, **arr, **iarr)


@partial(jax.jit, static_argnames=('planes', 'wy', 'wx', 'chunk'))
def _pack_bricks_impl(cube_wet, cube_hydro, planes: int, wy: int, wx: int,
                      chunk: int):
    """Brick table: row(z,y,x) = [planes z][wy y][wx x][wet,hydro] corners.

    Row (z,y,x) column (dz,dy,dx,field) holds cube[z+dz, y+dy, x+dx], zero
    beyond the cube edge. Built in z-chunks inside one fori_loop whose carry
    is the output table: XLA updates the carry IN PLACE, so peak HBM is
    table + one chunk — the naive all-shifts-then-stack build transiently
    doubles the table, which OOMs a 16 GB v5e at the (8,4,4) spec's 8.2 GB.
    """
    nz, ny, nx = cube_wet.shape
    width = planes * wy * wx * 2
    # zero-pad once so every shifted read is a static in-bounds slice
    pw = jnp.pad(cube_wet, ((0, planes), (0, wy), (0, wx)))
    ph = jnp.pad(cube_hydro, ((0, planes), (0, wy), (0, wx)))
    n_chunks = int(np.ceil(nz / chunk))

    def body(i, out):
        # overlap-clamp the last chunk: the recomputed rows are identical
        z0 = jnp.minimum(i * chunk, nz - chunk)
        sw = jax.lax.dynamic_slice_in_dim(pw, z0, chunk + planes, axis=0)
        sh = jax.lax.dynamic_slice_in_dim(ph, z0, chunk + planes, axis=0)
        rows = []
        for dz in range(planes):
            for dy in range(wy):
                for dx in range(wx):
                    for sl in (sw, sh):
                        rows.append(sl[dz:dz + chunk, dy:dy + ny, dx:dx + nx])
        part = jnp.stack(rows, axis=-1).reshape(chunk * ny * nx, width)
        return jax.lax.dynamic_update_slice_in_dim(
            out, part, z0 * (ny * nx), axis=0)

    out = jnp.zeros((nz * ny * nx, width), cube_wet.dtype)
    return jax.lax.fori_loop(0, n_chunks, body, out)


def _pack_bricks(cube_wet, cube_hydro, planes: int, wy: int = 3, wx: int = 3):
    nz, ny, nx = cube_wet.shape
    width = planes * wy * wx * 2
    itemsize = np.dtype(cube_wet.dtype).itemsize
    # ~256 MB chunk budget bounds the transient; tiny cubes pack in one pass
    chunk = int(max(1, min(nz, 2**28 // max(1, ny * nx * width * itemsize))))
    return _pack_bricks_impl(cube_wet, cube_hydro, planes, wy, wx, chunk)


def brick_bytes_for(cube_shape, dtype, planes: int = _BRICK_PLANES,
                    wy: int = 3, wx: int = 3) -> int:
    """HBM bytes of the brick table (rows pad to 128-lane tiles)."""
    return (int(np.prod(cube_shape)) * _padded_row_width(planes * wy * wx * 2)
            * np.dtype(dtype).itemsize)


def static_plan_from(plan: 'GroupPlan'):
    """Hashable (structure + constants) form of a GroupPlan.

    Returns ``(groups, planes, wy, wx)`` where ``groups`` is a tuple of
    ``(anchor, samples)`` and each sample is the 9-tuple
    ``(lvl, frac, wa_lvl, wa, wb_lvl, wb, zlo, zinv, dzoff)`` with plain
    Python numbers. Feeding this to :func:`_static_brick_fn` bakes the whole
    plan into the executable: group sizes are exact (no pad slots), z-plane
    placement is static (no one-hot over planes), and boundary rows are read
    with static indices (no per-sample dynamic slices). The price is one
    compile per distinct plan structure - use it where one plan is reused
    for many slices (the production cube path builds ONE cube-global plan).
    """
    groups = []
    for gi in range(plan.anchor.size):
        cnt = int((~plan.pad[gi]).sum())
        if cnt == 0:
            continue
        samples = tuple(
            (int(plan.lvl[gi, s]), float(plan.frac[gi, s]),
             int(plan.wa_lvl[gi, s]), float(plan.wa[gi, s]),
             int(plan.wb_lvl[gi, s]), float(plan.wb[gi, s]),
             float(plan.zlo[gi, s]), float(plan.zinv[gi, s]),
             int(plan.dzoff[gi, s]))
            for s in range(cnt))
        groups.append((int(plan.anchor[gi]), samples))
    return (tuple(groups), int(plan.planes), int(getattr(plan, 'wy', 3)),
            int(getattr(plan, 'wx', 3)))


@lru_cache(maxsize=64)
def _static_brick_fn(groups, planes, wy, wx, ys, xs, zs, z_clip,
                     stacked=False, has_deq=False):
    """Compile the fully static brick integrate for one plan structure.

    Measured on v5e (1M rays, 50-level HRRR-sized cube, 16 groups): 270 ms
    vs 490 ms for the traced-plan scan kernel. The win comes from (a) no
    per-sample ``dynamic_index_in_dim`` boundary slices (~120 ms of tiny
    slice ops), (b) ONE brick read per group via a combined trilinear weight
    tensor U (the traced kernel re-reads the gathered brick once per sample),
    (c) no pad-slot arithmetic, and (d) static z-plane placement instead of a
    one-hot over ``planes``. See scripts/integrate_ablation.py for the
    ablation chain (v2..v5).
    """
    ys_np, xs_np, zs_np = np.asarray(ys), np.asarray(xs), np.asarray(zs)
    ny, nx = ys_np.size, xs_np.size

    @jax.jit
    def run(table2d, bnd_y, bnd_x, bnd_z, d2, ray_len, re_local, deq=None):
        cdt = deq.dtype if has_deq else table2d.dtype
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
                if z_clip:
                    pz = jnp.clip(pz, zs_np[0], zs_np[-1])
                bz = (pz >= zs_np[0]) & (pz <= zs_np[-1])
                iy, fy, by = _locate_uniformish(ys_np, py)
                ix, fx, bx = _locate_uniformish(xs_np, px)
                fz = (pz - zlo) * zinv
                rl = wav * ray_len[wal] + (wbv * ray_len[wbl] if wbv else 0.0)
                persample.append((iy, ix, fy.astype(cdt), fx.astype(cdt),
                                  fz.astype(cdt), bz & by & bx,
                                  (1.0e-6 * rl).astype(cdt), dzo))
                ay = iy if ay is None else jnp.minimum(ay, iy)
                ax = ix if ax is None else jnp.minimum(ax, ix)
            lin = (za * ny + ay) * nx + ax
            # serialize group gathers behind the running accumulation so the
            # scheduler never holds more than one gathered brick live
            lin = jax.lax.optimization_barrier((lin, acc_w))[0]
            brick = jnp.take(table2d, lin, axis=0)
            brick = brick.reshape(n, planes, wy, wx, 2)
            if has_deq:
                brick = _deq_brick(brick, deq, cdt)
            U = [[[None] * wx for _ in range(wy)] for _ in range(planes)]
            for (iy, ix, fy, fx, fz, ok, wt, dzo) in persample:
                dyi = iy - ay
                dxi = ix - ax
                # a group spans <= wy-1 / wx-1 cells per horizontal axis by
                # construction; any violation becomes NaN, never silent zeros
                ok = ok & (dyi <= wy - 2) & (dxi <= wx - 2)
                gy = dyi.astype(cdt) + fy
                gx = dxi.astype(cdt) + fx
                wte = jnp.where(ok, wt, jnp.nan)
                # hat-function row weights: for gy in [0, wy-1] these
                # reproduce the one-hot mix exactly (fy in [0, 1] by locate)
                wys = [jnp.maximum(0.0, 1.0 - jnp.abs(gy - k)) for k in range(wy)]
                wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(gx - k)) for k in range(wx)]
                w0 = wte * (1.0 - fz)       # linear-in-z incl. extrapolation
                w1 = wte * fz
                for k in range(wy):
                    for l in range(wx):
                        wkl = wys[k] * wxs[l]
                        for dj, wj in ((dzo, w0), (dzo + 1, w1)):
                            t = wj * wkl
                            U[dj][k][l] = (t if U[dj][k][l] is None
                                           else U[dj][k][l] + t)
            for j in range(planes):
                for k in range(wy):
                    for l in range(wx):
                        if U[j][k][l] is not None:
                            acc_w = acc_w + brick[:, j, k, l, 0] * U[j][k][l]
                            acc_h = acc_h + brick[:, j, k, l, 1] * U[j][k][l]
        # stacked: ONE (2, N) output buffer so the caller can issue a single
        # bulk device->host copy per slice (see engine.run_integrate)
        return jnp.stack([acc_w, acc_h]) if stacked else (acc_w, acc_h)

    return run


def _axis_uniformish(ax_np) -> bool:
    """True when :func:`ops.interp._locate` takes its uniform fast path —
    the Pallas kernel replicates exactly that formula, so the gate is the
    SAME predicate (`ops.interp.axis_uniform_step`), not a copy."""
    from raider_tpu.ops.interp import axis_uniform_step
    return axis_uniform_step(ax_np) is not None


def pallas_integrate_mode(ys, xs) -> str:
    """'tpu' | 'interpret' | '' — whether the static brick integrate should
    run its Pallas contraction kernel.

    Policy mirrors ops.pallas_ztd: ON for TPU backends (measured 214 ->
    134 ms per 1M-ray slice on v5e — the XLA form's column-strided reads of
    the gathered brick plus materialized (N,) intermediates account for the
    difference, 118 GB accessed per cost_analysis vs ~12 GB useful),
    RAIDER_TPU_PALLAS_INTEGRATE=0 forces it off, =1 forces interpret mode on
    non-TPU backends (tests). Requires uniform-ish y/x axes (in-kernel
    locate is one FMA; non-uniform axes would need searchsorted).
    """
    env = os.environ.get('RAIDER_TPU_PALLAS_INTEGRATE', '')
    if env == '0':
        return ''
    if not (_axis_uniformish(ys) and _axis_uniformish(xs)):
        return ''
    try:
        backend = jax.default_backend()
    except RuntimeError:  # pragma: no cover - no backend at all
        return ''
    if backend == 'tpu':
        return 'tpu'
    return 'interpret' if env == '1' else ''


@lru_cache(maxsize=64)
def _static_brick_pallas_fn(groups, planes, wy, wx, ys, xs, zs, z_clip,
                            stacked=False, interpret=False, tile_n=4096,
                            kernel_transpose=True, has_deq=False):
    """Static-plan brick integrate with the contraction in a Pallas kernel.

    Same gathers as :func:`_static_brick_fn` (XLA's scattered-row jnp.take
    is at the measured gather floor), but the gathered brick is transposed
    to (width, N) — RAYS ON LANES — and everything else runs inside one
    Pallas kernel per group.  With ``kernel_transpose`` (the default) the
    transpose happens on the (tile_n, width) block inside the kernel, which
    skips the XLA-side transpose's extra HBM round trip over the gathered
    brick (production kernel measured on-chip: 134.8 -> 122.6 ms per
    1M-ray slice at the (7,3,3,6) spec, scripts/kernel_profile.py
    prodpallaskt0/kt1; ``kernel_transpose=False`` keeps the XLA-side
    transpose).  Structure:

      * every brick-row access is STATIC: the z-plane placement is static
        per sample and the y/x corner cells are enumerated statically with
        per-ray hat weights, so the per-sample trilinear is ~36 static-row
        multiply-accumulates over fully packed 1D lane vectors;
      * the per-sample coordinate math (segment lerp, sagitta, locate, ok
        masks, trapezoid weights) runs in VMEM — zero (N,) intermediates in
        HBM, where the XLA form's materialization made the kernel
        bandwidth-bound at ~550 GB/s over ~10x the useful traffic;
      * each group's kernel reads only the level-boundary rows its samples
        touch (sliced XLA-side), not the whole (L+1, N) arrays.

    Equivalent to the XLA kernel to < 1e-5 relative (scripts/kernel_profile
    checks on-chip; tests/test_pallas_integrate.py in interpret mode), with
    matching NaN semantics up to the documented 1e-4 boundary band: an
    out-of-window or out-of-bounds sample NaNs its whole ray, never silently
    zeroes, but the window test admits sub-ULP/boundary overshoots inside
    the ``gy <= wy - 1 + 1e-4`` band that the XLA kernel's exact integer
    test (``dyi <= wy - 2``) would NaN. The stated invariant for
    predicted-plan slices is therefore the GUARD STRUCTURE: the engine's
    deferred hstep-excursion check recomputes any slice whose measured
    motion exceeded the bound it integrated with (engine.py, deferred
    block), so a band-admitted overshoot can never ship silently.

    Replaces the reference's per-level, per-fraction scipy interpolator loop
    (reference: tools/RAiDER/delay.py:286-323).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ys_np, xs_np, zs_np = np.asarray(ys), np.asarray(xs), np.asarray(zs)
    ny, nx = ys_np.size, xs_np.size
    width = planes * wy * wx * 2
    y_lo, y_hi = float(ys_np[0]), float(ys_np[-1])
    x_lo, x_hi = float(xs_np[0]), float(xs_np[-1])
    z_lo, z_hi = float(zs_np[0]), float(zs_np[-1])
    # EXACTLY _locate's uniform formula ((p - lo) / step) so the in-kernel
    # cell choice is bit-identical to the XLA-side anchor locate
    step_y = (y_hi - y_lo) / (ny - 1)
    step_x = (x_hi - x_lo) / (nx - 1)

    def group_kernel(bt_ref, by_ref, bx_ref, bz_ref, d2_ref, rl_ref,
                     aux_ref, *rest, samples, lv0):
        (deq_ref, out_ref) = rest if has_deq else (None, rest[0])
        ay = aux_ref[0, :]
        ax = aux_ref[1, :]
        re_local = aux_ref[2, :]
        acc_w = jnp.zeros_like(ay)
        acc_h = jnp.zeros_like(ay)
        if has_deq:
            # int16 brick -> f32 in VMEM: per-column affine, NaN riding the
            # sentinel. With the in-kernel transpose the block arrives
            # (tile_n, width) and deq_ref is (2, width) — the multiply
            # broadcasts along lanes, THEN the f32 result transposes (never
            # transpose the raw int16). Without it the block arrives
            # (width, tile_n) and deq_ref is passed pre-transposed
            # (width, 2) so scale/offset broadcast as (width, 1) columns.
            # sentinel test AFTER the f32 convert: Mosaic on v5e rejects
            # 16-bit vector compares ("Target does not support this
            # comparison", measured round 5), the convert happens anyway,
            # -32768 is exact in f32, and no other i16 value maps to it
            rawf = bt_ref[:].astype(jnp.float32)
            nanv = jnp.float32(_I16_NAN)
            if kernel_transpose:
                g = jnp.where(rawf == nanv, jnp.nan,
                              rawf * deq_ref[0, :] + deq_ref[1, :])
                bt = g.T
            else:
                bt = jnp.where(rawf == nanv, jnp.nan,
                               rawf * deq_ref[:, 0:1] + deq_ref[:, 1:2])
        else:
            bt = bt_ref[:].T if kernel_transpose else bt_ref
        for (lv_abs, f, wal_abs, wav, wbl_abs, wbv, zlo, zinv, dzo) in samples:
            lv = lv_abs - lv0
            wal = wal_abs - lv0
            wbl = wbl_abs - lv0
            ylo_r = by_ref[lv, :]
            xlo_r = bx_ref[lv, :]
            zlo_r = bz_ref[lv, :]
            py = ylo_r + f * (by_ref[lv + 1, :] - ylo_r)
            px = xlo_r + f * (bx_ref[lv + 1, :] - xlo_r)
            zhi_r = bz_ref[lv + 1, :]
            pz = zlo_r + f * (zhi_r - zlo_r)
            hbar = 0.5 * (zlo_r + zhi_r)
            pz = pz - f * (1.0 - f) * d2_ref[lv, :] / (2.0 * (re_local + hbar))
            bndy = (py >= y_lo) & (py <= y_hi)
            bndx = (px >= x_lo) & (px <= x_hi)
            if z_clip:
                pz = jnp.minimum(jnp.maximum(pz, z_lo), z_hi)
            bndz = (pz >= z_lo) & (pz <= z_hi)
            posy = (py - y_lo) / step_y
            iyf = jnp.minimum(jnp.maximum(jnp.floor(posy), 0.0),
                              float(ny - 2))
            fy = posy - iyf
            posx = (px - x_lo) / step_x
            ixf = jnp.minimum(jnp.maximum(jnp.floor(posx), 0.0),
                              float(nx - 2))
            fx = posx - ixf
            fz = (pz - zlo) * zinv
            # window membership must be tested on the CONTINUOUS offset
            # gy = posy - ay, not on the recomputed floor: the anchor ay
            # came from XLA's _locate while iyf is recomputed here by
            # Mosaic, and a 1-ULP disagreement at a cell boundary flips
            # floor() by a whole cell. gy is rounding-invariant (the floor
            # cancels in dyi + fy), so the ULP case keeps its (correct)
            # weights instead of NaN-poisoning a valid ray the engine's
            # hstep-bound redo check would never recompute. The +1e-4 band
            # admits at most 1e-4 of one sample's weight falling off the
            # window edge (~µm of delay); genuine grouping violations
            # overshoot by whole cells and still poison, matching the XLA
            # kernel (where ay and iy come from the same computation and
            # the index test is exact).
            gy = (iyf - ay) + fy
            gx = (ixf - ax) + fx
            ok = (bndy & bndx & bndz
                  & (gy <= float(wy - 1) + 1e-4)
                  & (gx <= float(wx - 1) + 1e-4))
            rl = wav * rl_ref[wal, :]
            if wbv:
                rl = rl + wbv * rl_ref[wbl, :]
            wte = jnp.where(ok, 1.0e-6 * rl, jnp.nan)
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

    def group_call(brickT, sy, sx, sz, sd2, srl, aux, samples, lv0, n,
                   deq_in=None):
        rowspec = lambda r: pl.BlockSpec((r, tile_n), lambda i: (0, i))
        brickspec = (pl.BlockSpec((tile_n, width), lambda i: (i, 0))
                     if kernel_transpose else rowspec(width))
        in_specs = [brickspec, rowspec(sy.shape[0]),
                    rowspec(sx.shape[0]), rowspec(sz.shape[0]),
                    rowspec(sd2.shape[0]), rowspec(srl.shape[0]),
                    rowspec(3)]
        extra = ()
        if has_deq:
            # replicated per-column (scale, offset) table; see group_kernel
            in_specs.append(pl.BlockSpec(deq_in.shape, lambda i: (0, 0)))
            extra = (deq_in,)
        out_dtype = jnp.float32 if has_deq else brickT.dtype
        return pl.pallas_call(
            partial(group_kernel, samples=samples, lv0=lv0),
            grid=(pl.cdiv(n, tile_n),),
            in_specs=in_specs,
            out_specs=rowspec(2),
            out_shape=jax.ShapeDtypeStruct((2, n), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('arbitrary',)),
            interpret=interpret,
        )(brickT, sy, sx, sz, sd2, srl, aux, *extra)

    @jax.jit
    def run(table2d, bnd_y, bnd_x, bnd_z, d2, ray_len, re_local, deq=None):
        cdt = jnp.float32 if has_deq else table2d.dtype
        n = bnd_y.shape[1]
        L = d2.shape[0]
        acc = jnp.zeros((2, n), cdt)
        re32 = re_local.astype(cdt)
        deq_in = None
        if has_deq:
            sc_row, of_row = _i16_column_deq(width, deq, jnp.float32)
            deq_in = jnp.stack([sc_row, of_row])       # (2, width)
            if not kernel_transpose:
                deq_in = deq_in.T                      # (width, 2)
        for za, samples in groups:
            ay = ax = None
            for (lv, f, *_rest) in samples:
                py = bnd_y[lv] + f * (bnd_y[lv + 1] - bnd_y[lv])
                px = bnd_x[lv] + f * (bnd_x[lv + 1] - bnd_x[lv])
                iy, _fy, _by = _locate_uniformish(ys_np, py)
                ix, _fx, _bx = _locate_uniformish(xs_np, px)
                ay = iy if ay is None else jnp.minimum(ay, iy)
                ax = ix if ax is None else jnp.minimum(ax, ix)
            lin = (za * ny + ay) * nx + ax
            # serialize group gathers behind the running accumulation so the
            # scheduler never holds more than one gathered brick live
            lin = jax.lax.optimization_barrier((lin, acc))[0]
            brick = jnp.take(table2d, lin, axis=0)      # (N, width)
            brickT = brick if kernel_transpose else brick.T
            aux = jnp.stack([ay.astype(cdt), ax.astype(cdt), re32])
            # slice just the level-row window this group touches: the
            # kernel would otherwise stream all ~5L boundary rows per group
            lv0 = min(min(s[0], s[2], s[4]) for s in samples)
            hi1 = max(s[0] + 1 for s in samples)
            hiL = min(max(max(s[0], s[2], s[4]) for s in samples), L - 1)
            with jax.enable_x64(False):
                part = group_call(brickT,
                                  bnd_y[lv0:hi1 + 1], bnd_x[lv0:hi1 + 1],
                                  bnd_z[lv0:hi1 + 1],
                                  d2[lv0:hiL + 1], ray_len[lv0:hiL + 1],
                                  aux, samples, lv0, n, deq_in=deq_in)
            acc = acc + part
        return acc if stacked else (acc[0], acc[1])

    return run


def _shard_wrap(run_fn, sample_arr, stacked: bool, n_extra_replicated=0):
    """shard_map the pallas-backed run over the ray mesh when inputs arrive
    sharded: pallas_call has no SPMD partitioning rule, so under plain jit a
    sharded input would force a full all-gather. Every op is per-ray, the
    packed table is replicated — no collectives inside.
    ``n_extra_replicated`` trailing args (the i16 dequant params) replicate."""
    sh = getattr(sample_arr, 'sharding', None)
    mesh = getattr(sh, 'mesh', None)
    if mesh is None or int(np.prod(mesh.devices.shape)) <= 1:
        return run_fn
    from jax.sharding import PartitionSpec as P

    ray = mesh.axis_names[0]
    in_specs = ((P(None, None),) + (P(None, ray),) * 5 + (P(ray),)
                + (P(None),) * n_extra_replicated)
    out_specs = P(None, ray) if stacked else (P(ray), P(ray))
    return jax.shard_map(run_fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


@partial(jax.jit, static_argnames=('ys', 'xs', 'zs', 'z_clip', 'G', 'planes',
                                   'wy', 'wx'))
def _integrate_bricks(
    table2d,                    # (nz*ny*nx, planes*wy*wx*2) brick table
    bnd_y, bnd_x, bnd_z,        # (L+1, N) level-boundary points, model CRS
    d2, ray_len,                # (L, N)
    re_local,                   # (N,)
    anchor, lvl, frac, wa_lvl, wa, wb_lvl, wb, dzoff, zlo, zinv, pad,
    ys, xs, zs, z_clip, G, planes, wy=3, wx=3, deq=None,
):
    compute_dtype = deq.dtype if deq is not None else table2d.dtype
    ys_np, xs_np, zs_np = np.asarray(ys), np.asarray(xs), np.asarray(zs)
    ny, nx = ys_np.size, xs_np.size
    n = bnd_y.shape[1]

    def body(carry, g):
        acc_w, acc_h = carry
        (za, lv, ff, wal, wav, wbl, wbv, dzo, zl, zi, pd) = g

        samples = []
        iy_all, ix_all = [], []
        for s in range(G):
            ly = jax.lax.dynamic_index_in_dim(bnd_y, lv[s], 0, False)
            lx = jax.lax.dynamic_index_in_dim(bnd_x, lv[s], 0, False)
            lz = jax.lax.dynamic_index_in_dim(bnd_z, lv[s], 0, False)
            hy = jax.lax.dynamic_index_in_dim(bnd_y, lv[s] + 1, 0, False)
            hx = jax.lax.dynamic_index_in_dim(bnd_x, lv[s] + 1, 0, False)
            hz = jax.lax.dynamic_index_in_dim(bnd_z, lv[s] + 1, 0, False)
            dd2 = jax.lax.dynamic_index_in_dim(d2, lv[s], 0, False)
            f = ff[s]
            py = ly + f * (hy - ly)
            px = lx + f * (hx - lx)
            pz = lz + f * (hz - lz)
            hbar = 0.5 * (lz + hz)
            pz = pz - f * (1.0 - f) * dd2 / (2.0 * (re_local + hbar))
            if z_clip:
                pz = jnp.clip(pz, zs_np[0], zs_np[-1])
            bz = (pz >= zs_np[0]) & (pz <= zs_np[-1])
            iy, fy, by = _locate_uniformish(ys_np, py)
            ix, fx, bx = _locate_uniformish(xs_np, px)
            fz = (pz - zl[s]) * zi[s]
            rl = (wav[s] * jax.lax.dynamic_index_in_dim(ray_len, wal[s], 0, False)
                  + wbv[s] * jax.lax.dynamic_index_in_dim(ray_len, wbl[s], 0, False))
            samples.append((fy, fx, fz, by & bx & bz, rl))
            iy_all.append(iy)
            ix_all.append(ix)

        ay = iy_all[0]
        ax = ix_all[0]
        for s in range(1, G):
            ay = jnp.minimum(ay, iy_all[s])
            ax = jnp.minimum(ax, ix_all[s])
        lin = (za * ny + ay) * nx + ax
        brick = jnp.take(table2d, lin, axis=0)          # (N, planes*wy*wx*2)
        brick = brick.reshape(n, planes, wy, wx, 2)
        if deq is not None:
            brick = _deq_brick(brick, deq, compute_dtype)

        for s in range(G):
            fy, fx, fz, ok, rl = samples[s]
            dy = iy_all[s] - ay
            dx = ix_all[s] - ax
            # a group never spans more than wy-1 / wx-1 cells per horizontal
            # axis by construction; any violation is NaN, never silent zeros
            ok = ok & (dy <= wy - 2) & (dx <= wx - 2)
            fy = fy.astype(compute_dtype)
            fx = fx.astype(compute_dtype)
            fz = fz.astype(compute_dtype)
            # z mix: planes dzoff, dzoff+1 via scalar one-hot over planes
            vz = None
            for j in range(planes):
                wj = (jnp.where(j == dzo[s], 1.0 - fz, 0.0)
                      + jnp.where(j == dzo[s] + 1, fz, 0.0))
                term = brick[:, j] * wj[:, None, None, None]
                vz = term if vz is None else vz + term   # (N, wy, wx, 2)
            # hat-function row weights (exact one-hot mix for g in [0, w-1])
            gy = dy.astype(compute_dtype) + fy
            gx = dx.astype(compute_dtype) + fx
            vy = None
            for k in range(wy):
                wk = jnp.maximum(0.0, 1.0 - jnp.abs(gy - k))
                term = vz[:, k] * wk[:, None, None]
                vy = term if vy is None else vy + term   # (N, wx, 2)
            v = None
            for l in range(wx):
                wl = jnp.maximum(0.0, 1.0 - jnp.abs(gx - l))
                term = vy[:, l] * wl[:, None]
                v = term if v is None else v + term      # (N, 2)
            v = jnp.where(ok[:, None], v, jnp.nan)
            wt = (1.0e-6 * rl).astype(compute_dtype)[:, None]
            contrib = jnp.where(pd[s], 0.0, wt * v)
            acc_w = acc_w + contrib[:, 0]
            acc_h = acc_h + contrib[:, 1]
        return (acc_w, acc_h), None

    init = (jnp.zeros(n, compute_dtype), jnp.zeros(n, compute_dtype))
    plan = (
        jnp.asarray(anchor, jnp.int32),
        jnp.asarray(lvl, jnp.int32),
        jnp.asarray(frac, compute_dtype),
        jnp.asarray(wa_lvl, jnp.int32),
        jnp.asarray(wa, compute_dtype),
        jnp.asarray(wb_lvl, jnp.int32),
        jnp.asarray(wb, compute_dtype),
        jnp.asarray(dzoff, jnp.int32),
        jnp.asarray(zlo, compute_dtype),
        jnp.asarray(zinv, compute_dtype),
        jnp.asarray(pad),
    )
    (wet, hydro), _ = jax.lax.scan(body, init, plan)
    return wet, hydro


def pack_mode_for(cube_shape, dtype, grouped: bool = False) -> str:
    """Choose the packing by HBM footprint of the packed table.

    ``grouped=True`` (the caller can supply the heights chain + horizontal
    motion bounds) prefers the brick layout: one gather then serves a whole
    GROUP of samples, the biggest lever for this gather-count-bound kernel.
    The brick extent itself comes from :func:`_brick_spec_for`'s ladder.
    """
    if grouped:
        flag = os.environ.get('RAIDER_TPU_BRICK_I16', '')
        if _brick_spec_for(cube_shape, dtype) is not None:
            # f32 brick fits: f32 stays the default — the quantized table
            # measured SLOWER here on v5e (prodi16 127.5 ms vs prodpallaskt1
            # 119.2 ms, round 5, same regime: the kernel is gather-count
            # bound and the in-kernel i16->f32 convert + sentinel select
            # cost more than the halved brick bytes save). =1 forces i16
            # for re-ablation.
            if flag == '1' and np.dtype(dtype) == np.float32:
                return 'brick_i16'
            return 'brick'
        # CAPACITY band: the f32 brick table is over budget but the int16
        # one (half the bytes, ~12.6M-25.2M cells at the (7,3,3,6) spec)
        # fits — brick's ~11 gathers/ray crush the pack16 fallback's ~58.
        # Measured on v5e (50x640x640 = 20.5M cells, 1M rays, round 5):
        # brick_i16 0.131 s vs pack16 0.839 s = 6.4x, max |dev| 0.019 mm
        # (inside the < 0.03 mm pack16_i16 bound; same _quantize_i16).
        # f32 compute only — f64 cubes are the exact-reference path and
        # never silently quantize. =0 opts out (exact pack16/pack4 ladder).
        if (flag != '0' and np.dtype(dtype) == np.float32
                and _brick_spec_for(cube_shape, np.int16) is not None):
            return 'brick_i16'
    n_cells = int(np.prod(cube_shape))
    nbytes16 = n_cells * 16 * np.dtype(dtype).itemsize
    if nbytes16 <= _PACK16_BYTE_LIMIT:
        return 'pack16'
    # quantized int16 rows: same gather count as pack16 at half the bytes
    # (measured same gather wall time; see _PACK16_I16_BYTE_LIMIT note) —
    # covers full-CONUS-HRRR-class cubes (~95M cells = 3.0 GiB i16 table)
    # that f32 PACK16 cannot hold, at < 0.03 mm quantization impact.
    # f32 compute only: an f64 cube is the exact-reference path (CPU
    # hosts, _default_compute_dtype) and must never silently downgrade to
    # a quantized f32 kernel — big f64 cubes take the exact PACK4 floor.
    if (np.dtype(dtype) == np.float32
            and n_cells * 16 * 2 <= _PACK16_I16_BYTE_LIMIT):
        return 'pack16_i16'
    return 'pack4'


def integrate_rays(
    cube_wet, cube_hydro, ys, xs, zs,
    bnd_y, bnd_x, bnd_z, d2, ray_len, re_local,
    ray_lengths_max,
    max_segment_length: float = MAX_SEGMENT_LENGTH,
    z_clip: bool = True,
    packed2d=None,
    mode=None,
    heights=None,
    hstep_max=None,
    static_plan: bool = False,
    stacked_out: bool = False,
):
    """Integrate wet/hydro delay along all rays for one output height slice.

    Segments are CONTIGUOUS along each ray (reference build_ray semantics:
    level k's upper endpoint IS level k+1's lower endpoint), so the geometry
    arrives as ONE boundary-point array per coordinate: level k runs from
    boundary k to boundary k+1. This halves the endpoint HBM footprint and
    traffic versus separate low/high stacks (the dedup sampling plan already
    relied on this contiguity for its shared-boundary samples).

    Args:
        cube_wet/hydro: (nz, ny, nx) pointwise refractivity cubes.
        ys, xs, zs:     grid axes (numpy, ascending).
        bnd_y/bnd_x/bnd_z: (L+1, N) level-boundary point components in model
                        CRS (y, x, z order as separate arrays).
        d2:             (L, N) squared horizontal chord lengths [m^2].
        ray_len:        (L, N) segment lengths [m].
        re_local:       (N,) local earth radii for the sagitta correction.
        ray_lengths_max: (L,) per-level max segment length (sets nParts).
        packed2d/mode:  optionally pass a precomputed pack (see
                        :func:`pack_cubes`) to amortize packing across slices.
        heights:        (L+1,) static level-boundary chain (level_heights);
                        enables the grouped brick kernel together with
        hstep_max:      (L,) per-level max horizontal motion of any ray in
                        model CRS units (host-measured, conservative).
        static_plan:    bake the brick plan into the executable (see
                        :func:`static_plan_from`): ~1.8x faster per slice but
                        one compile per distinct plan structure. Use when one
                        plan serves many slices (the engine's cube-global
                        plan); the traced default never recompiles across
                        slices of similar shape.

    Returns:
        (wet_delay (N,), hydro_delay (N,)) in meters.
    """
    grouped_ok = heights is not None and hstep_max is not None
    if packed2d is None:
        cube_wet = jnp.asarray(cube_wet)
        packed2d, mode = pack_cubes(cube_wet, jnp.asarray(cube_hydro),
                                    grouped=grouped_ok)
    deq = None
    if mode in ('pack16_i16', 'brick_i16'):  # table rides with dequant params
        packed2d, deq = packed2d
        dtype = deq.dtype
    else:
        dtype = packed2d.dtype
    ray_args = (
        jnp.asarray(bnd_y, dtype), jnp.asarray(bnd_x, dtype),
        jnp.asarray(bnd_z, dtype),
        jnp.asarray(d2, dtype), jnp.asarray(ray_len, dtype),
        jnp.asarray(re_local, dtype),
    )
    axes = dict(
        ys=tuple(np.asarray(ys).tolist()),
        xs=tuple(np.asarray(xs).tolist()),
        zs=tuple(np.asarray(zs).tolist()),
    )
    if mode in ('brick', 'brick_i16'):
        if not grouped_ok:
            raise ValueError("mode='brick' needs heights and hstep_max")
        # the spec is a deterministic function of (cube shape, TABLE dtype),
        # so this agrees with the layout pack_cubes built the table with
        # (int16 for the quantized mode — its byte budget admits 2x cells)
        spec = _brick_spec_for(
            np.shape(cube_wet), np.int16 if mode == 'brick_i16' else dtype
        ) or _BRICK_SPECS[-1][:4]
        planes_s, wy_s, wx_s, gmax_s = spec
        if packed2d.shape[1] != planes_s * wy_s * wx_s * 2:
            raise ValueError(
                f'packed table width {packed2d.shape[1]} does not match the '
                f'brick spec {spec} for this cube shape/dtype')
        plan = build_group_plan(ray_lengths_max, heights, hstep_max, ys, xs, zs,
                                max_segment_length,
                                group_max=gmax_s, planes=planes_s,
                                wy=wy_s, wx=wx_s)
        has_deq = deq is not None
        deq_args = (deq,) if has_deq else ()
        if static_plan:
            groups, planes, wy, wx = static_plan_from(plan)
            pmode = pallas_integrate_mode(ys, xs)
            if pmode:
                fn = _static_brick_pallas_fn(
                    groups, planes, wy, wx, axes['ys'], axes['xs'],
                    axes['zs'], z_clip, stacked_out,
                    interpret=(pmode == 'interpret'),
                    kernel_transpose=(
                        os.environ.get('RAIDER_TPU_PALLAS_KT', '1') != '0'),
                    has_deq=has_deq)
                fn = _shard_wrap(fn, ray_args[0], stacked_out,
                                 n_extra_replicated=len(deq_args))
                return fn(packed2d, *ray_args, *deq_args)
            fn = _static_brick_fn(groups, planes, wy, wx, axes['ys'],
                                  axes['xs'], axes['zs'], z_clip, stacked_out,
                                  has_deq=has_deq)
            return fn(packed2d, *ray_args, *deq_args)
        plan = _pad_group_plan(plan, _PLAN_BUCKET)
        return _integrate_bricks(
            packed2d, *ray_args,
            plan.anchor, plan.lvl, plan.frac, plan.wa_lvl, plan.wa,
            plan.wb_lvl, plan.wb, plan.dzoff, plan.zlo, plan.zinv, plan.pad,
            **axes, z_clip=z_clip, G=plan.G, planes=plan.planes,
            wy=plan.wy, wx=plan.wx, deq=deq,
        )
    plan = _pad_point_plan(build_sampling_plan(ray_lengths_max, max_segment_length),
                           _PLAN_BUCKET)
    return _integrate_packed(
        packed2d, *ray_args, *plan,
        **axes, z_clip=z_clip, mode=mode, deq=deq,
    )


# Plan lengths are padded up to a multiple of this so that slices of a cube
# (whose plans differ by a few groups) land on a handful of shapes and reuse
# compiled integrate programs (plan data are operands; only shapes are
# static). Padding integrates to exactly zero; keep the granularity small -
# every padded group costs a real gather per ray.
_PLAN_BUCKET = 4


def _pad_group_plan(plan: 'GroupPlan', bucket: int) -> 'GroupPlan':
    n = plan.anchor.size
    target = int(np.ceil(n / bucket)) * bucket
    if target == n:
        return plan
    e = target - n
    pad_row = dict(
        anchor=np.zeros(e, np.int32),
        pad=np.ones((e, plan.G), bool),
        lvl=np.zeros((e, plan.G), np.int32),
        frac=np.zeros((e, plan.G)),
        wa_lvl=np.zeros((e, plan.G), np.int32),
        wa=np.zeros((e, plan.G)),
        wb_lvl=np.zeros((e, plan.G), np.int32),
        wb=np.zeros((e, plan.G)),
        dzoff=np.zeros((e, plan.G), np.int32),
        zlo=np.full((e, plan.G), plan.zlo.flat[0]),
        zinv=np.full((e, plan.G), plan.zinv.flat[0]),
    )
    kw = {k: np.concatenate([getattr(plan, k), pad_row[k]], axis=0)
          for k in pad_row}
    return GroupPlan(G=plan.G, planes=plan.planes,
                     wy=getattr(plan, 'wy', 3), wx=getattr(plan, 'wx', 3),
                     **kw)


def _pad_point_plan(plan, bucket: int):
    """Zero-weight padding for the dedup point plan: weight 0 contributes 0
    (the lvl-0 f=0 sample is NaN only for rays that are NaN anyway)."""
    coord_lvl, fracs, wa_lvl, wa, wb_lvl, wb = plan
    n = coord_lvl.size
    target = int(np.ceil(n / bucket)) * bucket
    if target == n:
        return plan
    e = target - n
    z32 = np.zeros(e, np.int32)
    zf = np.zeros(e)
    return (np.concatenate([coord_lvl, z32]), np.concatenate([fracs, zf]),
            np.concatenate([wa_lvl, z32]), np.concatenate([wa, zf]),
            np.concatenate([wb_lvl, z32]), np.concatenate([wb, zf]))


def pack_cubes(cube_wet, cube_hydro, mode=None, grouped: bool = False):
    """Build the packed corner table; returns (packed2d, mode)."""
    cube_wet = jnp.asarray(cube_wet)
    cube_hydro = jnp.asarray(cube_hydro)
    if mode is None:
        mode = pack_mode_for(cube_wet.shape, cube_wet.dtype, grouped=grouped)
    if mode == 'brick':
        spec = (_brick_spec_for(cube_wet.shape, cube_wet.dtype)
                or _BRICK_SPECS[-1][:4])
        planes, wy, wx, _ = spec
        return _pack_bricks(cube_wet, cube_hydro, planes, wy, wx), mode
    if mode == 'brick_i16':
        # spec derives from the int16 TABLE dtype (the capacity band exists
        # because the i16 byte-limit check admits 2x the cells); with the
        # single-spec ladder this equals the f32 spec wherever both fit
        spec = (_brick_spec_for(cube_wet.shape, np.int16)
                or _BRICK_SPECS[-1][:4])
        planes, wy, wx, _ = spec
        qw, sw, ow = _quantize_i16(cube_wet)
        qh, sh, oh = _quantize_i16(cube_hydro)
        deq = jnp.stack([sw, ow, sh, oh])
        return (_pack_bricks(qw, qh, planes, wy, wx), deq), mode
    if mode == 'pack16_i16':
        qw, sw, ow = _quantize_i16(cube_wet)
        qh, sh, oh = _quantize_i16(cube_hydro)
        deq = jnp.stack([sw, ow, sh, oh])
        return (_pack_cubes(qw, qh, 'pack16'), deq), mode
    return _pack_cubes(cube_wet, cube_hydro, mode), mode
