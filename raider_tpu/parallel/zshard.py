"""Z-slab cube sharding: raytrace integration for cubes past one chip's HBM.

The framework's default scaling mode replicates the weather cube and shards
RAYS (parallel/mesh.py) — right whenever the packed table fits one chip.
This module adds the opposite decomposition for when it does not (global
0.1-deg ERA5 is ~888M cells: 28 GB even as the PACK4 floor, far past a v5e's
16 GB): the packed corner table is sharded into contiguous Z-SLABS over the
mesh, every chip runs the full ray batch against its slab with contributions
masked to the z-cells it owns, and one ``psum`` over the mesh axis adds the
per-slab partial integrals — the SURVEY §5 "shard by z-slab over ICI if it
exceeds HBM" design, and the framework's first compute-path collective.

Why this decomposition is exact and clean here: every PACK16 sample reads
exactly ONE table row (its z-anchor cell — both z corners ride the row), so
contiguous anchor slabs partition the samples; a sample's contribution is
added by exactly one chip (its runtime z-cell owner) and zeros elsewhere,
making the psum equal to the unsharded sum up to float summation ORDER (the
per-chip accumulation order matches the unsharded scan; only the final
8-way psum reassociates — deterministic run-to-run, ~1 ulp vs unsharded).
PACK4 rows also read the z+1 anchor row, so slabs carry a one-plane row
halo. NaN semantics are preserved: the owning chip contributes the same
NaN the unsharded kernel would, non-owners contribute 0.0, and NaN + 0
propagates through the psum.

This is a CAPACITY (weak-scaling) mode, not a speedup: the kernel is
gather-count bound and every chip still issues all P gathers (against a
table 1/n_dev the size). Per-chip wall time ~= unsharded wall time; what
scales is the largest cube that fits the mesh. Wall-clock strong scaling
stays the job of the ray-sharding mode.

No reference analogue: the reference holds the full interpolator in host
RAM and threads over it (delayFcns.py:48-73); this is the TPU-native
answer for the same giant-model scenario.
"""

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from raider_tpu.delay.raytrace import (MAX_SEGMENT_LENGTH, _I16_NAN,
                                       _PLAN_BUCKET, _i16_column_deq,
                                       _locate_uniformish, _pack_cubes,
                                       _pad_point_plan, _quantize_i16,
                                       build_sampling_plan)
from raider_tpu.parallel.mesh import get_mesh

_Z_MODES = ('pack16', 'pack16_i16', 'pack4')


def zshard_auto(cube_shape, dtype, pack_mode: str,
                n_dev: Optional[int] = None) -> bool:
    """Whether the engine should take the z-shard path for this cube.

    ``RAIDER_TPU_ZSHARD=1`` forces it (multi-device only), ``=0`` disables;
    default 'auto' engages when the REPLICATED packed table would exceed
    the per-chip budget (``RAIDER_TPU_ZSHARD_BUDGET_GB``, default 10 — a
    16 GB v5e must also hold rays, outputs, and the result stream)."""
    import os

    env = os.environ.get('RAIDER_TPU_ZSHARD', '')
    if env == '0' or pack_mode not in _Z_MODES:
        return False
    n_dev = int(np.prod(get_mesh().devices.shape)) if n_dev is None else n_dev
    if n_dev <= 1:
        return False
    if env == '1':
        return True
    itemsize = np.dtype(dtype).itemsize
    bytes_per_cell = {'pack16': 16 * itemsize, 'pack16_i16': 32,
                      'pack4': 4 * itemsize}[pack_mode]
    try:
        budget = float(os.environ.get('RAIDER_TPU_ZSHARD_BUDGET_GB', '10'))
    except ValueError:
        budget = 10.0
    return int(np.prod(cube_shape)) * bytes_per_cell > budget * 1e9


def _slab_bounds(n_cells: int, n_dev: int):
    """Contiguous anchor-cell slabs [lo_d, hi_d) covering [0, n_cells)."""
    edges = np.linspace(0, n_cells, n_dev + 1).round().astype(np.int64)
    return edges[:-1], edges[1:]


def pack_cube_slabs(cube_wet, cube_hydro, mode: str, n_dev: int,
                    mesh=None):
    """Per-device packed tables, stacked (n_dev, R_max, width).

    Device d's rows cover z anchors [lo_d, hi_d) (+ one halo anchor plane
    for pack4's ``lin + ny*nx`` second-plane gather); rows pad with zeros to
    the widest slab so the stacked array shards evenly. Returns
    (tables, z_lo, z_hi, deq) with z_lo/z_hi (n_dev,) int32 and deq the
    (4,) global dequant params for pack16_i16 (None otherwise).

    For genuinely giant cubes the per-slab pack should stream from host
    shards; here the full cube transits host RAM once, which is the same
    requirement the reference's in-RAM interpolator imposes.
    """
    if mode not in _Z_MODES:
        raise ValueError(f'z-shard supports {_Z_MODES}, not {mode!r}')
    cube_wet = np.asarray(cube_wet)
    cube_hydro = np.asarray(cube_hydro)
    nz, ny, nx = cube_wet.shape
    deq = None
    if mode == 'pack16_i16':
        qw, sw, ow = _quantize_i16(jnp.asarray(cube_wet))
        qh, sh, oh = _quantize_i16(jnp.asarray(cube_hydro))
        deq = jnp.stack([sw, ow, sh, oh])
        cube_wet, cube_hydro = np.asarray(qw), np.asarray(qh)
        pack_mode = 'pack16'
    else:
        pack_mode = mode
    # anchors live in [0, nz-2] after locate clipping; partition those cells
    lo, hi = _slab_bounds(nz - 1, n_dev)
    halo = 1 if mode == 'pack4' else 0
    tables = []
    r_max = 0
    for d in range(n_dev):
        # rows for anchors lo..hi-1(+halo) need cube planes lo..hi+1(+halo)
        top = min(int(hi[d]) + 1 + halo, nz)
        sl_w = cube_wet[int(lo[d]):top]
        sl_h = cube_hydro[int(lo[d]):top]
        t = np.asarray(_pack_cubes(jnp.asarray(sl_w), jnp.asarray(sl_h),
                                   pack_mode))
        n_anchor = int(hi[d]) - int(lo[d]) + halo
        t = t[: n_anchor * ny * nx]
        tables.append(t)
        r_max = max(r_max, t.shape[0])
    width = tables[0].shape[1]
    stacked = np.zeros((n_dev, r_max, width), tables[0].dtype)
    for d, t in enumerate(tables):
        stacked[d, : t.shape[0]] = t
    # create the table ALREADY SHARDED over the mesh: a plain jnp.asarray
    # would materialize the full (n_dev, R, W) array on the default device
    # - the exact OOM the capacity mode exists to avoid - and pay a full
    # reshard on every slice. make_array_from_callback hands each device
    # only its slab (and is the multi-process-safe construction: every
    # process builds identical host data).
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh or get_mesh()
    axis = mesh.axis_names[0]

    def _global(arr, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx: arr[idx])

    return (_global(stacked, P(axis)),
            _global(np.asarray(lo, np.int32), P(axis)),
            _global(np.asarray(hi, np.int32), P(axis)), deq)


def _zshard_partial(table_d, z_lo, z_hi,
                    bnd_y, bnd_x, bnd_z, d2, ray_len, re_local,
                    plan, ys_np, xs_np, zs_np, z_clip, mode, deq,
                    compute_dtype):
    """One device's partial (2, N) integral: the _integrate_packed sample
    walk (raytrace.py:269-368 semantics, same order) with gathers against
    the LOCAL slab and contributions masked to owned z-cells."""
    ny, nx = ys_np.size, xs_np.size
    r_rows = table_d.shape[0]
    if mode == 'pack16_i16':
        sc, of = _i16_column_deq(16, deq, compute_dtype)

    def sample_one(lvl, ff, la, ca, lb, cb):
        ly = jnp.take(bnd_y, lvl, axis=0)
        lx = jnp.take(bnd_x, lvl, axis=0)
        lz = jnp.take(bnd_z, lvl, axis=0)
        hy = jnp.take(bnd_y, lvl + 1, axis=0)
        hx = jnp.take(bnd_x, lvl + 1, axis=0)
        hz = jnp.take(bnd_z, lvl + 1, axis=0)
        dd2 = jnp.take(d2, lvl, axis=0)
        rl = (ca * jnp.take(ray_len, la, axis=0)
              + cb * jnp.take(ray_len, lb, axis=0))

        py = ly + ff * (hy - ly)
        px = lx + ff * (hx - lx)
        pz = lz + ff * (hz - lz)
        hbar = 0.5 * (lz + hz)
        pz = pz - ff * (1.0 - ff) * dd2 / (2.0 * (re_local + hbar))
        if z_clip:
            pz = jnp.clip(pz, zs_np[0], zs_np[-1])

        iy, fy, by = _locate_uniformish(ys_np, py)
        ix, fx, bx = _locate_uniformish(xs_np, px)
        iz, fz, bz = _locate_uniformish(zs_np, pz)
        own = (iz >= z_lo) & (iz < z_hi)
        lin = ((iz - z_lo) * ny + iy) * nx + ix
        lin = jnp.clip(lin, 0, r_rows - 1)      # non-owned: clipped, masked

        fy = fy.astype(compute_dtype)
        fx = fx.astype(compute_dtype)
        fz = fz.astype(compute_dtype)

        if mode in ('pack16', 'pack16_i16'):
            g = jnp.take(table_d, lin, axis=0)
            if mode == 'pack16_i16':
                g = jnp.where(g == _I16_NAN, jnp.nan,
                              g.astype(compute_dtype) * sc + of)
            w00 = (1 - fy) * (1 - fx)
            w01 = (1 - fy) * fx
            w10 = fy * (1 - fx)
            w11 = fy * fx
            wlo = (g[:, 0] * w00 + g[:, 2] * w01
                   + g[:, 4] * w10 + g[:, 6] * w11)
            hlo = (g[:, 1] * w00 + g[:, 3] * w01
                   + g[:, 5] * w10 + g[:, 7] * w11)
            whi = (g[:, 8] * w00 + g[:, 10] * w01
                   + g[:, 12] * w10 + g[:, 14] * w11)
            hhi = (g[:, 9] * w00 + g[:, 11] * w01
                   + g[:, 13] * w10 + g[:, 15] * w11)
        else:  # pack4 (one-plane row halo covers the + ny*nx gathers)
            g00 = jnp.take(table_d, lin, axis=0)
            g01 = jnp.take(table_d, jnp.clip(lin + nx, 0, r_rows - 1), axis=0)
            g10 = jnp.take(table_d, jnp.clip(lin + ny * nx, 0, r_rows - 1),
                           axis=0)
            g11 = jnp.take(table_d,
                           jnp.clip(lin + ny * nx + nx, 0, r_rows - 1),
                           axis=0)

            def xl(g):
                return (g[:, 0] * (1 - fx) + g[:, 2] * fx,
                        g[:, 1] * (1 - fx) + g[:, 3] * fx)

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
        wt = (1.0e-6 * rl).astype(compute_dtype)
        # ownership mask AFTER the NaN semantics: the owner contributes
        # exactly the unsharded sample value (incl. its NaN), others 0
        zero = jnp.zeros((), compute_dtype)
        return (jnp.where(own, wt * vw, zero).astype(compute_dtype),
                jnp.where(own, wt * vh, zero).astype(compute_dtype))

    def body(carry, plan_s):
        acc_w, acc_h = carry
        lvl, ff, la, ca, lb, cb = plan_s
        dw, dh = sample_one(lvl, ff, la, ca, lb, cb)
        return (acc_w + dw, acc_h + dh), None

    n = bnd_y.shape[1]
    init = (jnp.zeros(n, compute_dtype), jnp.zeros(n, compute_dtype))
    (wet, hydro), _ = jax.lax.scan(body, init, plan)
    return jnp.stack([wet, hydro])


def integrate_rays_z_sharded(
    cube_wet, cube_hydro, ys, xs, zs,
    bnd_y, bnd_x, bnd_z, d2, ray_len, re_local,
    ray_lengths_max,
    max_segment_length: float = MAX_SEGMENT_LENGTH,
    z_clip: bool = True,
    mode: str = 'pack16',
    mesh=None,
    packed=None,
):
    """Raytrace integration with the CUBE z-slab-sharded over the mesh.

    Same sampling semantics as ``integrate_rays`` in the packed modes
    ('pack16' | 'pack16_i16' | 'pack4'); rays replicate, the table shards,
    one psum rides the ICI. Returns (wet, hydro) (N,) on every device.
    ``packed`` accepts a prebuilt :func:`pack_cube_slabs` tuple so a slice
    loop packs the slabs ONCE per cube.

    Multi-process note: the sharded table is built multi-process-safe
    (make_array_from_callback), but the replicated RAY inputs here are
    plain per-process arrays — on a multi-host mesh callers must pass
    global arrays; the engine's auto path is single-controller for now.
    """
    mesh = mesh or get_mesh()
    n_dev = int(np.prod(mesh.devices.shape))

    tables, z_lo, z_hi, deq = (packed if packed is not None else
                               pack_cube_slabs(cube_wet, cube_hydro, mode,
                                               n_dev, mesh=mesh))
    # the TABLE dtype (the exact analogue of _integrate_packed's rule);
    # never jnp.asarray(cube) - that would round-trip the full cube
    # through the device once per slice just to learn a dtype
    compute_dtype = (deq.dtype if deq is not None
                     else np.dtype(tables.dtype))
    # bucket the plan length so redo/per-slice plans reuse executables
    plan_np = _pad_point_plan(
        build_sampling_plan(np.asarray(ray_lengths_max),
                            max_segment_length), _PLAN_BUCKET)
    plan = (
        jnp.asarray(plan_np[0], jnp.int32),
        jnp.asarray(plan_np[1], compute_dtype),
        jnp.asarray(plan_np[2], jnp.int32),
        jnp.asarray(plan_np[3], compute_dtype),
        jnp.asarray(plan_np[4], jnp.int32),
        jnp.asarray(plan_np[5], compute_dtype),
    )

    fn = _zshard_call(mesh, mode, bool(z_clip),
                      tuple(np.asarray(ys).tolist()),
                      tuple(np.asarray(xs).tolist()),
                      tuple(np.asarray(zs).tolist()),
                      deq is not None, np.dtype(compute_dtype).name)
    deq_args = () if deq is None else (deq,)
    out = fn(tables, z_lo, z_hi,
             jnp.asarray(bnd_y, compute_dtype),
             jnp.asarray(bnd_x, compute_dtype),
             jnp.asarray(bnd_z, compute_dtype),
             jnp.asarray(d2, compute_dtype),
             jnp.asarray(ray_len, compute_dtype),
             jnp.asarray(re_local, compute_dtype), *plan, *deq_args)
    return out[0], out[1]


@lru_cache(maxsize=32)
def _zshard_call(mesh, mode, z_clip, ys_t, xs_t, zs_t, has_deq, dtype_name):
    """Cached jitted shard_map: rebuilding the wrap per slice would
    re-trace the scan kernel ~50x per cube (the replicated path jits once;
    this cache is its analogue - jit then reuses executables per shape)."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    ys_np = np.asarray(ys_t)
    xs_np = np.asarray(xs_t)
    zs_np = np.asarray(zs_t)
    compute_dtype = np.dtype(dtype_name)

    def shard_body(table_b, zlo_b, zhi_b, by, bx, bz, dd2, rl, re,
                   *plan_and_deq):
        plan_b = plan_and_deq[:6]
        deq_b = plan_and_deq[6:]
        part = _zshard_partial(
            table_b[0], zlo_b[0], zhi_b[0], by, bx, bz, dd2, rl, re,
            plan_b, ys_np, xs_np, zs_np, z_clip, mode,
            deq_b[0] if deq_b else None, compute_dtype)
        return jax.lax.psum(part, axis)

    in_specs = ((P(axis), P(axis), P(axis))
                + (P(None, None),) * 5 + (P(None),)
                + (P(None),) * 6
                + ((P(None),) if has_deq else ()))
    return jax.jit(jax.shard_map(shard_body, mesh=mesh, in_specs=in_specs,
                                 out_specs=P(None, None), check_vma=False))
