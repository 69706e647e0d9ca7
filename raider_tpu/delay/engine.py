"""Top-level tropospheric delay calculation.

API parity with the reference's ``tropo_delay`` (reference:
tools/RAiDER/delay.py:35-130): zenith (ZTD), projected slant, and raytraced
slant (STD) delays on a cube or at query points, from a processed weather
model file.

TPU-first redesign vs the reference:
  * ZTD cube build: all output height levels interpolate in ONE device op.
    When the output CRS matches the weather-model CRS the trilinear
    interpolation is separable and runs as three dense MXU contractions
    (reference loops height slices through scipy, delay.py:205-214).
  * Raytracing: per output height, look vectors come from one batched
    geo2rdr solve, level intersections from one batched Newton solve, and
    the whole (level x segment x pixel) integration from one fused kernel
    (reference: delay.py:256-323 triple loop).
"""

import datetime as dt
import os
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from raider_tpu.constants import MAX_SEGMENT_LENGTH
from raider_tpu.geodesy import (
    Geocentric,
    Geographic,
    crs_from_cf,
    crs_from_user,
    get_Re,
    transform_points,
)
from raider_tpu.geodesy.ellipsoid import lla2ecef
from raider_tpu.geometry.aoi import AOI, BoundingBox, Geocube
from raider_tpu.geometry.los import LOS
from raider_tpu.geometry.rays import build_ray, clip_chain, level_heights
from raider_tpu.io import Dataset, read_nc
from raider_tpu.io.ncdf import Variable
from raider_tpu.logger import logger
from raider_tpu.ops import grid_weights, interp3d_points, interp3d_separable
from raider_tpu.delay.raytrace import integrate_rays


class WeatherCube:
    """In-memory view of a processed weather-model file."""

    def __init__(self, path_or_ds: Union[str, Dataset]) -> None:
        ds = path_or_ds if isinstance(path_or_ds, Dataset) else read_nc(path_or_ds)
        self.ds = ds
        self.xs = np.asarray(ds.coords['x'].data, dtype=np.float64)
        self.ys = np.asarray(ds.coords['y'].data, dtype=np.float64)
        self.zs = np.asarray(ds.coords['z'].data, dtype=np.float64)
        # normalize all axes to ascending (interp kernels require it)
        self._flip_x = self.xs.size > 1 and self.xs[0] > self.xs[-1]
        self._flip_y = self.ys.size > 1 and self.ys[0] > self.ys[-1]
        self._flip_z = self.zs.size > 1 and self.zs[0] > self.zs[-1]
        if self._flip_x:
            self.xs = self.xs[::-1].copy()
        if self._flip_y:
            self.ys = self.ys[::-1].copy()
        if self._flip_z:
            self.zs = self.zs[::-1].copy()
        try:
            self.crs = crs_from_cf(ds['proj'].attrs)
        except (KeyError, ValueError):
            logger.warning(
                "WARNING: I can't find a CRS in the weather model file, "
                'so I will assume you are using WGS84'
            )
            self.crs = Geographic()

    def field(self, name: str, dtype=np.float64) -> np.ndarray:
        arr = np.asarray(self.ds[name].data, dtype=dtype)  # (z, y, x)
        if self._flip_z:
            arr = arr[::-1]
        if self._flip_y:
            arr = arr[:, ::-1]
        if self._flip_x:
            arr = arr[:, :, ::-1]
        return np.ascontiguousarray(arr)


def _device_get_global(tree):
    """device_get that all-gathers non-fully-addressable (multi-host) leaves
    so every process holds the full global value (see parallel.mesh)."""
    from raider_tpu.parallel.mesh import device_get_global

    return device_get_global(tree)


@jax.jit
def _stack2(w, h):
    """One (2, N) device buffer per slice: a single bulk d2h stream beats
    two per-array copies through a remote-TPU tunnel (fetch_overlap.py)."""
    return jnp.stack([w, h])


@partial(jax.jit, static_argnames=('k',))
def _stackk(k, *bufs):
    """Stack k slices' (2, N) buffers for one batched d2h copy; jitted
    (cached per arity) because an eager stack on a remote-attached backend
    pays a dispatch round trip per call."""
    return jnp.stack(bufs)


@jax.jit
def _quant16(buf):
    """Affine int16 quantization of the result stream, per (slice, field) row.

    The d2h result stream does NOT overlap device compute on remote-attached
    TPUs (the e2e slope measures compute + transfer, bench.py), so bytes on
    the wire are wall time: int16 rows halve the per-slice transfer. Same
    idiom as the pack16_i16 cube mode (raytrace.py): scale = finite_range /
    65534, NaN rides the -32768 sentinel, inf folds to NaN. Worst-case
    dequantization error is range/131068 per row plus a few f32 ulp of the
    value - < 0.1 mm for any physical delay slice (range < 13 m), measured
    0.02 mm class; the parity budget (tests/test_parity_bound.py, 0.1 mm
    on TPU) absorbs it.
    RAIDER_TPU_STREAM=f32 restores exact streaming.
    """
    finite = jnp.isfinite(buf)
    big = jnp.float32(np.inf)
    lo = jnp.min(jnp.where(finite, buf, big), axis=-1)
    hi = jnp.max(jnp.where(finite, buf, -big), axis=-1)
    ok = lo <= hi                      # False only for all-NaN rows
    lo = jnp.where(ok, lo, 0.0)
    hi = jnp.where(ok, hi, 0.0)
    scale = jnp.maximum((hi - lo) / 65534.0, jnp.float32(1e-30))
    q = jnp.round((buf - lo[..., None]) / scale[..., None]) - 32767.0
    q = jnp.clip(q, -32767.0, 32767.0)
    q = jnp.where(finite, q, -32768.0).astype(jnp.int16)
    return q, lo, scale


def _dequant16(q, lo, scale):
    """Host-side inverse of _quant16 (numpy): int16 payload -> f32 delays."""
    q = np.asarray(q)
    v = (np.asarray(lo, np.float32)[..., None]
         + (q.astype(np.float32) + np.float32(32767.0))
         * np.asarray(scale, np.float32)[..., None])
    return np.where(q == -32768, np.float32(np.nan), v)


def _stream_quant16() -> bool:
    """Quantized-i16 result stream: default on TPU, off elsewhere (on CPU
    'device->host' is a no-op copy, so quantization would cost work and
    precision for nothing). RAIDER_TPU_STREAM={i16,f32} overrides."""
    mode = os.environ.get('RAIDER_TPU_STREAM', '').lower()
    if mode == 'i16':
        return True
    if mode == 'f32':
        return False
    return jax.default_backend() == 'tpu'


def _fetch_stream(x):
    """Fetch a device array over the quantized-i16 wire when enabled.

    The zenith/projected cube path materializes whole (nz, ny, nx) f32
    fields host-side (32 MB/field for a 50x400x400 cube); on remote-attached
    TPUs that transfer is unoverlapped wall time exactly like the raytrace
    result stream, so it rides the same per-row affine int16 format
    (_quant16 over the trailing axis — for cubes that is one x-row per
    (z, y), a tighter range than the raytrace slice rows). No-op f32 fetch
    when the stream is f32 (CPU backends / RAIDER_TPU_STREAM=f32)."""
    if not _stream_quant16():
        return np.asarray(_device_get_global(x))
    q, lo, scale = _device_get_global(_quant16(x))
    return _dequant16(q, lo, scale)


def _default_compute_dtype():
    """f32 when an accelerator will run the kernels (true f64 is emulated
    there), full f64 on CPU-only hosts."""
    try:
        return np.float32 if jax.default_backend() != 'cpu' else np.float64
    except RuntimeError:
        return np.float64


def tropo_delay(
    datetime: dt.datetime,
    weather_model_file: str,
    aoi: AOI,
    los: LOS,
    height_levels: Optional[list] = None,
    out_proj: Union[int, str] = 4326,
    zref: Optional[float] = None,
    compute_dtype=None,
):
    """Calculate integrated delays on query points (reference: delay.py:35-130).

    Returns (Dataset, None) for cube-type AOIs, else (wet, hydro) arrays at
    the AOI's query points. ``compute_dtype`` defaults to float32 on
    accelerators and float64 on CPU.
    """
    if compute_dtype is None:
        compute_dtype = _default_compute_dtype()
    crs = crs_from_user(out_proj)
    wm = WeatherCube(weather_model_file)

    wm_levels = wm.zs
    toa = wm_levels.max() - 1

    if height_levels is None:
        if isinstance(aoi, Geocube):
            height_levels = aoi.readZ()
        else:
            height_levels = wm_levels

    if zref is None:
        zref = toa
    if zref > toa:
        zref = toa
        logger.warning(
            'Requested integration height (zref) is higher than top of weather model. '
            f'Forcing to top ({toa}).'
        )

    ds = _get_delays_on_cube(
        datetime, wm, weather_model_file, aoi, height_levels, los, crs, zref,
        compute_dtype=compute_dtype,
    )

    if isinstance(aoi, (BoundingBox, Geocube)):
        return ds, None

    # point-type AOI: sample the delay cube at the query points
    # (reference: delay.py:98-129)
    lats, lons = aoi.readLL()
    hgts = aoi.readZ()
    pnt_proj = Geographic()
    if crs == pnt_proj:
        pts_y, pts_x, pts_z = lats, lons, hgts
    else:
        xo, yo, zo = transform_points(pnt_proj, crs, lons, lats, hgts)
        pts_y, pts_x, pts_z = np.asarray(yo), np.asarray(xo), np.asarray(zo)

    cube_y = np.asarray(ds.coords['y'].data, dtype=np.float64)
    cube_x = np.asarray(ds.coords['x'].data, dtype=np.float64)
    cube_z = np.asarray(ds.coords['z'].data, dtype=np.float64)
    # cube axes must be ascending for interpolation; y is written N->S
    wet3 = np.asarray(ds['wet'].data, dtype=compute_dtype)
    hydro3 = np.asarray(ds['hydro'].data, dtype=compute_dtype)
    if cube_y[0] > cube_y[-1]:
        cube_y = cube_y[::-1].copy()
        wet3 = wet3[:, ::-1, :]
        hydro3 = hydro3[:, ::-1, :]
    if cube_z.size > 1 and cube_z[0] > cube_z[-1]:
        # user-specified descending height_levels
        cube_z = cube_z[::-1].copy()
        wet3 = wet3[::-1]
        hydro3 = hydro3[::-1]

    wetDelay = _fetch_stream(
        interp3d_points(wet3, cube_y, cube_x, cube_z, pts_y, pts_x, pts_z))
    hydroDelay = _fetch_stream(
        interp3d_points(hydro3, cube_y, cube_x, cube_z, pts_y, pts_x, pts_z))

    if los.is_Projected():
        los.setTime(datetime)
        los.setPoints(lats, lons, hgts)
        wetDelay = los(wetDelay)
        hydroDelay = los(hydroDelay)

    return wetDelay, hydroDelay


def _get_delays_on_cube(datetime, wm: WeatherCube, weather_model_file, aoi,
                        heights, los, crs, zref, compute_dtype=np.float64):
    """Build the delay cube (reference: delay.py:133-193)."""
    zpts = np.array(heights, dtype=np.float64)

    if not hasattr(aoi, 'xpts'):
        x_spacing = np.diff(wm.xs).mean()
        y_spacing = np.diff(wm.ys).mean()
        res = float(min(x_spacing, y_spacing))
        if not wm.crs.is_geographic:
            # projected-CRS models (HRRR) have native axes in METERS;
            # set_output_spacing expects degrees. Uses the same 1e5 m/deg
            # heuristic as the reference's cube_spacing_m conversion
            # (llreader.py:86); the reference passes native units through
            # unconverted here (delay.py:142) but only ever reaches this
            # branch with _cube_spacing_m unset, which its CLI never does.
            res /= 1e5
        aoi.set_output_spacing(ll_res=res)
        aoi.set_output_xygrid(crs)

    from raider_tpu.utils.profiling import stage

    if los.is_Zenith() or los.is_Projected():
        out_type = 'zenith' if los.is_Zenith() else 'slant - projected'
        with stage('delay.ztd_cube'):
            wetDelay, hydroDelay = _build_cube(
                wm, aoi.xpts, aoi.ypts, zpts, crs, ('wet_total', 'hydro_total'), compute_dtype
            )
    else:
        out_type = 'slant - raytracing'
        with stage('delay.raytrace_cube'):
            wetDelay, hydroDelay = _build_cube_ray(
                wm, aoi.xpts, aoi.ypts, zpts, los, crs,
                zref=zref, compute_dtype=compute_dtype,
            )

    if np.isnan(wetDelay).any() or np.isnan(hydroDelay).any():
        logger.critical('There are missing delay values. Check your inputs.')

    return writeResultsToDataset(
        datetime, aoi.xpts, aoi.ypts, zpts, crs, wetDelay, hydroDelay,
        weather_model_file, out_type,
    )


def _build_cube(wm: WeatherCube, xpts, ypts, zpts, pts_crs, fields, compute_dtype):
    """ZTD/projected cube: interpolate the integrated-delay fields onto the
    output grid, all height levels in one device op (reference loops per
    level: delay.py:196-216).

    On multi-device meshes the output grid's y axis is sharded (the cube and
    the z/x weight matrices are replicated), so the zenith/projected path
    scales across chips like the raytraced path does - SPMD with no
    collectives; results are bit-identical to the single-device run."""
    cubes = [wm.field(f, compute_dtype) for f in fields]
    n_dev = len(jax.devices())
    shard = (n_dev > 1 and len(ypts) >= n_dev
             and os.environ.get('RAIDER_TPU_SHARD', '') != '0')

    # the separable path touches every cube entry per contraction line, so a
    # single NaN would poison whole rows; gate it on NaN-free cubes
    if wm.crs == pts_crs and not any(np.isnan(c).any() for c in cubes):
        # separable fast path: three dense contractions on the MXU
        w_y = grid_weights(wm.ys, ypts)
        w_x = grid_weights(wm.xs, xpts)
        w_z = grid_weights(wm.zs, zpts)
        if shard:
            from raider_tpu.parallel.mesh import place_ray_arrays, replicate

            # shard w_y rows (= output y rows); out axis 1 comes back sharded
            (w_y_s,), orig_ny = place_ray_arrays([w_y], ray_axis=0)
            w_z_r = replicate(jnp.asarray(w_z))
            w_x_r = replicate(jnp.asarray(w_x))
            return [
                _fetch_stream(interp3d_separable(
                    replicate(jnp.asarray(c)),
                    w_z_r, w_y_s, w_x_r))[:, :orig_ny]
                for c in cubes
            ]
        return [
            _fetch_stream(interp3d_separable(c, w_z, w_y, w_x))
            for c in cubes
        ]

    # general path: transform the grid into the model CRS once, batch all
    # levels through the gather kernel
    xx, yy = np.meshgrid(xpts, ypts)
    lon, lat = (np.asarray(v) for v in pts_crs.inverse(xx, yy))
    mx, my = (np.asarray(v) for v in wm.crs.forward(lon, lat))
    pts_y = np.broadcast_to(my, (zpts.size,) + my.shape)
    pts_x = np.broadcast_to(mx, (zpts.size,) + mx.shape)
    pts_z = np.broadcast_to(zpts[:, None, None], pts_y.shape)
    if shard:
        from raider_tpu.parallel.mesh import place_ray_arrays, replicate

        (py, px, pz), orig_ny = place_ray_arrays(
            [pts_y, pts_x, pts_z], ray_axis=1)
        return [
            _fetch_stream(interp3d_points(
                replicate(jnp.asarray(c)), wm.ys, wm.xs, wm.zs,
                py, px, pz))[:, :orig_ny]
            for c in cubes
        ]
    return [
        _fetch_stream(interp3d_points(c, wm.ys, wm.xs, wm.zs,
                                      pts_y, pts_x, pts_z))
        for c in cubes
    ]


def _build_cube_ray(wm: WeatherCube, xpts, ypts, zpts, los, pts_crs,
                    zref, compute_dtype=np.float64,
                    max_segment_length: float = MAX_SEGMENT_LENGTH):
    """Raytraced cube (reference: delay.py:219-326), vectorized.

    Host (f64): pixel ECEF positions, batched geo2rdr look vectors, batched
    level intersections, endpoint transforms into model CRS.
    Device: the fused sample-interpolate-accumulate kernel per height slice.
    """
    from raider_tpu.delay.raytrace import pack_cubes

    model_zs = wm.zs
    cube_wet = wm.field('wet', compute_dtype)
    cube_hydro = wm.field('hydro', compute_dtype)

    # Origin-relative horizontal frame (round 5): boundary coords and the
    # kernel's static y/x axes are both shifted by the grid origin BEFORE
    # the f32 entry, so coordinates quantize at the grid-EXTENT ulp
    # (~0.01-0.06 m) instead of the absolute-coordinate ulp (~0.25-1.7 m
    # for stereo/UTM meters or antimeridian degrees). The device path
    # subtracts in df64 inside _finish_slice (sphere-stereo runs the whole
    # CRS transform in df64 — see device_geom._stereo_rel_from_df); the
    # host path subtracts in f64 below. RAIDER_TPU_ORIGIN_REL=0 restores
    # the absolute frame (the pre-round-5 behavior).
    origin_rel = os.environ.get('RAIDER_TPU_ORIGIN_REL', '') != '0'
    y_org = float(np.asarray(wm.ys).ravel()[0]) if origin_rel else 0.0
    x_org = float(np.asarray(wm.xs).ravel()[0]) if origin_rel else 0.0
    if origin_rel:
        ys_k = np.asarray(wm.ys, np.float64) - y_org
        xs_k = np.asarray(wm.xs, np.float64) - x_org
    else:
        ys_k, xs_k = wm.ys, wm.xs

    # On-device geometry (df64): the host-f64 path is serial-CPU bound
    # (geo2rdr + level Newton + CRS transforms dominate end-to-end time on
    # few-core hosts); on TPU backends the whole slice geometry runs on
    # device instead. df64 is exact on real TPUs but NOT under XLA:CPU's
    # LLVM fast-math (see geometry/device_geom.py), so CPU keeps host f64.
    dev_env = os.environ.get('RAIDER_TPU_DEVICE_GEOMETRY', '')
    use_device_geom = (
        dev_env != '0'
        and (dev_env == '1' or jax.default_backend() not in ('cpu',))
        and np.dtype(compute_dtype) == np.float32
        and getattr(los, '_orbit', None) is not None
    )
    if use_device_geom:
        # runtime guard: a compiler that rewrites the error-free float32
        # transforms would silently degrade geometry to f32 (mm-level delay
        # errors); probe once per backend and fall back to host f64
        from raider_tpu.geometry.device_geom import df64_backend_ok

        if not df64_backend_ok():
            use_device_geom = False
    geom_session = None
    chains = None
    if use_device_geom:
        # full-length clamped chains: level k <-> model cell k for EVERY
        # slice (zero-length levels integrate to exactly zero), so all
        # slices share ONE compiled geometry executable AND one cube-global
        # static integration plan (built from the lowest slice, whose
        # per-level maxima bound every higher slice's). Trim the shared
        # span to the cube's active range: levels below the LOWEST output
        # height or above zref are zero-length for every slice - dead
        # Newton solves and dead samples otherwise.
        hmin = float(np.min(zpts)) if zpts.size else 0.0
        j0 = max(int(np.searchsorted(model_zs, hmin, side='right')) - 1, 0)
        j1 = min(int(np.searchsorted(model_zs, zref, side='left')),
                 model_zs.size - 1)
        zs_chain = model_zs[j0:j1 + 1]
        chains = [clip_chain(zs_chain, float(ht), zref,
                             nudge_top=(j1 == model_zs.size - 1))
                  for ht in zpts]
    # pack both fields + trilinear corners into gather rows once, reused by
    # every height slice (the kernel is gather-count bound); the grouped
    # brick layout serves a whole group of samples with one gather.
    # Capacity escape hatch (round 5): when the replicated table would
    # exceed the per-chip HBM budget and a multi-device mesh exists, the
    # table z-slab-shards over the mesh instead (rays replicated, one psum
    # - parallel/zshard.py); slabs pack ONCE here for the whole slice loop.
    from raider_tpu.delay.raytrace import pack_mode_for
    from raider_tpu.parallel.zshard import pack_cube_slabs, zshard_auto

    # .dtype reads the attribute on np AND jnp arrays alike — never
    # jnp.asarray here, which would round-trip the whole cube through the
    # device just to learn its dtype
    cube_dtype = np.dtype(cube_wet.dtype)
    pack_mode = pack_mode_for(np.shape(cube_wet), cube_dtype, grouped=True)
    zshard_packed = None
    packed2d = None
    if zshard_auto(np.shape(cube_wet), cube_dtype, pack_mode):
        zshard_packed = pack_cube_slabs(cube_wet, cube_hydro, pack_mode,
                                        len(jax.devices()))
    else:
        packed2d, pack_mode = pack_cubes(cube_wet, cube_hydro, grouped=True)

    xx, yy = np.meshgrid(xpts, ypts)
    npix = xx.size

    outputArrs = [
        np.zeros((zpts.size, ypts.size, xpts.size)) for _ in range(2)
    ]

    from raider_tpu.utils.profiling import stage

    geographic = Geographic()
    # grid llh and Re are height-independent: hoist out of the slice loop
    if pts_crs != geographic:
        lon, lat = (np.asarray(v) for v in pts_crs.inverse(xx, yy))
    else:
        lon, lat = xx, yy
    re_local = np.asarray(get_Re(lat)).reshape(npix)
    re_device = None      # uploaded once; per-slice re-upload costs ~10s of
    device_outs = {}      # ms per slice through a remote-TPU tunnel
    if use_device_geom:
        from raider_tpu.geometry.device_geom import GeomSession

        # uploads ground ECEF + surface normals ONCE; per-slice targets are
        # derived on device and geo2rdr warm-starts from the previous slice
        geom_session = GeomSession(
            los._orbit, lat, lon, wm.crs,
            origin=(y_org, x_org) if origin_rel else None)
    # Device geometry processes slices bottom-up so the FIRST contributing
    # slice (the lowest) seeds the cube-global sampling plan: its per-level
    # maxima bound every higher slice's (clamping only shortens segments),
    # so one static-plan executable serves the whole cube.
    order = (np.argsort(zpts, kind='stable') if use_device_geom
             else np.arange(zpts.size))
    plan_state = None
    # RAIDER_TPU_CUBE_PLAN=0: per-slice plans + traced kernel (the pre-r2
    # behavior) - a safety valve and the attribution tool for
    # quadrature-vs-kernel parity deltas
    per_slice_plans = os.environ.get('RAIDER_TPU_CUBE_PLAN', '') == '0'
    deferred = []         # (hh, plm_dev, hsm_dev): batch-validated post-loop
    done_order = []       # integrate-dispatched slices (backpressure window)
    # backpressure window: each in-flight slice holds ~5 f32 words per
    # (level x ray) of geometry in HBM until its integrate consumes it
    # (~1 GB at 50 levels x 1M rays). 3 keeps the copy stream busy on
    # 16 GB parts; shrink when the accelerator is smaller
    bp_window = 3
    if use_device_geom:
        chain_len = max((c.size for c in chains if c is not None), default=0)
        per_slice_bytes = 5 * chain_len * npix * 4
        try:
            lim = jax.local_devices()[0].memory_stats().get('bytes_limit')
        except Exception:  # noqa: BLE001 - stats are backend-optional
            lim = None
        if lim and per_slice_bytes:
            bp_window = int(max(1, min(3, 0.35 * lim // per_slice_bytes)))

    def run_integrate(args, per_level_max, hstep_max, heights, static):
        """Dispatch one slice's integration (sharded when a mesh exists).

        wet+hydro are stacked into ONE (2, N) device buffer; the caller
        batches RAIDER_TPU_FETCH_BATCH such buffers into a stacked
        (k, 2, N) array and starts ONE async device->host copy per batch
        (flush_fetch_batch above): on remote-attached TPUs the copy stream
        is slower than the kernels and per-copy overhead dominates small
        transfers — 8 MB chunks measured ~12.8 MB/s vs 32 MB ~23.8 MB/s
        through the tunnel (scripts/fetch_overlap.py --batch)."""
        nonlocal packed2d
        if zshard_packed is not None:
            # capacity mode: table z-slab-sharded, rays REPLICATED (the
            # ray-placement branch below must not fire), one psum
            from raider_tpu.parallel.zshard import integrate_rays_z_sharded

            with stage('raytrace.integrate', log=False):
                w_z, h_z = integrate_rays_z_sharded(
                    cube_wet, cube_hydro, ys_k, xs_k, wm.zs, *args,
                    ray_lengths_max=per_level_max,
                    max_segment_length=max_segment_length,
                    mode=pack_mode, packed=zshard_packed)
            return _stack2(w_z, h_z), None
        # shard the ray batch over all available devices (SPMD: replicated
        # packed cube, sharded indices, no collectives needed)
        n_dev = len(jax.devices())
        orig_n = None
        if (n_dev > 1 and npix >= 8 * n_dev
                and os.environ.get('RAIDER_TPU_SHARD', '') != '0'):
            from raider_tpu.parallel.mesh import place_ray_arrays, replicate

            placed, orig_n = place_ray_arrays(args[:5], ray_axis=1)
            (r_a,), _ = place_ray_arrays([args[5]], ray_axis=0)
            args = (*placed, r_a)
            # rebinding persists across slices; device_put with an identical
            # sharding is a no-op, so only the first slice pays the transfer
            # (tree_map: the i16 table modes carry (table, deq) tuples)
            packed2d = jax.tree_util.tree_map(replicate, packed2d)
        with stage('raytrace.integrate', log=False):
            out = integrate_rays(
                cube_wet, cube_hydro,
                ys_k, xs_k, wm.zs,
                *args,
                ray_lengths_max=per_level_max,
                max_segment_length=max_segment_length,
                packed2d=packed2d, mode=pack_mode,
                heights=heights, hstep_max=hstep_max,
                static_plan=static, stacked_out=True,
            )
        if isinstance(out, tuple):  # non-static paths return (wet, hydro)
            out = _stack2(*out)
        return out, orig_n

    # Result-stream batching (VERDICT r2 item 4): stack k slices' (2, N)
    # outputs into ONE (k, 2, N) buffer per async copy. Measured through the
    # remote tunnel (scripts/fetch_overlap.py --batch): d2h throughput
    # roughly doubles from 8 MB chunks (~12.8 MB/s) to 32 MB (~23.8 MB/s),
    # and per-transfer round trips drop 4x; on a local-PCIe host transfers
    # are ~1 ms either way. k=1 restores per-slice copies;
    # RAIDER_TPU_ASYNC_FETCH=0 disables async copies entirely.
    try:
        fetch_batch = max(1, int(os.environ.get('RAIDER_TPU_FETCH_BATCH',
                                                '4')))
    except ValueError:
        fetch_batch = 4
    async_fetch = os.environ.get('RAIDER_TPU_ASYNC_FETCH', '') != '0'
    stream_q16 = _stream_quant16()
    fetch_batches = []       # (tuple_of_hh, stacked (k, 2, N) device buffer)
    fetch_pending = []       # hh dispatched but not yet batched

    def start_async_copy(buf):
        if not async_fetch:
            return
        for leaf in jax.tree_util.tree_leaves(buf):
            try:
                leaf.copy_to_host_async()
            except (AttributeError, RuntimeError, ValueError):
                pass  # non-jax arrays / non-fully-addressable (multi-host)

    def flush_fetch_batch():
        if not fetch_pending:
            return
        hhs = tuple(fetch_pending)
        fetch_pending.clear()
        if len(hhs) == 1:
            buf = device_outs[hhs[0]][0]
        else:
            buf = _stackk(len(hhs), *(device_outs[h][0] for h in hhs))
        if stream_q16:
            # halve the wire: (k, 2, N) i16 payload + (k, 2) f32 lo/scale.
            # The transfer is unoverlapped wall time through a remote
            # tunnel (see _quant16); dequantized at store time.
            buf = _quant16(buf)
        # drop the per-slice (2, N) buffers: the batch copy (held by
        # fetch_batches) is the only thing still needed — redo slices
        # re-dispatch from scratch, never reuse the old buffer — so
        # keeping both would double device-side output residency
        # (~16 MB/slice at 1M rays). Repointing at the batch buffer
        # (rather than None) keeps the backpressure block_until_ready
        # on already-flushed slices valid (it depends on the originals).
        for h in hhs:
            device_outs[h] = (buf, device_outs[h][1])
        start_async_copy(buf)
        fetch_batches.append((hhs, buf))

    for hh in (int(i) for i in order):
        ht = zpts[hh]
        logger.info(f'Processing slice {hh + 1} / {len(zpts)}: {ht}')

        heights = (chains[hh] if chains is not None
                   else level_heights(model_zs, ht, zref))
        if heights is None:
            # no model level contributes at this output height (at or above
            # zref / the model top): the delay stays exactly zero, like the
            # reference's build_ray returning None (losreader.py:832-835)
            continue

        if use_device_geom:
            # Steps 1-4 fused on device (targets + geo2rdr + Newton chain +
            # CRS), df64
            with stage('raytrace.device_geometry', log=False):
                geom = geom_session.slice(float(ht), chains[hh])
            if plan_state is None or per_slice_plans:
                # the FIRST contributing (lowest) slice seeds the cube-global
                # plan: one synchronous fetch per cube
                plm, hsm = _device_get_global((geom['per_level_max'],
                                               geom['hstep_max']))
                per_level_max = np.asarray(plm, dtype=np.float64)
                # inflate by the f32 coordinate quantization so the brick
                # grouping bound stays conservative (coords ~O(10-100) in
                # model units make the absolute f32 jitter ~1e-5 of a unit)
                hstep_max = np.asarray(hsm, np.float64) * (1.0 + 1e-4) + 1e-5
                # clamped chains force zero-length levels to exactly 0.0, so
                # test only the real (nonzero) levels for total divergence
                real = per_level_max[~(per_level_max == 0.0)]
                if real.size and np.isnan(real).all():
                    raise ValueError(
                        'geo2rdr did not converge. Check orbit coverage')
                use_static = not per_slice_plans
                if not per_slice_plans:
                    plan_state = [per_level_max, hstep_max, heights]
            else:
                # Higher slices share the seed plan - bottom-up order +
                # clamping-only-shortens bounds their maxima by it - UNLESS
                # the reference's per-slice nParts rule (delay.py:283) would
                # pick a DIFFERENT sample count at some contributing level.
                # That happens at the slice's partially-clamped bottom cell
                # when the model z grid is coarse (cell span O(1 km)):
                # seed-plan sampling there is FINER than the reference rule,
                # which is a real quadrature divergence (measured ~1 mm on a
                # 1.2 km-cell cube vs 0.005 mm on 100 m cells). Per-ray
                # segment length in a cell scales linearly with the cell's
                # vertical span, so the slice's per-level maxima are
                # PREDICTED host-side from the seed's fetched maxima x the
                # span ratio; a slice whose predicted nParts differ runs
                # inline with its own plan through the traced kernel (plan
                # as operands - no recompile). Predictions are verified
                # against the measured maxima post-loop (see the deferred
                # block); mispredictions trigger exact recomputes. A
                # violated grouping bound can never yield silent wrong
                # results in between - the brick kernel turns it into NaN.
                seed_chain = np.asarray(plan_state[2], np.float64)
                span_seed = np.diff(seed_chain)
                span_hh = np.diff(np.asarray(heights, np.float64))
                with np.errstate(invalid='ignore', divide='ignore'):
                    ratio = np.where(span_seed > 0.0, span_hh / span_seed, 0.0)
                plm_pred = np.nan_to_num(plan_state[0]) * ratio
                n_seed = np.ceil(np.nan_to_num(plan_state[0])
                                 / max_segment_length)
                n_pred = np.ceil(plm_pred / max_segment_length)
                contrib = plm_pred > 0.0
                if np.any(n_pred[contrib] != n_seed[contrib]):
                    # reference-rule divergence: per-slice plan, traced
                    # kernel. hstep bound stays the seed's (conservative:
                    # grouping only needs an upper bound).
                    per_level_max = plm_pred
                    hstep_max = plan_state[1]
                    use_static = False
                else:
                    per_level_max, hstep_max, heights = (
                        plan_state[0], plan_state[1], plan_state[2])
                    n_pred = n_seed
                    use_static = True
                deferred.append((hh, geom['per_level_max'],
                                 geom['hstep_max'], n_pred))
            if re_device is None:
                re_device = jnp.asarray(re_local.astype(compute_dtype))
            args = (
                geom['bnd_y'], geom['bnd_x'], geom['bnd_z'],
                geom['d2'], geom['ray_len'], re_device,
            )
        else:
            # Step 1: output grid -> ECEF at this height (host f64)
            hts = np.full(lat.shape, ht, dtype=np.float64)
            x_e, y_e, z_e = (np.asarray(v) for v in lla2ecef(lat, lon, hts))
            xyz = np.stack([x_e, y_e, z_e], axis=-1)

            # Step 2: look vectors (batched geo2rdr)
            with stage('raytrace.look_vectors', log=False):
                look = los.getLookVectors(ht, [lon, lat, hts], xyz, yy)

            # Step 3: level intersections (batched Newton)
            with stage('raytrace.build_ray', log=False):
                ray_lengths, low_xyzs, high_xyzs = build_ray(model_zs, ht, xyz, look, zref)

            if np.isnan(ray_lengths).all():
                raise ValueError('geo2rdr did not converge. Check orbit coverage')

            # Step 4: boundary points -> model CRS (f64, host). Segments are
            # contiguous (high[k] is low[k+1], both views of one array), so
            # only the L+1 UNIQUE boundary points are transformed and shipped
            def to_model(pts_xyz):
                gx, gy, gz = (
                    np.asarray(v) for v in transform_points(
                        Geocentric(), wm.crs,
                        pts_xyz[..., 0], pts_xyz[..., 1], pts_xyz[..., 2],
                    )
                )
                # interpolator ordering is (y, x, z)
                return np.stack([gy, gx, gz], axis=-1)

            bounds_xyz = np.concatenate([low_xyzs, high_xyzs[-1:]], axis=0)
            L = ray_lengths.shape[0]
            bnd_yxz = to_model(bounds_xyz).reshape(L + 1, npix, 3)
            if origin_rel:
                # f64 shift before the f32 kernel entry (frame matches the
                # shifted static axes ys_k/xs_k)
                bnd_yxz[..., 0] -= y_org
                bnd_yxz[..., 1] -= x_org
            seg_flat = ray_lengths.reshape(L, npix)

            # squared horizontal chord for the sagitta correction
            chord2 = np.sum((high_xyzs - low_xyzs) ** 2, axis=-1).reshape(seg_flat.shape)
            dz = bnd_yxz[1:, :, 2] - bnd_yxz[:-1, :, 2]
            d2 = np.maximum(chord2 - dz**2, 0.0)

            with np.errstate(invalid='ignore'):
                per_level_max = np.nanmax(seg_flat, axis=1)
                # per-level max horizontal motion (model units) for grouping,
                # inflated by the f32 coordinate quantization (the kernel
                # receives f32 endpoints) so the brick 2-cell bound stays
                # conservative - same guard as the device paths
                hstep_max = np.nanmax(np.hypot(
                    bnd_yxz[1:, :, 0] - bnd_yxz[:-1, :, 0],
                    bnd_yxz[1:, :, 1] - bnd_yxz[:-1, :, 1],
                ), axis=1) * (1.0 + 1e-5) + 1e-7

            if re_device is None:
                # Re is height-independent: upload once (the per-slice
                # re-upload costs ~10s of ms through a remote-TPU tunnel,
                # same as the device-geometry branch)
                re_device = jnp.asarray(re_local.astype(compute_dtype))
            args = (
                bnd_yxz[..., 0].astype(compute_dtype),
                bnd_yxz[..., 1].astype(compute_dtype),
                bnd_yxz[..., 2].astype(compute_dtype),
                d2.astype(compute_dtype), seg_flat.astype(compute_dtype),
                re_device,
            )
            use_static = False
        device_outs[hh] = run_integrate(
            args, per_level_max, hstep_max, heights, static=use_static)
        done_order.append(hh)
        fetch_pending.append(hh)
        if len(fetch_pending) >= fetch_batch:
            flush_fetch_batch()
        # backpressure: the free-running dispatch loop would otherwise queue
        # every slice's geometry at once; waiting on the integrate output
        # bp_window slices back bounds the in-flight set at zero
        # steady-state cost
        if use_device_geom and len(done_order) >= bp_window:
            jax.block_until_ready(device_outs[done_order[-bp_window]][0])

    if deferred:
        # deferred plan validation (see the loop comment): one batched fetch
        # of every slice's MEASURED per-level maxima, then exact recomputes
        # for any slice whose actual reference-rule nParts differ from the
        # plan it integrated with (host-side span-ratio prediction missed -
        # curvature makes the scaling only ~exact), or whose horizontal
        # motion outgrew the grouping bound it ran with (brick 2-cell
        # guarantee -> NaN poisoning, never silent errors).
        # ONE stacked (n, 2, L) transfer: fetching 2(n-1) tiny arrays
        # individually costs a tunnel round trip each
        fetched_plans = np.asarray(_device_get_global(
            jnp.stack([jnp.stack([p, h]) for _, p, h, _ in deferred])))
        # flag against the EXACT bound the slices integrated with
        # (plan_state[1]). The measured hsm_raw is the nanmax of the very
        # f32 motion values the kernel's grouping saw, so raw > bound is
        # precisely "some segment exceeded the grouping guarantee" - any
        # excursion, however small, must recompute (a looser threshold
        # would ship the brick kernel's NaN poisoning), while slices within
        # the bound's (1+1e-4)+1e-5 seed headroom never false-positive
        seed_hstep = np.nan_to_num(plan_state[1])
        redo = []
        for (hh, _, _, n_expected), (plm, hsm) in zip(deferred, fetched_plans):
            plm = np.asarray(plm, dtype=np.float64)
            hsm_raw = np.asarray(hsm, np.float64)
            # plan bound if recomputed: same inflation as the seed's
            hsm = hsm_raw * (1.0 + 1e-4) + 1e-5
            real = plm[~(plm == 0.0)]
            if real.size and np.isnan(real).all():
                raise ValueError('geo2rdr did not converge. Check orbit coverage')
            n_here = np.ceil(np.nan_to_num(plm) / max_segment_length)
            contrib = np.nan_to_num(plm) > 0.0
            if (np.any(n_here[contrib] != n_expected[contrib])
                    or np.any(np.nan_to_num(hsm_raw) > seed_hstep)):
                redo.append((hh, plm, hsm))
    else:
        redo = []
    redone = set()
    if redo:
        logger.debug('plan misprediction on slices %s: recomputing them '
                     'with their measured per-slice plans',
                     [hh for hh, _, _ in redo])
        # redone slices are fetched individually below (refetched); drop
        # them from the unflushed batch so the final flush doesn't stack
        # and transfer their recomputed buffers a second time
        redo_set = {hh for hh, _, _ in redo}
        fetch_pending[:] = [h for h in fetch_pending if h not in redo_set]
        for hh, plm, hsm in redo:
            geom = geom_session.slice(float(zpts[hh]), chains[hh],
                                      cold=True)
            args = (geom['bnd_y'], geom['bnd_x'], geom['bnd_z'],
                    geom['d2'], geom['ray_len'], re_device)
            # the slice's own measured plan through the traced kernel
            # (plan data are operands - no per-slice recompiles)
            device_outs[hh] = run_integrate(
                args, plm, hsm, chains[hh], static=False)
            redone.add(hh)

    if device_outs:
        flush_fetch_batch()

        def store(hh, out_np):
            w_np, h_np = np.asarray(out_np)
            orig_n = device_outs[hh][1]
            if orig_n is not None:
                w_np = w_np[:orig_n]
                h_np = h_np[:orig_n]
            outputArrs[0][hh] = w_np.reshape(ypts.size, xpts.size)
            outputArrs[1][hh] = h_np.reshape(ypts.size, xpts.size)

        def as_f32(buf_np, single):
            # a quantized batch arrives as the (payload, lo, scale) triple
            if stream_q16:
                q, lo, scale = buf_np
                out = _dequant16(q, lo, scale)
            else:
                out = np.asarray(buf_np)
            return out[None] if single else out

        with stage('raytrace.final_fetch', log=False):
            # batches flushed BEFORE the redo decision may hold stale
            # pre-recompute data for redone slices: skip those entries at
            # store time and fetch the recomputed outputs directly (one
            # combined device_get: each call costs a tunnel round trip).
            # Recomputed buffers ride the same quantized wire format.
            fetched, refetched = _device_get_global((
                [buf for _, buf in fetch_batches],
                {hh: (_quant16(device_outs[hh][0]) if stream_q16
                      else device_outs[hh][0]) for hh in redone}))
        for (hhs, _), buf_np in zip(fetch_batches, fetched):
            buf_np = as_f32(buf_np, single=len(hhs) == 1)
            for i, hh in enumerate(hhs):
                if hh not in redone:
                    store(hh, buf_np[i])
        for hh, out_np in refetched.items():
            store(hh, as_f32(out_np, single=False))

    return outputArrs


def writeResultsToDataset(datetime, xpts, ypts, zpts, crs, wetDelay, hydroDelay,
                          weather_model_file, out_type) -> Dataset:
    """CF-1.7 delay cube (reference writer: delay.py:329-401)."""
    attrs = {
        'Conventions': 'CF-1.7',
        'title': 'RAiDER geo cube',  # keep the reference's product string: downstream consumers key on it
        'source': os.path.basename(str(weather_model_file)),
        'history': str(dt.datetime.now(tz=dt.timezone.utc)) + ' raider-tpu',
        'description': f'RAiDER geo cube - {out_type}',
        'reference_time': datetime.strftime('%Y%m%dT%H:%M:%S'),
    }
    coords = {
        'x': Variable(('x',), np.asarray(xpts), {}),
        'y': Variable(('y',), np.asarray(ypts), {}),
        'z': Variable(('z',), np.asarray(zpts),
                      {'axis': 'Z', 'units': 'm', 'description': 'height above ellipsoid'}),
    }
    if crs.is_geographic:
        coords['y'].attrs.update(units='degrees_north', standard_name='latitude', long_name='latitude')
        coords['x'].attrs.update(units='degrees_east', standard_name='longitude', long_name='longitude')
    else:
        coords['y'].attrs.update(axis='Y', standard_name='projection_y_coordinate',
                                 long_name='y-coordinate in projected coordinate system', units='m')
        coords['x'].attrs.update(axis='X', standard_name='projection_x_coordinate',
                                 long_name='x-coordinate in projected coordinate system', units='m')

    crs_attrs = dict(crs.to_cf())
    variables = {
        'wet': Variable(('z', 'y', 'x'), np.asarray(wetDelay),
                        {'units': 'm', 'description': f'wet {out_type} delay',
                         'grid_mapping': 'crs'}),
        'hydro': Variable(('z', 'y', 'x'), np.asarray(hydroDelay),
                          {'units': 'm', 'description': f'hydrostatic {out_type} delay',
                           'grid_mapping': 'crs'}),
        'crs': Variable((), np.int64(-2147483647), crs_attrs),
    }
    return Dataset(coords=coords, variables=variables, attrs=attrs)


def transformPoints(lats, lons, hgts, old_proj, new_proj) -> np.ndarray:
    """Stacked-triplet point transform (reference: delay.py:404-436);
    returns (..., 3) in (y, x, z) order."""
    old_crs = crs_from_user(old_proj)
    new_crs = crs_from_user(new_proj)
    res = transform_points(old_crs, new_crs, lons, lats, hgts)
    return np.stack([np.asarray(res[1]), np.asarray(res[0]), np.asarray(res[2])], axis=-1)
