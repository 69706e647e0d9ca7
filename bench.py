"""Benchmark: 1M-point ZTD + raytraced-STD query on an HRRR-sized cube.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The STD leg is END-TO-END: the production ``_build_cube_ray`` engine path
including on-device ray geometry (geo2rdr + level-chain Newton + CRS via
GeomSession) plus the fused integration kernel - not just the integrate
kernel on pre-built rays (the kernel-only time is reported as a detail).

The reference publishes no throughput numbers (README Citation is TODO; see
BASELINE.md), so vs_baseline is measured against the driver-defined target
(BASELINE.json): a 1M-point ZTD+STD query in <= 1 s on v5e-8. We measure a
single chip; the ray batch is embarrassingly parallel across chips (see
raider_tpu.parallel), so the per-chip time divided by 8 approximates the
v5e-8 time. vs_baseline = target_time / (measured_single_chip / 8).

Timing notes for remote-attached TPUs: repeated identical executions can be
served from a result cache, so every iteration perturbs an input, and a
scalar output is fetched to force materialization.
"""

import json
import os as _os
import threading as _threading
import time

import numpy as np

# Watchdog: a dead remote-tunnel regime (observed 2026-08-20: a trivial op
# taking 150 s to 10+ min) would otherwise hang the bench and leave NO
# artifact line at all. Legs record into _PARTIAL as they complete; if the
# deadline passes before the final print, the watchdog emits a JSON line
# with whatever was measured ("partial": true) and exits. Disable with
# RAIDER_TPU_BENCH_DEADLINE_S=0.
_PARTIAL = {
    'metric': 'ztd_std_e2e_1Mpt_hrrr', 'value': None,
    'unit': 's_single_chip', 'vs_baseline': None,
    'detail': {'partial': True,
               'note': 'watchdog deadline hit before the run finished '
                       '(dead tunnel regime?); fields below are the legs '
                       'that completed'},
}
_BENCH_DONE = _threading.Event()
_CHILD_PROC = None      # in-flight setup-probe subprocess (holds the TPU)


def _start_watchdog() -> None:
    try:
        deadline = float(_os.environ.get('RAIDER_TPU_BENCH_DEADLINE_S',
                                         '4500'))
    except ValueError:
        deadline = 4500.0
    if deadline <= 0:
        return

    def run():
        if not _BENCH_DONE.wait(deadline):
            # the main thread may be mutating _PARTIAL['detail'] right now;
            # retry the snapshot, then fall back to a minimal valid line —
            # a dead watchdog would defeat the whole mechanism
            for _ in range(5):
                try:
                    line = json.dumps(
                        {**_PARTIAL, 'detail': dict(_PARTIAL['detail'])})
                    break
                except RuntimeError:
                    time.sleep(0.05)
            else:
                line = json.dumps({
                    'metric': _PARTIAL['metric'], 'value': None,
                    'unit': _PARTIAL['unit'], 'vs_baseline': None,
                    'detail': {'partial': True}})
            # a still-running probe child holds the EXCLUSIVE TPU
            # attachment; leaving it orphaned would hang the next launch
            child = _CHILD_PROC
            if child is not None and child.poll() is None:
                child.kill()
            # exit 0: a partial artifact (honestly flagged by "partial")
            # recorded by the driver beats a timed-out run with no line
            print(line, flush=True)
            _os._exit(0)

    _threading.Thread(target=run, daemon=True).start()


def main() -> None:
    _start_watchdog()
    # ------------- cold/warm start (VERDICT r3 item 4), FIRST: the remote
    # TPU attachment is exclusive (a second process's ops hang while the
    # first holds the chip — measured), so the two probe subprocesses run
    # before this process touches any backend. One fresh compile-cache dir:
    # the cold leg populates it, the warm leg is a NEW process that can only
    # be fast if the on-disk cache actually serves the compiled executables
    # (incl. the static-plan integrate) across processes.
    import os
    import subprocess
    import sys
    import tempfile

    setup_cold_s = setup_warm_s = None
    setup_cache_served = None
    setup_cache_files = None
    if os.environ.get('RAIDER_TPU_BENCH_SETUP', '1') != '0':
        probe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             'scripts', 'setup_probe.py')
        legs = []
        with tempfile.TemporaryDirectory(prefix='raider_xla_cold') as td:
            env = dict(os.environ, RAIDER_TPU_COMPILE_CACHE=td)
            # cold measured 526-692 s across tunnel regimes — a 720 s cap
            # was one bad regime away from killing the leg (and a dead cold
            # leg half-populates the cache, poisoning the warm criterion)
            global _CHILD_PROC
            for _leg, _cap in (('cold', 1500), ('warm', 720)):
                try:
                    # Popen (not run) so the watchdog can kill the child:
                    # it holds the exclusive TPU attachment
                    p = subprocess.Popen(
                        [sys.executable, probe], env=env, text=True,
                        stdout=subprocess.PIPE, stderr=subprocess.PIPE)
                    _CHILD_PROC = p
                    try:
                        stdout, _ = p.communicate(timeout=_cap)
                    except subprocess.TimeoutExpired:
                        p.kill()
                        p.communicate()
                        raise
                    finally:
                        _CHILD_PROC = None
                    legs.append(json.loads(
                        stdout.strip().splitlines()[-1]))
                except Exception:  # noqa: BLE001 - probe legs are optional
                    legs.append(None)
            if legs[0]:
                setup_cold_s = legs[0]['t_first_slice_s']
            if legs[1]:
                setup_warm_s = legs[1]['t_first_slice_s']
            if legs[0] and legs[1]:
                # "served" = the cold leg populated the cache AND the warm
                # process compiled NOTHING new (zero added cache files).
                # Wall-time ratios are NOT the criterion: the tunnel drifts
                # 3-100 MB/s between legs minutes apart, and the warm leg
                # still pays cache deserialization/upload through it, so a
                # warm leg in a degraded regime can out-wall-clock a cold
                # leg in a fast one (observed 307.6 s warm vs 157.9 s cold;
                # the 2026-08-19 pair measured 526.6 -> 114.6 s with zero
                # recompiles, BASELINE.md "Cold vs warm start").
                setup_cache_served = bool(
                    legs[0]['cache_files_after'] > 0
                    and legs[1]['cache_files_after']
                    <= legs[0]['cache_files_after'])
                setup_cache_files = [legs[0]['cache_files_after'],
                                     legs[1]['cache_files_after']]
        _PARTIAL['detail'].update(
            setup_cold_s=setup_cold_s, setup_warm_s=setup_warm_s,
            setup_cache_served=setup_cache_served)

    import jax
    import jax.numpy as jnp

    import raider_tpu  # noqa: F401  (enables x64; kernels pick f32 explicitly)
    from raider_tpu.delay.raytrace import build_sampling_plan, integrate_rays, pack_cubes
    from raider_tpu.ops.integrate import cumtrapz_from_top
    from raider_tpu.ops.interp import grid_weights, interp3d_separable

    rng = np.random.default_rng(0)
    dtype = np.float32

    # HRRR-like CONUS crop: 50 levels x 400 x 400 (3 km grid)
    nz, ny, nx = 50, 400, 400
    n_rays = 1_000_000
    wet = rng.uniform(0.1, 100.0, (nz, ny, nx)).astype(dtype)
    hydro = rng.uniform(50.0, 300.0, (nz, ny, nx)).astype(dtype)
    zs = -500.0 + 26500.0 * np.linspace(0.0, 1.0, nz) ** 1.4
    ys = np.linspace(30.0, 40.0, ny)
    xs = np.linspace(-125.0, -115.0, nx)

    # ---------------------------------------------------------- ZTD (1 Mpt)
    qz, qy, qx = 10, 320, 320
    w_z = grid_weights(zs, np.linspace(0, 9000, qz)).astype(dtype)
    w_y = grid_weights(ys, np.linspace(31, 39, qy)).astype(dtype)
    w_x = grid_weights(xs, np.linspace(-124, -116, qx)).astype(dtype)

    @jax.jit
    def ztd_query(wet, hydro, zs, w_z, w_y, w_x, bump):
        wet_total = jnp.moveaxis(cumtrapz_from_top(jnp.moveaxis(wet + bump, 0, -1), zs), -1, 0)
        hydro_total = jnp.moveaxis(cumtrapz_from_top(jnp.moveaxis(hydro, 0, -1), zs), -1, 0)
        a = interp3d_separable(wet_total, w_z, w_y, w_x)
        b = interp3d_separable(hydro_total, w_z, w_y, w_x)
        return a.sum() + b.sum()

    args = [jnp.asarray(a) for a in (wet, hydro, zs.astype(dtype), w_z, w_y, w_x)]
    _ = float(ztd_query(*args, 0.0))
    t_ztd = []
    for k in range(1, 4):
        t0 = time.perf_counter()
        _ = float(ztd_query(*args, float(k) * 1e-6))
        t_ztd.append(time.perf_counter() - t0)
    t_ztd = min(t_ztd)
    _PARTIAL['detail']['ztd_s'] = round(t_ztd, 4)

    # ---------------- production _getZTD path: Pallas kernel vs XLA fallback
    # wx.base._get_ztd wires ops.pallas_ztd.ztd_totals as the TPU production
    # path (refractivity + top-down trapezoid scan in ONE kernel); this leg
    # drives BOTH it and the XLA composition it replaces on the same t/p/e
    # cubes, asserts equivalence, and records both timings (VERDICT r2
    # item 2: the artifact must prove the kernel runs, agrees, and which is
    # faster).
    k1, k2, k3 = 0.776, 0.233, 3.75e3        # ECMWF refractivity constants
    t_cube = rng.uniform(215.0, 300.0, (nz, ny, nx)).astype(dtype)
    p_cube = rng.uniform(2e3, 1.01e5, (nz, ny, nx)).astype(dtype)
    e_cube = rng.uniform(5.0, 3.5e3, (nz, ny, nx)).astype(dtype)

    @jax.jit
    def ztd_xla_path(t, p, e, zs_j, bump):
        tb = t + bump
        wet_n = k2 * e / tb + k3 * e / (tb * tb)
        hyd_n = k1 * p / tb
        wet_t = jnp.moveaxis(
            cumtrapz_from_top(jnp.moveaxis(wet_n, 0, -1), zs_j), -1, 0)
        hyd_t = jnp.moveaxis(
            cumtrapz_from_top(jnp.moveaxis(hyd_n, 0, -1), zs_j), -1, 0)
        return wet_t, hyd_t

    t_ztd_pallas = t_ztd_xla = float('nan')
    ztd_equiv_rel = float('nan')
    ztd_production = 'xla'
    if jax.default_backend() == 'tpu':
        from raider_tpu.ops.pallas_ztd import ztd_totals

        ztd_production = 'pallas'
        targs = [jnp.asarray(a) for a in (t_cube, p_cube, e_cube,
                                          zs.astype(dtype))]

        @jax.jit
        def pallas_path(t, p, e, zs_j, bump):
            return ztd_totals(t + bump, p, e, zs_j, k1=k1, k2=k2, k3=k3)

        @jax.jit
        def rel_delta(t, p, e, zs_j):
            pw, ph = ztd_totals(t, p, e, zs_j, k1=k1, k2=k2, k3=k3)
            xw, xh = ztd_xla_path(t, p, e, zs_j, 0.0)
            num = jnp.maximum(jnp.abs(pw - xw).max(), jnp.abs(ph - xh).max())
            den = jnp.maximum(jnp.abs(xw).max(), jnp.abs(xh).max())
            return num / den

        ztd_equiv_rel = float(rel_delta(*targs))
        assert ztd_equiv_rel < 5e-6, (
            f'Pallas ZTD kernel diverges from the XLA path: {ztd_equiv_rel}')

        def time_path(fn):
            _ = float(jnp.nansum(fn(*targs, 0.0)[0]))
            ts = []
            for k in range(1, 4):
                t0 = time.perf_counter()
                _ = float(jnp.nansum(fn(*targs, float(k) * 1e-4)[0]))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_ztd_pallas = time_path(pallas_path)
        t_ztd_xla = time_path(ztd_xla_path)

    # ------------------- station-batch ZTD point query (the GNSS path)
    # reference delay.py:98-129: point-type AOIs (StationFile) sample the
    # delay cube at scattered station (lat, lon, hgt) points - the
    # highest-traffic workflow after cubes (VERDICT r3 item 8). 1M stations
    # against the integrated cubes through the production interp3d_points
    # gather kernel (the exact call tropo_delay makes, engine.py:193).
    from raider_tpu.ops.interp import interp3d_points

    @jax.jit
    def integrate_cubes(wet, hydro, zs_j):
        wet_t = jnp.moveaxis(
            cumtrapz_from_top(jnp.moveaxis(wet, 0, -1), zs_j), -1, 0)
        hyd_t = jnp.moveaxis(
            cumtrapz_from_top(jnp.moveaxis(hydro, 0, -1), zs_j), -1, 0)
        return wet_t, hyd_t

    n_st = 1_000_000
    wet_t_d, hyd_t_d = jax.block_until_ready(integrate_cubes(
        jnp.asarray(wet), jnp.asarray(hydro), jnp.asarray(zs.astype(dtype))))
    st_y = jnp.asarray(rng.uniform(31.0, 39.0, n_st).astype(dtype))
    st_x = jnp.asarray(rng.uniform(-124.0, -116.0, n_st).astype(dtype))
    st_z = jnp.asarray(rng.uniform(0.0, 8000.0, n_st).astype(dtype))

    def run_stations(bump):
        pz = st_z + bump           # on-device perturbation per rep
        a = interp3d_points(wet_t_d, ys, xs, zs, st_y, st_x, pz)
        b = interp3d_points(hyd_t_d, ys, xs, zs, st_y, st_x, pz)
        return float(jnp.nansum(a) + jnp.nansum(b))

    _ = run_stations(jnp.float32(0.0))
    t_station = []
    for k in range(1, 4):
        t0 = time.perf_counter()
        _ = run_stations(jnp.float32(k) * 1e-3)
        t_station.append(time.perf_counter() - t0)
    t_station = min(t_station)
    _PARTIAL['detail']['station_ztd_1M_s'] = round(t_station, 4)
    del wet_t_d, hyd_t_d, st_y, st_x, st_z

    # --------------------------------------------------- raytraced STD (1 M)
    # contiguous slant rays (random start, azimuth, 25-45 deg zenith): the
    # brick kernel's grouping guarantees rely on level-to-level continuity,
    # exactly like the segments build_ray produces
    L = nz - 1
    zen = rng.uniform(np.deg2rad(25.0), np.deg2rad(45.0), n_rays)
    azi = rng.uniform(0.0, 2.0 * np.pi, n_rays)
    y0 = rng.uniform(32.0, 38.0, n_rays)
    x0 = rng.uniform(-123.0, -117.0, n_rays)
    dzv = (zs[1:] - zs[:-1])
    deg_per_m = 1.0 / 111000.0
    # plan inputs: per-level maxima are closed-form in max(zen), no (L, N)
    # host arrays needed
    max_sec = float((1.0 / np.cos(zen)).max())
    max_tan = float(np.tan(zen).max())
    per_level_max = (dzv * max_sec).astype(dtype)
    heights = zs.copy()
    hstep_max = dzv * max_tan * deg_per_m
    n_samples = build_sampling_plan(per_level_max)[0].size

    packed2d, mode = pack_cubes(wet, hydro, grouped=True)
    n_gathers = n_samples
    if mode in ('brick', 'brick_i16'):
        from raider_tpu.delay.raytrace import build_group_plan
        n_gathers = build_group_plan(per_level_max, heights, hstep_max,
                                     ys, xs, zs).anchor.size
    from raider_tpu.delay.raytrace import pallas_integrate_mode
    integrate_kernel = ('pallas' if pallas_integrate_mode(ys, xs) == 'tpu'
                        else 'xla')

    # build the (L, N) ray batch ON DEVICE from the 4 small per-ray arrays:
    # uploading ~1.6 GB of precomputed endpoints through the remote-TPU
    # tunnel dominated benchmark wall time, while 4x8 MB is instant. The
    # measured kernel is unchanged; the perturbation that defeats result
    # caching is applied on-device so no re-upload happens per run.
    @jax.jit
    def build_rays(zen, azi, y0, x0, dzv_j, zs_j):
        dh = dzv_j[:, None] * jnp.tan(zen)[None, :]     # horizontal m / level
        ystep = dh * jnp.cos(azi) * deg_per_m
        xstep = dh * jnp.sin(azi) * deg_per_m
        zero = jnp.zeros((1, zen.size), ystep.dtype)
        ycum = jnp.concatenate([zero, jnp.cumsum(ystep, axis=0)], axis=0)
        xcum = jnp.concatenate([zero, jnp.cumsum(xstep, axis=0)], axis=0)
        # contiguous segments: ONE boundary-point array per component
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

    def run_std(bump):
        by_d, bx_d, bz_d, d2_d, rl_d, re_d = dev
        w_out, h_out = integrate_rays(
            wet, hydro, ys, xs, zs,
            by_d + bump, bx_d + bump, bz_d + bump, d2_d, rl_d, re_d,
            per_level_max,
            packed2d=packed2d, mode=mode,
            heights=heights, hstep_max=hstep_max,
            static_plan=True,
        )
        return float(jnp.nansum(w_out) + jnp.nansum(h_out))

    _ = run_std(jnp.float32(0.0))
    t_std = []
    for k in range(1, 4):
        t0 = time.perf_counter()
        _ = run_std(jnp.float32(k) * 1e-7)
        t_std.append(time.perf_counter() - t0)
    t_std = min(t_std)
    _PARTIAL['detail']['std_kernel_s'] = round(t_std, 4)

    # free the kernel-section device arrays (brick table ~4 GB + endpoint
    # batches ~2 GB) before the e2e section allocates its own
    import gc

    del dev, packed2d
    gc.collect()

    # ------------- big-cube regime: full-CONUS HRRR (~95M cells) kernel
    # The 50x1059x1799 grid is the reference's largest real scene class
    # (HRRR CONUS, models/hrrr.py): its f32 PACK16 table (6.1 GB) exceeds
    # _PACK16_BYTE_LIMIT and its brick table (49 GB) exceeds the brick
    # budget, so before round 4 it silently fell to PACK4 (4 gathers per
    # sample). The quantized int16 PACK16 mode (pack16_i16, 3.05 GB table)
    # keeps 1 gather per sample at < 0.03 mm quantization impact
    # (tests/test_raytrace_i16.py); this leg records both kernels on the
    # same rays so the win in the regime production scenes actually hit is
    # a measured artifact number (VERDICT r3 item 2).
    t_big_i16 = t_big_pack4 = None   # null off-TPU (keep the JSON valid)
    big_mode = None
    if jax.default_backend() == 'tpu':
        from raider_tpu.delay.raytrace import pack_mode_for

        nz_b, ny_b, nx_b = 50, 1059, 1799
        big_mode = pack_mode_for((nz_b, ny_b, nx_b), np.float32,
                                 grouped=True)
        ys_b = np.linspace(21.0, 53.0, ny_b)
        xs_b = np.linspace(-134.0, -60.0, nx_b)

        @jax.jit
        def make_cube(lo, hi, salt):
            v = jax.random.uniform(jax.random.PRNGKey(salt),
                                   (nz_b, ny_b, nx_b), jnp.float32)
            return lo + (hi - lo) * v

        big_wet = jax.block_until_ready(make_cube(0.1, 100.0, 0))
        big_hydro = jax.block_until_ready(make_cube(50.0, 300.0, 1))

        zen_b = rng.uniform(np.deg2rad(25.0), np.deg2rad(45.0), n_rays)
        azi_b = rng.uniform(0.0, 2.0 * np.pi, n_rays)
        y0_b = rng.uniform(25.0, 49.0, n_rays)
        x0_b = rng.uniform(-124.0, -70.0, n_rays)
        dev_b = jax.block_until_ready(build_rays(
            jnp.asarray(zen_b), jnp.asarray(azi_b), jnp.asarray(y0_b),
            jnp.asarray(x0_b), jnp.asarray(dzv), jnp.asarray(zs)))
        plm_b = (dzv * float((1.0 / np.cos(zen_b)).max())).astype(dtype)

        def time_big(mode_name):
            from raider_tpu.delay.raytrace import pack_cubes as _pc
            packed_b, _ = _pc(big_wet, big_hydro, mode=mode_name)

            def run(bump):
                by_d, bx_d, bz_d, d2_d, rl_d, re_d = dev_b
                w_o, h_o = integrate_rays(
                    big_wet, big_hydro, ys_b, xs_b, zs,
                    by_d + bump, bx_d, bz_d, d2_d, rl_d, re_d,
                    plm_b, packed2d=packed_b, mode=mode_name)
                return float(jnp.nansum(w_o) + jnp.nansum(h_o))

            _ = run(jnp.float32(0.0))
            ts = []
            for k in range(1, 4):
                t0 = time.perf_counter()
                _ = run(jnp.float32(k) * 1e-7)
                ts.append(time.perf_counter() - t0)
            del packed_b
            gc.collect()
            return min(ts)

        t_big_i16 = time_big('pack16_i16')
        _PARTIAL['detail']['bigcube_kernel_i16_s'] = round(t_big_i16, 4)
        t_big_pack4 = time_big('pack4')
        del big_wet, big_hydro, dev_b
        gc.collect()

    # ----------------- END-TO-END production STD (geometry + integrate)
    # the real _build_cube_ray path: GeomSession device geometry (targets
    # derived on device, geo2rdr warm-started across slices, df64 chain
    # Newton, CRS) feeding the fused integration kernel. Synthetic orbit +
    # cube over the orbit footprint; 1M rays/slice, steady state measured
    # as the marginal cost per extra slice (slope between a 2- and 10-slice
    # run). The scene is a realistic SAR acquisition: a near-polar 700 km
    # orbit with the 1M-pixel query box spanning 30.5-46 deg zenith at the
    # targets (a Sentinel-1-IW-like ~260 km swath at 366-626 km ground
    # range from the track) - real missions acquire in this band, and the
    # reference's nParts rule (delay.py:283, global per-level max over the
    # scene) makes every ray's sampling plan pay for the worst ray, so a
    # physically impossible grazing-edge scene would measure plan
    # inflation, not engine throughput.
    import datetime as dt

    from raider_tpu.delay.engine import (WeatherCube, _build_cube_ray,
                                         _stream_quant16)
    from raider_tpu.geodesy.crs import Geographic
    from raider_tpu.geometry.los import Raytracing
    from raider_tpu.geometry.orbit import Orbit
    from raider_tpu.io.ncdf import Dataset, Variable

    stream_mode = 'i16' if _stream_quant16() else 'f32'

    t_ref = dt.datetime(2020, 1, 1, 12, 0, 0)
    tt = np.arange(-600.0, 601.0, 30.0)
    inc = np.deg2rad(90.0)               # polar orbit: ground track = lon 0
    r_orb = 6378137.0 + 700e3
    om = 2.0 * np.pi / 5800.0
    ang = om * tt
    pos_o = np.stack([
        r_orb * np.cos(ang),
        r_orb * np.sin(ang) * np.cos(inc),
        r_orb * np.sin(ang) * np.sin(inc),
    ], -1)
    vel_o = np.gradient(pos_o, 30.0, axis=0)
    orbit = Orbit(times=tt, pos=pos_o, vel=vel_o, ref_time=t_ref)

    # HRRR-sized cube over the swath (same 50-level z grid)
    ys_e = np.linspace(16.0, 24.0, ny)
    xs_e = np.linspace(1.5, 7.5, nx)
    wet_e2e = rng.uniform(0.1, 100.0, (nz, ny, nx))
    hydro_e2e = rng.uniform(50.0, 300.0, (nz, ny, nx))
    los = Raytracing(orbit=orbit, time=t_ref)
    side = int(np.sqrt(n_rays))           # 1000 x 1000 = 1M pixels
    yq = np.linspace(18.5, 21.5, side)    # along-track
    xq = np.linspace(3.5, 6.0, side)      # cross-track swath

    def run_e2e(bump, n_slices):
        # perturb the CUBE VALUES (not the query grid): defeats the remote
        # result cache while keeping the geometry - and with it the
        # cube-global static sampling plan - bit-identical across runs, like
        # repeated production cubes over one AOI. Perturbing the grid
        # instead jitters the plan floats and recompiles the baked
        # integrate inside the timed region.
        coords = {'x': Variable(('x',), xs_e, {}),
                  'y': Variable(('y',), ys_e, {}),
                  'z': Variable(('z',), zs, {})}
        variables = {
            'wet': Variable(('z', 'y', 'x'), wet_e2e + bump, {}),
            'hydro': Variable(('z', 'y', 'x'), hydro_e2e, {}),
            'proj': Variable((), np.int64(0), Geographic().to_cf()),
        }
        wm_e2e = WeatherCube(Dataset(coords=coords, variables=variables,
                                     attrs={}))
        hts_e2e = 100.0 * np.arange(n_slices)
        w, h = _build_cube_ray(wm_e2e, xq, yq, hts_e2e, los, Geographic(),
                               zref=float(zs[-1] - 1.0),
                               compute_dtype=np.float32)
        return float(np.nansum(np.asarray(w)))

    # steady-state per-slice time via the SLOPE between a 2-slice and a
    # 10-slice run: cancels the per-call one-time costs (orbit/target upload,
    # cube packing, compilation) the same way a production cube with many
    # height levels amortizes them. Every call perturbs the cube field so no
    # result is served from the remote result cache.
    _ = run_e2e(0.0, 2)                   # compile + warm caches
    slopes, t_short, t_long = [], [], []
    for k in range(1, 5):
        t0 = time.perf_counter()
        _ = run_e2e(float(k) * 1e-4, 2)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = run_e2e(float(k) * 1e-4 + 5e-5, 10)
        tl = time.perf_counter() - t0
        t_short.append(ts)
        t_long.append(tl)
        # PAIRED slope: remote-tunnel bandwidth drifts over minutes, so a
        # slope taken between the global minima of the two series can mix
        # fast-tunnel short runs with slow-tunnel long runs; pairing each
        # iteration's short/long keeps both legs in the same tunnel regime.
        # The MEDIAN pair is reported: min cherry-picks drift in the lucky
        # direction (measured 0.185 s/slice once - below the 0.35 s compute
        # floor, i.e. pure noise), max double-counts it.
        slopes.append((tl - ts) / 8.0)
    t_std_e2e = max(float(np.median(slopes)), 1e-9)
    _PARTIAL['detail']['std_e2e_s'] = round(t_std_e2e, 4)
    _PARTIAL['value'] = round(t_ztd + t_std_e2e, 4)
    t_setup = max(min(t_short) - 2.0 * t_std_e2e, 0.0)

    # stable per-slice COMPUTE decomposition (no result stream, pure device
    # wall time): warm GeomSession geometry for one 1M-ray slice. Together
    # with std_kernel_s this bounds the tunnel-free compute floor the e2e
    # slope would hit on a local-PCIe host (BASELINE.md measures 0.35
    # s/slice); the e2e slope above additionally rides the ~8-21 MB/s
    # remote tunnel, which drifts minute-to-minute.
    from raider_tpu.geometry.device_geom import GeomSession, df64_backend_ok
    from raider_tpu.geometry.rays import clip_chain

    t_geom = float('nan')
    if df64_backend_ok():
        xx_q, yy_q = np.meshgrid(xq, yq)
        sess = GeomSession(orbit, yy_q, xx_q, Geographic())
        zref_e = float(zs[-1] - 1.0)
        j1 = min(int(np.searchsorted(zs, zref_e, side='left')), zs.size - 1)
        nudge = j1 == zs.size - 1

        def geom_slice(ht):
            # per-height chain exactly like the engine; distinct heights per
            # timed call so the remote result cache cannot serve a repeat
            chain = clip_chain(zs[: j1 + 1], float(ht), zref_e,
                               nudge_top=nudge)
            return sess.slice(float(ht), chain)

        jax.block_until_ready(geom_slice(0.0))             # compile + warm

        def time_geoms(n, off):
            # distinct heights per call defeat the remote result cache;
            # dispatches pipeline, so the 1-vs-4 slope cancels per-batch
            # fixed costs AND per-call dispatch round trips
            t0 = time.perf_counter()
            outs = [geom_slice(100.0 * (off + i)) for i in range(n)]
            jax.block_until_ready(outs)
            return time.perf_counter() - t0

        # 3 in-flight slices bound HBM like the engine's backpressure window
        t_geom = min((time_geoms(3, 1 + 3 * k) - time_geoms(1, 21 + k)) / 2.0
                     for k in range(2))

    total_single_chip = t_ztd + t_std_e2e
    v5e8_estimate = total_single_chip / 8.0
    target = 1.0
    _BENCH_DONE.set()        # disarm the watchdog before the real line
    print(json.dumps({
        'metric': 'ztd_std_e2e_1Mpt_hrrr',
        'value': round(total_single_chip, 4),
        'unit': 's_single_chip',
        'vs_baseline': round(target / v5e8_estimate, 3),
        'detail': {
            # the 8-chip number is an EXTRAPOLATION: per-ray SPMD with no
            # collectives, sharded==unsharded asserted on the 8-device
            # dryrun mesh, but never timed on 8 real chips (1 available)
            'vs_baseline_basis': 'target 1 s vs single-chip/8, linear-scaling extrapolation',
            # ztd_s is device compute + scalar reduction (the production
            # kernels: cumtrapz_from_top + separable MXU interpolation); the
            # STD leg is the full production engine path incl. the result
            # stream. A ZTD product fetch would add one ~8 MB transfer.
            'ztd_s': round(t_ztd, 4),
            # production _getZTD (wx.base) drives the Pallas kernel on TPU;
            # both paths timed on-chip + on-chip max-rel equivalence
            'ztd_pallas_s': round(t_ztd_pallas, 4),
            'ztd_xla_s': round(t_ztd_xla, 4),
            'ztd_pallas_vs_xla_rel': (None if np.isnan(ztd_equiv_rel)
                                      else float(f'{ztd_equiv_rel:.2e}')),
            'ztd_production_path': ztd_production,
            'std_e2e_s': round(t_std_e2e, 4),
            'std_e2e_rays_per_s_chip': round(n_rays / t_std_e2e, 0),
            'std_e2e_setup_s': round(t_setup, 4),
            'std_e2e_paired_slopes_s': [round(s, 4) for s in slopes],
            # tunnel-free compute decomposition: geometry + integrate are
            # the stable per-slice device wall time (the e2e slope adds the
            # drifting remote-tunnel result stream)
            'geom_slice_s': round(t_geom, 4),
            'compute_floor_slice_s': round(t_geom + t_std, 4),
            'std_kernel_s': round(t_std, 4),
            'std_samples_per_ray': int(n_samples),
            'std_gathers_per_ray': int(n_gathers),
            'pack_mode': mode,
            # full-CONUS-HRRR cube (95M cells): the quantized 1-gather
            # PACK16 vs the 4-gather PACK4 floor it replaces, 1M rays
            'bigcube_kernel_i16_s': (
                round(t_big_i16, 4) if t_big_i16 is not None else None),
            'bigcube_kernel_pack4_s': (
                round(t_big_pack4, 4) if t_big_pack4 is not None else None),
            'bigcube_pack_mode': big_mode,
            # 1M-station point query against the integrated ZTD cubes (the
            # GNSS StationFile path, engine.py:193)
            'station_ztd_1M_s': round(t_station, 4),
            'station_points_per_s_chip': round(n_st / t_station, 0),
            # time-to-first-slice of the production raytrace path in a
            # fresh process: cold = empty compile cache, warm = the same
            # on-disk cache in a NEW process (so a fast warm leg proves
            # cross-process serving of the compiled executables)
            'setup_cold_s': setup_cold_s,
            'setup_warm_s': setup_warm_s,
            'setup_cache_served': setup_cache_served,
            # [after cold, after warm]: equal counts = zero warm recompiles
            'setup_cache_files': setup_cache_files,
            'integrate_kernel': integrate_kernel,
            # result-stream wire format for the e2e leg: 'i16' = per-slice
            # affine int16 (half the unoverlapped d2h bytes, error bounded
            # at range/131068 per slice - engine._quant16), the TPU default
            'stream_mode': stream_mode,
            'kernel_rays_per_s_chip': round(n_rays / t_std, 0),
            # measured result-stream bandwidth this run: wet+hydro bytes per
            # slice (8 MB f32 / 4 MB quantized i16) over (e2e slope -
            # compute floor). On a local-PCIe host the denominator
            # ~vanishes and this reads very large / null.
            'tunnel_mbytes_per_s': (
                round(2 * n_rays * (2 if stream_mode == 'i16' else 4)
                      / 1e6 / (t_std_e2e - (t_geom + t_std)), 1)
                if np.isfinite(t_geom) and t_std_e2e > t_geom + t_std + 1e-3
                else None),
        },
    }))


if __name__ == '__main__':
    # Remote-attached TPUs occasionally throw a transient FAILED_PRECONDITION
    # right after another TPU process exits; one clean re-exec recovers.
    import os
    import sys

    try:
        main()
    except Exception as e:  # noqa: BLE001 - top-level retry guard
        if os.environ.get('RAIDER_TPU_BENCH_RETRIED') == '1':
            # out of retries: still emit the partial artifact line (legs
            # that completed before the failure), then re-raise for the log
            _BENCH_DONE.set()
            _PARTIAL['detail']['note'] = f'run failed after retry: {e!r}'
            print(json.dumps(_PARTIAL), flush=True)
            raise
        print(f'bench: transient failure ({e!r}); retrying once in 30 s',
              file=sys.stderr)
        time.sleep(30)
        os.environ['RAIDER_TPU_BENCH_RETRIED'] = '1'
        os.execv(sys.executable, [sys.executable] + sys.argv)
