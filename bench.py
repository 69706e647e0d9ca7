"""Benchmark: 1M-point ZTD + raytraced-STD query on an HRRR-sized cube.

Prints JSON artifact lines {"metric", "value", "unit", "vs_baseline",
"detail"}; the driver parses the LAST line, and EVERY printed line is a
complete valid artifact (VERDICT r4 item 1: round 4's artifact was lost to
an external timeout, so the contract is now incremental last-line-wins).

Architecture (round 5): this file is a thin PARENT ORCHESTRATOR that never
imports jax. Every measurement leg runs as a killable subprocess
(``python bench.py --leg NAME``) with its own deadline, in this order:

  probe     - trivial-op tunnel health check (a dead remote regime is
              detected in minutes, not discovered via the driver timeout)
  headline  - 1M-pt ZTD query + END-TO-END production STD slope (the
              artifact's headline ``value``); fragments stream out after
              the ZTD part and after EVERY e2e pair, so even a mid-leg
              kill leaves a measured headline
  kernel    - integrate-kernel-only + device-geometry slice timings (the
              tunnel-free compute floor), incl. the brick_i16 A/B
  extras    - production _getZTD Pallas-vs-XLA + 1M-station point query
  midcube   - 20.5M-cell capacity band: brick_i16 (auto) vs pack16
  bigcube   - full-CONUS-HRRR 95M-cell kernel: pack16_i16 vs pack4
  setup     - cold/warm start probes (fresh compile-cache dir), LAST:
              they are the most expensive and least essential legs

Children stream detail fragments as '@@BENCH {json}' stdout lines; the
parent merges each fragment and immediately reprints the full artifact.
The first artifact line lands before any TPU contact. The remote TPU
attachment is EXCLUSIVE (a second process's ops hang while the first holds
the chip), so the parent runs exactly one child at a time and kills it
dead before starting the next.

Budget: RAIDER_TPU_BENCH_DEADLINE_S (default 2250 s, well under the
driver's external timeout that killed round 4's run; 0 disables). Legs are
skipped, honestly recorded in detail.legs_skipped, when the remaining
budget cannot fit them.

The STD leg is END-TO-END: the production ``_build_cube_ray`` engine path
including on-device ray geometry (geo2rdr + level-chain Newton + CRS via
GeomSession) plus the fused integration kernel - not just the integrate
kernel on pre-built rays (the kernel-only time is a detail field).

The reference publishes no throughput numbers (README Citation is TODO;
see BASELINE.md), so vs_baseline is measured against the driver-defined
target (BASELINE.json): a 1M-point ZTD+STD query in <= 1 s on v5e-8. We
measure a single chip; the ray batch is embarrassingly parallel across
chips (see raider_tpu.parallel), so the per-chip time divided by 8
approximates the v5e-8 time. vs_baseline = target_time / (measured / 8) -
a linear-scaling extrapolation, labeled as such in the artifact.

Timing notes for remote-attached TPUs: repeated identical executions can
be served from a result cache, so every iteration perturbs an input, and a
scalar output is fetched to force materialization.

Test hooks: RAIDER_TPU_BENCH_SMOKE=1 shrinks every scene ~50x (CI-sized);
RAIDER_TPU_BENCH_CPU=1 pins children to the CPU backend through the config
API (the axon plugin ignores JAX_PLATFORMS); RAIDER_TPU_BENCH_LEGS limits
which legs run (comma-separated).
"""

import json
import os
import subprocess
import sys
import threading
import time

FRAG = '@@BENCH '


def emit(frag: dict) -> None:
    """Child-side: stream a detail fragment to the parent."""
    print(FRAG + json.dumps(frag), flush=True)


def _smoke() -> bool:
    return os.environ.get('RAIDER_TPU_BENCH_SMOKE', '') == '1'


def _scene() -> dict:
    """Shared scene dimensions (HRRR-like CONUS crop, 3 km grid)."""
    if _smoke():
        return dict(nz=24, ny=64, nx=64, n_rays=22_500, qz=4, qy=48, qx=48,
                    n_st=50_000, pairs=2)
    return dict(nz=50, ny=400, nx=400, n_rays=1_000_000, qz=10, qy=320,
                qx=320, n_st=1_000_000, pairs=4)


def _pin_backend():
    """Import jax, honoring the CPU pin for tests (the axon TPU plugin pins
    jax_platforms='axon,cpu' via the config API, so the env var alone is
    ignored - conftest.py note)."""
    import jax

    if os.environ.get('RAIDER_TPU_BENCH_CPU', '') == '1':
        jax.config.update('jax_platforms', 'cpu')
    return jax


def _grid(scene):
    import numpy as np

    nz, ny, nx = scene['nz'], scene['ny'], scene['nx']
    zs = -500.0 + 26500.0 * np.linspace(0.0, 1.0, nz) ** 1.4
    ys = np.linspace(30.0, 40.0, ny)
    xs = np.linspace(-125.0, -115.0, nx)
    return zs, ys, xs


def _make_build_rays(jnp, dtype, deg_per_m):
    """jitted (L, N) ray-batch builder from 4 small per-ray arrays: uploading
    ~1.6 GB of precomputed endpoints through the remote tunnel dominated
    wall time, while 4x8 MB is instant."""
    import jax

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

    return build_rays


# --------------------------------------------------------------- leg: probe
def leg_probe() -> None:
    """Tunnel health: a trivial op's round trip. In a healthy regime this is
    seconds; observed 108-150 s+ in degraded regimes and minutes+ when dead
    (the parent's cap turns a dead tunnel into a recorded fact instead of a
    driver timeout)."""
    t0 = time.perf_counter()
    jax = _pin_backend()
    import jax.numpy as jnp

    t1 = time.perf_counter()
    float(jnp.sum(jnp.ones(128)))
    t2 = time.perf_counter()
    emit({'backend': jax.default_backend(),
          'tunnel_probe_s': round(t2 - t1, 1),
          'tunnel_import_s': round(t1 - t0, 1)})
    # second distinct op: steady-state dispatch (first pays backend init)
    t3 = time.perf_counter()
    float(jnp.sum(jnp.ones(256)))
    emit({'tunnel_probe_op2_s': round(time.perf_counter() - t3, 2)})


# ------------------------------------------------------------ leg: headline
def leg_headline() -> None:
    """ZTD 1M-pt query + the END-TO-END production STD slope (the headline
    value = ztd_s + std_e2e_s). Runs FIRST among measurement legs and
    streams a fragment after the ZTD part and after every e2e pair."""
    import numpy as np

    jax = _pin_backend()
    import jax.numpy as jnp

    import raider_tpu  # noqa: F401  (enables x64; kernels pick f32 explicitly)
    from raider_tpu.ops.integrate import cumtrapz_from_top
    from raider_tpu.ops.interp import grid_weights, interp3d_separable

    sc = _scene()
    rng = np.random.default_rng(0)
    dtype = np.float32
    nz, ny, nx = sc['nz'], sc['ny'], sc['nx']
    n_rays = sc['n_rays']
    zs, ys, xs = _grid(sc)
    wet = rng.uniform(0.1, 100.0, (nz, ny, nx)).astype(dtype)
    hydro = rng.uniform(50.0, 300.0, (nz, ny, nx)).astype(dtype)

    # ------------------------------------------------------------ ZTD query
    qz, qy, qx = sc['qz'], sc['qy'], sc['qx']
    w_z = grid_weights(zs, np.linspace(0, 9000, qz)).astype(dtype)
    w_y = grid_weights(ys, np.linspace(31, 39, qy)).astype(dtype)
    w_x = grid_weights(xs, np.linspace(-124, -116, qx)).astype(dtype)

    @jax.jit
    def ztd_query(wet, hydro, zs, w_z, w_y, w_x, bump):
        wet_total = jnp.moveaxis(
            cumtrapz_from_top(jnp.moveaxis(wet + bump, 0, -1), zs), -1, 0)
        hydro_total = jnp.moveaxis(
            cumtrapz_from_top(jnp.moveaxis(hydro, 0, -1), zs), -1, 0)
        a = interp3d_separable(wet_total, w_z, w_y, w_x)
        b = interp3d_separable(hydro_total, w_z, w_y, w_x)
        return a.sum() + b.sum()

    args = [jnp.asarray(a)
            for a in (wet, hydro, zs.astype(dtype), w_z, w_y, w_x)]
    _ = float(ztd_query(*args, 0.0))
    t_ztd = []
    for k in range(1, 4):
        t0 = time.perf_counter()
        _ = float(ztd_query(*args, float(k) * 1e-6))
        t_ztd.append(time.perf_counter() - t0)
    t_ztd = min(t_ztd)
    emit({'ztd_s': round(t_ztd, 4)})
    del args

    # ------------------ END-TO-END production STD (geometry + integrate)
    # the real _build_cube_ray path: GeomSession device geometry (targets
    # derived on device, geo2rdr warm-started across slices, df64 chain
    # Newton, CRS) feeding the fused integration kernel. Synthetic orbit +
    # cube over the orbit footprint; steady state measured as the marginal
    # cost per extra slice (slope between a 2- and 10-slice run). The scene
    # is a realistic SAR acquisition: a near-polar 700 km orbit with the
    # query box spanning 30.5-46 deg zenith at the targets (a
    # Sentinel-1-IW-like ~260 km swath at 366-626 km ground range from the
    # track) - real missions acquire in this band, and the reference's
    # nParts rule (delay.py:283, global per-level max over the scene) makes
    # every ray's sampling plan pay for the worst ray, so a physically
    # impossible grazing-edge scene would measure plan inflation, not
    # engine throughput.
    import datetime as dt

    from raider_tpu.delay.engine import (WeatherCube, _build_cube_ray,
                                         _stream_quant16)
    from raider_tpu.geodesy.crs import Geographic
    from raider_tpu.geometry.los import Raytracing
    from raider_tpu.geometry.orbit import Orbit
    from raider_tpu.io.ncdf import Dataset, Variable

    stream_mode = 'i16' if _stream_quant16() else 'f32'
    emit({'stream_mode': stream_mode,
          # wet+hydro result-stream payload per slice (parent derives the
          # tunnel bandwidth estimate from this + the compute floor)
          'stream_mb_per_slice': round(
              2 * n_rays * (2 if stream_mode == 'i16' else 4) / 1e6, 3)})

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
    # 10-slice run: cancels the per-call one-time costs (orbit/target
    # upload, cube packing, compilation) the same way a production cube
    # with many height levels amortizes them. Every call perturbs the cube
    # field so no result is served from the remote result cache.
    t0 = time.perf_counter()
    _ = run_e2e(0.0, 2)                   # compile + warm caches
    emit({'std_e2e_warmup_s': round(time.perf_counter() - t0, 1)})
    slopes, t_short = [], []
    for k in range(1, sc['pairs'] + 1):
        t0 = time.perf_counter()
        _ = run_e2e(float(k) * 1e-4, 2)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = run_e2e(float(k) * 1e-4 + 5e-5, 10)
        tl = time.perf_counter() - t0
        t_short.append(ts)
        # PAIRED slope: remote-tunnel bandwidth drifts over minutes, so a
        # slope taken between the global minima of the two series can mix
        # fast-tunnel short runs with slow-tunnel long runs; pairing each
        # iteration's short/long keeps both legs in the same tunnel regime.
        # The MEDIAN pair is reported: min cherry-picks drift in the lucky
        # direction (measured 0.185 s/slice once - below the 0.35 s compute
        # floor, i.e. pure noise), max double-counts it.
        slopes.append((tl - ts) / 8.0)
        t_std_e2e = max(float(np.median(slopes)), 1e-9)
        # stream the running median after EVERY pair: a mid-leg kill (dead
        # regime, budget) still leaves a measured headline
        emit({'std_e2e_s': round(t_std_e2e, 4),
              'std_e2e_rays_per_s_chip': round(n_rays / t_std_e2e, 0),
              'std_e2e_paired_slopes_s': [round(s, 4) for s in slopes],
              'std_e2e_setup_s': round(
                  max(min(t_short) - 2.0 * t_std_e2e, 0.0), 4)})


# -------------------------------------------------------------- leg: kernel
def leg_kernel() -> None:
    """Tunnel-free per-slice compute decomposition: the integrate kernel on
    pre-built rays + the warm GeomSession slice geometry. Together these
    bound the compute floor a local-PCIe host would hit. Also the brick_i16
    A/B (VERDICT r4 item 2): the quantized int16 brick table on the exact
    production kernel and rays."""
    import numpy as np

    jax = _pin_backend()
    import jax.numpy as jnp

    import raider_tpu  # noqa: F401
    from raider_tpu.delay.raytrace import (build_sampling_plan,
                                           integrate_rays, pack_cubes,
                                           pallas_integrate_mode)

    sc = _scene()
    rng = np.random.default_rng(0)
    dtype = np.float32
    nz, ny, nx = sc['nz'], sc['ny'], sc['nx']
    n_rays = sc['n_rays']
    zs, ys, xs = _grid(sc)
    wet = rng.uniform(0.1, 100.0, (nz, ny, nx)).astype(dtype)
    hydro = rng.uniform(50.0, 300.0, (nz, ny, nx)).astype(dtype)

    # contiguous slant rays (random start, azimuth, 25-45 deg zenith): the
    # brick kernel's grouping guarantees rely on level-to-level continuity,
    # exactly like the segments build_ray produces
    zen = rng.uniform(np.deg2rad(25.0), np.deg2rad(45.0), n_rays)
    azi = rng.uniform(0.0, 2.0 * np.pi, n_rays)
    y0 = rng.uniform(32.0, 38.0, n_rays)
    x0 = rng.uniform(-123.0, -117.0, n_rays)
    dzv = zs[1:] - zs[:-1]
    deg_per_m = 1.0 / 111000.0
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
    integrate_kernel = ('pallas' if pallas_integrate_mode(ys, xs) == 'tpu'
                        else 'xla')
    emit({'std_samples_per_ray': int(n_samples),
          'std_gathers_per_ray': int(n_gathers),
          'pack_mode': mode, 'integrate_kernel': integrate_kernel})

    build_rays = _make_build_rays(jnp, dtype, deg_per_m)
    dev = jax.block_until_ready(build_rays(
        jnp.asarray(zen), jnp.asarray(azi), jnp.asarray(y0),
        jnp.asarray(x0), jnp.asarray(dzv), jnp.asarray(zs)))

    def run_arrays(packed, mode_name, bump):
        by_d, bx_d, bz_d, d2_d, rl_d, re_d = dev
        return integrate_rays(
            wet, hydro, ys, xs, zs,
            by_d + bump, bx_d + bump, bz_d + bump, d2_d, rl_d, re_d,
            per_level_max,
            packed2d=packed, mode=mode_name,
            heights=heights, hstep_max=hstep_max,
            static_plan=True,
        )

    def time_mode(packed, mode_name):
        def run(bump):
            w_out, h_out = run_arrays(packed, mode_name, bump)
            return float(jnp.nansum(w_out) + jnp.nansum(h_out))

        _ = run(jnp.float32(0.0))
        ts = []
        for k in range(1, 4):
            t0 = time.perf_counter()
            _ = run(jnp.float32(k) * 1e-7)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_std = time_mode(packed2d, mode)
    emit({'std_kernel_s': round(t_std, 4),
          'kernel_rays_per_s_chip': round(n_rays / t_std, 0)})

    # brick_i16 A/B (VERDICT r4 item 2): same rays, same plan, quantized
    # int16 brick table - predicted ~2x cut of the kernel's brick-read HBM
    # bytes. Recorded either way so the default decision is artifact-backed.
    import gc

    if mode == 'brick':
        try:
            packed_i16, _ = pack_cubes(wet, hydro, mode='brick_i16')
            # quantization impact: on-device max |Δdelay| vs the f32 brick
            # kernel on the same rays (one scalar rides the tunnel)
            w0, h0 = run_arrays(packed2d, mode, jnp.float32(0.0))
            w1, h1 = run_arrays(packed_i16, 'brick_i16', jnp.float32(0.0))
            dev_mm = 1000.0 * float(jnp.maximum(
                jnp.nanmax(jnp.abs(w1 - w0)), jnp.nanmax(jnp.abs(h1 - h0))))
            del w0, h0, w1, h1
            t_i16 = time_mode(packed_i16, 'brick_i16')
            emit({'std_kernel_i16_s': round(t_i16, 4),
                  'std_kernel_i16_max_dev_mm': float(f'{dev_mm:.2e}')})
            del packed_i16
            gc.collect()
        except Exception as e:  # noqa: BLE001 - A/B leg is optional
            emit({'std_kernel_i16_error': repr(e)})
    # free the table unconditionally (a forced-i16 run takes the non-brick
    # branch) before the geometry section allocates its 1M-ray state
    del packed2d, dev
    gc.collect()

    # stable per-slice COMPUTE decomposition (no result stream, pure device
    # wall time): warm GeomSession geometry for one 1M-ray slice (the e2e
    # slope additionally rides the drifting remote-tunnel result stream).
    import datetime as dt

    from raider_tpu.geodesy.crs import Geographic
    from raider_tpu.geometry.device_geom import GeomSession, df64_backend_ok
    from raider_tpu.geometry.orbit import Orbit
    from raider_tpu.geometry.rays import clip_chain

    if not df64_backend_ok():
        return
    t_ref = dt.datetime(2020, 1, 1, 12, 0, 0)
    tt = np.arange(-600.0, 601.0, 30.0)
    r_orb = 6378137.0 + 700e3
    ang = 2.0 * np.pi / 5800.0 * tt
    pos_o = np.stack([r_orb * np.cos(ang), np.zeros_like(ang),
                      r_orb * np.sin(ang)], -1)
    vel_o = np.gradient(pos_o, 30.0, axis=0)
    orbit = Orbit(times=tt, pos=pos_o, vel=vel_o, ref_time=t_ref)

    side = int(np.sqrt(n_rays))
    yq = np.linspace(18.5, 21.5, side)
    xq = np.linspace(3.5, 6.0, side)
    xx_q, yy_q = np.meshgrid(xq, yq)
    sess = GeomSession(orbit, yy_q, xx_q, Geographic())
    zref_e = float(zs[-1] - 1.0)
    j1 = min(int(np.searchsorted(zs, zref_e, side='left')), zs.size - 1)
    nudge = j1 == zs.size - 1

    def geom_slice(ht):
        # per-height chain exactly like the engine; distinct heights per
        # timed call so the remote result cache cannot serve a repeat
        chain = clip_chain(zs[: j1 + 1], float(ht), zref_e, nudge_top=nudge)
        return sess.slice(float(ht), chain)

    jax.block_until_ready(geom_slice(0.0))             # compile + warm

    def time_geoms(n, off):
        # distinct heights per call defeat the remote result cache;
        # dispatches pipeline, so the 1-vs-3 slope cancels per-batch
        # fixed costs AND per-call dispatch round trips
        t0 = time.perf_counter()
        outs = [geom_slice(100.0 * (off + i)) for i in range(n)]
        jax.block_until_ready(outs)
        return time.perf_counter() - t0

    # 3 in-flight slices bound HBM like the engine's backpressure window
    t_geom = min((time_geoms(3, 1 + 3 * k) - time_geoms(1, 21 + k)) / 2.0
                 for k in range(2))
    emit({'geom_slice_s': round(t_geom, 4)})


# -------------------------------------------------------------- leg: extras
def leg_extras() -> None:
    """Production _getZTD path (Pallas kernel vs the XLA composition it
    replaces, equivalence asserted on-chip) + the 1M-station ZTD point
    query (the GNSS StationFile path, the exact interp3d_points call
    tropo_delay makes - engine.py:193)."""
    import numpy as np

    jax = _pin_backend()
    import jax.numpy as jnp

    import raider_tpu  # noqa: F401
    from raider_tpu.ops.integrate import cumtrapz_from_top
    from raider_tpu.ops.interp import interp3d_points

    sc = _scene()
    rng = np.random.default_rng(0)
    dtype = np.float32
    nz, ny, nx = sc['nz'], sc['ny'], sc['nx']
    zs, ys, xs = _grid(sc)
    wet = rng.uniform(0.1, 100.0, (nz, ny, nx)).astype(dtype)
    hydro = rng.uniform(50.0, 300.0, (nz, ny, nx)).astype(dtype)

    # ------------- production _getZTD: Pallas kernel vs XLA (TPU only)
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

    emit({'ztd_production_path':
          'pallas' if jax.default_backend() == 'tpu' else 'xla'})
    if jax.default_backend() == 'tpu':
        from raider_tpu.ops.pallas_ztd import ztd_totals

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
        emit({'ztd_pallas_vs_xla_rel': float(f'{ztd_equiv_rel:.2e}')})

        def time_path(fn):
            _ = float(jnp.nansum(fn(*targs, 0.0)[0]))
            ts = []
            for k in range(1, 4):
                t0 = time.perf_counter()
                _ = float(jnp.nansum(fn(*targs, float(k) * 1e-4)[0]))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        emit({'ztd_pallas_s': round(time_path(pallas_path), 4),
              'ztd_xla_s': round(time_path(ztd_xla_path), 4)})

    # ------------------- station-batch ZTD point query (the GNSS path)
    # reference delay.py:98-129: point-type AOIs (StationFile) sample the
    # delay cube at scattered station (lat, lon, hgt) points - the
    # highest-traffic workflow after cubes.
    @jax.jit
    def integrate_cubes(wet, hydro, zs_j):
        wet_t = jnp.moveaxis(
            cumtrapz_from_top(jnp.moveaxis(wet, 0, -1), zs_j), -1, 0)
        hyd_t = jnp.moveaxis(
            cumtrapz_from_top(jnp.moveaxis(hydro, 0, -1), zs_j), -1, 0)
        return wet_t, hyd_t

    n_st = sc['n_st']
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
    emit({'station_ztd_1M_s': round(t_station, 4),
          'station_points_per_s_chip': round(n_st / t_station, 0)})


# ------------------------------------------------------------- leg: bigcube
def leg_bigcube() -> None:
    """Full-CONUS HRRR (~95M cells) kernel regime (TPU only). The
    50x1059x1799 grid is the reference's largest real scene class (HRRR
    CONUS, models/hrrr.py): its f32 PACK16 table (6.1 GB) exceeds
    _PACK16_BYTE_LIMIT and its brick table (49 GB) exceeds the brick
    budget, so before round 4 it silently fell to PACK4 (4 gathers per
    sample). The quantized int16 PACK16 mode (pack16_i16, 3.05 GB table)
    keeps 1 gather per sample at < 0.03 mm quantization impact
    (tests/test_raytrace_i16.py); this leg records both kernels on the
    same rays."""
    import gc

    import numpy as np

    jax = _pin_backend()
    import jax.numpy as jnp

    import raider_tpu  # noqa: F401
    from raider_tpu.delay.raytrace import (build_sampling_plan,
                                           integrate_rays, pack_cubes,
                                           pack_mode_for)

    if jax.default_backend() != 'tpu':
        emit({'bigcube_pack_mode': None})
        return
    sc = _scene()
    rng = np.random.default_rng(0)
    dtype = np.float32
    n_rays = sc['n_rays']
    zs, _, _ = _grid(sc)
    dzv = zs[1:] - zs[:-1]
    deg_per_m = 1.0 / 111000.0

    nz_b, ny_b, nx_b = sc['nz'], 1059, 1799
    if _smoke():
        ny_b, nx_b = 160, 200
    big_mode = pack_mode_for((nz_b, ny_b, nx_b), np.float32, grouped=True)
    emit({'bigcube_pack_mode': big_mode})
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
    build_rays = _make_build_rays(jnp, dtype, deg_per_m)
    dev_b = jax.block_until_ready(build_rays(
        jnp.asarray(zen_b), jnp.asarray(azi_b), jnp.asarray(y0_b),
        jnp.asarray(x0_b), jnp.asarray(dzv), jnp.asarray(zs)))
    plm_b = (dzv * float((1.0 / np.cos(zen_b)).max())).astype(dtype)
    _ = build_sampling_plan(plm_b)

    def time_big(mode_name):
        packed_b, _ = pack_cubes(big_wet, big_hydro, mode=mode_name)

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

    emit({'bigcube_kernel_i16_s': round(time_big('pack16_i16'), 4)})
    emit({'bigcube_kernel_pack4_s': round(time_big('pack4'), 4)})


# ------------------------------------------------------------- leg: midcube
def leg_midcube() -> None:
    """Capacity-band cube (TPU only): 50x640x640 = 20.5M cells, where the
    f32 brick table (10.5 GB) is over budget but the quantized int16 one
    (5.2 GB) fits. Round 5 promoted brick_i16 to the auto mode here; this
    leg records it against the pack16 ladder it replaced on the same rays
    (measured 6.4x in the promotion run; the artifact keeps it honest)."""
    import gc

    import numpy as np

    jax = _pin_backend()
    import jax.numpy as jnp

    import raider_tpu  # noqa: F401
    from raider_tpu.delay.raytrace import (integrate_rays, pack_cubes,
                                           pack_mode_for)

    if jax.default_backend() != 'tpu':
        emit({'midcube_auto_mode': None})
        return
    sc = _scene()
    rng = np.random.default_rng(0)
    n_rays = sc['n_rays']
    zs, _, _ = _grid(sc)
    dzv = zs[1:] - zs[:-1]
    deg_per_m = 1.0 / 111000.0

    nz_m, ny_m, nx_m = sc['nz'], 640, 640
    if _smoke():
        ny_m, nx_m = 96, 96
    emit({'midcube_auto_mode': pack_mode_for((nz_m, ny_m, nx_m),
                                             np.float32, grouped=True)})
    ys_m = np.linspace(28.0, 42.0, ny_m)
    xs_m = np.linspace(-127.0, -113.0, nx_m)
    wet = np.asarray(rng.uniform(0.1, 100.0, (nz_m, ny_m, nx_m)),
                     np.float32)
    hydro = np.asarray(rng.uniform(50.0, 300.0, (nz_m, ny_m, nx_m)),
                       np.float32)
    zen = rng.uniform(np.deg2rad(25.0), np.deg2rad(45.0), n_rays)
    azi = rng.uniform(0.0, 2.0 * np.pi, n_rays)
    y0 = rng.uniform(30.0, 40.0, n_rays)
    x0 = rng.uniform(-125.0, -115.0, n_rays)
    plm = (dzv * float((1.0 / np.cos(zen)).max())).astype(np.float32)
    hstep = dzv * float(np.tan(zen).max()) * deg_per_m
    build_rays = _make_build_rays(jnp, np.float32, deg_per_m)
    dev_m = jax.block_until_ready(build_rays(
        jnp.asarray(zen), jnp.asarray(azi), jnp.asarray(y0),
        jnp.asarray(x0), jnp.asarray(dzv), jnp.asarray(zs)))

    def time_mode(mode_name):
        packed, _ = pack_cubes(wet, hydro, mode=mode_name)

        def run(bump):
            by_d, bx_d, bz_d, d2_d, rl_d, re_d = dev_m
            w_o, h_o = integrate_rays(
                wet, hydro, ys_m, xs_m, zs,
                by_d + bump, bx_d, bz_d, d2_d, rl_d, re_d,
                plm, packed2d=packed, mode=mode_name,
                heights=zs.copy(), hstep_max=hstep, static_plan=True)
            return float(jnp.nansum(w_o) + jnp.nansum(h_o))

        _ = run(jnp.float32(0.0))
        ts = []
        for k in range(1, 4):
            t0 = time.perf_counter()
            _ = run(jnp.float32(k) * 1e-7)
            ts.append(time.perf_counter() - t0)
        del packed
        gc.collect()
        return min(ts)

    emit({'midcube_kernel_bricki16_s': round(time_mode('brick_i16'), 4)})
    emit({'midcube_kernel_pack16_s': round(time_mode('pack16'), 4)})


_LEGS = {'probe': leg_probe, 'headline': leg_headline, 'kernel': leg_kernel,
         'extras': leg_extras, 'midcube': leg_midcube,
         'bigcube': leg_bigcube}


# ============================================================ parent side
class _Artifact:
    """The incrementally-reprinted artifact. Every print is a COMPLETE
    valid line; the driver keeps the last one."""

    def __init__(self):
        self.detail = {'partial': True,
                       'vs_baseline_basis': ('target 1 s vs single-chip/8, '
                                             'linear-scaling extrapolation'),
                       'legs_done': [], 'legs_skipped': []}

    def merge(self, frag: dict) -> None:
        self.detail.update(frag)

    def _derived(self) -> dict:
        d = dict(self.detail)
        value = vs = None
        if d.get('ztd_s') is not None and d.get('std_e2e_s') is not None:
            value = round(d['ztd_s'] + d['std_e2e_s'], 4)
            vs = round(1.0 / (value / 8.0), 3)
            d['partial'] = False
        if (d.get('geom_slice_s') is not None
                and d.get('std_kernel_s') is not None):
            d['compute_floor_slice_s'] = round(
                d['geom_slice_s'] + d['std_kernel_s'], 4)
            # measured result-stream bandwidth this run: stream bytes per
            # slice over (e2e slope - compute floor). On a local-PCIe host
            # the denominator ~vanishes and this reads null.
            mb = d.get('stream_mb_per_slice')
            e2e = d.get('std_e2e_s')
            if (mb is not None and e2e is not None
                    and e2e > d['compute_floor_slice_s'] + 1e-3):
                d['tunnel_mbytes_per_s'] = round(
                    mb / (e2e - d['compute_floor_slice_s']), 1)
        return {'metric': 'ztd_std_e2e_1Mpt_hrrr', 'value': value,
                'unit': 's_single_chip', 'vs_baseline': vs, 'detail': d}

    def print(self) -> None:
        print(json.dumps(self._derived()), flush=True)


def _run_child(argv, cap_s, art: _Artifact, env=None):
    """Run one measurement child with a hard deadline, merging '@@BENCH'
    fragments into the artifact AS THEY ARRIVE (a killed child keeps every
    fragment it managed to emit). Returns (status, last_stdout_line)."""
    p = subprocess.Popen(argv, stdout=subprocess.PIPE, stderr=sys.stderr,
                         text=True, env=env)
    timed_out = []

    def _kill():
        timed_out.append(1)
        try:
            p.kill()
        except OSError:
            pass

    timer = threading.Timer(cap_s, _kill)
    timer.daemon = True
    timer.start()
    last = ''
    try:
        for line in p.stdout:
            line = line.strip()
            if line.startswith(FRAG):
                if art is None:     # fragment sink (setup probes)
                    continue
                try:
                    art.merge(json.loads(line[len(FRAG):]))
                except ValueError:
                    continue
                art.print()
            elif line:
                last = line
        p.wait()
    finally:
        timer.cancel()
        if p.poll() is None:
            _kill()
            p.wait()
    if timed_out and p.returncode != 0:
        # the killed child held the EXCLUSIVE TPU attachment; give the
        # tunnel a beat to release it before the next child attaches
        time.sleep(3.0)
        return 'timeout', last
    return ('ok' if p.returncode == 0 else f'rc={p.returncode}'), last


def _run_setup(art: _Artifact, remaining_s: float) -> str:
    """Cold/warm start probes (VERDICT r3 item 4 / r4 item 3), LAST: one
    fresh compile-cache dir; the cold leg populates it, the warm leg is a
    NEW process that can only be fast if the on-disk cache actually serves
    the compiled executables (incl. the static-plan integrate) across
    processes."""
    import tempfile

    probe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         'scripts', 'setup_probe.py')
    t0 = time.monotonic()
    legs = [None, None]
    with tempfile.TemporaryDirectory(prefix='raider_xla_cold') as td:
        env = dict(os.environ, RAIDER_TPU_COMPILE_CACHE=td)
        for i, (leg_name, cap) in enumerate(
                (('cold', min(950.0, remaining_s - 120.0)), ('warm', 500.0))):
            if i == 1 and legs[0] is None:
                break    # a dead/partial cold leg poisons the warm criterion
            cap = min(cap, remaining_s - (time.monotonic() - t0))
            if cap < 60:
                break
            # setup_probe prints ONE plain JSON line (no fragment marker);
            # art=None sinks any stray fragments instead of reprinting
            status, last = _run_child([sys.executable, probe], cap,
                                      None, env=env)
            rec = None
            if status == 'ok' and last:
                try:
                    rec = json.loads(last)
                except ValueError:
                    rec = None
            legs[i] = rec
            art.merge({f'setup_{leg_name}_s':
                       None if rec is None else rec['t_first_slice_s']})
            art.print()
    if legs[0] and legs[1]:
        # "served" = the cold leg populated the cache AND the warm process
        # compiled NOTHING new (zero added cache files). Wall-time ratios
        # are NOT the criterion: the tunnel drifts 3-100 MB/s between legs
        # minutes apart (observed 307.6 s warm vs 157.9 s cold; the
        # 2026-08-19 pair measured 526.6 -> 114.6 s with zero recompiles,
        # BASELINE.md "Cold vs warm start").
        art.merge({
            'setup_cache_served': bool(
                legs[0]['cache_files_after'] > 0
                and legs[1]['cache_files_after']
                <= legs[0]['cache_files_after']),
            'setup_cache_files': [legs[0]['cache_files_after'],
                                  legs[1]['cache_files_after']]})
        art.print()
    return 'ok' if legs[0] or legs[1] else 'skipped'


def orchestrate() -> None:
    t_start = time.monotonic()
    try:
        budget = float(os.environ.get('RAIDER_TPU_BENCH_DEADLINE_S', '2250'))
    except ValueError:
        budget = 2250.0
    if budget <= 0:
        budget = 10_000_000.0
    art = _Artifact()
    art.print()                     # a parseable line lands IMMEDIATELY

    done = threading.Event()

    def _backstop():
        # last-resort watchdog: if the parent itself wedges (it should
        # never - it only reads pipes), emit the current artifact late
        # rather than never. Re-check the event right before printing so a
        # completed run is never followed by a stale partial line
        # (ADVICE r4 item 2).
        if not done.wait(budget + 90.0):
            if done.is_set():
                return
            art.merge({'watchdog_timeout': True})
            art.print()
            os._exit(0)

    threading.Thread(target=_backstop, daemon=True).start()

    want = os.environ.get('RAIDER_TPU_BENCH_LEGS', '')
    want = {w.strip() for w in want.split(',') if w.strip()} or None
    # per-leg cap overrides ("headline=120,setup=900"), mainly for tests
    cap_over = {}
    for item in os.environ.get('RAIDER_TPU_BENCH_CAPS', '').split(','):
        if '=' in item:
            k, _, v = item.partition('=')
            try:
                cap_over[k.strip()] = float(v)
            except ValueError:
                pass
    self_path = os.path.abspath(__file__)
    reserve = 45.0
    # (name, cap, min_remaining_to_start)
    plan = [('probe', 270.0, 60.0),
            ('headline', 1500.0, 120.0),
            ('kernel', 650.0, 150.0),
            ('extras', 420.0, 120.0),
            ('midcube', 500.0, 180.0),
            ('bigcube', 700.0, 200.0),
            ('setup', 1450.0, 400.0)]
    status = {}
    for name, cap, need in plan:
        if want is not None and name not in want:
            continue
        cap = cap_over.get(name, cap)
        remaining = budget - (time.monotonic() - t_start) - reserve
        if remaining < need:
            art.detail['legs_skipped'].append(name)
            status[name] = 'skipped:budget'
            art.print()
            continue
        cap = min(cap, remaining)
        if name == 'setup':
            st = _run_setup(art, cap)
        else:
            st, _ = _run_child(
                [sys.executable, self_path, '--leg', name], cap, art)
            if (name == 'headline' and st != 'ok'
                    and art.detail.get('std_e2e_s') is None):
                # one retry: remote attachments occasionally throw a
                # transient FAILED_PRECONDITION right after another TPU
                # process exits
                remaining = budget - (time.monotonic() - t_start) - reserve
                if remaining > 300:
                    time.sleep(20.0)
                    st, _ = _run_child(
                        [sys.executable, self_path, '--leg', name],
                        min(cap, remaining), art)
        status[name] = st
        art.detail['legs_done'].append(f'{name}:{st}')
        if name == 'probe' and st != 'ok':
            # a trivial op could not round-trip inside the cap: record the
            # dead regime explicitly (the headline still gets its try -
            # regimes recover on minute scales - but a null value now has
            # its cause in the artifact)
            art.merge({'tunnel_dead_regime': True})
        art.print()
    art.merge({'leg_status': status,
               'bench_wall_s': round(time.monotonic() - t_start, 1)})
    done.set()                       # disarm the backstop BEFORE composing
    art.print()


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == '--leg':
        _LEGS[sys.argv[2]]()
        return
    orchestrate()


if __name__ == '__main__':
    main()
