"""Measure how result fetches interact with the slice pipeline.

Replicates the engine's steady-state slice loop (GeomSession geometry +
static-plan brick integrate, 1M rays, cube-global plan) and times an
N-slice loop under four fetch strategies:

  none    no result transfer at all (compute floor)
  async   copy_to_host_async per slice + one batched device_get at the end
          (the engine's current strategy)
  thread  a background thread drains a queue with blocking device_get
          while the main thread keeps dispatching
  sync    blocking device_get per slice (fully serialized reference)

The slope between a 2-slice and an N-slice run cancels one-time costs.
"""

import datetime as dt
import pathlib
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax

    import raider_tpu  # noqa: F401
    ns = build_scene()
    one_slice, n_long, n_rays = ns['one_slice'], ns['n_long'], ns['n_rays']

    # warm every executable (cold + warm geometry, integrate)
    jax.block_until_ready(one_slice(0))
    jax.block_until_ready(one_slice(1))

    def run(n, strategy):
        outs = {}
        fetched = {}
        err = []
        q = queue.Queue()

        def drain():
            while True:
                item = q.get()
                if item is None:
                    return
                hh, w, h = item
                try:
                    fetched[hh] = jax.device_get((w, h))
                except Exception as e:  # noqa: BLE001
                    err.append(e)
                    return

        th = None
        if strategy == 'thread':
            th = threading.Thread(target=drain)
            th.start()
        t0 = time.perf_counter()
        for hh in range(n):
            w, h = one_slice(hh)
            if strategy == 'async':
                w.copy_to_host_async()
                h.copy_to_host_async()
                outs[hh] = (w, h)
            elif strategy == 'thread':
                q.put((hh, w, h))
            elif strategy == 'sync':
                fetched[hh] = jax.device_get((w, h))
            else:
                outs[hh] = (w, h)
        if strategy == 'async':
            fetched = jax.device_get(outs)
        elif strategy == 'thread':
            q.put(None)
            th.join()
            if err:
                raise err[0]
        elif strategy == 'none':
            jax.block_until_ready(outs)
        t = time.perf_counter() - t0
        # keep results alive until timed region ends
        return t, fetched

    for strategy in ('none', 'async', 'thread', 'sync'):
        t2, _ = run(2, strategy)
        tn, _ = run(n_long, strategy)
        slope = (tn - t2) / (n_long - 2)
        print(f'{strategy:7s}  2: {t2:6.3f} s   {n_long}: {tn:6.3f} s   '
              f'slope {slope:6.3f} s/slice  ({n_rays / slope / 1e6:.2f} M rays/s)',
              flush=True)




def variants():
    """Overlap variants: stacked one-copy-per-slice; chunked half-slices."""
    import jax
    import jax.numpy as jnp

    import raider_tpu  # noqa: F401
    # reuse main()'s scene by re-running its setup via a shared builder
    ns = build_scene()
    one_slice, zpts, n_long, n_rays = (ns['one_slice'], ns['zpts'],
                                       ns['n_long'], ns['n_rays'])
    one_slice_half = ns['one_slice_half']

    @jax.jit
    def stack2(w, h):
        return jnp.stack([w, h])

    jax.block_until_ready(one_slice(0))
    jax.block_until_ready(stack2(*one_slice(1)))
    jax.block_until_ready(one_slice_half(0, 0))
    jax.block_until_ready(one_slice_half(1, 1))

    import time as _t

    def run(n, mode):
        outs = {}
        t0 = _t.perf_counter()
        for hh in range(n):
            if mode == 'stacked':
                s = stack2(*one_slice(hh))
                s.copy_to_host_async()
                outs[hh] = s
            elif mode == 'chunked':
                a = stack2(*one_slice_half(hh, 0))
                a.copy_to_host_async()
                b = stack2(*one_slice_half(hh, 1))
                b.copy_to_host_async()
                outs[hh] = (a, b)
        fetched = jax.device_get(outs)
        return _t.perf_counter() - t0, fetched

    for mode in ('stacked', 'chunked', 'stacked'):
        t2, _ = run(2, mode)
        tn, _ = run(n_long, mode)
        slope = (tn - t2) / (n_long - 2)
        print(f'{mode:8s} 2: {t2:6.3f} s   {n_long}: {tn:6.3f} s   '
              f'slope {slope:6.3f} s/slice  ({n_rays / slope / 1e6:.2f} M rays/s)',
              flush=True)


def build_scene():
    """The shared bench scene; returns slice closures (full and half-ray)."""
    import jax
    import jax.numpy as jnp

    import raider_tpu  # noqa: F401
    from raider_tpu.delay.engine import WeatherCube
    from raider_tpu.delay.raytrace import integrate_rays, pack_cubes
    from raider_tpu.geodesy.crs import Geographic
    from raider_tpu.geodesy.gravity import get_Re
    from raider_tpu.geometry.device_geom import GeomSession
    from raider_tpu.geometry.orbit import Orbit
    from raider_tpu.geometry.rays import clip_chain
    from raider_tpu.io.ncdf import Dataset, Variable

    rng = np.random.default_rng(0)
    nz, ny, nx = 50, 400, 400
    n_rays = 1_000_000
    zs = -500.0 + 26500.0 * np.linspace(0.0, 1.0, nz) ** 1.4
    t_ref = dt.datetime(2020, 1, 1, 12, 0, 0)
    tt = np.arange(-600.0, 601.0, 30.0)
    r_orb = 6378137.0 + 700e3
    ang = 2.0 * np.pi / 5800.0 * tt
    pos_o = np.stack([r_orb * np.cos(ang), np.zeros_like(ang),
                      r_orb * np.sin(ang)], -1)
    vel_o = np.gradient(pos_o, 30.0, axis=0)
    orbit = Orbit(times=tt, pos=pos_o, vel=vel_o, ref_time=t_ref)
    ys_e = np.linspace(16.0, 24.0, ny)
    xs_e = np.linspace(1.5, 7.5, nx)
    wet = rng.uniform(0.1, 100.0, (nz, ny, nx))
    hydro = rng.uniform(50.0, 300.0, (nz, ny, nx))
    coords = {'x': Variable(('x',), xs_e, {}), 'y': Variable(('y',), ys_e, {}),
              'z': Variable(('z',), zs, {})}
    variables = {
        'wet': Variable(('z', 'y', 'x'), wet, {}),
        'hydro': Variable(('z', 'y', 'x'), hydro, {}),
        'proj': Variable((), np.int64(0), Geographic().to_cf()),
    }
    wm = WeatherCube(Dataset(coords=coords, variables=variables, attrs={}))
    side = int(np.sqrt(n_rays))
    yq = np.linspace(18.5, 21.5, side)
    xq = np.linspace(3.5, 6.0, side)
    xx, yy = np.meshgrid(xq, yq)
    re_dev = jnp.asarray(np.asarray(get_Re(yy)).reshape(-1).astype(np.float32))
    zref = float(zs[-1] - 1.0)
    n_long = 8
    zpts = 100.0 * np.arange(n_long)
    j0 = max(int(np.searchsorted(zs, float(zpts.min()), side='right')) - 1, 0)
    j1 = min(int(np.searchsorted(zs, zref, side='left')), zs.size - 1)
    zs_chain = zs[j0:j1 + 1]
    chains = [clip_chain(zs_chain, float(ht), zref,
                         nudge_top=(j1 == zs.size - 1)) for ht in zpts]
    cube_wet = wm.field('wet', np.float32)
    cube_hydro = wm.field('hydro', np.float32)
    packed2d, pack_mode = pack_cubes(cube_wet, cube_hydro, grouped=True)
    sess = GeomSession(orbit, yy, xx, wm.crs)
    geom0 = sess.slice(float(zpts[0]), chains[0])
    plm, hsm = jax.device_get((geom0['per_level_max'], geom0['hstep_max']))
    per_level_max = np.asarray(plm, np.float64)
    hstep_max = np.asarray(hsm, np.float64) * (1.0 + 1e-4) + 1e-5
    heights = chains[0]

    def one_slice(hh):
        geom = sess.slice(float(zpts[hh]), chains[hh])
        return integrate_rays(
            cube_wet, cube_hydro, wm.ys, wm.xs, wm.zs,
            geom['bnd_y'], geom['bnd_x'], geom['bnd_z'],
            geom['d2'], geom['ray_len'], re_dev,
            ray_lengths_max=per_level_max,
            packed2d=packed2d, mode=pack_mode,
            heights=heights, hstep_max=hstep_max, static_plan=True,
        )

    half = n_rays // 2

    def one_slice_half(hh, k):
        geom = sess.slice(float(zpts[hh]), chains[hh])
        sl = slice(0, half) if k == 0 else slice(half, None)
        return integrate_rays(
            cube_wet, cube_hydro, wm.ys, wm.xs, wm.zs,
            geom['bnd_y'][:, sl], geom['bnd_x'][:, sl], geom['bnd_z'][:, sl],
            geom['d2'][:, sl], geom['ray_len'][:, sl], re_dev[sl],
            ray_lengths_max=per_level_max,
            packed2d=packed2d, mode=pack_mode,
            heights=heights, hstep_max=hstep_max, static_plan=True,
        )

    return dict(one_slice=one_slice, one_slice_half=one_slice_half,
                zpts=zpts, n_long=n_long, n_rays=n_rays)




def batch_variants():
    """Batched-copy variants: stack k slices' (2, N) outputs into ONE
    (k, 2, N) buffer per copy. Measured d2h throughput doubles from 8 MB
    (~12.8 MB/s) to 32 MB (~23.8 MB/s) chunks through the tunnel."""
    import time as _t

    import jax
    import jax.numpy as jnp

    import raider_tpu  # noqa: F401
    ns = build_scene()
    one_slice, n_long, n_rays = ns['one_slice'], ns['n_long'], ns['n_rays']

    @jax.jit
    def stack2(w, h):
        return jnp.stack([w, h])

    @jax.jit
    def stackn(xs):
        return jnp.stack(xs)

    jax.block_until_ready(one_slice(0))
    jax.block_until_ready(stack2(*one_slice(1)))

    def run(n, k):
        # k = slices per copy; k=0 = ONE end-of-cube fetch (no async copies)
        batches = []
        pend = []
        t0 = _t.perf_counter()
        for hh in range(n):
            pend.append(stack2(*one_slice(hh)))
            if k and len(pend) == k:
                buf = stackn(pend) if k > 1 else pend[0]
                buf.copy_to_host_async()
                batches.append(buf)
                pend = []
        if pend:
            buf = stackn(pend) if len(pend) > 1 else pend[0]
            if k:
                buf.copy_to_host_async()
            batches.append(buf)
        fetched = jax.device_get(batches)
        return _t.perf_counter() - t0, fetched

    import os
    ks = tuple(int(v) for v in os.environ.get(
        'FETCH_KS', '1,2,4,8,0').split(','))
    n_long = int(os.environ.get('FETCH_NLONG', n_long))
    for k in ks:
        t2, _ = run(2, k)
        tn, _ = run(n_long, k)
        slope = (tn - t2) / (n_long - 2)
        name = f'batch k={k}' if k else 'endofcube '
        print(f'{name}:  2: {t2:6.3f} s   {n_long}: {tn:6.3f} s   '
              f'slope {slope:6.3f} s/slice  ({n_rays / slope / 1e6:.2f} M rays/s)',
              flush=True)


if __name__ == '__main__':
    import sys as _s

    if '--batch' in _s.argv:
        batch_variants()
    elif '--variants' in _s.argv:
        variants()
    else:
        main()
