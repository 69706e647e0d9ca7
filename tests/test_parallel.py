"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raider_tpu.parallel import get_mesh, shard_rays
from raider_tpu.parallel.mesh import pad_to_multiple


def test_mesh_has_8_devices():
    mesh = get_mesh()
    assert mesh.devices.size == 8


def test_pad_to_multiple():
    a = np.arange(10)
    p, n = pad_to_multiple(a, 8)
    assert p.shape[0] == 16 and n == 10
    p2, n2 = pad_to_multiple(np.arange(16), 8)
    assert p2.shape[0] == 16 and n2 == 16


def test_shard_rays_matches_single_device(rng):
    """A ray-batched computation sharded over 8 devices must equal the
    single-device result."""
    cube = jnp.asarray(rng.normal(size=(5, 6, 7)).astype(np.float32))
    pts = rng.uniform(0, 4, size=(1003, 3)).astype(np.float32)

    def fn(pts, cube):
        # toy per-ray reduction over the replicated cube
        iy = jnp.clip(pts[:, 0].astype(jnp.int32), 0, 4)
        return jnp.take(cube.reshape(-1), iy * 42 + 3) * pts[:, 1] + pts[:, 2]

    sharded = shard_rays(fn, ray_axis_argnums=(0,))
    out_sharded = np.asarray(sharded(pts, cube))
    out_single = np.asarray(jax.jit(fn)(jnp.asarray(pts), cube))
    np.testing.assert_allclose(out_sharded, out_single, rtol=1e-6)
    assert out_sharded.shape[0] == 1003  # un-padded


def test_sharded_raytrace_integration(rng):
    """The real integration kernel sharded over rays: bitwise-equal results."""
    from raider_tpu.delay.raytrace import integrate_rays

    nz, ny, nx = 8, 16, 16
    zs = np.linspace(0.0, 8000.0, nz)
    ys = np.linspace(30, 36, ny)
    xs = np.linspace(-120, -114, nx)
    cube_w = rng.uniform(1, 100, (nz, ny, nx))
    cube_h = rng.uniform(100, 300, (nz, ny, nx))

    n_rays = 200
    n_lev = 4
    # contiguous segments: (n_lev+1, n_rays) boundary components
    bnd_y = rng.uniform(31, 35, (1, n_rays)) + 0.01 * np.arange(n_lev + 1)[:, None]
    bnd_x = rng.uniform(-119, -115, (1, n_rays)) + 0.01 * np.arange(n_lev + 1)[:, None]
    bnd_z = np.broadcast_to(zs[:n_lev + 1, None], (n_lev + 1, n_rays)) + 1.0
    ray_len = np.full((n_lev, n_rays), 1200.0)
    d2 = np.full((n_lev, n_rays), 500.0**2)
    re = np.full(n_rays, 6371000.0)
    per_level_max = ray_len.max(axis=1)

    wet1, hydro1 = integrate_rays(cube_w, cube_h, ys, xs, zs,
                                  bnd_y, bnd_x, bnd_z, d2,
                                  ray_len, re, per_level_max)

    # shard over the ray axis (axis 1 of the level-major arrays -> transpose)
    def fn(by_t, bx_t, bz_t, d2_t, rl_t, re_s, cw, ch):
        return integrate_rays(
            cw, ch, ys, xs, zs,
            jnp.swapaxes(by_t, 0, 1), jnp.swapaxes(bx_t, 0, 1),
            jnp.swapaxes(bz_t, 0, 1),
            jnp.swapaxes(d2_t, 0, 1), jnp.swapaxes(rl_t, 0, 1),
            re_s, per_level_max,
        )

    sharded = shard_rays(fn, ray_axis_argnums=(0, 1, 2, 3, 4, 5))
    wet2, hydro2 = sharded(
        bnd_y.swapaxes(0, 1), bnd_x.swapaxes(0, 1), bnd_z.swapaxes(0, 1),
        d2.swapaxes(0, 1), ray_len.swapaxes(0, 1), re, cube_w, cube_h,
    )
    np.testing.assert_allclose(np.asarray(wet2), np.asarray(wet1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(hydro2), np.asarray(hydro1), rtol=1e-12)


def test_sharded_raytrace_with_device_geometry(monkeypatch):
    """Device geometry + multi-device ray sharding compose: geometry arrays
    come back as device arrays and the engine shards them over the mesh."""
    import datetime as dt
    import sys

    sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
    from test_raytrace import synthetic_orbit, synthetic_wm_dataset

    from raider_tpu.delay.engine import WeatherCube, _build_cube_ray
    from raider_tpu.geodesy.crs import Geographic
    from raider_tpu.geometry.los import Raytracing

    monkeypatch.setenv('RAIDER_TPU_DEVICE_GEOMETRY', '1')
    t = dt.datetime(2020, 1, 30, 13, 52, 45)
    wm = WeatherCube(synthetic_wm_dataset(1.0, 2.0))
    los = Raytracing(orbit=synthetic_orbit(t), time=t)
    # npix >= 8 * n_dev so the sharding branch actually engages
    xpts = np.linspace(-118.4, -117.2, 16)
    ypts = np.linspace(33.2, 33.8, 8)
    wet, hydro = _build_cube_ray(wm, xpts, ypts, np.array([0.0]), los,
                                 Geographic(), zref=25000.0,
                                 compute_dtype=np.float32)
    wet = np.asarray(wet)
    assert wet.shape == (1, 8, 16)
    assert np.isfinite(wet).all()
    np.testing.assert_allclose(np.asarray(hydro) / wet, 2.0, rtol=1e-5)


def test_sharded_ztd_cube_matches_single_device(rng):
    """_build_cube shards the output y axis over the 8-device mesh; results
    must be bit-identical to the unsharded op (VERDICT r1 item 3)."""
    from raider_tpu.delay.engine import WeatherCube, _build_cube
    from raider_tpu.geodesy.crs import Geographic
    from raider_tpu.io.ncdf import Dataset, Variable
    from raider_tpu.ops import grid_weights, interp3d_points, interp3d_separable

    nz, ny, nx = 6, 20, 18
    zs = np.linspace(-500.0, 25000.0, nz)
    ys = np.linspace(30.0, 36.0, ny)
    xs = np.linspace(-120.0, -114.0, nx)
    wt = rng.uniform(0.0, 0.3, (nz, ny, nx))
    ht = rng.uniform(1.0, 2.5, (nz, ny, nx))
    coords = {'x': Variable(('x',), xs, {}), 'y': Variable(('y',), ys, {}),
              'z': Variable(('z',), zs, {})}
    variables = {
        'wet_total': Variable(('z', 'y', 'x'), wt, {}),
        'hydro_total': Variable(('z', 'y', 'x'), ht, {}),
        'proj': Variable((), np.int64(0), Geographic().to_cf()),
    }
    wm = WeatherCube(Dataset(coords=coords, variables=variables, attrs={}))

    xq = np.linspace(-119.0, -115.0, 13)
    yq = np.linspace(31.0, 35.0, 11)   # 11 rows -> padded to 16 over 8 devs
    zq = np.array([0.0, 1000.0, 4000.0])

    assert len(jax.devices()) == 8  # the sharded branch must engage
    got_w, got_h = _build_cube(wm, xq, yq, zq, Geographic(),
                               ('wet_total', 'hydro_total'), np.float64)
    exp_w = np.asarray(interp3d_separable(
        wm.field('wet_total', np.float64),
        grid_weights(wm.zs, zq), grid_weights(wm.ys, yq), grid_weights(wm.xs, xq)))
    np.testing.assert_array_equal(np.asarray(got_w), exp_w)
    assert np.asarray(got_w).shape == (3, 11, 13)

    # gather path (CRS mismatch): also sharded, also bit-identical
    from raider_tpu.geodesy import crs_from_user
    utm = crs_from_user(32611)
    xxq, yyq = np.meshgrid(xq, yq)
    lon, lat = (np.asarray(v) for v in utm.inverse(*np.meshgrid(
        np.linspace(370000.0, 420000.0, 13), np.linspace(3.45e6, 3.9e6, 11))))
    # drive through _build_cube with UTM output grid
    got2_w, got2_h = _build_cube(
        wm, np.linspace(370000.0, 420000.0, 13),
        np.linspace(3.45e6, 3.9e6, 11), zq, utm,
        ('wet_total', 'hydro_total'), np.float64)
    mx, my = (np.asarray(v) for v in wm.crs.forward(lon, lat))
    py = np.broadcast_to(my, (zq.size,) + my.shape)
    px = np.broadcast_to(mx, (zq.size,) + mx.shape)
    pz = np.broadcast_to(zq[:, None, None], py.shape)
    exp2_w = np.asarray(interp3d_points(
        wm.field('wet_total', np.float64), wm.ys, wm.xs, wm.zs, py, px, pz))
    np.testing.assert_array_equal(np.asarray(got2_w), exp2_w)


class TestMultiHost:
    """Real multi-PROCESS initialization: two OS processes x 4 virtual CPU
    devices glued into one 8-device global mesh by
    parallel.initialize_distributed (jax.distributed; gloo collectives stand
    in for ICI/DCN). Exercises the multi-host path the in-process tests
    can't: coordinator handshake, global device view, per-process shard
    construction (jax.make_array_from_process_local_data), and a cross-host
    reduction."""

    def test_two_process_mesh_reduction(self, tmp_path):
        import socket
        import subprocess
        import sys
        from pathlib import Path

        with socket.socket() as s:  # free port for the coordinator
            s.bind(('localhost', 0))
            port = s.getsockname()[1]
        worker = Path(__file__).parent / '_mh_worker.py'
        env = {k: v for k, v in __import__('os').environ.items()
               if k not in ('XLA_FLAGS',)}
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(i), '2', str(port)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env)
            for i in range(2)
        ]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=480)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f'worker {i} failed:\n{out}'
        totals = {line.split('total=')[1]
                  for out in outs for line in out.splitlines()
                  if line.startswith('MH_OK')}
        assert len(totals) == 1, f'processes disagree: {outs}'

        # ---- production tropo_delay across the OS-process boundary ----
        # Both workers ran the REAL engine (Zenith + Raytracing cubes,
        # sharded integrate, async result stream, device_get_global
        # all-gather) on the 2-process x 4-device global mesh and printed
        # full-cube digests; they must agree with each other AND with the
        # single-process UNSHARDED golden bit-exactly.
        import json

        prod = [json.loads(line.split(' ', 2)[2])
                for out in outs for line in out.splitlines()
                if line.startswith('MH_PROD')]
        assert len(prod) == 2, f'missing production digests: {outs}'
        assert prod[0] == prod[1], f'processes disagree: {prod}'
        assert prod[0]['zenith_finite_frac'] == 1.0
        assert prod[0]['ray_finite_frac'] > 0.99

        import os as _os

        from tests._mh_scene import run_production
        old = _os.environ.get('RAIDER_TPU_SHARD')
        _os.environ['RAIDER_TPU_SHARD'] = '0'
        try:
            golden = run_production()
        finally:
            if old is None:
                _os.environ.pop('RAIDER_TPU_SHARD', None)
            else:
                _os.environ['RAIDER_TPU_SHARD'] = old
        assert prod[0] == golden, (prod[0], golden)

    @pytest.mark.slow
    def test_four_process_cli_products(self, tmp_path):
        """VERDICT r4 item 6: the FULL CLI (calcDelays on a YAML config,
        raytraced cube product) across a 4-process x 2-device global mesh.
        All four processes must write products whose content (data vars,
        coords, stable attrs) is bit-identical to each other and to the
        single-process unsharded golden."""
        import json
        import socket
        import subprocess
        import sys
        from pathlib import Path

        with socket.socket() as s:
            s.bind(('localhost', 0))
            port = s.getsockname()[1]
        worker = Path(__file__).parent / '_mh_cli_worker.py'
        env = {k: v for k, v in __import__('os').environ.items()
               if k not in ('XLA_FLAGS',)}
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(i), '4', str(port),
                 str(tmp_path)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env)
            for i in range(4)
        ]
        outs = []
        for p in procs:
            try:
                # generous: 4 JAX processes compile concurrently and the
                # test measured load-sensitive (94 s idle, timed out at 600
                # once under a concurrent full-bench run)
                out, _ = p.communicate(timeout=1200)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f'worker {i} failed:\n{out}'
        digests = [json.loads(line.split(' ', 2)[2])
                   for out in outs for line in out.splitlines()
                   if line.startswith('MH_CLI')]
        assert len(digests) == 4, f'missing CLI digests: {outs}'
        assert all(d == digests[0] for d in digests[1:]), digests
        prod_keys = [k for k in digests[0] if k.endswith('.nc')]
        assert prod_keys, digests[0]

        # single-process unsharded golden, same scene + config
        import os as _os

        from tests._mh_scene import run_cli
        old = _os.environ.get('RAIDER_TPU_SHARD')
        _os.environ['RAIDER_TPU_SHARD'] = '0'
        try:
            golden = run_cli(str(tmp_path / 'single'))
        finally:
            if old is None:
                _os.environ.pop('RAIDER_TPU_SHARD', None)
            else:
                _os.environ['RAIDER_TPU_SHARD'] = old
        assert digests[0] == golden, (digests[0], golden)
