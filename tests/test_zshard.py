"""Z-slab cube sharding (parallel/zshard.py) on the virtual 8-device mesh.

The capacity decomposition for cubes past one chip's HBM: table rows shard
into contiguous z-slabs, every chip runs the full ray batch against its
slab, one psum adds the partials. Asserted against the replicated-cube
``integrate_rays`` in the same packed mode: equal up to float summation
order (the psum reassociates the final 8-way add), identical NaN masks,
deterministic run-to-run.
"""

import numpy as np
import pytest

from raider_tpu.delay.raytrace import build_sampling_plan, integrate_rays, pack_cubes
from raider_tpu.parallel.mesh import get_mesh
from raider_tpu.parallel.zshard import integrate_rays_z_sharded, pack_cube_slabs


def _scene(rng, nz=12, ny=16, nx=20, n_rays=300, n_lev=None, nan_cells=0):
    n_lev = (nz - 1) if n_lev is None else n_lev
    zs = np.linspace(0.0, 11000.0, nz)
    ys = np.linspace(30.0, 36.0, ny)
    xs = np.linspace(-120.0, -114.0, nx)
    wet = rng.uniform(1.0, 100.0, (nz, ny, nx))
    hydro = rng.uniform(100.0, 300.0, (nz, ny, nx))
    if nan_cells:
        zz = rng.integers(0, nz, nan_cells)
        yy = rng.integers(0, ny, nan_cells)
        xx = rng.integers(0, nx, nan_cells)
        wet[zz, yy, xx] = np.nan
    # contiguous slant segments (one boundary-point array view)
    bnd_y = rng.uniform(31, 35, (1, n_rays)) \
        + 0.004 * np.arange(n_lev + 1)[:, None]
    bnd_x = rng.uniform(-119, -115, (1, n_rays)) \
        + 0.004 * np.arange(n_lev + 1)[:, None]
    bnd_z = np.broadcast_to(zs[: n_lev + 1, None], (n_lev + 1, n_rays)) + 1.0
    ray_len = np.full((n_lev, n_rays), 1100.0)
    d2 = np.full((n_lev, n_rays), 500.0 ** 2)
    re = np.full(n_rays, 6371000.0)
    plm = np.full(n_lev, 1100.0)
    args = (bnd_y.astype(np.float32), bnd_x.astype(np.float32),
            bnd_z.astype(np.float32), d2.astype(np.float32),
            ray_len.astype(np.float32), re.astype(np.float32))
    return (wet.astype(np.float32), hydro.astype(np.float32),
            ys, xs, zs, args, plm.astype(np.float32))


@pytest.mark.parametrize('mode', ['pack16', 'pack4'])
def test_matches_replicated_integrate(rng, mode):
    wet, hydro, ys, xs, zs, rays, plm = _scene(rng, nan_cells=4)
    packed, _ = pack_cubes(wet, hydro, mode=mode)
    w_ref, h_ref = (np.asarray(v) for v in integrate_rays(
        wet, hydro, ys, xs, zs, *rays, plm, packed2d=packed, mode=mode))

    w_z, h_z = (np.asarray(v) for v in integrate_rays_z_sharded(
        wet, hydro, ys, xs, zs, *rays, plm, mode=mode))

    np.testing.assert_array_equal(np.isnan(w_z), np.isnan(w_ref))
    np.testing.assert_array_equal(np.isnan(h_z), np.isnan(h_ref))
    m = ~np.isnan(w_ref)
    assert m.any()
    np.testing.assert_allclose(w_z[m], w_ref[m], rtol=2e-6)
    np.testing.assert_allclose(h_z[m], h_ref[m], rtol=2e-6)


def test_pack16_i16_within_quantization_bound(rng):
    wet, hydro, ys, xs, zs, rays, plm = _scene(rng)
    packed, _ = pack_cubes(wet, hydro, mode='pack16')
    w_ref, h_ref = (np.asarray(v) for v in integrate_rays(
        wet, hydro, ys, xs, zs, *rays, plm, packed2d=packed, mode='pack16'))
    w_z, h_z = (np.asarray(v) for v in integrate_rays_z_sharded(
        wet, hydro, ys, xs, zs, *rays, plm, mode='pack16_i16'))
    # same < 0.1 mm class as the single-chip quantized modes
    assert np.nanmax(np.abs(w_z - w_ref)) < 1e-4
    assert np.nanmax(np.abs(h_z - h_ref)) < 1e-4


def test_deterministic_across_runs(rng):
    wet, hydro, ys, xs, zs, rays, plm = _scene(rng, n_rays=128)
    a = np.asarray(integrate_rays_z_sharded(
        wet, hydro, ys, xs, zs, *rays, plm, mode='pack16')[0])
    b = np.asarray(integrate_rays_z_sharded(
        wet, hydro, ys, xs, zs, *rays, plm, mode='pack16')[0])
    np.testing.assert_array_equal(a, b)


def test_uneven_slabs(rng):
    """nz-1 = 10 cells over 8 devices: two-cell and one-cell slabs mix."""
    wet, hydro, ys, xs, zs, rays, plm = _scene(rng, nz=11)
    packed, _ = pack_cubes(wet, hydro, mode='pack16')
    w_ref, _ = (np.asarray(v) for v in integrate_rays(
        wet, hydro, ys, xs, zs, *rays, plm, packed2d=packed, mode='pack16'))
    w_z, _ = (np.asarray(v) for v in integrate_rays_z_sharded(
        wet, hydro, ys, xs, zs, *rays, plm, mode='pack16'))
    np.testing.assert_allclose(w_z, w_ref, rtol=2e-6)


def test_slab_tables_shrink_per_device(rng):
    """The capacity point: per-device rows ~ total/n_dev (+halo for pack4)."""
    nz, ny, nx = 17, 16, 20
    wet = rng.uniform(1, 2, (nz, ny, nx)).astype(np.float32)
    hydro = wet + 1
    n_dev = get_mesh().devices.size
    tables, z_lo, z_hi, deq = pack_cube_slabs(wet, hydro, 'pack16', n_dev)
    assert tables.shape[0] == n_dev
    assert deq is None
    full_rows = nz * ny * nx
    assert tables.shape[1] <= int(np.ceil((nz - 1) / n_dev)) * ny * nx
    assert tables.shape[1] * n_dev < full_rows + n_dev * ny * nx
    # slabs partition the anchor cells exactly
    lo, hi = np.asarray(z_lo), np.asarray(z_hi)
    assert lo[0] == 0 and hi[-1] == nz - 1
    assert (lo[1:] == hi[:-1]).all()


def test_engine_zshard_matches_replicated(monkeypatch):
    """The PRODUCTION engine (_build_cube_ray) on the z-shard path
    (RAIDER_TPU_ZSHARD=1, pack16 cube forced via the brick opt-out) vs the
    replicated-table run: identical NaN masks, values equal up to the
    psum's reassociation."""
    import datetime as dt
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_raytrace import synthetic_orbit, synthetic_wm_dataset

    from raider_tpu.delay.engine import WeatherCube, _build_cube_ray
    from raider_tpu.geodesy.crs import Geographic
    from raider_tpu.geometry.los import Raytracing

    rng = np.random.default_rng(5)
    shape = (49, 13, 17)
    wet_c = rng.uniform(0.1, 100.0, shape)
    hydro_c = rng.uniform(50.0, 300.0, shape)
    t = dt.datetime(2020, 1, 30, 13, 52, 45)
    wm = WeatherCube(synthetic_wm_dataset(wet_cube=wet_c, hydro_cube=hydro_c))
    los = Raytracing(orbit=synthetic_orbit(t), time=t)
    xpts = np.linspace(-118.4, -117.2, 8)
    ypts = np.linspace(33.2, 33.8, 6)
    hts = np.array([0.0, 4000.0])

    def run():
        return tuple(np.asarray(v) for v in _build_cube_ray(
            wm, xpts, ypts, hts, los, Geographic(), zref=25000.0,
            compute_dtype=np.float32))

    # force the packed (non-brick) ladder so the z-shard modes apply
    monkeypatch.setenv('RAIDER_TPU_BRICK_I16', '0')
    import raider_tpu.delay.raytrace as rt
    monkeypatch.setattr(rt, '_BRICK_SPECS', ((7, 3, 3, 6, 0),))  # no brick

    monkeypatch.setenv('RAIDER_TPU_ZSHARD', '0')
    w_rep, h_rep = run()
    monkeypatch.setenv('RAIDER_TPU_ZSHARD', '1')
    w_z, h_z = run()

    np.testing.assert_array_equal(np.isnan(w_z), np.isnan(w_rep))
    m = ~np.isnan(w_rep)
    assert m.any()
    np.testing.assert_allclose(w_z[m], w_rep[m], rtol=2e-6)
    np.testing.assert_allclose(h_z[m], h_rep[m], rtol=2e-6)


def test_zshard_auto_gate(monkeypatch):
    from raider_tpu.parallel.zshard import zshard_auto

    monkeypatch.delenv('RAIDER_TPU_ZSHARD', raising=False)
    small = (50, 400, 400)          # pack16 f32 table 0.5 GB: replicate
    giant = (137, 1801, 3600)       # ~888M cells: 28 GB even as pack4
    assert not zshard_auto(small, np.float32, 'pack16', n_dev=8)
    assert zshard_auto(giant, np.float32, 'pack4', n_dev=8)
    assert zshard_auto(giant, np.float32, 'pack16_i16', n_dev=8)
    # brick modes never z-shard; single device never z-shards
    assert not zshard_auto(giant, np.float32, 'brick', n_dev=8)
    assert not zshard_auto(giant, np.float32, 'pack4', n_dev=1)
    monkeypatch.setenv('RAIDER_TPU_ZSHARD', '0')
    assert not zshard_auto(giant, np.float32, 'pack4', n_dev=8)
    monkeypatch.setenv('RAIDER_TPU_ZSHARD', '1')
    assert zshard_auto(small, np.float32, 'pack16', n_dev=8)
