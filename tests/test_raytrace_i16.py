"""Quantized int16 PACK16 vs f32 PACK16 (VERDICT r3 item 2 lever).

The pack16_i16 mode keeps 1-gather-per-sample for cubes whose f32 PACK16
table exceeds _PACK16_BYTE_LIMIT (full-CONUS-HRRR class), storing the
packed rows as per-field affine int16 with a NaN sentinel. The probe
(scripts/probe_f16.py; BASELINE.md "16-bit packed rows") measured 16-bit
row gathers at the same wall time as f32 rows, so the only question is
precision — bounded here at the 0.1 mm parity promise with two orders of
margin — and semantics (NaN poisoning identical to the f32 path).
"""

import numpy as np
import pytest

from raider_tpu.delay.raytrace import (
    _PACK16_BYTE_LIMIT,
    _PACK16_I16_BYTE_LIMIT,
    integrate_rays,
    pack_cubes,
    pack_mode_for,
)
from raider_tpu.geometry.rays import level_heights
from tests.test_brick_kernel import contiguous_rays


def run_modes(zs, heights, modes, n_rays=257, seed=0, mutate=None,
              cube_mutate=None, static_plan=False, cube_dtype=None):
    rng = np.random.default_rng(seed)
    ys = np.arange(33.0, 34.01, 0.1)
    xs = np.arange(-118.0, -116.99, 0.1)
    # realistic refractivity ranges: the quantization step is range/65534,
    # so the error bound must be demonstrated at real spans, not unit cubes
    wet = rng.uniform(0.1, 100.0, (zs.size, ys.size, xs.size))
    hydro = rng.uniform(50.0, 300.0, (zs.size, ys.size, xs.size))
    if cube_dtype is not None:
        wet = wet.astype(cube_dtype)
        hydro = hydro.astype(cube_dtype)
    if cube_mutate is not None:
        cube_mutate(wet, hydro)
    bnd_y, bnd_x, bnd_z, d2, ray_len, hstep_max = contiguous_rays(
        heights, n_rays, rng)
    if mutate is not None:
        mutate(bnd_y, bnd_x, bnd_z, ray_len)
    re = np.full(n_rays, 6371000.0)
    per_level_max = np.nanmax(ray_len, axis=1)
    out = {}
    for mode in modes:
        packed, _ = pack_cubes(wet, hydro, mode=mode)
        w, h = integrate_rays(
            wet, hydro, ys, xs, zs, bnd_y, bnd_x, bnd_z, d2, ray_len, re,
            per_level_max, packed2d=packed, mode=mode,
            heights=heights, hstep_max=hstep_max, static_plan=static_plan,
        )
        out[mode] = (np.asarray(w), np.asarray(h))
    return out


class TestI16Equivalence:
    def test_delay_within_parity_bound(self):
        """pack16_i16 vs pack16 on a realistic chain: < 0.1 mm everywhere
        (the README parity promise), expected ~100x under it."""
        zs = -500.0 + 26500.0 * np.linspace(0.0, 1.0, 40) ** 1.4
        heights = level_heights(zs, 0.0, 25000.0)
        out = run_modes(zs, heights, ('pack16', 'pack16_i16'))
        (w_f, h_f), (w_q, h_q) = out['pack16'], out['pack16_i16']
        # steep rays legitimately exit the 1-deg grid before 25 km: both
        # modes must agree on exactly which, and most must survive
        np.testing.assert_array_equal(np.isnan(w_f), np.isnan(w_q))
        ok = np.isfinite(w_f)
        assert ok.mean() > 0.7
        worst = max(np.abs(w_q[ok] - w_f[ok]).max(),
                    np.abs(h_q[ok] - h_f[ok]).max())
        assert worst < 1e-4, f'quantized delay off by {worst * 1e3:.4f} mm'
        # delays are meters-scale; the i16 grid must not bias them
        assert abs(np.mean(w_q[ok] - w_f[ok])) < 2e-6

    def test_nan_rays_and_oob_match(self):
        zs = np.arange(-500.0, 10001.0, 1000.0)
        heights = level_heights(zs, 0.0, 9000.0)

        def mutate(bnd_y, bnd_x, bnd_z, ray_len):
            bnd_y[:, :5] = np.nan
            bnd_x[:, :5] = np.nan
            bnd_z[:, :5] = np.nan
            ray_len[:, :5] = np.nan
            bnd_x[:, 5] += 5.0        # out of grid

        out = run_modes(zs, heights, ('pack16', 'pack16_i16'), mutate=mutate)
        (w_f, _), (w_q, _) = out['pack16'], out['pack16_i16']
        np.testing.assert_array_equal(np.isnan(w_f), np.isnan(w_q))
        assert np.isnan(w_q[:6]).all() and np.isfinite(w_q[6:]).all()

    def test_nan_cube_cells_poison_identically(self):
        """int16 has no NaN: non-finite cells store the sentinel and must
        decode back to NaN, poisoning exactly the samples the f32 table's
        non-finite values poison. (One intended difference: f32 propagates
        an inf cell as an inf delay; the sentinel folds ALL non-finite
        garbage to NaN — the rays poisoned are identical either way.)"""
        zs = np.arange(-500.0, 10001.0, 1000.0)
        heights = level_heights(zs, 0.0, 9000.0)

        def cube_mutate(wet, hydro):
            wet[3:5, 4:7, 4:7] = np.nan
            hydro[6, 2, 8] = np.inf

        out = run_modes(zs, heights, ('pack16', 'pack16_i16'),
                        cube_mutate=cube_mutate)
        (w_f, h_f), (w_q, h_q) = out['pack16'], out['pack16_i16']
        np.testing.assert_array_equal(np.isnan(w_f), np.isnan(w_q))
        np.testing.assert_array_equal(np.isfinite(h_f), np.isfinite(h_q))
        assert np.isnan(w_f).any() and not np.isnan(w_f).all()
        assert np.isinf(h_f).any() and not np.isinf(h_q).any()
        both = np.isfinite(w_f)
        assert np.abs(w_q[both] - w_f[both]).max() < 1e-4

    def test_constant_field_quantizes_exactly(self):
        """Degenerate range (vmax == vmin) must not divide by zero and must
        decode back to the constant."""
        zs = np.arange(-500.0, 8001.0, 1000.0)
        heights = level_heights(zs, 0.0, 7000.0)

        def cube_mutate(wet, hydro):
            wet[:] = 42.5
            hydro[:] = 250.0

        out = run_modes(zs, heights, ('pack16', 'pack16_i16'),
                        cube_mutate=cube_mutate)
        (w_f, _), (w_q, _) = out['pack16'], out['pack16_i16']
        np.testing.assert_allclose(w_q, w_f, rtol=1e-6)


class TestBrickI16:
    """Quantized int16 BRICK table (round 4, experimental,
    RAIDER_TPU_BRICK_I16=1): same quantizer and sentinel as pack16_i16, but
    applied to the grouped brick table the production Pallas kernel
    consumes — halves the gather-output materialization and the kernel's
    HBM brick reads. Default off until the on-chip win is demonstrated;
    these tests pin the precision/NaN contract on all three kernel paths
    (traced plan, static XLA, static Pallas-interpret)."""

    ZS = -500.0 + 26500.0 * np.linspace(0.0, 1.0, 40) ** 1.4

    def _assert_close(self, out):
        (w_f, h_f), (w_q, h_q) = out['brick'], out['brick_i16']
        np.testing.assert_array_equal(np.isnan(w_f), np.isnan(w_q))
        ok = np.isfinite(w_f)
        assert ok.mean() > 0.7
        worst = max(np.abs(w_q[ok] - w_f[ok]).max(),
                    np.abs(h_q[ok] - h_f[ok]).max())
        assert worst < 1e-4, f'quantized delay off by {worst * 1e3:.4f} mm'

    def test_traced_plan(self):
        heights = level_heights(self.ZS, 0.0, 25000.0)
        self._assert_close(run_modes(self.ZS, heights,
                                     ('brick', 'brick_i16')))

    def test_static_plan_xla(self):
        heights = level_heights(self.ZS, 0.0, 25000.0)
        self._assert_close(run_modes(self.ZS, heights,
                                     ('brick', 'brick_i16'),
                                     static_plan=True))

    def test_static_plan_pallas_interpret(self, monkeypatch):
        # f32 cubes: the Pallas path runs under enable_x64(False) and takes
        # f32 tables only — exactly what production (TPU) feeds it
        monkeypatch.setenv('RAIDER_TPU_PALLAS_INTEGRATE', '1')
        heights = level_heights(self.ZS, 0.0, 25000.0)
        self._assert_close(run_modes(self.ZS, heights,
                                     ('brick', 'brick_i16'),
                                     static_plan=True,
                                     cube_dtype=np.float32))

    def test_static_plan_pallas_interpret_xla_transpose(self, monkeypatch):
        # RAIDER_TPU_PALLAS_KT=0: the XLA-side-transpose kernel form gets
        # the (width, tile_n) block and the pre-transposed (width, 2)
        # dequant table
        monkeypatch.setenv('RAIDER_TPU_PALLAS_INTEGRATE', '1')
        monkeypatch.setenv('RAIDER_TPU_PALLAS_KT', '0')
        heights = level_heights(self.ZS, 0.0, 25000.0)
        self._assert_close(run_modes(self.ZS, heights,
                                     ('brick', 'brick_i16'),
                                     static_plan=True,
                                     cube_dtype=np.float32))

    def test_nan_cells_poison_identically_static(self):
        heights = level_heights(self.ZS, 0.0, 25000.0)

        def cube_mutate(wet, hydro):
            wet[3:5, 4:7, 4:7] = np.nan

        out = run_modes(self.ZS, heights, ('brick', 'brick_i16'),
                        cube_mutate=cube_mutate, static_plan=True)
        (w_f, _), (w_q, _) = out['brick'], out['brick_i16']
        np.testing.assert_array_equal(np.isnan(w_f), np.isnan(w_q))
        assert np.isnan(w_f).any() and not np.isnan(w_f).all()

    def test_mode_gate(self, monkeypatch):
        shape = (50, 400, 400)
        assert pack_mode_for(shape, np.float32, grouped=True) == 'brick'
        monkeypatch.setenv('RAIDER_TPU_BRICK_I16', '1')
        assert pack_mode_for(shape, np.float32, grouped=True) == 'brick_i16'
        # the exact-f64 reference path never quantizes (small enough that
        # the f64 brick table fits its HBM budget, so bricks stay chosen)
        small = (40, 120, 120)
        assert pack_mode_for(small, np.float64, grouped=True) == 'brick'


class TestModeLadder:
    def test_ladder_thresholds(self):
        f32 = np.float32
        # small cube: plain pack16
        assert pack_mode_for((50, 400, 400), f32) == 'pack16'
        # full-CONUS HRRR (~95M cells): f32 pack16 is 6.1 GB > 3 GiB, the
        # i16 table is 3.05 GB <= 6 GiB -> quantized pack16 (was pack4)
        assert pack_mode_for((50, 1059, 1799), f32) == 'pack16_i16'
        # past the i16 limit: pack4 remains the floor
        huge = (100, 1800, 1800)   # 324M cells, i16 table 10.4 GB
        assert np.prod(huge) * 32 > _PACK16_I16_BYTE_LIMIT
        assert pack_mode_for(huge, f32) == 'pack4'
        # grouped: brick wins while its table fits, then the ladder applies
        assert pack_mode_for((50, 400, 400), f32, grouped=True) == 'brick'
        assert pack_mode_for((50, 1059, 1799), f32,
                             grouped=True) == 'pack16_i16'
        # f64 cubes are the exact-reference path (CPU hosts): they must
        # NEVER silently downgrade to the quantized f32 kernel — the same
        # big cube takes the exact PACK4 floor instead
        assert pack_mode_for((50, 1059, 1799), np.float64) == 'pack4'

    def test_limits_are_ordered(self):
        assert _PACK16_I16_BYTE_LIMIT >= _PACK16_BYTE_LIMIT


class TestEnginePath:
    def test_build_cube_ray_pack16_i16(self, monkeypatch):
        """pack16_i16 through the PRODUCTION engine (_build_cube_ray):
        mode selection in pack_cubes(grouped=True), the (table, deq) tuple
        riding the slice loop / replicate / result stream, and the final
        cube within the parity bound of the f32 pack16 engine run.

        The byte limits are monkeypatched to force the ladder on a small
        cube; the mode itself only triggers naturally past 3 GiB."""
        import datetime as dt
        import pathlib
        import sys

        sys.path.insert(0, str(pathlib.Path(__file__).parent))
        from test_raytrace import synthetic_orbit, synthetic_wm_dataset

        import raider_tpu.delay.raytrace as rt
        from raider_tpu.delay.engine import WeatherCube, _build_cube_ray
        from raider_tpu.geodesy.crs import Geographic
        from raider_tpu.geometry.los import Raytracing

        rng = np.random.default_rng(11)
        shape = (49, 13, 17)        # the synthetic LA dataset's grid
        wet_c = rng.uniform(0.1, 100.0, shape)
        hydro_c = rng.uniform(50.0, 300.0, shape)
        t = dt.datetime(2020, 1, 30, 13, 52, 45)
        los = Raytracing(orbit=synthetic_orbit(t), time=t)
        xpts = np.linspace(-118.4, -117.2, 8)
        ypts = np.linspace(33.2, 33.8, 7)
        zpts = np.array([0.0, 2000.0])

        def run():
            wm = WeatherCube(synthetic_wm_dataset(
                wet_cube=wet_c, hydro_cube=hydro_c))
            w, h = _build_cube_ray(wm, xpts, ypts, zpts, los, Geographic(),
                                   zref=25000.0, compute_dtype=np.float32)
            return np.asarray(w), np.asarray(h)

        # baseline: same non-brick quadrature, f32 table (isolates the
        # quantization delta from the brick-vs-packed plan delta)
        monkeypatch.setattr(rt, '_BRICK_SPECS', ((7, 3, 3, 6, 0),))
        assert rt.pack_mode_for(shape, np.float32, grouped=True) == 'pack16'
        w_f, h_f = run()

        monkeypatch.setattr(rt, '_PACK16_BYTE_LIMIT', 0)
        assert (rt.pack_mode_for(shape, np.float32, grouped=True)
                == 'pack16_i16')
        w_q, h_q = run()

        np.testing.assert_array_equal(np.isnan(w_f), np.isnan(w_q))
        ok = np.isfinite(w_f)
        assert ok.mean() > 0.9
        worst = max(np.abs(w_q[ok] - w_f[ok]).max(),
                    np.abs(h_q[ok] - h_f[ok]).max())
        assert worst < 1e-4, f'engine i16 delay off by {worst * 1e3:.4f} mm'


@pytest.mark.parametrize('seed', range(4))
def test_fuzz_i16_vs_f32(seed):
    """Random ladders / geometry: quantized always within 0.1 mm and NaN
    masks identical."""
    rng = np.random.default_rng(300 + seed)
    nz = int(rng.integers(8, 40))
    steps = rng.uniform(30.0, 2500.0, nz - 1)
    zs = np.concatenate([[rng.uniform(-600, -100)], np.cumsum(steps)])
    ht = float(rng.uniform(zs[0] - 200.0, zs[min(3, nz - 2)]))
    zref = float(rng.uniform(zs[max(2, nz // 2)], zs[-1] + 500.0))
    heights = level_heights(zs, ht, zref)
    if heights is None or heights.size < 3:
        pytest.skip('degenerate chain')
    out = run_modes(zs, heights, ('pack16', 'pack16_i16'),
                    n_rays=97, seed=seed)
    (w_f, h_f), (w_q, h_q) = out['pack16'], out['pack16_i16']
    assert (np.isnan(w_f) == np.isnan(w_q)).all()
    both = np.isfinite(w_f) & np.isfinite(w_q)
    if both.any():
        assert np.abs(w_q[both] - w_f[both]).max() < 1e-4
        assert np.abs(h_q[both] - h_f[both]).max() < 1e-4


def test_pack_mode_brick_capacity_band(monkeypatch):
    """Round-5 on-chip decision (VERDICT r4 item 2): f32 brick stays the
    default where it fits (i16 measured SLOWER there: 127.5 vs 119.2 ms on
    v5e); brick_i16 auto-selects only in the capacity band where the f32
    table is over budget but the half-size i16 one fits (measured 6.4x
    over the pack16 fallback: 0.131 vs 0.839 s, 20.5M cells, 1M rays,
    max dev 0.019 mm)."""
    import numpy as np

    from raider_tpu.delay import raytrace as rt

    small = (50, 400, 400)      # 8.0M cells: f32 brick table 4.0 GB fits
    band = (50, 640, 640)       # 20.5M cells: f32 10.5 GB out, i16 5.2 GB in
    huge = (50, 1059, 1799)     # 95.2M cells: no brick table fits
    monkeypatch.delenv('RAIDER_TPU_BRICK_I16', raising=False)
    assert rt.pack_mode_for(small, np.float32, grouped=True) == 'brick'
    assert rt.pack_mode_for(band, np.float32, grouped=True) == 'brick_i16'
    assert rt.pack_mode_for(huge, np.float32, grouped=True) == 'pack16_i16'
    # f64 cubes are the exact-reference path: never quantized
    assert rt.pack_mode_for(band, np.float64, grouped=True) == 'pack16'
    # =0 opts out of every quantized mode ladder rung that needs the flag
    monkeypatch.setenv('RAIDER_TPU_BRICK_I16', '0')
    assert rt.pack_mode_for(band, np.float32, grouped=True) == 'pack16'
    # =1 forces i16 even where f32 fits (re-ablation hook)
    monkeypatch.setenv('RAIDER_TPU_BRICK_I16', '1')
    assert rt.pack_mode_for(small, np.float32, grouped=True) == 'brick_i16'


def test_brick_i16_capacity_band_spec_consistency():
    """pack_cubes and integrate_rays derive the brick spec from the int16
    TABLE dtype for brick_i16, so a capacity-band cube packs and integrates
    with one agreed layout (f32-derived specs would disagree: the f32
    lookup returns None there)."""
    import numpy as np

    from raider_tpu.delay import raytrace as rt

    band = (50, 640, 640)
    assert rt._brick_spec_for(band, np.float32) is None
    spec = rt._brick_spec_for(band, np.int16)
    assert spec == rt._BRICK_SPECS[-1][:4]


def test_build_cube_ray_brick_i16_capacity_band(monkeypatch):
    """brick_i16 through the PRODUCTION engine (_build_cube_ray) in the
    capacity band: the brick byte limit is monkeypatched so the f32 table
    is over budget while the i16 one fits (the band only triggers
    naturally past ~12.6M cells), exercising auto mode selection, the
    (table, deq) tuple riding the slice loop, and cube parity vs the f32
    brick engine run."""
    import datetime as dt
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_raytrace import synthetic_orbit, synthetic_wm_dataset

    import raider_tpu.delay.raytrace as rt
    from raider_tpu.delay.engine import WeatherCube, _build_cube_ray
    from raider_tpu.geodesy.crs import Geographic
    from raider_tpu.geometry.los import Raytracing

    rng = np.random.default_rng(13)
    shape = (49, 13, 17)            # 10829 cells: f32 5.5 MB, i16 2.8 MB
    wet_c = rng.uniform(0.1, 100.0, shape)
    hydro_c = rng.uniform(50.0, 300.0, shape)
    t = dt.datetime(2020, 1, 30, 13, 52, 45)
    wm = WeatherCube(synthetic_wm_dataset(wet_cube=wet_c,
                                          hydro_cube=hydro_c))
    los = Raytracing(orbit=synthetic_orbit(t), time=t)
    xpts = np.linspace(-118.4, -117.2, 8)
    ypts = np.linspace(33.2, 33.8, 6)
    hts = np.array([0.0, 4000.0])

    def run():
        return _build_cube_ray(wm, xpts, ypts, hts, los, Geographic(),
                               zref=25000.0, compute_dtype=np.float32)

    monkeypatch.delenv('RAIDER_TPU_BRICK_I16', raising=False)
    w_f, h_f = run()                            # f32 brick (limit default)

    limit = 4 * 1024 * 1024                     # between i16 and f32 table
    monkeypatch.setattr(rt, '_BRICK_SPECS', ((7, 3, 3, 6, limit),))
    assert rt.pack_mode_for(shape, np.float32, grouped=True) == 'brick_i16'
    w_q, h_q = run()                            # auto-selected brick_i16

    w_f, h_f = np.asarray(w_f), np.asarray(h_f)
    w_q, h_q = np.asarray(w_q), np.asarray(h_q)
    assert np.array_equal(np.isnan(w_f), np.isnan(w_q))
    m = ~np.isnan(w_f)
    assert np.abs(w_q[m] - w_f[m]).max() < 1e-4     # < 0.1 mm
    assert np.abs(h_q[m] - h_f[m]).max() < 1e-4
