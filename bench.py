"""Benchmark: 1M-point zenith-total-delay query on an HRRR-sized cube.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (README Citation is TODO; see
BASELINE.md), so vs_baseline is measured against the driver-defined target of
a 1M-point query in <= 1 s (BASELINE.json): vs_baseline = target_time /
measured_time (>1 means faster than target).
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    import raider_tpu  # noqa: F401  (enables x64; kernels pick f32 explicitly)
    from raider_tpu.ops.integrate import cumtrapz_from_top
    from raider_tpu.ops.interp import grid_weights, interp3d_separable

    # HRRR-like CONUS crop: 50 levels x 400 x 400 (3 km grid)
    nz, ny, nx = 50, 400, 400
    rng = np.random.default_rng(0)
    dtype = np.float32
    wet = rng.uniform(0.1, 100.0, (nz, ny, nx)).astype(dtype)
    hydro = rng.uniform(50.0, 300.0, (nz, ny, nx)).astype(dtype)
    # HRRR-like stretched vertical spacing: dense near ground, coarse aloft
    zs = -500.0 + 25500.0 * np.linspace(0.0, 1.0, nz) ** 1.5
    ys = np.linspace(0, 1200e3, ny)
    xs = np.linspace(0, 1200e3, nx)

    # 1M-point output: 10 heights x 320 x 320 query grid (= 1.024 Mpts)
    qz, qy, qx = 10, 320, 320
    w_z = grid_weights(zs, np.linspace(0, 9000, qz)).astype(dtype)
    w_y = grid_weights(ys, np.linspace(50e3, 1150e3, qy)).astype(dtype)
    w_x = grid_weights(xs, np.linspace(50e3, 1150e3, qx)).astype(dtype)

    @jax.jit
    def ztd_query(wet, hydro, zs, w_z, w_y, w_x):
        wet_total = jnp.moveaxis(cumtrapz_from_top(jnp.moveaxis(wet, 0, -1), zs), -1, 0)
        hydro_total = jnp.moveaxis(cumtrapz_from_top(jnp.moveaxis(hydro, 0, -1), zs), -1, 0)
        return (interp3d_separable(wet_total, w_z, w_y, w_x),
                interp3d_separable(hydro_total, w_z, w_y, w_x))

    args = [jnp.asarray(a) for a in (wet, hydro, zs.astype(dtype), w_z, w_y, w_x)]
    out = ztd_query(*args)
    jax.block_until_ready(out)

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = ztd_query(*args)
    jax.block_until_ready(out)
    elapsed = (time.perf_counter() - t0) / n_iter

    npts = qz * qy * qx
    mpts_per_s = npts / elapsed / 1e6
    target_time = 1.0  # driver target: 1M-point query in <= 1 s
    print(json.dumps({
        'metric': 'ztd_1Mpt_hrrr_query',
        'value': round(mpts_per_s, 3),
        'unit': 'Mpts/s',
        'vs_baseline': round((npts / 1e6) * target_time / elapsed, 3),
    }))


if __name__ == '__main__':
    main()
