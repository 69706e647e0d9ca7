"""Fused refractivity + per-node ZTD integration as a Pallas TPU kernel.

The reference computes wet/hydro refractivity cubes, then per-level
cumulative ``np.trapz`` in a Python loop (reference: weatherModel.py:355-361,
389-403). The XLA path (`wx.base._getZTD` via `ops.integrate`) already fuses
this into a few device ops; this module goes one step further and expresses
the whole thing as ONE Pallas kernel: each (y, x) tile streams through VMEM
once, computing

    wet_N   = k2 e / T + k3 e / T^2
    hydro_N = k1 p / T
    total[k] = 1e-6 * sum_{j >= k} 0.5 (N[j] + N[j+1]) dz[j]

top-down in an on-chip scan - the e/T/p cubes are read from HBM exactly
once and the four derived cubes are written exactly once.

`wx.base._get_ztd` runs this kernel as the PRODUCTION path on TPU backends
(XLA composition as fallback, RAIDER_TPU_PALLAS_ZTD=0 to force it);
`ztd_totals(..., interpret=True)` runs the same kernel on CPU (tests).
On-TPU equivalence vs the XLA composition is checked by
scripts/pallas_check.py (part of the verify drive).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _kernel(dz_ref, t_ref, p_ref, e_ref, wet_ref, hyd_ref, *, k1, k2, k3, nz):
    """Top-down scan: one refractivity evaluation per level, upper level's
    refractivity carried (Mosaic supports dynamic ref loads but not dynamic
    slicing of computed values)."""
    import jax.experimental.pallas as pl

    def refr(k):
        t_k = t_ref[pl.ds(k, 1)]
        p_k = p_ref[pl.ds(k, 1)]
        e_k = e_ref[pl.ds(k, 1)]
        return (k2 * e_k / t_k + k3 * e_k / (t_k * t_k)), (k1 * p_k / t_k)

    n_w_up, n_h_up = refr(nz - 1)
    zero = jnp.zeros_like(n_w_up)
    wet_ref[pl.ds(nz - 1, 1)] = zero
    hyd_ref[pl.ds(nz - 1, 1)] = zero

    def body(i, carry):
        acc_w, acc_h, n_w_up, n_h_up = carry
        # keep index math in i32: this package enables x64, so fori_loop
        # counters are i64, which Mosaic's lowering cannot convert
        k = jnp.int32(nz - 2) - i.astype(jnp.int32)
        n_w, n_h = refr(k)
        dz = dz_ref[k] * 0.5e-6
        acc_w = acc_w + (n_w + n_w_up) * dz
        acc_h = acc_h + (n_h + n_h_up) * dz
        wet_ref[pl.ds(k, 1)] = acc_w
        hyd_ref[pl.ds(k, 1)] = acc_h
        return acc_w, acc_h, n_w, n_h

    jax.lax.fori_loop(0, nz - 1, body, (zero, zero, n_w_up, n_h_up))


@partial(jax.jit, static_argnames=('k1', 'k2', 'k3', 'interpret'))
def ztd_totals(t, p, e, zs, k1: float, k2: float, k3: float,
               interpret: bool = False):
    """Per-node cumulative zenith delays from (z, y, x) cubes.

    Returns (wet_total, hydro_total), both (z, y, x), matching
    ``1e-6 * cumtrapz_from_top(refractivity)`` to float32 rounding.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nz, ny, nx = t.shape
    by = min(8, ny)
    bx = min(128, nx)
    dz = (zs[1:] - zs[:-1]).astype(t.dtype)

    grid = (pl.cdiv(ny, by), pl.cdiv(nx, bx))
    tile = pl.BlockSpec((nz, by, bx), lambda i, j: (0, i, j),
                        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nz, ny, nx), t.dtype)
    # trace the kernel with x64 OFF: the package enables x64 globally, and
    # stray 64-bit scalars send Mosaic's convert_element_type lowering into
    # infinite recursion
    with jax.enable_x64(False):
        wet, hyd = pl.pallas_call(
            partial(_kernel, k1=k1, k2=k2, k3=k3, nz=nz),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # dz, shared by all tiles
                tile, tile, tile,
            ],
            out_specs=(tile, tile),
            out_shape=(out_shape, out_shape),
            interpret=interpret,
        )(dz, t, p, e)
    return wet, hyd
