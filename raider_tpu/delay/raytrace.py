"""Fused raytracing integration kernel.

The reference integrates rays with a triple Python loop - per model level,
per segment fraction, per interpolator - calling scipy's gather-based
interpolator each time (reference: tools/RAiDER/delay.py:286-323). Here the
whole sampling plan (every contributing model level x segment fraction) is
flattened into one batched device computation: generate sample coordinates,
trilinearly interpolate both refractivity cubes, and accumulate trapezoid
weights, in a single jit-compiled program over millions of rays.

Coordinate precision: ray segment ENDPOINTS are computed exactly (f64, host
CPU) in model CRS; interior sample coordinates are linear interpolation in
model space plus an analytic chord-sagitta height correction,

    h(f) = lerp(h0, h1, f) - f (1-f) D^2 / (2 (Re + h))

with D^2 the squared horizontal chord length. This reproduces the reference's
ECEF-lerp-then-reproject sample heights to O(D^4 / R^3) (< 0.1 mm for 5 km
segments) without needing f64 transforms per sample on device.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from raider_tpu.constants import MAX_SEGMENT_LENGTH
from raider_tpu.ops.interp import _interp3d_points_impl


def build_sampling_plan(ray_lengths_max: np.ndarray,
                        max_segment_length: float = MAX_SEGMENT_LENGTH):
    """Static per-level sampling plan from max ray lengths.

    Mirrors the reference's nParts rule (delay.py:283): per level,
    nparts = ceil(max_len / MAX_SEGMENT_LENGTH) + 1 samples at
    linspace(0, 1, nparts), trapezoid end-weights 0.5.

    Returns (level_idx (S,), fracs (S,), end_factor (S,), inv_nm1 (S,)):
    flattened over levels; weight of sample s for pixel p is
    end_factor[s] * ray_len[level_idx[s], p] * 1e-6 * inv_nm1[s].
    """
    n_parts = np.ceil(np.asarray(ray_lengths_max) / max_segment_length).astype(int) + 1
    level_idx, fracs, end_factor, inv_nm1 = [], [], [], []
    for zz, nparts in enumerate(n_parts):
        ff = np.linspace(0.0, 1.0, num=nparts)
        level_idx.append(np.full(nparts, zz, dtype=np.int32))
        fracs.append(ff)
        w = np.ones(nparts)
        w[0] = 0.5
        w[-1] = 0.5
        end_factor.append(w)
        inv_nm1.append(np.full(nparts, 1.0 / (nparts - 1.0)))
    return (
        np.concatenate(level_idx),
        np.concatenate(fracs),
        np.concatenate(end_factor),
        np.concatenate(inv_nm1),
    )


@partial(jax.jit, static_argnames=('ys', 'xs', 'zs', 'z_clip'))
def _integrate_level_samples(
    cube_wet, cube_hydro,       # (nz, ny, nx) refractivity cubes
    low_y, low_x, low_z,        # (L, N) segment lower endpoints, model CRS
    high_y, high_x, high_z,     # (L, N) segment upper endpoints
    d2,                         # (L, N) squared horizontal chord length
    ray_len,                    # (L, N) segment lengths [m]
    re_local,                   # (N,) local earth radius [m]
    level_idx, fracs, end_factor, inv_nm1,  # (S,) sampling plan
    ys, xs, zs,                 # static grid axes
    z_clip,                     # static bool: clip sample z into grid range
):
    compute_dtype = cube_wet.dtype

    def sample_one(lvl, ff, wfac, inv):
        ly = jnp.take(low_y, lvl, axis=0)
        lx = jnp.take(low_x, lvl, axis=0)
        lz = jnp.take(low_z, lvl, axis=0)
        hy = jnp.take(high_y, lvl, axis=0)
        hx = jnp.take(high_x, lvl, axis=0)
        hz = jnp.take(high_z, lvl, axis=0)
        dd2 = jnp.take(d2, lvl, axis=0)
        rl = jnp.take(ray_len, lvl, axis=0)

        py = ly + ff * (hy - ly)
        px = lx + ff * (hx - lx)
        pz = lz + ff * (hz - lz)
        # chord sagitta: straight ECEF segments dip below the lerped height
        hbar = 0.5 * (lz + hz)
        pz = pz - ff * (1.0 - ff) * dd2 / (2.0 * (re_local + hbar))
        if z_clip:
            pz = jnp.clip(pz, zs[0], zs[-1])

        wt = (wfac * 1.0e-6 * inv) * rl
        vw = _interp3d_points_impl(cube_wet, py, px, pz, ys, xs, zs)
        vh = _interp3d_points_impl(cube_hydro, py, px, pz, ys, xs, zs)
        return (wt * vw).astype(compute_dtype), (wt * vh).astype(compute_dtype)

    def body(carry, plan_s):
        acc_w, acc_h = carry
        lvl, ff, wfac, inv = plan_s
        dw, dh = sample_one(lvl, ff, wfac, inv)
        return (acc_w + dw, acc_h + dh), None

    n = low_y.shape[1]
    init = (jnp.zeros(n, compute_dtype), jnp.zeros(n, compute_dtype))
    plan = (
        jnp.asarray(level_idx, jnp.int32),
        jnp.asarray(fracs, compute_dtype),
        jnp.asarray(end_factor, compute_dtype),
        jnp.asarray(inv_nm1, compute_dtype),
    )
    (wet, hydro), _ = jax.lax.scan(body, init, plan)
    return wet, hydro


def integrate_rays(
    cube_wet, cube_hydro, ys, xs, zs,
    low_yxz, high_yxz, d2, ray_len, re_local,
    ray_lengths_max,
    max_segment_length: float = MAX_SEGMENT_LENGTH,
    z_clip: bool = True,
):
    """Integrate wet/hydro delay along all rays for one output height slice.

    Args:
        cube_wet/hydro: (nz, ny, nx) pointwise refractivity cubes.
        ys, xs, zs:     grid axes (numpy, ascending).
        low_yxz/high_yxz: (L, N, 3) segment endpoints in model CRS (y, x, z).
        d2:             (L, N) squared horizontal chord lengths [m^2].
        ray_len:        (L, N) segment lengths [m].
        re_local:       (N,) local earth radii for the sagitta correction.
        ray_lengths_max: (L,) per-level max segment length (sets nParts).

    Returns:
        (wet_delay (N,), hydro_delay (N,)) in meters.
    """
    plan = build_sampling_plan(ray_lengths_max, max_segment_length)
    dtype = cube_wet.dtype
    args = [
        jnp.asarray(cube_wet), jnp.asarray(cube_hydro),
        jnp.asarray(low_yxz[..., 0], dtype), jnp.asarray(low_yxz[..., 1], dtype),
        jnp.asarray(low_yxz[..., 2], dtype),
        jnp.asarray(high_yxz[..., 0], dtype), jnp.asarray(high_yxz[..., 1], dtype),
        jnp.asarray(high_yxz[..., 2], dtype),
        jnp.asarray(d2, dtype), jnp.asarray(ray_len, dtype),
        jnp.asarray(re_local, dtype),
    ]
    return _integrate_level_samples(
        *args, *plan,
        ys=tuple(np.asarray(ys).tolist()),
        xs=tuple(np.asarray(xs).tolist()),
        zs=tuple(np.asarray(zs).tolist()),
        z_clip=z_clip,
    )
