"""Vertical integration kernels for zenith total delay (ZTD).

Replaces the reference's per-level ``np.trapz`` loop (reference:
tools/RAiDER/models/weatherModel.py:389-403) with a single reversed
cumulative-sum formulation: one pass over the cube instead of O(nz) passes,
and expressible as a jit-compiled op on device.
"""

import jax
import jax.numpy as jnp


@jax.jit
def cumtrapz_from_top(values, zs, scale=1e-6):
    """Integral of ``values`` dz from each level to the top, times ``scale``.

    Args:
        values: (..., nz) refractivity profiles (z ascending along last axis).
        zs:     (nz,) or broadcastable sample heights.
        scale:  multiplier (1e-6 converts N-units to delay in meters).

    Returns:
        (..., nz) array: out[..., k] = scale * trapz(values[..., k:], zs[k:]).
        Matches the reference loop exactly (same trapezoid rule).
    """
    values = jnp.asarray(values)
    zs = jnp.asarray(zs)
    dz = jnp.diff(zs, axis=-1)
    seg = 0.5 * (values[..., 1:] + values[..., :-1]) * dz
    # reversed cumulative sum: total from level k to top
    rev = jnp.cumsum(seg[..., ::-1], axis=-1)[..., ::-1]
    out = jnp.concatenate([rev, jnp.zeros_like(values[..., :1])], axis=-1)
    return scale * out
