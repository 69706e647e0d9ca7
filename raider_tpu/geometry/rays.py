"""Ray construction: intersections of look rays with weather-model levels.

Vectorized JAX equivalents of the reference's per-level Python loop
(reference: tools/RAiDER/losreader.py:706-835): every pixel's ray is
intersected with every contributing model level in one batched Newton solve
on the host CPU backend (f64), producing the per-level segment endpoints the
TPU integration kernel consumes.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from raider_tpu.constants import _ZREF
from raider_tpu.geodesy.ellipsoid import ecef2lla
from raider_tpu.utils.jaxutils import host_jit


@host_jit(static_argnames=('max_iter',))
def _toa_newton(xyz, look_vecs, toaheight, factor, max_iter: int):
    pos = xyz + toaheight * look_vecs
    for _ in range(max_iter):
        llh_h = ecef2lla(pos[..., 0], pos[..., 1], pos[..., 2])[2]
        pos = pos + look_vecs * ((toaheight - llh_h) / factor)[..., None]
    return pos


@host_jit(static_argnames=('max_iter',))
def _toa_newton_batch(xyz, look_vecs, heights, factor, max_iter: int):
    """Intersections with MANY height levels in one compiled program.

    heights: (L,) -> returns (L, ..., 3). vmap over levels collapses L host
    dispatches into one and lets XLA share the per-pixel work.
    """
    import jax

    def body(h):
        pos = xyz + h * look_vecs
        for _ in range(max_iter):
            llh_h = ecef2lla(pos[..., 0], pos[..., 1], pos[..., 2])[2]
            pos = pos + look_vecs * ((h - llh_h) / factor)[..., None]
        return pos

    return jax.vmap(body)(heights)


def get_top_of_atmosphere(xyz, look_vecs, toaheight, factor=None):
    """Intersection of rays with the ellipsoidal height level ``toaheight``.

    Newton-Raphson in ECEF; with a cos(incidence) ``factor`` 3 iterations
    suffice, otherwise 10 (reference: losreader.py:706-733).
    """
    xyz = jnp.asarray(xyz, dtype=jnp.float64)
    look_vecs = jnp.asarray(look_vecs, dtype=jnp.float64)
    if factor is not None:
        return _toa_newton(xyz, look_vecs, jnp.float64(toaheight), jnp.asarray(factor, jnp.float64), 3)
    ones = jnp.ones(xyz.shape[:-1], dtype=jnp.float64)
    return _toa_newton(xyz, look_vecs, jnp.float64(toaheight), ones, 10)


def level_heights(model_zs, ht: float, max_tropo_height: float = float(_ZREF)) -> Optional[np.ndarray]:
    """The chain of clamped level heights a ray starting at ``ht`` crosses.

    Host-side (static) computation reproducing the reference's per-level
    clamping rules (losreader.py:772-835):
      * the topmost model level is nudged down by 0.01 m
      * levels entirely below ``ht`` or above ``max_tropo_height`` drop out
      * interval ends clamp to [ht, max_tropo_height]
      * intervals thinner than 1 m drop out

    Returns an (L+1,) ascending array of unique interval boundary heights, or
    None if no level contributes.
    """
    model_zs = np.asarray(model_zs, dtype=np.float64)
    bounds = []
    for zz in range(model_zs.size - 1):
        low_ht = model_zs[zz]
        high_ht = model_zs[zz + 1]
        if high_ht == model_zs[-1]:
            high_ht = high_ht - 0.01
        if (high_ht < ht) or (low_ht >= max_tropo_height):
            continue
        if low_ht < ht:
            low_ht = ht
        if high_ht > max_tropo_height:
            high_ht = max_tropo_height
        if abs(high_ht - low_ht) < 1.0:
            continue
        bounds.append((float(low_ht), float(high_ht)))
    if not bounds:
        return None
    # The chain is [first interval's low, then every interval's high]: the
    # reference reuses the previous interval's upper intersection as the next
    # lower endpoint even across skipped (<1 m) intervals
    # (losreader.py:811-815), so later lows never get their own intersection.
    heights = [bounds[0][0]] + [hi for _, hi in bounds]
    return np.asarray(heights, dtype=np.float64)


def clip_chain(model_zs, ht: float, max_tropo_height: float = float(_ZREF),
               nudge_top: bool = True) -> Optional[np.ndarray]:
    """Full-length clamped boundary chain: entry k is model level k clipped
    into [ht, max_tropo_height] (topmost level nudged down 0.01 m like the
    reference, losreader.py:788).

    Unlike :func:`level_heights`, the chain always has ``len(model_zs)``
    entries: levels entirely below ``ht`` or above the integration top become
    zero-length (equal boundaries) and integrate to exactly zero. Level k
    therefore always corresponds to model cell k for EVERY output height
    slice, which is what lets the delay engine build ONE cube-global static
    sampling plan (see raytrace.static_plan_from) instead of one per slice.

    The reference's <1 m drop rule (losreader.py:807-809: any clamped
    interval thinner than 1 m is excluded from the integral) is reproduced
    for EVERY cell, not just the clamped bottom/top: a skipped cell's upper
    boundary collapses onto the last kept boundary, so the cell integrates
    to zero and — exactly like the reference's carried ``low_xyz``
    (losreader.py:811-815) — the NEXT kept cell's segment absorbs the
    skipped span. Cells before the first kept one collapse UP onto its
    clamped lower bound (the reference starts a fresh intersection there,
    no absorption).

    Returns None when no level contributes.
    """
    z = np.asarray(model_zs, dtype=np.float64).copy()
    if nudge_top:
        # only when the chain includes the true topmost model level (a
        # caller passing a trimmed span disables it, losreader.py:788)
        z[-1] -= 0.01
    c = np.clip(z, ht, max_tropo_height)
    # per-cell skip decision on the cell's OWN clamped span, like the
    # reference's low_ht/high_ht test (independent of carried boundaries)
    keep = np.diff(c) >= 1.0
    if not keep.any():
        return None
    first = int(np.argmax(keep))
    b = np.empty_like(c)
    b[:first + 1] = c[first]
    carry = c[first]
    for k in range(first, c.size - 1):
        if keep[k]:
            carry = c[k + 1]
        b[k + 1] = carry
    return b


def build_ray(model_zs, ht: float, xyz, look_vecs,
              max_tropo_height: float = float(_ZREF)) -> Tuple:
    """Per-level ray segment lengths and ECEF endpoints for all pixels.

    Vectorized equivalent of reference build_ray (losreader.py:772-835):
    the first two boundary intersections run the full 10-iteration Newton,
    the cos-factor speedup covers the rest, matching reference numerics.

    Args:
        model_zs:  (nz,) ascending model level heights
        ht:        output level height (scalar)
        xyz:       (..., 3) pixel ECEF positions at height ``ht``
        look_vecs: (..., 3) unit look vectors (ground -> sensor, ECEF)

    Returns:
        (ray_lengths (L, ...), low_xyzs (L, ..., 3), high_xyzs (L, ..., 3))
        or (None, None, None) when nothing contributes.
    """
    heights = level_heights(model_zs, ht, max_tropo_height)
    if heights is None:
        return None, None, None

    xyz = np.asarray(xyz, dtype=np.float64)
    look = np.asarray(look_vecs, dtype=np.float64)

    # phase 1: the first two boundary heights at full 10-iteration Newton
    # (no cos factor yet), in one compiled call
    ones = jnp.ones(xyz.shape[:-1], dtype=jnp.float64)
    p01 = np.asarray(_toa_newton_batch(
        jnp.asarray(xyz), jnp.asarray(look),
        jnp.asarray(heights[:2]), ones, 10,
    ))
    p0, p1 = p01[0], p01[1]
    seg0 = np.linalg.norm(p1 - p0, axis=-1)
    with np.errstate(invalid='ignore', divide='ignore'):
        cos_factor = (heights[1] - heights[0]) / seg0

    # phase 2: every remaining height with the 3-iteration cos-factor
    # speedup, in one compiled call (the reference dispatches per level)
    if heights.size > 2:
        rest = np.asarray(_toa_newton_batch(
            jnp.asarray(xyz), jnp.asarray(look),
            jnp.asarray(heights[2:]), jnp.asarray(cos_factor), 3,
        ))
        pts = np.concatenate([p01, rest], axis=0)  # (L+1, ..., 3)
    else:
        pts = p01

    low_xyzs = pts[:-1]
    high_xyzs = pts[1:]
    ray_lengths = np.linalg.norm(high_xyzs - low_xyzs, axis=-1)
    return ray_lengths, low_xyzs, high_xyzs
