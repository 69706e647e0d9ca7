"""Latitude-dependent gravity / Earth-radius models and geopotential heights.

Capability parity with reference: tools/RAiDER/utilFcns.py:351-410
(_get_g_ll, get_Re, geo_to_ht). Implemented with jnp so they can run inside
jitted weather-model preprocessing.
"""

import jax.numpy as jnp

from raider_tpu.constants import R_EARTH_MAX_WGS84 as _RMAX
from raider_tpu.constants import R_EARTH_MIN_WGS84 as _RMIN
from raider_tpu.constants import _g0, _g1
from raider_tpu.utils.jaxutils import host_eager


@host_eager
def get_g_ll(lats):
    """Variation of gravity with latitude [deg] (Somigliana-style series)."""
    c2 = jnp.cos(2.0 * jnp.deg2rad(lats))
    return _g1 * (1.0 - 0.002637 * c2 + 0.0000059 * c2**2)


@host_eager
def get_Re(lats):
    """WGS84 Earth radius as a function of geodetic latitude [deg]."""
    coslat = jnp.cos(jnp.deg2rad(lats))
    sinlat = jnp.sin(jnp.deg2rad(lats))
    return jnp.sqrt(1.0 / (coslat**2 / _RMAX**2 + sinlat**2 / _RMIN**2))


@host_eager
def geo_to_ht(lats, hts):
    """Convert geopotential height to (approximate) WGS84 ellipsoidal height.

    h = (hts * Re) / (g(lat)/g0 * Re - hts)   (reference: utilFcns.py:378-410)
    """
    g_ll = get_g_ll(lats)
    re = get_Re(lats)
    return (hts * re) / (g_ll / _g0 * re - hts)
