"""JAX-native geodesy: WGS84 transforms, map projections, gravity models.

Replaces the reference's use of pyproj (reference: tools/RAiDER/utilFcns.py:77-138)
with closed-form, jit-compilable functions so the entire delay pipeline can run
on-device.
"""

from raider_tpu.geodesy.ellipsoid import (  # noqa: F401
    ecef2enu,
    ecef2lla,
    enu2ecef,
    lla2ecef,
)
from raider_tpu.geodesy.gravity import geo_to_ht, get_g_ll, get_Re  # noqa: F401
from raider_tpu.geodesy.crs import (  # noqa: F401
    CRS,
    Geocentric,
    Geographic,
    LambertConformalConic,
    PolarStereographic,
    TransverseMercator,
    crs_from_cf,
    crs_from_epsg,
    crs_from_user,
    transform_points,
)
