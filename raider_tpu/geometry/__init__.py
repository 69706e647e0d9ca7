"""Query geometry: areas of interest (AOI) and lines of sight (LOS)."""

from raider_tpu.geometry.aoi import (  # noqa: F401
    AOI,
    BoundingBox,
    Geocube,
    GeocodedFile,
    RasterRDR,
    StationFile,
)
from raider_tpu.geometry.los import LOS, Conventional, Raytracing, Zenith  # noqa: F401
