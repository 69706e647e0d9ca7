"""Device compute primitives: interpolation, integration."""

from raider_tpu.ops.interp import (  # noqa: F401
    interp_along_axis,
    interp3d_points,
    grid_weights,
    interp3d_separable,
)
from raider_tpu.ops.integrate import cumtrapz_from_top  # noqa: F401
