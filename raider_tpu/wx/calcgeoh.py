"""ECMWF hydrostatic model-level integration.

Computes pressure, geopotential, and geopotential height on model levels
from log-surface-pressure plus the A/B half-level coefficients (capability
parity: tools/RAiDER/utilFcns.py:781-859). Implemented as a vectorized
bottom-up scan over levels.
"""

from typing import Tuple

import numpy as np

from raider_tpu.constants import _g0


def calcgeoh(lnsp, t, q, z, a, b, R_d, num_levels) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Integrate the hydrostatic equation up model levels.

    Args:
        lnsp: (y, x) log surface pressure
        t, q: (z, y, x) temperature [K] and specific humidity, level 0 = top
        z:    (y, x) or scalar surface geopotential
        a, b: (nz+1,) half-level pressure coefficients
        R_d:  dry-air gas constant
        num_levels: number of full model levels

    Returns:
        (geopotential, pressure, geopotential height), each (z, y, x).
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    t = np.asarray(t, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    if len(a) != num_levels + 1 or len(b) != num_levels + 1:
        raise ValueError(
            f'Model has {num_levels} levels but a/b have lengths {len(a)}/{len(b)} '
            '(they must be num_levels + 1).'
        )

    sp = np.exp(np.asarray(lnsp, dtype=np.float64))

    # virtual ("moist") temperature on all levels
    t_v = t * (1 + 0.609133 * q)

    # half-level pressures for levels 1..num_levels (index lev-1 .. lev)
    # Ph[k] = a[k] + b[k] * sp, k = 0..num_levels
    ph = a[:, None, None] + b[:, None, None] * sp[None, :, :]

    geopotential = np.zeros_like(t)
    pressurelvs = np.zeros_like(t)
    geoheight = np.zeros_like(t)

    z_h = 0.0  # geopotential of the lower half level, integrated upward
    for lev in range(num_levels, 0, -1):
        ilevel = lev - 1
        ph_lev = ph[lev - 1]
        ph_levplusone = ph[lev]
        pressurelvs[ilevel] = ph_lev

        if lev == 1:
            dlogp = np.log(ph_levplusone / 0.1)
            alpha = np.log(2)
        else:
            dlogp = np.log(ph_levplusone) - np.log(ph_lev)
            alpha = 1 - (ph_lev / (ph_levplusone - ph_lev)) * dlogp

        trd = t_v[ilevel] * R_d
        geopotential[ilevel] = z_h + trd * alpha + z
        geoheight[ilevel] = geopotential[ilevel] / _g0
        z_h = z_h + trd * dlogp

    return geopotential, pressurelvs, geoheight
