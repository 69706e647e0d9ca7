"""Line-of-sight abstractions: Zenith, Conventional (projected), Raytracing.

Capability parity with the reference LOS classes (reference:
tools/RAiDER/losreader.py:32-299). The Raytracing look-vector computation is
a single batched geo2rdr solve instead of the reference's per-pixel ISCE3
double loop (losreader.py:230-254).
"""

from typing import Optional

import numpy as np

from raider_tpu.geometry.orbit import Orbit, geo2rdr, get_orbit, state_to_los_factor


def sind(x):
    return np.sin(np.radians(x))


def cosd(x):
    return np.cos(np.radians(x))


class LOS:
    """Base class for handling look vectors (reference: losreader.py:32-72)."""

    def __init__(self) -> None:
        self._lats, self._lons, self._heights = None, None, None
        self._look_vecs = None
        self._ray_trace = False
        self._is_zenith = False
        self._is_projected = False
        self._time = None

    def setPoints(self, lats, lons=None, heights=None) -> None:
        if lats is None and self._lats is None:
            raise RuntimeError("You haven't given any point locations yet")
        if lons is None:
            llh = lats
            self._lats = llh[..., 0]
            self._lons = llh[..., 1]
            self._heights = llh[..., 2]
        elif heights is None:
            self._lats = lats
            self._lons = lons
            self._heights = np.zeros((len(lats), 1))
        else:
            self._lats = lats
            self._lons = lons
            self._heights = heights

    def setTime(self, datetime) -> None:
        self._time = datetime

    def is_Zenith(self) -> bool:
        return self._is_zenith

    def is_Projected(self) -> bool:
        return self._is_projected

    def ray_trace(self) -> bool:
        return self._ray_trace


class Zenith(LOS):
    """Zenith delays: look vectors are ellipsoid normals
    (reference: losreader.py:75-91)."""

    def __init__(self) -> None:
        super().__init__()
        self._is_zenith = True

    def setLookVectors(self) -> None:
        from raider_tpu.geodesy.ellipsoid import geodetic_normal

        if self._lats is None:
            raise ValueError('Target points not set')
        if self._look_vecs is None:
            self._look_vecs = np.asarray(geodetic_normal(self._lats, self._lons))

    def __call__(self, delays):
        return delays


class Conventional(LOS):
    """Projected slant delays: ZTD / cos(incidence)
    (reference: losreader.py:94-133)."""

    def __init__(self, filename=None, los_convention: str = 'isce', time=None, pad: int = 600) -> None:
        super().__init__()
        self._file = filename
        self._time = time
        self._pad = pad
        self._is_projected = True
        self._convention = los_convention
        if self._convention.lower() != 'isce':
            raise NotImplementedError()

    def __call__(self, delays):
        if self._lats is None:
            raise ValueError('Target points not set')
        if self._file is None:
            raise ValueError('LOS file not set')

        try:
            from raider_tpu.io.rasters import rio_open

            data, _ = rio_open(self._file)
            los_enu = inc_hd_to_enu(*data)
            factor = los_enu[..., -1]
        except (OSError, TypeError, ValueError):
            orbit = get_orbit(self._file, self._time, self._pad)
            factor = state_to_los_factor(orbit, self._lats, self._lons, self._heights)

        return delays / factor


class Raytracing(LOS):
    """True slant raytracing: per-pixel look vectors from orbit geometry
    (reference: losreader.py:136-255)."""

    def __init__(self, filename=None, los_convention: str = 'isce', time=None,
                 look_dir: str = 'right', pad: int = 600,
                 orbit: Optional[Orbit] = None) -> None:
        super().__init__()
        self._ray_trace = True
        self._file = filename
        self._time = time
        self._pad = pad
        self._convention = los_convention
        self._orbit: Optional[Orbit] = orbit
        if self._convention.lower() != 'isce':
            raise NotImplementedError()
        if look_dir.lower() not in ('right', 'left'):
            raise RuntimeError(f'Unknown look direction: {look_dir}')
        self._look_dir = look_dir.lower()
        if orbit is None and self._time is not None and self._file is not None:
            self._orbit = get_orbit(self._file, self._time, pad=pad)

    def getSensorDirection(self) -> str:
        if self._orbit is None:
            raise ValueError('The orbit has not been set')
        return self._orbit.direction

    def getLookDirection(self) -> str:
        return self._look_dir

    def setTime(self, time, pad: Optional[int] = None) -> None:
        # default to the pad the instance was constructed with, not a fresh
        # 600 s (a caller's wider constructor pad would otherwise be
        # silently discarded on reload)
        self._time = time
        self._orbit = get_orbit(self._file, self._time,
                                pad=self._pad if pad is None else pad)

    def getLookVectors(self, ht, llh, xyz, yy=None):
        """Unit look vectors (target -> sensor, ECEF) for a pixel grid.

        One batched geo2rdr Newton solve over all pixels (replaces the
        reference's per-pixel ISCE3 loop, losreader.py:230-254). Pixels where
        the solve fails (NaN inputs) carry NaN look vectors like the
        reference.
        """
        if self._orbit is None:
            raise ValueError('The orbit has not been set')
        xyz = np.asarray(xyz, dtype=np.float64)
        aztime, slant_range, sat_pos, _ = geo2rdr(
            self._orbit.times, self._orbit.pos, self._orbit.vel, xyz
        )
        los = (np.asarray(sat_pos) - xyz) / np.asarray(slant_range)[..., None]
        return los


def getZenithLookVecs(lats, lons, heights):
    """Unit zenith look vectors in ECEF (reference: losreader.py:302-316)."""
    from raider_tpu.geodesy.ellipsoid import geodetic_normal

    return np.asarray(geodetic_normal(lats, lons))


def inc_hd_to_enu(incidence, heading):
    """Incidence/heading (deg) to ENU unit look vectors
    (reference: losreader.py:374-396)."""
    if np.any(incidence < 0):
        raise ValueError('inc_hd_to_enu: Incidence angle cannot be less than 0')
    east = sind(incidence) * cosd(heading + 90)
    north = sind(incidence) * sind(heading + 90)
    up = cosd(incidence)
    return np.stack((east, north, up), axis=-1)
