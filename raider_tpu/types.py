"""Shared type aliases (capability parity: reference tools/RAiDER/types/)."""

from typing import Literal, Tuple, Union

LookDir = Literal['right', 'left']
TimeInterpolationMethod = Literal['none', 'center_time', 'azimuth_time_grid']

CRSLike = Union[int, str, 'object']


class BB:
    """Bounding-box tuple conventions."""

    SNWE = Tuple[float, float, float, float]
    WSEN = Tuple[float, float, float, float]
    SN = Tuple[float, float]
    WE = Tuple[float, float]
