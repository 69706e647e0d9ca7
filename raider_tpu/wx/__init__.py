"""Weather-model layer: acquisition, parsing, and refractivity preprocessing.

Host NumPy handles file parsing; the numeric pipeline (vapor pressure,
z-regularization, refractivities, per-node ZTD integration) runs as jitted
JAX ops. Capability parity with reference tools/RAiDER/models/.
"""

from raider_tpu.wx.base import WeatherModel, find_svp  # noqa: F401
from raider_tpu.wx.exceptions import (  # noqa: F401
    CriticalError,
    DatetimeFailed,
    DatetimeNotAvailable,
    DatetimeOutsideRange,
    ExistingWeatherModelTooSmall,
    NoStationDataFoundError,
    NoWeatherModelData,
    TryToKeepGoingError,
    WrongNumberOfFiles,
)
