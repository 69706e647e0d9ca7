"""Delay engine: zenith, projected-slant, and raytraced-slant tropospheric delays."""

from raider_tpu.delay.engine import tropo_delay  # noqa: F401
