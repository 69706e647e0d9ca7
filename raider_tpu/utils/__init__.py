"""Shared utilities: device placement, time handling, filenames."""

from raider_tpu.utils.jaxutils import cpu_device, host_jit, tpu_device  # noqa: F401
