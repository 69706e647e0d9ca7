"""Host-side IO: netCDF (HDF5-backed) datasets and simple rasters."""

from raider_tpu.io.ncdf import Dataset, read_nc, write_nc  # noqa: F401
