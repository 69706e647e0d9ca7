"""Minimal netCDF4 reader/writer on top of h5py.

netCDF4 files are HDF5 files with a dimension-scale convention; this module
reads/writes that convention directly so the framework needs neither the
netCDF4 C library nor xarray. It is sufficient for:

  * reading the reference's processed weather-model files
    (reference writer: tools/RAiDER/models/weatherModel.py:659-724), and
  * writing CF-compliant delay cubes
    (reference writer: tools/RAiDER/delay.py:329-401).

The in-memory model is a tiny xarray-like ``Dataset`` with named dimensions,
coordinate arrays, data variables, and attributes.
"""

import datetime as dt
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Union

import h5py
import numpy as np


@dataclass
class Variable:
    dims: tuple
    data: np.ndarray
    attrs: dict = field(default_factory=dict)


@dataclass
class Dataset:
    """In-memory dataset: dims are implied by coords/variables."""

    coords: dict = field(default_factory=dict)       # name -> Variable (1-D usually)
    variables: dict = field(default_factory=dict)    # name -> Variable
    attrs: dict = field(default_factory=dict)

    def __getitem__(self, name: str) -> Variable:
        if name in self.variables:
            return self.variables[name]
        return self.coords[name]

    def __contains__(self, name: str) -> bool:
        return name in self.variables or name in self.coords

    @property
    def dims(self) -> dict:
        out = {}
        for var in list(self.coords.values()) + list(self.variables.values()):
            for d, s in zip(var.dims, np.shape(var.data)):
                out[d] = s
        return out


def _decode_attr(v):
    if isinstance(v, bytes):
        return v.decode('utf-8', 'replace')
    if isinstance(v, np.bytes_):
        return bytes(v).decode('utf-8', 'replace')
    if isinstance(v, np.ndarray) and v.dtype.kind == 'S':
        return [bytes(x).decode('utf-8', 'replace') for x in v.ravel()]
    if isinstance(v, np.ndarray) and v.size == 1:
        return v.ravel()[0]
    return v


def _read_attrs(obj) -> dict:
    return {
        k: _decode_attr(v)
        for k, v in obj.attrs.items()
        if not k.startswith(('_Netcdf', 'CLASS', 'NAME', 'DIMENSION_LIST', 'REFERENCE_LIST'))
        and k != '_NCProperties'
    }


# netCDF4's marker for a dimension without a coordinate variable
_PURE_DIM_NAME = 'This is a netCDF dimension but not a netCDF variable.'


def _maskandscale(data, attrs: dict):
    """CF unpacking like scipy's maskandscale / netCDF4-python defaults:
    mask _FillValue/missing_value to NaN and apply scale_factor/add_offset.
    The packing attrs are consumed (removed) so a round-trip through
    write_nc cannot double-apply them."""
    scale = attrs.pop('scale_factor', None)
    offset = attrs.pop('add_offset', None)
    fill = attrs.pop('_FillValue', attrs.pop('missing_value', None))
    if scale is None and offset is None:
        if fill is not None and np.ndim(data) and np.asarray(data).dtype.kind == 'f':
            data = np.where(np.asarray(data) == fill, np.nan, data)
        return data
    data = np.asarray(data, dtype=np.float64)
    mask = (data == float(fill)) if fill is not None else None
    if scale is not None:
        data = data * float(scale)
    if offset is not None:
        data = data + float(offset)
    if mask is not None:
        data = np.where(mask, np.nan, data)
    return data


def _dims_of(ds_obj: h5py.Dataset, fallback_names) -> tuple:
    dims = []
    for i in range(ds_obj.ndim):
        try:
            scales = ds_obj.dims[i]
            if len(scales) > 0:
                nm = scales[0].name.rsplit('/', 1)[-1]
                dims.append(nm)
                continue
        except Exception:
            pass
        dims.append(fallback_names[i] if i < len(fallback_names) else f'dim_{i}')
    return tuple(dims)


def _read_nc3(path: Union[str, Path]) -> Dataset:
    """Classic (netCDF-3) fallback via scipy (raw CDS/MARS downloads can be
    classic format)."""
    from scipy.io import netcdf_file

    out = Dataset()
    with netcdf_file(str(path), 'r', maskandscale=True, mmap=False) as f:
        out.attrs = {
            k: (v.decode() if isinstance(v, bytes) else v)
            for k, v in f._attributes.items()
        }
        dims = set(f.dimensions.keys())
        for name, var in f.variables.items():
            data = np.array(var[:]) if var.data is not None else np.array(var.getValue())
            attrs = {
                k: (v.decode() if isinstance(v, bytes) else v)
                for k, v in var._attributes.items()
            }
            if name in dims and data.ndim == 1:
                out.coords[name] = Variable((name,), data.copy(), attrs)
            else:
                out.variables[name] = Variable(tuple(var.dimensions), data.copy(), attrs)
    return out


def read_nc(path: Union[str, Path], group: Optional[str] = None) -> Dataset:
    """Read a netCDF file (HDF5-backed netCDF4, or classic netCDF-3 via the
    scipy fallback), optionally a sub-group, into a Dataset."""
    try:
        h5py.File(path, 'r').close()
    except OSError:
        if group is not None:
            raise
        return _read_nc3(path)

    out = Dataset()
    with h5py.File(path, 'r') as f:
        root = f[group] if group else f
        out.attrs = _read_attrs(root)

        # First pass: identify dimension-scale (coordinate) datasets.
        # Scales carrying netCDF4's pure-dimension marker (a dimension with
        # no coordinate variable) define a dim name but are NOT coordinates.
        scale_names = set()
        pure_dims = set()
        for name, obj in root.items():
            if isinstance(obj, h5py.Dataset) and obj.attrs.get('CLASS', b'') in (b'DIMENSION_SCALE', 'DIMENSION_SCALE'):
                scale_names.add(name)
                nm = obj.attrs.get('NAME', b'')
                nm = nm.decode('utf-8', 'replace') if isinstance(nm, bytes) else str(nm)
                if nm.startswith(_PURE_DIM_NAME):
                    pure_dims.add(name)

        for name, obj in root.items():
            if not isinstance(obj, h5py.Dataset):
                continue
            data = obj[()]
            attrs = _read_attrs(obj)
            data = _maskandscale(data, attrs)
            if name in pure_dims:
                continue
            if name in scale_names:
                out.coords[name] = Variable((name,), np.asarray(data), attrs)
            else:
                dims = _dims_of(obj, [])
                # fall back: match by shape against known scales
                if any(d.startswith('dim_') for d in dims):
                    bylen = {}
                    for cn in scale_names:
                        arr = root[cn]
                        if arr.ndim == 1:
                            bylen.setdefault(arr.shape[0], cn)
                    dims = tuple(
                        bylen.get(s, d) for s, d in zip(np.shape(data), dims)
                    )
                out.variables[name] = Variable(dims, np.asarray(data) if np.ndim(data) else data, attrs)
    return out


def write_nc(ds: Dataset, path: Union[str, Path], group: Optional[str] = None, mode: str = 'w') -> str:
    """Write a Dataset as a netCDF4-flavored HDF5 file."""
    path = str(path)
    with h5py.File(path, mode) as f:
        root = f.require_group(group) if group else f
        if group is None and mode == 'w':
            f.attrs['_NCProperties'] = np.bytes_('version=2,netcdf=4.9.2,hdf5=1.14.0')

        str_t = h5py.string_dtype('utf-8')

        def _set_attrs(obj, attrs):
            for k, v in attrs.items():
                if isinstance(v, str):
                    obj.attrs[k] = np.bytes_(v)
                elif isinstance(v, (list, tuple)) and v and isinstance(v[0], str):
                    obj.attrs.create(k, np.array(v, dtype=str_t))
                else:
                    obj.attrs[k] = v

        _set_attrs(root, ds.attrs)

        # coordinate variables (dimension scales)
        for name, var in ds.coords.items():
            arr = np.asarray(var.data)
            d = root.create_dataset(name, data=arr)
            d.make_scale(name)
            _set_attrs(d, var.attrs)

        # phantom dims (dims with no coordinate variable): stored under the
        # dim's own name with netCDF4's pure-dimension NAME marker, so
        # read_nc round-trips the dim names without inventing coordinates
        phantom = {}
        taken = set(ds.coords) | set(ds.variables)
        for vname, var in ds.variables.items():
            for dim, size in zip(var.dims, np.shape(np.asarray(var.data))):
                if dim not in ds.coords and dim not in phantom:
                    nm = dim if dim not in taken else f'_dim_{dim}'
                    pd_ = root.create_dataset(nm, data=np.zeros(size, np.float32))
                    pd_.make_scale(dim)
                    pd_.attrs['NAME'] = np.bytes_(f'{_PURE_DIM_NAME}{size:10d}')
                    phantom[dim] = pd_

        for name, var in ds.variables.items():
            arr = np.asarray(var.data)
            d = root.create_dataset(name, data=arr)
            for i, dim in enumerate(var.dims):
                if dim in ds.coords:
                    d.dims[i].attach_scale(root[dim])
                elif dim in phantom:
                    d.dims[i].attach_scale(phantom[dim])
            _set_attrs(d, var.attrs)
    return path


def iso_now() -> str:
    return str(dt.datetime.now(tz=dt.timezone.utc))
