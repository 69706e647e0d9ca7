"""netCDF (h5py-backed) IO roundtrip + reading reference processed files."""

import numpy as np

from raider_tpu.io import Dataset, read_nc, write_nc
from raider_tpu.io.ncdf import Variable


def test_roundtrip(tmp_path):
    z = np.linspace(-500, 25000, 10)
    y = np.linspace(30, 35, 6)
    x = np.linspace(-120, -115, 5)
    wet = np.random.default_rng(0).normal(size=(10, 6, 5)).astype(np.float32)

    ds = Dataset(
        coords={
            'z': Variable(('z',), z, {'units': 'm'}),
            'y': Variable(('y',), y, {}),
            'x': Variable(('x',), x, {}),
        },
        variables={'wet': Variable(('z', 'y', 'x'), wet, {'units': 'm'})},
        attrs={'title': 'test cube', 'count': 3},
    )
    p = tmp_path / 'cube.nc'
    write_nc(ds, p)

    back = read_nc(p)
    np.testing.assert_array_equal(back['wet'].data, wet)
    assert back['wet'].dims == ('z', 'y', 'x')
    np.testing.assert_array_equal(back.coords['z'].data, z)
    assert back.attrs['title'] == 'test cube'
    assert back['wet'].attrs['units'] == 'm'
    assert back.dims == {'z': 10, 'y': 6, 'x': 5}


def test_read_reference_era5(era5_la_file):
    ds = read_nc(era5_la_file)
    for name in ['t', 'p', 'e', 'wet', 'hydro', 'wet_total', 'hydro_total']:
        assert name in ds, name
    assert ds['wet'].dims == ('z', 'y', 'x')
    z = ds.coords['z'].data
    assert z[0] == -500.0 and z.shape[0] == 145
    # CRS attrs on 'proj' variable parse as geographic WGS84
    from raider_tpu.geodesy import crs_from_cf, Geographic

    crs = crs_from_cf(ds['proj'].attrs)
    assert isinstance(crs, Geographic)


def test_phantom_dims_roundtrip(tmp_path):
    """Variables with no coordinate arrays (e.g. raw GMAO/MERRA2/NCMR files
    written by write_weather_vars) round-trip their DIM NAMES, and the
    pure-dimension scales do not surface as fake zero-filled coordinates
    (netCDF4's 'not a netCDF variable' convention)."""
    from raider_tpu.io.ncdf import Dataset, Variable, read_nc, write_nc

    t = np.arange(24.0).reshape(2, 3, 4)
    ds = Dataset(coords={}, variables={'t': Variable(('z', 'y', 'x'), t, {})},
                 attrs={})
    p = tmp_path / 'raw.nc'
    write_nc(ds, p)
    back = read_nc(p)
    assert back['t'].dims == ('z', 'y', 'x')
    np.testing.assert_array_equal(back['t'].data, t)
    assert back.coords == {}
    assert back.dims == {'z': 2, 'y': 3, 'x': 4}


def test_packed_variable_unpacks(tmp_path):
    """CF-packed variables (int16 + scale_factor/add_offset/_FillValue, as
    legacy CDS ERA5 netCDF4 downloads use) decode to physical values with
    fills as NaN - matching the scipy netCDF-3 fallback's maskandscale."""
    import h5py

    from raider_tpu.io.ncdf import read_nc

    p = tmp_path / 'packed.nc'
    raw = np.array([[0, 10000], [20000, -32767]], dtype=np.int16)
    with h5py.File(p, 'w') as f:
        lat = f.create_dataset('latitude', data=np.array([10.0, 20.0]))
        lat.make_scale('latitude')
        lon = f.create_dataset('longitude', data=np.array([30.0, 40.0]))
        lon.make_scale('longitude')
        d = f.create_dataset('t', data=raw)
        d.dims[0].attach_scale(lat)
        d.dims[1].attach_scale(lon)
        d.attrs['scale_factor'] = 0.01
        d.attrs['add_offset'] = 250.0
        d.attrs['_FillValue'] = np.int16(-32767)
    ds = read_nc(p)
    got = np.asarray(ds['t'].data)
    np.testing.assert_allclose(got[0], [250.0, 350.0])
    np.testing.assert_allclose(got[1, 0], 450.0)
    assert np.isnan(got[1, 1])
    # packing attrs are consumed so a write_nc round-trip cannot double-apply
    assert 'scale_factor' not in ds['t'].attrs
    assert '_FillValue' not in ds['t'].attrs
