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
