"""Real-GUNW conformance against the reference's checked-in fixtures.

Two legs, both modeled on the reference's own offline GUNW tests
(reference: test/test_GUNW.py:47-92 and 96-146):

* the HyP3 **metadata JSON** leg runs ``calcDelaysGUNW`` with bucket/prefix
  and mocked S3/compute, then validates the updated product JSON against the
  reference's checked-in JSON schema
  (``test/gunw_test_data/gunw_schema.json``) with ``jsonschema``;
* the **dataset** leg runs the FULL pipeline (prep -> config -> two-epoch
  delay cubes -> troposphere-group packaging) against the reference's
  checked-in REAL GMAO processed weather files
  (``test/gunw_test_data/weather_files/``), with only the network fetch
  mocked (the reference's own pattern), and asserts the written group tree,
  dimension names (heightsMeta/latitudeMeta/longitudeMeta), dtypes, attrs,
  CRS (incl. crs_wkt), and affine grid conform to what a downstream HyP3 /
  ARIA consumer reads.
"""

import datetime as dt
import json
import shutil
from pathlib import Path

import h5py
import numpy as np
import pytest

from tests.test_gunw_gnss import make_synthetic_gunw
from tests.test_orbit import synthetic_orbit

GUNW_DATA = Path('/root/reference/test/gunw_test_data')

pytestmark = pytest.mark.skipif(
    not GUNW_DATA.exists(), reason='reference gunw_test_data unavailable')


# --------------------------------------------------------------- fixtures

@pytest.fixture
def gunw_file(tmp_path):
    name = ('S1-GUNW-D-R-071-tops-20200130_20200124-135156-'
            '34956N_32979N-PP-913f-v2_0_4.nc')
    p = tmp_path / name
    make_synthetic_gunw(p)
    return p


@pytest.fixture
def orbit_txt(tmp_path):
    """7-column statevector file with clusters around BOTH acquisition
    epochs (the synthetic circular orbit covers the LA scene; see
    tests/test_orbit.py). get_orbit's +-600 s pad selects one cluster per
    date. The node longitude puts the ground track ~4 deg west of the
    scene: 31-44 deg zenith at the targets (Sentinel-1-like) so rays
    integrated to the model top stay inside the GMAO cube's
    -120.9..-115 deg coverage."""
    lines = []
    for datestr in ('2020-01-30', '2020-01-24'):
        t0 = dt.datetime.fromisoformat(f'{datestr}T13:52:07')
        orb = synthetic_orbit(t0, lon_asc_deg=-117.5)
        for sec, pos, vel in zip(orb.times, orb.pos, orb.vel):
            t = t0 + dt.timedelta(seconds=float(sec))
            vals = ' '.join(f'{v:.6f}' for v in (*pos, *vel))
            lines.append(f'{t.isoformat()} {vals}\n')
    p = tmp_path / 'synthetic_orbit.txt'
    p.write_text(''.join(lines))
    return p


@pytest.fixture
def gmao_weather_dir(tmp_path):
    """The reference's real GMAO processed files, copied out of the
    read-only mount so the combine step can write its timeInterp sibling."""
    d = tmp_path / 'weather_files'
    d.mkdir()
    for name in ('GMAO_2020_01_30_T12_00_00_32N_36N_121W_114W.nc',
                 'GMAO_2020_01_30_T15_00_00_32N_36N_121W_114W.nc',
                 'GMAO_2020_01_24_T12_00_00_32N_36N_121W_114W.nc',
                 'GMAO_2020_01_24_T15_00_00_32N_36N_121W_114W.nc'):
        shutil.copy(GUNW_DATA / 'weather_files' / name, d / name)
    return d


# --------------------------------------------- HyP3 metadata JSON schema

def test_hyp3_metadata_json_schema(tmp_path, monkeypatch):
    """Mirror of reference test_GUNW_hyp3_metadata_update
    (test/test_GUNW.py:96-146): bucket workflow updates the product JSON,
    which must validate against the checked-in GUNW schema."""
    import jsonschema

    from raider_tpu.workflows import aws, gunw as G

    src_json = (GUNW_DATA / 'S1-GUNW-A-R-064-tops-20210723_20210711-015001-'
                            '35393N_33512N-PP-6267-v2_0_4.json')
    temp_json = tmp_path / 'temp.json'
    shutil.copy(src_json, temp_json)

    got_s3, uploaded = [], []

    def fake_get_s3_file(bucket, prefix, ftype):
        got_s3.append((bucket, prefix, ftype))
        return {'.nc': Path('foo.nc'), '.json': temp_json,
                '.png': Path('foo.png')}[ftype]

    monkeypatch.setattr(aws, 'get_s3_file', fake_get_s3_file)
    monkeypatch.setattr(aws, 'upload_file_to_s3',
                        lambda f, b, p: uploaded.append((str(f), b, p)))
    monkeypatch.setattr(G, 'check_weather_model_availability',
                        lambda f, m: True)
    monkeypatch.setattr(G, 'prep_from_gunw',
                        lambda *a, **k: (Path('cfg.yaml'), 0.05546576))
    monkeypatch.setattr(G, 'tropo_gunw_slc',
                        lambda paths, f, lam: ('HRES', {}))
    import raider_tpu.workflows.calc_delays as CD
    monkeypatch.setattr(CD, 'calcDelays', lambda argv: ['file1', 'file2'])

    G.calcDelaysGUNW(['--weather-model', 'HRES',
                      '--bucket', 'myBucket', '--bucket-prefix', 'myPrefix'])

    metadata = json.loads(temp_json.read_text())
    schema = json.loads((GUNW_DATA / 'gunw_schema.json').read_text())
    assert metadata['metadata']['weather_model'] == ['HRES']
    # the checked-in schema uses draft-07 tuple-style `items`; modern
    # jsonschema defaults to 2020-12 where that spelling is an error
    jsonschema.Draft7Validator(schema).validate(metadata)

    assert got_s3 == [('myBucket', 'myPrefix', '.nc'),
                      ('myBucket', 'myPrefix', '.json'),
                      ('myBucket', 'myPrefix', '.png')]
    assert {Path(f).name for f, _, _ in uploaded} == {
        'foo.nc', 'temp.json', 'foo.png'}


# ------------------------------------------ dataset group conformance

def test_gunw_dataset_group_conformance(gunw_file, orbit_txt,
                                        gmao_weather_dir, tmp_path,
                                        monkeypatch):
    """Full calcDelaysGUNW on the reference's real GMAO weather fixtures
    (mirror of test_GUNW_dataset_update, test/test_GUNW.py:47-92): only the
    network fetch is mocked; the prep, config, two-epoch raytraced delay
    cubes, phase conversion, and HDF5 packaging are production code."""
    from raider_tpu.workflows import gunw as G
    from raider_tpu.workflows.gunw import DIM_NAMES, TROPO_GROUP, TROPO_NAMES
    import raider_tpu.workflows.calc_delays as CD

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(G.credentials, 'check_api', lambda *a, **k: None)
    monkeypatch.setattr(G.GUNW, 'get_orbit_file',
                        lambda self: [str(orbit_txt)])

    def fake_prepare(model, tt, bounds, makePlots=False):
        name = (f'GMAO_{tt.year}_{tt.month:02d}_{tt.day:02d}'
                f'_T{tt.hour:02d}_00_00_32N_36N_121W_114W.nc')
        p = gmao_weather_dir / name
        assert p.exists(), f'unexpected weather request {tt}'
        return str(p)

    monkeypatch.setattr(CD, 'prepareWeatherModel', fake_prepare)

    cube_paths = G.calcDelaysGUNW([
        '--weather-model', 'GMAO', '--file', str(gunw_file),
        '-interp', 'center_time', '-o', str(tmp_path),
    ])
    assert len(cube_paths) == 2

    with h5py.File(gunw_file, 'r') as f:
        assert f.attrs['version'] == b'1c'
        grp = f[f'{TROPO_GROUP}/GMAO']
        assert set(grp.keys()) == {'reference', 'secondary'}
        for rs in ('reference', 'secondary'):
            rs_grp = grp[rs]
            assert set(rs_grp.keys()) == set(DIM_NAMES) | set(TROPO_NAMES) | {'crs'}

            heights = rs_grp['heightsMeta'][()]
            lats = rs_grp['latitudeMeta'][()]
            lons = rs_grp['longitudeMeta'][()]
            for arr in (heights, lats, lons):
                assert arr.dtype == np.float32
            # the 10 km GMAO posting over the GUNW bbox, uniform grid
            # (the reference asserts the rio affine transform; uniform
            # spacing + endpoints is the transform)
            np.testing.assert_allclose(np.diff(lats), np.diff(lats).mean(),
                                       atol=1e-4)
            np.testing.assert_allclose(np.diff(lons), np.diff(lons).mean(),
                                       atol=1e-4)
            # bbox + the raytrace AOI buffer (calc_buffer_ray adds margin
            # for slant rays, like the reference's llreader buffering)
            assert lats.min() >= 33.0 - 0.8 and lats.max() <= 34.9 + 0.8
            assert lons.min() >= -118.7 - 0.8 and lons.max() <= -116.7 + 0.8
            assert 33.0 - 0.8 <= lats.min() and lats.size >= 19
            assert lons.size >= 20
            np.testing.assert_allclose(
                heights, np.arange(-500.0, 9500.0, 500.0))

            crs = rs_grp['crs']
            assert crs.attrs['grid_mapping_name'] == b'latitude_longitude'
            from raider_tpu.geodesy.crs import crs_from_wkt
            back = crs_from_wkt(crs.attrs['crs_wkt'].decode())
            assert back.to_epsg() == 4326

            for name in TROPO_NAMES:
                v = rs_grp[name]
                assert v.dtype == np.float32
                assert v.shape == (heights.size, lats.size, lons.size)
                # dimension scales attached in (z, y, x) order
                for i, dim in enumerate(DIM_NAMES):
                    assert v.dims[i][0] == rs_grp[dim]
                assert v.attrs['units'] == b'radians'
                assert v.attrs['grid_mapping'] == b'crs'
                assert v.attrs['long_name'] == name.encode()
                assert v.attrs['standard_name'] == name.encode()
                data = v[()]
                # phase = delay * (-4 pi / lambda): finite and negative
                assert np.isfinite(data).all()
                assert (data < 0).all()

        # reference epoch (20200130) and secondary (20200124) must differ:
        # real two-epoch weather, not a duplicated cube
        w_ref = grp['reference/troposphereWet'][()]
        w_sec = grp['secondary/troposphereWet'][()]
        assert np.abs(w_ref - w_sec).max() > 0.0
