"""GUNW packaging and GNSS parsing/merging workflows on synthetic data."""

import datetime as dt
import gzip
import io
import zipfile
from pathlib import Path

import h5py
import numpy as np
import pandas as pd
import pytest


def make_synthetic_gunw(path: Path) -> None:
    """Minimal GUNW-shaped HDF5 with the groups the workflow reads."""
    wkt = ('POLYGON ((-118.5 33.0, -116.7 33.2, -116.9 34.9, -118.7 34.7, '
           '-118.5 33.0))')
    slcs_ref = [
        b'S1B_IW_SLC__1SDV_20200130T135154_20200130T135221_030090_037069_BBDD.zip',
    ]
    slcs_sec = [
        b'S1B_IW_SLC__1SDV_20200124T135154_20200124T135221_030003_036EA4_CCEE.zip',
    ]
    with h5py.File(path, 'w') as f:
        f.create_dataset('productBoundingBox', data=np.array([wkt.encode()]))
        md = f.create_group('science/radarMetaData')
        md.create_dataset('wavelength', data=0.05546576)
        md.create_dataset('inputSLC/reference/L1InputGranules', data=np.array(slcs_ref))
        md.create_dataset('inputSLC/secondary/L1InputGranules', data=np.array(slcs_sec))
        gd = f.create_group('science/grids/data')
        lats = np.linspace(33.0, 34.9, 20)
        lons = np.linspace(-118.7, -116.7, 25)
        d = gd.create_dataset('latitude', data=lats)
        d.make_scale('latitude')
        d = gd.create_dataset('longitude', data=lons)
        d.make_scale('longitude')
        f.create_group('science/grids/corrections/external/troposphere')


@pytest.fixture
def gunw_file(tmp_path):
    name = 'S1-GUNW-D-R-071-tops-20200130_20200124-135156-34956N_32979N-PP-913f-v2_0_4.nc'
    p = tmp_path / name
    make_synthetic_gunw(p)
    return p


class TestGunwPrep:
    def test_metadata_extraction(self, gunw_file, tmp_path, monkeypatch):
        from raider_tpu.workflows import gunw as G

        monkeypatch.setattr(G.GUNW, 'get_orbit_file', lambda self: ['orbit.EOF'])
        obj = G.GUNW(str(gunw_file), 'ERA5', str(tmp_path))
        s, n, w, e = obj.SNWE
        assert s == pytest.approx(33.0) and n == pytest.approx(34.9)
        assert w == pytest.approx(-118.7) and e == pytest.approx(-116.7)
        assert obj.dates == [20200130, 20200124]
        assert obj.mid_time == '13:52:07'  # midpoint of 135154-135221
        assert obj.look_dir == 'right'
        assert obj.wavelength == pytest.approx(0.05546576)
        assert obj.spacing_m == 10000

    def test_acq_time_from_id(self):
        from raider_tpu.workflows.gunw import _get_acq_time_from_gunw_id

        gid = 'S1-GUNW-A-R-106-tops-20220115_20211222-225947-00078W_00041N-PP-4be8-v3_0_0'
        assert _get_acq_time_from_gunw_id(gid, 'reference') == dt.datetime(2022, 1, 15, 22, 59, 47)
        assert _get_acq_time_from_gunw_id(gid, 'secondary') == dt.datetime(2021, 12, 22, 22, 59, 47)

    def test_weather_model_availability(self, gunw_file):
        from raider_tpu.workflows.gunw import check_weather_model_availability

        assert check_weather_model_availability(gunw_file, 'ERA5')
        assert check_weather_model_availability(gunw_file, 'GMAO')
        # ERA-I ends 2019-08-31 -> not available for 2020 GUNW
        assert not check_weather_model_availability(gunw_file, 'ERAI')

    def test_identify_which_hrrr(self, gunw_file):
        from raider_tpu.workflows.gunw import identify_which_hrrr

        assert identify_which_hrrr(gunw_file) == 'HRRR'


class TestGunwPackaging:
    def test_tropo_gunw_slc(self, gunw_file, tmp_path):
        """Two delay cubes -> phase -> packaged into the GUNW."""
        from raider_tpu.delay.engine import writeResultsToDataset
        from raider_tpu.geodesy import Geographic
        from raider_tpu.io import write_nc
        from raider_tpu.workflows.gunw import TROPO_GROUP, tropo_gunw_slc

        xpts = np.linspace(-118.7, -116.7, 12)
        ypts = np.linspace(34.9, 33.0, 10)
        zpts = np.arange(-500.0, 9500.0, 1000.0)
        rng = np.random.default_rng(3)
        cube_paths = []
        for datestr in ('20200124', '20200130'):
            wet = rng.uniform(0.01, 0.3, (zpts.size, ypts.size, xpts.size))
            hydro = rng.uniform(1.0, 2.5, (zpts.size, ypts.size, xpts.size))
            ds = writeResultsToDataset(
                dt.datetime.strptime(datestr, '%Y%m%d'), xpts, ypts, zpts,
                Geographic(), wet, hydro, 'wm.nc', 'slant - raytracing',
            )
            ds.attrs['model_times_used'] = [datestr]
            ds.attrs['interpolation_method'] = 'none'
            p = tmp_path / f'ERA5_tropo_{datestr}T135207_ray.nc'
            write_nc(ds, p)
            cube_paths.append(p)

        wavelength = 0.05546576
        model, arrays = tropo_gunw_slc(cube_paths, gunw_file, wavelength)
        assert model == 'ERA5'

        with h5py.File(gunw_file, 'r') as f:
            grp = f[f'{TROPO_GROUP}/ERA5']
            for rs in ('reference', 'secondary'):
                for name in ('troposphereWet', 'troposphereHydrostatic'):
                    data = grp[f'{rs}/{name}'][()]
                    assert data.shape == (zpts.size, ypts.size, xpts.size)
                    assert np.isfinite(data).all()
                assert grp[f'{rs}/crs'] is not None
            # phase = delay * (-4 pi / lambda): signs flip
            wet_ref = grp['reference/troposphereWet'][()]
            assert np.all(wet_ref < 0)
            assert f.attrs['version'] == b'1c'

    def test_phase_conversion_value(self, tmp_path):
        from raider_tpu.workflows.gunw import compute_delays_slc
        from raider_tpu.delay.engine import writeResultsToDataset
        from raider_tpu.geodesy import Geographic
        from raider_tpu.io import write_nc

        xpts = np.array([0.0, 1.0])
        ypts = np.array([1.0, 0.0])
        zpts = np.array([0.0, 100.0])
        paths = []
        for datestr in ('20200101', '20200113'):
            ds = writeResultsToDataset(
                dt.datetime.strptime(datestr, '%Y%m%d'), xpts, ypts, zpts,
                Geographic(), np.full((2, 2, 2), 0.1), np.full((2, 2, 2), 2.0),
                'wm.nc', 'slant - raytracing')
            ds.attrs['model_times_used'] = [datestr]
            ds.attrs['interpolation_method'] = 'none'
            p = tmp_path / f'HRRR_tropo_{datestr}T000000_ray.nc'
            write_nc(ds, p)
            paths.append(p)
        lam = 0.055
        model, arrays, coords, crs_attrs, attrs = compute_delays_slc(paths, lam)
        expected = 0.1 * (-4 * np.pi) / lam
        np.testing.assert_allclose(arrays['reference_troposphereWet'], expected)


class TestGnssParsing:
    def _make_trop_zip(self, path: Path, station: str = 'TORP', year: int = 2020, doy: int = 30,
                       skip=()):
        """Synthetic UNR SINEX-trop archive: zip of gzipped daily files.
        Epochs (seconds of day) in ``skip`` are omitted, like real archives
        with data gaps."""
        lines = ['%=TRO\n', '+TROP/SOLUTION\n',
                 '*SITE EPOCH TROTOT STDDEV TRWET TGETOT STDDEV TGNTOT STDDEV WVAPOR STDDEV MTEMP\n']
        for k, sec in enumerate(range(0, 86400, 300)):
            if sec in skip:
                continue
            trotot = 2400.0 + k * 0.1   # mm
            trwet = 100.0 + k * 0.05
            lines.append(
                f' {station} {year}:{doy:03d}:{sec:05d} {trotot:.1f} 1.1 {trwet:.1f} '
                f'0.2 0.1 -0.3 0.1 12.0 0.5 280.0\n'
            )
        lines.append('-TROP/SOLUTION\n')
        inner = gzip.compress(''.join(lines).encode())
        with zipfile.ZipFile(path, 'w') as z:
            z.writestr(f'{station}.{year}.{doy:03d}.trop.gz', inner)

    def test_get_delays_unr(self, tmp_path):
        from raider_tpu.workflows.gnss import get_delays_UNR

        zpath = tmp_path / 'TORP.2020.trop.zip'
        self._make_trop_zip(zpath)
        out_csv = tmp_path / 'TORP_ztd.csv'
        get_delays_UNR(str(zpath), out_csv, ['2020-01-30'], returnTime=None)
        df = pd.read_csv(out_csv)
        assert len(df) == 288
        np.testing.assert_allclose(df['ZTD'].iloc[0], 2.4)          # m
        np.testing.assert_allclose(df['wet_delay'].iloc[0], 0.1)
        np.testing.assert_allclose(df['hydrostatic_delay'].iloc[0], 2.3)

        # specific return time: nearest 300 s slot
        out2 = tmp_path / 'TORP_one.csv'
        get_delays_UNR(str(zpath), out2, ['2020-01-30'], returnTime=3600)
        df2 = pd.read_csv(out2)
        assert len(df2) == 1 and df2['times'].iloc[0] == 3600

    def test_return_time_skips_missing_epochs(self, tmp_path):
        """With a data gap, returnTime must pick the nearest epoch WITH
        data in the re-aligned arrays - the reference indexes the raw epoch
        list after re-aligning the delays to the full 300 s grid
        (getStationDelays.py:137-167) and returns another epoch's value."""
        from raider_tpu.workflows.gnss import get_delays_UNR

        zpath = tmp_path / 'TORP.2020.trop.zip'
        self._make_trop_zip(zpath, skip=(300,))
        out = tmp_path / 'TORP_gap.csv'
        # 400 s is nearest to the MISSING 300 s slot; the nearest epoch
        # with data is 600 s (k=2 -> TROTOT 2400.2 mm)
        get_delays_UNR(str(zpath), out, ['2020-01-30'], returnTime=400)
        df = pd.read_csv(out)
        assert len(df) == 1
        assert df['times'].iloc[0] == 600
        np.testing.assert_allclose(df['ZTD'].iloc[0], 2.4002)
        assert np.isfinite(df['ZTD'].iloc[0])

    def test_combine_and_merge(self, tmp_path):
        from raider_tpu.workflows.gnss_combine import combineDelayFiles, main

        # model delay CSVs for two dates
        model_dir = tmp_path / 'model'
        model_dir.mkdir()
        for datestr in ('20200130', '20200131'):
            df = pd.DataFrame({
                'ID': ['TORP', 'HOOT'],
                'Lat': [33.8, 33.1],
                'Lon': [-118.3, -116.8],
                'Hgt_m': [-5.2, 617.2],
                'wetDelay': [0.1, 0.12],
                'hydroDelay': [2.3, 2.2],
                'totalDelay': [2.4, 2.32],
            })
            df.to_csv(model_dir / f'ERA5_Delay_{datestr}T120000_ztd.csv', index=False)
        combined = tmp_path / 'raider_combined.csv'
        combineDelayFiles(combined, loc=model_dir)
        dfc = pd.read_csv(combined)
        assert len(dfc) == 4 and 'Datetime' in dfc

        # GNSS ZTD file
        gnss = pd.DataFrame({
            'ID': ['TORP', 'HOOT'],
            'Date': ['2020-01-30', '2020-01-30'],
            'times': [43200, 43200],
            'ZTD': [2.40123, 2.31999],
            'sigZTD': [0.004, 0.005],
        })
        gnss_file = tmp_path / 'gnss.csv'
        gnss.to_csv(gnss_file, index=False)

        merged = main(combined, gnss_file, out_path=None)
        assert 'ZTD_minus_RAiDER' in merged
        torp = merged[merged['ID'] == 'TORP']
        np.testing.assert_allclose(torp['ZTD_minus_RAiDER'].iloc[0], 2.40123 - 2.4, atol=1e-9)


class TestMissingGUNWErrors:
    """Clear errors when S3 objects are missing (reference:
    test_raises_for_missing_gunw.py, regression for RAiDER issue #648)."""

    IARGS = ['--bucket', 'dummy-bucket',
             '--input-bucket-prefix', 'dummy-input-prefix',
             '--weather-model', 'ERA5']

    def _patch_s3(self, monkeypatch, side_effects):
        import raider_tpu.workflows.aws as aws

        it = iter(side_effects)
        monkeypatch.setattr(aws, 'get_s3_file', lambda *a, **k: next(it))

    def test_missing_product_file(self, monkeypatch):
        from raider_tpu.workflows.gunw import calcDelaysGUNW

        self._patch_s3(monkeypatch, [None])
        with pytest.raises(ValueError, match='GUNW product file could not be found'):
            calcDelaysGUNW(self.IARGS)

    def test_missing_metadata_file(self, monkeypatch, gunw_file):
        from raider_tpu.workflows.gunw import calcDelaysGUNW

        self._patch_s3(monkeypatch, [gunw_file, None])
        with pytest.raises(ValueError, match='GUNW metadata file could not be found'):
            calcDelaysGUNW(self.IARGS)

    def test_missing_browse_image(self, monkeypatch, gunw_file, tmp_path):
        import json as _json

        from raider_tpu.workflows.gunw import calcDelaysGUNW

        meta = tmp_path / 'meta.json'
        meta.write_text(_json.dumps({'metadata': {}}))
        self._patch_s3(monkeypatch, [gunw_file, str(meta), None])
        with pytest.raises(ValueError, match='GUNW browse image could not be found'):
            calcDelaysGUNW(self.IARGS)


class TestCalcDelaysGUNWSuccess:
    def test_bucket_flow_packages_and_uploads(self, gunw_file, tmp_path, monkeypatch):
        """Full S3 orchestration: fetch product/metadata/browse, compute,
        package into the GUNW, re-upload all three artifacts."""
        import json as _json

        import raider_tpu.workflows.aws as aws
        import raider_tpu.workflows.gunw as G
        from raider_tpu.delay.engine import writeResultsToDataset
        from raider_tpu.geodesy import Geographic
        from raider_tpu.io import write_nc

        meta = tmp_path / 'meta.json'
        meta.write_text(_json.dumps({'metadata': {}}))
        browse = tmp_path / 'browse.png'
        browse.write_bytes(b'\x89PNG')
        fetches = iter([str(gunw_file), str(meta), str(browse)])
        monkeypatch.setattr(aws, 'get_s3_file', lambda *a, **k: next(fetches))
        uploads = []
        monkeypatch.setattr(aws, 'upload_file_to_s3',
                            lambda p, bucket, prefix: uploads.append((str(p), bucket, prefix)))
        monkeypatch.setattr(G, 'check_weather_model_availability', lambda f, m: True)

        # two epoch delay cubes (as calcDelays would produce)
        zpts = np.arange(-500.0, 9500.0, 1000.0)
        xpts = np.linspace(-118.7, -116.7, 12)
        ypts = np.linspace(34.9, 33.0, 10)
        rng = np.random.default_rng(5)
        cubes = []
        for datestr in ('20200124', '20200130'):
            ds = writeResultsToDataset(
                dt.datetime.strptime(datestr, '%Y%m%d'), xpts, ypts, zpts,
                Geographic(),
                rng.uniform(0.01, 0.3, (zpts.size, ypts.size, xpts.size)),
                rng.uniform(1.0, 2.5, (zpts.size, ypts.size, xpts.size)),
                'wm.nc', 'slant - raytracing')
            ds.attrs['model_times_used'] = [datestr]
            ds.attrs['interpolation_method'] = 'none'
            p = tmp_path / f'ERA5_tropo_{datestr}T135207_ray.nc'
            write_nc(ds, p)
            cubes.append(str(p))
        monkeypatch.setattr(
            G, 'prep_from_gunw',
            lambda *a, **k: (tmp_path / 'cfg.yaml', 0.05546576))
        import raider_tpu.workflows.calc_delays as cd
        monkeypatch.setattr(cd, 'calcDelays', lambda argv: cubes)

        out = G.calcDelaysGUNW([
            '--bucket', 'bkt', '--input-bucket-prefix', 'in-prefix',
            '--weather-model', 'ERA5',
            '--output-directory', str(tmp_path)])
        assert out == cubes

        # metadata got the weather model recorded
        assert _json.loads(meta.read_text())['metadata']['weather_model'] == ['ERA5']
        # packaged into the GUNW
        with h5py.File(gunw_file, 'r') as f:
            assert f'{G.TROPO_GROUP}/ERA5/reference/troposphereWet' in f
        # product + metadata + browse re-uploaded
        assert [Path(u[0]).suffix for u in uploads] == ['.nc', '.json', '.png']
        assert all(u[1] == 'bkt' for u in uploads)


class TestReturnTimeOptional:
    """--returntime is optional: None means all times (reference documents
    this at cli/raider.py:497-503; its code path crashes, ours honors it)."""

    def test_seconds_of_day_none(self):
        from raider_tpu.workflows.gnss import seconds_of_day

        assert seconds_of_day(None) is None
        assert seconds_of_day('01:00:00') == 3600

    def test_get_station_data_all_times(self, tmp_path):
        from raider_tpu.workflows.gnss import get_station_data

        zpath = tmp_path / 'TORP.2020.trop.zip'
        TestGnssParsing()._make_trop_zip(zpath)
        paths_csv = tmp_path / 'UNRstations_withpaths.csv'
        pd.DataFrame({'ID': ['TORP'], 'path': [str(zpath)],
                      'Lat': [33.8], 'Lon': [-118.3], 'Hgt_m': [10.0]}
                     ).to_csv(paths_csv, index=False)
        get_station_data(str(paths_csv), ['2020-01-30'], gps_repo='UNR',
                         numCPUs=1, outDir=str(tmp_path), returnTime=None)
        out = list(tmp_path.glob('UNR*combined*'))
        assert out, 'combined network CSV not written'
        df = pd.read_csv(out[0])
        assert len(df) == 288  # every 300 s slot survives
