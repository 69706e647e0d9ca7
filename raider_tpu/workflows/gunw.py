"""GUNW interferometric tropospheric correction workflow.

Capability parity with the reference's ARIA subsystem (reference:
tools/RAiDER/aria/prepFromGUNW.py, aria/calcGUNW.py, cli/raider.py:514-686):
read acquisition geometry from a GUNW product, compute two-epoch raytraced
delay cubes, convert to interferometric phase, and package them back into the
GUNW netCDF under science/grids/corrections/external/troposphere/<MODEL>.

All GUNW IO is h5py-based (GUNWs are netCDF4/HDF5 files).

The two epochs run through calcDelays' acquisition/compute pipeline:
epoch 2's weather download + host processing overlaps epoch 1's delay
computation on the TPU (calc_delays.py). Batching both epochs into ONE
integrate launch (SURVEY §7 M5's original sketch) was rejected by design:
the epochs have different orbits (different rays) AND different weather
cubes (two packed brick tables resident in HBM at once, ~8 GB), while a
1M-ray launch already saturates the chip — overlap across epochs is the
win, not launch fusion.
"""

import argparse
import datetime as dt
import json
import os
import re
from pathlib import Path
from typing import List, Optional, Tuple

import h5py
import numpy as np

import raider_tpu
from raider_tpu.io import read_nc
from raider_tpu.logger import logger
from raider_tpu.utils.geom2d import polygon_intersects_box
from raider_tpu.workflows.config import write_yaml
from raider_tpu.wx import credentials
from raider_tpu.wx.exceptions import NoWeatherModelData
from raider_tpu.wx.registry import get_wm_by_name

TROPO_GROUP = 'science/grids/corrections/external/troposphere'
TROPO_NAMES = ['troposphereWet', 'troposphereHydrostatic']
DIM_NAMES = ['heightsMeta', 'latitudeMeta', 'longitudeMeta']

# cube spacing in degrees per model (reference: prepFromGUNW.py:32)
DCT_POSTING = {'HRRR': 0.05, 'HRES': 0.10, 'GMAO': 0.10, 'ERA5': 0.10,
               'ERA5T': 0.10, 'MERRA2': 0.1}


def _wkt_polygon_bounds(wkt: str) -> Tuple[float, float, float, float]:
    """(W, S, E, N) bounds of a WKT POLYGON string."""
    nums = re.findall(r'(-?\d+\.?\d*)\s+(-?\d+\.?\d*)', wkt)
    xs = np.array([float(a) for a, _ in nums])
    ys = np.array([float(b) for _, b in nums])
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def _read_strings(dset) -> List[str]:
    vals = dset[()]
    out = []
    for v in np.atleast_1d(vals):
        if isinstance(v, bytes):
            v = v.decode()
        if v:
            out.append(str(v))
    return out


def _get_acq_time_from_gunw_id(gunw_id: str, reference_or_secondary: str) -> dt.datetime:
    """(reference: prepFromGUNW.py:36-52)."""
    if reference_or_secondary not in ('reference', 'secondary'):
        raise ValueError('reference_or_secondary must be "reference" or "secondary"')
    tokens = gunw_id.split('-')
    date_tokens = tokens[6].split('_')
    date_token = date_tokens[0] if reference_or_secondary == 'reference' else date_tokens[1]
    t = tokens[7]
    return dt.datetime(
        int(date_token[:4]), int(date_token[4:6]), int(date_token[6:]),
        int(t[:2]), int(t[2:4]), int(t[4:]),
    )


def check_hrrr_dataset_availablity_for_s1_azimuth_time_interpolation(
    gunw_id: str, weather_model_name: str = 'hrrr'
) -> bool:
    """(reference: prepFromGUNW.py:55-83)."""
    from raider_tpu.workflows.s1_timing import get_times_for_azimuth_interpolation
    from raider_tpu.wx.hrrr import check_hrrr_dataset_availability

    ref_t = _get_acq_time_from_gunw_id(gunw_id, 'reference')
    sec_t = _get_acq_time_from_gunw_id(gunw_id, 'secondary')
    step = 1 if weather_model_name == 'hrrr' else 3
    times = get_times_for_azimuth_interpolation(ref_t, step) + \
        get_times_for_azimuth_interpolation(sec_t, step)
    return all(check_hrrr_dataset_availability(t, weather_model_name) for t in times)


def check_weather_model_availability(gunw_path, weather_model_name: str) -> bool:
    """Both GUNW epochs within the model's valid range
    (reference: prepFromGUNW.py:103-150)."""
    gunw_id = Path(gunw_path).name.replace('.nc', '')
    ref_t = _get_acq_time_from_gunw_id(gunw_id, 'reference')
    sec_t = _get_acq_time_from_gunw_id(gunw_id, 'secondary')

    if weather_model_name == 'HRRR':
        group = 'science/grids/data'
        try:
            ds = read_nc(gunw_path, group=group)
            lats = np.asarray(ds.coords['latitude'].data, dtype=np.float64)
            lons = np.asarray(ds.coords['longitude'].data, dtype=np.float64)
            from raider_tpu.wx.hrrr import HRRR_AK_COVERAGE_POLYGON

            box_wsen = (np.mod(lons.min(), 360), lats.min(), np.mod(lons.max(), 360), lats.max())
            if polygon_intersects_box(HRRR_AK_COVERAGE_POLYGON, box_wsen):
                weather_model_name = 'HRRRAK'
        except Exception:
            pass

    _, Model = get_wm_by_name(weather_model_name)
    model = Model()
    start, end = model._valid_range
    ref_t = ref_t.replace(tzinfo=dt.timezone.utc)
    sec_t = sec_t.replace(tzinfo=dt.timezone.utc)
    ref_ok = start <= ref_t and (end is None or ref_t <= end)
    sec_ok = start <= sec_t and (end is None or sec_t <= end)
    return ref_ok and sec_ok


class GUNW:
    """Extract run parameters from a GUNW product
    (reference: prepFromGUNW.py:153-352)."""

    def __init__(self, path_gunw: str, wm: str, out_dir: str) -> None:
        self.path_gunw = Path(path_gunw)
        self.wm = wm
        self.out_dir = Path(out_dir)

        self.SNWE = self.get_bbox()
        self.heights = np.arange(-500, 9500, 500).tolist()
        self.dates, self.mid_time = self.get_datetimes()
        self.look_dir = self.get_look_dir()
        self.wavelength = self.get_wavelength()
        self.name = self.make_fname()
        self.orbit_file = self.get_orbit_file()
        self.spacing_m = int(DCT_POSTING[self.wm] * 1e5)

    def get_bbox(self):
        with h5py.File(self.path_gunw, 'r') as f:
            poly_str = f['productBoundingBox'][()][0]
        if isinstance(poly_str, bytes):
            poly_str = poly_str.decode()
        w, s, e, n = _wkt_polygon_bounds(poly_str)
        return s, n, w, e

    def make_fname(self) -> str:
        ref, sec = self.path_gunw.name.split('-')[6].split('_')
        mid_time = self.path_gunw.name.split('-')[7]
        return f'{ref}-{sec}_{mid_time}'

    def get_slc_dt(self) -> list:
        lst_sten = []
        with h5py.File(self.path_gunw, 'r') as f:
            for key in ('reference', 'secondary'):
                slcs = _read_strings(f[f'science/radarMetaData/inputSLC/{key}/L1InputGranules'])
                st, en = dt.datetime(1989, 3, 1), dt.datetime(1989, 3, 1)
                for slc in slcs:
                    st_tmp = dt.datetime.strptime(slc.split('_')[5], '%Y%m%dT%H%M%S')
                    en_tmp = dt.datetime.strptime(slc.split('_')[6], '%Y%m%dT%H%M%S')
                    if st > dt.datetime(1989, 3, 1):
                        assert abs((st_tmp - st).days) < 2 and abs((en_tmp - en).days) < 2, \
                            'SLC granules are too far apart in time. Incorrect metadata'
                    st = max(st, st_tmp)
                    en = max(en, en_tmp)
                assert st > dt.datetime(1989, 3, 1), \
                    f'Missing {key} SLC metadata in GUNW: {self.path_gunw}'
                lst_sten.append((st, en))
        return lst_sten

    def get_datetimes(self):
        ref_sec = self.get_slc_dt()
        mid_dates = []
        mid_time = None
        for st, en in ref_sec:
            midpoint = st + (en - st) / 2
            mid_dates.append(int(midpoint.date().strftime('%Y%m%d')))
            mid_time = midpoint.time().strftime('%H:%M:%S')
        return mid_dates, mid_time

    def get_look_dir(self) -> str:
        return 'right' if self.path_gunw.name.split('-')[3].lower() == 'r' else 'left'

    def get_wavelength(self) -> float:
        with h5py.File(self.path_gunw, 'r') as f:
            return float(f['science/radarMetaData/wavelength'][()])

    def get_orbit_file(self) -> list:
        orbit_dir = self.out_dir / 'orbits'
        orbit_dir.mkdir(parents=True, exist_ok=True)
        with h5py.File(self.path_gunw, 'r') as f:
            slcs = _read_strings(f['science/radarMetaData/inputSLC/reference/L1InputGranules'])
        slcs = [s.replace('.zip', '') for s in slcs if s]
        from raider_tpu.workflows.s1_timing import get_orbits_from_slc_ids_hyp3lib

        return [str(o) for o in get_orbits_from_slc_ids_hyp3lib(slcs, str(orbit_dir))]


def prep_from_gunw(file, weather_model: str, output_directory: str,
                   interpolate_time: str = 'azimuth_time_grid',
                   api_uid=None, api_key=None) -> Tuple[Path, float]:
    """GUNW -> raider run-config YAML (reference: prepFromGUNW.py:354-385)."""
    credentials.check_api(weather_model, api_uid, api_key)
    obj = GUNW(file, weather_model, output_directory)

    cfg = {
        'weather_model': weather_model,
        'look_dir': obj.look_dir,
        'aoi_group': {'bounding_box': list(obj.SNWE)},
        'height_group': {'height_levels': obj.heights},
        'date_group': {'date_list': obj.dates},
        'time_group': {'time': obj.mid_time, 'interpolate_time': interpolate_time},
        'los_group': {'ray_trace': True, 'orbit_file': obj.orbit_file},
        'runtime_group': {
            'raster_format': 'nc',
            'output_directory': str(output_directory),
            'cube_spacing_in_m': obj.spacing_m,
        },
    }
    path_cfg = Path(f'GUNW_{obj.name}.yaml')
    write_yaml(cfg, path_cfg)
    return path_cfg, obj.wavelength


def identify_which_hrrr(gunw_path) -> str:
    """CONUS vs Alaska disambiguation (reference: prepFromGUNW.py:388-408)."""
    from raider_tpu.wx.hrrr import HRRR_AK_COVERAGE_POLYGON, HRRR_CONUS_COVERAGE_POLYGON

    ds = read_nc(gunw_path, group='science/grids/data')
    lats = np.asarray(ds.coords['latitude'].data, dtype=np.float64)
    lons = np.asarray(ds.coords['longitude'].data, dtype=np.float64)
    box_wsen = (lons.min(), lats.min(), lons.max(), lats.max())
    if polygon_intersects_box(HRRR_CONUS_COVERAGE_POLYGON, box_wsen):
        return 'HRRR'
    box_0360 = (np.mod(lons.min(), 360), lats.min(), np.mod(lons.max(), 360), lats.max())
    if polygon_intersects_box(HRRR_AK_COVERAGE_POLYGON, box_0360):
        return 'HRRRAK'
    raise NoWeatherModelData(
        f'GUNW {gunw_path} does not intersect with any HRRR coverage area. '
        'Please use a different weather model.'
    )


# ------------------------------------------------------- phase packaging

def compute_delays_slc(cube_paths: List[Path], wavelength: float):
    """Delay cubes -> two-epoch phase datasets (radians)
    (reference: calcGUNW.py:26-108). Returns (model_name, dict of arrays,
    coords, crs_attrs, per-epoch attrs)."""
    dct_delays = {}
    for path in cube_paths:
        date = dt.datetime.strptime(Path(path).name.split('_')[2], '%Y%m%dT%H%M%S')
        dct_delays[date] = Path(path)
    sec, ref = sorted(dct_delays.keys())

    phase2range = (-4 * np.pi) / float(wavelength)
    out = {}
    attrs_lst = []
    coords = None
    crs_attrs = None
    model = None
    for i, (key, datetime) in enumerate(zip(('reference', 'secondary'), (ref, sec))):
        path = dct_delays[datetime]
        ds = read_nc(path)
        out[f'{key}_{TROPO_NAMES[0]}'] = np.asarray(ds['wet'].data, dtype=np.float64) * phase2range
        out[f'{key}_{TROPO_NAMES[1]}'] = np.asarray(ds['hydro'].data, dtype=np.float64) * phase2range
        attrs_lst.append(dict(ds.attrs))
        coords = {
            DIM_NAMES[0]: np.asarray(ds.coords['z'].data, dtype=np.float32),
            DIM_NAMES[1]: np.asarray(ds.coords['y'].data, dtype=np.float32),
            DIM_NAMES[2]: np.asarray(ds.coords['x'].data, dtype=np.float32),
        }
        crs_attrs = dict(ds['crs'].attrs)
        model = Path(path).name.split('_')[0]
    return model, out, coords, crs_attrs, attrs_lst


def update_gunw_slc(path_gunw, model: str, arrays: dict, coords: dict,
                    crs_attrs: dict, attrs_lst: list) -> None:
    """Write the phase cubes into the GUNW's troposphere group
    (reference: calcGUNW.py:114-175)."""
    chunks = tuple(
        int(max(1, np.floor(c))) for c in (
            coords[DIM_NAMES[0]].size,
            coords[DIM_NAMES[1]].size / 3,
            coords[DIM_NAMES[2]].size / 3,
        )
    )
    with h5py.File(path_gunw, 'a') as f:
        grp = f.require_group(TROPO_GROUP)
        # clear pre-update layout
        for name in TROPO_NAMES + ['crs']:
            if name in grp:
                del grp[name]
        wm_grp = grp.require_group(model.upper())
        for k, rs in enumerate(('reference', 'secondary')):
            rs_grp = wm_grp.require_group(rs)
            for dim in DIM_NAMES:
                if dim not in rs_grp:
                    d = rs_grp.create_dataset(dim, data=coords[dim])
                    d.make_scale(dim)
            if 'crs' not in rs_grp:
                v_proj = rs_grp.create_dataset('crs', data=np.int32(0))
            else:
                v_proj = rs_grp['crs']
            for ck, cv in crs_attrs.items():
                v_proj.attrs[ck] = np.bytes_(cv) if isinstance(cv, str) else cv
            # downstream GUNW consumers read the CRS from crs_wkt /
            # spatial_ref (the reference writes them via rioxarray,
            # calcGUNW.py:150-158); derive the WKT from the CF attrs
            if 'crs_wkt' not in v_proj.attrs:
                try:
                    from raider_tpu.geodesy.crs import crs_from_cf

                    wkt = crs_from_cf(crs_attrs).to_wkt()
                    v_proj.attrs['crs_wkt'] = np.bytes_(wkt)
                    v_proj.attrs['spatial_ref'] = np.bytes_(wkt)
                except (ValueError, KeyError, NotImplementedError):
                    logger.debug('could not derive crs_wkt from CF attrs')

            for name in TROPO_NAMES:
                da = arrays[f'{rs}_{name}'].astype(np.float32)
                if name in rs_grp:
                    del rs_grp[name]
                v = rs_grp.create_dataset(
                    name, data=da, chunks=chunks, fillvalue=0.0, dtype=np.float32
                )
                for i, dim in enumerate(DIM_NAMES):
                    v.dims[i].attach_scale(rs_grp[dim])
                desc = f"Delay due to {name.replace('troposphere', '').lower()} component of troposphere"
                v.attrs['units'] = np.bytes_('radians')
                v.attrs['grid_mapping'] = np.bytes_('crs')
                v.attrs['description'] = np.bytes_(desc)
                v.attrs['long_name'] = np.bytes_(name)
                v.attrs['standard_name'] = np.bytes_(name)
                v.attrs['raider_tpu_version'] = np.bytes_(raider_tpu.__version__)
                src_attrs = attrs_lst[k]
                for meta_key in ('model_times_used', 'reference_time', 'interpolation_method'):
                    if meta_key in src_attrs:
                        val = src_attrs[meta_key]
                        v.attrs[meta_key] = (
                            np.bytes_(str(val)) if isinstance(val, (str, list)) else val
                        )
    logger.info('Updated %s group in: %s', os.path.basename(TROPO_GROUP), path_gunw)


def update_gunw_version(path_gunw) -> None:
    """(reference: calcGUNW.py:179-182)."""
    with h5py.File(path_gunw, 'a') as f:
        f.attrs['version'] = np.bytes_('1c')


def tropo_gunw_slc(cube_paths: List[Path], path_gunw, wavelength: float):
    """Compute + package the troposphere phase delays
    (reference: calcGUNW.py:184-209)."""
    model, arrays, coords, crs_attrs, attrs_lst = compute_delays_slc(cube_paths, wavelength)
    update_gunw_slc(path_gunw, model, arrays, coords, crs_attrs, attrs_lst)
    update_gunw_version(path_gunw)
    logger.info('Wrote slc delays to: %s', path_gunw)
    return model, arrays


# --------------------------------------------------------------- entrypoint

def calcDelaysGUNW(iargs: Optional[list] = None):
    """HyP3/S3-aware GUNW correction entrypoint
    (reference: cli/raider.py:514-686)."""
    from raider_tpu.workflows.calc_delays import calcDelays

    p = argparse.ArgumentParser(
        description='Calculate a cube of interferometric delays for GUNW files',
    )
    p.add_argument('--bucket', help='S3 bucket containing the GUNW product')
    p.add_argument('--bucket-prefix', default='', help='S3 bucket prefix for the GUNW')
    p.add_argument('--input-bucket-prefix', help='S3 bucket prefix of the input GUNW')
    p.add_argument('-f', '--file', type=str, help='1 ARIA GUNW netcdf file')
    p.add_argument('-m', '--weather-model', default='HRRR',
                   choices=['None', 'HRRR', 'HRES', 'GMAO', 'ERA5', 'ERA5T', 'MERRA2'],
                   help='Weather model')
    p.add_argument('-uid', '--api_uid', default=None, help='API UID for the weather model API')
    p.add_argument('-key', '--api_key', default=None, help='API key for the weather model API')
    p.add_argument('-interp', '--interpolate-time', default='azimuth_time_grid',
                   choices=['none', 'center_time', 'azimuth_time_grid'])
    p.add_argument('-o', '--output-directory', default=os.getcwd())
    args = p.parse_args(iargs)

    if args.weather_model == 'None':
        print('Nothing to do!')
        return

    if args.file is None and args.bucket is None:
        raise ValueError('Provide either a GUNW file or an S3 bucket')

    # CONUS/Alaska disambiguation + azimuth-grid availability check
    # (reference: cli/raider.py:602-610)
    if (args.file is not None and args.weather_model == 'HRRR'
            and args.interpolate_time == 'azimuth_time_grid'):
        gunw_id = Path(args.file).name.replace('.nc', '')
        wm_name = identify_which_hrrr(args.file)
        try:
            ok = check_hrrr_dataset_availablity_for_s1_azimuth_time_interpolation(
                gunw_id, wm_name.lower())
        except Exception:
            ok = True  # availability probe needs network; assume available
        if not ok:
            raise NoWeatherModelData(
                'The required HRRR data for time-grid interpolation is not available'
            )
        # the run config keeps 'HRRR'; the model class auto-casts to the
        # Alaska domain from the AOI bounds (wx.hrrr.HRRR.checkValidBounds)

    json_path = None
    if args.bucket:
        from raider_tpu.workflows import aws

        in_prefix = args.input_bucket_prefix or args.bucket_prefix
        args.file = aws.get_s3_file(args.bucket, in_prefix, '.nc')
        if args.file is None:
            raise ValueError('GUNW product file could not be found at S3 location')
        json_path = aws.get_s3_file(args.bucket, in_prefix, '.json')
        if json_path is None:
            raise ValueError('GUNW metadata file could not be found at S3 location')
        json_data = json.loads(Path(json_path).read_text())
        json_data['metadata'].setdefault('weather_model', []).append(args.weather_model)
        Path(json_path).write_text(json.dumps(json_data))
        # browse image: needed for HyP3 ingest when re-uploading the product
        # (reference: cli/raider.py:656-661)
        browse_path = aws.get_s3_file(args.bucket, in_prefix, '.png')
        if browse_path is None:
            raise ValueError('GUNW browse image could not be found at S3 location')

        # graceful exits so downstream processing can continue
        gunw_id = Path(args.file).name.replace('.nc', '')
        if args.weather_model == 'HRRR' and args.interpolate_time == 'azimuth_time_grid':
            try:
                ok = check_hrrr_dataset_availablity_for_s1_azimuth_time_interpolation(gunw_id)
            except Exception:
                ok = True
            if not ok:
                print('The required HRRR data is not available; exiting so the process can continue')
                return

    if not check_weather_model_availability(args.file, args.weather_model):
        print(
            f'Weather model {args.weather_model} is not available for the '
            'acquisition dates; exiting gracefully so the process can continue'
        )
        return

    # prep + run the two-epoch delay calculation
    path_cfg, wavelength = prep_from_gunw(
        args.file, args.weather_model, args.output_directory,
        interpolate_time=args.interpolate_time,
        api_uid=args.api_uid, api_key=args.api_key,
    )
    cube_paths = calcDelays([str(path_cfg)])
    assert len(cube_paths) == 2, 'Incorrect number of delay files retrieved'

    # package into the GUNW
    tropo_gunw_slc(cube_paths, args.file, wavelength)

    if args.bucket:
        from raider_tpu.workflows import aws

        aws.upload_file_to_s3(args.file, args.bucket, args.bucket_prefix)
        aws.upload_file_to_s3(json_path, args.bucket, args.bucket_prefix)
        aws.upload_file_to_s3(browse_path, args.bucket, args.bucket_prefix)
    return cube_paths
