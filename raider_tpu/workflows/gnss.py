"""GNSS zenith-delay acquisition: UNR archive download and SINEX-trop parsing.

Capability parity: reference tools/RAiDER/gnss/downloadGNSSDelays.py and
tools/RAiDER/getStationDelays.py. Network IO is parallelized with a thread
pool (it is IO-bound; the reference uses a process pool).
"""

import argparse
import datetime as dt
import gzip
import io
import itertools
import os
import zipfile
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Optional

import numpy as np
import pandas as pd

from raider_tpu.logger import logger
from raider_tpu.wx.exceptions import NoStationDataFoundError

_UNR_URL = 'https://geodesy.unr.edu/'
NEW_STATION_FILENAME = 'gnssStationList_overbbox'


# ------------------------------------------------------------- station lists

def get_station_list(bbox=None, stationFile=None, writeLoc=None,
                     name_appendix: str = '', writeStationFile: bool = True):
    """Stations within a bbox, from UNR holdings or a user file
    (reference: downloadGNSSDelays.py:25-68)."""
    if stationFile is not None:
        try:
            station_data = pd.read_csv(stationFile)
        except Exception:
            stations = []
            names = None
            with open(stationFile) as f:
                for k, line in enumerate(f):
                    if k == 0:
                        names = line.strip().split()
                    else:
                        stations.append(line.strip().split())
            station_data = pd.DataFrame(stations, columns=names)
    else:
        station_data = get_stats_by_llh(llhBox=bbox)

    if writeStationFile:
        output_file = os.path.join(writeLoc or os.getcwd(),
                                   NEW_STATION_FILENAME + name_appendix + '.csv')
        station_data.to_csv(output_file, index=False)
        return list(station_data['ID'].values), output_file
    return list(station_data['ID'].values), station_data


def get_stats_by_llh(llhBox=None, baseURL: str = _UNR_URL) -> pd.DataFrame:
    """UNR llh.out station holdings filtered to a bbox
    (reference: downloadGNSSDelays.py:70-91)."""
    if llhBox is None:
        llhBox = [-90, 90, 0, 360]
    S, N, W, E = llhBox
    if W < 0 or E < 0:
        raise ValueError('get_stats_by_llh: bounding box must be on lon range [0, 360]')
    stations = pd.read_csv(f'{baseURL}NGLStationPages/llh.out', sep=r'\s+',
                           names=['ID', 'Lat', 'Lon', 'Hgt_m'])
    stations['Lon'] = ((stations['Lon'].values + 180) % 360) - 180
    return filterToBBox(stations, llhBox)


def filterToBBox(stations: pd.DataFrame, llhBox) -> pd.DataFrame:
    """Filter a station dataframe by lat/lon ([0, 360] lon bounds;
    reference: downloadGNSSDelays.py:331-366)."""
    S, N, W, E = llhBox
    if W < 0 or E < 0:
        raise ValueError('llhBox longitude format should 0-360')
    keys = stations.columns
    lat_keys = ['lat', 'latitude', 'Lat', 'Latitude']
    lon_keys = ['lon', 'longitude', 'Lon', 'Longitude']
    index = next((k for k, key in enumerate(lat_keys) if key in list(keys)), None)
    if index is None:
        raise KeyError('filterToBBox: No valid column names found for latitude and longitude')
    lat_key, lon_key = lat_keys[index], lon_keys[index]
    if stations[lon_key].min() < 0:
        W, E = (((d + 180) % 360) - 180 for d in (W, E))
    mask = (
        (stations[lat_key] > S) & (stations[lat_key] < N)
        & (stations[lon_key] < E) & (stations[lon_key] > W)
    )
    return stations[mask]


# ------------------------------------------------------------------ download

def download_tropo_delays(stats, years, gps_repo: str = 'UNR', writeDir: str = '.',
                          numCPUs: int = 8, download: bool = False) -> None:
    """Check for / download per-station-year trop archives
    (reference: downloadGNSSDelays.py:94-141)."""
    if not isinstance(stats, (list, str)):
        raise TypeError('stats should be a string or a list of strings')
    if not isinstance(years, (list, int)):
        raise TypeError('years should be an int or a list of ints')
    if isinstance(stats, str):
        stats = [stats]
    if isinstance(years, int):
        years = [years]
    if gps_repo != 'UNR':
        raise NotImplementedError(f'download_tropo_delays: gps_repo "{gps_repo}" not yet implemented')

    tups = list(itertools.product(stats, years))
    with ThreadPoolExecutor(max_workers=numCPUs) as pool:
        results = list(pool.map(lambda t: download_UNR(t[0], t[1], writeDir, download), tups))
    results = [r for r in results if r['path']]
    if len(results) == 0:
        raise NoStationDataFoundError(station_list=stats, years=years)
    stat_df = pd.DataFrame(results).set_index('ID')
    stat_df.to_csv(os.path.join(writeDir, f'{gps_repo}{NEW_STATION_FILENAME}_withpaths.csv'))


def download_UNR(statID: str, year: int, writeDir: str = '.', download: bool = False,
                 baseURL: str = _UNR_URL) -> dict:
    """(reference: downloadGNSSDelays.py:144-165)."""
    if baseURL != _UNR_URL:
        raise NotImplementedError(f'Data repository {baseURL} has not yet been implemented')
    url = '{0}gps_timeseries/trop/{1}/{1}.{2}.trop.zip'.format(baseURL, statID.upper(), year)
    logger.debug('Currently checking station %s in %s', statID, year)
    if download:
        save_loc = os.path.abspath(os.path.join(writeDir, f'{statID.upper()}.{year}.trop.zip'))
        filepath = download_url(url, save_loc)
        if filepath == '':
            raise ValueError('Year or station ID does not exist')
    else:
        filepath = check_url(url)
    return {'ID': statID, 'year': year, 'path': filepath}


def _retry_session(retries: int = 10):
    """(reference: utilFcns.py:633-647)."""
    import requests
    from requests.adapters import HTTPAdapter
    from urllib3.util.retry import Retry

    session = requests.Session()
    retry = Retry(total=retries, read=retries, connect=retries, backoff_factor=0.3,
                  status_forcelist=list(range(429, 505)))
    adapter = HTTPAdapter(max_retries=retry)
    session.mount('http://', adapter)
    session.mount('https://', adapter)
    return session


def download_url(url: str, save_path: str, chunk_size: int = 2048) -> str:
    session = _retry_session()
    r = session.get(url, stream=True)
    if r.status_code == 404:
        return ''
    with open(save_path, 'wb') as fd:
        for chunk in r.iter_content(chunk_size=chunk_size):
            fd.write(chunk)
    return save_path


def check_url(url: str) -> str:
    session = _retry_session()
    r = session.head(url)
    return '' if r.status_code == 404 else url


# -------------------------------------------------------------- SINEX parse

def get_date(tokens) -> tuple:
    """Date from a trop-file name split on '.' (reference: getStationDelays.py:267-273)."""
    year = int(tokens[1])
    doy = int(tokens[2])
    return dt.datetime(year, 1, 1) + dt.timedelta(doy - 1), year, doy


def seconds_of_day(returnTime) -> Optional[int]:
    """(reference: getStationDelays.py:276-282). None passes through,
    meaning "all times" (the reference documents this for --returntime but
    crashes on it; we honor the documented behavior)."""
    if returnTime is None:
        return None
    if isinstance(returnTime, dt.time):
        return returnTime.hour * 3600 + returnTime.minute * 60 + returnTime.second
    h, m, s = map(int, str(returnTime).split(':'))
    return h * 3600 + m * 60 + s


def get_delays_UNR(stationFile, filename, dateList: List[str], returnTime=None) -> None:
    """Parse a UNR SINEX-trop zip into a per-station CSV time series
    (reference: getStationDelays.py:25-190). Delays in meters; 300 s cadence
    with missing times masked to NaN."""
    if str(stationFile).startswith('http'):
        r = _retry_session().get(stationFile)
        ziprepo = zipfile.ZipFile(io.BytesIO(r.content))
    else:
        ziprepo = zipfile.ZipFile(stationFile)

    for j in sorted(ziprepo.namelist()):
        time, _, doy_from_file = get_date(os.path.basename(j).split('.'))
        if time.strftime('%Y-%m-%d') not in dateList:
            continue
        f = gzip.open(ziprepo.open(j), 'rb')
        d, sig, dwet, dhydro, times_list = [], [], [], [], []
        site = None
        flag = False
        for line in f.readlines():
            try:
                line = line.decode('utf-8')
            except UnicodeDecodeError:
                line = line.decode('latin-1')
            if flag:
                if 'SITE' in line:
                    continue
                try:
                    split_lines = line.split()
                    # units: mm, mm, mm, deg x4, mm, mm, K
                    trotot, trotot_sd, trwet = (float(t) for t in split_lines[2:5])
                except (ValueError, IndexError):
                    continue
                site = split_lines[0]
                year, doy, seconds = (int(n) for n in split_lines[1].split(':'))
                if doy != doy_from_file:
                    logger.warning(
                        'time %s from line in conflict with time %s from file %s',
                        doy, doy_from_file, j,
                    )
                    continue
                d.append(trotot * 0.001)
                sig.append(trotot_sd * 0.001)
                dwet.append(trwet * 0.001)
                dhydro.append((trotot - trwet) * 0.001)
                times_list.append(seconds)
            if 'TROP/SOLUTION' in line:
                flag = True
        del f
        if not d:
            logger.warning('file %s is empty, continuing', j)
            continue

        true_times = list(range(0, 86400, 300))
        if len(times_list) != len(true_times):
            mask = np.array([t not in times_list for t in true_times])
            delay = np.full((288,), np.nan)
            sig_a = np.full((288,), np.nan)
            wet_delay = np.full((288,), np.nan)
            hydro_delay = np.full((288,), np.nan)
            delay[~mask] = d
            sig_a[~mask] = sig
            wet_delay[~mask] = dwet
            hydro_delay[~mask] = dhydro
            times = np.array(true_times)
        else:
            delay = np.array(d)
            times = np.array(times_list)
            sig_a = np.array(sig)
            wet_delay = np.array(dwet)
            hydro_delay = np.array(dhydro)

        if returnTime is None:
            rows = {
                'ID': [site] * len(wet_delay),
                'Date': [time] * len(wet_delay),
                'ZTD': delay,
                'wet_delay': wet_delay,
                'hydrostatic_delay': hydro_delay,
                'times': times,
                'sigZTD': sig_a,
            }
            out = pd.DataFrame(rows)
        else:
            # nearest epoch WITH data in the (possibly re-aligned) arrays:
            # the reference indexes the raw timesList after re-aligning the
            # delay arrays to the full 300 s grid (getStationDelays.py:137-167),
            # returning a different epoch's value when epochs are missing
            t_arr = np.asarray(times, dtype=float)
            gap = np.abs(t_arr - returnTime)
            gap = np.where(np.isnan(np.asarray(delay, dtype=float)), np.inf, gap)
            index = int(np.argmin(gap))
            out = pd.DataFrame([{
                'ID': site, 'Date': time, 'ZTD': delay[index],
                'wet_delay': wet_delay[index], 'hydrostatic_delay': hydro_delay[index],
                'times': times[index], 'sigZTD': sig_a[index],
            }])
        if Path(filename).exists():
            out.to_csv(filename, index=False, mode='a', header=False)
        else:
            out.to_csv(filename, index=False)
    del ziprepo


def get_station_data(inFile, dateList, gps_repo: Optional[str] = None, numCPUs: int = 8,
                     outDir: Optional[str] = None, returnTime=None) -> None:
    """Per-station parse + merged network CSV
    (reference: getStationDelays.py:192-265)."""
    outDir = outDir or os.getcwd()
    pathbase = Path(outDir) / 'GPS_delays'
    pathbase.mkdir(exist_ok=True)

    returnTime = seconds_of_day(returnTime)
    if returnTime is not None and returnTime % 3 != 0:
        grid = np.array(list(range(0, 86400, 300)))
        returnTime = int(grid[np.argmin(np.abs(grid - returnTime))])

    in_df = pd.read_csv(inFile)
    station_files = in_df['path'].to_list()

    outputfiles = []
    if len(station_files) > 0 and gps_repo == 'UNR':
        args = []
        for sf in station_files:
            station_id = os.path.basename(sf).split('.')[0]
            name = pathbase / f'{station_id}_ztd.csv'
            args.append((sf, name, dateList, returnTime))
            outputfiles.append(name)
        with ThreadPoolExecutor(max_workers=numCPUs) as pool:
            list(pool.map(lambda a: get_delays_UNR(*a), args))

    outputfiles = [p for p in outputfiles if Path(p).exists()]
    if len(outputfiles) == 0:
        raise RuntimeError('No valid delays found for specified time/region.')

    name = Path(outDir) / f'{gps_repo}combinedGPS_ztd.csv'
    stats = pd.concat([pd.read_csv(p) for p in outputfiles]).drop_duplicates()
    stats.to_csv(name, index=False, encoding='utf-8')

    origstats = pd.read_csv(inFile)
    keys = origstats.columns
    lat_key = next(k for k in ('lat', 'latitude', 'Lat', 'Latitude') if k in keys)
    lon_key = next(k for k in ('lon', 'longitude', 'Lon', 'Longitude') if k in keys)
    origstats = origstats.rename(columns={lat_key: 'Lat', lon_key: 'Lon'})

    stats = pd.read_csv(name)
    stats = pd.merge(left=stats, right=origstats[['ID', 'Lat', 'Lon', 'Hgt_m']],
                     how='left', on='ID')
    stats = stats.dropna(how='any').drop_duplicates()
    stats = stats.sort_values(['ID', 'Date'])
    stats.to_csv(name, index=False)


# ---------------------------------------------------------------- entrypoint

def downloadGNSS(iargs: Optional[list] = None) -> None:
    """Download GNSS ZTD archives over an AOI
    (reference: cli/raider.py:406-510, downloadGNSSDelays.py:218-277)."""
    from raider_tpu.workflows.config import TimeGroup, coerce_into_date

    p = argparse.ArgumentParser(
        description='Check for and download tropospheric zenith delays for a set of GNSS stations',
    )
    p.add_argument('--out', default='.', help='Output directory')
    p.add_argument('--date', dest='dateList', nargs='+', required=True,
                   help='Date(s) YYYYMMDD or range YYYYMMDD YYYYMMDD [step]')
    p.add_argument('--returntime', dest='time', default=None,
                   help='Time of day HH:MM:SS to return delays for '
                        '(default: all times)')
    p.add_argument('-b', '--bounding_box', '--bbox', dest='bounding_box', default=None,
                   help='Bounding box "S N W E"')
    p.add_argument('--station_file', '-f', default=None,
                   help='CSV of station IDs/locations')
    p.add_argument('--gpsrepo', '-gr', dest='gps_repo', default='UNR')
    p.add_argument('--download', action='store_true', default=False,
                   help='Physically download the archives (virtual access otherwise)')
    p.add_argument('--cpus', default='all',
                   type=lambda v: os.cpu_count() if v == 'all' else int(v),
                   help='Worker count, or "all"')
    p.add_argument('--verbose', '-v', action='count', default=0)
    args = p.parse_args(iargs)

    # parse dates: single, list, or start/end[/step]
    toks = args.dateList
    if len(toks) == 1:
        dates = [coerce_into_date(toks[0])]
    elif len(toks) in (2, 3):
        start = coerce_into_date(toks[0])
        end = coerce_into_date(toks[1])
        step = int(toks[2]) if len(toks) == 3 else 1
        dates = [start + dt.timedelta(days=k) for k in range(0, (end - start).days + 1, step)]
    else:
        dates = [coerce_into_date(t) for t in toks]

    return_time = TimeGroup.coerce_into_time(args.time) if args.time else None
    out = args.out
    os.makedirs(out, exist_ok=True)

    if args.bounding_box:
        bbox, long_cross_zero = _parse_gnss_bbox(args.bounding_box)
    else:
        bbox = [-90, 90, 0, 360]
        long_cross_zero = 1

    stats, statdf = _get_stats(bbox, long_cross_zero, out, args.station_file)

    years = sorted({d.year for d in dates})
    download_tropo_delays(stats, years, gps_repo=args.gps_repo, writeDir=out,
                          numCPUs=args.cpus, download=args.download)

    paths_file = os.path.join(out, f'{args.gps_repo}{NEW_STATION_FILENAME}_withpaths.csv')
    pathsdf = pd.read_csv(paths_file)
    pathsdf = pd.merge(left=pathsdf, right=statdf, how='left', on='ID')
    pathsdf.to_csv(paths_file, index=False)

    date_strs = [d.strftime('%Y-%m-%d') for d in dates]
    get_station_data(paths_file, date_strs, gps_repo=args.gps_repo, numCPUs=args.cpus,
                     outDir=out, returnTime=return_time)
    logger.debug('Completed processing')


def _parse_gnss_bbox(bounding_box):
    """(reference: downloadGNSSDelays.py:279-302)."""
    if isinstance(bounding_box, str) and not os.path.isfile(bounding_box):
        bbox = [float(val) for val in bounding_box.split()]
    elif isinstance(bounding_box, list):
        bbox = [float(v) for v in bounding_box]
    else:
        raise Exception('Passing a file with a bounding box not yet supported.')
    long_cross_zero = 1 if bbox[2] * bbox[3] < 0 else 0
    if bbox[2] < 0:
        bbox[2] += 360
    if bbox[3] < 0:
        bbox[3] += 360
    return bbox, long_cross_zero


def _get_stats(bbox, long_cross_zero, out, station_file):
    """(reference: downloadGNSSDelays.py:304-328)."""
    if long_cross_zero == 1:
        bbox1 = bbox.copy()
        bbox2 = bbox.copy()
        bbox1[3] = 360.0
        bbox2[2] = 0.0
        stats1, statdata1 = get_station_list(bbox=bbox1, stationFile=station_file,
                                             writeStationFile=False)
        stats2, statdata2 = get_station_list(bbox=bbox2, stationFile=station_file,
                                             writeStationFile=False)
        stats = list(set(stats1 + stats2))
        statdata = pd.concat([statdata1, statdata2], ignore_index=True).drop_duplicates(subset=['ID'])
    else:
        if bbox[3] < bbox[2]:
            bbox[3] = 360.0
        stats, statdata = get_station_list(bbox=bbox, stationFile=station_file,
                                           writeStationFile=False)
    statdata.to_csv(os.path.join(out, NEW_STATION_FILENAME + '.csv'), index=False)
    return stats, statdata
