"""Combine model delay CSVs and merge them with GNSS ZTD observations.

Capability parity: reference tools/RAiDER/gnss/processDelayFiles.py.
"""

import argparse
import datetime as dt
import math
import os
import re
from pathlib import Path
import pandas as pd

_ROT_RATE_DEG_PER_HR = 360.0 / 23.9333333333  # earth rotation for local time


def getDateTime(path) -> dt.datetime:
    """(reference: processDelayFiles.py:80-84)."""
    match = re.compile(r'\d{8}T\d{6}').search(Path(path).name)
    return dt.datetime.strptime(match.group(), '%Y%m%dT%H%M%S')


def addDateTimeToFiles(file_paths, force: bool = False, verbose: bool = False) -> None:
    """(reference: processDelayFiles.py:53-77)."""
    for path in file_paths:
        data = pd.read_csv(path)
        if 'Datetime' in data.columns and not force:
            continue
        try:
            data['Datetime'] = getDateTime(path)
            data = data.dropna(how='any').drop_duplicates()
            data.to_csv(path, index=False)
        except (AttributeError, ValueError):
            print(f'File {path} does not contain datetime info, skipping')


def readZTDFile(filename, col_name: str = 'ZTD') -> pd.DataFrame:
    """(reference: processDelayFiles.py:214-224)."""
    try:
        data = pd.read_csv(filename, parse_dates=['Date'])
        times = data['times'].apply(lambda x: dt.timedelta(seconds=x))
        data['Datetime'] = data['Date'] + times
    except (KeyError, ValueError):
        data = pd.read_csv(filename, parse_dates=['Datetime'])
    return data.rename(columns={col_name: 'ZTD'})


def pass_common_obs(reference: pd.DataFrame, target: pd.DataFrame, localtime=None) -> pd.DataFrame:
    """(reference: processDelayFiles.py:109-126)."""
    if isinstance(target['Datetime'].iloc[0], str):
        target = target.copy()
        target['Datetime'] = pd.to_datetime(target['Datetime'])
    sel = (
        target['Datetime'].dt.date.isin(reference['Datetime'].dt.date)
        & target['ID'].isin(reference['ID'])
    )
    if localtime:
        sel &= target[localtime].isin(reference[localtime])
    return target[sel]


def concatDelayFiles(fileList, sort_list=('ID', 'Datetime'), return_df: bool = False,
                     outName=None, source: str = 'model', ref=None, col_name: str = 'ZTD'):
    """(reference: processDelayFiles.py:128-164)."""
    df_list = []
    for f in fileList:
        if source == 'model':
            df_list.append(pd.read_csv(f, parse_dates=['Datetime']))
        else:
            df_list.append(readZTDFile(f, col_name=col_name))
    if ref:
        dfr = pd.read_csv(ref, parse_dates=['Datetime'])
        df_list = [pass_common_obs(dfr, df) for df in df_list]
    df_c = pd.concat(df_list, ignore_index=True).drop_duplicates().reset_index(drop=True)
    df_c = df_c.sort_values(by=list(sort_list))
    if return_df or outName is None:
        return df_c
    df_c.dropna(how='any').drop_duplicates().to_csv(outName, index=False)
    return None


def combineDelayFiles(out_path, loc=Path.cwd(), source: str = 'model', ext: str = '.csv',
                      ref=None, col_name: str = 'ZTD') -> None:
    """(reference: processDelayFiles.py:18-50)."""
    file_paths = list(Path(loc).glob('*' + ext))
    if source == 'model':
        addDateTimeToFiles(file_paths)
    if len(file_paths) == 1:
        if source == 'model':
            import shutil

            shutil.copy(file_paths[0], out_path)
        else:
            df = readZTDFile(file_paths[0], col_name=col_name)
            df.dropna(how='any').drop_duplicates().to_csv(out_path, index=False)
        return
    try:
        concatDelayFiles(file_paths, sort_list=['ID', 'Datetime'], outName=out_path, source=source)
    except Exception:
        concatDelayFiles(file_paths, sort_list=['ID', 'Date'], outName=out_path,
                         source=source, ref=ref, col_name=col_name)


def update_time(row, localTime_hrs):
    """(reference: processDelayFiles.py:87-106)."""
    local_estimate = row['Datetime'].replace(hour=localTime_hrs, minute=0, second=0)
    time_shift = dt.timedelta(days=0)
    days_diff = (
        row['Datetime'] - dt.timedelta(seconds=math.floor(row['Localtime']) * 3600)
    ).day - local_estimate.day
    if row['Lon'] < 0 and days_diff != 0:
        time_shift = dt.timedelta(days=1)
    if row['Lon'] > 0 and days_diff != 0:
        time_shift = -dt.timedelta(days=1)
    return local_estimate + dt.timedelta(seconds=row['Localtime'] * 3600) + time_shift


def local_time_filter(raiderFile, ztdFile, dfr, dfz, localTime):
    """(reference: processDelayFiles.py:167-211)."""
    hrs = int(localTime.split(' ')[0])
    thresh = int(localTime.split(' ')[1])
    for df in (dfr, dfz):
        # local-time shift from 0-longitude: rotation rate 360 deg / 23.933 hr
        df['Localtime'] = df['Lon'] / _ROT_RATE_DEG_PER_HR
        df['Localtime'] = df.apply(lambda r: update_time(r, hrs), axis=1)
        df['Localtime_u'] = df['Localtime'] + dt.timedelta(hours=thresh)
        df['Localtime_l'] = df['Localtime'] - dt.timedelta(hours=thresh)
    dfr = dfr[(dfr['Datetime'] >= dfr['Localtime_l']) & (dfr['Datetime'] <= dfr['Localtime_u'])]
    dfz = dfz[(dfz['Datetime'] >= dfz['Localtime_l']) & (dfz['Datetime'] <= dfz['Localtime_u'])]
    dfr = dfr.dropna(how='any').drop_duplicates().drop(columns=['Localtime_l', 'Localtime_u'])
    dfz = dfz.dropna(how='any').drop_duplicates().drop(columns=['Localtime_l', 'Localtime_u'])
    return dfr, dfz


def main(raider_file, ztd_file, col_name: str = 'ZTD', raider_delay: str = 'totalDelay',
         out_path=None, local_time=None):
    """Merge combined model delays with GNSS ZTD and compute residuals
    (reference: processDelayFiles.py:348-443)."""
    print(f'Merging delay files {raider_file} and {ztd_file}')
    dfr = pd.read_csv(raider_file, parse_dates=['Datetime'])
    expected = ['ID', 'Lat', 'Lon', 'Hgt_m', 'Datetime', 'wetDelay', 'hydroDelay', raider_delay]
    dfr = dfr.drop(columns=[c for c in dfr if c not in expected])
    dfr['Datetime'] = dfr['Datetime'].apply(
        lambda x: x - dt.timedelta(minutes=x.minute % 5, seconds=x.second, microseconds=x.microsecond)
    )

    dfz = pd.read_csv(ztd_file, parse_dates=['Date'])
    if 'Datetime' not in dfz.keys():
        if 'Date' in dfz.keys():
            date = dfz['Date'].apply(lambda x: x.strftime('%Y-%m-%d'))
            if 'times' in dfz.keys():
                tm = dfz['times'].apply(lambda x: dt.timedelta(seconds=x))
                dfz['Datetime'] = pd.to_datetime(date) + tm
            else:
                dfz['Datetime'] = pd.to_datetime(date)
        else:
            raise ValueError(
                f'Datetime key not found in {ztd_file}; please ensure that '
                '"Datetime" or "Date" plus "times" is included'
            )
    expected = ['ID', 'Datetime', 'wet_delay', 'hydrostatic_delay', 'times', 'sigZTD',
                'Lat', 'Lon', 'Hgt_m', col_name]
    dfz = dfz.drop(columns=[c for c in dfz if c not in expected])
    dfz = dfz.rename(columns={col_name: 'ZTD'})

    dfz = pass_common_obs(dfr, dfz)
    dfr = pass_common_obs(dfz, dfr)

    common_keys = ['Datetime', 'ID']
    if local_time is not None:
        dfr, dfz = local_time_filter(raider_file, ztd_file, dfr, dfz, local_time)
        common_keys.append('Localtime')
        dfz = pass_common_obs(dfr, dfz, localtime='Localtime')
        dfr = pass_common_obs(dfz, dfr, localtime='Localtime')

    dfr = dfr.dropna(how='any').drop_duplicates()
    dfz = dfz.dropna(how='any').drop_duplicates()

    print('Beginning merge')
    dfc = dfr.merge(dfz[common_keys + ['ZTD', 'sigZTD']], how='left',
                    on=common_keys, sort=True)
    if 'Localtime' in dfc.keys():
        dfc['Localtimediff'] = abs((dfc['Datetime'] - dfc['Localtime']).dt.total_seconds() / 3600)
        dfc = dfc.loc[dfc.groupby(['ID', 'Localtime']).Localtimediff.idxmin()].reset_index(drop=True)
        dfc = dfc.drop(columns=['Localtimediff'])

    dfc['ZTD_minus_RAiDER'] = dfc['ZTD'] - dfc[raider_delay]
    print('Merge finished')

    if out_path is None:
        return dfc
    dfc.dropna(how='any').drop_duplicates().to_csv(out_path, index=False)
    return None


def file_choices(parser: argparse.ArgumentParser, choices, fname: str) -> Path:
    """Argparse type: require one of ``choices`` file extensions
    (reference: processDelayFiles.py file_choices)."""
    ext = os.path.splitext(fname)[1][1:]
    if ext not in [c.lstrip('.') for c in choices]:
        parser.error(f'File {fname} must end with one of {choices}')
    return Path(fname)


def parse_dir(parser: argparse.ArgumentParser, fname: str) -> Path:
    """Argparse type: require an existing directory
    (reference: processDelayFiles.py parse_dir)."""
    if not os.path.isdir(fname):
        parser.error(f'{fname} is not a directory')
    return Path(fname)


def create_parser() -> argparse.ArgumentParser:
    """Flag surface matches the reference exactly
    (reference: processDelayFiles.py:240-346)."""
    p = argparse.ArgumentParser(
        description='Combine delay files from a directory and merge with GNSS ZTD',
    )
    p.add_argument('--raider', dest='raider_file', required=True,
                   type=lambda s: file_choices(p, ('csv', '.csv'), s),
                   help='Combined RAiDER delay CSV (created from --raiderDir if missing)')
    p.add_argument('--raiderDir', '-d', dest='raider_folder', default=Path.cwd(),
                   type=lambda s: parse_dir(p, s))
    p.add_argument('--gnssDir', '-gd', dest='gnss_folder', default=Path.cwd(),
                   type=lambda s: parse_dir(p, s))
    p.add_argument('--gnss', dest='gnss_file', default=None,
                   type=lambda s: file_choices(p, ('csv', '.csv'), s))
    p.add_argument('--raider_column', '-r', dest='raider_column_name', default='totalDelay')
    p.add_argument('--column', '-c', dest='column_name', default='ZTD')
    p.add_argument('--out', '-o', dest='out_name', type=Path,
                   default=Path('Combined_delays.csv'))
    p.add_argument('--localtime', '-lt', dest='local_time', default=None,
                   help='"<hour> <threshold_hrs>"')
    p.add_argument('--verbose', '-v', action='store_true')
    return p


def combineZTDFiles(iargs=None) -> None:
    """CLI entry (reference: cli/raider.py:690-723)."""
    p = create_parser()
    args = p.parse_args(iargs)
    if not args.raider_file.exists():
        combineDelayFiles(args.raider_file, loc=args.raider_folder)
    if args.gnss_file is None:
        return
    if not args.gnss_file.exists():
        combineDelayFiles(args.gnss_file, loc=args.gnss_folder, source='GNSS',
                          ref=args.raider_file, col_name=args.column_name)
    main(
        args.raider_file, args.gnss_file,
        col_name=args.column_name,
        raider_delay=args.raider_column_name,
        out_path=args.out_name,
        local_time=args.local_time,
    )
