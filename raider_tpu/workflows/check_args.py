"""Post-parse argument validation and output filename generation.

Capability parity: reference tools/RAiDER/checkArgs.py:21-133.
"""

import datetime as dt
from pathlib import Path
from typing import Optional

import pandas as pd

from raider_tpu.geometry.aoi import BoundingBox, StationFile
from raider_tpu.geometry.los import LOS, Zenith
from raider_tpu.logger import logger
from raider_tpu.workflows.config import RunConfig

_RASTER_EXTS = {
    'ENVI': '.dat',
    'ISCE': '.dat',
    'GTIFF': '.tiff',  # rasterio's driver->extension inversion yields 'tiff'
    'NC': '.nc',
    'NETCDF': '.nc',
    'HDF5': '.h5',
}


def get_raster_ext(fmt: str) -> str:
    try:
        return _RASTER_EXTS[fmt.upper().lstrip('.')]
    except KeyError:
        raise ValueError(f'{fmt} is not a valid raster file format')


def makeDelayFileNames(date: Optional[dt.date], los: Optional[LOS], outformat: str,
                       weather_model_name: str, out: Path) -> tuple:
    """Wet/hydro delay output filenames (reference: checkArgs.py:113-133)."""
    fmt = '{model_name}_{{}}_{time}{los}.{ext}'.format(
        model_name=weather_model_name,
        time=date.strftime('%Y%m%dT%H%M%S_') if date is not None else '',
        los='ztd' if (isinstance(los, Zenith) or los is None) else 'std',
        ext=outformat.lstrip('.'),
    )
    hydroname, wetname = (fmt.format(d) for d in ('hydro', 'wet'))
    return str(Path(out) / wetname), str(Path(out) / hydroname)


def checkArgs(run_config: RunConfig) -> RunConfig:
    """(reference: checkArgs.py:21-96)."""
    run_config.runtime_group.output_directory.mkdir(exist_ok=True)
    run_config.runtime_group.weather_model_directory.mkdir(exist_ok=True)
    run_config.weather_model.set_wmLoc(str(run_config.runtime_group.weather_model_directory))

    run_config.date_group.date_list = [
        dt.datetime.combine(d, run_config.time_group.time)
        for d in run_config.date_group.date_list
    ]
    if len(run_config.date_group.date_list) > 1 and run_config.los_group.orbit_file is not None:
        logger.warning(
            'Only one orbit file is being used to get the look vectors for all requested '
            'times. If you want separate orbit files, run separately for each time.'
        )
    run_config.los_group.los.setTime(run_config.date_group.date_list[0])

    wet_names, hydro_names = [], []
    for d in run_config.date_group.date_list:
        aoi = run_config.aoi_group.aoi
        if not isinstance(aoi, BoundingBox):
            if isinstance(aoi, StationFile):
                wet = str(
                    run_config.runtime_group.output_directory /
                    f'{run_config.weather_model._dataset.upper()}_Delay_'
                    f'{d.strftime("%Y%m%dT%H%M%S")}_ztd.csv'
                )
                hydro = ''
                indf = pd.read_csv(aoi._filename).drop_duplicates(subset=['Lat', 'Lon'])
                indf.to_csv(wet, index=False)
            else:
                fmt = get_raster_ext(run_config.runtime_group.file_format)
                wet, hydro = makeDelayFileNames(
                    d, run_config.los_group.los, fmt,
                    run_config.weather_model._dataset.upper(),
                    run_config.runtime_group.output_directory,
                )
        else:
            ff = run_config.runtime_group.file_format
            if ff not in ('.nc', '.h5', 'h5', 'hdf5', '.hdf5', 'nc'):
                fmt = 'nc'
                logger.debug('Invalid extension %s for cube. Defaulting to .nc', ff)
            else:
                fmt = ff.strip('.').replace('df', '')
            wet, hydro = makeDelayFileNames(
                d, run_config.los_group.los, fmt,
                run_config.weather_model._dataset.upper(),
                run_config.runtime_group.output_directory,
            )
        wet_names.append(wet)
        hydro_names.append(hydro)

    run_config.wetFilenames = wet_names
    run_config.hydroFilenames = hydro_names
    return run_config
