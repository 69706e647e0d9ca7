"""Idempotent weather-model preparation (download/reuse -> load -> write).

Capability parity: reference tools/RAiDER/processWM.py:23-134. The processed
netCDF filename (model + time + bounds) is the cache key.
"""

import os

import numpy as np

from raider_tpu.io import read_nc
from raider_tpu.logger import logger
from raider_tpu.utils.bbox import box_contains_with_translates
from raider_tpu.wx.base import make_raw_weather_data_filename
from raider_tpu.wx.exceptions import (
    CriticalError,
    DatetimeOutsideRange,
    ExistingWeatherModelTooSmall,
    TryToKeepGoingError,
)


def checkContainment_raw(path_wm_raw, ll_bounds, buffer_deg: float = 1e-5) -> bool:
    """Whether an existing raw file covers the bounds
    (reference: weatherModel.py:791-857). An unreadable/corrupt raw file
    counts as not containing the bounds (it will be re-downloaded)."""
    try:
        ds = read_nc(path_wm_raw)
    except Exception:  # noqa: BLE001 - any parse failure means re-download
        return False
    for ynames, xnames in ((('latitude',), ('longitude',)), (('y',), ('x',))):
        try:
            ys = np.asarray(ds[ynames[0]].data, dtype=np.float64)
            xs = np.asarray(ds[xnames[0]].data, dtype=np.float64)
            break
        except KeyError:
            continue
    else:
        return False
    ymin, ymax = np.nanmin(ys), np.nanmax(ys)
    xmin, xmax = np.nanmin(xs), np.nanmax(xs)
    xmin, xmax = np.mod(np.array([xmin, xmax]) + 180, 360) - 180
    s, n, w, e = ll_bounds
    return box_contains_with_translates((xmin, ymin, xmax, ymax), (w, s, e, n), buffer_deg)


def prepareWeatherModel(
    weather_model,
    time,
    ll_bounds,
    download_only: bool = False,
    makePlots: bool = False,
    force_download: bool = False,
):
    """Download (or reuse) + preprocess + write a weather model; returns the
    processed filename (reference: processWM.py:23-134)."""
    if weather_model.get_latlon_bounds() is None:
        weather_model.set_latlon_bounds(ll_bounds)

    wmLoc = weather_model.get_wmLoc()
    weather_model.setTime(time)
    path_wm_raw = make_raw_weather_data_filename(wmLoc, weather_model.Model(), time)
    path_wm_crop = weather_model.out_file(wmLoc)

    if os.path.exists(path_wm_crop) and not force_download:
        logger.warning(
            'Processed weather model already exists, please remove it ("%s") '
            'if you want to download a new one.', path_wm_crop,
        )
    elif not force_download and os.path.exists(path_wm_raw) and checkContainment_raw(path_wm_raw, ll_bounds):
        logger.warning(
            'Raw weather model already exists, please remove it ("%s") '
            'if you want to download a new one.', path_wm_raw,
        )
    else:
        os.makedirs(os.path.dirname(path_wm_raw), exist_ok=True)
        try:
            weather_model.fetch(path_wm_raw, time)
        except DatetimeOutsideRange:
            raise TryToKeepGoingError
        if force_download and os.path.exists(path_wm_crop):
            # honor the flag's documented intent: without this, load()
            # would short-circuit on the stale processed file and the fresh
            # download would never be processed (the reference has the same
            # latent gap, processWM.py:59 + weatherModel.py:245-246)
            logger.warning('force_download: removing stale processed file "%s"',
                           path_wm_crop)
            os.remove(path_wm_crop)

    if download_only:
        logger.warning('download_only flag selected. No further processing will happen.')
        return None

    f = weather_model.load()
    if f is not None:
        logger.warning('The processed weather model file already exists, so I will use that.')
        containment = weather_model.checkContainment(ll_bounds)
        # only HRRR CONUS is exempt, matching the reference's EFFECTIVE
        # behavior on both the cached and fresh-write paths: its cached-path
        # list 'HRRR HRRRAK'.split() (processWM.py:92) contains a dead entry
        # - the AK model's Model() is 'HRRR-AK', which never matches
        # 'HRRRAK' - and its fresh path exempts only 'HRRR'
        # (processWM.py:131)
        if not containment and weather_model.Model() not in ('HRRR',):
            raise ExistingWeatherModelTooSmall
        return f

    logger.debug('Number of weather model nodes: %s', np.prod(weather_model.getWetRefractivity().shape))
    logger.debug('Weather model: %s', weather_model.Model())
    logger.debug('Mean wet refractivity: %f', np.nanmean(weather_model.getWetRefractivity()))
    logger.debug('Mean hydrostatic refractivity: %f', np.nanmean(weather_model.getHydroRefractivity()))

    if makePlots:
        from raider_tpu.wx import plots

        plots.plot_wh(weather_model, savefig=True)
        plots.plot_pqt(weather_model, savefig=True)

    try:
        f = weather_model.write()
        containment = weather_model.checkContainment(ll_bounds)
    except Exception as e:
        logger.exception('Unable to save weathermodel to file')
        logger.exception(e)
        raise CriticalError
    finally:
        name = weather_model.Model()

    if not containment and name not in ('HRRR',):
        raise ExistingWeatherModelTooSmall
    return f
