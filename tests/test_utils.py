"""Utility parities: UTM, time rounding, bbox math, filenames."""

import datetime as dt

import numpy as np
import pytest

from raider_tpu.utils.bbox import box_contains_with_translates, clip_bbox
from raider_tpu.utils.misc import (
    UTM_to_WGS84,
    WGS84_to_UTM,
    convertLons,
    cosd,
    projectDelays,
    sind,
    utm_letter,
    utm_zone,
)
from raider_tpu.utils.timeutils import get_dt, get_nearest_wmtimes, round_date, round_time


def test_sind_cosd():
    np.testing.assert_allclose(sind(30.0), 0.5)
    np.testing.assert_allclose(cosd(60.0), 0.5)


def test_project_delays():
    np.testing.assert_allclose(projectDelays(2.0, 0.0), 2.0)
    np.testing.assert_allclose(projectDelays(2.0, 60.0), 4.0)
    with pytest.raises(ZeroDivisionError):
        projectDelays(2.0, 90.0)


def test_convert_lons():
    out = convertLons(np.array([0.0, 90.0, 181.0, 359.0]))
    np.testing.assert_allclose(out, [0, 90, -179, -1])


def test_utm_zone_letter():
    assert utm_zone(-118.0, 34.0) == 11
    assert utm_zone(6.0, 60.0) == 32   # Norway exception
    assert utm_letter(34.0) == 'S'


def test_utm_roundtrip():
    lons = np.array([-118.2, -117.5, 6.0])
    lats = np.array([34.0, 33.5, 60.0])
    z, letters, x, y = WGS84_to_UTM(lons, lats)
    lon2, lat2 = UTM_to_WGS84(z, letters, x, y)
    np.testing.assert_allclose(lon2, lons, atol=1e-8)
    np.testing.assert_allclose(lat2, lats, atol=1e-8)


def test_round_date_docstring():
    d = round_date(dt.datetime(2020, 1, 1, 11, 35), dt.timedelta(hours=3))
    assert d == dt.datetime(2020, 1, 1, 12)
    d = round_date(dt.datetime(2020, 1, 1, 10, 29), dt.timedelta(hours=3))
    assert d == dt.datetime(2020, 1, 1, 9)


def test_get_dt_docstring():
    assert get_dt(dt.datetime(2020, 1, 1, 5), dt.datetime(2020, 1, 1)) == 18000.0


def test_nearest_wmtimes_exact():
    # within the 60s threshold: single time
    out = get_nearest_wmtimes(dt.datetime(2020, 1, 1, 12, 0, 30), 3)
    assert out == [dt.datetime(2020, 1, 1, 12)]


def test_clip_bbox():
    out = clip_bbox([33.05, 34.01, -118.17, -117.43], 0.1)
    np.testing.assert_allclose(out, [33.0, 34.1, -118.2, -117.4])


def test_containment_translates():
    # weather box crossing the antimeridian expressed past 180
    outer = (170.0, 50.0, 190.0, 60.0)
    assert box_contains_with_translates(outer, (172.0, 52.0, 178.0, 58.0))
    assert box_contains_with_translates(outer, (-175.0, 52.0, -172.0, 58.0))
    assert not box_contains_with_translates(outer, (150.0, 52.0, 160.0, 58.0))


def test_make_delay_filenames_docstring():
    """Reference docstring example (checkArgs.py:117-121)."""
    from pathlib import Path

    from raider_tpu.workflows.check_args import makeDelayFileNames

    wet, hydro = makeDelayFileNames(dt.datetime(2020, 1, 1, 0, 0, 0), None, 'h5',
                                    'model_name', Path('some_dir'))
    assert wet == 'some_dir/model_name_wet_20200101T000000_ztd.h5'
    assert hydro == 'some_dir/model_name_hydro_20200101T000000_ztd.h5'
    wet, hydro = makeDelayFileNames(None, None, 'h5', 'model_name', Path('some_dir'))
    assert wet == 'some_dir/model_name_wet_ztd.h5'


class TestDateParsing:
    """Reference: test/test_datelist.py patterns."""

    def test_date_list_string(self):
        from raider_tpu.workflows.config import DateGroupUnparsed, parse_dates

        out = parse_dates(DateGroupUnparsed(date_list='[20200124, 20200130]'))
        assert out.date_list == [dt.date(2020, 1, 24), dt.date(2020, 1, 30)]

    def test_date_range_with_step(self):
        from raider_tpu.workflows.config import DateGroupUnparsed, parse_dates

        out = parse_dates(DateGroupUnparsed(date_start=20200101, date_end=20200107, date_step=3))
        assert out.date_list == [dt.date(2020, 1, 1), dt.date(2020, 1, 4), dt.date(2020, 1, 7)]

    def test_single_date(self):
        from raider_tpu.workflows.config import DateGroupUnparsed, parse_dates

        out = parse_dates(DateGroupUnparsed(date_start='2020-01-30'))
        assert out.date_list == [dt.date(2020, 1, 30)]

    def test_missing_raises(self):
        from raider_tpu.workflows.config import DateGroupUnparsed, parse_dates

        with pytest.raises(ValueError):
            parse_dates(DateGroupUnparsed())

    def test_time_formats(self):
        from raider_tpu.workflows.config import TimeGroup

        for v in ('13:52:45', 'T13:52:45', '135245', 'T135245', '13:52'):
            t = TimeGroup.coerce_into_time(v)
            assert t.hour == 13 and t.minute == 52
        with pytest.raises(ValueError):
            TimeGroup.coerce_into_time('not-a-time')


class TestHrrrBoundsIndices:
    """Reference: test_weather_model.py get_bounds_indices golden."""

    def test_simple_grid(self):
        from raider_tpu.wx.hrrr import get_bounds_indices

        ll = np.arange(-20, 20)
        lats, lons = np.meshgrid(ll, ll, indexing='ij')
        xmin, xmax, ymin, ymax = get_bounds_indices([-10, 10, -10, 10], lats, lons)
        assert xmin == 10 and ymin == 10

    def test_no_overlap_raises(self):
        from raider_tpu.wx.exceptions import NoWeatherModelData
        from raider_tpu.wx.hrrr import get_bounds_indices

        ll = np.arange(0, 10)
        lats, lons = np.meshgrid(ll, ll, indexing='ij')
        with pytest.raises(NoWeatherModelData):
            get_bounds_indices([50, 60, 50, 60], lats, lons)


class TestUtilGoldens:
    """Pure-function goldens mirrored from reference test/test_util.py."""

    def test_least_nonzero(self):
        from raider_tpu.wx.base import _least_nonzero

        a = np.arange(20, dtype='float64').reshape(2, 2, 5)
        a[0, 0, 0] = np.nan
        a[1, 1, 0] = np.nan
        np.testing.assert_allclose(_least_nonzero(a), [[1, 5], [10, 16]], atol=1e-16)

        b = np.array([
            [[10., 5., np.nan], [11., np.nan, 1], [18, 17, 16]],
            [[np.nan, 12., 6.], [np.nan, 13., 20.], [np.nan, np.nan, np.nan]],
        ])
        out = _least_nonzero(b)
        np.testing.assert_allclose(out[0], [10, 11, 18])
        np.testing.assert_allclose(out[1][:2], [12, 13])
        assert np.isnan(out[1][2])

    def test_get_time_from_file(self):
        from raider_tpu.utils.timeutils import getTimeFromFile

        assert getTimeFromFile('abcd_2020_01_01_T00_00_00jijk.xyz') == \
            dt.datetime(2020, 1, 1, 0, 0, 0)

    def test_floorish(self):
        from raider_tpu.utils.timeutils import floorish

        assert np.isclose(floorish(5.6, 0.2), 5.4)
        assert np.isclose(floorish(5.71, 0.2), 5.6)
        assert np.isclose(floorish(5.71, 1), 5)

    def test_pad_lower(self):
        from raider_tpu.wx.base import pad_lower

        rng = np.random.default_rng(0)
        test = rng.standard_normal((2, 3, 4))
        val = test[1, 2, 1]
        test[1, 2, 0] = np.nan
        out = pad_lower(test)
        assert out.shape == (2, 3, 5)
        assert out[1, 2, 0] == val

    def test_enu2ecef_goldens(self):
        from raider_tpu.geodesy import enu2ecef

        cases = [
            ((0, 0, 1), (0, 0, 0), (1, 0, 0)),
            ((0, 0, 1), (0, 90, 0), (0, 1, 0)),
            ((0, 0, 1), (0, -90, 0), (0, -1, 0)),
            ((0, 0, 1), (90, 0, 0), (0, 0, 1)),
            ((0, 0, 1), (-90, 0, 0), (0, 0, -1)),
            ((0, 1, 0), (0, 0, 0), (0, 0, 1)),
        ]
        for enu, llh, expected in cases:
            out = np.asarray(enu2ecef(enu[0], enu[1], enu[2], llh[0], llh[1], llh[2]))
            np.testing.assert_allclose(out.ravel(), expected, atol=1e-12)

    def test_ecef2enu_goldens(self):
        from raider_tpu.geodesy import ecef2enu

        cases = [
            ((0, 0, 1), (0, 0, 0), (0, 1, 0)),
            ((0, 0, 1), (0, 90, 0), (0, 1, 0)),
            ((0, 0, 1), (0, -90, 0), (0, 1, 0)),
            ((0, 0, 1), (90, 0, 0), (0, 0, 1)),
            ((0, 0, 1), (-90, 0, 0), (0, 0, -1)),
            ((0, 0, -1), (0, -180, 0), (0, -1, 0)),
            ((0, 0, 1), (0, -180, 1000), (0, 1, 0)),
            ((1, 1, 0), (0, 0, 0), (1, 0, 1)),
            ((1, 1, 0), (0, 180, 0), (-1, 0, -1)),
        ]
        for xyz, llh, expected in cases:
            out = np.asarray(ecef2enu(np.array(xyz, dtype=float), llh[0], llh[1], llh[2]))
            np.testing.assert_allclose(out.ravel(), expected, atol=1e-12)

    def test_project_hawaii_golden(self):
        """UTM from latlong.net as an independent check
        (reference: test_util.py:296-303)."""
        from raider_tpu.utils.misc import project

        tup = project((-155.742188, 19.808054))
        assert tup[0] == 5 and tup[1] == 'Q'
        np.testing.assert_allclose((tup[2], tup[3]), (212721.65, 2192571.64), atol=2.0)

    def test_transform_bbox_identity_and_utm(self):
        from raider_tpu.geometry.aoi import transform_bbox

        snwe = [34.0, 35.0, -77.0, -76.0]
        assert list(transform_bbox(snwe, src_crs=4326, dest_crs=4326)) == snwe
        out = transform_bbox(snwe, src_crs=4326, dest_crs=32618)
        expected = [3762606.66, 3874870.63, 315290.17, 408746.75]
        np.testing.assert_allclose(out, expected, rtol=1e-2)

    def test_unproject_hemispheres(self):
        from raider_tpu.utils.misc import project, unproject

        lng, lat = unproject(33, 'N', 500000, 4649776.22482)
        assert abs(lng - 15.0) < 0.01 and 41 < lat < 43
        lng_s, lat_s = unproject(33, 'K', 500000, 4649776.22482)
        assert lat_s < 0  # southern false-northing removed
        # roundtrip through project
        z, ltr, x, y = project((lng, lat))
        assert z == 33
        lng2, lat2 = unproject(z, ltr, x, y)
        np.testing.assert_allclose((lng2, lat2), (lng, lat), atol=1e-6)

    def test_unproject_invalid_zone(self):
        from raider_tpu.utils.misc import unproject

        with pytest.raises(Exception):
            unproject(99, 'N', 500000, 4649776.22482)
