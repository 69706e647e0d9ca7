"""Stats subsystem: gridding, seasonal harmonic fits, variograms."""

import datetime as dt
import pathlib

import numpy as np
import pandas as pd
import pytest

from raider_tpu.workflows.stats import (
    RaiderStats,
    empirical_variogram,
    fit_variogram,
    grid_statistic,
    make_grid,
    seasonal_fit,
)


def synthetic_gnss_csv(path, n_stations=25, n_days=365, seed=7):
    """Stations with a known annual cycle: v = mean + A sin(2 pi t + phi)."""
    rng = np.random.default_rng(seed)
    lats = rng.uniform(33, 37, n_stations)
    lons = rng.uniform(-120, -115, n_stations)
    amps = rng.uniform(0.01, 0.05, n_stations)
    rows = []
    t0 = dt.datetime(2020, 1, 1)
    for d in range(0, n_days, 5):
        t = t0 + dt.timedelta(days=d)
        frac_year = d / 365.25
        for k in range(n_stations):
            v = 2.3 + amps[k] * np.sin(2 * np.pi * frac_year)
            rows.append({
                'ID': f'ST{k:03d}', 'Lat': lats[k], 'Lon': lons[k], 'Hgt_m': 100.0,
                'Datetime': t, 'ZTD': v + rng.normal(0, 1e-4), 'sigZTD': 0.004,
            })
    df = pd.DataFrame(rows)
    df.to_csv(path, index=False)
    return amps


def test_grid_statistic_mean():
    lat_e, lon_e = make_grid([0, 2, 0, 2], 1.0)
    lats = np.array([0.5, 0.6, 1.5])
    lons = np.array([0.5, 0.4, 1.5])
    vals = np.array([1.0, 3.0, 10.0])
    g = grid_statistic(lats, lons, vals, lat_e, lon_e, 'mean')
    assert g.shape == (2, 2)
    np.testing.assert_allclose(g[0, 0], 2.0)
    np.testing.assert_allclose(g[1, 1], 10.0)
    assert np.isnan(g[0, 1])
    c = grid_statistic(lats, lons, vals, lat_e, lon_e, 'count')
    assert c[0, 0] == 2 and c[1, 1] == 1


def test_seasonal_fit_recovers_amplitude():
    t = np.arange(0, 3 * 365, 3) * 86400.0
    truth_amp, truth_phase = 0.04, 0.7
    v = 2.3 + truth_amp * np.sin(2 * np.pi * t / (365.25 * 86400.0) + truth_phase)
    fit = seasonal_fit(t, v, np.zeros(t.size, dtype=int), 1)
    np.testing.assert_allclose(fit['amplitude'][0, 0], truth_amp, rtol=1e-3)
    np.testing.assert_allclose(fit['mean'][0], 2.3, atol=1e-3)
    # phase convention: a sin + b cos = A sin(x + phi) with phi = atan2(b, a)
    np.testing.assert_allclose(fit['phase'][0, 0], truth_phase, atol=1e-3)


def test_variogram_recovers_sill():
    rng = np.random.default_rng(1)
    n = 800
    x = rng.uniform(0, 10, n)
    y = rng.uniform(0, 10, n)
    v = rng.normal(0, 1.0, n)  # pure nugget: semivariance ~ variance
    centers, gamma, counts, meta = empirical_variogram(x, y, v, n_bins=12)
    assert np.nanmean(gamma[2:]) == pytest.approx(1.0, rel=0.15)
    sill, rng_len = fit_variogram(centers, gamma, 'exponential')
    assert sill == pytest.approx(1.0, rel=0.3)
    # 800 points = 319,600 pairs > the 200k budget: subsampled + recorded
    assert meta['estimator'] == 'subsampled'
    assert meta['n_pairs_total'] == n * (n - 1) // 2
    assert 0 < meta['n_pairs_used'] <= 200000


def test_variogram_small_n_matches_reference_all_pairs_estimator():
    """VERDICT r4 item 7: when the pair budget covers every pair, the
    estimator must EQUAL a direct all-pairs computation with the
    reference's semantics (statsPlot.py:544-944: semivariance
    0.5*(v_i-v_j)^2 over every unordered station pair, binned by
    euclidean distance)."""
    rng = np.random.default_rng(7)
    n, n_bins = 60, 8
    x = rng.uniform(0, 5, n)
    y = rng.uniform(0, 5, n)
    v = rng.normal(0, 0.3, n) + 0.1 * x
    centers, gamma, counts, meta = empirical_variogram(x, y, v,
                                                       n_bins=n_bins)
    assert meta['estimator'] == 'all_pairs'
    assert meta['n_pairs_used'] == meta['n_pairs_total'] == n * (n - 1) // 2

    # direct mirror: explicit double loop over unordered pairs
    d, sq = [], []
    for i in range(n):
        for j in range(i + 1, n):
            d.append(np.hypot(x[i] - x[j], y[i] - y[j]))
            sq.append(0.5 * (v[i] - v[j]) ** 2)
    d, sq = np.asarray(d), np.asarray(sq)
    max_dist = np.percentile(d, 95)
    edges = np.linspace(0, max_dist, n_bins + 1)
    which = np.clip(np.digitize(d, edges) - 1, 0, n_bins - 1)
    inside = d <= max_dist
    exp_counts = np.bincount(which[inside], minlength=n_bins).astype(float)
    exp_gamma = np.bincount(which[inside], weights=sq[inside],
                            minlength=n_bins) / exp_counts
    np.testing.assert_array_equal(counts, exp_counts)
    np.testing.assert_allclose(gamma, exp_gamma, rtol=1e-12)
    np.testing.assert_allclose(centers, 0.5 * (edges[:-1] + edges[1:]))


class TestRaiderStats:
    def test_end_to_end(self, tmp_path):
        csv = tmp_path / 'combined.csv'
        amps = synthetic_gnss_csv(csv)
        st = RaiderStats(str(csv), workdir=str(tmp_path), spacing=1.0)

        sm = st.station_means()
        assert len(sm) == 25
        np.testing.assert_allclose(sm['mean'].mean(), 2.3, atol=0.01)

        grid = st.grid_map('mean')
        assert np.nanmin(grid) > 2.2 and np.nanmax(grid) < 2.4

        fits = st.seasonal_amplitude_phase()
        ours = fits.sort_values('ID')['annual_amplitude'].to_numpy()
        np.testing.assert_allclose(ours, amps, rtol=0.05)

        out = st.plot_station_distribution()
        assert (tmp_path / 'station_distribution.png').exists()
        st.plot_grid('mean')
        assert (tmp_path / 'grid_mean.png').exists()

    def test_cli(self, tmp_path):
        from raider_tpu.workflows.stats import stats_analyses

        csv = tmp_path / 'combined.csv'
        synthetic_gnss_csv(csv, n_stations=8, n_days=100)
        stats_analyses([
            '-f', str(csv), '-w', str(tmp_path),
            '--station_distribution', '--grid_delay_mean',
            '--grid_seasonal_amplitude', '-min_span', '0', '0.1',
        ])
        assert (tmp_path / 'seasonal_fits.csv').exists()
        assert (tmp_path / 'grid_mean.png').exists()
        assert (tmp_path / 'grid_seasonal_amplitude.png').exists()

    def test_cli_variogram_flags(self, tmp_path, caplog):
        """The variogram flag family, incl. --variogram_per_timeslice (the
        caller the round-5 4-tuple return initially missed)."""
        import logging

        from raider_tpu.workflows.stats import stats_analyses

        csv = tmp_path / 'combined.csv'
        synthetic_gnss_csv(csv, n_stations=10, n_days=40)
        with caplog.at_level(logging.INFO, logger='RAiDER'):
            stats_analyses([
                '-f', str(csv), '-w', str(tmp_path),
                '--variogramplot', '--variogram_per_timeslice',
            ])
        assert (tmp_path / 'variogram.png').exists()
        assert (tmp_path / 'variogram_sill.npy').exists()
        assert any('variogram' in r.getMessage() for r in caplog.records)

    def test_cli_breadth(self, tmp_path):
        """The reference parser's station/grid/raster flag families
        (statsPlot.py:242-382) all produce output."""
        from raider_tpu.io.geotiff import read_gtiff
        from raider_tpu.workflows.stats import stats_analyses

        csv = tmp_path / 'combined.csv'
        synthetic_gnss_csv(csv, n_stations=10, n_days=200)
        stats_analyses([
            '-f', str(csv), '-w', str(tmp_path),
            '-station_delay_mean', '-station_delay_median', '-station_delay_stdev',
            '-grid_heatmap', '-grid_delay_absolute_mean', '-grid_delay_absolute_stdev',
            '-grid_to_raster', '-phaseamp_per_station',
            '-cm', 'plasma', '-figdpi', '70', '-sg', '-dg', '-dt', '1',
        ])
        for name in ('station_delay_mean.png', 'station_delay_median.png',
                     'station_delay_stdev.png', 'grid_heatmap.png',
                     'grid_absolute_mean.png', 'grid_absolute_stdev.png',
                     'phaseamp_per_station.png', 'grid_absolute_mean.tif'):
            assert (tmp_path / name).exists(), name

        # raster values == in-memory grid (north-up flip applied)
        st = RaiderStats(str(csv), workdir=str(tmp_path))
        g = st.grid_map('mean', absolute=True)
        arr, prof = read_gtiff(str(tmp_path / 'grid_absolute_mean.tif'))
        np.testing.assert_allclose(np.flipud(arr[0]), g, rtol=1e-6, equal_nan=True)
        assert prof['transform'].to_gdal()[5] < 0  # north-up

    def test_min_span_filter(self, tmp_path):
        """Sparse stations are excluded from seasonal fits by min_span."""
        csv = tmp_path / 'combined.csv'
        synthetic_gnss_csv(csv, n_stations=5, n_days=3 * 365)  # every 5 days
        st = RaiderStats(str(csv), workdir=str(tmp_path), min_span=(2, 0.9))
        assert len(st.seasonal_amplitude_phase(apply_span_filter=True)) == 0
        st2 = RaiderStats(str(csv), workdir=str(tmp_path), min_span=(2, 0.1))
        assert len(st2.seasonal_amplitude_phase(apply_span_filter=True)) == 5

    def test_variogram_plot_and_errlimit(self, tmp_path):
        csv = tmp_path / 'combined.csv'
        synthetic_gnss_csv(csv, n_stations=30, n_days=60)
        st = RaiderStats(str(csv), workdir=str(tmp_path))
        out, sill, rng_ = st.plot_variogram('exponential')
        assert (tmp_path / 'variogram.png').exists()
        assert np.isfinite(sill)


class TestGridfilePersistence:
    """save_gridfile/load_gridfile round trip (reference: statsPlot.py:436-556)."""

    def test_round_trip_and_unit_conversion(self, tmp_path):
        import numpy as np

        from raider_tpu.workflows.stats import load_gridfile, save_gridfile

        grid = np.array([[1.0, 2.0], [np.nan, 4.0]], dtype=np.float32)
        fname = str(tmp_path / 'grid_mean.tif')
        meta = save_gridfile(grid, 'grid_delay_mean', fname,
                             plotbbox=(-118.0, 32.0, -116.0, 34.0),
                             spacing=1.0, unit='m')
        assert meta['gridfile_type'] == 'grid_delay_mean'

        out, gtype, bbox, spacing, cbfmt, sog, tl = load_gridfile(fname, 'cm')
        assert gtype == 'grid_delay_mean'
        assert bbox == [-118.0, 32.0, -116.0, 34.0]
        assert spacing == 1.0
        assert sog is False and tl is False
        # 0 is masked to nan; values converted m -> cm
        np.testing.assert_allclose(out[0], [100.0, 200.0])
        assert np.isnan(out[1, 0])

    def test_convert_si_rejects_unknown(self):
        import pytest as _pytest

        from raider_tpu.workflows.stats import convert_SI

        with _pytest.raises(ValueError):
            convert_SI(1.0, 'm', 'furlong')

    def test_metadata_tags_survive_gtiff(self, tmp_path):
        import numpy as np

        from raider_tpu.io.geotiff import read_gtiff, write_gtiff

        p = str(tmp_path / 'tagged.tif')
        write_gtiff(np.ones((3, 4), np.float32), p,
                    metadata={'a': '1 2 3', 'b<c': 'x&"y"'})
        _, prof = read_gtiff(p)
        assert prof['tags'] == {'a': '1 2 3', 'b<c': 'x&"y"'}


class TestTimeLines:
    """--time_lines central longitudes (reference: statsPlot.py:420-433,1483-1512)."""

    def test_midpoint(self):
        from raider_tpu.workflows.stats import midpoint

        assert midpoint((0, -118.0), (0, -118.0)) == -118.0
        # int() truncation toward zero mirrors the reference's midpoint
        assert abs(midpoint((0, -120.0), (0, -116.0)) - (-118)) <= 1

    def test_compute_time_lines_buckets_by_hour(self):
        import pandas as pd

        from raider_tpu.workflows.stats import compute_time_lines

        df = pd.DataFrame({
            'Lon': [-120.0, -119.0, -112.0, -111.0],
            'Lat': [34.0, 35.0, 34.0, 35.0],
            'Datetime': pd.to_datetime([
                '2020-01-01T01:00', '2020-01-01T01:05',
                '2020-01-01T02:00', '2020-01-01T02:05']),
        })
        lines = compute_time_lines(df)
        assert len(lines) == 2
        assert abs(lines[0] - (-119)) <= 1  # midpoint of the 1h band lons
        assert abs(lines[1] - (-111)) <= 1  # midpoint of the 2h band lons

    def test_plot_grid_draws_time_lines(self, tmp_path):
        import os

        from raider_tpu.workflows.stats import RaiderStats

        csv = tmp_path / 'combined.csv'
        synthetic_gnss_csv(csv)
        st = RaiderStats(str(csv), workdir=str(tmp_path),
                         plot_fmt={'time_lines': True})
        assert isinstance(st.time_lines, list)
        out = st.plot_station_distribution()
        assert os.path.exists(out)


def test_load_gridfile_rejects_untagged_tiff(tmp_path):
    """A GeoTIFF without save_gridfile metadata raises ValueError, not KeyError."""
    import numpy as np

    from raider_tpu.io.geotiff import write_gtiff
    from raider_tpu.workflows.stats import load_gridfile

    p = str(tmp_path / 'plain.tif')
    write_gtiff(np.ones((2, 2), np.float32), p)
    with pytest.raises(ValueError):
        load_gridfile(p, 'm')


class TestCoastlines:
    def test_segments_sane(self):
        from raider_tpu.workflows.coastlines import COASTLINES
        assert len(COASTLINES) >= 15
        for seg in COASTLINES:
            assert seg.ndim == 2 and seg.shape[1] == 2 and seg.shape[0] >= 5
            assert np.all(np.abs(seg[:, 0]) <= 180)
            assert np.all(np.abs(seg[:, 1]) <= 90)

    def test_draw_clips_to_view(self):
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        from raider_tpu.workflows.coastlines import draw_coastlines

        fig, ax = plt.subplots()
        ax.set_xlim(-125, -114)   # US west coast: North America visible
        ax.set_ylim(30, 42)
        n = draw_coastlines(ax)
        assert n >= 1
        assert ax.get_xlim() == (-125, -114)
        fig2, ax2 = plt.subplots()
        ax2.set_xlim(-150, -140)  # central Pacific: nothing to draw
        ax2.set_ylim(-10, 0)
        assert draw_coastlines(ax2) == 0
        plt.close(fig)
        plt.close(fig2)


def test_absolute_phase_grid_is_observation_weighted(tmp_path):
    """grid_seasonal_absolute_phase weights every OBSERVATION (reference:
    statsPlot.py:2083-2090 grids phsfit over all rows), while
    grid_seasonal_phase averages per-station values - with unequal station
    observation counts the two products must differ."""
    import datetime as dtm

    from raider_tpu.io.geotiff import read_gtiff
    from raider_tpu.workflows.stats import stats_analyses

    rng = np.random.default_rng(3)
    rows = []
    t0 = dtm.datetime(2020, 1, 1)
    # one grid cell, two stations: A daily (phase 0.3), B sparse (phase 1.2)
    for name, lat, lon, phase, step in (('AAAA', 33.2, -117.8, 0.3, 1),
                                        ('BBBB', 33.4, -117.6, 1.2, 10)):
        for d in range(0, 920, step):
            t = t0 + dtm.timedelta(days=d)
            fy = d / 365.25
            v = 2.3 + 0.03 * np.sin(2 * np.pi * fy + phase)
            rows.append({'ID': name, 'Lat': lat, 'Lon': lon, 'Hgt_m': 10.0,
                         'Datetime': t, 'ZTD': v + rng.normal(0, 1e-5),
                         'sigZTD': 0.004})
    csv = tmp_path / 'two_station.csv'
    pd.DataFrame(rows).to_csv(csv, index=False)

    stats_analyses(['-f', str(csv), '-w', str(tmp_path), '--spacing', '5.0',
                    '-min_span', '2', '0.05',
                    '-grid_seasonal_phase', '-grid_seasonal_absolute_phase',
                    '-grid_to_raster'])
    g_st, _ = read_gtiff(str(tmp_path / 'grid_seasonal_phase.tif'))
    g_abs, _ = read_gtiff(str(tmp_path / 'grid_seasonal_absolute_phase.tif'))
    cell_st = np.nanmean(g_st)
    cell_abs = np.nanmean(g_abs)
    # station mean ~ (0.3 + 1.2)/2 (up to the epoch's constant phase shift);
    # absolute is pulled toward the daily station's phase
    assert abs(cell_st - cell_abs) > 0.2
    assert abs((cell_st - cell_abs) - (0.75 - (920 * 0.3 + 92 * 1.2) / 1012)) < 0.1


class TestFlagSurfaceParity:
    """Every flag the reference raiderStats parser exposes must parse here
    (reference statsPlot.py:60-382 + the shared --cpus, cli/parser.py:8-14):
    existing user scripts must run unmodified."""

    REF_PARSER = pathlib.Path('/root/reference/tools/RAiDER/cli/statsPlot.py')

    def _reference_flags(self):
        import re
        src = self.REF_PARSER.read_text()
        flags = set()
        for m in re.finditer(r"add_argument\(\s*'(-[^']+)'(?:,\s*'(--[^']+)')?",
                             src):
            flags.add(m.group(2) or m.group(1))
        if 'add_cpus' in src:
            flags.add('--cpus')
        return sorted(flags)

    @pytest.mark.skipif(not REF_PARSER.exists(),
                        reason='reference source not available')
    def test_every_reference_flag_parses(self):
        from raider_tpu.workflows.stats import create_parser
        p = create_parser()
        ours = {s for a in p._actions for s in a.option_strings}
        missing = [f for f in self._reference_flags() if f not in ours]
        assert not missing, f'reference raiderStats flags not accepted: {missing}'

    def test_cpus_is_accepted_and_ignored(self, tmp_path):
        from raider_tpu.workflows.stats import create_parser
        args = create_parser().parse_args(['-f', 'x.csv', '--cpus', '8'])
        assert args.cpus == '8'
