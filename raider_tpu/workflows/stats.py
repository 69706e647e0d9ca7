"""GNSS/model delay statistics: gridding, seasonal fits, variograms.

Capability parity with the reference's raiderStats subsystem (reference:
tools/RAiDER/cli/statsPlot.py: RaiderStats :946, VariogramAnalysis :544,
stats_analyses :2780), redesigned as vectorized NumPy/JAX instead of the
reference's per-cell Python loops:

  * station-distribution scatter and gridded mean/median/stdev/count maps
  * per-station seasonal (annual + semiannual) harmonic fits - amplitude and
    phase from one batched least-squares solve over every station at once
  * empirical semivariograms per grid cell with exponential/Gaussian model
    fits (range/sill maps)
"""

import argparse
import os
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

from raider_tpu.logger import logger

SECONDS_PER_YEAR = 365.25 * 86400.0


# ------------------------------------------------------------------ gridding

def make_grid(snwe, spacing: float):
    """Regular lat/lon grid edges covering an SNWE box."""
    s, n, w, e = snwe
    lat_edges = np.arange(s, n + spacing, spacing)
    lon_edges = np.arange(w, e + spacing, spacing)
    return lat_edges, lon_edges


def grid_statistic(lats, lons, values, lat_edges, lon_edges, statistic: str = 'mean'):
    """Gridded statistic of scattered observations, vectorized via bincount.

    Replaces the reference's per-cell loops (statsPlot.py:1565-1702).
    """
    lats = np.asarray(lats, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    values = np.asarray(values, dtype=np.float64)
    ok = np.isfinite(lats) & np.isfinite(lons) & np.isfinite(values)
    lats, lons, values = lats[ok], lons[ok], values[ok]

    iy = np.clip(np.digitize(lats, lat_edges) - 1, 0, len(lat_edges) - 2)
    ix = np.clip(np.digitize(lons, lon_edges) - 1, 0, len(lon_edges) - 2)
    ny, nx = len(lat_edges) - 1, len(lon_edges) - 1
    lin = iy * nx + ix

    counts = np.bincount(lin, minlength=ny * nx).astype(np.float64)
    with np.errstate(invalid='ignore', divide='ignore'):
        if statistic == 'count':
            out = counts
        elif statistic == 'mean':
            out = np.bincount(lin, weights=values, minlength=ny * nx) / counts
        elif statistic == 'stdev':
            mean = np.bincount(lin, weights=values, minlength=ny * nx) / counts
            sq = np.bincount(lin, weights=values**2, minlength=ny * nx) / counts
            out = np.sqrt(np.maximum(sq - mean**2, 0.0))
        elif statistic == 'median':
            out = np.full(ny * nx, np.nan)
            df = pd.DataFrame({'lin': lin, 'v': values})
            med = df.groupby('lin')['v'].median()
            out[med.index.to_numpy()] = med.to_numpy()
        else:
            raise ValueError(f'Unknown statistic {statistic}')
    out = np.where(counts > 0, out, np.nan) if statistic != 'count' else out
    return out.reshape(ny, nx)


# -------------------------------------------------------------- seasonal fit

def seasonal_fit(times_s: np.ndarray, values: np.ndarray, station_idx: np.ndarray,
                 n_stations: int, periods_per_year=(1.0, 2.0)):
    """Batched harmonic regression per station.

    Model: v = c0 + c1 t + sum_k [a_k sin(2 pi f_k t) + b_k cos(2 pi f_k t)].
    Returns dict with 'amplitude' (n_stations, n_freq), 'phase' (radians,
    relative to the returned 't_ref' epoch), 'trend' and 'mean'. One masked
    least-squares solve per station via batched normal equations (the
    reference fits station-by-station; statsPlot.py:946-1563).
    """
    times_s = np.asarray(times_s, dtype=np.float64)
    # shift the epoch to an integer number of years before the first sample:
    # keeps the design well-conditioned without altering harmonic phases
    t_ref = np.floor(times_s.min() / SECONDS_PER_YEAR) * SECONDS_PER_YEAR
    t_yr = (times_s - t_ref) / SECONDS_PER_YEAR
    v = np.asarray(values, dtype=np.float64)
    cols = [np.ones_like(t_yr), t_yr]
    for f in periods_per_year:
        cols.append(np.sin(2 * np.pi * f * t_yr))
        cols.append(np.cos(2 * np.pi * f * t_yr))
    design = np.stack(cols, axis=-1)  # (N, P)
    p = design.shape[1]

    # accumulate per-station normal equations with bincount over flattened
    # (station, i, j) cells
    ata = np.zeros((n_stations, p, p))
    atb = np.zeros((n_stations, p))
    for i in range(p):
        atb[:, i] = np.bincount(station_idx, weights=design[:, i] * v, minlength=n_stations)
        for j in range(i, p):
            acc = np.bincount(station_idx, weights=design[:, i] * design[:, j],
                              minlength=n_stations)
            ata[:, i, j] = acc
            ata[:, j, i] = acc

    coeffs = np.full((n_stations, p), np.nan)
    counts = np.bincount(station_idx, minlength=n_stations)
    solvable = counts >= p
    if solvable.any():
        # regularize tiny to keep batch solve stable
        eye = np.eye(p) * 1e-12
        coeffs[solvable] = np.linalg.solve(ata[solvable] + eye, atb[solvable][..., None])[..., 0]

    n_freq = len(periods_per_year)
    amps = np.full((n_stations, n_freq), np.nan)
    phases = np.full((n_stations, n_freq), np.nan)
    for k in range(n_freq):
        a = coeffs[:, 2 + 2 * k]
        b = coeffs[:, 3 + 2 * k]
        amps[:, k] = np.hypot(a, b)
        phases[:, k] = np.arctan2(b, a)
    return {
        'mean': coeffs[:, 0],
        'trend': coeffs[:, 1],
        'amplitude': amps,
        'phase': phases,
        'count': counts,
        't_ref': t_ref,
    }


# ---------------------------------------------------------------- variograms

def empirical_variogram(x, y, values, n_bins: int = 20, max_dist: Optional[float] = None,
                        max_pairs: int = 200000, seed: int = 0):
    """Binned empirical semivariance 0.5 E[(v_i - v_j)^2] vs distance.

    Vectorized with random pair subsampling for large N (the reference
    computes all pairs per cell; statsPlot.py:544-944).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    v = np.asarray(values, dtype=np.float64)
    ok = np.isfinite(x) & np.isfinite(y) & np.isfinite(v)
    x, y, v = x[ok], y[ok], v[ok]
    n = x.size
    if n < 10:
        return None, None, None

    rng = np.random.default_rng(seed)
    n_pairs = min(max_pairs, n * (n - 1) // 2)
    i = rng.integers(0, n, n_pairs)
    j = rng.integers(0, n, n_pairs)
    keep = i != j
    i, j = i[keep], j[keep]
    d = np.hypot(x[i] - x[j], y[i] - y[j])
    sq = 0.5 * (v[i] - v[j]) ** 2

    if max_dist is None:
        max_dist = np.percentile(d, 95)
    edges = np.linspace(0, max_dist, n_bins + 1)
    which = np.clip(np.digitize(d, edges) - 1, 0, n_bins - 1)
    inside = d <= max_dist
    counts = np.bincount(which[inside], minlength=n_bins).astype(np.float64)
    with np.errstate(invalid='ignore'):
        gamma = np.bincount(which[inside], weights=sq[inside], minlength=n_bins) / counts
    centers = 0.5 * (edges[:-1] + edges[1:])
    return centers, gamma, counts


def _exponential_model(h, sill, rng_):
    return sill * (1.0 - np.exp(-h / np.maximum(rng_, 1e-12)))


def _gaussian_model(h, sill, rng_):
    return sill * (1.0 - np.exp(-(h**2) / np.maximum(rng_, 1e-12) ** 2))


def fit_variogram(centers, gamma, model: str = 'exponential'):
    """Least-squares (sill, range) fit of a variogram model."""
    from scipy.optimize import curve_fit

    ok = np.isfinite(gamma)
    if ok.sum() < 3:
        return np.nan, np.nan
    fn = _exponential_model if model == 'exponential' else _gaussian_model
    try:
        p0 = [np.nanmax(gamma[ok]), centers[ok][-1] / 3]
        popt, _ = curve_fit(fn, centers[ok], gamma[ok], p0=p0, maxfev=5000)
        return float(popt[0]), float(popt[1])  # sill, range
    except Exception:
        return np.nan, np.nan


# -------------------------------------------------------------- main driver

class RaiderStats:
    """Statistics over a combined GNSS/model delay CSV
    (capability parity: statsPlot.py RaiderStats :946)."""

    def __init__(self, filearg, col_name: str = 'ZTD', unit: str = 'm',
                 workdir: str = './', bbox=None, spacing: float = 1.0,
                 timeinterval=None, seasonalinterval=None,
                 obs_errlimit: float = float('inf'), min_span=(2, 0.6),
                 period_limit: float = 0.0) -> None:
        self.fname = filearg
        self.col_name = col_name
        self.unit = unit
        self.workdir = workdir
        self.spacing = spacing
        os.makedirs(workdir, exist_ok=True)

        df = pd.read_csv(filearg, parse_dates=['Datetime'])
        if col_name not in df:
            raise KeyError(f'Column {col_name} not found in {filearg}')
        # unit conversion to meters
        scale = {'m': 1.0, 'cm': 0.01, 'mm': 0.001}.get(unit, 1.0)
        df[col_name] = df[col_name] * scale
        if np.isfinite(obs_errlimit) and 'sigZTD' in df:
            df = df[df['sigZTD'] * scale <= obs_errlimit]

        if timeinterval:
            t0, t1 = (pd.to_datetime(x) for x in timeinterval)
            df = df[(df['Datetime'] >= t0) & (df['Datetime'] <= t1)]
        if seasonalinterval:
            # months of year, e.g. (6, 8) for Jun-Aug (inclusive)
            m0, m1 = seasonalinterval
            months = df['Datetime'].dt.month
            df = df[(months >= m0) & (months <= m1)] if m0 <= m1 else \
                df[(months >= m0) | (months <= m1)]
        if bbox:
            s, n, w, e = bbox
            df = df[(df['Lat'] >= s) & (df['Lat'] <= n) & (df['Lon'] >= w) & (df['Lon'] <= e)]
        self.df = df.reset_index(drop=True)
        if bbox:
            self.snwe = list(bbox)
        else:
            self.snwe = [df['Lat'].min(), df['Lat'].max(), df['Lon'].min(), df['Lon'].max()]
        self.lat_edges, self.lon_edges = make_grid(self.snwe, spacing)

    # --------------------------------------------------------------- metrics
    def station_means(self) -> pd.DataFrame:
        return self.df.groupby('ID').agg(
            Lat=('Lat', 'first'), Lon=('Lon', 'first'),
            mean=(self.col_name, 'mean'), std=(self.col_name, 'std'),
            count=(self.col_name, 'count'),
        ).reset_index()

    def grid_map(self, statistic: str = 'mean') -> np.ndarray:
        sm = self.station_means()
        col = {'mean': 'mean', 'stdev': 'std', 'count': 'count', 'median': 'mean'}[statistic]
        return grid_statistic(sm['Lat'], sm['Lon'], sm[col],
                              self.lat_edges, self.lon_edges,
                              'mean' if statistic != 'count' else 'count')

    def seasonal_amplitude_phase(self) -> pd.DataFrame:
        """Annual amplitude/phase per station from batched harmonic fit."""
        ids, station_idx = np.unique(self.df['ID'].to_numpy(), return_inverse=True)
        # unit-safe epoch seconds (pandas may store datetime64[ns] or [us])
        epoch = (
            self.df['Datetime'].to_numpy().astype('datetime64[s]').astype(np.int64).astype(np.float64)
        )
        fit = seasonal_fit(epoch, self.df[self.col_name].to_numpy(), station_idx, len(ids))
        sm = self.df.groupby('ID').agg(Lat=('Lat', 'first'), Lon=('Lon', 'first')).reset_index()
        out = pd.DataFrame({
            'ID': ids,
            'annual_amplitude': fit['amplitude'][:, 0],
            'annual_phase': fit['phase'][:, 0],
            'semiannual_amplitude': fit['amplitude'][:, 1],
            'semiannual_phase': fit['phase'][:, 1],
            'trend_per_year': fit['trend'],
            'mean': fit['mean'],
            'count': fit['count'],
        })
        return out.merge(sm, on='ID', how='left')

    def gridded_variogram(self, model: str = 'exponential') -> Tuple[np.ndarray, np.ndarray]:
        """Per-grid-cell variogram (sill, range) maps."""
        ny, nx = len(self.lat_edges) - 1, len(self.lon_edges) - 1
        sill = np.full((ny, nx), np.nan)
        rng_ = np.full((ny, nx), np.nan)
        iy = np.clip(np.digitize(self.df['Lat'], self.lat_edges) - 1, 0, ny - 1)
        ix = np.clip(np.digitize(self.df['Lon'], self.lon_edges) - 1, 0, nx - 1)
        for cy in range(ny):
            for cx in range(nx):
                sel = (iy == cy) & (ix == cx)
                if sel.sum() < 10:
                    continue
                sub = self.df[sel]
                centers, gamma, _ = empirical_variogram(
                    sub['Lon'], sub['Lat'], sub[self.col_name]
                )
                if centers is None:
                    continue
                sill[cy, cx], rng_[cy, cx] = fit_variogram(centers, gamma, model)
        return sill, rng_

    # ----------------------------------------------------------------- plots
    def plot_station_distribution(self, fname: str = 'station_distribution.png') -> str:
        import matplotlib.pyplot as plt

        sm = self.station_means()
        fig, ax = plt.subplots(figsize=(8, 6))
        sc = ax.scatter(sm['Lon'], sm['Lat'], c=sm['mean'], s=12, cmap='viridis')
        fig.colorbar(sc, ax=ax, label=f'mean {self.col_name} [m]')
        ax.set_xlabel('Longitude')
        ax.set_ylabel('Latitude')
        ax.set_title('Station distribution')
        out = os.path.join(self.workdir, fname)
        fig.savefig(out, dpi=120)
        plt.close(fig)
        return out

    def plot_grid(self, statistic: str = 'mean', fname: Optional[str] = None) -> str:
        import matplotlib.pyplot as plt

        grid = self.grid_map(statistic)
        fig, ax = plt.subplots(figsize=(8, 6))
        im = ax.imshow(
            grid, origin='lower', cmap='viridis',
            extent=[self.lon_edges[0], self.lon_edges[-1], self.lat_edges[0], self.lat_edges[-1]],
            aspect='auto',
        )
        fig.colorbar(im, ax=ax, label=f'{statistic} {self.col_name}')
        ax.set_title(f'Gridded {statistic}')
        out = os.path.join(self.workdir, fname or f'grid_{statistic}.png')
        fig.savefig(out, dpi=120)
        plt.close(fig)
        return out


def stats_analyses(iargs: Optional[List[str]] = None) -> None:
    """raiderStats CLI (capability parity: statsPlot.py:2780)."""
    p = argparse.ArgumentParser(
        description='Statistical analyses of GNSS/model zenith delay files',
    )
    p.add_argument('-f', '--file', dest='fname', required=True,
                   help='Combined delay CSV (e.g. UNRcombinedGPS_ztd.csv)')
    p.add_argument('-c', '--column_name', dest='col_name', default='ZTD')
    p.add_argument('-u', '--unit', default='m', choices=['m', 'cm', 'mm'])
    p.add_argument('-w', '--workdir', default='./')
    p.add_argument('-b', '--bounding_box', dest='bounding_box', default=None,
                   help='"S N W E"')
    p.add_argument('-sp', '--spacing', type=float, default=1.0)
    p.add_argument('-ti', '--timeinterval', default=None,
                   help='"YYYY-MM-DD YYYY-MM-DD"')
    p.add_argument('-si', '--seasonalinterval', default=None, help='"MM MM"')
    p.add_argument('--obs_errlimit', type=float, default=float('inf'))
    p.add_argument('--station_distribution', action='store_true')
    p.add_argument('--grid_delay_mean', action='store_true')
    p.add_argument('--grid_delay_median', action='store_true')
    p.add_argument('--grid_delay_stdev', action='store_true')
    p.add_argument('--grid_heatmap', action='store_true')
    p.add_argument('--grid_seasonal_amplitude', action='store_true')
    p.add_argument('--grid_seasonal_phase', action='store_true')
    p.add_argument('--variogramplot', action='store_true')
    p.add_argument('--variogram_model', default='exponential',
                   choices=['exponential', 'gaussian'])
    args = p.parse_args(iargs)

    bbox = [float(v) for v in args.bounding_box.split()] if args.bounding_box else None
    ti = args.timeinterval.split() if args.timeinterval else None
    si = [int(v) for v in args.seasonalinterval.split()] if args.seasonalinterval else None

    stats = RaiderStats(
        args.fname, col_name=args.col_name, unit=args.unit, workdir=args.workdir,
        bbox=bbox, spacing=args.spacing, timeinterval=ti, seasonalinterval=si,
        obs_errlimit=args.obs_errlimit,
    )

    if args.station_distribution:
        logger.info('Wrote %s', stats.plot_station_distribution())
    if args.grid_delay_mean or args.grid_heatmap:
        logger.info('Wrote %s', stats.plot_grid('mean'))
    if args.grid_delay_median:
        logger.info('Wrote %s', stats.plot_grid('median'))
    if args.grid_delay_stdev:
        logger.info('Wrote %s', stats.plot_grid('stdev'))
    if args.grid_seasonal_amplitude or args.grid_seasonal_phase:
        fits = stats.seasonal_amplitude_phase()
        out_csv = os.path.join(args.workdir, 'seasonal_fits.csv')
        fits.to_csv(out_csv, index=False)
        logger.info('Wrote %s', out_csv)
    if args.variogramplot:
        sill, rng_ = stats.gridded_variogram(args.variogram_model)
        np.save(os.path.join(args.workdir, 'variogram_sill.npy'), sill)
        np.save(os.path.join(args.workdir, 'variogram_range.npy'), rng_)
        logger.info('Wrote variogram sill/range maps to %s', args.workdir)
