"""Weather-model debug plots (capability: reference models/plotWeather.py).

plot_pqt: vertical p/q/T profile panels; plot_wh: wet/hydro refractivity
slices at 500 m and 15 km.
"""

import numpy as np


def plot_pqt(weather_model, savefig: bool = True, z1: float = 500.0, z2: float = 15000.0):
    """Pressure/humidity/temperature profiles and slices
    (reference: plotWeather.py:20-98)."""
    import matplotlib.pyplot as plt

    zs = np.asarray(weather_model._zs, dtype=np.float64)
    if zs.ndim > 1:
        zs = np.nanmean(zs, axis=(0, 1))
    p = np.asarray(weather_model._p)
    t = np.asarray(weather_model._t)
    e = np.asarray(weather_model._e) if weather_model._e is not None else None

    fig, axes = plt.subplots(1, 3, figsize=(12, 4), sharey=True)
    axes[0].plot(np.nanmean(p, axis=(0, 1)), zs / 1000)
    axes[0].set_xlabel('Pressure [Pa]')
    axes[0].set_ylabel('Height [km]')
    axes[1].plot(np.nanmean(t, axis=(0, 1)), zs / 1000)
    axes[1].set_xlabel('Temperature [K]')
    if e is not None:
        axes[2].plot(np.nanmean(e, axis=(0, 1)), zs / 1000)
        axes[2].set_xlabel('Vapor pressure [Pa]')
    fig.suptitle(f'{weather_model.Model()} mean profiles')
    out = f'{weather_model.Model()}_weather_model_p_q_t.pdf'
    if savefig:
        fig.savefig(out)
    plt.close(fig)
    return out


def plot_wh(weather_model, savefig: bool = True, z1: float = 500.0, z2: float = 15000.0):
    """Wet/hydrostatic refractivity slices at two heights
    (reference: plotWeather.py:101-160)."""
    import matplotlib.pyplot as plt

    zs = np.asarray(weather_model._zs, dtype=np.float64)
    if zs.ndim > 1:
        zs = np.nanmean(zs, axis=(0, 1))
    wet = np.asarray(weather_model.getWetRefractivity())
    hydro = np.asarray(weather_model.getHydroRefractivity())
    i1 = int(np.abs(zs - z1).argmin())
    i2 = int(np.abs(zs - z2).argmin())

    fig, axes = plt.subplots(2, 2, figsize=(10, 8))
    for ax, cube, idx, name in (
        (axes[0, 0], wet, i1, f'wet @ {zs[i1]:.0f} m'),
        (axes[0, 1], wet, i2, f'wet @ {zs[i2]:.0f} m'),
        (axes[1, 0], hydro, i1, f'hydro @ {zs[i1]:.0f} m'),
        (axes[1, 1], hydro, i2, f'hydro @ {zs[i2]:.0f} m'),
    ):
        im = ax.imshow(cube[..., idx], origin='lower', cmap='viridis')
        fig.colorbar(im, ax=ax)
        ax.set_title(name)
    fig.suptitle(f'{weather_model.Model()} refractivity')
    out = f'{weather_model.Model()}_weather_model_refractivity.pdf'
    if savefig:
        fig.savefig(out)
    plt.close(fig)
    return out
