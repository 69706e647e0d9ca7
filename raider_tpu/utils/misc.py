"""Small utility parities (reference: tools/RAiDER/utilFcns.py grab-bag)."""

import numpy as np

from raider_tpu.geodesy.crs import utm_crs


def sind(x):
    """Sine of degrees (reference: utilFcns.py:67)."""
    return np.sin(np.radians(x))


def cosd(x):
    """Cosine of degrees (reference: utilFcns.py:72)."""
    return np.cos(np.radians(x))


def projectDelays(delay, inc):
    """Zenith -> slant projection by cos(incidence)
    (reference: utilFcns.py:55-59)."""
    if np.any(np.asarray(inc) == 90):
        raise ZeroDivisionError
    return delay / cosd(inc)


def convertLons(in_lons: np.ndarray) -> np.ndarray:
    """Convert longitudes from [0, 360) to [-180, 180)
    (reference: utilFcns.py:699-704)."""
    mask = in_lons > 180
    out = np.array(in_lons, dtype=np.float64)
    out[mask] -= 360
    return out


def utm_zone(lon, lat) -> int:
    """UTM zone for a lon/lat, with the Norway/Svalbard exceptions
    (reference: utilFcns.py:481-493)."""
    if 56 <= lat < 64 and 3 <= lon < 12:
        return 32
    if 72 <= lat < 84 and 0 <= lon < 42:
        if lon < 9:
            return 31
        if lon < 21:
            return 33
        if lon < 33:
            return 35
        return 37
    return int((lon + 180) / 6) + 1


def utm_letter(lat) -> str:
    """UTM latitude band letter (reference: utilFcns.py:496-498)."""
    return 'CDEFGHJKLMNPQRSTUVWXX'[int((lat + 80) / 8)]


def WGS84_to_UTM(lon, lat, common_center: bool = False):
    """Vectorized WGS84 -> UTM (reference: utilFcns.py:525-549).

    Returns (zone, letter, x, y) arrays.
    """
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    shp = lat.shape
    lon_f, lat_f = lon.ravel(), lat.ravel()
    if common_center:
        zones = np.full(lon_f.shape, utm_zone(np.median(lon_f), np.median(lat_f)), dtype=int)
    else:
        zones = np.array([utm_zone(lo, la) for lo, la in zip(lon_f, lat_f)])
    letters = np.array([utm_letter(la) for la in lat_f])
    x = np.empty_like(lon_f)
    y = np.empty_like(lat_f)
    for z in np.unique(zones):
        sel = zones == z
        crs = utm_crs(int(z))
        xx, yy = (np.asarray(v) for v in crs.forward(lon_f[sel], lat_f[sel]))
        yy = np.where(yy < 0, yy + 10000000.0, yy)
        x[sel] = xx
        y[sel] = yy
    return zones.reshape(shp), letters.reshape(shp), x.reshape(shp), y.reshape(shp)


def UTM_to_WGS84(z, ltr, x, y):
    """Vectorized UTM -> WGS84 (reference: utilFcns.py:552-583)."""
    z = np.atleast_1d(np.asarray(z, dtype=int)).ravel()
    ltr = np.atleast_1d(np.asarray(ltr)).ravel()
    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    shp = x.shape
    x = x.ravel()
    y = np.atleast_1d(np.asarray(y, dtype=np.float64)).ravel()
    lon = np.empty_like(x)
    lat = np.empty_like(y)
    for zone in np.unique(z):
        sel = z == zone
        crs = utm_crs(int(zone))
        yy = y[sel].copy()
        south = np.array([str(b) < 'N' for b in ltr[sel]])
        yy[south] -= 10000000.0
        lo, la = (np.asarray(v) for v in crs.inverse(x[sel], yy))
        lon[sel] = lo
        lat[sel] = la
    return lon.reshape(shp), lat.reshape(shp)


def project(coordinates, z: int = None, ltr: str = None):
    """Single-point WGS84 -> UTM: (zone, letter, easting, northing)
    (reference: utilFcns.py:501-512). ``coordinates`` is (lon, lat)."""
    lon, lat = float(coordinates[0]), float(coordinates[1])
    if z is None:
        z = utm_zone(lon, lat)
    if ltr is None:
        ltr = utm_letter(lat)
    x, y = (float(np.asarray(v)) for v in utm_crs(int(z)).forward(lon, lat))
    if y < 0:
        y += 10000000.0
    return z, ltr, x, y


def unproject(z: int, ltr: str, x: float, y: float):
    """Single-point UTM -> WGS84 (lng, lat) (reference: utilFcns.py:515-522)."""
    y = float(y)
    if ltr < 'N':
        y -= 10000000.0
    lng, lat = (float(np.asarray(v)) for v in utm_crs(int(z)).inverse(float(x), y))
    return lng, lat
