"""Orbit engine: statevector parsing, Hermite interpolation, geo2rdr."""

import datetime as dt

import numpy as np
import pytest

from raider_tpu.geodesy.ellipsoid import lla2ecef
from raider_tpu.geometry.orbit import (
    Orbit,
    geo2rdr,
    get_orbit,
    interpolate_orbit,
    read_ESA_orbit_file,
    read_txt_file,
)

from tests.conftest import REFERENCE_DIR

ORB_DIR = REFERENCE_DIR / 'test' / 'orbit_files'

# circular-orbit parameters for synthetic tests
_GM = 3.986004418e14
_R_ORBIT = 7.071e6  # ~700 km altitude


def synthetic_orbit(t0: dt.datetime, duration: float = 1200.0, step: float = 10.0,
                    incline_deg: float = 98.0, lon_asc_deg: float = -130.0,
                    phase0: float = 0.55) -> Orbit:
    """Exact circular orbit (inclined great circle in ECEF, ignoring Earth
    rotation) with analytically known position/velocity."""
    w = np.sqrt(_GM / _R_ORBIT**3)
    tt = np.arange(-duration / 2, duration / 2 + step, step)
    inc = np.deg2rad(incline_deg)
    lon0 = np.deg2rad(lon_asc_deg)

    def posvel(t):
        th = phase0 + w * t
        # orbit plane: rotate circular motion by inclination then node
        x = np.cos(th)
        y = np.sin(th) * np.cos(inc)
        z = np.sin(th) * np.sin(inc)
        xe = np.cos(lon0) * x - np.sin(lon0) * y
        ye = np.sin(lon0) * x + np.cos(lon0) * y
        pos = _R_ORBIT * np.stack([xe, ye, z], axis=-1)
        dx = -np.sin(th)
        dy = np.cos(th) * np.cos(inc)
        dz = np.cos(th) * np.sin(inc)
        dxe = np.cos(lon0) * dx - np.sin(lon0) * dy
        dye = np.sin(lon0) * dx + np.cos(lon0) * dy
        vel = _R_ORBIT * w * np.stack([dxe, dye, dz], axis=-1)
        return pos, vel

    pos, vel = posvel(tt)
    orb = Orbit(times=tt, pos=pos, vel=vel, ref_time=t0)
    object.__setattr__(orb, '_posvel', posvel)  # test-only analytic truth
    return orb


@pytest.fixture
def orb():
    return synthetic_orbit(dt.datetime(2020, 1, 30, 13, 52, 45))


class TestHermite:
    def test_interpolation_accuracy(self, orb, rng):
        tq = rng.uniform(orb.times[2], orb.times[-3], 200)
        p, v = interpolate_orbit(orb.times, orb.pos, orb.vel, tq)
        p_true, v_true = orb._posvel(tq)
        # 4-point Hermite on 10 s spacing: sub-micrometer
        np.testing.assert_allclose(np.asarray(p), p_true, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v), v_true, atol=1e-6)

    def test_exact_at_statevectors(self, orb):
        p, v = interpolate_orbit(orb.times, orb.pos, orb.vel, orb.times[5])
        np.testing.assert_allclose(np.asarray(p), orb.pos[5], atol=1e-7)
        np.testing.assert_allclose(np.asarray(v), orb.vel[5], atol=1e-8)


class TestGeo2rdr:
    def test_zero_doppler_residual(self, orb):
        # targets on the ground near the sub-satellite track
        lats = np.array([33.0, 33.5, 34.0])
        lons = np.array([-118.0, -117.5, -117.0])
        hts = np.zeros(3)
        x, y, z = (np.asarray(v) for v in lla2ecef(lats, lons, hts))
        targ = np.stack([x, y, z], axis=-1)
        az, sr, sat_pos, sat_vel = geo2rdr(orb.times, orb.pos, orb.vel, targ)
        az, sr = np.asarray(az), np.asarray(sr)
        sat_pos, sat_vel = np.asarray(sat_pos), np.asarray(sat_vel)
        # zero-doppler: velocity perpendicular to look vector
        dr = sat_pos - targ
        resid = np.sum(sat_vel * dr, axis=-1) / (
            np.linalg.norm(sat_vel, axis=-1) * np.linalg.norm(dr, axis=-1)
        )
        np.testing.assert_allclose(resid, 0.0, atol=1e-12)
        assert np.all(sr > 600e3) and np.all(sr < 3000e3)

    def test_nan_targets_propagate(self, orb):
        targ = np.full((2, 3), np.nan)
        az, sr, _, _ = geo2rdr(orb.times, orb.pos, orb.vel, targ)
        assert np.isnan(np.asarray(az)).all() and np.isnan(np.asarray(sr)).all()

    def test_out_of_window_is_nan(self, orb):
        """Zero-Doppler crossings outside the statevector span are
        extrapolations, not solutions: the reference's ISCE3 geo2rdr raises
        and the ray becomes NaN (losreader.py:252-254). A crossing inside the
        span stays finite."""
        # sub-satellite targets at t=700 s (outside the +-600 s span) and
        # t=500 s (inside): for a circular orbit the zero-Doppler time of a
        # point below the satellite is exactly that epoch
        p_out, _ = orb._posvel(700.0)
        p_in, _ = orb._posvel(500.0)
        targ = 6.371e6 * np.stack([p_out / np.linalg.norm(p_out),
                                   p_in / np.linalg.norm(p_in)])
        az, sr, _, _ = geo2rdr(orb.times, orb.pos, orb.vel, targ)
        az, sr = np.asarray(az), np.asarray(sr)
        assert np.isnan(az[0]) and np.isnan(sr[0])
        assert np.isfinite(az[1]) and np.isfinite(sr[1])
        assert abs(az[1] - 500.0) < 1e-3


@pytest.mark.skipif(not ORB_DIR.exists(), reason='reference orbit files unavailable')
class TestParsing:
    """Golden statevectors from the reference suite
    (reference: test/test_losreader.py:20-114)."""

    def test_read_esa_orbit_file(self):
        t, pos, vel = read_ESA_orbit_file(ORB_DIR / 'S1_orbit_example.EOF')
        assert t[0] == dt.datetime(2018, 11, 12, 23, 0, 2)
        # golden statevector from the reference suite (test_losreader.py:22-92)
        np.testing.assert_allclose(pos[0], [-2064965.285362, 6434865.494987, 2090670.967443])
        np.testing.assert_allclose(vel[0], [860.239634, 2590.964968, -7090.378144])
        assert len(t) == 8

    def test_txt_and_eof_agree(self):
        t1, p1, v1 = read_ESA_orbit_file(ORB_DIR / 'S1_orbit_example.EOF')
        t2, p2, v2 = read_txt_file(ORB_DIR / 'S1_sv_file.txt')
        np.testing.assert_allclose(p1, p2, atol=1e-3)
        np.testing.assert_allclose(v1, v2, atol=1e-3)

    def test_get_orbit_direction(self):
        ref = dt.datetime(2018, 11, 12, 23, 0, 32)
        orb = get_orbit(str(ORB_DIR / 'S1_orbit_example.EOF'), ref, pad=600)
        assert orb.direction in ('asc', 'desc')
        assert orb.times.size >= 4

    def test_incorrect_file_raises(self):
        with pytest.raises(ValueError):
            get_orbit(str(ORB_DIR / 'incorrect_file.txt'), dt.datetime(2018, 11, 12, 23, 0, 32))


class _SV:
    def __init__(self, time, position, velocity):
        self.time = time
        self.position = position
        self.velocity = velocity


class _FakeOrbit:
    def __init__(self, svs):
        self.stateVectors = svs


class _FakeFrame:
    def __init__(self, svs):
        self.orbit = _FakeOrbit(svs)


class TestShelveReader:
    """Shelve (ISCE2 frame) statevector source (reference: losreader.py:399-426)."""

    def _write(self, path, svs):
        import shelve

        with shelve.open(str(path)) as db:
            db['frame'] = _FakeFrame(svs)

    def test_round_trip(self, tmp_path):
        from raider_tpu.geometry.orbit import read_shelve_file

        t_eof, pos_eof, vel_eof = read_ESA_orbit_file(ORB_DIR / 'S1_orbit_example.EOF')
        svs = [_SV(t_eof[i], pos_eof[i].tolist(), vel_eof[i].tolist()) for i in range(len(t_eof))]
        self._write(tmp_path / 'frame_db', svs)
        t, pos, vel = read_shelve_file(tmp_path / 'frame_db')
        assert t == t_eof
        np.testing.assert_allclose(pos, pos_eof)
        np.testing.assert_allclose(vel, vel_eof)

    def test_empty_raises(self, tmp_path):
        from raider_tpu.geometry.orbit import read_shelve_file

        self._write(tmp_path / 'empty_db', [])
        with pytest.raises(ValueError):
            read_shelve_file(tmp_path / 'empty_db')

    def test_get_orbit_from_shelve(self, tmp_path):
        t_eof, pos_eof, vel_eof = read_ESA_orbit_file(ORB_DIR / 'S1_orbit_example.EOF')
        svs = [_SV(t_eof[i], pos_eof[i].tolist(), vel_eof[i].tolist()) for i in range(len(t_eof))]
        self._write(tmp_path / 'frame_db', svs)
        orb = get_orbit(str(tmp_path / 'frame_db'), dt.datetime(2018, 11, 12, 23, 0, 32), pad=600)
        assert orb.times.size >= 4
