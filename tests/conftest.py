"""Test configuration: force JAX onto CPU with 8 virtual devices.

This mirrors the reference's strategy of running CI without special hardware
(reference: test/conftest.py --skip-isce3); here the analogue is running the
TPU code paths on a virtual CPU mesh so sharding logic is exercised without
real chips. Must set env vars before jax is imported anywhere.
"""

import os

prev = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in prev:
    os.environ['XLA_FLAGS'] = (prev + ' --xla_force_host_platform_device_count=8').strip()

# The axon TPU plugin (if present) pins jax_platforms='axon,cpu' via the
# config API at interpreter start, so the env var alone is not enough;
# override through the config API before any backend is initialized.
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import pathlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = pathlib.Path('/root/reference')
REF_WM_DIR = REFERENCE_DIR / 'test' / 'weather_files'

requires_reference_data = pytest.mark.skipif(
    not REF_WM_DIR.exists(), reason='reference test data not available'
)


@pytest.fixture(scope='session')
def era5_la_file():
    """Processed ERA-5 weather file over Los Angeles (2020-01-30T13:52:45)."""
    p = REF_WM_DIR / 'ERA-5_2020_01_30_T13_52_45_32N_35N_120W_115W.nc'
    if not p.exists():
        pytest.skip('reference ERA5 test file not available')
    return p


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(42)
