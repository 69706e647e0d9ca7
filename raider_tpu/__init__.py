"""raider-tpu: TPU-native tropospheric delay estimation for radar (InSAR/GNSS).

A from-scratch JAX/XLA/Pallas framework with the capabilities of RAiDER
(raytracing atmospheric delay estimation): computes wet + hydrostatic
tropospheric delays from numerical weather models in zenith (ZTD), projected
slant, and raytraced slant (STD) modes.

Design notes (TPU-first):
  * Geodesy and orbit geometry run in float64 (XLA-emulated on TPU, exact on
    host CPU); the hot integration kernels run in float32 over refractivity
    cubes resident in HBM.
  * All CRS transforms (geographic / geocentric / Lambert conformal conic /
    polar stereographic / transverse Mercator) are closed-form JAX functions,
    so the entire delay pipeline stays on-device and jit-compilable; no
    pyproj in the compute path.
  * Ray batches are flattened (z, y, x) -> N and sharded across a device mesh
    with jax.sharding; integration is a fused sample-interpolate-accumulate
    kernel per shard, with no cross-device communication until final output.

Reference capability parity: dbekaert/RAiDER (see SURVEY.md for the map of
reference components; docstrings cite reference behavior as file:line).
"""

import os as _os

import jax

# Geodesy (ECEF coordinates ~6.4e6 m) requires f64 for sub-mm precision.
# Hot kernels opt in to f32 explicitly; see raider_tpu.delay.
jax.config.update('jax_enable_x64', True)

# Persistent XLA compilation cache: the delay kernels compile once per
# (shape-bucket, backend) and are reused across processes — repeat workflow
# runs and benchmarks skip the multi-minute TPU compile entirely. Disable
# with RAIDER_TPU_COMPILE_CACHE=0 or point it elsewhere with the same var.
_cache = _os.environ.get('RAIDER_TPU_COMPILE_CACHE', '')
if _cache != '0':
    if _cache in ('', '1'):
        _cache = _os.path.join(_os.path.expanduser('~'), '.cache', 'raider_tpu', 'xla')
    try:
        _os.makedirs(_cache, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', _cache)
        # 0: persist EVERY executable. On a remote-attached TPU every
        # compile rides an HTTP round trip, so even trivial executables are
        # worth persisting (measured cold 526.6 s -> warm 114.6 s
        # time-to-first-slice; BASELINE.md "Cold vs warm start"). A nonzero
        # threshold also makes the warm-process recompile count
        # nondeterministic: an executable whose compile lands UNDER the
        # threshold in the cold process is not written, then lands over it
        # in the warm process and IS — observed as cache_files 20 -> 21
        # (setup_cache_served false) with the old 0.1 s threshold.
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    except (OSError, AttributeError):  # read-only FS or very old jax
        pass

__version__ = '0.1.0'

from raider_tpu.constants import _ZMIN, _ZREF  # noqa: F401,E402
