"""Device-placement helpers.

Precision model: TPU float64 is emulated at reduced precision on some
platforms (measured ~f32 ULP on the current target), so every stage that
needs true f64 (orbit geometry, ECEF<->LLA of ray endpoints) runs as jitted
XLA:CPU code on the host, while the bandwidth/compute-heavy f32 stages run
on TPU. This module provides the small amount of plumbing for that split.
"""

import functools

import jax


@functools.lru_cache(maxsize=None)
def cpu_device():
    # local_devices, NOT devices: in a multi-process (jax.distributed) run
    # jax.devices() is the GLOBAL list and [0] can belong to another
    # process — pinning default_device there yields arrays this process
    # cannot fetch
    return jax.local_devices(backend='cpu')[0]


@functools.lru_cache(maxsize=None)
def tpu_device():
    """Best accelerator device available (process-local), else CPU."""
    for kind in ('tpu', 'gpu'):
        try:
            return jax.local_devices(backend=kind)[0]
        except RuntimeError:
            continue
    return cpu_device()


def host_eager(f):
    """Run on host CPU when called eagerly with non-JAX (NumPy/python) inputs.

    Inside jit, arguments are tracers (jax.Array instances) and the function
    traces through unchanged. Called eagerly with NumPy arrays or scalars it
    executes on XLA:CPU, which keeps interactive/host-pipeline use fast and
    in true float64 even when the default backend is a (possibly remote) TPU.
    """
    @functools.wraps(f)
    def call(*args, **kwargs):
        leaves = jax.tree_util.tree_leaves((args, kwargs))
        if any(isinstance(x, jax.Array) for x in leaves):
            return f(*args, **kwargs)
        with jax.default_device(cpu_device()):
            return f(*args, **kwargs)

    return call


def host_jit(fun=None, **jit_kwargs):
    """jax.jit pinned to the host CPU backend (true float64).

    Used for geometry stages that require f64: the computation is compiled
    by XLA:CPU and reads/writes host memory, avoiding the TPU's emulated f64.
    """
    def wrap(f):
        jitted = jax.jit(f, **jit_kwargs)

        @functools.wraps(f)
        def call(*args, **kwargs):
            with jax.default_device(cpu_device()):
                return jitted(*args, **kwargs)

        return call

    if fun is None:
        return wrap
    return wrap(fun)
