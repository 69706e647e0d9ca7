"""Device-mesh utilities for sharding ray batches across TPU chips.

The framework's scaling dimension is the number of rays (flattened query
points): the weather cube is small and replicated in each chip's HBM, the
ray batch is sharded over the ICI mesh, and every ray's integral is computed
locally - no cross-chip communication until outputs are gathered (the
distributed design the reference lacks entirely; its parallelism is
std::async threads, reference: tools/bindings/interpolate/src/module.cpp:73-87).
"""

import math
from functools import lru_cache
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = 'rays'


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host TPU-pod initialization (jax.distributed); single-host runs
    are a no-op."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


@lru_cache(maxsize=None)
def get_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the available devices; the single axis is the ray batch."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]).reshape(n), (RAY_AXIS,))


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0):
    """Pad an axis up to a multiple (static shapes for even sharding).

    Returns (padded, original_length)."""
    n = arr.shape[axis]
    target = math.ceil(n / multiple) * multiple
    if target == n:
        return arr, n
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, target - n)
    return np.pad(arr, widths, mode='edge'), n


def place_ray_arrays(arrays, ray_axis: int, mesh: Optional[Mesh] = None):
    """Shard each array's ``ray_axis`` over the mesh (edge-padding to a
    multiple of the device count) and return (placed_arrays, original_n).

    Lets jit-compiled programs run SPMD over the ray batch without shard_map:
    the weather cube stays replicated, indices/weights are sharded, and the
    gather produces sharded output with no collectives.
    """
    mesh = mesh or get_mesh()
    n_dev = mesh.devices.size
    placed = []
    orig_n = None
    for a in arrays:
        if not isinstance(a, jax.Array):
            a = np.asarray(a)
        n = a.shape[ray_axis]
        target = math.ceil(n / n_dev) * n_dev
        if isinstance(a, jax.Array):
            # already on device (e.g. device-geometry outputs): pad and
            # reshard WITHOUT a host round trip
            if target != n:
                widths = [(0, 0)] * a.ndim
                widths[ray_axis] = (0, target - n)
                a = jnp.pad(a, widths, mode='edge')
        else:
            a, _ = pad_to_multiple(a, n_dev, axis=ray_axis)
        orig_n = n if orig_n is None else orig_n
        spec = [None] * a.ndim
        spec[ray_axis] = RAY_AXIS
        placed.append(jax.device_put(a, NamedSharding(mesh, P(*spec))))
    return placed, orig_n


def replicate(array, mesh: Optional[Mesh] = None):
    mesh = mesh or get_mesh()
    return jax.device_put(array, NamedSharding(mesh, P()))


def device_get_global(tree):
    """``jax.device_get`` that also works across process boundaries.

    On a multi-host mesh the engine's output arrays are globally sharded and
    each process addresses only its local shards; plain ``device_get`` /
    ``np.asarray`` raise there. Leaves that are not fully addressable are
    all-gathered (one collective over the global mesh — gloo on CPU test
    meshes, ICI/DCN on a pod) so EVERY process returns the full global
    value, matching the single-process engine contract. Fully addressable
    leaves (the single-host case) take the plain device_get path unchanged.
    """
    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return jax.device_get(x)

    return jax.tree_util.tree_map(fetch, tree)


def shard_rays(fn: Callable, mesh: Optional[Mesh] = None, ray_axis_argnums=(),
               replicated_argnums=()) -> Callable:
    """Wrap a ray-batched function so the listed args shard over the mesh.

    ``fn(*args)`` must be jittable with the ray axis as the leading axis of
    each arg in ``ray_axis_argnums``; all other args are replicated. The
    output's leading axis is the ray axis (sharded).
    """
    mesh = mesh or get_mesh()
    n_dev = mesh.devices.size
    # jit ONCE: a fresh wrapper per call would key a new trace cache and
    # recompile every invocation of the wrapped function
    jitted = jax.jit(fn)

    def call(*args):
        placed = []
        orig_n = None
        for i, a in enumerate(args):
            if i in ray_axis_argnums:
                a = np.asarray(a)
                a, n = pad_to_multiple(a, n_dev, axis=0)
                orig_n = n if orig_n is None else orig_n
                sharding = NamedSharding(mesh, P(RAY_AXIS, *([None] * (a.ndim - 1))))
                placed.append(jax.device_put(a, sharding))
            else:
                placed.append(jax.device_put(a, NamedSharding(mesh, P())))
        out = jitted(*placed)
        if orig_n is None:
            return out
        return jax.tree_util.tree_map(lambda x: x[:orig_n], out)

    return call
