"""Multi-process worker for tests/test_parallel.py::TestMultiHost.

Each OS process owns 4 virtual CPU devices; the coordinator glues them into
one 8-device global mesh via raider_tpu.parallel.initialize_distributed
(jax.distributed + gloo collectives). The worker builds its process-LOCAL
half of a ray batch, assembles the global sharded array, integrates a toy
per-ray delay, reduces across the whole mesh, and prints the global result -
the parent asserts both processes print the bit-identical full-batch answer.

Run: python _mh_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from raider_tpu.parallel.mesh import (RAY_AXIS, get_mesh,  # noqa: E402
                                      initialize_distributed)

initialize_distributed(f'localhost:{port}', nproc, pid)
assert len(jax.devices()) == 4 * nproc, 'global device view did not form'
assert len(jax.local_devices()) == 4

mesh = get_mesh()
n_rays, L = 64, 5
# every process can SEE the full (deterministic) batch; each owns one
# contiguous block of rays (the multi-host data-loading contract: shards
# are produced process-locally, never gathered through the coordinator)
rng = np.random.default_rng(7)
seg_len = rng.uniform(10.0, 100.0, (n_rays, L))
wet_ppm = rng.uniform(1.0, 50.0, (n_rays, L))

local = slice(pid * n_rays // nproc, (pid + 1) * n_rays // nproc)
sharding = NamedSharding(mesh, P(RAY_AXIS, None))
args = [
    jax.make_array_from_process_local_data(sharding, host[local])
    for host in (seg_len, wet_ppm)
]


@jax.jit
def total_delay(seg, ppm):
    # per-ray trapezoid-free toy integral, then a full-mesh reduction:
    # the psum-equivalent collective rides the global mesh (gloo here,
    # ICI/DCN on a real pod)
    per_ray = jnp.sum(1e-6 * ppm * seg, axis=1)
    return jnp.sum(per_ray)


out = total_delay(*args)
expected = float(np.sum(1e-6 * wet_ppm * seg_len))
got = float(out)
assert abs(got - expected) < 1e-9 * abs(expected), (got, expected)
print(f'MH_OK pid={pid} total={got:.12f}', flush=True)

# ---- stage 2: PRODUCTION tropo_delay across the process boundary ----------
# The real engine (Zenith separable cube + Raytracing with host geometry,
# sharded integrate, batched async result stream) on the 2-process global
# mesh: each process holds the full inputs (deterministic scene), the ray
# batch shards over all 8 global devices, and device_get_global all-gathers
# the outputs so BOTH processes print the full-cube digest. The parent
# asserts the digests match each other AND the single-process golden
# bit-exactly.
import json  # noqa: E402

from tests._mh_scene import run_production  # noqa: E402

digests = run_production()
print(f'MH_PROD pid={pid} {json.dumps(digests, sort_keys=True)}', flush=True)
