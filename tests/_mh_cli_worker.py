"""4-process CLI worker for test_parallel.py::TestMultiHost (VERDICT r4
item 6: drive the FULL CLI, not just tropo_delay, across a >2-process
mesh).

Each OS process owns 2 virtual CPU devices; 4 processes form one 8-device
global mesh via raider_tpu.parallel.initialize_distributed (jax.distributed
+ gloo). Every process runs the complete ``calcDelays`` workflow from a
YAML config (raytraced cube, synthetic orbit file, mocked weather prep)
into its own output directory and prints product-content digests; the
parent asserts all four agree with each other and with the single-process
golden bit-exactly.

Run: python _mh_cli_worker.py <process_id> <num_processes> <port> <workdir>
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
workdir = sys.argv[4]

os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from raider_tpu.parallel.mesh import initialize_distributed  # noqa: E402

initialize_distributed(f'localhost:{port}', nproc, pid)
assert len(jax.devices()) == 2 * nproc, 'global device view did not form'
assert len(jax.local_devices()) == 2

import json  # noqa: E402

from tests._mh_scene import run_cli  # noqa: E402

digests = run_cli(os.path.join(workdir, f'proc{pid}'))
print(f'MH_CLI pid={pid} {json.dumps(digests, sort_keys=True)}', flush=True)
