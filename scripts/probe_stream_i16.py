"""Probe: does quantizing the result stream to int16 halve d2h tunnel time?

The engine's per-slice output is a (2, N) f32 buffer (8 MB at 1M rays),
batched 4 slices per async copy (32 MB). The e2e slope shows the tunnel
transfer does NOT overlap with compute (slope ~= compute + transfer), so
bytes-on-the-wire is the lever. This probe times device_get of a 32 MB f32
batch vs its 16 MB int16 quantized form (payload + scales), and the cost of
the on-device quantization op itself.

Run on the real chip: python scripts/probe_stream_i16.py
"""
import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# measure the PRODUCTION quantizer, not a copy that can drift from it
from raider_tpu.delay.engine import _quant16 as quant16  # noqa: E402


def main():
    k, n = 4, 1_000_000
    key = jax.random.PRNGKey(0)
    buf = jax.block_until_ready(
        2.0 + jax.random.uniform(key, (k, 2, n), jnp.float32))

    def time_fetch(make, iters=4):
        ts = []
        for i in range(iters):
            x = jax.block_until_ready(make(i))
            t0 = time.perf_counter()
            jax.device_get(x)
            ts.append(time.perf_counter() - t0)
        return min(ts), ts

    @jax.jit
    def bump(b, i):
        return b + jnp.float32(i) * 1e-6

    t_f32, ts_f32 = time_fetch(lambda i: bump(buf, i))
    t_i16, ts_i16 = time_fetch(lambda i: quant16(bump(buf, i)))

    # on-device quant cost: block_until_ready slope between quant and bump
    def time_dev(make, iters=6):
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(make(i + 10))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    quant_s = max(time_dev(lambda i: quant16(bump(buf, i)))
                  - time_dev(lambda i: bump(buf, i)), 0.0)

    print(json.dumps({
        'fetch_f32_32MB_s': round(t_f32, 4),
        'fetch_i16_16MB_s': round(t_i16, 4),
        'all_f32': [round(t, 3) for t in ts_f32],
        'all_i16': [round(t, 3) for t in ts_i16],
        'speedup': round(t_f32 / t_i16, 2),
        'quant_op_upper_bound_s': round(quant_s, 5),
        'backend': jax.default_backend(),
    }))


if __name__ == '__main__':
    main()
