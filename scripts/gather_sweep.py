"""Scattered-row gather sweep: rows/s and GB/s vs row width and dtype.

The static brick integrate kernel is built from one scattered-row gather per
(ray, group); BASELINE.md's round-2 ablation measured its pure-gather floor
at 112 ms for 16 x 1M x 126-f32 rows.  VERDICT r2 item 1 names the levers:
fewer/fatter rows (wider bricks) and a reduced-precision table.  Both only
pay if the gather is BYTE-bound at these row sizes; if it is COUNT-bound,
only fewer rows helps and dtype is irrelevant.  This sweep measures jnp.take
throughput for every (row_width, dtype) the redesign would use, from a table
sized like the production brick table, with the same scattered-index
distribution the kernel produces.

Run on the real TPU:  python scripts/gather_sweep.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n_rows_table = 8_000_000          # HRRR-sized brick table row count
    n_gather = 16_000_000             # 16 groups x 1M rays
    reps = 3

    idx_np = rng.integers(0, n_rows_table, n_gather).astype(np.int32)
    idx = jnp.asarray(idx_np)

    block = (rng.standard_normal((1000, 504)) * 100).astype(np.float32)

    def make_table(n_rows, width, dtype):
        # tile a small random block on device: table VALUES don't affect
        # gather throughput, only shape/dtype do
        b = jnp.asarray(block[:, :width], dtype=dtype)
        return jnp.tile(b, (n_rows // 1000, 1))

    @jax.jit
    def take_sum(table, idx, bump):
        g = jnp.take(table, idx + bump, axis=0)
        # cheap consumer that cannot elide the gather but adds ~no time
        return g.sum(dtype=jnp.float32)

    results = []
    for width in (63, 126, 252, 504):
        for dtype in (np.float32, np.int16, jnp.bfloat16):
            dt_name = np.dtype(dtype).name if dtype != jnp.bfloat16 else 'bfloat16'
            itemsize = 2 if dt_name in ('int16', 'bfloat16') else 4
            nbytes_table = n_rows_table * width * itemsize
            if nbytes_table > 6 * 1024**3:
                continue
            table = jax.block_until_ready(make_table(n_rows_table, width, dtype))
            _ = float(take_sum(table, idx, 0))
            ts = []
            for k in range(1, reps + 1):
                t0 = time.perf_counter()
                _ = float(take_sum(table, idx, k % 2))
                ts.append(time.perf_counter() - t0)
            t = min(ts)
            mrows = n_gather / t / 1e6
            gbs = n_gather * width * itemsize / t / 1e9
            results.append(dict(width=width, dtype=dt_name, t_s=round(t, 4),
                                mrows_per_s=round(mrows, 1),
                                gb_per_s=round(gbs, 1)))
            print(json.dumps(results[-1]), flush=True)
            del table

    # fewer, fatter rows at constant total bytes: does 8M x 252f beat
    # 16M x 126f?  (the wider-brick redesign halves gather count at ~2x row)
    print('--- constant-byte scaling (total 8 GB gathered) ---', flush=True)
    for n_g, width, dtype in ((16_000_000, 126, np.float32),
                              (8_000_000, 252, np.float32),
                              (4_000_000, 504, np.float32),
                              (16_000_000, 252, np.int16),
                              (8_000_000, 504, np.int16)):
        dt_name = np.dtype(dtype).name
        itemsize = np.dtype(dtype).itemsize
        n_rows = n_rows_table // (width // 126)
        table = jax.block_until_ready(make_table(n_rows, width, dtype))
        idx_g = jnp.asarray(idx_np[:n_g] % n_rows)
        _ = float(take_sum(table, idx_g, 0))
        ts = []
        for k in range(1, reps + 1):
            t0 = time.perf_counter()
            _ = float(take_sum(table, idx_g, k % 2))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(json.dumps(dict(n_gather=n_g, width=width, dtype=dt_name,
                              t_s=round(t, 4),
                              mrows_per_s=round(n_g / t / 1e6, 1),
                              gb_per_s=round(n_g * width * itemsize / t / 1e9, 1))),
              flush=True)
        del table, idx_g


if __name__ == '__main__':
    main()
