"""Probe: which 16-bit storage dtypes can a Mosaic kernel load + convert to
f32 + transpose, and what does the scattered-row gather floor look like at
16-bit 128-lane rows vs the production f32 126-lane rows?

All arrays are generated ON-DEVICE (a host upload of a GB-scale table would
ride the slow axon tunnel and time the probe out).

Run on the real TPU: python scripts/probe_f16.py
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def fetch(r):
    return float(jnp.nansum(r))


def time_fn(fn, reps=3):
    _ = fetch(fn(0.0))
    ts = []
    for k in range(1, reps + 1):
        t0 = time.perf_counter()
        _ = fetch(fn(float(k)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


N = 1 << 20
TILE, WIDTH = 4096, 128


def make_block(dtype):
    @jax.jit
    def mk():
        v = jnp.arange(N * WIDTH, dtype=jnp.float32).reshape(N, WIDTH)
        v = jnp.sin(v * 1e-3) * 100.0
        if dtype == jnp.int16:
            return jnp.round(v * 100.0).astype(jnp.int16)
        return v.astype(dtype)
    return mk()


def probe_kernel(name, dtype):
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        bt = x_ref[:].astype(jnp.float32).T        # (WIDTH, TILE)
        acc = jnp.zeros((TILE,), jnp.float32)
        for r in range(0, WIDTH, 16):
            acc = acc + bt[r, :] * 0.5
        o_ref[0, :] = acc

    x = make_block(dtype)

    @jax.jit
    def run(x):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kern,
                grid=(pl.cdiv(N, TILE),),
                in_specs=[pl.BlockSpec((TILE, WIDTH), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((1, TILE), lambda i: (0, i)),
                out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            )(x)

    try:
        got = np.asarray(run(x)[0])
        want = np.asarray(x, np.float32)[:, ::16].sum(axis=1) * 0.5
        err = float(np.abs(got - want).max() / max(np.abs(want).max(), 1.0))
        print(json.dumps({name: True, 'max_rel_err': err}), flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace('\n', ' ')[:300]
        print(json.dumps({name: False, 'error': msg}), flush=True)
        return False


def probe_bitcast_i16_bf16():
    """lanes stored as int16 bit patterns of bf16 values -> decode in kernel."""
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        raw = x_ref[:]                                  # (TILE, WIDTH) i16
        v = jax.lax.bitcast_convert_type(raw, jnp.bfloat16)
        o_ref[:] = v.astype(jnp.float32)

    vals = make_block(jnp.bfloat16)
    x = jax.jit(lambda v: jax.lax.bitcast_convert_type(v, jnp.int16))(vals)

    @jax.jit
    def run(x):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kern,
                grid=(pl.cdiv(N, TILE),),
                in_specs=[pl.BlockSpec((TILE, WIDTH), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((TILE, WIDTH), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((N, WIDTH), jnp.float32),
            )(x)

    try:
        got = np.asarray(run(x)[:256])
        want = np.asarray(vals[:256], np.float32)
        err = float(np.abs(got - want).max())
        print(json.dumps({'bitcast_i16_bf16': True, 'max_abs_err': err}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({'bitcast_i16_bf16': False,
                          'error': str(e).replace('\n', ' ')[:300]}),
              flush=True)


def probe_gathers():
    nrows = 50 * 400 * 400
    key = jax.random.PRNGKey(0)
    idx = jax.jit(lambda k: jax.random.randint(
        k, (11, N), 0, nrows - 1, jnp.int32))(key)
    idx = jax.block_until_ready(idx)

    for name, w, dt in (('f32_126', 126, jnp.float32),
                        ('f16_128', 128, jnp.float16),
                        ('bf16_128', 128, jnp.bfloat16),
                        ('i16_128', 128, jnp.int16)):
        @jax.jit
        def mk(w=w, dt=dt):
            v = jnp.arange(nrows * w, dtype=jnp.float32).reshape(nrows, w)
            v = jnp.sin(v * 1e-3)
            return jnp.round(v * 100).astype(dt) if dt == jnp.int16 \
                else v.astype(dt)
        try:
            tab = jax.block_until_ready(mk())
        except Exception as e:  # noqa: BLE001
            print(json.dumps({'gather_' + name: False,
                              'error': str(e)[:200]}), flush=True)
            continue

        @jax.jit
        def g(tab, idx, b):
            acc = jnp.zeros((N,), jnp.float32)
            for k in range(11):
                lin = jnp.minimum(idx[k] + jnp.int32(b), nrows - 1)
                lin = jax.lax.optimization_barrier((lin, acc))[0]
                rows = jnp.take(tab, lin, axis=0)
                acc = acc + rows.astype(jnp.float32).sum(axis=1)
            return acc

        t = time_fn(lambda b, tab=tab: g(tab, idx, b))
        gb = 11 * N * w * tab.dtype.itemsize / 1e9
        print(json.dumps(dict(gather=name, t_s=round(t, 4),
                              gbytes=round(gb, 2),
                              gbps=round(gb / t, 1))), flush=True)
        del tab


def main():
    print(json.dumps(dict(backend=jax.default_backend())), flush=True)
    probe_kernel('pallas_bf16', jnp.bfloat16)
    probe_kernel('pallas_f16', jnp.float16)
    probe_kernel('pallas_i16', jnp.int16)
    probe_bitcast_i16_bf16()
    probe_gathers()


if __name__ == '__main__':
    main()
