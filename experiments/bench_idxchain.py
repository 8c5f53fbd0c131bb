"""Probe variants of the bilinear index+weight chain (px,py -> rows, 4 wts).

The XLA chain measured 2.6 ms at stage-2 shape (2.46M samples) — ~40x over
memory-bound. Candidates: float row arithmetic (exact < 2^24), bf16 weights,
a fused Pallas elementwise kernel.

Run: timeout 1800 python experiments/bench_idxchain.py
"""

import sys
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from tandem_tpu.utils.benchmarking import device_time, force_real_timing

H, W, D = 240, 320, 32
N = D * H * W


def chain_int(x, y):
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    inside = ((x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1))
    ins = inside.astype(jnp.float32)
    xi = jnp.clip(x0, -1, W - 1).astype(jnp.int32) + 1
    yi = jnp.clip(y0, -1, H - 1).astype(jnp.int32) + 1
    rows = yi * (W + 1) + xi
    return (rows, (wx0 * wy0 * ins).astype(jnp.bfloat16),
            (wx1 * wy0 * ins).astype(jnp.bfloat16),
            (wx0 * wy1 * ins).astype(jnp.bfloat16),
            (wx1 * wy1 * ins).astype(jnp.bfloat16))


def chain_float(x, y):
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    inside = ((x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1))
    ins = inside.astype(jnp.float32)
    xf = jnp.clip(x0, -1, W - 1) + 1.0
    yf = jnp.clip(y0, -1, H - 1) + 1.0
    rows = (yf * (W + 1) + xf).astype(jnp.int32)   # exact: < 2^24
    return (rows, (wx0 * wy0 * ins).astype(jnp.bfloat16),
            (wx1 * wy0 * ins).astype(jnp.bfloat16),
            (wx0 * wy1 * ins).astype(jnp.bfloat16),
            (wx1 * wy1 * ins).astype(jnp.bfloat16))


def make_pallas(tn):
    def kernel(x_ref, y_ref, rows_ref, w00_ref, w10_ref, w01_ref, w11_ref):
        x = x_ref[:]
        y = y_ref[:]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0
        wx0 = 1.0 - wx1
        wy0 = 1.0 - wy1
        inside = ((x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1))
        ins = jnp.where(inside, 1.0, 0.0)
        xf = jnp.clip(x0, -1, W - 1) + 1.0
        yf = jnp.clip(y0, -1, H - 1) + 1.0
        rows_ref[:] = (yf * (W + 1) + xf).astype(jnp.int32)
        w00_ref[:] = (wx0 * wy0 * ins).astype(jnp.bfloat16)
        w10_ref[:] = (wx1 * wy0 * ins).astype(jnp.bfloat16)
        w01_ref[:] = (wx0 * wy1 * ins).astype(jnp.bfloat16)
        w11_ref[:] = (wx1 * wy1 * ins).astype(jnp.bfloat16)

    def fn(x2, y2):
        n = x2.shape[0]
        spec = pl.BlockSpec((tn, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(n // tn,),
            in_specs=[spec, spec],
            out_specs=[spec] * 5,
            out_shape=[jax.ShapeDtypeStruct((n, 128), jnp.int32)]
            + [jax.ShapeDtypeStruct((n, 128), jnp.bfloat16)] * 4,
        )(x2, y2)
    return fn


def main():
    force_real_timing()
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (N,), jnp.float32, -2.0, W + 1.0)
    y = jax.random.uniform(key, (N,), jnp.float32, -2.0, H + 1.0)
    x2 = x.reshape(-1, 128)
    y2 = y.reshape(-1, 128)

    ci = jax.jit(chain_int)
    cf = jax.jit(chain_float)
    ref = jax.block_until_ready(ci(x, y))
    got = jax.block_until_ready(cf(x, y))
    for r, g in zip(ref, got):
        assert np.array_equal(np.asarray(r), np.asarray(g))
    print("chain_float exact vs chain_int: OK", flush=True)

    print(f"chain_int:   {device_time(lambda: ci(x, y), 10)*1e3:7.2f} ms",
          flush=True)
    print(f"chain_float: {device_time(lambda: cf(x, y), 10)*1e3:7.2f} ms",
          flush=True)
    for tn in (256, 1024):
        try:
            pf = jax.jit(make_pallas(tn))
            out = jax.block_until_ready(pf(x2, y2))
            ok = np.array_equal(np.asarray(out[0]).reshape(-1),
                                np.asarray(ref[0]))
            ms = device_time(lambda: pf(x2, y2), 10) * 1e3
            print(f"pallas tn={tn}: {ms:7.2f} ms rows "
                  f"{'OK' if ok else 'WRONG'}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pallas tn={tn}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
