"""Probe: can Mosaic do fast dynamic gathers from a VMEM-resident table?

The plane-sweep warp is bound by XLA's HBM gather (~100-460 M rows/s,
dropping with table size). The source feature map of every cascade stage
fits in VMEM (2.5-10 MB), so a Pallas kernel gathering from VMEM could be
~10x faster IF Mosaic supports a vectorized dynamic gather. This script
tests the candidate lowerings on the real chip and measures rows/s.

Run: timeout 1800 python experiments/pallas_gather_probe.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from tandem_tpu.utils.benchmarking import device_time, force_real_timing

# Stage-2-per-view-like shape (scaled N for quick compiles first).
M = 241 * 321          # table rows (padded 240x320 source)
CW = 64                # packed 4*C row width, C=16
N_SMALL = 64 * 1024
N_FULL = 32 * 240 * 320  # 2.458M rows = stage2 D*H*W


def xla_gather(tbl, idx):
    return tbl[idx]


def make_pallas_sublane(n, tn, cw):
    """Grid over N tiles; whole table in VMEM; take_along_axis on sublanes."""
    def kernel(tbl_ref, idx_ref, out_ref):
        idx = idx_ref[:]                      # (tn, 1) int32
        idxb = jnp.broadcast_to(idx, (tn, cw))
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], idxb, axis=0)

    def fn(tbl, idx2d):
        return pl.pallas_call(
            kernel,
            grid=(n // tn,),
            in_specs=[
                pl.BlockSpec((M, cw), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tn, cw), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, cw), tbl.dtype),
        )(tbl, idx2d)
    return fn


def make_pallas_take(n, tn, cw):
    """Same but jnp.take (gather via iota indices)."""
    def kernel(tbl_ref, idx_ref, out_ref):
        idx = idx_ref[:]                      # (tn, 1)
        out_ref[:] = jnp.take(tbl_ref[:], idx[:, 0], axis=0)

    def fn(tbl, idx2d):
        return pl.pallas_call(
            kernel,
            grid=(n // tn,),
            in_specs=[
                pl.BlockSpec((M, cw), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tn, cw), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, cw), tbl.dtype),
        )(tbl, idx2d)
    return fn


def make_pallas_fused(n, tn, cw, c):
    """The real target: gather packed corners + bilinear weight, out (n, c)."""
    def kernel(tbl_ref, idx_ref, w_ref, out_ref):
        idx = jnp.broadcast_to(idx_ref[:], (tn, cw))
        g = jnp.take_along_axis(tbl_ref[:], idx, axis=0)  # (tn, 4c)
        acc = (g[:, 0 * c:1 * c] * w_ref[:, 0:1]
               + g[:, 1 * c:2 * c] * w_ref[:, 1:2]
               + g[:, 2 * c:3 * c] * w_ref[:, 2:3]
               + g[:, 3 * c:4 * c] * w_ref[:, 3:4])
        out_ref[:] = acc

    def fn(tbl, idx2d, w):
        return pl.pallas_call(
            kernel,
            grid=(n // tn,),
            in_specs=[
                pl.BlockSpec((M, cw), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, 4), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tn, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, c), tbl.dtype),
        )(tbl, idx2d, w)
    return fn


def bench(name, fn, args, n_rows, ref=None):
    try:
        out = jax.jit(fn)(*args)
        out.block_until_ready()
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAILED — {msg}")
        return None
    if ref is not None:
        ok = np.allclose(np.asarray(out[:1024], np.float32),
                         np.asarray(ref[:1024], np.float32), atol=1e-2)
        if not ok:
            print(f"{name}: WRONG RESULT")
            return None
    jfn = jax.jit(fn)
    t = device_time(lambda: jfn(*args), iters=20)
    print(f"{name}: {t * 1e3:8.3f} ms  ({n_rows / t / 1e6:8.1f} M rows/s)")
    return t


def main():
    force_real_timing()
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (M, CW), jnp.float32).astype(jnp.bfloat16)
    for n in (N_SMALL, N_FULL):
        print(f"--- N = {n} rows, table ({M}, {CW}) bf16 ---")
        idx = jax.random.randint(key, (n,), 0, M, jnp.int32)
        idx2d = idx[:, None]
        w = jax.random.uniform(key, (n, 4), jnp.float32).astype(jnp.bfloat16)
        ref = jax.jit(xla_gather)(tbl, idx)
        ref.block_until_ready()
        bench("xla_gather     ", xla_gather, (tbl, idx), n)
        for tn in (512, 2048, 8192):
            bench(f"pallas_tala tn={tn:5d}",
                  make_pallas_sublane(n, tn, CW), (tbl, idx2d), n, ref)
        bench("pallas_take tn=2048",
              make_pallas_take(n, 2048, CW), (tbl, idx2d), n, ref)
        bench("pallas_fused tn=2048",
              make_pallas_fused(n, 2048, CW, 16), (tbl, idx2d, w), n)


if __name__ == "__main__":
    main()
