"""Does TPU scatter-min have a large per-INVOCATION fixed cost?

The per-axis splat (6 programs x 131k rows) measured far slower than the
row count predicts vs the 3-program full splat (3 x 393k rows). If
scatter-min pays a fixed setup (e.g. a zbuf copy when aliasing fails),
splitting programs is a loss no matter how many rows culling removes.

Run: timeout 1200 python -u experiments/bench_scatter_fixed.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tandem_tpu.utils.benchmarking import device_time, force_real_timing

HW = 480 * 640


def main():
    force_real_timing()
    rng = np.random.RandomState(0)

    @jax.jit
    def sct(zbuf, flat, zval):
        return zbuf.at[flat].min(zval, mode="drop")

    sct_don = jax.jit(lambda zbuf, flat, zval:
                      zbuf.at[flat].min(zval, mode="drop"),
                      donate_argnums=(0,))

    for n in (131072, 262144, 393216, 1179648):
        flat = jnp.asarray(rng.randint(0, HW, n).astype(np.int32))
        zval = jnp.asarray(rng.rand(n).astype(np.float32) * 5)

        def run():
            zbuf = jnp.full((HW,), jnp.inf)
            return sct(zbuf, flat, zval)
        t = device_time(run, iters=10) * 1e3
        print(f"scatter-min {n:8d} rows (no donate)  {t:7.2f} ms")

        def run_d():
            zbuf = jnp.full((HW,), jnp.inf)
            return sct_don(zbuf, flat, zval)
        t = device_time(run_d, iters=10) * 1e3
        print(f"scatter-min {n:8d} rows (donated)    {t:7.2f} ms")

    # chained: 6 scatters of 131k vs 2 of 393k inside one chain
    flats = [jnp.asarray(rng.randint(0, HW, 131072).astype(np.int32))
             for _ in range(6)]
    zvals = [jnp.asarray(rng.rand(131072).astype(np.float32) * 5)
             for _ in range(6)]

    def chain6():
        zbuf = jnp.full((HW,), jnp.inf)
        for f, z in zip(flats, zvals):
            zbuf = sct_don(zbuf, f, z)
        return zbuf
    t = device_time(chain6, iters=10) * 1e3
    print(f"chain 6 x 131k donated             {t:7.2f} ms")

    flats3 = [jnp.concatenate(flats[i::3]) for i in range(3)]
    zvals3 = [jnp.concatenate(zvals[i::3]) for i in range(3)]

    def chain3():
        zbuf = jnp.full((HW,), jnp.inf)
        for f, z in zip(flats3, zvals3):
            zbuf = sct_don(zbuf, f, z)
        return zbuf
    t = device_time(chain3, iters=10) * 1e3
    print(f"chain 3 x 262k donated             {t:7.2f} ms")


if __name__ == "__main__":
    main()
