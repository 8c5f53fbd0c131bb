"""Why is the slot-gather splat path +3 ms/chunk over dynamic_slice?

Times (a) a contiguous (2048, 512) dynamic_slice, (b) the same rows via a
slot gather from the (65536, 512) f32 pool, (c) one big n-row pre-gather
followed by contiguous slices, (d) slot gather from an f16 copy of the
pool. Decides the round-5 splat chunking architecture.

Run: timeout 1200 python -u experiments/bench_slot_gather.py
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tandem_tpu.utils.benchmarking import device_time, force_real_timing

P, B3 = 65536, 512
CH = 2048
N = 6144


def main():
    force_real_timing()
    rng = np.random.RandomState(0)
    pool = jnp.asarray(rng.rand(P, B3).astype(np.float32))
    pool16 = pool.astype(jnp.float16)
    slots = jnp.asarray(
        np.sort(rng.choice(P, N, replace=False)).astype(np.int32))

    @partial(jax.jit, static_argnums=(2,))
    def dyn(pool, start, ch):
        return jnp.sum(jax.lax.dynamic_slice_in_dim(pool, start, ch, 0))

    @jax.jit
    def gat(pool, sl):
        return jnp.sum(pool[sl])

    @jax.jit
    def pregather(pool, slots):
        return pool[slots]

    for name, fn in (
        ("dynamic_slice 3x2048x512 f32",
         lambda: sum(dyn(pool, s, CH) for s in (0, CH, 2 * CH))),
        ("slot gather   3x2048x512 f32",
         lambda: sum(gat(pool, jax.lax.dynamic_slice_in_dim(slots, s, CH, 0))
                     for s in (0, CH, 2 * CH))),
        ("slot gather   3x2048x512 f16",
         lambda: sum(gat(pool16,
                         jax.lax.dynamic_slice_in_dim(slots, s, CH, 0))
                     for s in (0, CH, 2 * CH))),
        ("pre-gather 6144 rows f32 once", lambda: pregather(pool, slots)),
    ):
        t = device_time(fn, iters=10) * 1e3
        print(f"{name}   {t:7.2f} ms")


if __name__ == "__main__":
    main()
