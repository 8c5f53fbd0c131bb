"""Calibrate raw HBM streaming bandwidth + dispatch overhead on this chip.

Times y = x * 2 at several sizes; GB/s = (read + write) / t. Also an
8-op fused chain to see compute-per-byte scaling, and an empty-ish
dispatch to bound per-program overhead.
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from tandem_tpu.utils.benchmarking import device_time, force_real_timing


def main():
    force_real_timing()
    key = jax.random.PRNGKey(0)
    tiny = jnp.ones((8, 128), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(f_tiny(tiny))
    t = device_time(lambda: f_tiny(tiny), iters=50)
    print(f"tiny dispatch: {t*1e6:8.1f} us", flush=True)

    for mb in (10, 40, 160):
        n = mb * 1024 * 1024 // 4
        x = jax.random.normal(key, (n // 128, 128), jnp.float32)
        f = jax.jit(lambda x: x * 2.0)
        jax.block_until_ready(f(x))
        t = device_time(lambda: f(x), iters=20)
        gbs = 2 * mb / 1024 / t
        print(f"copy {mb:4d} MB: {t*1e3:8.3f} ms  {gbs:7.1f} GB/s", flush=True)

    def chain8(x):
        for _ in range(8):
            x = x * 1.0001 + 0.1
        return x

    for mb in (40, 160):
        n = mb * 1024 * 1024 // 4
        x = jax.random.normal(key, (n // 128, 128), jnp.float32)
        f = jax.jit(chain8)
        jax.block_until_ready(f(x))
        t = device_time(lambda: f(x), iters=20)
        gbs = 2 * mb / 1024 / t
        print(f"chain8 {mb:4d} MB: {t*1e3:8.3f} ms  {gbs:7.1f} GB/s (eff)",
              flush=True)


if __name__ == "__main__":
    main()
