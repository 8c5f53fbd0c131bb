"""Probe: does the HBM gather row rate hold at 256-576-lane rows?

The plane-sweep warp fetches one packed 4C row (64 lanes bf16, 128 B) per
(pixel, depth-plane) sample at ~420 M rows/s — issue-rate bound, only ~7%
of HBM bandwidth.  Grouping G consecutive depth planes per pixel into ONE
patch-row fetch (P x P source pixels x C channels) divides the row count
by G *if* the row rate survives wider rows.  This measures exactly that at
the stage-2/stage-3 shapes the grouped warp would use.

Run: TANDEM_PLATFORM=axon timeout 1800 python experiments/bench_group_gather.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from tandem_tpu.utils.benchmarking import device_time, force_real_timing


def coherent_indices(n_rows, table_rows, rng):
    """Smooth ramp + jitter — matches the warp's spatially coherent pattern."""
    base = np.linspace(0, table_rows - 2, n_rows)
    idx = base + rng.uniform(-3, 3, size=n_rows)
    return np.clip(idx, 0, table_rows - 1).astype(np.int32)


def main():
    force_real_timing()
    rng = np.random.RandomState(0)

    # (label, table_rows, lanes, gather_rows)
    # stage2: 240x320, D=32, C=16.  stage3: 480x640, D=8, C=8.
    HW2, HW3 = 240 * 320, 480 * 640
    cases = [
        ("s2 plain   4C=64", 241 * 321, 64, 32 * HW2),
        ("s2 G=2 P4 S2 256", 121 * 161, 256, 16 * HW2),
        ("s2 G=4 P6 S2 576", 121 * 161, 576, 8 * HW2),
        ("s2 G=8 P8 S2 1024", 121 * 161, 1024, 4 * HW2),
        ("s3 plain   4C=32", 481 * 641, 32, 8 * HW3),
        ("s3 G=2 P4 S2 128", 241 * 321, 128, 4 * HW3),
        ("s3 G=4 P6 S2 288", 241 * 321, 288, 2 * HW3),
        ("s3 G=8 P8 S2 512", 241 * 321, 512, 1 * HW3),
    ]
    for label, trows, lanes, grows in cases:
        tbl = jnp.asarray(rng.randn(trows, lanes), jnp.bfloat16)
        idx = jnp.asarray(coherent_indices(grows, trows, rng))

        @jax.jit
        def g(tbl=tbl, idx=idx):
            return tbl[idx]

        t = device_time(lambda: g(), iters=20)
        gb = grows * lanes * 2 / 1e9
        print(f"{label}: rows={grows/1e6:6.2f}M  {t*1e3:7.2f} ms  "
              f"{grows/t/1e6:7.1f} M rows/s  {gb/t:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
