"""Gather rate vs dtype x row-width at PLANE-SWEEP shapes (VERDICT r5 #2).

The round-4 rate law (docs/PERF.md) was measured at TSDF shapes: narrow
rows (4-16 B), where f16x8 rows move ~4x faster than f32x4 at equal
bytes. The plane-sweep warp's packed-corner rows are 32-128 ELEMENTS
(64-256 B) — a different regime. This probe measures the real thing:
gather N rows (N = rows/KF per cascade stage, 6 views) from a table of
the stage's packed-corner size, for dtype in {bf16, f16, f32} and the
half-width row.

NOTE the jitted gather is defined ONCE per (dtype, width) signature —
a jit defined inside the timed closure re-traces per call and measures
tracing, not the gather (the 2026-08-20 first run's flat ~700 ms).
"""

import numpy as np

STAGES = [
    ("stage1", (121 * 161, 4 * 32), 48 * 120 * 160 * 6),
    ("stage2", (241 * 321, 4 * 16), 4 * 240 * 320 * 6),
    ("stage3", (481 * 641, 4 * 8), 4 * 480 * 640 * 6),
]


def main():
    import jax
    import jax.numpy as jnp

    from tandem_tpu.utils.benchmarking import (device_time,
                                               force_real_timing,
                                               measure_rtt)

    force_real_timing()
    rtt = measure_rtt()
    print(f"devices: {jax.devices()} (RTT {rtt * 1e3:.1f} ms)")
    rng = np.random.RandomState(0)

    @jax.jit
    def gsum(tbl, idx):
        return tbl[idx].astype(jnp.float32).sum()

    for name, (T, w), n in STAGES:
        idx = jax.device_put(rng.randint(0, T, n).astype(np.int32))
        src = rng.rand(T, w).astype(np.float32)
        for label, tbl in (
                ("bfloat16", src.astype("bfloat16")),
                ("float16", src.astype("float16")),
                ("float32", src),
                ("bf16-half", src[:, :w // 2].astype("bfloat16"))):
            tbl_d = jax.device_put(tbl)
            dt = device_time(lambda: gsum(tbl_d, idx), iters=8)
            wb = tbl.shape[1] * tbl.dtype.itemsize
            print(f"{name} rows={n / 1e6:.2f}M width={tbl.shape[1]} "
                  f"{label:9s}: {dt * 1e3:6.2f} ms  "
                  f"({n / dt / 1e6:6.0f} M rows/s, "
                  f"{n * wb / dt / 1e9:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
