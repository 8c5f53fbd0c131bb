"""Gather rate vs dtype x row-width at PLANE-SWEEP shapes (VERDICT r5 #2).

The round-4 rate law (docs/PERF.md) was measured at TSDF shapes: narrow
rows (4-16 B), where f16x8 rows move ~4x faster than f32x4 at equal
bytes. The plane-sweep warp's packed-corner rows are 32-128 ELEMENTS
(64-256 B) — a different regime. This probe measures the real thing:
gather N rows (N = rows/KF per cascade stage, 6 views) from a table of
the stage's packed-corner size, for dtype in {bf16, f16, f32}.

Stage shapes (abl04 deployed, 640x480, V=7 -> 6 source views):
  stage1: table (121*161, 4*32)  rows 48*120*160*6 = 5.53 M
  stage2: table (241*321, 4*16)  rows  4*240*320*6 = 1.84 M
  stage3: table (481*641, 4*8)   rows  4*480*640*6 = 7.37 M
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

    for name, (T, w), n in STAGES:
        idx = jax.device_put(rng.randint(0, T, n).astype(np.int32))
        src = rng.rand(T, w).astype(np.float32)
        for dtype in ("bfloat16", "float16", "float32"):
            tbl = jax.device_put(src.astype(dtype))

            def run():
                @jax.jit
                def g(tbl, idx):
                    r = tbl[idx]
                    # reduce so the gather result is consumed on-device
                    return r.astype(jnp.float32).sum()
                return g(tbl, idx)

            dt = device_time(run, iters=8)
            rate = n / dt / 1e6
            print(f"{name} rows={n / 1e6:.2f}M width={w} {dtype:9s}: "
                  f"{dt * 1e3:6.2f} ms  ({rate:6.0f} M rows/s, "
                  f"{n * w * np.dtype(dtype).itemsize / dt / 1e9:5.1f} GB/s)",
                  flush=True)

        # Half-width f16 split? Not applicable here (features, not scalars),
        # but probe a HALVED row width to separate issue-rate from bandwidth.
        tbl = jax.device_put(src[:, :w // 2].astype("bfloat16"))

        def run_half():
            @jax.jit
            def g(tbl, idx):
                return tbl[idx].astype(jnp.float32).sum()
            return g(tbl, idx)
        dt = device_time(run_half, iters=8)
        print(f"{name} rows={n / 1e6:.2f}M width={w // 2} bf16-half: "
              f"{dt * 1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
