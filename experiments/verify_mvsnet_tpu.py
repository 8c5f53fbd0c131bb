"""Verify the suspicious round-5 MVSNet TPU timing (74.4 -> 6.9 ms/KF).

Two independent checks:
1. Correctness: replay the committed trained golden pack ON THE TPU
   (boot self-check path, verify_golden) — if the compiler got 10x faster
   by computing garbage, this catches it.
2. Timing: the bench's exact staged model_step timed at K=8 and K=32 with
   the enqueue-chain protocol, plus a full per-call host-fetch timing
   (upper bound incl. tunnel). Consistent K=8/K=32 device times + a
   fetch-timing within RTT of them = real.
"""

import os
import pickle
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tandem_tpu.cli.tandem_export import verify_golden
    from tandem_tpu.models.cva_mvsnet import CvaMVSNet
    from tandem_tpu.pipeline.mvsnet_runner import (MvsnetRunner,
                                                   init_variables)
    from tandem_tpu.utils.benchmarking import (device_time,
                                               force_real_timing,
                                               measure_rtt)

    force_real_timing()
    print("devices:", jax.devices())

    # --- 1. trained-weight golden replay on the TPU --------------------
    with open("exported/tandem/model_variables.pkl", "rb") as f:
        variables = pickle.load(f)
    err = verify_golden("exported/tandem/sample_inputs.npz", variables)
    print(f"golden replay on {jax.default_backend()}: worst MAE {err:.3e}")

    # --- 2. the bench's model_step at two chain lengths -----------------
    H, W, V = 480, 640, 7
    model = CvaMVSNet(depth_num=(48, 4, 4), view_aggregation=True,
                      dtype=jnp.bfloat16)
    bvars = init_variables(model, H, W, V)
    rng = np.random.RandomState(0)
    image = jax.device_put(rng.rand(1, V, 3, H, W).astype(np.float32))
    fx = 387.8
    K3 = np.array([[fx, 0, (W - 1) / 2], [0, fx, (H - 1) / 2], [0, 0, 1]],
                  np.float32)
    Ks = []
    for s in (0.25, 0.5, 1.0):
        K = K3.copy()
        K[:2] *= s
        Ks.append(jax.device_put(K[None]))
    c2w = np.broadcast_to(np.eye(4, dtype=np.float32), (1, V, 4, 4)).copy()
    for v in range(V):
        c2w[0, v, 0, 3] = 0.08 * v
        c2w[0, v, 1, 3] = 0.02 * v
    c2w = jax.device_put(c2w)
    dmin = jax.device_put(np.full((1,), 0.5, np.float32))
    dmax = jax.device_put(np.full((1,), 6.0, np.float32))
    discard = jax.device_put(np.full((1,), 10.0, np.float32))

    runner = MvsnetRunner(model, bvars, H, W, view_num=V, staged="staged")
    rargs = (runner.variables, image, tuple(Ks), c2w, dmin, dmax)

    def model_step():
        d, c = runner._forward(*rargs)
        return runner._edge_filter(d, c, discard)

    rtt = measure_rtt()
    t8 = device_time(model_step, iters=8)
    t32 = device_time(model_step, iters=32)
    print(f"RTT {rtt * 1e3:.1f} ms | K=8 {t8 * 1e3:.2f} ms | "
          f"K=32 {t32 * 1e3:.2f} ms")

    # Full sync-each-call wall time (upper bound: device + tunnel).
    out = model_step()
    np.asarray(out[0])
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        out = model_step()
        np.asarray(out[0])
        times.append(time.perf_counter() - t0)
    print(f"sync-per-call wall: median {np.median(times) * 1e3:.1f} ms "
          f"(incl. one RTT {rtt * 1e3:.1f} ms + fetch of 1.2 MB)")


if __name__ == "__main__":
    main()
