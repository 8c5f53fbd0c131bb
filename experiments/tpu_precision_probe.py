"""Golden-pack accuracy x speed on TPU vs jax matmul precision.

The trained golden replay measures MAE 2.4e-1 on TPU vs 4.6e-4 on CPU
(experiments/verify_mvsnet_tpu.py, 2026-08-20). Hypothesis: XLA:TPU runs
f32 convs as single-pass bf16 on the MXU by default; CPU computes true
f32. This probe replays the same pack under each precision mode and
times the deployed-shape forward, to pick the runtime's precision point
(quality bar: the reference runs the whole net in CUDA fp16 —
dr_mvsnet.cpp — so plane-sweep matching demonstrably tolerates ~10-bit
mantissas; bf16 has 8).
"""

import os
import pickle

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tandem_tpu.cli.tandem_export import verify_golden
    from tandem_tpu.utils.benchmarking import (device_time,
                                               force_real_timing,
                                               measure_rtt)

    force_real_timing()
    print("devices:", jax.devices())

    with open("exported/tandem/model_variables.pkl", "rb") as f:
        variables = pickle.load(f)

    pack = "exported/tandem/sample_inputs.npz"
    for prec in (None, "BF16_BF16_F32_X3", "float32", "highest"):
        ctx = (jax.default_matmul_precision(prec) if prec
               else _null())
        with ctx:
            err = verify_golden(pack, variables)
        print(f"precision={prec or 'default'}: worst MAE {err:.3e}",
              flush=True)

    # Deployed-shape timing under the winning precision modes.
    from tandem_tpu.models.cva_mvsnet import CvaMVSNet
    from tandem_tpu.pipeline.mvsnet_runner import MvsnetRunner, init_variables
    H, W, V = 480, 640, 7
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
    rtt = measure_rtt()
    for dtype, prec in ((jnp.bfloat16, None),
                        (jnp.float32, "BF16_BF16_F32_X3"),
                        (jnp.float32, "highest")):
        model = CvaMVSNet(depth_num=(48, 4, 4), view_aggregation=True,
                          dtype=dtype)
        bvars = init_variables(model, H, W, V)
        runner = MvsnetRunner(model, bvars, H, W, view_num=V,
                              staged="staged")
        rargs = (runner.variables, image, tuple(Ks), c2w, dmin, dmax)

        def model_step():
            with (jax.default_matmul_precision(prec) if prec else _null()):
                d, c = runner._forward(*rargs)
                return runner._edge_filter(d, c, discard)
        t8 = device_time(model_step, iters=8)
        print(f"dtype={dtype.__name__} precision={prec or 'default'}: "
              f"{t8 * 1e3:.1f} ms/KF (RTT {rtt * 1e3:.1f} ms)", flush=True)


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
