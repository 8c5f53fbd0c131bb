"""MvsnetRunner mode shootout on the real chip: monolithic vs staged vs
per-view staged cascade, measured at the exact shapes bench.py uses
(640x480, V=7, bf16, view aggregation, edge filter chained).

The staged modes exist because components measured alone sum to
~150-165 ms while the monolithic forward schedules at ~198 ms; the
per-view split additionally cuts each warp+diff^2 into its own program
(stage-2 per-view floor 7.1 ms vs >=10.4 composed). This measures all
three through the same device-input step so the winner can be wired
into bench.py / the runtime default.

Run: timeout 3000 python experiments/bench_runner_modes.py
"""

import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
import jax.numpy as jnp

from tandem_tpu.models.cva_mvsnet import CvaMVSNet
from tandem_tpu.pipeline.mvsnet_runner import MvsnetRunner, init_variables
from tandem_tpu.utils.benchmarking import device_time, force_real_timing

H, W, V = 480, 640, 7


def main():
    force_real_timing()
    model = CvaMVSNet(view_aggregation=True, dtype=jnp.bfloat16)
    variables = init_variables(model, H, W, V)
    rng = np.random.RandomState(0)
    # Device-resident inputs: measure the compute schedule, not the
    # ~70 MB/s tunnel host->device copy.
    image = jax.device_put(
        (rng.rand(1, V, 3, H, W) * 255).astype(np.uint8))
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

    ref_depth = None
    for mode in (False, True, "perview"):
        runner = MvsnetRunner(model, variables, H, W, view_num=V,
                              staged=mode)

        def step():
            d, c = runner._forward(runner.variables, image, tuple(Ks),
                                   c2w, dmin, dmax)
            return runner._edge_filter(d, c, discard)

        out = jax.block_until_ready(step())
        d_np = np.asarray(out[0])
        if ref_depth is None:
            ref_depth = d_np
        else:
            err = float(np.abs(d_np - ref_depth).max())
            print(f"mode={mode}: max|d-mono| = {err:.2e}", flush=True)
        dt = device_time(step, iters=8) * 1e3
        print(f"mode={mode!s:8s}: {dt:7.1f} ms/KF", flush=True)


if __name__ == "__main__":
    main()
