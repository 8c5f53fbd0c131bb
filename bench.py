"""Benchmark: CVA-MVSNet keyframe inference throughput on one TPU chip.

Measures the flagship runtime configuration (abl04: 7 views, 640x480,
depth planes (48, 32, 8), view aggregation, 10% edge filter — the model the
reference ships in its C++ runtime). Baseline: the reference's abl04 eval
throughput of 4.96 FPS / 201 ms per keyframe on a desktop GPU
(cva_mvsnet/pretrained/ablation/abl04_fewer_depth_planes.txt, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BASELINE_FPS = 4.96


def main():
    import jax
    import jax.numpy as jnp

    from tandem_tpu.models.cva_mvsnet import CvaMVSNet
    from tandem_tpu.pipeline.mvsnet_runner import init_variables

    H, W, V = 480, 640, 7
    dtype = jnp.bfloat16
    model = CvaMVSNet(view_aggregation=True, dtype=dtype)
    variables = init_variables(model, H, W, V)

    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, V, 3, H, W).astype(np.float32))
    K3 = np.array([[387.8, 0, (W - 1) / 2], [0, 387.8, (H - 1) / 2], [0, 0, 1]],
                  np.float32)
    Ks = []
    for s in (0.25, 0.5, 1.0):
        K = K3.copy()
        K[:2] *= s
        Ks.append(jnp.asarray(K[None]))
    c2w = np.broadcast_to(np.eye(4, dtype=np.float32), (1, V, 4, 4)).copy()
    for v in range(V):
        c2w[0, v, 0, 3] = 0.08 * v
        c2w[0, v, 1, 3] = 0.02 * v
    c2w = jnp.asarray(c2w)
    dmin = jnp.full((1,), 0.5, jnp.float32)
    dmax = jnp.full((1,), 6.0, jnp.float32)
    discard = jnp.full((1,), 10.0, jnp.float32)

    @jax.jit
    def forward(variables, image, K1, K2, K3, c2w, dmin, dmax, discard):
        out = model.apply(variables, image, (K1, K2, K3), c2w, dmin, dmax,
                          depth_filter_discard_percentage=discard, train=False)
        return out.stage3.depth, out.stage3.confidence

    args = (variables, image, *Ks, c2w, dmin, dmax, discard)

    # Warmup / compile
    d, c = forward(*args)
    jax.block_until_ready((d, c))

    # Per-iteration sync: async dispatch through the device tunnel can
    # otherwise under-report (each call must actually complete).
    iters = 10
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        d, c = forward(*args)
        jax.block_until_ready((d, c))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "cva_mvsnet_kf_fps_640x480_7view",
        "value": round(fps, 3),
        "unit": "keyframes/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))
    print(f"# latency: {dt * 1e3:.1f} ms/keyframe on {jax.devices()[0]}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
