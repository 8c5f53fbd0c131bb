"""End-to-end runtime benchmark: full TANDEM pipeline FPS on one TPU chip.

Runs the complete per-frame loop (dense coarse tracking, KF policy, windowed
BA, CVA-MVSNet inference with the TRAINED abl04 weights, TSDF
allocate+integrate, splat render, rendered-depth dense injection) over a
synthetic 640x480 sequence and reports FPS — the analogue of the reference's
runtime_euroc measurement (~21 FPS on a desktop GPU with preset=runtime =
trained model + dense:cuda tracking, commandline.cpp:76-101; BASELINE.md).

Not the driver benchmark (see bench.py); run manually:
  python bench_runtime.py [n_frames]
"""

import sys
import time

import numpy as np


def make_frames(n, H, W):
    """Textured plane sequence at full resolution."""
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    fx = 0.6 * W
    cx, cy = (W - 1) / 2, (H - 1) / 2
    frames = []
    for i in range(n):
        tx = 0.015 * i
        x = (u - cx) / fx * 2.0 + tx
        y = (v - cy) / fx * 2.0
        # High-frequency texture: per-pixel gradients comparable to real
        # imagery (the gradient-histogram selector needs > ~7/px edges).
        img = (120 + 45 * np.sin(17 * x) * np.cos(13 * y)
               + 30 * np.sin(41 * x + 1) + 25 * np.cos(33 * y)
               + 15 * np.sin(77 * x * y))
        # uint8, like the real reader path: uploads are 4x cheaper through
        # the host<->device link and upcast on device is free.
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
    return frames, fx, cx, cy


def main(n_frames=60):
    import os
    import pickle

    import jax.numpy as jnp

    from tandem_tpu.mapping.tsdf import TsdfConfig
    from tandem_tpu.models.cva_mvsnet import CvaMVSNet
    from tandem_tpu.pipeline.backend import TandemBackend
    from tandem_tpu.pipeline.full_system import FullSystem, FullSystemOptions
    from tandem_tpu.pipeline.mvsnet_runner import MvsnetRunner, init_variables
    from tandem_tpu.utils.timer import Timer

    H, W = 480, 640
    frames, fx, cx, cy = make_frames(n_frames, H, W)
    K_mat = np.array([[fx, 0, cx], [0, fx, cy], [0, 0, 1]], np.float32)

    model = CvaMVSNet(depth_num=(48, 4, 4), view_aggregation=True,
                      dtype=jnp.bfloat16)  # deployed abl04 arch
    # The reference's runtime bar (21 FPS preset=runtime) runs the TRAINED
    # model with dense tracking ON — match that: load the exported trained
    # weights so the measured loop is the real feedback loop (MVS depth ->
    # TSDF -> rendered depth -> dense coarse tracking), not a random-weight
    # stand-in. BENCH_RANDOM_WEIGHTS=1 restores the old behavior.
    pkl = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "exported", "tandem", "model_variables.pkl")
    if os.environ.get("BENCH_RANDOM_WEIGHTS") or not os.path.exists(pkl):
        variables = init_variables(model, H, W, 7)
        weights = "random"
    else:
        with open(pkl, "rb") as f:
            variables = pickle.load(f)
        weights = "trained(abl04)"
    runner = MvsnetRunner(model, variables, H, W, view_num=7,
                          staged=os.environ.get("BENCH_MVSNET_MODE",
                                                "staged"))
    timer = Timer()
    backend = TandemBackend(runner, TsdfConfig(), K_mat, H, W,
                            mesh_extraction_freq=0, timer=timer)
    opts = FullSystemOptions(selection_threshold_factor=0.35,
                             kf_global_weight=6.0, init_max_width=0.4,
                             dense_tracking=True)
    print(f"weights={weights} mvsnet_mode={runner._staged} "
          f"dense_tracking={opts.dense_tracking}")
    fs = FullSystem(fx, fx, cx, cy, H, W, options=opts, backend=backend,
                    timer=timer)

    times = []
    for i in range(n_frames):
        bgr = np.stack([frames[i]] * 3, -1).astype(np.uint8)
        t0 = time.perf_counter()
        fs.add_active_frame(frames[i], i, i / 30.0, bgr=bgr)
        times.append((time.perf_counter() - t0) * 1e3)

    warm = max(n_frames // 2, n_frames - 30)
    steady = times[warm:]
    med = float(np.median(steady))
    print(f"frames={n_frames} keyframes={len(fs.keyframes)} "
          f"backend_calls={backend.call_num} retracks={fs.n_retracks}")
    for name in sorted(timer.intervals):
        v = timer.intervals[name][5:] or timer.intervals[name]
        # median: lazy compiles land anywhere in the first half of the run
        # (per-shape), so a trimmed mean still reads compile time as cost
        print(f"  {name}: steady-median {np.median(v):.0f} ms "
              f"x{len(timer.intervals[name])}")
    print(f"END-TO-END steady: {1000 / med:.2f} FPS ({med:.1f} ms/frame) "
          f"vs reference ~21 FPS (desktop GPU; see docs/PERF.md for the "
          f"tunnel-bandwidth caveat)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 60)
