"""Benchmark: end-to-end keyframe pipeline throughput on one TPU chip.

Measures the full per-keyframe device schedule of the flagship runtime
configuration (abl04: CVA-MVSNet 7 views, 640x480, depth planes (48, 4, 4),
view aggregation, 10% edge filter) PLUS the TSDF fusion the reference runs
per keyframe (allocate + integrate + render for tracking feedback) and a
dense coarse-tracker frame step. Baseline: the reference's 21 FPS end-to-end
runtime and 201 ms/KF MVSNet forward on a desktop GPU (BASELINE.md).

HONEST TIMING THROUGH THE TUNNEL: the axon remote backend elides
block_until_ready until the first host fetch — sync-per-iteration timing
measures nothing (round-1's 0.4 ms/KF artifact). Protocol
(tandem_tpu/utils/benchmarking.py): poison first, enqueue K calls
back-to-back, sync once, subtract one RTT.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys

import numpy as np

BASELINE_KF_MS = 201.0      # abl04 PyTorch eval per-keyframe latency (GPU)


def main():
    import jax
    import jax.numpy as jnp

    from tandem_tpu.mapping.tsdf import (TsdfConfig, allocate_blocks,
                                         create_volume, integrate,
                                         render_depth_splat)
    from tandem_tpu.models.cva_mvsnet import CvaMVSNet
    from tandem_tpu.pipeline.mvsnet_runner import init_variables
    from tandem_tpu.tracking.coarse_tracker import (make_tracker_ref,
                                                    track_frame)
    from tandem_tpu.utils.benchmarking import (device_time, force_real_timing,
                                               measure_rtt)

    force_real_timing()
    rtt = measure_rtt()

    H, W, V = 480, 640, 7
    dtype = jnp.bfloat16
    # Deployed architecture: abl04 "fewer depth planes" DEPTH_NUM (48,4,4).
    # Proven from the shipped frozen graphs (both model.pt files contain
    # the 4x (1,2,2)-stride has_four_depths convs; scripts/
    # make_trained_export.py) — the 201 ms/KF GPU bar in
    # abl04_fewer_depth_planes.txt is for THIS shape, so this is the
    # apples-to-apples flagship benchmark. (Rounds 1-2 benched the heavier
    # training-default (48,32,8) against the same bar.)
    model = CvaMVSNet(depth_num=(48, 4, 4), view_aggregation=True,
                      dtype=dtype)
    variables = init_variables(model, H, W, V)

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

    # The runtime path: MvsnetRunner's compiled program chain exactly as
    # the SLAM pipeline ships it (cascade + edge filter as chained jits;
    # see the fusion-boundary lesson in docs/PERF.md). BENCH_MVSNET_MODE
    # picks the program split (mono | staged | perview); the default is
    # the v5e shootout winner (experiments/bench_runner_modes.py,
    # 2026-08-19: staged 164.7 ms/KF vs mono 174.1, perview 579 — staged
    # is exact vs mono to 0.0 and ships as the runtime default too,
    # settings.py mvsnet_staged).
    import os

    from tandem_tpu.pipeline.mvsnet_runner import MvsnetRunner

    mode_name = os.environ.get("BENCH_MVSNET_MODE", "staged")
    runner = MvsnetRunner(model, variables, H, W, view_num=V,
                          staged=mode_name)
    rargs = (runner.variables, image, tuple(Ks), c2w, dmin, dmax)

    def model_step():
        d, c = runner._forward(*rargs)
        return runner._edge_filter(d, c, discard)
    # Best-of-3 on the two headline intervals: transient enqueue-stream
    # stalls through the tunnel starve the device and inflate a single
    # chained measurement up to 2x (a TSDF interval measured 22 -> 42 ->
    # 24 ms across back-to-back runs with identical code); the minimum of
    # three chains is the honest device time.
    dt_model = min(device_time(model_step, iters=8) for _ in range(3))

    # --- TSDF fusion + render (per-KF mapping work) ---------------------
    cfg = TsdfConfig()
    Kd = jnp.asarray(K3)
    pose = jnp.asarray(np.eye(4, dtype=np.float32))
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    depth_np = (2.0 + 0.3 * np.sin(u * 0.05) * np.cos(v * 0.04)).astype(
        np.float32)
    color_np = np.stack([u % 255, v % 255, (u + v) % 255], -1).astype(
        np.float32)
    depth_d = jnp.asarray(depth_np)
    color_d = jnp.asarray(color_np)
    vol = create_volume(cfg)
    vol = allocate_blocks(cfg, vol, depth_d, Kd, pose)
    n_alloc = int(vol.n_allocated)
    n_pad = -(-max(n_alloc, 1) // 2048) * 2048

    # integrate() donates the volume buffers, so thread the state through
    # (reusing a donated input raises INVALID_ARGUMENT on real TPU).
    state = {"vol": vol}

    # The REAL per-KF backend fusion path (pipeline/backend.py call):
    # allocate (idempotent re-alloc here) + frustum cull + integrate
    # (adaptive full/culled — all-visible scene picks full) + splat render.
    # Round 3 measured integrate+render only and silently excluded the
    # then-69 ms allocate; the round-4 sort-dedup allocate rewrite makes
    # the honest number affordable (see docs/PERF.md).
    from tandem_tpu.mapping.tsdf import surface_axis_slots, visible_slots

    # Host-known per-axis surface counts (the backend fetches these on its
    # own thread, overlapped with VO; the fixed scene here makes them
    # loop-invariant so they are fetched once outside the timed chain).
    vol_w = integrate(cfg, state["vol"], depth_d, color_d, Kd, pose,
                      n_allocated=n_pad)
    ax_slots0, ax_counts0 = surface_axis_slots(cfg, vol_w, Kd, pose, H, W,
                                               n_pad)
    ax_counts = [int(c) for c in np.asarray(ax_counts0)]
    state["vol"] = vol_w

    def fusion_step():
        state["vol"] = allocate_blocks(cfg, state["vol"], depth_d, Kd, pose)
        slots, n_vis = visible_slots(cfg, state["vol"], Kd, pose, H, W)
        state["vol"] = integrate(cfg, state["vol"], depth_d, color_d, Kd,
                                 pose, n_allocated=n_pad)
        ax_slots, _ = surface_axis_slots(cfg, state["vol"], Kd, pose, H, W,
                                         n_pad)
        rd = render_depth_splat(cfg, state["vol"], Kd, pose, H, W,
                                n_allocated=n_pad, axis_slots=ax_slots,
                                axis_counts=ax_counts)
        return rd, n_vis
    dt_fusion = min(device_time(lambda: fusion_step()[0], iters=8)
                    for _ in range(3))

    # --- dense coarse-tracker frame step (per-frame tracking work) ------
    idepth0 = jnp.asarray((1.0 / depth_np).astype(np.float32))
    grid = np.zeros((H, W), np.float32)
    grid[::3, ::3] = 1.0
    ref = make_tracker_ref(jnp.asarray(color_np[..., 0]), fx, fx,
                           (W - 1) / 2, (H - 1) / 2,
                           dense_idepth=idepth0,
                           dense_weight=jnp.asarray(grid))
    new_img = jnp.asarray(color_np[..., 1])
    T0 = jnp.eye(4)
    aff0 = jnp.array([1.0, 0.0])
    dt_track = device_time(
        lambda: track_frame(ref, new_img, T0, aff0)["T"], iters=8)

    # --- remaining per-KF device work (BA + tracking-ref rebuild) -------
    from tandem_tpu.pipeline.full_system import _project_ba_points
    from tandem_tpu.tracking.ba import (ba_iterate, create_ba_state,
                                        remove_outliers)

    Fw, Npts = 8, 2048
    st = create_ba_state(Fw, Npts)
    rng2 = np.random.RandomState(1)
    poses = np.broadcast_to(np.eye(4, dtype=np.float32),
                            (Fw, 4, 4)).copy()
    poses[:, 0, 3] = 0.05 * np.arange(Fw)
    st = st._replace(
        poses=jnp.asarray(poses),
        frame_valid=jnp.ones((Fw,), bool),
        pt_frame=jnp.asarray(rng2.randint(0, Fw, Npts).astype(np.int32)),
        pt_uv=jnp.asarray(
            rng2.rand(Npts, 2).astype(np.float32) * [W - 20, H - 20] + 10),
        pt_idepth=jnp.asarray(
            (0.3 + rng2.rand(Npts) * 1.5).astype(np.float32)),
        pt_valid=jnp.ones((Npts,), bool))
    images = jnp.asarray(
        rng2.rand(Fw, H, W).astype(np.float32) * 255.0)
    Ktup = (fx, fx, (W - 1) / 2.0, (H - 1) / 2.0)
    o = ba_iterate(st, images, Ktup, iters=6)
    dt_ba = device_time(lambda: ba_iterate(st, images, Ktup, iters=6)[1],
                        iters=6)
    o = remove_outliers(st, images, Ktup)
    dt_out = device_time(
        lambda: remove_outliers(st, images, Ktup).pt_valid, iters=6)
    grid_d = jnp.asarray(grid)   # device-resident: a jnp.asarray inside
    # the timed lambda would re-upload 1.2 MB per iteration (~8 ms of
    # TRANSPORT booked as device time through the tunnel).
    dt_ref = device_time(
        lambda: make_tracker_ref(new_img, fx, fx, (W - 1) / 2.0,
                                 (H - 1) / 2.0, dense_idepth=idepth0,
                                 dense_weight=grid_d).pid[0],
        iters=6)
    c2w_j = jnp.asarray(np.eye(4, dtype=np.float32))
    dt_proj = device_time(
        lambda: _project_ba_points(st, c2w_j, Ktup, H, W)[0], iters=6)

    dt_kf = dt_model + dt_fusion
    kf_fps = 1.0 / dt_kf
    print(json.dumps({
        "metric": "kf_pipeline_fps_640x480_7view_tsdf",
        "value": round(kf_fps, 3),
        "unit": "keyframes/s (device-time: MVSNet+TSDF alloc+cull+fuse+render)",
        "vs_baseline": round((BASELINE_KF_MS / 1e3) / dt_kf, 3),
    }))
    print(f"# honest device times (RTT {rtt*1e3:.1f} ms subtracted): "
          f"MVSNet[{mode_name}] {dt_model*1e3:.1f} ms | TSDF fuse+render "
          f"{dt_fusion*1e3:.1f} ms | tracker frame {dt_track*1e3:.1f} ms | "
          f"BA(6it,8KF,2k pts) {dt_ba*1e3:.1f} ms | outliers "
          f"{dt_out*1e3:.1f} ms | tracker-ref build {dt_ref*1e3:.1f} ms | "
          f"BA-point projection {dt_proj*1e3:.1f} ms "
          f"on {jax.devices()[0]}", file=sys.stderr)


if __name__ == "__main__":
    main()
