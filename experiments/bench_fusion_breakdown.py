"""TSDF fusion breakdown on the REAL backend path (VERDICT r4 #5).

backend.py's per-KF device work is allocate_blocks + visible_slots +
integrate_culled + render_depth_splat; bench.py r3 timed full integrate +
render only. This probe times each piece honestly (donation-chained
enqueues, one sync) on a realistic moving-camera scan so the <20 ms/KF
target is attacked where the time actually goes.

Run: timeout 2400 python -u experiments/bench_fusion_breakdown.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tandem_tpu.mapping.tsdf import (TsdfConfig, allocate_blocks,
                                     create_volume, integrate,
                                     integrate_culled, render_depth_splat,
                                     visible_slots)
from tandem_tpu.utils.benchmarking import (device_time, force_real_timing,
                                           measure_rtt)

H, W = 480, 640


def main():
    force_real_timing()
    rtt = measure_rtt()
    print(f"RTT {rtt * 1e3:.1f} ms")
    cfg = TsdfConfig()
    fx = 387.8
    K3 = np.array([[fx, 0, (W - 1) / 2], [0, fx, (H - 1) / 2], [0, 0, 1]],
                  np.float32)
    Kd = jnp.asarray(K3)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    depth_np = (2.0 + 0.3 * np.sin(u * 0.05) * np.cos(v * 0.04)).astype(
        np.float32)
    color_np = np.stack([u % 255, v % 255, (u + v) % 255], -1).astype(
        np.float32)
    depth_d = jnp.asarray(depth_np)
    color_d = jnp.asarray(color_np)
    pose = jnp.asarray(np.eye(4, dtype=np.float32))

    vol = create_volume(cfg)
    vol = allocate_blocks(cfg, vol, depth_d, Kd, pose)
    n_alloc = int(vol.n_allocated)
    n_pad = -(-max(n_alloc, 1) // 2048) * 2048
    print(f"allocated {n_alloc} blocks (pad {n_pad})")

    # --- allocate: donation-chained enqueues (idempotent re-alloc) -------
    state = {"vol": vol}

    def alloc_step():
        state["vol"] = allocate_blocks(cfg, state["vol"], depth_d, Kd, pose)
        return state["vol"].n_allocated
    t = device_time(alloc_step, iters=10) * 1e3
    print(f"allocate(chained)      {t:7.2f} ms")

    # --- visible_slots -----------------------------------------------------
    slots, n_vis = visible_slots(cfg, state["vol"], Kd, pose, H, W)
    jax.block_until_ready(n_vis)
    n_vis_pad = -(-max(int(n_vis), 1) // 2048) * 2048
    print(f"visible {int(n_vis)} blocks (pad {n_vis_pad})")
    t = device_time(
        lambda: visible_slots(cfg, state["vol"], Kd, pose, H, W)[1],
        iters=10) * 1e3
    print(f"visible_slots          {t:7.2f} ms")

    # --- integrate_culled (the backend path) ------------------------------
    def int_culled_step():
        state["vol"] = integrate_culled(cfg, state["vol"], depth_d, color_d,
                                        Kd, pose, slots=slots,
                                        n_visible=n_vis_pad)
        return state["vol"].tsdf
    t = device_time(int_culled_step, iters=10) * 1e3
    print(f"integrate_culled       {t:7.2f} ms")

    def int_full_step():
        state["vol"] = integrate(cfg, state["vol"], depth_d, color_d, Kd,
                                 pose, n_allocated=n_pad)
        return state["vol"].tsdf
    t = device_time(int_full_step, iters=10) * 1e3
    print(f"integrate_full         {t:7.2f} ms")

    t = device_time(
        lambda: render_depth_splat(cfg, state["vol"], Kd, pose, H, W,
                                   n_allocated=n_pad), iters=10) * 1e3
    print(f"render_splat           {t:7.2f} ms")

    t = device_time(
        lambda: render_depth_splat(cfg, state["vol"], Kd, pose, H, W,
                                   n_allocated=n_pad, slots=slots,
                                   n_visible=int(n_vis)), iters=10) * 1e3
    print(f"render_splat_culled    {t:7.2f} ms  (100% visible here — real "
          f"scans see n_vis << n_alloc)")

    # --- per-axis surface-culled splat (the round-5 backend path) ---------
    from tandem_tpu.mapping.tsdf import surface_axis_slots
    ax_slots, ax_counts = surface_axis_slots(cfg, state["vol"], Kd, pose,
                                             H, W, n_pad)
    counts = [int(c) for c in np.asarray(ax_counts)]
    print(f"surface axis counts {counts} (vs 3 x {n_alloc} full)")
    t = device_time(
        lambda: surface_axis_slots(cfg, state["vol"], Kd, pose, H, W,
                                   n_pad)[1], iters=10) * 1e3
    print(f"surface_axis_slots     {t:7.2f} ms")
    t = device_time(
        lambda: render_depth_splat(cfg, state["vol"], Kd, pose, H, W,
                                   n_allocated=n_pad, axis_slots=ax_slots,
                                   axis_counts=counts), iters=10) * 1e3
    print(f"render_splat_axis      {t:7.2f} ms")


if __name__ == "__main__":
    main()
