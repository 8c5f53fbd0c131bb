"""A/B: componentized color update inside the TSDF integrate chunk.

integrate's color math runs on (chunk, 512, 3) arrays — the trailing
size-3 RGB axis sits on the 128-lane dimension at 3/128 occupancy, the
same layout hazard the warp position math and splat candidate math hit
(docs/PERF.md). Variant B slices the gathered packed rows into three
(chunk, 512) component planes, does the weighted average at full lane
occupancy, and stacks once at the end.

Run: timeout 2400 python experiments/bench_integrate_color.py
"""

import dataclasses
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from tandem_tpu.mapping import tsdf as T
from tandem_tpu.utils.benchmarking import device_time, force_real_timing


@partial(jax.jit, static_argnums=(0, 7), donate_argnums=(1,))
def _integrate_chunk_comp(cfg, vol, depth_color, K, w2c_R, w2c_t, start,
                          chunk=2048):
    HW = depth_color.shape[0]
    b = cfg.block_size
    B3 = b ** 3

    coords = jax.lax.dynamic_slice_in_dim(vol.block_coords, start, chunk, 0)
    tsdf_c = jax.lax.dynamic_slice_in_dim(vol.tsdf, start, chunk, 0)
    weight_c = jax.lax.dynamic_slice_in_dim(vol.weight, start, chunk, 0)
    color_c = jax.lax.dynamic_slice_in_dim(vol.color, start, chunk, 0)

    li = jnp.arange(B3, dtype=jnp.int32)
    lx = (li % b).astype(jnp.float32)
    ly = ((li // b) % b).astype(jnp.float32)
    lz = (li // (b * b)).astype(jnp.float32)
    base = coords.astype(jnp.float32) * b
    vs = cfg.voxel_size
    wx = (base[:, 0:1] + lx[None]) * vs
    wy = (base[:, 1:2] + ly[None]) * vs
    wz = (base[:, 2:3] + lz[None]) * vs
    xc = w2c_R[0, 0] * wx + w2c_R[0, 1] * wy + w2c_R[0, 2] * wz + w2c_t[0]
    yc = w2c_R[1, 0] * wx + w2c_R[1, 1] * wy + w2c_R[1, 2] * wz + w2c_t[1]
    z = w2c_R[2, 0] * wx + w2c_R[2, 1] * wy + w2c_R[2, 2] * wz + w2c_t[2]

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    img_w = cfg.image_width
    img_h = HW // img_w
    z_safe = jnp.where(z <= 1e-6, 1.0, z)
    u = jnp.round(fx * xc / z_safe + cx).astype(jnp.int32)
    v = jnp.round(fy * yc / z_safe + cy).astype(jnp.int32)
    in_img = (z > 0) & (u >= 0) & (u < img_w) & (v >= 0) & (v < img_h)

    slot_active = ((start + jnp.arange(chunk)) < vol.n_allocated)[:, None]

    pix = jnp.where(in_img, v * img_w + u, 0).reshape(-1)
    dc = depth_color[pix].reshape(chunk, B3, 8)
    d_px = dc[..., 0].astype(jnp.float32) + dc[..., 1].astype(jnp.float32)
    d_ok = (d_px > 0) & (d_px >= cfg.min_depth) & (d_px < cfg.max_depth)

    ray_norm = dc[..., 5].astype(jnp.float32) + dc[..., 6].astype(
        jnp.float32)
    surface_dist = d_px * ray_norm
    voxel_dist = jnp.sqrt(xc * xc + yc * yc + z * z)

    in_band = (voxel_dist > surface_dist - cfg.truncation) & \
              (voxel_dist < surface_dist + cfg.truncation)
    in_free = voxel_dist < surface_dist - cfg.truncation
    update = slot_active & in_img & d_ok & (in_band | in_free)
    sdf_new = jnp.where(in_band, surface_dist - voxel_dist, cfg.truncation)

    denom = weight_c + 1.0
    tsdf_n = jnp.where(update, (tsdf_c * weight_c + sdf_new) / denom, tsdf_c)
    # Componentized color: three (chunk, B3) planes at full lane
    # occupancy, one stack at the end.
    inv = jnp.where(update, 1.0 / denom, 0.0)
    keep = jnp.where(update, weight_c / denom, 1.0)
    comps = [keep * color_c[..., k]
             + inv * dc[..., 2 + k].astype(jnp.float32)
             for k in range(3)]
    color_n = jnp.stack(comps, axis=-1)
    weight_n = jnp.where(update, jnp.minimum(denom, cfg.max_weight), weight_c)

    return vol.replace(
        tsdf=jax.lax.dynamic_update_slice_in_dim(vol.tsdf, tsdf_n, start, 0),
        weight=jax.lax.dynamic_update_slice_in_dim(vol.weight, weight_n,
                                                   start, 0),
        color=jax.lax.dynamic_update_slice_in_dim(vol.color, color_n,
                                                  start, 0))


def main():
    force_real_timing()
    H, W = 480, 640
    cfg = T.TsdfConfig()
    fx = 387.8
    K = jnp.asarray(np.array([[fx, 0, (W - 1) / 2], [0, fx, (H - 1) / 2],
                              [0, 0, 1]], np.float32))
    pose = jnp.asarray(np.eye(4, dtype=np.float32))
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    depth = jnp.asarray((2.0 + 0.3 * np.sin(u * 0.05)
                         * np.cos(v * 0.04)).astype(np.float32))
    color = jnp.asarray(np.stack([u % 255, v % 255, (u + v) % 255],
                                 -1).astype(np.float32))
    vol = T.create_volume(cfg)
    vol = T.allocate_blocks(cfg, vol, depth, K, pose)
    n = int(vol.n_allocated)
    n_pad = -(-max(n, 1) // 2048) * 2048
    print("allocated:", n, "padded:", n_pad, flush=True)
    cfgW = dataclasses.replace(cfg, image_width=W)
    depth_color, w2c_R, w2c_t = T._pack_scan(depth, color, pose, K)

    # Parity check first (CPU-identical math, f32). Every consumer gets
    # its own copy: the chunk kernels DONATE the volume buffers.
    va = jax.tree.map(jnp.copy, vol)
    vb = jax.tree.map(jnp.copy, vol)
    for s in range(0, n_pad, 2048):
        va = T._integrate_chunk(cfgW, va, depth_color, K, w2c_R, w2c_t,
                                s, 2048)
        vb = _integrate_chunk_comp(cfgW, vb, depth_color, K, w2c_R, w2c_t,
                                   s, 2048)
    err = float(jnp.abs(va.color - vb.color).max())
    errt = float(jnp.abs(va.tsdf - vb.tsdf).max())
    print(f"parity: max|color| {err:.2e} max|tsdf| {errt:.2e}", flush=True)

    for name, fn in (("baseline", T._integrate_chunk),
                     ("componentized", _integrate_chunk_comp)):
        state = {"vol": jax.tree.map(jnp.copy, vol)}

        def step():
            for s in range(0, n_pad, 2048):
                state["vol"] = fn(cfgW, state["vol"], depth_color, K,
                                  w2c_R, w2c_t, s, 2048)
            return state["vol"].tsdf
        jax.block_until_ready(step())
        t = device_time(step, iters=8) * 1e3
        print(f"integrate {name}: {t:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
