"""Raycast device-time bench at deployment scale (640x480, 1cm voxels).

Honest-timing protocol (utils/benchmarking.py): run on the real chip,
enqueue K calls, sync once. Scene: fronto-parallel wall + sphere so a few
thousand blocks allocate (typical room-scale active surface).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tandem_tpu.mapping.tsdf import (TsdfConfig, create_volume,
                                     allocate_blocks, integrate, raycast,
                                     render_depth_splat)
from tandem_tpu.utils.benchmarking import force_real_timing, device_time

H, W = 480, 640
CFG = TsdfConfig()  # defaults: 1cm voxels, 160^3 table, 64k pool


def main():
    print("backend:", jax.default_backend(), flush=True)
    K = jnp.asarray(np.array(
        [[525.0, 0, (W - 1) / 2], [0, 525.0, (H - 1) / 2], [0, 0, 1]],
        np.float32))
    pose = jnp.eye(4)

    u = np.tile(np.arange(W, dtype=np.float32), (H, 1))
    v = np.tile(np.arange(H, dtype=np.float32)[:, None], (1, W))
    dx = (u - 319.5) / 525.0
    dy = (v - 239.5) / 525.0
    a = dx ** 2 + dy ** 2 + 1
    b_ = -2 * 2.0
    cc = 4.0 - 0.36
    disc = b_ ** 2 - 4 * a * cc
    sph = np.where(disc > 0, (-b_ - np.sqrt(np.maximum(disc, 0))) / (2 * a), 0)
    depth = np.where(sph > 0, sph, 2.8).astype(np.float32)
    depth = jnp.asarray(depth)
    color = jnp.full((H, W, 3), 128.0)

    t0 = time.time()
    vol = create_volume(CFG)
    vol = allocate_blocks(CFG, vol, depth, K, pose)
    n = int(vol.n_allocated)
    print(f"allocated {n} blocks ({time.time()-t0:.1f}s)", flush=True)
    vol = integrate(CFG, vol, depth, color, K, pose, n_allocated=n)
    jax.block_until_ready(vol.tsdf)
    print(f"integrated ({time.time()-t0:.1f}s)", flush=True)

    force_real_timing()

    t0 = time.time()
    d, c = raycast(CFG, vol, (K, pose), H, W, n_allocated=n)
    jax.block_until_ready(d)
    print(f"raycast compile+run {time.time()-t0:.1f}s", flush=True)
    dn = np.asarray(d)
    hit = dn[40:-40, 40:-40] > 0
    err = np.abs(dn[40:-40, 40:-40][hit] - np.asarray(depth)[40:-40, 40:-40][hit])
    print(f"hit rate {hit.mean():.3f} median err {np.median(err)*1000:.2f} mm",
          flush=True)

    ms = device_time(lambda: raycast(CFG, vol, (K, pose), H, W,
                                     n_allocated=n)[0], iters=10) * 1e3
    print(f"raycast: {ms:.1f} ms", flush=True)

    ms2 = device_time(lambda: render_depth_splat(CFG, vol, K, pose, H, W,
                                                 n_allocated=n), iters=10) * 1e3
    print(f"splat render: {ms2:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
