"""Six-view stage-scale warp probe: what is removable from the warp cost?

One jit per variant covering all 6 source-view warps of a stage (60 ms
scale — well above the ~1 ms tunnel noise floor):

  A full     - shipped plane_sweep_warp x6 (posmath + chain + pack + gather)
  B gathonly - rows + weights precomputed as inputs; gather + weighted sum x6
  C nochain  - posmath done, px/py as inputs; chain + pack + gather + wsum x6

A-C = position math cost; C-B = index-chain + pack cost; B = gather floor.

Run: timeout 1800 python experiments/bench_warp6.py stage2 stage3
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from tandem_tpu.ops.warp import plane_sweep_warp
from tandem_tpu.ops.grid_sample import bilinear_sample_pixel, _pack_corners
from tandem_tpu.utils.benchmarking import device_time, force_real_timing

STAGES = {
    "stage1": (120, 160, 32, 48),
    "stage2": (240, 320, 16, 32),
    "stage3": (480, 640, 8, 8),
}
V = 6


def main():
    force_real_timing()
    key = jax.random.PRNGKey(0)
    for name in sys.argv[1:] or ["stage2"]:
        H, W, C, D = STAGES[name]
        N = D * H * W
        print(f"--- {name}: {H}x{W} C={C} D={D} x{V} views ---", flush=True)
        imgs = jax.random.normal(key, (V, 1, H, W, C), jnp.float32).astype(
            jnp.bfloat16)
        Km = jnp.asarray(np.array([[W * 0.8, 0, W / 2], [0, W * 0.8, H / 2],
                                   [0, 0, 1]], np.float32))[None]
        poses = []
        rng = np.random.default_rng(0)
        for v in range(V):
            t = rng.normal(0, 0.08, 3)
            th = rng.normal(0, 0.03, 3)
            Rz = np.eye(3) + np.array([[0, -th[2], th[1]],
                                       [th[2], 0, -th[0]],
                                       [-th[1], th[0], 0]])
            q, _ = np.linalg.qr(Rz)
            P = np.eye(4, dtype=np.float32)
            P[:3, :3] = q.astype(np.float32)
            P[:3, 3] = t
            poses.append(P)
        poses = jnp.asarray(np.stack(poses))[:, None]
        pose_ref = jnp.eye(4)[None]
        depth = 1.5 + jax.random.uniform(key, (1, D, H, W), jnp.float32) * 2

        def full():
            acc = jnp.zeros((1, D, H, W, C), jnp.bfloat16)
            for v in range(V):
                w, m = plane_sweep_warp(
                    imgs[v], depth, src_K=Km, src_cam_to_world=poses[v],
                    ref_K=Km, ref_cam_to_world=pose_ref)
                acc = acc + w
            return acc

        fA = jax.jit(full)
        outA = jax.block_until_ready(fA())
        tA = device_time(fA, iters=10) * 1e3
        print(f"A full      {tA:8.2f} ms  ({tA/V:5.2f}/view)", flush=True)

        # Precompute px, py per view (host side, fixed inputs).
        pxs, pys = [], []
        for v in range(V):
            # reuse warp internals by calling with identity features? simpler:
            # recompute positions with the same math
            from tandem_tpu.ops.warp import (_pixel_projection_matrix,
                                             _rigid_inverse)
            from tandem_tpu.ops.linalg import invert_pixel_projection
            src_w2c = _rigid_inverse(poses[v].astype(jnp.float32))
            src_w2p = _pixel_projection_matrix(Km.astype(jnp.float32), src_w2c)
            ref_p2w = invert_pixel_projection(Km.astype(jnp.float32),
                                              pose_ref.astype(jnp.float32))
            r2s = jnp.einsum("bij,bjk->bik", src_w2p, ref_p2w)
            rot, trans = r2s[:, :3, :3], r2s[:, :3, 3]
            xs = jnp.arange(W, dtype=jnp.float32)
            ys = jnp.arange(H, dtype=jnp.float32)
            gx, gy = jnp.meshgrid(xs, ys)

            def pc(i, rot=rot, trans=trans, gx=gx, gy=gy):
                d = (rot[:, i, 0][:, None, None] * gx
                     + rot[:, i, 1][:, None, None] * gy
                     + rot[:, i, 2][:, None, None])
                return d[:, None] * depth + trans[:, i][:, None, None, None]

            z = pc(2)
            zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
            pxs.append((pc(0) / zs).reshape(1, N))
            pys.append((pc(1) / zs).reshape(1, N))
        pxs = jax.block_until_ready(jnp.stack(pxs))
        pys = jax.block_until_ready(jnp.stack(pys))

        def nochain(pxs, pys):
            acc = jnp.zeros((1, N, C), jnp.bfloat16)
            for v in range(V):
                acc = acc + bilinear_sample_pixel(imgs[v], pxs[v], pys[v])
            return acc

        fC = jax.jit(nochain)
        jax.block_until_ready(fC(pxs, pys))
        tC = device_time(lambda: fC(pxs, pys), iters=10) * 1e3
        print(f"C posdone   {tC:8.2f} ms  ({tC/V:5.2f}/view)", flush=True)

        # Precompute rows + weights too.
        def chain(x, y):
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            wx1, wy1 = x - x0, y - y0
            wx0, wy0 = 1.0 - wx1, 1.0 - wy1
            ins = ((x0 >= -1) & (x0 <= W - 1) & (y0 >= -1)
                   & (y0 <= H - 1)).astype(jnp.float32)
            xi = jnp.clip(x0, -1, W - 1).astype(jnp.int32) + 1
            yi = jnp.clip(y0, -1, H - 1).astype(jnp.int32) + 1
            return (yi * (W + 1) + xi,
                    (wx0 * wy0 * ins).astype(jnp.bfloat16),
                    (wx1 * wy0 * ins).astype(jnp.bfloat16),
                    (wx0 * wy1 * ins).astype(jnp.bfloat16),
                    (wx1 * wy1 * ins).astype(jnp.bfloat16))

        rows, w00, w10, w01, w11 = jax.block_until_ready(
            jax.jit(jax.vmap(chain))(pxs[:, 0], pys[:, 0]))
        packs = jax.block_until_ready(jax.jit(jax.vmap(
            lambda im: _pack_corners(im).reshape((H + 1) * (W + 1), 4 * C)
        ))(imgs))

        def gathonly(rows, w00, w10, w01, w11):
            acc = jnp.zeros((1, N, C), jnp.bfloat16)
            for v in range(V):
                g = packs[v][rows[v]]
                o = (g[:, 0 * C:1 * C] * w00[v][:, None]
                     + g[:, 1 * C:2 * C] * w10[v][:, None]
                     + g[:, 2 * C:3 * C] * w01[v][:, None]
                     + g[:, 3 * C:4 * C] * w11[v][:, None])
                acc = acc + o[None]
            return acc

        fB = jax.jit(gathonly)
        jax.block_until_ready(fB(rows, w00, w10, w01, w11))
        tB = device_time(lambda: fB(rows, w00, w10, w01, w11), iters=10) * 1e3
        print(f"B gathonly  {tB:8.2f} ms  ({tB/V:5.2f}/view)", flush=True)
        print(f"  posmath={tA-tC:5.2f}  chain+pack={tC-tB:5.2f}  "
              f"gather+wsum={tB:5.2f}", flush=True)


if __name__ == "__main__":
    main()
