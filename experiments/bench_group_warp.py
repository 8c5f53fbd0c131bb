"""A/B the grouped plane-gather warp (ops/warp.py plane_group>1) against the
plain packed-corner warp IN THE COMPOSED stage program (6 views x warp ->
diff^2 -> gate -> accum, the shipped structure), at stage-2/3 shapes with
REALISTIC adaptive depth ladders.

The old bench_stage_agg harness used per-pixel random depth per plane, which
makes consecutive planes incoherent and always triggers the grouped path's
whole-view fallback — useless for judging the grouped warp. Here depth
samples mimic adaptive_depth_range: a smooth base surface +/- a fixed
interval ladder (stage2: 32 planes x 0.5*base_int, stage3: 8 x 0.25), so
group spans reflect real cascade geometry.

Prints, per config: whether the grouped branch would actually engage (the
per-view ok flag + worst-group span), exactness vs plain, and composed time.

Run: TANDEM_PLATFORM=axon timeout 3000 python experiments/bench_group_warp.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from tandem_tpu.ops.warp import plane_sweep_warp
from tandem_tpu.utils.benchmarking import device_time, force_real_timing

# H, W, C, D, interval_ratio
STAGES = {
    "stage2": (240, 320, 16, 32, 0.5),
    "stage3": (480, 640, 8, 8, 0.25),
}
V = 6
DMIN, DMAX, D1 = 0.5, 6.0, 48
BASE_INT = (DMAX - DMIN) / (D1 - 1)


def make_scene(name, key):
    H, W, C, D, ratio = STAGES[name]
    imgs = jax.random.normal(key, (V, 1, H, W, C), jnp.float32).astype(
        jnp.bfloat16)
    ref = jax.random.normal(key, (1, 1, H, W, C), jnp.float32).astype(
        jnp.bfloat16)
    gate_w = jax.random.normal(key, (C,), jnp.float32).astype(jnp.bfloat16)
    Km = jnp.asarray(np.array([[W * 0.8, 0, W / 2], [0, W * 0.8, H / 2],
                               [0, 0, 1]], np.float32))[None]
    rng = np.random.default_rng(0)
    poses = []
    for v in range(V):
        t = rng.normal(0, 0.08, 3)
        A = np.eye(3) + rng.normal(0, 0.02, (3, 3))
        q, _ = np.linalg.qr(A)
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = q.astype(np.float32)
        P[:3, 3] = t
        poses.append(P)
    poses = jnp.asarray(np.stack(poses))[:, None]
    pose_ref = jnp.eye(4)[None]

    # Smooth base depth + adaptive ladder (ranges.py adaptive_depth_range)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    base = (2.0 + 0.6 * np.sin(xs / W * 4.0) * np.cos(ys / H * 3.0)
            + 0.3 * (xs / W)).astype(np.float32)
    interval = ratio * BASE_INT
    offs = (np.arange(D) - (D - 1) / 2.0) * interval
    depth = np.clip(base[None] + offs[:, None, None], 0.05, None)
    depth = jnp.asarray(depth[None].astype(np.float32))   # (1, D, H, W)
    return imgs, ref, gate_w, Km, poses, pose_ref, depth


def stage_fn(imgs, ref, gate_w, Km, poses, pose_ref, depth, **warp_kw):
    D, H, W = depth.shape[1:]
    C = imgs.shape[-1]

    def f():
        accum = jnp.zeros((1, D, H, W, C), jnp.bfloat16)
        for v in range(V):
            warped, _ = plane_sweep_warp(
                imgs[v], depth, src_K=Km, src_cam_to_world=poses[v],
                ref_K=Km, ref_cam_to_world=pose_ref, **warp_kw)
            warped = warped.astype(jnp.bfloat16)
            diff_sq = (warped - ref) ** 2
            diff_sq = jax.lax.optimization_barrier(diff_sq)
            rw = jax.nn.sigmoid(jnp.einsum("bdhwc,c->bdhw", diff_sq, gate_w))
            accum = accum + (rw[..., None] + 1.0) * diff_sq
        return accum / V
    return f


def span_report(Km, poses, pose_ref, depth, G, P, S, H, W):
    """Reproduce the grouped path's ok condition per view on the host."""
    from tandem_tpu.ops.warp import (_pixel_projection_matrix, _rigid_inverse,
                                     invert_pixel_projection)
    oks = []
    worst = 0
    for v in range(V):
        src_w2c = _rigid_inverse(poses[v].astype(jnp.float32))
        src_w2p = _pixel_projection_matrix(Km.astype(jnp.float32), src_w2c)
        ref_p2w = invert_pixel_projection(Km.astype(jnp.float32),
                                          pose_ref.astype(jnp.float32))
        M = np.asarray(jnp.einsum("bij,bjk->bik", src_w2p, ref_p2w))[0]
        xs = np.arange(W, dtype=np.float32)
        ys = np.arange(H, dtype=np.float32)
        gx, gy = np.meshgrid(xs, ys)
        d = np.asarray(depth)[0]                      # (D, H, W)
        px_l, py_l, ins_l = [], [], []
        for i in range(3):
            pass
        dirs = [M[i, 0] * gx + M[i, 1] * gy + M[i, 2] for i in range(3)]
        z = dirs[2][None] * d + M[2, 3]
        zs = np.where(np.abs(z) < 1e-12, 1e-12, z)
        px = (dirs[0][None] * d + M[0, 3]) / zs
        py = (dirs[1][None] * d + M[1, 3]) / zs
        x0 = np.floor(px)
        y0 = np.floor(py)
        inside = ((x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1)
                  & (z >= 0.001))
        xi = np.clip(x0, -1, W - 1).astype(np.int64) + 1
        yi = np.clip(y0, -1, H - 1).astype(np.int64) + 1
        D_ = d.shape[0]
        DG = D_ // G
        xi_g = xi.reshape(DG, G, H, W)
        yi_g = yi.reshape(DG, G, H, W)
        in_g = inside.reshape(DG, G, H, W)
        BIG = 1 << 24
        ymin = np.min(np.where(in_g, yi_g, BIG), 1)
        ymax = np.max(np.where(in_g, yi_g, -1), 1)
        xmin = np.min(np.where(in_g, xi_g, BIG), 1)
        xmax = np.max(np.where(in_g, xi_g, -1), 1)
        SY, SX = H // S + 1, W // S + 1
        sy = np.clip(ymin // S, 0, SY - 1)
        sx = np.clip(xmin // S, 0, SX - 1)
        bad = ((ymax + 1 - sy * S > P - 1) | (xmax + 1 - sx * S > P - 1))
        any_v = ymax >= 0
        span = np.maximum(np.where(any_v, ymax - np.minimum(ymin, ymax), 0),
                          np.where(any_v, xmax - np.minimum(xmin, xmax), 0))
        worst = max(worst, int(span.max()))
        oks.append(not bool(bad.any()))
    return oks, worst


def main():
    force_real_timing()
    key = jax.random.PRNGKey(0)
    for name in sys.argv[1:] or ["stage2", "stage3"]:
        H, W, C, D, ratio = STAGES[name]
        scene = make_scene(name, key)
        imgs, ref, gate_w, Km, poses, pose_ref, depth = scene
        print(f"--- {name}: {H}x{W} C={C} D={D} x{V} views, "
              f"adaptive ladder int={ratio * BASE_INT:.4f} ---", flush=True)

        f_plain = jax.jit(stage_fn(*scene))
        out_plain = f_plain()
        t = device_time(f_plain, iters=10)
        print(f"  plain G=1          : {t * 1e3:7.2f} ms", flush=True)

        for G, P, S in ((2, 4, 2), (4, 6, 2), (4, 8, 4), (8, 8, 4),
                        (8, 12, 4)):
            if D % G:
                continue
            oks, worst = span_report(Km, poses, pose_ref, depth, G, P, S,
                                     H, W)
            fg = jax.jit(stage_fn(*scene, plane_group=G, patch=P,
                                  patch_stride=S))
            out_g = fg()
            err = float(jnp.max(jnp.abs(
                out_g.astype(jnp.float32) - out_plain.astype(jnp.float32))))
            t = device_time(fg, iters=10)
            print(f"  G={G} P={P:2d} S={S}      : {t * 1e3:7.2f} ms  "
                  f"engaged={sum(oks)}/{V} worst_span={worst}  "
                  f"maxabs vs plain={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
