"""A/B the warp restructure WITH the real consumer attached (gated accum).

The 6-view warp-only probe showed the rows+weights barrier saving 17 ms at
stage 2, but the full model REGRESSED 198 -> 226 ms. This reproduces the
stage composition: 6 x (warp -> diff^2 -> gate-einsum -> accum) and times
the old (px/py/z barrier) vs new (rows/weights barrier) warp, plus a
no-barrier variant.

Run: timeout 2400 python experiments/bench_stage_agg.py stage2 stage3
"""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from tandem_tpu.ops.warp import plane_sweep_warp as warp_new
from tandem_tpu.utils.benchmarking import device_time, force_real_timing

spec = importlib.util.spec_from_file_location("warp_old", "/tmp/warp_old.py")
warp_old_mod = importlib.util.module_from_spec(spec)
sys.modules["warp_old"] = warp_old_mod
spec.loader.exec_module(warp_old_mod)
warp_old = warp_old_mod.plane_sweep_warp

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
        print(f"--- {name}: {H}x{W} C={C} D={D} x{V} views + gated accum ---",
              flush=True)
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
        depth = 1.5 + jax.random.uniform(key, (1, D, H, W), jnp.float32) * 2

        def stage(warp_fn, dsq_barrier=False, **kw):
            def f():
                accum = jnp.zeros((1, D, H, W, C), jnp.bfloat16)
                for v in range(V):
                    warped, _ = warp_fn(
                        imgs[v], depth, src_K=Km, src_cam_to_world=poses[v],
                        ref_K=Km, ref_cam_to_world=pose_ref, **kw)
                    warped = warped.astype(jnp.bfloat16)
                    diff_sq = (warped - ref) ** 2
                    if dsq_barrier:
                        diff_sq = jax.lax.optimization_barrier(diff_sq)
                    rw = jax.nn.sigmoid(
                        jnp.einsum("bdhwc,c->bdhw", diff_sq, gate_w))
                    accum = accum + (rw[..., None] + 1.0) * diff_sq
                return accum / V
            return f

        variants = [
            ("old(positions)", stage(warp_old)),
            ("none+dsq   ", stage(warp_new, materialize="none",
                                  dsq_barrier=True)),
            ("chain+dsq  ", stage(warp_new, materialize="chain",
                                  dsq_barrier=True)),
            ("old+dsq    ", stage(warp_old, dsq_barrier=True)),
        ]
        for label, sf in variants:
            fn = jax.jit(sf)
            out = jax.block_until_ready(fn())
            t = device_time(fn, iters=10) * 1e3
            print(f"{label}: {t:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
