"""Break the per-view plane-sweep warp cost into its pieces on the real chip.

Pieces at stage-2 shape (240x320, C=16, D=32, one source view):
  full      - plane_sweep_warp as shipped
  sample    - bilinear_sample_pixel given px, py
  gather    - the packed-corner row gather alone (precomputed indices)
  pack      - _pack_corners table build alone
  idxchain  - px,py -> (rows, weights) alone
  wsum      - the (N,4,C) einsum weighted sum alone, given rows+weights
  sample_cw - component-wise variant: no (N,4) arrays, slice-and-add wsum

Run: timeout 1800 python experiments/bench_warp_breakdown.py [stage]
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


def idx_and_weights(x, y, H, W):
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    inside = ((x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1))
    ins = inside.astype(jnp.float32)
    xi = jnp.clip(x0, -1, W - 1).astype(jnp.int32) + 1
    yi = jnp.clip(y0, -1, H - 1).astype(jnp.int32) + 1
    rows = yi * (W + 1) + xi
    return (rows, (wx0 * wy0 * ins).astype(jnp.bfloat16),
            (wx1 * wy0 * ins).astype(jnp.bfloat16),
            (wx0 * wy1 * ins).astype(jnp.bfloat16),
            (wx1 * wy1 * ins).astype(jnp.bfloat16))


def sample_cw(packed, x, y, H, W, C):
    """Component-wise bilinear: no (N,4) stacked arrays, no einsum."""
    rows, w00, w10, w01, w11 = idx_and_weights(x, y, H, W)
    v = packed[rows]                       # (N, 4C) bf16
    out = (v[:, 0 * C:1 * C] * w00[:, None]
           + v[:, 1 * C:2 * C] * w10[:, None]
           + v[:, 2 * C:3 * C] * w01[:, None]
           + v[:, 3 * C:4 * C] * w11[:, None])
    return out


def main():
    force_real_timing()
    key = jax.random.PRNGKey(0)
    names = sys.argv[1:] or ["stage2"]
    for name in names:
        H, W, C, D = STAGES[name]
        N = D * H * W
        print(f"--- {name}: {H}x{W} C={C} D={D} N={N} ---", flush=True)
        img = jax.random.normal(key, (1, H, W, C), jnp.float32).astype(
            jnp.bfloat16)
        packed = jax.jit(_pack_corners)(img)
        packed2 = packed.reshape((H + 1) * (W + 1), 4 * C)
        x = jax.random.uniform(key, (1, N), jnp.float32, -1.0, W)
        y = jax.random.uniform(key, (1, N), jnp.float32, -1.0, H)
        rows, w00, w10, w01, w11 = jax.jit(
            lambda: idx_and_weights(x[0], y[0], H, W))()
        wts = jnp.stack([w00, w10, w01, w11], -1)[None]

        Km = jnp.asarray(np.array([[W * 0.8, 0, W / 2], [0, W * 0.8, H / 2],
                                   [0, 0, 1]], np.float32))[None]
        pose_src = jnp.eye(4)[None].at[0, 0, 3].set(0.1)
        pose_ref = jnp.eye(4)[None]
        depth = 1.0 + jax.random.uniform(key, (1, D, H, W), jnp.float32) * 3

        def t(label, fn):
            out = jax.block_until_ready(fn())
            ms = device_time(fn, iters=10) * 1e3
            print(f"{label:10s} {ms:8.2f} ms", flush=True)
            return out

        full = jax.jit(lambda: plane_sweep_warp(
            img, depth, src_K=Km, src_cam_to_world=pose_src,
            ref_K=Km, ref_cam_to_world=pose_ref)[0])
        t("full", full)
        samp = jax.jit(lambda: bilinear_sample_pixel(img, x, y))
        t("sample", samp)
        gath = jax.jit(lambda: packed2[rows])
        t("gather", gath)
        pk = jax.jit(lambda: _pack_corners(img))
        t("pack", pk)
        idxc = jax.jit(lambda: idx_and_weights(x[0], y[0], H, W))
        t("idxchain", idxc)
        ws = jax.jit(lambda: jnp.einsum(
            "bnkc,bnk->bnc", packed2[rows].reshape(1, N, 4, C),
            wts.astype(jnp.bfloat16)))
        t("wsum+gath", ws)
        scw = jax.jit(lambda: sample_cw(packed2, x[0], y[0], H, W, C))
        t("sample_cw", scw)

        ref = np.asarray(samp(), np.float32)[0]
        got = np.asarray(scw(), np.float32)
        err = np.abs(ref - got).max()
        print(f"sample_cw max err vs sample: {err:.4f}", flush=True)


if __name__ == "__main__":
    main()
