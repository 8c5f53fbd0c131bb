"""Unit tests for the plane-sweep warp (ops/warp.py).

Covers what the torch-parity tests exercise only indirectly: a brute-force
numpy projection/bilinear reference, the behind-camera and out-of-bounds
masks (module.py:861-891 semantics), and that every `materialize` barrier
mode computes the identical function (the modes differ only in XLA
scheduling).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tandem_tpu.ops.warp import plane_sweep_warp

B, H, W, C, D = 1, 24, 32, 4, 5


@pytest.fixture
def setup():
    rng = np.random.RandomState(0)
    feats = rng.rand(B, H, W, C).astype(np.float32)
    K = np.array([[20.0, 0, (W - 1) / 2], [0, 20.0, (H - 1) / 2], [0, 0, 1]],
                 np.float32)
    src = np.eye(4, dtype=np.float32)
    src[:3, 3] = [0.15, -0.05, 0.02]
    th = 0.05
    src[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                            [-np.sin(th), 0, np.cos(th)]], np.float32)
    ref = np.eye(4, dtype=np.float32)
    depth = (1.0 + 2.0 * rng.rand(B, D, H, W)).astype(np.float32)
    return feats, K, src, ref, depth


def _warp_numpy(feats, K, src, ref, depth):
    """Brute-force per-pixel reference."""
    out = np.zeros((B, D, H, W, C), np.float32)
    mask = np.zeros((B, D, H, W), bool)
    w2c = np.linalg.inv(src)
    for d in range(D):
        for y in range(H):
            for x in range(W):
                pw = np.linalg.inv(K) @ np.array([x, y, 1.0]) * depth[0, d, y, x]
                pw = ref[:3, :3] @ pw + ref[:3, 3]
                pc = w2c[:3, :3] @ pw + w2c[:3, 3]
                pp = K @ pc
                z = pp[2]
                neg = z < 0.001
                px, py = pp[0] / z, pp[1] / z
                xn = px / (0.5 * (W - 1)) - 1
                yn = py / (0.5 * (H - 1)) - 1
                outside = (abs(xn) > 1 + 1.0 / (W - 1)
                           or abs(yn) > 1 + 1.0 / (H - 1))
                mask[0, d, y, x] = not (neg or outside)
                if neg:
                    continue
                x0, y0 = int(np.floor(px)), int(np.floor(py))
                fx, fy = px - x0, py - y0
                acc = np.zeros(C, np.float32)
                for dy, wy in ((0, 1 - fy), (1, fy)):
                    for dx, wx in ((0, 1 - fx), (1, fx)):
                        yy, xx = y0 + dy, x0 + dx
                        if 0 <= yy < H and 0 <= xx < W:
                            acc += wy * wx * feats[0, yy, xx]
                out[0, d, y, x] = acc
    return out, mask


def test_warp_matches_bruteforce(setup):
    feats, K, src, ref, depth = setup
    ref_out, ref_mask = _warp_numpy(feats, K, src, ref, depth)
    warped, mask = plane_sweep_warp(
        jnp.asarray(feats), jnp.asarray(depth), src_K=jnp.asarray(K[None]),
        src_cam_to_world=jnp.asarray(src[None]), ref_K=jnp.asarray(K[None]),
        ref_cam_to_world=jnp.asarray(ref[None]))
    np.testing.assert_allclose(np.asarray(warped), ref_out, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(mask) > 0, ref_mask)
    # Sanity: the pose actually produces a mix of valid/invalid samples.
    assert 0.2 < ref_mask.mean() < 1.0


def test_warp_materialize_modes_identical(setup):
    feats, K, src, ref, depth = setup
    args = dict(src_K=jnp.asarray(K[None]),
                src_cam_to_world=jnp.asarray(src[None]),
                ref_K=jnp.asarray(K[None]),
                ref_cam_to_world=jnp.asarray(ref[None]))
    base, bmask = plane_sweep_warp(jnp.asarray(feats), jnp.asarray(depth),
                                   **args)
    for mode in ("none", "chain", "out", "chain+out", "positions+out"):
        w, m = plane_sweep_warp(jnp.asarray(feats), jnp.asarray(depth),
                                materialize=mode, **args)
        np.testing.assert_allclose(np.asarray(w), np.asarray(base),
                                   atol=1e-6, err_msg=mode)
        np.testing.assert_array_equal(np.asarray(m), np.asarray(bmask))


def _adaptive_depth(rng, base_z=2.0, amp=0.4, interval=0.03, D=8):
    """Smooth surface +/- a fixed ladder — the stage-2/3 adaptive range
    shape the grouped gather is designed for."""
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    base = base_z + amp * np.sin(xs / W * 4.0) * np.cos(ys / H * 3.0)
    offs = (np.arange(D) - (D - 1) / 2.0) * interval
    return (base[None] + offs[:, None, None])[None].astype(np.float32)


def test_warp_grouped_matches_plain(setup):
    """plane_group>1 (patch-row gather) must compute the same bilinear warp
    as the plain path — only f32 reassociation differs. Covers engaged
    groups AND the whole-view lax.cond fallback (wide random ladder)."""
    feats, K, src, ref, _ = setup
    args = dict(src_K=jnp.asarray(K[None]),
                src_cam_to_world=jnp.asarray(src[None]),
                ref_K=jnp.asarray(K[None]),
                ref_cam_to_world=jnp.asarray(ref[None]))
    rng = np.random.RandomState(1)

    # Narrow adaptive ladder: the grouped branch engages.
    depth = jnp.asarray(_adaptive_depth(rng, interval=0.02, D=8))
    base, bmask = plane_sweep_warp(jnp.asarray(feats), depth, **args)
    for G, P, S in ((2, 4, 2), (4, 6, 2), (4, 8, 4), (8, 8, 4)):
        w, m = plane_sweep_warp(jnp.asarray(feats), depth, plane_group=G,
                                patch=P, patch_stride=S, **args)
        np.testing.assert_allclose(np.asarray(w), np.asarray(base),
                                   atol=1e-5, err_msg=f"G={G} P={P} S={S}")
        np.testing.assert_array_equal(np.asarray(m), np.asarray(bmask))

    # Wide random ladder: spans blow the patch, the cond falls back to the
    # plain gather — still identical.
    depth_w = jnp.asarray((1.0 + 2.0 * rng.rand(B, 8, H, W))
                          .astype(np.float32))
    base_w, bmask_w = plane_sweep_warp(jnp.asarray(feats), depth_w, **args)
    w, m = plane_sweep_warp(jnp.asarray(feats), depth_w, plane_group=4,
                            patch=6, patch_stride=2, **args)
    np.testing.assert_allclose(np.asarray(w), np.asarray(base_w), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(bmask_w))

    # D not divisible by the group -> plain path, same result.
    depth5 = jnp.asarray(_adaptive_depth(rng, interval=0.02, D=5))
    b5, _ = plane_sweep_warp(jnp.asarray(feats), depth5, **args)
    w5, _ = plane_sweep_warp(jnp.asarray(feats), depth5, plane_group=4,
                             patch=6, patch_stride=2, **args)
    np.testing.assert_allclose(np.asarray(w5), np.asarray(b5), atol=1e-6)
