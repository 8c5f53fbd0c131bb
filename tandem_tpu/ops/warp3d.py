"""Depth-map reprojection warp (ref -> src -> ref).

Parity target: homo_warping_3d (cva_mvsnet/models/module.py:911-1013): for
each reference pixel at its (single) reference depth, look up the source
depth at the projected location, then reproject that source depth back into
the reference view — yielding the corresponding pixel, its depth in the
reference frame, and a validity mask. Used for cross-view depth consistency
checks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .grid_sample import bilinear_sample_pixel
from .linalg import invert_pixel_projection
from .warp import _pixel_projection_matrix, _rigid_inverse


def depth_reprojection_warp(src_depth, ref_depth, *, src_K, src_cam_to_world,
                            ref_K, ref_cam_to_world,
                            min_depth_thres: float = 0.001):
    """:param src_depth: (B, H, W); ref_depth: (B, H, W)
    :return: proj_pixel (B, H, W, 2), proj_depth (B, H, W), mask (B, H, W)
    """
    B, H, W = ref_depth.shape
    f32 = jnp.float32

    src_w2c = _rigid_inverse(src_cam_to_world.astype(f32))
    src_w2p = _pixel_projection_matrix(src_K.astype(f32), src_w2c)
    ref_p2w = invert_pixel_projection(ref_K.astype(f32),
                                      ref_cam_to_world.astype(f32))
    ref_to_src = jnp.einsum("bij,bjk->bik", src_w2p, ref_p2w)

    xs = jnp.arange(W, dtype=f32)
    ys = jnp.arange(H, dtype=f32)
    gx, gy = jnp.meshgrid(xs, ys)
    xyz = jnp.stack([gx.reshape(-1), gy.reshape(-1), jnp.ones(H * W, f32)])

    rot = ref_to_src[:, :3, :3]
    trans = ref_to_src[:, :3, 3]
    rot_xyz = jnp.einsum("bij,jn->bin", rot, xyz)
    proj = rot_xyz * ref_depth.reshape(B, 1, -1) + trans[:, :, None]
    z = proj[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    px = proj[:, 0] / z_safe
    py = proj[:, 1] / z_safe

    mask_neg = z < min_depth_thres
    x_bound = 1.0 + 1.0 / (W - 1)
    y_bound = 1.0 + 1.0 / (H - 1)
    x_norm = px / (0.5 * (W - 1)) - 1.0
    y_norm = py / (0.5 * (H - 1)) - 1.0
    mask_out = (jnp.abs(x_norm) > x_bound) | (jnp.abs(y_norm) > y_bound)

    # Sample source depth at the projected pixels
    d_src = bilinear_sample_pixel(src_depth[..., None], px, py)[..., 0]

    # Reproject with the source depth back into the reference view
    src_to_ref = jnp.einsum(
        "bij,bjk->bik",
        _pixel_projection_matrix(ref_K.astype(f32),
                                 _rigid_inverse(ref_cam_to_world.astype(f32))),
        invert_pixel_projection(src_K.astype(f32),
                                src_cam_to_world.astype(f32)))
    rot2 = src_to_ref[:, :3, :3]
    trans2 = src_to_ref[:, :3, 3]
    pxy1 = jnp.stack([px, py, jnp.ones_like(px)], 1)  # (B, 3, HW)
    back = jnp.einsum("bij,bjn->bin", rot2, pxy1) * d_src[:, None, :] \
        + trans2[:, :, None]
    bz = back[:, 2]
    bz_safe = jnp.where(jnp.abs(bz) < 1e-12, 1e-12, bz)
    out_px = back[:, 0] / bz_safe
    out_py = back[:, 1] / bz_safe

    mask_neg = mask_neg | (bz < min_depth_thres)
    mask = ~(mask_neg | mask_out)

    proj_pixel = jnp.stack([out_px, out_py], -1).reshape(B, H, W, 2)
    proj_depth = bz.reshape(B, H, W)
    return proj_pixel, proj_depth, mask.astype(f32).reshape(B, H, W)
