"""Differentiable plane-sweep homography warp.

TPU-native re-design of the reference warp (cva_mvsnet/models/module.py:764-908):
for every reference pixel and depth hypothesis, project into the source view via
K_src [R|t]_src^-1 . ([R|t]_ref K_ref^-1) and bilinearly sample source features.

Differences from the reference implementation (behaviour preserved):
- NHWC feature layout; output is (B, D, H, W, C) ready for NDHWC 3D convs.
- Division by the projected z is made safe with a tiny clamp; the reference
  instead produces NaN/Inf and post-hoc zeroes them (module.py:890-891). Both
  paths yield zeros for those pixels because the negative-depth mask wipes them.
- The validity mask uses the identical bounds: z >= min_depth_thres and
  |x_norm| <= 1 + 1/(W-1), |y_norm| <= 1 + 1/(H-1) (module.py:861-869).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_PREC = lax.Precision.HIGHEST

from .grid_sample import _pack_corners
from .linalg import invert_pixel_projection


def _pixel_projection_matrix(K, world_to_cam):
    """4x4 world->pixel matrix: rows 0..2 = K @ [R|t], row 3 = (0,0,0,1).

    K: (B, 3, 3); world_to_cam: (B, 4, 4) -> (B, 4, 4)
    """
    top = jnp.einsum("bij,bjk->bik", K, world_to_cam[:, :3, :4], precision=_PREC)
    return jnp.concatenate([top, world_to_cam[:, 3:4, :]], axis=1)


def plane_sweep_warp(src_features, ref_depth, *, src_K, src_cam_to_world,
                     ref_K, ref_cam_to_world, min_depth_thres: float = 0.001,
                     materialize: str = "positions", plane_group: int = 1,
                     patch: int = 4, patch_stride: int = 2):
    """Warp source features over reference depth hypotheses.

    :param src_features: (B, H, W, C)
    :param ref_depth: (B, D, H, W) depth hypotheses in the reference frame
    :param src_K, ref_K: (B, 3, 3)
    :param src_cam_to_world, ref_cam_to_world: (B, 4, 4)
    :param plane_group: fetch this many CONSECUTIVE depth planes' samples per
        pixel with ONE patch-row gather. The TPU HBM gather is issue-rate
        bound (~420 M rows/s regardless of row width — docs/PERF.md), so
        grouping divides the dominant warp cost by the group size. Valid
        because cascade stages 2/3 use narrow adaptive depth ranges: the
        group's bilinear corners almost always fit a small source patch. A
        runtime ``lax.cond`` falls back to the plain per-sample gather for
        the whole view whenever any group's valid corners would not fit, so
        both branches produce the same bilinear result. 1 = plain path.
    :param patch: patch side length in source pixels (plane_group > 1 only).
    :param patch_stride: patch-table anchor stride; the table stores
        ``patch x patch x C`` pixels per (y, x) anchor on this grid. Groups
        whose valid corner span exceeds ``patch - patch_stride - 1`` pixels
        on either axis trigger the fallback.
    :param materialize: which intermediates get an optimization barrier —
        "positions" (px/py/z, the default), "chain" (rows+weights), "out"
        (the warped volume), combinations ("positions+out"), or "none".
        Measured on v5e (experiments/bench_stage_agg.py): standalone, the
        chain barrier is fastest (42.7 vs 59.7 ms for a 6-view stage-2
        sweep) — but composed with the cost-volume aggregation XLA's
        scheduling inverts the ranking (62 vs 74 ms), so "positions" stays
        the default. An out/diff-sq barrier in the CONSUMER is what stops
        the gather from fusing into multiple aggregation uses and running
        once per use (measured 2x at stage 3); see cva_mvsnet.py.
    :return: warped (B, D, H, W, C), mask_valid (B, D, H, W) same dtype
    """
    B, H, W, C = src_features.shape
    D = ref_depth.shape[1]
    f32 = jnp.float32

    src_w2c = _rigid_inverse(src_cam_to_world.astype(f32))
    src_w2p = _pixel_projection_matrix(src_K.astype(f32), src_w2c)
    # ref pixel -> world: closed-form inverse of [K(R|t); 0 1] — XLA's
    # generic linalg.inv is an LU custom call costing ~24 ms on TPU.
    ref_p2w = invert_pixel_projection(ref_K.astype(f32),
                                      ref_cam_to_world.astype(f32))
    ref_to_src = jnp.einsum("bij,bjk->bik", src_w2p, ref_p2w, precision=_PREC)
    rot = ref_to_src[:, :3, :3]
    trans = ref_to_src[:, :3, 3]

    # Component-wise position math on (B, D, H, W) arrays: keeping H on the
    # sublane axis and W on lanes gives full (8, 128) VPU tiles — a size-3
    # xyz axis forces T(1,128) layouts that waste 7/8 of the vector unit
    # (seen in the compiled HLO of the stacked formulation).
    xs = jnp.arange(W, dtype=f32)
    ys = jnp.arange(H, dtype=f32)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    depth = ref_depth.astype(f32)  # (B, D, H, W)

    def proj_component(i):
        # rot[i] @ [x, y, 1] per pixel, then * depth + trans[i]
        dir_i = (rot[:, i, 0][:, None, None] * gx
                 + rot[:, i, 1][:, None, None] * gy
                 + rot[:, i, 2][:, None, None])          # (B, H, W)
        return dir_i[:, None] * depth + trans[:, i][:, None, None, None]

    z = proj_component(2)                                # (B, D, H, W)
    z_safe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    px = proj_component(0) / z_safe
    py = proj_component(1) / z_safe
    if "positions" in materialize:
        px, py, z = lax.optimization_barrier((px, py, z))

    x_norm = px / (0.5 * (W - 1)) - 1.0
    y_norm = py / (0.5 * (H - 1)) - 1.0
    mask_negative = z < min_depth_thres
    x_bound = 1.0 + 1.0 / (W - 1)
    y_bound = 1.0 + 1.0 / (H - 1)
    mask_outside = (jnp.abs(x_norm) > x_bound) | (jnp.abs(y_norm) > y_bound)
    mask_valid = ~(mask_negative | mask_outside)

    # Bilinear index/weight chain, inlined component-wise (no (N, 4)
    # stacked-weight arrays, no einsum — a size-4 trailing axis wastes
    # 124/128 lanes). Rays behind the source camera (module.py:883-887)
    # are zeroed by folding ~mask_negative into the weights, which is what
    # the reference's post-hoc multiply amounts to.
    dtype = src_features.dtype
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx1 = px - x0
    wy1 = py - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    # Cells whose base lies beyond the 1-pixel pad have every corner outside
    # the image: result is exactly zero (per-corner zeros padding).
    inside = ((x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1)
              & ~mask_negative)
    ins = inside.astype(jnp.float32)
    w00 = (wx0 * wy0 * ins).astype(dtype)
    w10 = (wx1 * wy0 * ins).astype(dtype)
    w01 = (wx0 * wy1 * ins).astype(dtype)
    w11 = (wx1 * wy1 * ins).astype(dtype)
    xi = jnp.clip(x0, -1, W - 1).astype(jnp.int32) + 1   # [0, W]
    yi = jnp.clip(y0, -1, H - 1).astype(jnp.int32) + 1   # [0, H]
    # mask_valid stays OUT of the barrier: the cascade discards it, and a
    # barrier operand would force its materialization anyway.
    if "chain" in materialize:
        xi, yi, w00, w10, w01, w11 = lax.optimization_barrier(
            (xi, yi, w00, w10, w01, w11))

    def _plain(src, xi, yi, w00, w10, w01, w11):
        rows = yi * (W + 1) + xi
        packed = _pack_corners(src).reshape(B * (H + 1) * (W + 1), 4 * C)
        offs = (jnp.arange(B, dtype=jnp.int32)
                * ((H + 1) * (W + 1)))[:, None, None, None]
        g = packed[(rows + offs).reshape(-1)]            # (B*N, 4C)
        warped = (g[:, 0 * C:1 * C] * w00.reshape(-1, 1)
                  + g[:, 1 * C:2 * C] * w10.reshape(-1, 1)
                  + g[:, 2 * C:3 * C] * w01.reshape(-1, 1)
                  + g[:, 3 * C:4 * C] * w11.reshape(-1, 1))
        return warped.reshape(B, D, H, W, C)

    if plane_group > 1 and D % plane_group == 0:
        warped = _grouped_or_plain(
            src_features, xi, yi, w00, w10, w01, w11, inside, _plain,
            plane_group, patch, patch_stride)
    else:
        warped = _plain(src_features, xi, yi, w00, w10, w01, w11)
    if "out" in materialize:
        warped = lax.optimization_barrier(warped)
    return warped, mask_valid.astype(src_features.dtype)


def _grouped_or_plain(src, xi, yi, w00, w10, w01, w11, inside, plain_fn,
                      G: int, P: int, S: int):
    """Patch-row gather over groups of G consecutive depth planes.

    The plain path fetches one packed-corner row per (pixel, plane) sample;
    the TPU gather is issue-rate bound, so the row COUNT is the cost. Here
    every G consecutive planes of a pixel share ONE gathered row holding a
    P x P x C source patch anchored on an S-strided grid, dividing the row
    count by G. Exact: each sample's bilinear corners are read from the
    patch with the same per-corner weights as the plain path (only the
    f32->dtype weight rounding points and the 4-term add order coincide up
    to reassociation). A scalar ``lax.cond`` falls back to ``plain_fn`` for
    the whole view when any group's VALID corners would not fit its patch
    (per-axis span > P - S - 1); invalid samples carry zero weights, so
    their positions are excluded from the anchor/span.
    """
    B, D, Hh, Ww = xi.shape
    C = src.shape[-1]
    DG = D // G
    SY, SX = Hh // S + 1, Ww // S + 1

    xi_g = xi.reshape(B, DG, G, Hh, Ww)
    yi_g = yi.reshape(B, DG, G, Hh, Ww)
    ins_g = inside.reshape(B, DG, G, Hh, Ww)
    BIG = jnp.int32(1 << 24)
    ymin = jnp.min(jnp.where(ins_g, yi_g, BIG), axis=2)
    ymax = jnp.max(jnp.where(ins_g, yi_g, -1), axis=2)
    xmin = jnp.min(jnp.where(ins_g, xi_g, BIG), axis=2)
    xmax = jnp.max(jnp.where(ins_g, xi_g, -1), axis=2)
    sy = jnp.clip(ymin // S, 0, SY - 1)
    sx = jnp.clip(xmin // S, 0, SX - 1)
    # ymax = -1 (no valid sample in the group) passes automatically.
    ok = jnp.all((ymax + 1 - sy * S <= P - 1)
                 & (xmax + 1 - sx * S <= P - 1))

    def grouped(_):
        # Patch table: row (sy, sx) = padded[sy*S : sy*S+P, sx*S : sx*S+P]
        # flattened; padded coords equal the +1-shifted xi/yi coords.
        need_h = (SY - 1) * S + P
        need_w = (SX - 1) * S + P
        p2 = jnp.pad(src, ((0, 0), (1, need_h - Hh - 1),
                           (1, need_w - Ww - 1), (0, 0)))
        parts = []
        for dy in range(P):
            for dx in range(P):
                parts.append(p2[:, dy:dy + (SY - 1) * S + 1:S,
                                dx:dx + (SX - 1) * S + 1:S, :])
        tbl = jnp.concatenate(parts, -1).reshape(B * SY * SX, P * P * C)

        offs = (jnp.arange(B, dtype=jnp.int32) * (SY * SX))[:, None, None,
                                                            None]
        rows = sy * SX + sx + offs                        # (B, DG, H, W)
        gr = tbl[rows.reshape(-1)].reshape(B, DG, Hh, Ww, P * P, C)

        ly = yi_g - (sy * S)[:, :, None]
        lx = xi_g - (sx * S)[:, :, None]
        i00 = ly * P + lx                                 # (B, DG, G, H, W)
        k = jnp.arange(P * P, dtype=jnp.int32)
        d = k - i00[..., None]                            # (..., P*P)
        zero = jnp.zeros((), src.dtype)
        m = (jnp.where(d == 0, w00.reshape(i00.shape)[..., None], zero)
             + jnp.where(d == 1, w10.reshape(i00.shape)[..., None], zero)
             + jnp.where(d == P, w01.reshape(i00.shape)[..., None], zero)
             + jnp.where(d == P + 1, w11.reshape(i00.shape)[..., None],
                         zero))
        out = jnp.einsum("bdghwk,bdhwkc->bdghwc", m, gr)
        return out.reshape(B, D, Hh, Ww, C)

    return lax.cond(ok, grouped,
                    lambda _: plain_fn(src, xi, yi, w00, w10, w01, w11),
                    None)


def _rigid_inverse(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -jnp.matmul(Rt, t, precision=_PREC)], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], -2)
