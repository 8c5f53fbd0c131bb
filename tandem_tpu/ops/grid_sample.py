"""Bilinear grid sampling on TPU (XLA gather based).

Matches torch.nn.functional.grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=True) semantics, which the reference plane-sweep warp depends on
(cva_mvsnet/models/module.py:871-873 and the comment block :782-789).

Layout is NHWC (TPU-native); the channel axis rides the 128-lane dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_2d(img_flat, idx, B):
    """img_flat: (B, H*W, C); idx: (B, N) int32 -> (B, N, C).

    The batch dim is folded into the row index so XLA sees ONE un-batched
    row gather with a full C-row slice — the fast TPU gather form. Both
    batched gathers (vmap) and broadcast-index take_along_axis lower to
    per-element or per-batch gathers that are ~30x slower here.
    """
    _, HW, C = img_flat.shape
    flat = img_flat.reshape(B * HW, C)
    offs = (jnp.arange(B, dtype=idx.dtype) * HW)[:, None]
    out = flat[(idx + offs).reshape(-1)]
    return out.reshape(B, -1, C)


def bilinear_sample_pixel(img, x, y):
    """Sample ``img`` (B, H, W, C) at pixel coordinates x, y (B, N) with
    bilinear interpolation and zero padding outside [0, W-1] x [0, H-1].

    Per-corner zero padding: each of the four corners contributes zero if it
    falls outside the image, exactly like grid_sample(padding_mode='zeros').
    Returns (B, N, C).
    """
    B, H, W, C = img.shape
    dtype = img.dtype
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    img_flat = img.reshape(B, H * W, C)

    def corner(ix, iy, w):
        valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        v = _gather_2d(img_flat, iyc * W + ixc, B)
        w = (w * valid.astype(jnp.float32)).astype(dtype)
        return v * w[..., None]

    out = (corner(x0, y0, wx0 * wy0) + corner(x0 + 1, y0, wx1 * wy0)
           + corner(x0, y0 + 1, wx0 * wy1) + corner(x0 + 1, y0 + 1, wx1 * wy1))
    return out


def grid_sample_bilinear(img, grid):
    """torch-compatible grid_sample.

    :param img: (B, H, W, C)
    :param grid: (B, Ho, Wo, 2) normalized coords in [-1, 1], align_corners=True
        convention: -1 -> pixel 0, +1 -> pixel (W-1) (module.py:782-789).
    :return: (B, Ho, Wo, C)
    """
    B, H, W, C = img.shape
    _, Ho, Wo, _ = grid.shape
    x = (grid[..., 0].astype(jnp.float32) + 1.0) * (0.5 * (W - 1))
    y = (grid[..., 1].astype(jnp.float32) + 1.0) * (0.5 * (H - 1))
    out = bilinear_sample_pixel(img, x.reshape(B, -1), y.reshape(B, -1))
    return out.reshape(B, Ho, Wo, C)
