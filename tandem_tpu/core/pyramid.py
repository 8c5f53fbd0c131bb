"""Image pyramids with gradients.

Replaces FrameHessian::makeImages (tandem/src/FullSystem/HessianBlocks.h:322,
.cpp): level l+1 is the 2x2 average of level l; gradients are central
differences; absSquaredGrad = gx^2 + gy^2. All arrays are (H, W) float32 and
the pyramid is a list ordered fine -> coarse.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def downsample_2x2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 average; odd trailing row/col dropped (DSO's w >> l sizing)."""
    H, W = img.shape
    H2, W2 = H // 2, W // 2
    img = img[:H2 * 2, :W2 * 2]
    return img.reshape(H2, 2, W2, 2).mean(axis=(1, 3))


def gradients(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients, zero on the 1-pixel border (DSO only
    evaluates interior pixels)."""
    gx = jnp.zeros_like(img)
    gy = jnp.zeros_like(img)
    gx = gx.at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = gy.at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    return gx, gy


def build_pyramid(img: jnp.ndarray, num_levels: int = 6) -> List[dict]:
    """:param img: (H, W) float32 intensity in [0, 255]
    :return: list of {'img', 'gx', 'gy', 'abs_grad2'} fine -> coarse."""
    levels = []
    cur = img
    for lvl in range(num_levels):
        gx, gy = gradients(cur)
        levels.append({"img": cur, "gx": gx, "gy": gy,
                       "abs_grad2": gx * gx + gy * gy})
        if lvl + 1 < num_levels:
            cur = downsample_2x2(cur)
    return levels


def pyramid_intrinsics(fx, fy, cx, cy, num_levels: int = 6):
    """DSO's per-level calibration (tandem/src/util/globalCalib.cpp:32-44):
    fx_l = fx * 2^-l, cx_l = (cx + 0.5) * 2^-l - 0.5 (the half-pixel
    convention)."""
    out = []
    for lvl in range(num_levels):
        s = 0.5 ** lvl
        out.append((fx * s, fy * s, (cx + 0.5) * s - 0.5, (cy + 0.5) * s - 0.5))
    return out
