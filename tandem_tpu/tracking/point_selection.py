"""Gradient-based candidate pixel selection.

Re-design of DSO's PixelSelector2 (tandem/src/FullSystem/PixelSelector2.h:37,
makeMaps): region-adaptive gradient thresholds over a block grid, selecting
well-spread high-gradient pixels at multiple potentials. TPU version: one
fixed-shape pass — per-block gradient statistics give an adaptive threshold
(smoothed median + offset, like DSO's histogram-median threshold), then the
top pixel per potential cell is selected where it clears the threshold.

Returns a fixed-capacity point list (u, v) with a validity mask (static
shapes for downstream jitted consumers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(1, 2, 3))
def select_pixels(abs_grad2, block: int = 32, potential: int = 4,
                  threshold_factor: float = 1.0):
    """:param abs_grad2: (H, W) squared gradient magnitude
    :param block: adaptive-threshold region size (DSO: 32x32 histograms)
    :param potential: selection cell size (one point per cell max)
    :return: dict with 'mask' (H, W) bool of selected pixels.
    """
    H, W = abs_grad2.shape
    g = jnp.sqrt(abs_grad2)

    # Region-adaptive threshold: per 32x32 block, sqrt of mean grad + offset
    # (stands in for DSO's histogram median + setting_minGradHistAdd).
    Hb, Wb = H // block, W // block
    gb = g[:Hb * block, :Wb * block].reshape(Hb, block, Wb, block)
    med = jnp.median(gb, axis=(1, 3))
    th_block = (med + 7.0) * threshold_factor
    # Smooth 3x3 like DSO's smoothed threshold map
    thp = jnp.pad(th_block, 1, mode="edge")
    th_s = sum(thp[dy:dy + Hb, dx:dx + Wb]
               for dy in range(3) for dx in range(3)) / 9.0
    th_full = jnp.repeat(jnp.repeat(th_s, block, 0), block, 1)
    th_full = jnp.pad(th_full, ((0, H - Hb * block), (0, W - Wb * block)),
                      mode="edge")

    # One candidate per potential cell: the argmax gradient pixel.
    Hp, Wp = H // potential, W // potential
    gc = g[:Hp * potential, :Wp * potential].reshape(
        Hp, potential, Wp, potential).transpose(0, 2, 1, 3).reshape(
        Hp, Wp, potential * potential)
    best = jnp.argmax(gc, axis=-1)
    best_val = jnp.take_along_axis(gc, best[..., None], -1)[..., 0]
    keep = best_val > th_full[::potential, ::potential][:Hp, :Wp] ** 1.0

    by = best // potential
    bx = best % potential
    ys = jnp.arange(Hp)[:, None] * potential + by
    xs = jnp.arange(Wp)[None, :] * potential + bx

    mask = jnp.zeros((H, W), jnp.bool_)
    flat = jnp.where(keep, ys * W + xs, H * W)
    mask = mask.reshape(-1).at[flat.reshape(-1)].set(True, mode="drop")
    mask = mask.reshape(H, W)
    # No selection on the border (residual pattern needs 2px margin)
    border = jnp.zeros((H, W), jnp.bool_).at[3:-3, 3:-3].set(True)
    return mask & border
