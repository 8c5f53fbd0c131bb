"""Depth-hypothesis range sampling for the cascade.

Parity targets: uniform_depth_range (cva_mvsnet/models/module.py:1480-1500) and
adaptive_depth_range (module.py:1503-1565).
"""

from __future__ import annotations

import jax.numpy as jnp


def uniform_depth_range(*, depth_min, depth_max, depth_num: int, height: int,
                        width: int):
    """:return: (B, D, H, W) samples and (B,) base interval."""
    depth_min = jnp.asarray(depth_min, jnp.float32)
    depth_max = jnp.asarray(depth_max, jnp.float32)
    interval = (depth_max - depth_min) / (depth_num - 1)  # (B,)
    steps = jnp.arange(depth_num, dtype=jnp.float32)  # (D,)
    depth = depth_min[:, None] + interval[:, None] * steps[None, :]  # (B, D)
    depth = jnp.broadcast_to(depth[:, :, None, None],
                             depth.shape + (height, width))
    return depth, interval


def adaptive_depth_range(*, depth, interval, depth_num: int,
                         depth_clamp_min: float = 0.001,
                         inverse_depth: bool = False):
    """Window of ``depth_num`` hypotheses around a previous-stage depth map.

    :param depth: (B, H, W) upsampled previous-stage depth
    :param interval: (B,) this stage's interval (base_interval * ratio)
    :return: (B, D, H, W)
    """
    depth_min = depth - (depth_num / 2.0) * interval[:, None, None]
    depth_min = jnp.maximum(depth_min, depth_clamp_min)
    depth_max = depth_min + depth_num * interval[:, None, None]

    if not inverse_depth:
        # linspace(0, 1, D+1)[:-1] == arange(D)/D  (module.py:1528-1530)
        lin = (jnp.arange(depth_num, dtype=jnp.float32) / depth_num
               ).reshape(1, -1, 1, 1)
    else:
        # Non-uniform spacing concentrated near the centre (module.py:1547-1559).
        f = {32: 0.5, 8: 0.3}[depth_num]
        half = (1.0 / jnp.linspace(1.0 / f, 1.0, depth_num // 2) - f) / (1.0 - f)
        half = (half + 0.5 * half[1]) / (1.0 + 0.5 * half[1])
        lin = 0.5 * jnp.concatenate([-half[::-1], half]) + 0.5
        lin = lin.reshape(1, -1, 1, 1)

    return depth_min[:, None] + (depth_max - depth_min)[:, None] * lin
