"""Depth-discontinuity edge filter.

Parity target: depth_filter_edges (cva_mvsnet/models/module.py:1320-1361):
for each pixel take the k-th smallest absolute depth difference within a 5x5
window (k = w*(w//2+1) = 15, zero padded), then zero out the strongest
``discard_percentage``% pixels per batch element (threshold = per-batch
quantile of the edge image).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _kth_edge_xla(depth, window: int):
    B, H, W = depth.shape
    w2 = window // 2
    num = window * (w2 + 1)
    padded = jnp.pad(depth, ((0, 0), (w2, w2), (w2, w2)))
    shifts = [padded[:, dy:dy + H, dx:dx + W]
              for dy in range(window) for dx in range(window)]
    dw = jnp.stack(shifts, axis=-1)
    edge = jnp.abs(dw - depth[..., None])
    return jnp.sort(edge, axis=-1)[..., num - 1]


def depth_filter_edges(depth, discard_percentage, window: int = 5):
    """:param depth: (B, H, W)
    :param discard_percentage: (B,) percentage in [0, 100]
    :return: filtered depth (B, H, W), mask (B, H, W) bool (True = discarded)
    """
    B, H, W = depth.shape

    use_pallas = (window == 5 and jax.default_backend() == "tpu"
                  and H % 32 == 0)
    if use_pallas:
        from ..ops.pallas_kernels import edge_kth_value_pallas
        block = max(d for d in (64, 48, 32) if H % d == 0)
        edge = jax.vmap(lambda d: edge_kth_value_pallas(
            d, block_rows=block))(depth)
    else:
        edge = _kth_edge_xla(depth, window)

    edge_flat = edge.reshape(B, H * W)
    edge_sorted = jnp.sort(edge_flat, axis=1)
    cutoff = (H * W * (100.0 - discard_percentage) / 100.0).astype(jnp.int32)
    cutoff = jnp.clip(cutoff, 0, H * W - 1)  # (B,)
    thres = jnp.take_along_axis(edge_sorted, cutoff[:, None], axis=1)  # (B, 1)

    mask = edge > thres[:, :, None]
    return jnp.where(mask, 0.0, depth), mask
