"""Depth-discontinuity edge filter.

Parity target: depth_filter_edges (cva_mvsnet/models/module.py:1320-1361):
for each pixel take the k-th smallest absolute depth difference within a 5x5
window (k = w*(w//2+1) = 15, zero padded), then zero out the strongest
``discard_percentage``% pixels per batch element (threshold = per-batch
quantile of the edge image).
"""

from __future__ import annotations

import jax.numpy as jnp


def depth_filter_edges(depth, discard_percentage, window: int = 5):
    """:param depth: (B, H, W)
    :param discard_percentage: (B,) percentage in [0, 100]
    :return: filtered depth (B, H, W), mask (B, H, W) bool (True = discarded)
    """
    B, H, W = depth.shape
    w = window
    w2 = w // 2
    num = w * (w2 + 1)  # k-th value (1-indexed in torch.kthvalue)

    padded = jnp.pad(depth, ((0, 0), (w2, w2), (w2, w2)))
    # (B, H, W, w*w) window stack — unrolled shifts; XLA fuses these slices.
    shifts = [padded[:, dy:dy + H, dx:dx + W]
              for dy in range(w) for dx in range(w)]
    dw = jnp.stack(shifts, axis=-1)  # (B, H, W, 25)

    edge = jnp.abs(dw - depth[..., None])  # (B, H, W, 25)
    edge = jnp.sort(edge, axis=-1)[..., num - 1]  # k-th smallest -> (B, H, W)

    edge_flat = edge.reshape(B, H * W)
    edge_sorted = jnp.sort(edge_flat, axis=1)
    cutoff = (H * W * (100.0 - discard_percentage) / 100.0).astype(jnp.int32)
    cutoff = jnp.clip(cutoff, 0, H * W - 1)  # (B,)
    thres = jnp.take_along_axis(edge_sorted, cutoff[:, None], axis=1)  # (B, 1)

    mask = edge > thres[:, :, None]
    return jnp.where(mask, 0.0, depth), mask
