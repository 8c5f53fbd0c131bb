"""Pallas TPU kernels for fused hot ops.

Kernels here replace XLA graphs where fusion or memory placement wins:

- ``edge_kth_value``: the depth edge filter's per-pixel k-th smallest
  absolute window difference (module.py:1341-1344 semantics). The XLA path
  materializes a (B, H, W, 25) window stack in HBM and sorts it; the kernel
  streams row-blocks through VMEM and selects the k-th value by rank
  counting (625 VPU compares per pixel, zero HBM temporaries).

Every kernel has an identical-semantics XLA reference used on CPU and in
tests (interpret mode covers the kernel logic itself).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINDOW = 5
K_RANK = WINDOW * (WINDOW // 2 + 1)  # 15 of 25 (module.py:1338-1339)


def _edge_kth_kernel(depth_ref, out_ref):
    """depth_ref: full padded image in VMEM; out_ref: (Hb, W) row block.

    Overlapping halo rows are read with a dynamic slice by program id (plain
    BlockSpec tiling cannot express halos)."""
    Hb, W = out_ref.shape
    w2 = WINDOW // 2
    i = pl.program_id(0)
    d = depth_ref[pl.ds(i * Hb, Hb + 2 * w2), :]
    center = d[w2:w2 + Hb, w2:w2 + W]

    # |window - center| for all 25 taps (static slices, stays in VMEM)
    vals = []
    for dy in range(WINDOW):
        for dx in range(WINDOW):
            vals.append(jnp.abs(d[dy:dy + Hb, dx:dx + W] - center))

    # k-th smallest by rank counting:
    # kth = min{ v_i : #(v_j <= v_i) >= K_RANK }
    big = jnp.float32(3.4e38)
    kth = jnp.full((Hb, W), big)
    for i in range(len(vals)):
        le = jnp.zeros((Hb, W), jnp.float32)
        for j in range(len(vals)):
            le = le + (vals[j] <= vals[i]).astype(jnp.float32)
        cand = le >= K_RANK
        kth = jnp.where(cand & (vals[i] < kth), vals[i], kth)
    out_ref[...] = kth


def edge_kth_value_pallas(depth, block_rows: int = 64, interpret: bool = False):
    """:param depth: (H, W) float32 -> (H, W) k-th |window diff| (zero pad)."""
    H, W = depth.shape
    w2 = WINDOW // 2
    padded = jnp.pad(depth, ((w2, w2), (w2, w2)))
    Hb = min(block_rows, H)
    n_blocks = (H + Hb - 1) // Hb
    assert H % Hb == 0, "H must divide into row blocks"

    return pl.pallas_call(
        _edge_kth_kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Hb, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        interpret=interpret,
    )(padded)


def edge_kth_value_xla(depth):
    """Reference XLA implementation (identical semantics)."""
    H, W = depth.shape
    w2 = WINDOW // 2
    padded = jnp.pad(depth, ((w2, w2), (w2, w2)))
    shifts = [padded[dy:dy + H, dx:dx + W]
              for dy in range(WINDOW) for dx in range(WINDOW)]
    dw = jnp.stack(shifts, axis=-1)
    edge = jnp.abs(dw - depth[..., None])
    return jnp.sort(edge, axis=-1)[..., K_RANK - 1]
