"""Depth evaluation metrics (abs_rel, rmse, a1-a3, d1-d3, ...).

Parity target: eval_errors (cva_mvsnet/models/module.py:1364-1465). The
reference iterates per-sample with boolean masking; here the same statistics
are computed with masked reductions (static shapes, jit-friendly). Pixels with
mask <= 0.5 contribute zero weight.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

METRIC_NAMES = ("abs_rel", "abs", "sq_rel", "rmse", "rmse_log",
                "a1", "a2", "a3", "d1", "d2", "d3")


def _masked_mean(x, m, axis):
    denom = jnp.maximum(jnp.sum(m, axis=axis), 1e-12)
    return jnp.sum(x * m, axis=axis) / denom


def stage_errors(est, gt, mask, keep_batch: bool = False) -> Dict[str, jnp.ndarray]:
    """est, gt, mask: (B, H, W). Returns dict of (B,) or scalar metrics."""
    m = (mask > 0.5).astype(jnp.float32)
    axis = (1, 2)
    gt_safe = jnp.where(m > 0, gt, 1.0)
    est_safe = jnp.where(m > 0, est, 1.0)

    abs_diff = jnp.abs(gt_safe - est_safe)
    abs_rel_img = abs_diff / gt_safe
    d_val = jnp.maximum(gt_safe / est_safe, est_safe / gt_safe)

    out = {
        "abs_rel": _masked_mean(abs_rel_img, m, axis),
        "abs": _masked_mean(abs_diff, m, axis),
        "sq_rel": _masked_mean((gt_safe - est_safe) ** 2 / gt_safe, m, axis),
        "rmse": jnp.sqrt(_masked_mean((gt_safe - est_safe) ** 2, m, axis)),
        "rmse_log": jnp.sqrt(_masked_mean(
            (jnp.log(jnp.maximum(gt_safe, 1e-12))
             - jnp.log(jnp.maximum(est_safe, 1e-12))) ** 2, m, axis)),
        "a1": _masked_mean((abs_rel_img < 0.1).astype(jnp.float32), m, axis),
        "a2": _masked_mean((abs_rel_img < 0.1 ** 2).astype(jnp.float32), m, axis),
        "a3": _masked_mean((abs_rel_img < 0.1 ** 3).astype(jnp.float32), m, axis),
        "d1": _masked_mean((d_val < 1.25).astype(jnp.float32), m, axis),
        "d2": _masked_mean((d_val < 1.25 ** 2).astype(jnp.float32), m, axis),
        "d3": _masked_mean((d_val < 1.25 ** 3).astype(jnp.float32), m, axis),
    }
    if not keep_batch:
        out = {k: jnp.mean(v) for k, v in out.items()}
    return out


def eval_errors(outputs: dict, batch: dict, keep_batch: bool = False) -> dict:
    errors = {}
    for stage in ("stage1", "stage2", "stage3"):
        errors[stage] = stage_errors(
            outputs[stage]["depth"], batch["depth"][stage],
            batch["mask"][stage], keep_batch=keep_batch)
    return errors
