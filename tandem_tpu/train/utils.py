"""Training utilities: meters, epoch reductions, SAM, multi-step LR.

Parity targets: cva_mvsnet/utils.py and models/utils/__init__.py —
DictAverageMeter / epoch_end_mean (recursive mean over step outputs, incl.
per-dataset-name grouping), StreamingBinCount, the WarmupMultiStepLR schedule
(models/utils/warmup_multi_step_lr.py), and the SAM optimizer
(module.py:1568-1629) as an optax gradient transformation.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _tree_mean(items: Sequence[Any]):
    if isinstance(items[0], dict):
        return {k: _tree_mean([it[k] for it in items]) for k in items[0]}
    vals = [np.asarray(v, np.float64) for v in items]
    return float(np.mean([v.mean() for v in vals]))


def epoch_end_mean(outputs: List[Dict]) -> Dict:
    """Recursive mean over a list of per-step output dicts."""
    return _tree_mean(list(outputs))


def epoch_end_mean_named(outputs: List[Dict], names: List[str]):
    """Per-dataset-name means + overall mean (utils epoch_end_mean_named)."""
    overall = epoch_end_mean(outputs)
    grouped = defaultdict(list)
    for out, name in zip(outputs, names):
        key = name[0] if isinstance(name, (list, tuple)) else name
        grouped[key].append(out)
    per_name = {k: epoch_end_mean(v) for k, v in grouped.items()}
    return overall, per_name


class DictAverageMeter:
    def __init__(self):
        self.sums: Dict[str, float] = defaultdict(float)
        self.count = 0

    def update(self, values: Dict[str, float]):
        for k, v in values.items():
            self.sums[k] += float(np.asarray(v))
        self.count += 1

    def mean(self) -> Dict[str, float]:
        return {k: v / max(self.count, 1) for k, v in self.sums.items()}


class StreamingBinCount:
    """Streaming histogram (models/utils/__init__.py StreamingBinCount)."""

    def __init__(self, bins: int, lo: float = 0.0, hi: float = 1.0):
        self.edges = np.linspace(lo, hi, bins + 1)
        self.counts = np.zeros(bins, np.int64)

    def update(self, values):
        h, _ = np.histogram(np.asarray(values).reshape(-1), bins=self.edges)
        self.counts += h

    def normalized(self):
        total = max(self.counts.sum(), 1)
        return self.counts / total


def warmup_multi_step_lr(base_lr: float, milestones: Sequence[int],
                         gamma: float = 0.5, warmup_factor: float = 1.0 / 3,
                         warmup_iters: int = 500):
    """WarmupMultiStepLR: linear warmup then step decay at milestones."""
    ms = jnp.asarray(sorted(milestones))

    def fn(step):
        alpha = jnp.minimum(step / max(warmup_iters, 1), 1.0)
        wf = warmup_factor * (1 - alpha) + alpha
        decay = gamma ** jnp.sum(step >= ms)
        return base_lr * wf * decay
    return fn


def sam_perturb(params, grads, rho: float = 0.05):
    """SAM first step: climb to the local worst case (e_w = rho g/||g||).

    The second step is plain ``tx.update`` with the gradient taken at the
    perturbed point — wired into the training step by
    ``trainer.make_train_step`` when config ``TRAIN.SAM`` is set (reference
    two-step semantics: module.py:1568-1629, adaptive=False).
    """
    gnorm = optax.global_norm(grads)
    scale = rho / (gnorm + 1e-12)
    return jax.tree_util.tree_map(lambda p, g: p + scale * g, params, grads)
