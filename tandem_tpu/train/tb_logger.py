"""TensorBoard logger with 4 sub-writers and sample-scaled x-axis.

Parity target: cva_mvsnet/models/utils/tb_logger.py:17-243 — separate
train / val / train_epoch / val_epoch SummaryWriters, global x-axis measured
in SAMPLES (samples_per_step * global_step, :138), scalar groups for losses,
the 11 depth metrics per stage, and learning rate; image summaries for the
multi-view strip and depth/confidence maps (plasma colormap).

Only rank 0 writes (jax.process_index() == 0, replacing rank_zero_only).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

try:
    from torch.utils.tensorboard import SummaryWriter
    _HAS_TB = True
except Exception:  # pragma: no cover
    _HAS_TB = False


def _colorize_plasma(x: np.ndarray, vmin=None, vmax=None) -> np.ndarray:
    """(H, W) -> (3, H, W) plasma-colorized uint8-style float image."""
    import matplotlib.cm
    vmin = np.nanmin(x) if vmin is None else vmin
    vmax = np.nanmax(x) if vmax is None else vmax
    normed = np.clip((x - vmin) / max(vmax - vmin, 1e-12), 0, 1)
    rgba = matplotlib.cm.get_cmap("plasma")(normed)
    return np.transpose(rgba[..., :3], (2, 0, 1)).astype(np.float32)


class TBLogger:
    WRITERS = ("train", "val", "train_epoch", "val_epoch")

    def __init__(self, out_dir: str, samples_per_step: int = 1,
                 enabled: Optional[bool] = None):
        import jax
        if enabled is None:
            enabled = jax.process_index() == 0
        self.enabled = enabled and _HAS_TB
        self.samples_per_step = samples_per_step
        self.writers = {}
        if self.enabled:
            for name in self.WRITERS:
                self.writers[name] = SummaryWriter(
                    os.path.join(out_dir, "tb", name))

    def global_sample(self, global_step: int) -> int:
        return self.samples_per_step * global_step

    def add_scalars(self, writer: str, losses: Dict, errors: Dict,
                    global_step: int, prefix: str = ""):
        if not self.enabled:
            return
        w = self.writers[writer]
        x = self.global_sample(global_step)
        for k, v in (losses or {}).items():
            w.add_scalar(prefix + f"loss/{k}", float(np.asarray(v)), x)
        for stage, metrics in (errors or {}).items():
            for k, v in metrics.items():
                w.add_scalar(prefix + f"{stage}/{k}", float(np.asarray(v)), x)

    def add_lr(self, writer: str, lr: float, global_step: int):
        if not self.enabled:
            return
        self.writers[writer].add_scalar("lr", float(lr),
                                        self.global_sample(global_step))

    def add_summaries(self, writer: str, batch: Dict, outputs: Dict,
                      global_step: int, max_views: int = 7):
        """Image summaries: view strip + stage3 depth gt/pred + confidence."""
        if not self.enabled:
            return
        w = self.writers[writer]
        x = self.global_sample(global_step)
        img = np.asarray(batch["image"][0])       # (V, 3, H, W)
        strip = np.concatenate(list(img[:max_views]), axis=2)
        w.add_image("image/views", np.clip(strip, 0, 1), x)

        gt = np.asarray(batch["depth"]["stage3"][0])
        pred = np.asarray(outputs["stage3"]["depth"][0])
        vmax = max(float(gt.max()), 1e-6)
        w.add_image("depth/gt", _colorize_plasma(gt, 0, vmax), x)
        w.add_image("depth/pred", _colorize_plasma(pred, 0, vmax), x)
        conf = np.asarray(outputs["stage3"]["confidence"][0])
        w.add_image("confidence/stage3", _colorize_plasma(conf, 0, 1), x)

    def flush(self):
        for w in self.writers.values():
            w.flush()

    def close(self):
        for w in self.writers.values():
            w.close()
