"""Convert reference (torch) CvaMVSNet checkpoints to tandem_tpu flax params.

Handles the reference's parameter naming (cva_mvsnet/models/cva_mvsnet.py /
module.py) including PyTorch-Lightning checkpoints whose keys are prefixed
with ``cva_mvsnet.`` (models/utils/load_ckpt.py:36-48). Layout conversions:

- Conv2d  (O, I, kh, kw)        -> (kh, kw, I, O)
- Conv3d  (O, I, kd, kh, kw)    -> (kd, kh, kw, I, O)
- ConvTranspose3d (I, O, kd, kh, kw) -> spatially flipped (kd, kh, kw, I, O)
  (our DeconvBnRelu stores the pre-flipped kernel and runs a plain dilated
  correlation, see models/layers.py)
- BatchNorm weight/bias -> scale/bias; running stats -> batch_stats.

Works on plain numpy arrays; no torch import needed at call time.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

STAGES = ("stage1", "stage2", "stage3")

_FEATURE_CONVS = [
    ("conv0.0", "conv0_0"), ("conv0.1", "conv0_1"),
    ("conv1.0", "conv1_0"), ("conv1.1", "conv1_1"), ("conv1.2", "conv1_2"),
    ("conv2.0", "conv2_0"), ("conv2.1", "conv2_1"), ("conv2.2", "conv2_2"),
]

_COSTREG_CONVS = ["conv0", "conv1", "conv2", "conv3", "conv4", "conv5", "conv6"]
_COSTREG_DECONVS = ["conv7", "conv9", "conv11"]


def _conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _conv3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _deconv3d(w):
    w = np.transpose(w, (2, 3, 4, 0, 1))  # (kd, kh, kw, I, O)
    return w[::-1, ::-1, ::-1].copy()


def _set(tree: dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value, dtype=np.float32)


def convert_state_dict(sd: Dict[str, np.ndarray], view_aggregation: bool = True):
    """:param sd: torch state_dict with numpy values (model-level or PL ckpt
    'state_dict' with 'cva_mvsnet.' prefixes).
    :return: {'params': ..., 'batch_stats': ...} flax variables (plain dicts).
    """
    # Strip optional prefixes.
    def norm_key(k):
        for prefix in ("cva_mvsnet.", "model."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        return k

    sd = {norm_key(k): np.asarray(v) for k, v in sd.items()}

    params: dict = {}
    stats: dict = {}

    def conv_bn(src: str, dst: Tuple[str, ...], conv_fn, has_bias=False):
        _set(params, dst + ("conv", "kernel"), conv_fn(sd[f"{src}.conv.weight"]))
        if has_bias:
            _set(params, dst + ("conv", "bias"), sd[f"{src}.conv.bias"])
        if f"{src}.bn.weight" in sd:
            _set(params, dst + ("bn", "scale"), sd[f"{src}.bn.weight"])
            _set(params, dst + ("bn", "bias"), sd[f"{src}.bn.bias"])
            _set(stats, dst + ("bn", "mean"), sd[f"{src}.bn.running_mean"])
            _set(stats, dst + ("bn", "var"), sd[f"{src}.bn.running_var"])

    # FeatureNet tower
    for src, dst in _FEATURE_CONVS:
        conv_bn(f"feature_net.{src}", ("feature_net", dst), _conv2d)
    for s in STAGES:
        _set(params, ("feature_net", f"out_{s}", "kernel"),
             _conv2d(sd[f"feature_net.out.{s}.weight"]))
    for s in ("stage2", "stage3"):
        _set(params, ("feature_net", f"skip_{s}", "kernel"),
             _conv2d(sd[f"feature_net.skip.{s}.weight"]))
        _set(params, ("feature_net", f"skip_{s}", "bias"),
             sd[f"feature_net.skip.{s}.bias"])

    # CostRegNets
    for s in STAGES:
        base = f"cost_regularization_net.{s}"
        dstb = f"cost_reg_{s}"
        for c in _COSTREG_CONVS:
            conv_bn(f"{base}.{c}", (dstb, c), _conv3d)
        for c in _COSTREG_DECONVS:
            _set(params, (dstb, c, "kernel"), _deconv3d(sd[f"{base}.{c}.conv.weight"]))
            _set(params, (dstb, c, "bn", "scale"), sd[f"{base}.{c}.bn.weight"])
            _set(params, (dstb, c, "bn", "bias"), sd[f"{base}.{c}.bn.bias"])
            _set(stats, (dstb, c, "bn", "mean"), sd[f"{base}.{c}.bn.running_mean"])
            _set(stats, (dstb, c, "bn", "var"), sd[f"{base}.{c}.bn.running_var"])
        _set(params, (dstb, "prob", "kernel"), _conv3d(sd[f"{base}.prob.weight"]))

    # Volume gates (Sequential: 0=Conv3d, 1=BN, 3=Conv3d, 4=BN)
    if view_aggregation:
        for s in STAGES:
            base = f"volume_gates.{s}"
            dstb = f"volume_gate_{s}"
            _set(params, (dstb, "gate0", "kernel"), _conv3d(sd[f"{base}.0.weight"]))
            _set(params, (dstb, "gate0", "bias"), sd[f"{base}.0.bias"])
            _set(params, (dstb, "bn0", "scale"), sd[f"{base}.1.weight"])
            _set(params, (dstb, "bn0", "bias"), sd[f"{base}.1.bias"])
            _set(stats, (dstb, "bn0", "mean"), sd[f"{base}.1.running_mean"])
            _set(stats, (dstb, "bn0", "var"), sd[f"{base}.1.running_var"])
            _set(params, (dstb, "gate1", "kernel"), _conv3d(sd[f"{base}.3.weight"]))
            _set(params, (dstb, "gate1", "bias"), sd[f"{base}.3.bias"])
            _set(stats, (dstb, "bn1", "mean"), sd[f"{base}.4.running_mean"])
            _set(stats, (dstb, "bn1", "var"), sd[f"{base}.4.running_var"])
            _set(params, (dstb, "bn1", "scale"), sd[f"{base}.4.weight"])
            _set(params, (dstb, "bn1", "bias"), sd[f"{base}.4.bias"])

    return {"params": params, "batch_stats": stats}
