"""CVA-MVSNet: 3-stage cascaded plane-sweep MVS with adaptive view aggregation.

Parity target: cva_mvsnet/models/cva_mvsnet.py:24-184 and the per-stage
depth_prediction (models/module.py:1030-1139). TPU-first re-design:

- NHWC / NDHWC layouts so channels ride the 128-lane dimension and the 3D
  U-Net convs map straight onto the MXU.
- All V views' features are extracted in one batched (B*V) pass.
- Plane-sweep warp is a batched gather op (ops/warp.py); cost-volume math is
  fused elementwise XLA.
- Static shapes everywhere; the public ``apply`` is jittable at fixed
  (B, V, H, W) and runs under bfloat16 when configured.

Public tensor contract mirrors the reference: image (B, V, C, H, W) RGB in
[0, 1], per-stage intrinsics (B, 3, 3), cam_to_world (B, V, 4, 4), scalar
depth_min/depth_max (B,), optional depth_filter_discard_percentage (B,).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.warp import plane_sweep_warp
from .cost_reg import CostRegNet, VolumeGate
from .edge_filter import depth_filter_edges
from .feature_net import FeatureNet
from .layers import interpolate_bilinear
from .ranges import adaptive_depth_range, uniform_depth_range


class StageOutputs(NamedTuple):
    depth: jnp.ndarray
    confidence: jnp.ndarray
    depth_dense: jnp.ndarray
    confidence_dense: jnp.ndarray


class Outputs(NamedTuple):
    stage1: StageOutputs
    stage2: StageOutputs
    stage3: StageOutputs


STAGES = ("stage1", "stage2", "stage3")


class CvaMVSNet(nn.Module):
    depth_num: Tuple[int, ...] = (48, 32, 8)
    depth_interval_ratio: Tuple[float, ...] = (1.0, 0.5, 0.25)
    feature_net_base_channels: int = 8
    cost_volume_base_channels: Tuple[int, ...] = (8, 8, 8)
    view_aggregation: bool = False
    conv2d_normalization: str = "batchnorm"
    conv3d_normalization: str = "batchnorm"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert len(self.depth_num) == 3
        assert self.depth_interval_ratio[0] == 1.0
        self.scale = {s: 2 ** (2 - i) for i, s in enumerate(STAGES)}
        self.feature_net = FeatureNet(
            base_channels=self.feature_net_base_channels,
            normalization=self.conv2d_normalization, dtype=self.dtype)
        fc = self.feature_net.out_channels
        self.cost_reg = {
            s: CostRegNet(base_channels=self.cost_volume_base_channels[i],
                          normalization=self.conv3d_normalization,
                          has_four_depths=self.depth_num[i] == 4,
                          dtype=self.dtype, name=f"cost_reg_{s}")
            for i, s in enumerate(STAGES)}
        if self.view_aggregation:
            self.volume_gates = {
                s: VolumeGate(dtype=self.dtype, name=f"volume_gate_{s}")
                for s in STAGES}

    def __call__(self, image, intrinsic_matrix, cam_to_world, depth_min,
                 depth_max, depth_filter_discard_percentage=None,
                 train: bool = False) -> Outputs:
        """
        :param image: (B, V, C, H, W) RGB in [0, 1]
        :param intrinsic_matrix: tuple of 3 arrays (B, 3, 3), stage order
        :param cam_to_world: (B, V, 4, 4), reference view first
        :param depth_min / depth_max: (B,)
        :param depth_filter_discard_percentage: optional (B,) in [0, 100]
        """
        B, V, C, H, W = image.shape
        img = jnp.transpose(image, (0, 1, 3, 4, 2))  # (B, V, H, W, C) NHWC
        img = img.reshape(B * V, H, W, C).astype(self.dtype)

        feats = self.feature_net(img, train=train)
        # per-stage: (B, V, Hs, Ws, Cs)
        features = {
            s: f.reshape(B, V, *f.shape[1:]) for s, f in feats.items()}

        outputs: Dict[str, Dict[str, jnp.ndarray]] = {}
        depth_base_interval = None
        for i, stage in enumerate(STAGES):
            hs, ws = H // self.scale[stage], W // self.scale[stage]
            if stage == "stage1":
                depth_samples, depth_base_interval = uniform_depth_range(
                    depth_min=depth_min, depth_max=depth_max,
                    depth_num=self.depth_num[i], height=hs, width=ws)
            else:
                prev = STAGES[i - 1]
                curr_depth = jax.lax.stop_gradient(outputs[prev]["depth"])
                curr_depth = interpolate_bilinear(
                    curr_depth[..., None].astype(jnp.float32), hs, ws,
                    align_corners=False)[..., 0]
                depth_samples = adaptive_depth_range(
                    depth=curr_depth,
                    interval=self.depth_interval_ratio[i] * depth_base_interval,
                    depth_num=self.depth_num[i])

            gate = self.volume_gates[stage] if self.view_aggregation else None
            outputs[stage] = self._depth_prediction(
                features[stage], intrinsic_matrix[i], cam_to_world,
                depth_samples, self.cost_reg[stage], gate, train)

        # Edge filtering must run AFTER all stages (cva_mvsnet.py:165-177).
        result = {}
        for stage in STAGES:
            depth = outputs[stage]["depth"]
            conf = outputs[stage]["confidence"]
            if depth_filter_discard_percentage is not None:
                fdepth, mask = depth_filter_edges(
                    depth, depth_filter_discard_percentage)
                fconf = jnp.where(mask, 0.0, conf)
                result[stage] = StageOutputs(fdepth, fconf, depth, conf)
            else:
                result[stage] = StageOutputs(depth, conf, depth, conf)
        return Outputs(**result)

    def _depth_prediction(self, features, K, cam_to_world, depth_in, cost_reg,
                          gate: Optional[Any], train: bool):
        """One cascade stage (module.py:1030-1139 semantics).

        :param features: (B, V, H, W, C) stage features, ref view first
        :param K: (B, 3, 3); shared across views (runtime contract)
        :param cam_to_world: (B, V, 4, 4)
        :param depth_in: (B, D, H, W)
        """
        B, V, H, W, C = features.shape
        D = depth_in.shape[1]
        ref_feat = features[:, 0]
        ref_c2w = cam_to_world[:, 0]
        ref_volume = ref_feat[:, None].astype(self.dtype)  # (B, 1, H, W, C)

        # Per-view warps (folding views into one big gather measured ~2x
        # SLOWER — gather throughput drops with table size), per-view gate
        # and accumulation so XLA fuses warp -> diff -> gate -> accum without
        # ever materializing the (B, V-1, D, H, W, C) stack. The reference's
        # torch loop has the same structure (cva_mvsnet.py:76-83); at eval
        # the gate's BatchNorm uses running stats so loop order is
        # numerically irrelevant.
        n_terms = 1 if gate is not None else 2
        acc = [jnp.zeros((B, D, H, W, C), dtype=self.dtype)
               for _ in range(n_terms)]

        for v in range(1, V):
            warped, _ = plane_sweep_warp(
                features[:, v], depth_in, src_K=K,
                src_cam_to_world=cam_to_world[:, v],
                ref_K=K, ref_cam_to_world=ref_c2w)
            terms = self._view_contrib(warped, ref_volume, gate, train)
            acc = [a + t for a, t in zip(acc, terms)]

        volume = self._finalize_volume(acc, ref_volume, float(V),
                                       gated=gate is not None)
        return self._depth_head(volume, depth_in, cost_reg, train)

    def _view_contrib(self, warped, ref_volume, gate, train: bool):
        """One source view's cost-volume contribution (module.py:1060-1090):
        gated -> ((reweight + 1) * diff^2,); variance -> (warped, warped^2).

        Single source of truth shared by the monolithic stage, the per-view
        staged runner (pipeline/mvsnet_runner.py) and the view-sharded
        multi-chip path (parallel/view_shard.py).
        """
        warped = warped.astype(self.dtype)
        if gate is not None:
            diff_sq = (warped - ref_volume) ** 2  # (B, D, H, W, C)
            # Materialize: diff_sq has two consumers (the gate and the
            # accumulation); without a barrier XLA fuses the warp's
            # gather into BOTH and runs it once per consumer (measured
            # 2x at stage 3, experiments/bench_stage_agg.py).
            diff_sq = jax.lax.optimization_barrier(diff_sq)
            return (self._gate_term(diff_sq, gate, train),)
        # Same two-consumer hazard for the variance volume.
        warped = jax.lax.optimization_barrier(warped)
        return (warped, warped ** 2)

    def _gate_term(self, diff_sq, gate, train: bool):
        """Adaptive view-aggregation reweighting of one view's diff^2
        volume: (reweight + 1) * diff^2 (module.py:1075-1082)."""
        reweight = gate(diff_sq, train=train)  # (B, D, H, W)
        return (reweight[..., None] + 1.0) * diff_sq

    def _finalize_volume(self, acc, ref_volume, V, gated: bool):
        """Summed per-view contributions -> cost volume. ``V`` counts ALL
        views incl. the reference (may be a traced scalar on sharded
        paths)."""
        if gated:
            return acc[0] / (V - 1.0)
        vol_sum = ref_volume + acc[0]        # (B,1,...) + (B,D,...)
        vol_sq_sum = ref_volume ** 2 + acc[1]
        return vol_sq_sum / V - (vol_sum / V) ** 2

    def _depth_head(self, volume, depth_in, cost_reg, train: bool):
        """Cost-volume -> (depth, confidence) tail of one cascade stage
        (module.py:1110-1133): 3D U-Net logits, softmax over D, expected
        depth, 4-plane confidence. Split out so the staged runner can run
        it as its own program after per-view warp programs."""
        D = depth_in.shape[1]
        logits = cost_reg(volume, train=train)[..., 0]  # (B, D, H, W)
        prob = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
        depth = jnp.sum(prob * depth_in.astype(jnp.float32), axis=1)  # (B, H, W)

        # Confidence: sum of 4 adjacent depth-plane probabilities at the
        # expected index (module.py:1120-1133).
        prob_pad = jnp.pad(prob, ((0, 0), (1, 2), (0, 0), (0, 0)))
        prob4 = (prob_pad[:, 0:D] + prob_pad[:, 1:D + 1]
                 + prob_pad[:, 2:D + 2] + prob_pad[:, 3:D + 3])
        idx_f = jnp.sum(prob * jnp.arange(D, dtype=jnp.float32)[None, :, None, None],
                        axis=1)
        idx = jnp.clip(idx_f.astype(jnp.int32), 0, D - 1)  # trunc like .long()
        # One-hot reduction instead of take_along_axis: a (B*H*W)-row gather
        # runs at the TPU's ~300M rows/s gather floor, while D extra
        # elementwise passes are bandwidth-cheap for D <= 48.
        onehot = (jnp.arange(D, dtype=jnp.int32)[None, :, None, None]
                  == idx[:, None])
        conf = jnp.sum(jnp.where(onehot, prob4, 0.0), axis=1)
        conf = jax.lax.stop_gradient(conf)

        return {"depth": depth, "confidence": conf}


def outputs_to_dict(outputs: Outputs) -> Dict[str, Dict[str, jnp.ndarray]]:
    return {s: {"depth": getattr(outputs, s).depth,
                "confidence": getattr(outputs, s).confidence}
            for s in STAGES}
