"""View-sharded CVA-MVSNet inference over a device mesh.

The cascade's per-keyframe cost is dominated by per-source-view work
(feature extraction + plane-sweep warp + gated cost accumulation, see
docs/PERF.md); the views are embarrassingly parallel up to ONE psum of
the aggregated cost volume per stage. Sharding the view axis over a
mesh therefore cuts keyframe latency ~V/n on n chips riding ICI — the
TPU-native multi-chip answer to the reference's single-GPU TorchScript
runner (tandem/libdr/dr_mvsnet/src/dr_mvsnet.cpp), which has no
multi-device story at all.

Design — one ``shard_map`` program over mesh axis ``view``:

- views are padded to a multiple of the axis size and carry a validity
  mask, so any (V, n_devices) combination works;
- each device extracts features for its LOCAL views (batched NHWC
  feature-net pass — V/n of the feature cost);
- the reference view's features/pose are broadcast with a masked psum
  (it lives in exactly one shard);
- each device warps + gates its local views into a partial volume; one
  ``psum('view')`` per stage yields the aggregated cost volume;
- the CostRegNet tail + softmax head run replicated (measured ~5% of a
  stage, docs/PERF.md) — outputs are bit-identical on every device, so
  ``out_specs`` are replicated without any final collective.

Inference-only (BatchNorm running stats; loop order is numerically
irrelevant at eval). Training parallelism is the data-parallel mesh in
train/trainer.py; both compose — a ("data", "view") mesh shards batch
and views independently.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_legacy

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_legacy(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_rep=False)

from ..models.cva_mvsnet import STAGES, CvaMVSNet
from ..models.layers import interpolate_bilinear
from ..models.ranges import adaptive_depth_range, uniform_depth_range
from ..ops.warp import plane_sweep_warp


def build_view_sharded_forward(model: CvaMVSNet, mesh: Mesh,
                               axis: str = "view"):
    """Build a jitted view-sharded forward.

    :return: ``fn(variables, image, Ks, c2w, dmin, dmax) -> (depth, conf)``
        with image (B, V, C, H, W), Ks a 3-tuple of (B, 3, 3),
        c2w (B, V, 4, 4) ref-first — the CvaMVSNet.__call__ contract —
        returning the stage-3 dense depth/confidence (B, H, W), replicated
        on every device of the mesh.
    """
    n = mesh.shape[axis]

    def _sharded_body(variables, image, c2w, is_ref, is_src, K1, K2, K3,
                      dmin, dmax):
        # Local shapes: image (B, Vl, C, H, W), c2w (B, Vl, 4, 4),
        # is_ref/is_src (Vl,) float32 one-hot masks of the global layout.
        Ks = {"stage1": K1, "stage2": K2, "stage3": K3}

        def body_m(m: CvaMVSNet, image, c2w, is_ref, is_src, Ks, dmin,
                   dmax):
            B, Vl, C, H, W = image.shape
            img = jnp.transpose(image, (0, 1, 3, 4, 2)).reshape(
                B * Vl, H, W, C).astype(m.dtype)
            feats = m.feature_net(img, train=False)
            feats = {s: f.reshape(B, Vl, *f.shape[1:])
                     for s, f in feats.items()}

            # Broadcast the reference view's features/pose out of the one
            # shard that owns it (masked sum -> psum rides ICI once).
            ref_feats = {}
            for s, f in feats.items():
                loc = jnp.einsum("j,bjhwc->bhwc", is_ref,
                                 f.astype(jnp.float32))
                ref_feats[s] = jax.lax.psum(loc, axis).astype(m.dtype)
            ref_c2w = jax.lax.psum(
                jnp.einsum("j,bjxy->bxy", is_ref, c2w), axis)

            V_real = jax.lax.psum(jnp.sum(is_src), axis) + 1.0

            depth = None
            base_interval = None
            for i, stage in enumerate(STAGES):
                hs, ws = H // m.scale[stage], W // m.scale[stage]
                if i == 0:
                    ds, base_interval = uniform_depth_range(
                        depth_min=dmin, depth_max=dmax,
                        depth_num=m.depth_num[0], height=hs, width=ws)
                else:
                    up = interpolate_bilinear(
                        depth[..., None].astype(jnp.float32), hs, ws,
                        align_corners=False)[..., 0]
                    ds = adaptive_depth_range(
                        depth=up,
                        interval=m.depth_interval_ratio[i] * base_interval,
                        depth_num=m.depth_num[i])

                K = Ks[stage]
                ref_feat = ref_feats[stage]
                ref_vol = ref_feat[:, None].astype(m.dtype)
                D = m.depth_num[i]
                gate = m.volume_gates[stage] if m.view_aggregation else None
                shape = (B, D, hs, ws, ref_feat.shape[-1])

                if gate is not None:
                    part = jnp.zeros(shape, dtype=jnp.float32)
                else:
                    part_sum = jnp.zeros(shape, dtype=jnp.float32)
                    part_sq = jnp.zeros(shape, dtype=jnp.float32)

                for j in range(feats[stage].shape[1]):
                    warped, _ = plane_sweep_warp(
                        feats[stage][:, j], ds, src_K=K,
                        src_cam_to_world=c2w[:, j], ref_K=K,
                        ref_cam_to_world=ref_c2w)
                    warped = warped.astype(m.dtype)
                    w_j = is_src[j]
                    if gate is not None:
                        diff_sq = (warped - ref_vol) ** 2
                        diff_sq = jax.lax.optimization_barrier(diff_sq)
                        rw = gate(diff_sq, train=False)
                        part = part + w_j * ((rw[..., None] + 1.0)
                                             * diff_sq).astype(jnp.float32)
                    else:
                        warped = jax.lax.optimization_barrier(warped)
                        part_sum = part_sum + w_j * warped.astype(
                            jnp.float32)
                        part_sq = part_sq + w_j * (warped.astype(
                            jnp.float32) ** 2)

                if gate is not None:
                    total = jax.lax.psum(part, axis)
                    volume = (total / (V_real - 1.0)).astype(m.dtype)
                else:
                    vsum = (ref_vol.astype(jnp.float32)
                            + jax.lax.psum(part_sum, axis))
                    vsq = (ref_vol.astype(jnp.float32) ** 2
                           + jax.lax.psum(part_sq, axis))
                    volume = (vsq / V_real
                              - (vsum / V_real) ** 2).astype(m.dtype)

                out = m._depth_head(volume, ds, m.cost_reg[stage], False)
                depth = out["depth"]
                conf = out["confidence"]
            return depth, conf

        return model.apply(variables, image, c2w, is_ref, is_src, Ks,
                           dmin, dmax, method=body_m)

    sharded = shard_map(
        _sharded_body, mesh,
        in_specs=(P(), P(None, axis), P(None, axis), P(axis), P(axis),
                  P(), P(), P(), P(), P()),
        out_specs=(P(), P()))

    @jax.jit
    def fn(variables, image, Ks, c2w, dmin, dmax):
        B, V, C, H, W = image.shape
        Vpad = -(-V // n) * n
        pad = Vpad - V
        if pad:
            # Pad with copies of the reference view (real data, so the
            # padded warps stay finite); masked out of the aggregation.
            image = jnp.concatenate(
                [image, jnp.repeat(image[:, :1], pad, axis=1)], axis=1)
            c2w = jnp.concatenate(
                [c2w, jnp.repeat(c2w[:, :1], pad, axis=1)], axis=1)
        is_ref = (jnp.arange(Vpad) == 0).astype(jnp.float32)
        is_src = ((jnp.arange(Vpad) >= 1)
                  & (jnp.arange(Vpad) < V)).astype(jnp.float32)
        return sharded(variables, image, c2w, is_ref, is_src,
                       Ks[0], Ks[1], Ks[2], dmin, dmax)

    return fn
