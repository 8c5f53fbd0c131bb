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

import inspect

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

# The replication-check kwarg was renamed check_rep -> check_vma; pick
# whichever this jax accepts instead of keying off the import location.
_CHECK_KW = ("check_vma" if "check_vma"
             in inspect.signature(_shard_map).parameters else "check_rep")


def shard_map(f, mesh, in_specs, out_specs):
    return _shard_map(f, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, **{_CHECK_KW: False})

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
            if image.dtype == jnp.uint8:
                # Runtime contract (MvsnetRunner): uint8 ships 4x less
                # host->device traffic; normalize on device.
                image = image.astype(jnp.float32) / 255.0
            B, Vl, C, H, W = image.shape
            img = jnp.transpose(image, (0, 1, 3, 4, 2)).reshape(
                B * Vl, H, W, C).astype(m.dtype)
            feats = m.feature_net(img, train=False)
            feats = {s: f.reshape(B, Vl, *f.shape[1:])
                     for s, f in feats.items()}

            # Broadcast the reference view's features/pose out of the one
            # shard that owns it (masked sum -> psum rides ICI once).
            # Elementwise mask-sums, NOT einsum: a contraction would ride
            # the MXU at default precision and round the f32 pose to bf16
            # (the warp pins Precision.HIGHEST for exactly this reason,
            # ops/warp.py).
            ref_feats = {}
            for s, f in feats.items():
                sel = is_ref[None, :, None, None, None].astype(f.dtype)
                ref_feats[s] = jax.lax.psum(
                    jnp.sum(f * sel, axis=1), axis)
            ref_c2w = jax.lax.psum(
                jnp.sum(c2w * is_ref[None, :, None, None], axis=1), axis)

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
                n_terms = 1 if gate is not None else 2
                acc = [jnp.zeros(shape, dtype=m.dtype)
                       for _ in range(n_terms)]

                for j in range(feats[stage].shape[1]):
                    warped, _ = plane_sweep_warp(
                        feats[stage][:, j], ds, src_K=K,
                        src_cam_to_world=c2w[:, j], ref_K=K,
                        ref_cam_to_world=ref_c2w)
                    # Aggregation math shared with the monolithic stage
                    # (cva_mvsnet._view_contrib); padded/ref rows are
                    # zeroed by the is_src mask.
                    terms = m._view_contrib(warped, ref_vol, gate, False)
                    w_j = is_src[j].astype(m.dtype)
                    acc = [a + w_j * t for a, t in zip(acc, terms)]

                # ONE collective per stage; m.dtype (bf16 on the flagship
                # config) halves the ICI bytes vs an f32 reduce.
                acc = [jax.lax.psum(a, axis) for a in acc]
                volume = m._finalize_volume(acc, ref_vol,
                                            V_real.astype(m.dtype),
                                            gated=gate is not None)

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
