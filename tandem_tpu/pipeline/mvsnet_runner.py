"""TPU inference runner for CVA-MVSNet — the dr_mvsnet equivalent.

The reference runs a TorchScript trace on a dedicated worker thread + CUDA
stream with an async CallAsync/GetResult protocol
(tandem/libdr/dr_mvsnet/src/dr_mvsnet.cpp:20-120,285-331). On TPU the runner
is a chain of compiled programs — one cascade jit ("mono"), per-stage jits
("staged"), or per-view warp programs + stage tails ("perview"), all
mathematically identical (the splits exist purely for XLA scheduling, see
docs/PERF.md), plus an optional view-sharded multi-chip forward (``mesh=``).
JAX dispatch is already async, so ``call_async`` just enqueues the chain and
``get_result`` blocks on the transfer — same pipeline semantics, no
thread/stream juggling.

Input packing parity (dr_mvsnet.cpp:180-250):
- views reordered ref-first: [ref, others in original order]
- BGR uint8 -> RGB float/255
- per-stage intrinsics by naive 0.25x/0.5x row scaling (incl. the reference's
  skipped +0.5 correction, see core/camera.py)
- call-order protocol asserts (CallAsync before GetResult,
  dr_mvsnet.cpp:100-107,315-318).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import stage_intrinsics_runtime
from ..models.cva_mvsnet import CvaMVSNet


def init_variables(model: CvaMVSNet, H: int, W: int, view_num: int, seed: int = 0):
    img = jnp.zeros((1, view_num, 3, H, W), jnp.float32)
    Ks = tuple(jnp.broadcast_to(jnp.eye(3) * s, (1, 3, 3))
               for s in (100.0, 200.0, 400.0))
    c2w = jnp.broadcast_to(jnp.eye(4), (1, view_num, 4, 4))
    return model.init(jax.random.PRNGKey(seed), img, Ks, c2w,
                      jnp.full((1,), 0.5), jnp.full((1,), 10.0), train=False)


class MvsnetRunner:
    """Fixed-shape compiled CVA-MVSNet inference with async dispatch."""

    MODES = ("mono", "staged", "perview")

    def __init__(self, model: CvaMVSNet, variables, height: int, width: int,
                 view_num: int = 7, device=None, staged="mono", mesh=None):
        """``staged`` takes a mode string; bools are accepted for
        compatibility (False -> "mono", True -> "staged"). With ``mesh``
        (a jax.sharding.Mesh with a "view" axis) the cascade runs
        view-sharded across the mesh's devices (parallel/view_shard.py)
        under the same CallAsync/GetResult protocol; ``staged`` is then
        ignored (the sharded forward is one program)."""
        mode = {False: "mono", True: "staged"}.get(staged, staged)
        if mode not in self.MODES:
            raise ValueError(f"staged must be one of {self.MODES}, "
                             f"got {staged!r}")
        self.model = model
        self.height, self.width, self.view_num = height, width, view_num
        self.device = device or jax.devices()[0]
        self.variables = (jax.device_put(variables, self.device)
                          if mesh is None else variables)
        self._pending = None
        self._ready = True
        self._staged = mode
        self.mesh = mesh

        def forward(variables, image, Ks, c2w, dmin, dmax):
            if image.dtype == jnp.uint8:
                # Images ship as uint8 (4x less host->device traffic); the
                # [0,1] normalization happens on device.
                image = image.astype(jnp.float32) / 255.0
            out = model.apply(variables, image, Ks, c2w, dmin, dmax,
                              depth_filter_discard_percentage=None,
                              train=False)
            return out.stage3.depth, out.stage3.confidence

        def edge_filter(depth, conf, discard):
            # The edge filter runs as its OWN chained jit: inside the
            # cascade program XLA's scheduling made the same ops ~10x more
            # expensive (60 ms vs 5 ms measured); two async dispatches cost
            # nothing and the composition is mathematically identical
            # (filtering is a pure post-pass, cva_mvsnet.py:165-177).
            from ..models.edge_filter import depth_filter_edges
            fd, mask = depth_filter_edges(depth, discard)
            return fd, jnp.where(mask, 0.0, conf)

        if mesh is not None:
            from ..parallel import build_view_sharded_forward
            self._forward = build_view_sharded_forward(model, mesh)
        elif mode == "mono":
            self._forward = jax.jit(forward)
        else:
            self._forward = self._build_staged(
                model, split_views=(mode == "perview"))
        self._edge_filter = jax.jit(edge_filter)

    def _build_staged(self, model: CvaMVSNet, split_views: bool = False):
        """Cascade as chained per-stage jits (feature net | stage i | ...).

        Mathematically identical to the monolithic forward (asserted per
        stage in experiments/bench_staged_runner.py and tests); gives XLA
        smaller programs to schedule and makes per-stage measurements
        transfer. JAX dispatch is async, so the chain costs no host
        round-trips.

        With ``split_views`` each source view's warp + diff^2 runs as its
        OWN program feeding a gate+U-Net tail program: per-view warps
        measured at the composition floor (7.1 ms stage-2) while the
        monolithic stage never schedules below ~10.4/view — the
        "cut at materialization points" lesson applied inside the stage.
        """
        from functools import partial

        from ..models.cva_mvsnet import STAGES
        from ..models.layers import interpolate_bilinear
        from ..models.ranges import adaptive_depth_range, uniform_depth_range

        H, W = self.height, self.width

        def feats_m(m, image):
            if image.dtype == jnp.uint8:
                image = image.astype(jnp.float32) / 255.0
            B, V, C, Hh, Ww = image.shape
            img = jnp.transpose(image, (0, 1, 3, 4, 2)).reshape(
                B * V, Hh, Ww, C).astype(m.dtype)
            f = m.feature_net(img, train=False)
            return tuple(f[s].reshape(B, V, *f[s].shape[1:])
                         for s in STAGES)

        feats_j = jax.jit(
            lambda v, img: self.model.apply(v, img, method=feats_m))

        def stage_m(m, feat, K, c2w, ds, i):
            s = STAGES[i]
            gate = m.volume_gates[s] if m.view_aggregation else None
            out = m._depth_prediction(feat, K, c2w, ds, m.cost_reg[s],
                                      gate, False)
            return out["depth"], out["confidence"]

        if split_views:
            from ..ops.warp import plane_sweep_warp

            @jax.jit
            def warp_dsq(feat_v, ref_feat, ds, K, c2w_v, c2w_ref):
                warped, _ = plane_sweep_warp(
                    feat_v, ds, src_K=K, src_cam_to_world=c2w_v,
                    ref_K=K, ref_cam_to_world=c2w_ref, materialize="none")
                warped = warped.astype(model.dtype)
                return (warped - ref_feat[:, None].astype(model.dtype)) ** 2

            @jax.jit
            def warp_only(feat_v, ds, K, c2w_v, c2w_ref):
                warped, _ = plane_sweep_warp(
                    feat_v, ds, src_K=K, src_cam_to_world=c2w_v,
                    ref_K=K, ref_cam_to_world=c2w_ref, materialize="none")
                return warped.astype(model.dtype)

            def tail_m(m, parts, ref_feat, ds, i):
                # Aggregation math lives on CvaMVSNet (_gate_term /
                # _finalize_volume) so the three runtime modes can never
                # drift apart.
                s = STAGES[i]
                V = len(parts) + 1
                ref_vol = ref_feat[:, None].astype(m.dtype)
                if m.view_aggregation:
                    gate = m.volume_gates[s]
                    acc = [sum(m._gate_term(dsq, gate, False)
                               for dsq in parts)]
                else:
                    acc = [sum(parts), sum(w ** 2 for w in parts)]
                volume = m._finalize_volume(acc, ref_vol, float(V),
                                            gated=m.view_aggregation)
                out = m._depth_head(volume, ds, m.cost_reg[s], False)
                return out["depth"], out["confidence"]

            def make_stage(i):
                tail_j = jax.jit(partial(
                    lambda v, parts, rf, ds, i: self.model.apply(
                        v, parts, rf, ds, i,
                        method=lambda m, parts, rf, ds, i: tail_m(
                            m, parts, rf, ds, i)), i=i))

                def stage(variables, feat, K, c2w, ds):
                    Vn = feat.shape[1]
                    ref_feat = feat[:, 0]
                    if model.view_aggregation:
                        parts = tuple(
                            warp_dsq(feat[:, v], ref_feat, ds, K,
                                     c2w[:, v], c2w[:, 0])
                            for v in range(1, Vn))
                    else:
                        parts = tuple(
                            warp_only(feat[:, v], ds, K, c2w[:, v],
                                      c2w[:, 0])
                            for v in range(1, Vn))
                    return tail_j(variables, parts, ref_feat, ds)
                return stage

            stage_js = [make_stage(i) for i in range(3)]
        else:
            stage_js = [
                jax.jit(partial(
                    lambda v, f, K, c2w, ds, i: self.model.apply(
                        v, f, K, c2w, ds, i,
                        method=lambda m, f, K, c2w, ds, i: stage_m(
                            m, f, K, c2w, ds, i)), i=i))
                for i in range(3)
            ]

        @jax.jit
        def range1(dmin, dmax):
            return uniform_depth_range(
                depth_min=dmin, depth_max=dmax,
                depth_num=model.depth_num[0], height=H // 4, width=W // 4)

        def make_rangeN(i, hs, ws):
            @jax.jit
            def rangeN(prev_depth, base_interval):
                up = interpolate_bilinear(
                    prev_depth[..., None].astype(jnp.float32), hs, ws,
                    align_corners=False)[..., 0]
                return adaptive_depth_range(
                    depth=up,
                    interval=model.depth_interval_ratio[i] * base_interval,
                    depth_num=model.depth_num[i])
            return rangeN

        range2 = make_rangeN(1, H // 2, W // 2)
        range3 = make_rangeN(2, H, W)

        def staged_forward(variables, image, Ks, c2w, dmin, dmax):
            f1, f2, f3 = feats_j(variables, image)
            ds1, base = range1(dmin, dmax)
            d1, _ = stage_js[0](variables, f1, Ks[0], c2w, ds1)
            ds2 = range2(d1, base)
            d2, _ = stage_js[1](variables, f2, Ks[1], c2w, ds2)
            ds3 = range3(d2, base)
            return stage_js[2](variables, f3, Ks[2], c2w, ds3)

        return staged_forward

    # --- packing ---------------------------------------------------------
    @staticmethod
    def reorder_ref_first(items: Sequence, ref_index: int) -> list:
        return [items[ref_index]] + [x for i, x in enumerate(items)
                                     if i != ref_index]

    def pack_inputs(self, bgrs: Sequence[np.ndarray],
                    cam_to_worlds: Sequence[np.ndarray], K: np.ndarray,
                    ref_index: Optional[int] = None):
        """bgrs: V arrays (H, W, 3) uint8 BGR; cam_to_worlds: V (4, 4)."""
        V = len(bgrs)
        assert V == self.view_num
        ref_index = self.view_num - 2 if ref_index is None else ref_index
        bgrs = self.reorder_ref_first(list(bgrs), ref_index)
        poses = self.reorder_ref_first(list(cam_to_worlds), ref_index)
        from ..native_bridge import bgr_pack_u8
        image = bgr_pack_u8(bgrs)[None]  # (1, V, 3, H, W) u8
        K1, K2, K3 = stage_intrinsics_runtime(np.asarray(K, np.float32))
        Ks = tuple(k[None] for k in (K1, K2, K3))
        c2w = np.stack(poses)[None].astype(np.float32)
        return image, Ks, c2w

    # --- async protocol --------------------------------------------------
    def ready(self) -> bool:
        return self._ready

    def device_ready(self) -> bool:
        """True when the pending dispatch (if any) has FINISHED on the
        device, i.e. get_result() would return without blocking. This is the
        occupancy signal behind the reference's Ready() (dr_mvsnet worker
        idle, dr_mvsnet.cpp:100-107) that drives real-time keyframe drops."""
        if self._pending is None:
            return True
        try:
            return all(x.is_ready()
                       for x in jax.tree_util.tree_leaves(self._pending))
        except AttributeError:   # non-jax leaves (already-fetched numpy)
            return True

    def call_async(self, bgrs, cam_to_worlds, K, depth_min: float,
                   depth_max: float, discard_percentage: float = 10.0,
                   ref_index: Optional[int] = None):
        assert self._ready, "CallAsync called before previous GetResult"
        self._ready = False
        image, Ks, c2w = self.pack_inputs(bgrs, cam_to_worlds, K, ref_index)
        args = (jnp.asarray(image), tuple(jnp.asarray(k) for k in Ks),
                jnp.asarray(c2w), jnp.full((1,), depth_min, jnp.float32),
                jnp.full((1,), depth_max, jnp.float32),
                jnp.full((1,), discard_percentage, jnp.float32))
        # Mesh mode: the sharded jit places/distributes inputs itself.
        dev_args = (args if self.mesh is not None
                    else jax.device_put(args, self.device))
        disc = dev_args[-1]
        depth, conf = self._forward(self.variables, *dev_args[:-1])
        fdepth, fconf = self._edge_filter(depth, conf, disc)
        self._pending = (fdepth, fconf, depth, conf)

    def get_result(self, device: bool = False):
        """Blocks until the pending computation finishes; returns stage3
        depth/confidence (+ dense variants). With device=True the arrays stay
        on device (the TSDF consumer is jitted — avoids a download+reupload
        round trip)."""
        assert not self._ready, "GetResult called before CallAsync"
        fdepth, fconf, depth, conf = self._pending
        conv = (lambda x: x) if device else np.asarray
        result = {
            "depth": conv(fdepth[0]),
            "confidence": conv(fconf[0]),
            "depth_dense": conv(depth[0]),
            "confidence_dense": conv(conf[0]),
        }
        self._pending = None
        self._ready = True
        return result

    def wait(self):
        if self._pending is not None:
            jax.block_until_ready(self._pending)


class StablehloRunner(MvsnetRunner):
    """MvsnetRunner protocol served from a model.stablehlo unit alone.

    The reference runtime deploys with ONLY the TorchScript model.pt
    (dr_mvsnet.cpp loads it directly); this is the same deal for the
    StableHLO deployable written by tandem_export: weights are baked
    into the serialized module, so no variables pickle or model code is
    needed. Shapes are fixed at export time — the runner asserts the
    deployment resolution matches.
    """

    def __init__(self, path: str, height: int, width: int,
                 view_num: int = 7, device=None,
                 discard_percentage: float = 10.0):
        from jax import export as jexport

        with open(path, "rb") as f:
            self._exp = jexport.deserialize(f.read())
        im_shape = self._exp.in_avals[0].shape      # (1, V, 3, H, W)
        assert im_shape[1] == view_num and im_shape[3:] == (height, width), \
            f"unit exported for {im_shape}, asked (1,{view_num},3," \
            f"{height},{width})"
        self.height, self.width, self.view_num = height, width, view_num
        self.device = device  # placement is the deserialized module's
        self.model = None
        self.variables = None
        self.mesh = None
        self._staged = "stablehlo"
        self._pending = None
        self._ready = True

    def call_async(self, bgrs, cam_to_worlds, K, depth_min: float,
                   depth_max: float, discard_percentage: float = 10.0,
                   ref_index=None):
        import jax.numpy as jnp

        assert self._ready, "CallAsync called before previous GetResult"
        self._ready = False
        image, Ks, c2w = self.pack_inputs(bgrs, cam_to_worlds, K, ref_index)
        out = self._exp.call(
            jnp.asarray(image.astype(np.float32) / 255.0),
            jnp.asarray(Ks[0]), jnp.asarray(Ks[1]), jnp.asarray(Ks[2]),
            jnp.asarray(c2w), jnp.full((1,), depth_min, jnp.float32),
            jnp.full((1,), depth_max, jnp.float32),
            jnp.full((1,), discard_percentage, jnp.float32))
        fdepth, fconf, depth, conf = out
        self._pending = (fdepth, fconf, depth, conf)
