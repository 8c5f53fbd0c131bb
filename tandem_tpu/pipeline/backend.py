"""TANDEM backend: MVSNet -> TSDF integrate -> render lookahead pipeline.

Parity target: tandem/src/tandem/tandem_backend.{h,cpp}. The reference runs a
worker thread that, for call N, launches MVSNet(N) asynchronously and then
processes call N-1's results: integrate depth into the TSDF, render a depth
map at the next tracking reference pose, copy it into a double-buffered
``TandemCoarseTrackingDepthMap`` (A/B swap under a mutex,
tandem_backend.cpp:93-96,183-190), and periodically extract a mesh.

On TPU the device work (MVSNet forward, TSDF integrate, raycast) is async XLA
dispatch on one stream, so the same one-keyframe lookahead emerges from
ordering the dispatches; the worker thread remains for host-side work and to
preserve the Ready/Wait drop semantics of the real-time mode
(FullSystem.cpp:1144-1151).
"""

from __future__ import annotations

import threading
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..mapping.tsdf import (TsdfConfig, allocate_blocks, create_volume,
                            grow_volume, integrate, integrate_culled,
                            raycast, render_depth_splat, surface_axis_slots,
                            visible_slots)
from ..mapping.mesh import extract_mesh
from ..utils.timer import Timer


class TrackingDepthMap:
    """Double-buffered rendered depth handed to the coarse tracker
    (TandemCoarseTrackingDepthMap A/B swap)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._buf = [None, None]   # dicts: {'depth', 'c2w', 'valid'}
        self._read_idx = 0

    def write(self, depth: np.ndarray, c2w: np.ndarray):
        with self._lock:
            widx = 1 - self._read_idx
            self._buf[widx] = {"depth": depth, "c2w": c2w, "valid": True}
            self._read_idx = widx

    def read(self) -> Optional[dict]:
        with self._lock:
            return self._buf[self._read_idx]


class TandemBackend:
    """One-keyframe-lookahead orchestrator."""

    def __init__(self, mvsnet_runner, tsdf_cfg: TsdfConfig, K: np.ndarray,
                 height: int, width: int, mesh_extraction_freq: int = 10,
                 timer: Optional[Timer] = None,
                 mesh_callback: Optional[Callable] = None):
        self.runner = mvsnet_runner
        self.cfg = tsdf_cfg
        self.K = np.asarray(K, np.float32)
        self.H, self.W = height, width
        self.mesh_freq = mesh_extraction_freq
        self.mesh_callback = mesh_callback
        self.timer = timer or Timer(enabled=False)

        self.volume = create_volume(tsdf_cfg)
        self.depth_map = TrackingDepthMap()
        self.output_wrappers = []
        self.call_num = 0
        self._prev: Optional[dict] = None  # previous call's context
        self.last_mesh = None
        self._n_alloc = 0
        self._n_drop_seen = 0     # pool-full allocation drops already handled
        self._pool_warned = False

    def ready(self) -> bool:
        """Reference Ready() parity (tandem_backend.cpp:285-287): the backend
        can accept a new call without blocking. True when there is no
        outstanding call, or the outstanding MVSNet dispatch has finished on
        the device (call() would then complete its get_result immediately).
        FullSystem DROPS the keyframe in real-time mode when this is False
        (FullSystem.cpp:1144-1151) and waits in linearize mode."""
        if self._prev is None:
            return True
        probe = getattr(self.runner, "device_ready", self.runner.ready)
        return probe()

    def call(self, bgrs, cam_to_worlds, depth_min: float, depth_max: float,
             next_ref_c2w: np.ndarray, discard_percentage: float = 10.0):
        """Process one keyframe window (CallSequential semantics,
        tandem_backend.cpp:137-217): finish call N-1, then launch call N."""
        tid = self.timer.start_timing("backend_call")

        # --- finish previous call -------------------------------------
        if self._prev is not None:
            res = self.runner.get_result(device=True)  # overlapped with VO
            ref_c2w = self._prev["ref_c2w"]
            ref_bgr = self._prev["ref_bgr"]
            depth = jnp.asarray(res["depth"])
            rgb = jnp.asarray(ref_bgr[..., ::-1].astype(np.float32))

            Kj = jnp.asarray(self.K)
            pose = jnp.asarray(ref_c2w)
            self.volume = allocate_blocks(self.cfg, self.volume, depth, Kj,
                                          pose)
            # One bundled sync per keyframe: fetch both host-side chunk
            # counts for the integrate/render loops in a single device_get
            # (two sequential int() fetches would block on two dispatch
            # chains).
            pose_r = jnp.asarray(next_ref_c2w)
            slots, n_vis = visible_slots(self.cfg, self.volume, Kj, pose,
                                         self.H, self.W)
            n_alloc, n_vis, n_drop = jax.device_get(
                (self.volume.n_allocated, n_vis, self.volume.n_dropped))
            # Pool-exhaustion handling: the reference commits 10^6 blocks and
            # KERNEL_ABORTs when the heap runs dry (heap.cu:16-18); here the
            # pool DOUBLES on demand (slots are stable, growth is padding)
            # and allocate_blocks is idempotent, so re-running it on the same
            # scan picks up exactly the dropped blocks. At pool_max we warn
            # once and keep fusing what fits (allocation saturates).
            while int(n_drop) > self._n_drop_seen:
                self._n_drop_seen = int(n_drop)
                if self.cfg.pool_size >= self.cfg.pool_max:
                    if not self._pool_warned:
                        print(f"TSDF pool exhausted at pool_max="
                              f"{self.cfg.pool_max} blocks; new surface "
                              f"will not be fused (reference aborts here, "
                              f"heap.cu:16-18).")
                        self._pool_warned = True
                    break
                self.cfg, self.volume = grow_volume(self.cfg, self.volume)
                self.volume = allocate_blocks(self.cfg, self.volume, depth,
                                              Kj, pose)
                slots, n_vis = visible_slots(self.cfg, self.volume, Kj,
                                             pose, self.H, self.W)
                n_alloc, n_vis, n_drop = jax.device_get(
                    (self.volume.n_allocated, n_vis,
                     self.volume.n_dropped))
            self._n_alloc = int(n_alloc)
            n_vis = int(n_vis)
            # Integrate, then render from the next tracking reference pose
            # as two chunked passes. NOTE: fusing both into one chunk
            # program (sharing the slicing + voxel coords) measured SLOWER
            # on the v5e (37.6 vs 34.9 ms) — XLA schedules the combined
            # program worse than the parts (same lesson as the edge-filter
            # split, docs/PERF.md "fusion-boundary") — so the split stays.
            # Frustum-culled integrate: device cost scales with the VISIBLE
            # surface, not everything ever allocated (the reference's
            # per-hash-entry frustum early-out, tsdf_volume.cu:436-).
            # ADAPTIVE: when most of the map is in view the contiguous
            # full-pool walk wins — the culled path's slot indirection
            # (gather+scatter of block rows instead of dynamic slices)
            # costs ~2x per block (experiments/bench_fusion_breakdown.py
            # r5: culled 17.2 ms vs full 8.3 at 100% visibility) — both
            # are exact (culled==full contract, test_tsdf).
            # Crossover from the round-5 one-launch numbers: culled pays
            # ~2.8 us/block (slot gather + scatter-back) vs the contiguous
            # walk's ~1.35 us/block -> culled wins under ~0.5 visibility.
            if n_vis >= 0.5 * self._n_alloc:
                self.volume = integrate(self.cfg, self.volume, depth, rgb,
                                        Kj, pose, n_allocated=self._n_alloc)
            else:
                self.volume = integrate_culled(self.cfg, self.volume, depth,
                                               rgb, Kj, pose, slots, n_vis)
            # Render cull runs AFTER integrate (the surface flags read the
            # fused sdf — this keyframe's fresh surface must splat). The
            # per-axis surface cull cuts candidate math + scatter rows ~3x
            # vs the frustum-only cull; the second (tiny) count fetch rides
            # the backend thread, overlapped with VO.
            n_pad = -(-max(self._n_alloc, 1) // 2048) * 2048
            ax_slots, ax_counts = surface_axis_slots(
                self.cfg, self.volume, Kj, pose_r, self.H, self.W, n_pad)
            ax_counts = [int(c) for c in jax.device_get(ax_counts)]
            rdepth = render_depth_splat(self.cfg, self.volume, Kj, pose_r,
                                        self.H, self.W,
                                        n_allocated=self._n_alloc,
                                        axis_slots=ax_slots,
                                        axis_counts=ax_counts)
            # Keep the rendered depth device-resident: its only consumer is
            # the (jitted) splat into the next tracking reference.
            self.depth_map.write(rdepth, np.asarray(next_ref_c2w))

            if self.mesh_freq > 0 and self.call_num % self.mesh_freq == 0:
                self.last_mesh = extract_mesh(self.cfg, self.volume)
                if self.mesh_callback:
                    self.mesh_callback(*self.last_mesh)
                for ow in self.output_wrappers:
                    ow.push_dr_mesh(*self.last_mesh)
            self._prev_result = res
            for ow in self.output_wrappers:
                ow.push_dr_kf_image(ref_bgr)
                ow.push_dr_kf_depth(res["depth"], res["confidence"])

        # --- launch current call --------------------------------------
        ref_index = self.runner.view_num - 2
        self.runner.call_async(bgrs, cam_to_worlds, self.K, depth_min,
                               depth_max, discard_percentage)
        self._prev = {"ref_c2w": np.asarray(cam_to_worlds[ref_index]),
                      "ref_bgr": np.asarray(bgrs[ref_index])}
        self.call_num += 1
        self.timer.end_timing("backend_call", tid)

    def stats(self) -> dict:
        """Volume occupancy counters (host-cached — no device sync)."""
        return {"n_allocated": self._n_alloc,
                "pool_size": self.cfg.pool_size,
                "pool_max": self.cfg.pool_max,
                "n_dropped": self._n_drop_seen,
                "call_num": self.call_num}

    def get_tracking_depth_map(self) -> Optional[dict]:
        return self.depth_map.read()

    def extract_mesh_now(self):
        """Extract the current global mesh (the runtime also saves mesh.obj
        at shutdown, main_tandem_pangolin.cpp:296-303)."""
        self.last_mesh = extract_mesh(self.cfg, self.volume)
        if self.mesh_callback:
            self.mesh_callback(*self.last_mesh)
        return self.last_mesh

    def wait(self):
        self.runner.wait()
