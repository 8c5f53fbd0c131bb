"""FullSystem: the per-frame tracking + mapping pipeline hub.

Parity target: tandem/src/FullSystem/FullSystem.{h,cpp} — addActiveFrame
(track thread), keyframe creation with windowed BA, marginalization, immature
point lifecycle, and the TANDEM backend hookup (deliverDrFrame,
FullSystem.cpp:1122-1198). Host-side orchestration in Python; every hot step
(coarse tracking, tracing, activation, BA, MVSNet, TSDF) is a jitted
fixed-shape device computation.

Simplifications vs DSO (documented for later parity work):
- In TANDEM mode, keyframe points can be seeded directly from the MVSNet
  depth map (the reference seeds immature points from gtDepth in RGB-D mode,
  FullSystem makeNewTraces; MVS depth plays that role here).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..tracking.ba import (BAState, PATTERN, _bilinear, ba_iterate,
                           create_ba_state, marginalize_frame,
                           remove_outliers)
from ..tracking.coarse_tracker import (make_tracker_ref, splat_depth_to_ref,
                                       track_frame)
from ..tracking.immature import (ImmaturePoints, activate_points,
                                 make_immature, trace_points, STATUS_GOOD)
from ..tracking.initializer import initializer_track, make_initializer
from ..tracking.point_selection import select_pixels
from ..utils.timer import Timer
from .io import write_poses_mat, write_result_tum


def reference_idepth_quantile(idepth: np.ndarray, fraction: float) -> float:
    """Exact get_idepth_quantile arithmetic (tandem_backend.cpp:354-361):
    nth_element the idepths ASCENDING and return the element at index
    int(fraction * n).  The caller reciprocates it — fraction=0.2 therefore
    selects a far point (small idepth) and 1/q is a large depth (~P80)."""
    idv = np.asarray(idepth, dtype=np.float32)
    k = int(fraction * float(len(idv)))
    k = min(max(k, 0), len(idv) - 1)
    return float(np.partition(idv, k)[k])


def _np_rigid_inverse(T: np.ndarray) -> np.ndarray:
    """Host-side 4x4 rigid-transform inverse. Pure numpy on purpose: eager
    JAX ops pulled to numpy flip remote backends into a slow per-dispatch
    mode (measured ~50 ms/dispatch afterwards on the axon tunnel)."""
    R = T[:3, :3]
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = R.T
    out[:3, 3] = -R.T @ T[:3, 3]
    return out


@dataclasses.dataclass
class FullSystemOptions:
    max_keyframes: int = 7            # setting_maxFrames
    min_frames: int = 5               # setting_minFrames
    min_frame_age: int = 1            # setting_minFrameAge
    num_point_slots: int = 2048
    # Keyframe decision weights (FullSystem.cpp:1038-1058; defaults from
    # settings.cpp:37-41). The shift weights keep the reference's hardcoded
    # 640+480 scale; the decision divides by the ACTUAL w+h like wG[0]+hG[0].
    kf_global_weight: float = 1.0         # setting_kfGlobalWeight
    max_shift_weight_t: float = 0.04 * (640 + 480)
    max_shift_weight_r: float = 0.0 * (640 + 480)
    max_shift_weight_rt: float = 0.02 * (640 + 480)
    max_affine_weight: float = 2.0        # setting_maxAffineWeight
    keyframes_per_second: float = 0.0     # setting_keyframesPerSecond
    ba_iters: int = 6                 # setting_maxOptIterations
    immature_cap: int = 512
    selection_threshold_factor: float = 1.0
    init_min_good_frac: float = 0.5
    init_max_width: float = 0.25
    mvs_view_num: int = 7
    mvs_discard_percentage: float = 10.0  # setting_mvsnet_discard_percentage
    tracking_step: int = 3            # setting_tracking_step dense stride
    rgbd: bool = False                # RGB-D mode (rgbd_flag)
    dense_tracking: bool = True       # tracking=dense vs sparse
    # linearizeOperation (playbackSpeed == 0): a busy backend is WAITED for;
    # real-time mode DROPS the keyframe instead (FullSystem.cpp:1144-1151).
    linearize: bool = True
    # Debug observability (setting_logStuff logs/*.txt dumps,
    # FullSystem.cpp:78-121; debugSaveDepthImages per-frame u16 depth PNGs,
    # settings.h:219-222). Both off by default like the reference.
    log_stuff: bool = False
    log_dir: str = "logs"
    debug_save_depth_images: bool = False
    depth_save_folder: str = "depths"


def make_full_system_options(s) -> "FullSystemOptions":
    """Map runtime Settings onto FullSystemOptions. Every DSO knob that
    affects window content or the keyframe policy flows through here
    (commandline.cpp parity — nothing the presets set is hardcoded
    downstream). Density knobs become the fixed array capacities the jitted
    programs compile against, rounded up to a multiple of 256 so shapes stay
    TPU-tile friendly (1500 -> 1536 immature candidates, 2000 -> 2048 point
    slots — the reference treats these as soft targets too)."""
    def cap(x):
        return -(-int(x) // 256) * 256

    return FullSystemOptions(
        max_keyframes=s.max_frames,
        min_frames=s.min_frames,
        min_frame_age=s.min_frame_age,
        num_point_slots=cap(s.desired_point_density),
        kf_global_weight=s.kf_global_weight,
        keyframes_per_second=s.keyframes_per_second,
        ba_iters=s.max_opt_iterations,
        immature_cap=cap(s.desired_immature_density),
        mvs_view_num=s.dr_mvsnet_view_num,
        mvs_discard_percentage=s.mvsnet_discard_percentage,
        tracking_step=s.tracking_step,
        rgbd=s.rgbd,
        dense_tracking=(s.tracking_type == "dense"),
        linearize=(s.playback_speed == 0),
        log_stuff=s.log_stuff,
        log_dir=os.path.join(s.result_folder, "logs"),
        debug_save_depth_images=s.debug_save_depth_images,
        depth_save_folder=(s.depth_save_folder
                           or os.path.join(s.result_folder, "depths")))


class Keyframe:
    def __init__(self, frame_id, timestamp, image, c2w):
        self.frame_id = frame_id
        self.timestamp = timestamp
        self.image = image          # jnp (H, W)
        self.c2w = np.asarray(c2w)
        self.slot: Optional[int] = None
        self.kf_id: int = -1        # keyframe index (DSO FrameHessian::frameID)
        self.immature: Optional[ImmaturePoints] = None
        self.n_immature: int = 0    # host count at creation (padding excluded)
        self.n_points_total: int = 0  # BA points ever inserted for this KF
        self.bgr: Optional[np.ndarray] = None
        self.sensor_depth: Optional[np.ndarray] = None  # RGB-D mode


class FullSystem:
    def __init__(self, fx, fy, cx, cy, height, width,
                 options: FullSystemOptions = None, backend=None,
                 timer: Timer = None, outputs=None):
        self.K = (float(fx), float(fy), float(cx), float(cy))
        self.K_mat = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]],
                              np.float32)
        self.H, self.W = height, width
        self.opt = options or FullSystemOptions()
        self.backend = backend
        self.timer = timer or Timer(enabled=False)
        self.outputs = outputs or []  # Output3DWrapper sinks

        F = self.opt.max_keyframes + 1
        self.ba_state = create_ba_state(F, self.opt.num_point_slots)
        # Device-resident: re-uploading 8 full-res images per keyframe costs
        # hundreds of ms through a slow host<->device link.
        self.slot_images = jnp.zeros((F, height, width), jnp.float32)
        self.kf_of_slot: List[Optional[Keyframe]] = [None] * F

        self.keyframes: List[Keyframe] = []
        self.all_poses: List[np.ndarray] = []   # per-frame c2w
        self.all_ids: List[int] = []
        self.all_ts: List[float] = []

        self.tracker_ref = None
        self.ref_kf: Optional[Keyframe] = None
        self.last_c2w = np.eye(4, dtype=np.float32)
        self.prev_c2w = np.eye(4, dtype=np.float32)
        self.initialized = False
        self.is_lost = False
        self.init_failed = False
        self.init_frames = 0
        self.init_state = None            # CoarseInitializer state
        self._last_energy: Optional[float] = None
        self._first_coarse_rmse: Optional[float] = None  # firstCoarseRMSE
        # lastCoarseRMSE (FullSystem.h:320, init 100 FullSystem.cpp:154):
        # the PREVIOUS frame's achieved residual — the retry-ladder gate
        # compares against THIS (energy < 1.5 x last, FullSystem.cpp:605),
        # NOT against firstCoarseRMSE (which only drives the KF decision,
        # :1056). Persists across tracking-ref changes.
        self._last_coarse_rmse: float = 100.0
        self.n_dropped_kf = 0   # real-time mode backend drops
        self.n_retracks = 0     # multi-hypothesis retry ladder firings
        self.windows: List[List[int]] = []

        # setting_logStuff observability (FullSystem.cpp:78-121)
        self.logger = None
        if self.opt.log_stuff:
            from ..utils.dso_log import DsoLogger
            self.logger = DsoLogger(self.opt.log_dir,
                                    self.opt.max_keyframes)
        # Cumulative statistics_* counters (FullSystem.h / printLogLine)
        self._stat_created = 0
        self._stat_activated = 0
        self._stat_dropped = 0
        # Per-frame lifetime records: frame_id -> [marginalized_at, moved]
        self._lifetimes: dict = {}

    # ------------------------------------------------------------------
    def add_active_frame(self, gray: np.ndarray, frame_id: int,
                         timestamp: float = None, bgr: np.ndarray = None,
                         depth: np.ndarray = None):
        """:param depth: optional sensor depth (RGB-D mode: rgbd_flag,
        CoarseRGBDInitializer + gt-depth point seeding semantics)."""
        timestamp = float(frame_id) if timestamp is None else timestamp
        # Transport-aware upload: the host<->device link is the scarce
        # resource (~23 MB/s through the axon tunnel; docs/PERF.md round 4).
        # A 640x480 f32 gray costs ~80 ms upstream; the same frame as uint8
        # is ~13 ms and upcasting on device is free (fused into the first
        # consumer). The reader returns uint8 whenever the photometric
        # calibration is identity, so values are bit-identical either way.
        if gray.dtype == np.uint8:
            img = _u8_to_f32(jnp.asarray(gray))
        else:
            img = jnp.asarray(gray.astype(np.float32))
        self._current_depth = depth

        if not self.keyframes:
            if self.opt.rgbd and depth is not None:
                self._first_frame_rgbd(img, frame_id, timestamp, bgr, depth)
            else:
                self._first_frame(img, frame_id, timestamp, bgr)
            return

        if not self.initialized:
            self._initializer_step(img, frame_id, timestamp, bgr)
            return

        tid = self.timer.start_timing("track_frame")
        T_init = self._motion_model()
        # RGB-D mode tracks with the full dvo-core DenseTracker (bivariate
        # intensity+depth residual, multivariate-t IRLS) on pyramid level 1,
        # then evaluates DSO residual stats at the fixed pose — exactly
        # trackNewestCoarseDense (CoarseTracker.cpp:939-964: dvo match at
        # on_level=1 followed by one calcRes(0)). Monocular uses DSO's
        # coarse-to-fine Huber+cutoff LM.
        dvo_tracked = False
        if (self.opt.rgbd and depth is not None
                and getattr(self, "_dvo_ref", None) is not None):
            from ..tracking.coarse_tracker import calc_res_eval
            from ..tracking.dvo import build_rgbd_pyramid, dense_match
            cur_pyr = build_rgbd_pyramid(
                img, jnp.asarray(depth.astype(np.float32)),
                *self.K, num_levels=2)
            m = dense_match(self._dvo_ref, cur_pyr,
                            jnp.asarray(T_init), on_level=1)
            out = jax.device_get(calc_res_eval(
                self.tracker_ref, img, m["T"], jnp.array([1.0, 0.0])))
            dvo_tracked = np.isfinite(out["energy"]) and float(m["n"]) >= 6
        if not dvo_tracked:
            out = jax.device_get(track_frame(
                self.tracker_ref, img, jnp.asarray(T_init),
                jnp.array([1.0, 0.0]),
                self.opt.rgbd))  # one bundled device->host transfer
        energy = float(out["energy"])

        # Multi-hypothesis re-tracking (trackNewCoarse retry ladder,
        # FullSystem.cpp:449-529): triggered not just on outright failure
        # but whenever the achieved energy exceeds setting_reTrackThreshold
        # (1.5) x lastCoarseRMSE — the PREVIOUS frame's achieved residual
        # (FullSystem.cpp:605,617), a slowly-varying reference that follows
        # legitimate appearance change. This is what breaks motion-model
        # lock-in: one bad pose makes the constant-velocity prediction bad
        # for the NEXT frame, which converges into an offset local minimum
        # with a plausible (but elevated vs the last frame) energy, and
        # without the 1.5x gate the tracker oscillates between two
        # attractors indefinitely (observed as a period-2 ~3 cm pose zigzag
        # on the trajectory fixture). Gating on firstCoarseRMSE instead (a
        # round-4 interim fix) pinned the bar to the first frame tracked on
        # each reference and spuriously re-tracked >50% of frames once the
        # dense feedback loop was on (124 ms/firing, bench_runtime).
        bad = (not np.isfinite(energy)
               or float(out["valid_frac"]) < 0.3
               or energy > 1.5 * self._last_coarse_rmse)
        if bad:
            self.n_retracks += 1
            t_retry = self.timer.start_timing("track_retry")
            from ..tracking.coarse_tracker import (rotation_perturbations,
                                                   track_frame_multi)
            # DSO's candidate order: const motion (= T_init), double, half,
            # zero motion (stay at the last pose), zero motion from the KF,
            # then the 26 rotation perturbations on const motion. DSO stops
            # at the first candidate whose achieved energy passes the gate
            # (trackNewCoarse break) — staged here as two batched device
            # calls: the 5 motion candidates resolve most retries, and the
            # 26-rotation sweep (5x the compute) only runs when they don't.
            cands = [T_init]
            if len(self.all_poses) >= 2:
                import cv2
                rel = self.last_c2w @ _np_rigid_inverse(self.prev_c2w)
                rv = cv2.Rodrigues(rel[:3, :3].astype(np.float64))[0]
                half = np.eye(4)
                half[:3, :3] = cv2.Rodrigues(0.5 * rv)[0]
                half[:3, 3] = 0.5 * rel[:3, 3]
                cands.append(np.linalg.inv(rel @ rel @ self.last_c2w)
                             @ np.asarray(self.ref_kf.c2w))      # double
                cands.append(np.linalg.inv(half @ self.last_c2w)
                             @ np.asarray(self.ref_kf.c2w))      # half
            cands.append(np.linalg.inv(self.last_c2w)
                         @ np.asarray(self.ref_kf.c2w))          # zero motion
            cands.append(np.eye(4))                              # at the KF
            out = jax.device_get(track_frame_multi(
                self.tracker_ref, img,
                jnp.asarray(np.stack(cands).astype(np.float32)),
                jnp.array([1.0, 0.0]), self.opt.rgbd))
            energy = float(out["energy"])
            if (not np.isfinite(energy) or float(out["valid_frac"]) < 0.3
                    or energy > 1.5 * self._last_coarse_rmse):
                perts = rotation_perturbations()
                out2 = jax.device_get(track_frame_multi(
                    self.tracker_ref, img,
                    jnp.asarray(np.einsum("nij,jk->nik", perts,
                                          T_init).astype(np.float32)),
                    jnp.array([1.0, 0.0]), self.opt.rgbd))
                e2 = float(out2["energy"])
                if np.isfinite(e2) and (not np.isfinite(energy)
                                        or e2 < energy):
                    out, energy = out2, e2
            self.timer.end_timing("track_retry", t_retry)
        self.timer.end_timing("track_frame", tid)

        if not np.isfinite(energy) or float(out["valid_frac"]) <= 0.0 \
                or float(out["num_terms"]) < 16:
            # "BIG ERROR! tracking failed entirely" (FullSystem.cpp:610-615);
            # a zero-support track would otherwise return identity with
            # energy 0 and let the motion model extrapolate unboundedly.
            self.is_lost = True
            return
        self._last_energy = energy
        self._last_coarse_rmse = energy   # lastCoarseRMSE = achievedRes
        T = np.asarray(out["T"])                # ref -> new (w2c rel)
        c2w = self.ref_kf.c2w @ _np_rigid_inverse(T)
        self._record_pose(frame_id, timestamp, c2w)

        # Epipolar tracing of all window KFs' immature points runs on EVERY
        # frame (traceNewCoarse before the KF decision, FullSystem.cpp:1295).
        self._trace_on_frame(img, c2w)

        # firstCoarseRMSE: energy of the first frame tracked against the
        # current reference (trackNewCoarse, FullSystem.cpp:600-607).
        if self._first_coarse_rmse is None:
            self._first_coarse_rmse = energy

        flow = np.asarray(out["flow"])
        need_kf = self._keyframe_decision(flow, out, energy, timestamp)
        if self.logger is not None:
            # trackNewCoarse logging (FullSystem.cpp:635-643): id, ts,
            # exposure, camToWorld.log(), aff a/b, achieved residual, tries.
            from ..core.se3 import se3_log
            aff = np.asarray(out["aff"])
            self.logger.log_coarse_tracking(
                frame_id, timestamp, 1.0,
                np.asarray(se3_log(jnp.asarray(c2w.astype(np.float32)))),
                float(aff[0]), float(aff[1]), energy, 2 if bad else 1)
        if self.opt.debug_save_depth_images and not need_kf:
            # saveNKFDepthMap (CoarseTracker.cpp:1136-1215, called from
            # makeNonKeyFrame FullSystem.cpp:1281): active points projected
            # into the newly tracked frame.
            from ..utils.dso_log import save_depth_png
            idep, wgt = _project_ba_points(
                self.ba_state, jnp.asarray(c2w.astype(np.float32)), self.K,
                self.H, self.W)
            save_depth_png(self.opt.depth_save_folder, frame_id,
                           np.asarray(idep), np.asarray(wgt))
        if need_kf:
            self._make_keyframe(img, frame_id, timestamp, c2w, bgr)


    def _select_uv(self, img) -> Tuple[np.ndarray, int]:
        """Gradient-based candidate selection with DSO-style density
        adaptation (PixelSelector2::makeMaps recursion): when the yield is
        far from the desired density, first relax the threshold, then grow
        the selection potential (one candidate per LARGER cell -> fewer,
        or per smaller cell -> more), exactly the two knobs the reference
        recursion adjusts (PixelSelector2.cpp makeMaps quotia/potential
        update).

        Transport-aware: the adaptation loop only needs COUNTS, and every
        (factor, potential) config reachable within its 4 iterations is
        known up front — so all 5 counts are computed in one jitted call
        (one ~16 B fetch), the loop is replayed on host arithmetic, and the
        selected pixels are extracted on DEVICE (cumsum-rank subsampling,
        identical to np.nonzero + linspace) so only the capped uv list
        (~16 KB) ever crosses the link. Two round trips total; the old
        per-iteration full-mask fetches cost ~95 ms/KF through the tunnel.

        :return: (uv (n,2) float32 x,y ; total selected count pre-cap)
        """
        want = self.opt.immature_cap
        f0 = float(self.opt.selection_threshold_factor)
        ladder = [(f0, 4), (f0, 8), (f0, 2), (f0, 1), (f0 * 0.4, 1)]
        counts = {cfg: int(n) for cfg, n in zip(
            ladder, jax.device_get(_select_counts(img, f0)))}
        factor, potential = f0, 4
        final = (factor, potential)
        for _ in range(4):
            n = counts[(factor, potential)]
            final = (factor, potential)
            if n > 4 * want and potential < 8:
                potential *= 2          # too many: coarser cells
            elif n < want // 4 and potential > 1:
                potential //= 2         # too few: finer cells
            elif n < want // 4:
                factor *= 0.4           # finest cells still starved: relax
            else:
                break
        uv, n = jax.device_get(_select_uv_jit(img, final[0], final[1], want))
        return uv, int(n)

    # ------------------------------------------------------------------
    def _first_frame_rgbd(self, img, frame_id, timestamp, bgr, depth):
        """RGB-D initialization: sensor depth provides metric structure at
        frame 0 (CoarseRGBDInitializer, FullSystem.cpp:1000-1013)."""
        kf = Keyframe(frame_id, timestamp, img, np.eye(4, dtype=np.float32))
        kf.bgr = bgr
        kf.kf_id = 0
        kf.sensor_depth = np.asarray(depth, np.float32)
        self.keyframes.append(kf)
        self.ref_kf = kf
        self._record_pose(frame_id, timestamp, kf.c2w)
        self._assign_slot(kf)

        uv, n_sel = self._select_uv(img)
        d = kf.sensor_depth[uv[:, 1].astype(int), uv[:, 0].astype(int)]
        ok = d > 0.05
        self._insert_points(kf, uv, 1.0 / np.maximum(d, 0.05), ok)

        valid = kf.sensor_depth > 0.05
        idepth0 = np.where(valid, 1.0 / np.maximum(kf.sensor_depth, 0.05),
                           0.0).astype(np.float32)
        self.tracker_ref = make_tracker_ref(
            img, *self.K, sparse_idepth=jnp.asarray(idepth0),
            sparse_weight=jnp.asarray(valid.astype(np.float32)))
        from ..tracking.dvo import build_rgbd_pyramid
        self._dvo_ref = build_rgbd_pyramid(
            img, jnp.asarray(kf.sensor_depth), *self.K, num_levels=2)
        kf.immature = make_immature(jnp.asarray(uv), img)
        kf.n_immature = min(n_sel, self.opt.immature_cap)
        self.initialized = True

    def _first_frame(self, img, frame_id, timestamp, bgr):
        kf = Keyframe(frame_id, timestamp, img, np.eye(4, dtype=np.float32))
        kf.bgr = bgr
        kf.kf_id = 0
        self.keyframes.append(kf)
        self.ref_kf = kf
        self._record_pose(frame_id, timestamp, kf.c2w)
        # DSO-grade joint initializer (CoarseInitializer::setFirst)
        self.init_state = make_initializer(img, *self.K)

    def _initializer_step(self, img, frame_id, timestamp, bgr):
        """Joint multi-level pose + per-point idepth LM until "snapped" and
        stable for 5 frames (CoarseInitializer::trackFrame,
        initializeFromInitializer, FullSystem.cpp:1436-1525)."""
        kf = self.keyframes[0]
        self.init_frames += 1
        self.init_state, done = initializer_track(
            self.init_state, img, *self.K, (self.H, self.W))
        st = self.init_state

        # Scale-normalized pose estimate for the trajectory record (DSO
        # marks in-init poses invalid; we record the current estimate with
        # the running rescale so the pre/post-init trajectory is coherent).
        iR0, good0, valid0, T, done_np = jax.device_get(
            (st.iR[0], st.is_good[0], st.pvalid[0], st.T, done))
        use = good0 & valid0
        mean_iR = float(iR0[use].mean()) if use.any() else 1.0
        rescale = 1.0 / max(mean_iR, 1e-5)
        T_scaled = np.asarray(T, np.float32).copy()
        T_scaled[:3, 3] /= rescale
        c2w = kf.c2w @ _np_rigid_inverse(T_scaled)
        self._record_pose(frame_id, timestamp, c2w)

        if bool(done_np):
            # initializeFromInitializer: idepth = iR * rescale (mean -> 1),
            # translation /= rescale; level-0 points become active BA points.
            pu, pv = jax.device_get((st.pu[0], st.pv[0]))
            uv = np.stack([pu, pv], -1).astype(np.float32)
            idep = iR0 * rescale
            ok = use & (idep > 1e-4)
            cap = self.ba_state.pt_uv.shape[0] // 2
            if int(ok.sum()) > cap:
                # even sub-selection (setting_desiredPointDensity keep)
                ranks = np.cumsum(ok) - 1
                ok = ok & (ranks % max(int(ok.sum()) // cap + 1, 1) == 0)
            self._assign_slot(kf)
            self._insert_points(kf, uv, idep.astype(np.float32), ok)
            self._make_keyframe(img, frame_id, timestamp, c2w, bgr,
                                from_init=True)
            self.initialized = True
            return

        if self.init_frames > 40:
            # Initialization failure -> auto-reset by the caller
            # (initFailed semantics, FullSystem.cpp:1351-1364 +
            # main_tandem_pangolin.cpp:237-255 destroy/recreate loop).
            self.init_failed = True

    # ------------------------------------------------------------------
    def _motion_model(self) -> np.ndarray:
        """Constant-velocity prediction; returns T_ref->new (w2c_new @ c2w_ref),
        the tracker's pose parameterization (trackNewCoarse motion model,
        FullSystem.cpp:434-529; the ~27-perturbation retry list is handled by
        the tracker's coarse pyramid instead)."""
        if len(self.all_poses) < 2:
            pred_c2w = self.last_c2w
        else:
            pred_c2w = self.last_c2w @ np.linalg.inv(self.prev_c2w) \
                @ self.last_c2w
        return (np.linalg.inv(pred_c2w) @ self.ref_kf.c2w).astype(np.float32)

    def _record_pose(self, frame_id, timestamp, c2w):
        # Lifetime record (FrameShell: marginalizedAt defaults to the
        # frame's own id for non-KF frames; movedByOpt filled at BA).
        self._lifetimes.setdefault(frame_id, [frame_id, 0.0])
        self.prev_c2w = self.last_c2w
        self.last_c2w = np.asarray(c2w, np.float32)
        self.all_poses.append(self.last_c2w.copy())
        self.all_ids.append(frame_id)
        self.all_ts.append(timestamp)
        for ow in self.outputs:
            ow.publish_cam_pose(frame_id, self.last_c2w)

    def _keyframe_decision(self, flow, out, energy: float,
                            timestamp: float) -> bool:
        """The reference's exact keyframe rule (FullSystem.cpp:1038-1058).

        With keyframes_per_second > 0: time-based
        (ts - last_kf_ts > 0.95 / kps). Otherwise:
            kfGW*wT*sqrt(tres1)/(w+h) + kfGW*wR*sqrt(tres2)/(w+h)
            + kfGW*wRT*sqrt(tres3)/(w+h) + kfGW*wA*|log(a)| > 1
            or 2*firstCoarseRMSE < tres0
        where tres1..3 are the tracker's flow indicators (mean squared
        shiftT/0/shiftRT, calcRes rs[2..4]), a is the ref->frame affine gain
        and firstCoarseRMSE is the energy of the FIRST frame tracked against
        the current reference."""
        o = self.opt
        if o.keyframes_per_second > 0:
            last_kf_ts = self.keyframes[-1].timestamp
            return bool(timestamp - last_kf_ts > 0.95 / o.keyframes_per_second)
        tres1, tres2, tres3 = (float(x) for x in flow)
        a = float(np.asarray(out["aff"])[0])
        wh = self.W + self.H
        score = o.kf_global_weight * (
            o.max_shift_weight_t * np.sqrt(max(tres1, 0.0)) / wh
            + o.max_shift_weight_r * np.sqrt(max(tres2, 0.0)) / wh
            + o.max_shift_weight_rt * np.sqrt(max(tres3, 0.0)) / wh
            + o.max_affine_weight * abs(np.log(max(a, 1e-12))))
        first = self._first_coarse_rmse
        return bool(score > 1.0
                    or (first is not None and 2.0 * first < energy))


    def _assign_slot(self, kf: Keyframe):
        # kf_of_slot is the exact host mirror of the device frame_valid mask
        # (_assign_slot_jit sets it, marginalize_frame clears it, nothing
        # else touches it) — so the free slot comes from host bookkeeping
        # with NO device fetch (each fetch is a full tunnel round trip).
        free = [i for i, k in enumerate(self.kf_of_slot) if k is None]
        if not free:
            self._marginalize_oldest()
            free = [i for i, k in enumerate(self.kf_of_slot) if k is None]
        slot = int(free[0])
        kf.slot = slot
        self.kf_of_slot[slot] = kf
        self.ba_state, self.slot_images = _assign_slot_jit(
            self.ba_state, self.slot_images, slot,
            jnp.asarray(kf.c2w.astype(np.float32)), kf.image)

    def _marginalize_oldest(self):
        active = [kf for kf in self.keyframes if kf.slot is not None]
        active.sort(key=lambda k: k.frame_id)
        self._marginalize_kf(active[0])

    def _marginalize_kf(self, victim: Keyframe):
        # marginalizedAt = newest KF's id (FullSystem::marginalizeFrame)
        if victim.frame_id in self._lifetimes:
            self._lifetimes[victim.frame_id][0] = \
                self.keyframes[-1].frame_id
        self.ba_state = marginalize_frame(
            self.ba_state, self.slot_images, self.K,
            victim.slot)
        self.kf_of_slot[victim.slot] = None
        victim.slot = None

    def _flag_frames_for_marginalization(self) -> List[Keyframe]:
        """DSO's frame-selection policy (flagFramesForMarginalization,
        FullSystemMarginalize.cpp:56-119), evaluated BEFORE the new keyframe
        joins the window; flagged frames still take part in the final BA and
        are marginalized afterwards (makeKeyFrame order, FullSystem.cpp).

        (a) Flag frames whose surviving-point fraction fell below
            setting_minPointsRemaining (5%) or whose exposure-affine gain vs
            the newest frame exceeds e^setting_maxLogAffFacInWindow, keeping
            at least setting_minFrames frames.
        (b) If the window would still be >= max_keyframes: flag the frame
            with the smallest score
                -sqrt(d(f, latest)) * sum_{t != latest} 1 / (1e-5 + d(f, t))
            i.e. drop a redundant frame (close to the others) that is far
            from the newest; spatially isolated anchors survive. The first
            keyframe is exempt from (b) (fh->frameID == 0 skip).
        """
        active = sorted((k for k in self.keyframes if k.slot is not None),
                        key=lambda k: k.kf_id)
        if len(active) < 2:
            return []
        latest = active[-1]
        min_frames = self.opt.min_frames          # setting_minFrames
        min_frame_age = self.opt.min_frame_age    # setting_minFrameAge

        # One bundled device->host fetch for the window statistics
        # (BA point occupancy, affine, and each KF's immature statuses).
        imm_kfs = [k for k in active if k.immature is not None]
        pt_valid, pt_frame, aff, imm_status = jax.device_get(
            (self.ba_state.pt_valid, self.ba_state.pt_frame,
             self.ba_state.aff,
             [k.immature.status for k in imm_kfs]))
        valid_per_slot = np.bincount(pt_frame[pt_valid],
                                     minlength=len(self.kf_of_slot))
        imm_alive = {k: int(((st != 3) & (st != 2)).sum())   # not OUTLIER/OOB
                     for k, st in zip(imm_kfs, imm_status)}

        flagged: List[Keyframe] = []
        for kf in active:
            # in = surviving BA points + alive immature; out = everything
            # that was ever created for this KF and died. Active points are
            # created by activation too, so track the peak as the total
            # (in < minPointsRemaining * (in+out), FullSystemMarginalize).
            n_alive_imm = imm_alive.get(kf, kf.n_immature)
            n_pts = int(valid_per_slot[kf.slot])
            kf.n_points_total = max(kf.n_points_total, n_pts)
            n_in = n_pts + n_alive_imm
            n_total = max(kf.n_points_total + kf.n_immature, 1)
            log_aff = abs(float(aff[latest.slot, 0] - aff[kf.slot, 0]))
            if ((n_in < 0.05 * n_total or log_aff > 0.7)
                    and len(active) - len(flagged) > min_frames):
                flagged.append(kf)

        if len(active) - len(flagged) >= self.opt.max_keyframes:
            centers = {k.kf_id: k.c2w[:3, 3] for k in active}
            c_latest = centers[latest.kf_id]
            best, smallest = None, 1.0       # real scores are <= 0
            for kf in active:
                if (kf.kf_id > latest.kf_id - min_frame_age
                        or kf.kf_id == 0 or kf in flagged):
                    continue
                dist_score = 0.0
                for other in active:
                    if other.kf_id > latest.kf_id - min_frame_age + 1 \
                            or other is kf:
                        continue
                    d = np.linalg.norm(centers[kf.kf_id]
                                       - centers[other.kf_id])
                    dist_score += 1.0 / (1e-5 + d)
                dist_score *= -np.sqrt(
                    np.linalg.norm(centers[kf.kf_id] - c_latest))
                if dist_score < smallest:
                    smallest, best = dist_score, kf
            if best is None:                 # window of {first KF, latest}
                cands = [k for k in active if k not in flagged
                         and k is not latest]
                best = cands[0] if cands else None
            if best is not None:
                flagged.append(best)
        return flagged

    def _insert_points(self, kf: Keyframe, uv, idepth, ok):
        """Scatter new points into free BA point slots (one jitted call —
        the former host-side path read pt_valid from an eager update and
        sampled colors eagerly, both poison for remote dispatch)."""
        kf.n_points_total += int(np.asarray(ok).sum())
        self.ba_state = _insert_points_jit(
            self.ba_state, kf.slot, jnp.asarray(np.asarray(uv, np.float32)),
            jnp.asarray(np.asarray(idepth, np.float32)),
            jnp.asarray(np.asarray(ok, bool)), kf.image)

    # ------------------------------------------------------------------
    def _make_keyframe(self, img, frame_id, timestamp, c2w, bgr,
                       from_init=False):
        tid = self.timer.start_timing("make_keyframe")
        kf = Keyframe(frame_id, timestamp, img, c2w)
        kf.bgr = bgr
        kf.kf_id = len(self.keyframes)
        if self.opt.rgbd and getattr(self, "_current_depth", None) is not None:
            kf.sensor_depth = np.asarray(self._current_depth, np.float32)
        # Marginalization selection runs BEFORE the new KF joins the window
        # (flagFramesForMarginalization(fh), FullSystem.cpp makeKeyFrame);
        # flagged frames still participate in the BA below.
        t_flag = self.timer.start_timing("kf_flag")
        flagged = [] if from_init else self._flag_frames_for_marginalization()
        self.keyframes.append(kf)
        self._assign_slot(kf)
        self.timer.end_timing("kf_flag", t_flag)

        t_act = self.timer.start_timing("kf_activate")
        # Activate matured immature points from ALL window keyframes
        # (activatePointsMT over the active window, FullSystem.cpp:1335) —
        # fully device-side: activation, free-slot assignment, and scatter
        # insertion run in one jitted call per host KF (no host syncs).
        n_valid_pre_act = (int(jax.device_get(self.ba_state.pt_valid).sum())
                           if self.logger is not None else 0)
        if not from_init:
            # Free pool slots of points that left the field of view BEFORE
            # activating new ones (DSO runs flagPointsForRemoval after
            # activation; with a fixed pool the drop must come first so the
            # freed slots are usable this keyframe — documented deviation).
            self.ba_state = _drop_oob_points(
                self.ba_state, jnp.asarray(c2w.astype(np.float32)),
                self.K, self.H, self.W)
            tgt_c2w = jnp.asarray(c2w.astype(np.float32))
            for host_kf in self.kf_of_slot:
                if (host_kf is None or host_kf is kf
                        or host_kf.immature is None
                        or host_kf.slot is None):
                    continue
                self.ba_state, host_kf.immature = _activate_and_insert(
                    self.ba_state, host_kf.immature, host_kf.slot,
                    jnp.asarray(host_kf.c2w.astype(np.float32)), tgt_c2w,
                    img, host_kf.image, self.K)
                if os.environ.get("TANDEM_DEBUG_ACTIVATION"):
                    # Immature-health introspection (costs one fetch per
                    # host KF — debug only). Status counts expose map
                    # starvation: a window whose hosts are mostly
                    # OOB/OUTLIER cannot replenish the active set.
                    st = np.bincount(np.asarray(
                        jax.device_get(host_kf.immature.status)),
                        minlength=5)
                    print(f"ACT kf{frame_id} host{host_kf.frame_id}: "
                          f"uninit/good/oob/out = "
                          f"{int(st[0])}/{int(st[1])}/{int(st[2])}/"
                          f"{int(st[3])}")

        self.timer.end_timing("kf_activate", t_act)
        # RGB-D: seed points in the new KF directly from sensor depth
        # (makeNewTraces gt seeding: idepth_max=idepth_min=1/gtDepth)
        if kf.sensor_depth is not None:
            uv0, _ = self._select_uv(img)
            d0 = kf.sensor_depth[uv0[:, 1].astype(int), uv0[:, 0].astype(int)]
            self._insert_points(kf, uv0, 1.0 / np.maximum(d0, 0.05), d0 > 0.05)

        # MVS depth seeding (TANDEM mode): dense depth for the new KF
        mvs = self.backend.get_tracking_depth_map() if self.backend else None

        t_ba = self.timer.start_timing("kf_ba")
        # Windowed BA + outlier removal (optimize -> removeOutliers,
        # FullSystem.cpp:1344,1373)
        self.ba_state, energy = ba_iterate(
            self.ba_state, self.slot_images, self.K,
            iters=self.opt.ba_iters, newest_slot=kf.slot)
        n_valid_post_ba = (int(jax.device_get(self.ba_state.pt_valid).sum())
                           if self.logger is not None else 0)
        self.ba_state = remove_outliers(
            self.ba_state, self.slot_images, self.K)
        # device_get blocks AND fetches in one round trip (block_until_ready
        # followed by np.asarray costs two).
        poses = jax.device_get(self.ba_state.poses)
        self.timer.end_timing("kf_ba", t_ba)
        for slot, k in enumerate(self.kf_of_slot):
            if k is not None:
                moved = float(np.linalg.norm(poses[slot][:3, 3]
                                             - k.c2w[:3, 3]))
                if k.frame_id in self._lifetimes:
                    self._lifetimes[k.frame_id][1] += moved
                k.c2w = poses[slot]
        kf.c2w = poses[kf.slot]
        self.last_c2w = kf.c2w.copy()

        t_sel = self.timer.start_timing("kf_select")
        # New immature points in this KF
        uv, n_sel = self._select_uv(img)
        kf.immature = make_immature(jnp.asarray(uv), img, id_min=0.05,
                                    id_max=5.0)
        kf.n_immature = min(n_sel, self.opt.immature_cap)

        self.timer.end_timing("kf_select", t_sel)
        # Record the optimization window (dso_optimization_windows format)
        win = sorted(k.frame_id for k in self.kf_of_slot if k is not None)
        self.windows.append(win)

        if self.logger is not None:
            self._stat_created += kf.n_immature
            n_post = int(jax.device_get(self.ba_state.pt_valid).sum())
            self._stat_activated += max(n_valid_post_ba - n_valid_pre_act, 0)
            self._stat_dropped += max(n_valid_post_ba - n_post, 0)
            self._log_keyframe_stats(kf)

        for ow in self.outputs:
            ow.publish_keyframes(self.keyframes)

        # TANDEM backend call on the active window
        if self.backend is not None:
            t_del = self.timer.start_timing("kf_deliver")
            self._deliver_dr_frame(kf)
            self.timer.end_timing("kf_deliver", t_del)

        t_ref = self.timer.start_timing("kf_set_ref")
        # Refresh the coarse-tracking reference (sparse BA points + dense)
        self._set_tracking_ref(kf, mvs)
        self.timer.end_timing("kf_set_ref", t_ref)
        self.ref_kf = kf

        # Marginalize the flagged frames last (marginalizeFrame at the end
        # of makeKeyFrame) — after BA refined their poses and after the
        # backend/tracking-ref consumed the full window.
        for victim in flagged:
            if victim.slot is not None:
                self._marginalize_kf(victim)
        self.timer.end_timing("make_keyframe", tid)

    def _deliver_dr_frame(self, kf: Keyframe):
        """deliverDrFrame (FullSystem.cpp:1122-1198): send the KF window to
        the backend when it has view_num frames and the backend is ready."""
        active = sorted((k for k in self.kf_of_slot
                         if k is not None and k.bgr is not None),
                        key=lambda k: k.frame_id)
        if len(active) < self.opt.mvs_view_num:
            return
        window = active[-self.opt.mvs_view_num:]
        if not self.backend.ready():
            # FullSystem.cpp:1144-1151: linearize mode waits for the backend;
            # real-time mode drops the keyframe.
            if self.opt.linearize:
                self.backend.wait()
            else:
                self.n_dropped_kf += 1
                return
        # Depth range: [0.01, 3 / idepth_quantile(0.2)] from tracker idepths.
        # get_idepth_quantile (tandem_backend.cpp:354-361) nth_element-sorts
        # the IDEPTHS ascending, takes the element at index int(0.2*n) — a
        # SMALL idepth, i.e. a FAR point — and returns its reciprocal;
        # FullSystem.cpp:1179,1193 passes 3x that as depth_max.  So
        # dmax = 3 x ~P80(depth), NOT 3 x P20(depth): the sweep range must
        # reach past most of the visible geometry.  (Round-3 shipped the
        # inversion — 0.8-idepth-quantile — clipping the plane sweep 3-4x
        # short; test_full_system.py::test_depth_range_quantile pins the
        # reference arithmetic.)
        idep, pt_valid = jax.device_get(       # one bundled round trip
            (self.ba_state.pt_idepth, self.ba_state.pt_valid))
        idv = idep[pt_valid]
        if len(idv) > 0:
            dmax = 3.0 / max(reference_idepth_quantile(idv, 0.2), 1e-3)
        else:
            dmax = 10.0
        self.backend.call(
            bgrs=[k.bgr for k in window],
            cam_to_worlds=[k.c2w for k in window],
            depth_min=0.01, depth_max=float(dmax),
            next_ref_c2w=kf.c2w,
            discard_percentage=self.opt.mvs_discard_percentage)

    def _set_tracking_ref(self, kf: Keyframe, mvs: Optional[dict]):
        """setCoarseTrackingRef with TSDF-rendered dense injection
        (FullSystem.cpp:1373-1387, CoarseTracker.cpp:633-733)."""
        # New reference => firstCoarseRMSE re-arms on the next tracked frame
        # (CoarseTracker::setCTRefForFirstFrame / setCoarseTrackingRef reset).
        self._first_coarse_rmse = None
        # Project BA points into the new reference KF on device (no host
        # round trips; makeCoarseDepthL0 analogue)
        idepth0, weight0 = _project_ba_points(
            self.ba_state, jnp.asarray(kf.c2w.astype(np.float32)), self.K,
            self.H, self.W)
        if self.opt.debug_save_depth_images:
            # saveKFDepthMap right after the new tracking ref is set
            # (FullSystem.cpp:1386, CoarseTracker.cpp:1073-1135)
            from ..utils.dso_log import save_depth_png
            save_depth_png(self.opt.depth_save_folder, kf.frame_id,
                           np.asarray(idepth0), np.asarray(weight0))

        dense_id = dense_w = None
        if kf.sensor_depth is not None:
            valid = kf.sensor_depth > 0.05
            on_grid = np.zeros_like(valid)
            st = self.opt.tracking_step
            on_grid[::st, ::st] = True
            use = valid & on_grid
            dense_id = jnp.asarray(np.where(
                use, 1.0 / np.maximum(kf.sensor_depth, 0.05), 0.0
            ).astype(np.float32))
            dense_w = jnp.asarray(use.astype(np.float32))
        elif (self.opt.dense_tracking and mvs is not None
              and mvs.get("valid")):
            dense_id, dense_w = splat_depth_to_ref(
                jnp.asarray(mvs["depth"]),
                jnp.asarray(mvs["c2w"].astype(np.float32)),
                jnp.asarray(kf.c2w.astype(np.float32)),
                jnp.asarray(self.K_mat), self.H, self.W,
                stride=self.opt.tracking_step)

        self.tracker_ref = make_tracker_ref(
            kf.image, *self.K,
            sparse_idepth=jnp.asarray(idepth0),
            sparse_weight=jnp.asarray(weight0),
            dense_idepth=dense_id, dense_weight=dense_w)
        # RGB-D: the dvo DenseTracker reference pyramid (dvo_img of the
        # tracking-ref FrameHessian, HessianBlocks.h:307-319) — level 1 is
        # the only level the runtime matches on (CoarseTracker.cpp:954).
        if self.opt.rgbd and kf.sensor_depth is not None:
            from ..tracking.dvo import build_rgbd_pyramid
            self._dvo_ref = build_rgbd_pyramid(
                kf.image, jnp.asarray(kf.sensor_depth), *self.K,
                num_levels=2)
        elif self.opt.rgbd:
            # A keyframe without sensor depth cannot serve as a dvo
            # reference; drop the old pyramid so dense_match never runs
            # against a stale reference while tracker_ref has moved on —
            # the track path falls back to track_frame instead.
            self._dvo_ref = None

    def _trace_on_frame(self, img, c2w):
        """traceNewCoarse: update immature points of active KFs against the
        new frame (FullSystem.cpp:650-)."""
        for kf in self.kf_of_slot:
            if kf is not None and kf.immature is not None:
                kf.immature = trace_points(
                    kf.immature, jnp.asarray(kf.c2w),
                    jnp.asarray(c2w.astype(np.float32)), img, self.K)

    def _log_keyframe_stats(self, kf: Keyframe):
        """printLogLine + printEigenValLine per keyframe
        (FullSystem.cpp:1664-1781): numsLog counters and the eigen spectra /
        diagonal / variances / nullspace quadratic forms of the
        Schur-reduced window system (lastHS/lastbS)."""
        from ..tracking.ba import ba_log_system
        H_log, b_log, ns, n_res = jax.device_get(ba_log_system(
            self.ba_state, self.slot_images, self.K))
        aff = jax.device_get(self.ba_state.aff)
        active = sorted((k for k in self.kf_of_slot if k is not None),
                        key=lambda k: k.kf_id)
        # Sub-select calib + active-slot rows in window order (DSO's lastHS
        # only spans live frames; our system carries every slot).
        idx = list(range(4)) + [4 + k.slot * 8 + j
                                for k in active for j in range(8)]
        idx = np.asarray(idx)
        rmse = self._last_energy if self._last_energy is not None else 0.0
        self.logger.log_nums(
            kf.frame_id, rmse, self._stat_created, self._stat_activated,
            self._stat_dropped, self.opt.ba_iters, int(n_res),
            float(aff[kf.slot, 0]), float(aff[kf.slot, 1]),
            active[-1].frame_id - active[0].frame_id, len(active))
        self.logger.log_eigenvalues(
            kf.frame_id, H_log[np.ix_(idx, idx)], b_log[idx], ns[idx],
            len(active))

    # ------------------------------------------------------------------
    def write_results(self, out_dir: str):
        import os
        os.makedirs(out_dir, exist_ok=True)
        write_result_tum(os.path.join(out_dir, "result.txt"), self.all_ts,
                         self.all_poses)
        write_poses_mat(os.path.join(out_dir, "poses_dso.txt"), self.all_ids,
                        self.all_poses)
        kf_ids = [kf.frame_id for kf in self.keyframes]
        kf_poses = [kf.c2w for kf in self.keyframes]
        write_poses_mat(os.path.join(out_dir, "keyframes_dso.txt"), kf_ids,
                        kf_poses)
        from .io import write_optimization_windows
        write_optimization_windows(
            os.path.join(out_dir, "dso_optimization_windows.txt"),
            self.windows)
        if self.logger is not None:
            # printFrameLifetimes runs at shutdown (FullSystem dtor path)
            self.logger.log_lifetimes(
                [(fid, rec[0], 0, 0, rec[1])
                 for fid, rec in sorted(self._lifetimes.items())])
            self.logger.close()


@jax.jit
def _u8_to_f32(x):
    return x.astype(jnp.float32)


def _abs_grad2(img):
    gx = jnp.zeros_like(img)
    gy = jnp.zeros_like(img)
    gx = gx.at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = gy.at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    return gx * gx + gy * gy


@partial(jax.jit, static_argnums=(1,))
def _select_counts(img, f0: float):
    """Candidate counts for every (factor, potential) config the density
    adaptation loop can visit, in one program (one scalar-vector fetch)."""
    g2 = _abs_grad2(img)
    return jnp.stack([
        jnp.sum(select_pixels(g2, potential=p,
                              threshold_factor=f).astype(jnp.int32))
        for f, p in ((f0, 4), (f0, 8), (f0, 2), (f0, 1), (f0 * 0.4, 1))])


@partial(jax.jit, static_argnums=(1, 2, 3))
def _select_uv_jit(img, threshold_factor: float, potential: int, cap: int):
    """Select pixels and extract their (x, y) coordinates ON DEVICE.

    Replicates np.nonzero(mask) + np.linspace(0, n-1, cap).astype(int)
    subsampling exactly: selected pixels are ranked in row-major order via
    a cumulative sum, the k-th kept rank is (k*(n-1))//(cap-1) (integer
    arithmetic — equal to float64 linspace truncation for n*cap < 2^31),
    and searchsorted finds the pixel holding each rank. Only (cap, 2)
    floats cross the host link instead of the full mask. Entries past the
    n-th are zero — the same padding the host path always produced (the
    (cap, 2) shape keeps downstream jits static).
    """
    H, W = img.shape
    mask = select_pixels(_abs_grad2(img), potential=potential,
                         threshold_factor=threshold_factor)
    flat = mask.reshape(-1).astype(jnp.int32)
    csum = jnp.cumsum(flat)
    n = csum[-1]
    k = jnp.arange(cap, dtype=jnp.int32)
    t = jnp.where(n > cap, (k * jnp.maximum(n - 1, 0)) // (cap - 1), k)
    idx = jnp.searchsorted(csum, t + 1)
    valid = t < n
    uv = jnp.stack([(idx % W).astype(jnp.float32),
                    (idx // W).astype(jnp.float32)], -1)
    return jnp.where(valid[:, None], uv, 0.0), n


@jax.jit
def _assign_slot_jit(state: BAState, slot_images, slot, c2w, image):
    """Write a keyframe into BA slot ``slot`` (poses, affine, FEJ lin point,
    image) as one device program."""
    z2 = jnp.zeros(2)
    slot_images = slot_images.at[slot].set(image)
    state = state._replace(
        poses=state.poses.at[slot].set(c2w),
        aff=state.aff.at[slot].set(z2),
        frame_valid=state.frame_valid.at[slot].set(True),
        # FEJ linearization point for the fresh slot (the prior holds no
        # information on it yet — rows were zeroed at marginalization)
        poses_lin=state.poses_lin.at[slot].set(c2w),
        aff_lin=state.aff_lin.at[slot].set(z2))
    return state, slot_images


def _scatter_new_points(state: BAState, slot, uv, idepth, ok, image):
    """Rank-compact ``ok`` candidates into free BA point slots and scatter
    all point fields (colors sampled in-program). Shared by the host insert
    path and device-side activation.

    :return: (new BAState, use mask of candidates that got a slot)
    """
    N = state.pt_valid.shape[0]
    free = ~state.pt_valid
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    slot_of_rank = jnp.zeros(N, jnp.int32).at[
        jnp.where(free, free_rank, N)].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop")
    n_free = jnp.sum(free.astype(jnp.int32))

    ok_rank = jnp.cumsum(ok.astype(jnp.int32)) - 1
    use = ok & (ok_rank < n_free)
    dest = jnp.where(use, slot_of_rank[jnp.clip(ok_rank, 0, N - 1)], N)

    u = uv[:, 0:1] + PATTERN[None, :, 0]
    v = uv[:, 1:2] + PATTERN[None, :, 1]
    colors = _bilinear(image, u.reshape(-1), v.reshape(-1)).reshape(-1, 8)

    return state._replace(
        pt_frame=state.pt_frame.at[dest].set(slot, mode="drop"),
        pt_uv=state.pt_uv.at[dest].set(uv, mode="drop"),
        pt_idepth=state.pt_idepth.at[dest].set(
            jnp.maximum(idepth, 1e-3), mode="drop"),
        pt_color=state.pt_color.at[dest].set(colors, mode="drop"),
        pt_valid=state.pt_valid.at[dest].set(True, mode="drop")), use


@jax.jit
def _insert_points_jit(state: BAState, slot, uv, idepth, ok, image):
    """Scatter candidate points into free BA point slots."""
    new_state, _ = _scatter_new_points(state, slot, uv, idepth, ok, image)
    return new_state


@partial(jax.jit, static_argnums=(2, 3, 4))
def _drop_oob_points(state: BAState, newest_c2w, K, H: int, W: int):
    """flagPointsForRemoval parity (FullSystem.cpp:888-935 + isOOB,
    HessianBlocks.h:528): a point leaves the active set when it holds NO
    residuals — i.e. it projects into fewer than 2 OTHER window frames —
    or its idepth went negative. Points that merely left the NEWEST
    frame's view keep constraining the older frames they are visible in
    until their host marginalizes, exactly like the reference's residual
    bookkeeping. (Rounds 2-4 dropped on newest-frame visibility alone;
    during rotation-heavy segments that severs every link to the pre-pan
    geometry a window ahead of schedule — the map starves from both ends.
    The original failure that motivated dropping — pool saturation with
    zero insertions — stays solved: sweeping scenes still shed points as
    their co-visible frame set shrinks below 2.) ``newest_c2w`` is kept
    in the signature for the newest-frame-behind-camera guard."""
    fx, fy, cx, cy = K
    ray = jnp.stack([(state.pt_uv[:, 0] - cx) / fx,
                     (state.pt_uv[:, 1] - cy) / fy,
                     jnp.ones_like(state.pt_uv[:, 0])], -1)
    pts_h = ray / jnp.maximum(state.pt_idepth[:, None], 1e-6)
    hposes = state.poses[state.pt_frame]
    pts_w = jnp.einsum("nij,nj->ni", hposes[:, :3, :3], pts_h) \
        + hposes[:, :3, 3]                                   # (N, 3)

    # Project every point into every window frame: (F, N) visibility.
    R_all = jnp.swapaxes(state.poses[:, :3, :3], -1, -2)     # (F, 3, 3)
    t_all = -jnp.einsum("fij,fj->fi", R_all, state.poses[:, :3, 3])
    pr = jnp.einsum("fij,nj->fni", R_all, pts_w) + t_all[:, None, :]
    z = jnp.maximum(pr[..., 2], 1e-6)
    u = fx * pr[..., 0] / z + cx
    v = fy * pr[..., 1] / z + cy
    vis = ((pr[..., 2] > 0.01) & (u >= 1.0) & (u <= W - 2.0)
           & (v >= 1.0) & (v <= H - 2.0))                    # (F, N)
    vis = vis & state.frame_valid[:, None]
    # Exclude the host frame from the count (residuals are host->target).
    F = state.poses.shape[0]
    not_host = jnp.arange(F)[:, None] != state.pt_frame[None, :]
    n_targets = jnp.sum(vis & not_host, axis=0)              # (N,)
    keep = (n_targets >= 2) & (state.pt_idepth > 0)
    return state._replace(pt_valid=state.pt_valid & keep)


@partial(jax.jit, static_argnums=(2, 3, 4))
def _project_ba_points(state: BAState, ref_c2w, K, H: int, W: int):
    """Scatter active BA points into level-0 idepth/weight maps of the new
    reference keyframe (device-side makeCoarseDepthL0 input)."""
    fx, fy, cx, cy = K
    ray = jnp.stack([(state.pt_uv[:, 0] - cx) / fx,
                     (state.pt_uv[:, 1] - cy) / fy,
                     jnp.ones_like(state.pt_uv[:, 0])], -1)
    pts_h = ray / jnp.maximum(state.pt_idepth[:, None], 1e-6)
    poses = state.poses[state.pt_frame]
    pts_w = jnp.einsum("nij,nj->ni", poses[:, :3, :3], pts_h) \
        + poses[:, :3, 3]
    R = ref_c2w[:3, :3].T
    t = -R @ ref_c2w[:3, 3]
    pts_r = pts_w @ R.T + t
    z = pts_r[:, 2]
    good = state.pt_valid & (z > 0.01)
    zs = jnp.maximum(z, 1e-6)
    u = jnp.round(fx * pts_r[:, 0] / zs + cx).astype(jnp.int32)
    v = jnp.round(fy * pts_r[:, 1] / zs + cy).astype(jnp.int32)
    good = good & (u >= 0) & (u < W) & (v >= 0) & (v < H)
    flat = jnp.where(good, v * W + u, H * W)
    # Near-wins on pixel collision: when an occluded far point and the
    # occluder land on the same pixel, keep the LARGER idepth (nearest
    # surface) instead of scatter-order luck — the tracker must never warp
    # a foreground pixel with background depth.
    idepth = jnp.zeros(H * W).at[flat].max(1.0 / zs, mode="drop")
    weight = jnp.zeros(H * W).at[flat].max(1.0, mode="drop")
    return idepth.reshape(H, W), weight.reshape(H, W)


@jax.jit
def _activate_and_insert(state: BAState, pts, host_slot, host_c2w, tgt_c2w,
                         tgt_img, host_img, K):
    """Activate matured immature points and scatter them into free BA point
    slots — one device program, no host round trips (the host-side insert
    path needs pt_valid downloads + per-field scatters, each of which blocks
    on the device queue).

    :return: (new BAState, new ImmaturePoints with activated ones removed)
    """
    from ..tracking.immature import activate_points

    idep, ok = activate_points(pts, host_c2w, tgt_c2w, tgt_img, K)
    new_state, use = _scatter_new_points(state, host_slot, pts.uv, idep, ok,
                                         host_img)
    new_pts = pts._replace(valid=pts.valid & ~use)
    return new_state, new_pts
