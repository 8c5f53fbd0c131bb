"""Sliding-window photometric bundle adjustment on TPU.

Re-design of DSO's optimization backend (tandem/src/OptimizationBackend/
EnergyFunctional.{h,cpp}, AccumulatedTopHessian/AccumulatedSCHessian,
FullSystemOptimize.cpp:408-560): analytic DSO-style Jacobians of the 8-pattern
photometric residual for ALL (point, target) pairs at once — one fused
wide-row gather samples intensity+gradients — assembled into the frame
Hessian with one-hot einsums; the per-point Schur complement is a vectorized
rank-1 elimination (each point's inverse depth is scalar). An autodiff
reference residual (_residual_one) is kept for Jacobian validation tests.

The frame system is (8F+4)-dimensional like DSO's (NumType.h CPARS=4): 8
parameters per frame slot plus 4 global camera-intrinsics corrections
(fx, fy, cx, cy), anchored at the boot calibration by DSO's
setting_initialCalibHessian prior and marginalized with FEJ like the frame
block.

Structure (fixed shapes, all masked):
- F frame slots: camera-to-world pose (4,4), affine (a, b) per frame.
- N point slots: host frame index, pixel (u, v), inverse depth, 8-pattern
  host intensities.
- Residuals: every (point, target-frame) pair with target != host; the DSO
  8-pixel residual pattern (settings.h staticPattern) warped with the
  fronto-parallel assumption.
- Gauge: frame 0 pose+affine held by a strong prior; a weak idepth prior
  bounds the monocular scale gauge (DSO fixes gauge through its
  marginalization prior + nullspace orthogonalization instead; we keep an
  explicit marginalization prior (Hm, bm) over frame parameters, folded in
  on frame removal).

Affine model: r = I_t(p') - e^{a_t - a_h} * I_h(p) - (b_t - e^{a_t-a_h} b_h),
a relative gain/bias between frames (DSO's exposure-affine AffLight).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.se3 import se3_exp, se3_inverse, se3_log
from ..ops.linalg import inv_psd_small, solve_gauss_jordan

# DSO's 8-point residual pattern (tandem/src/util/settings.h staticPattern).
PATTERN = np.array([[0, -2], [-1, -1], [1, -1], [-2, 0],
                    [0, 0], [2, 0], [-1, 1], [0, 2]], np.float32)

HUBER_TH = 9.0
# setting_outlierTHSumComponent = 50*50 (settings.cpp:85): gradient-based
# residual downweighting constant.
OUTLIER_TH_SUM_COMPONENT = 50.0 ** 2


class BAState(NamedTuple):
    poses: jnp.ndarray       # (F, 4, 4) cam_to_world
    aff: jnp.ndarray         # (F, 2) (a, b)
    frame_valid: jnp.ndarray  # (F,) bool
    pt_frame: jnp.ndarray    # (N,) int32 host frame slot
    pt_uv: jnp.ndarray       # (N, 2) float32 pixel in host frame
    pt_idepth: jnp.ndarray   # (N,) float32
    pt_color: jnp.ndarray    # (N, 8) host pattern intensities
    pt_valid: jnp.ndarray    # (N,) bool
    # Marginalization prior over frame + calib parameters (8 per slot + 4
    # calib appended at the end): H, b with energy 0.5 d^T H d + b^T d where
    # d is the deviation from the FEJ linearization point (poses_lin,
    # aff_lin, calib_lin) — DSO keeps first-estimate Jacobians for
    # marginalized information (EnergyFunctional HM/bM, sized 8F+CPARS).
    Hm: jnp.ndarray          # (F*8+4, F*8+4)
    bm: jnp.ndarray          # (F*8+4,)
    poses_lin: jnp.ndarray   # (F, 4, 4) FEJ linearization point
    aff_lin: jnp.ndarray     # (F, 2)
    # Camera-intrinsics correction (d_fx, d_fy, d_cx, d_cy) on top of the
    # boot calibration passed to the solve — DSO's CalibHessian state (the
    # 4 CPARS entries of its (8F+4) system, NumType.h:54), anchored at the
    # boot value by setting_initialCalibHessian (settings.cpp:52).
    calib: jnp.ndarray       # (4,)
    calib_lin: jnp.ndarray   # (4,)


def create_ba_state(num_frames: int, num_points: int,
                    calib_prior: float = 2e6) -> BAState:
    """:param calib_prior: anchor Hessian on each calib parameter at the boot
    calibration, seeded into the marginalization prior exactly like DSO's
    setting_initialCalibHessian=5e9 on SCALE_F/SCALE_C=50-scaled variables
    (settings.cpp:52, i.e. 5e9/50^2 = 2e6 on raw pixels).

    KEEP THIS AT DSO STRENGTH unless the corrected K is also propagated: the
    estimated calib correction is consumed only inside BA (_system_terms);
    immature tracing, the coarse tracker, TSDF integration and MVSNet all
    keep the boot K (in DSO the shared CalibHessian value reaches every
    consumer). At the default prior the correction stays pinned near 0 so
    the split is consistent; weakening the prior without feeding
    state.calib back to the other consumers would make BA poses/idepths
    inconsistent with the rest of the pipeline."""
    F, N = num_frames, num_points
    return BAState(
        poses=jnp.broadcast_to(jnp.eye(4), (F, 4, 4)),
        aff=jnp.zeros((F, 2)),
        frame_valid=jnp.zeros((F,), jnp.bool_),
        pt_frame=jnp.zeros((N,), jnp.int32),
        pt_uv=jnp.zeros((N, 2)),
        pt_idepth=jnp.ones((N,)),
        pt_color=jnp.zeros((N, 8)),
        pt_valid=jnp.zeros((N,), jnp.bool_),
        Hm=jnp.zeros((F * 8 + 4, F * 8 + 4)).at[
            jnp.arange(F * 8, F * 8 + 4),
            jnp.arange(F * 8, F * 8 + 4)].set(calib_prior),
        bm=jnp.zeros((F * 8 + 4,)),
        poses_lin=jnp.broadcast_to(jnp.eye(4), (F, 4, 4)),
        aff_lin=jnp.zeros((F, 2)),
        calib=jnp.zeros((4,)),
        calib_lin=jnp.zeros((4,)),
    )


def _prior_delta(state: BAState):
    """Deviation of the current estimate from the FEJ linearization point in
    the local increment convention (pose = pose_lin @ exp(-delta)): (F*8,)."""
    rel = jnp.einsum("fij,fjk->fik", se3_inverse(state.poses_lin),
                     state.poses)
    d_pose = -se3_log(rel)                        # (F, 6)
    d_aff = state.aff - state.aff_lin             # (F, 2)
    d = jnp.concatenate([d_pose, d_aff], -1)
    d = jnp.where(state.frame_valid[:, None], d, 0.0)
    return jnp.concatenate([d.reshape(-1), state.calib - state.calib_lin])


def gauge_nullspaces(poses, frame_valid):
    """Gauge-nullspace basis of the window (DSO getNullspaces +
    EnergyFunctional::orthogonalize, EnergyFunctional.cpp:718): 7 geometric
    directions (global translation x3, rotation x3, scale) plus 2 global
    affine shifts — evaluated numerically via the group action so the
    increment convention (c2w <- c2w exp(-dx)) is matched by construction.
    The 4 trailing calib rows are zero (gauge motions do not move K).

    :return: (F*8+4, 9) matrix of nullspace columns.
    """
    F = poses.shape[0]
    eps = 1e-4
    cols = []
    w2c = se3_inverse(poses)

    def pose_col(g):
        # dx_f = -log(c2w_f^-1 g c2w_f) / eps for the world transform g
        rel = jnp.einsum("fij,jk,fkl->fil", w2c, g, poses)
        d = -se3_log(rel) / eps                   # (F, 6)
        d = jnp.where(frame_valid[:, None], d, 0.0)
        return jnp.concatenate([d, jnp.zeros((F, 2))], -1).reshape(-1)

    for k in range(6):
        xi = jnp.zeros(6).at[k].set(eps)
        cols.append(pose_col(se3_exp(xi)))
    # Scale: t <- (1 + eps) t
    scaled = poses.at[:, :3, 3].multiply(1.0 + eps)
    rel = jnp.einsum("fij,fjk->fik", w2c, scaled)
    d = -se3_log(rel) / eps
    d = jnp.where(frame_valid[:, None], d, 0.0)
    cols.append(jnp.concatenate([d, jnp.zeros((F, 2))], -1).reshape(-1))
    # Global affine shifts (a and b act relatively between frames)
    for j in range(2):
        da = jnp.zeros((F, 2)).at[:, j].set(1.0)
        da = jnp.where(frame_valid[:, None], da, 0.0)
        cols.append(jnp.concatenate([jnp.zeros((F, 6)), da], -1).reshape(-1))
    ns = jnp.stack(cols, -1)                      # (F*8, 9)
    return jnp.concatenate([ns, jnp.zeros((4, ns.shape[1]))], 0)


def _orthogonalize_prior(Hm, bm, nullspaces):
    """Project the marginalization prior onto the complement of the gauge
    nullspace so no information accumulates along unobservable directions
    (scale/yaw leak; EnergyFunctional.cpp:718 orthogonalize)."""
    N = nullspaces
    NtN = N.T @ N + 1e-8 * jnp.eye(N.shape[1])
    pinv = inv_psd_small(NtN, N.shape[1])
    # P = I - N (N^T N)^-1 N^T applied from both sides
    NP = N @ pinv                                  # (P, 9)
    bm = bm - NP @ (N.T @ bm)
    Hm = Hm - NP @ (N.T @ Hm)
    Hm = Hm - (Hm @ N) @ NP.T
    Hm = 0.5 * (Hm + Hm.T)
    return Hm, bm


def _bilinear(img, x, y):
    """Bilinear sample with the four corners packed into one gather row
    (TPU gather cost scales with row count, not width). Repeated calls on
    the same image inside one jit share the packed table via CSE."""
    H, W = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    xi = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    yi = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    packed = jnp.stack([img[:-1, :-1], img[:-1, 1:],
                        img[1:, :-1], img[1:, 1:]], -1)   # (H-1, W-1, 4)
    rows = packed.reshape(-1, 4)[yi * (W - 1) + xi]
    w = jnp.stack([(1 - wx) * (1 - wy), wx * (1 - wy),
                   (1 - wx) * wy, wx * wy], -1)
    return jnp.sum(rows * w, -1)


def _residual_one(dx_h, dx_t, id_n, pose_h, pose_t, aff_h, aff_t, uv, colors,
                  img_t, K, dk=None):
    """8-pattern residual of one point in one target frame.

    dx_h/dx_t: (8,) parameter increments [xi(6), da, db] applied on top of the
    linearization (pose_*, aff_*); dk: (4,) calib increment on (fx, fy, cx,
    cy). Autodiff happens wrt these.
    """
    if dk is None:
        dk = jnp.zeros(4)
    fx, fy, cx, cy = (K[0] + dk[0], K[1] + dk[1], K[2] + dk[2], K[3] + dk[3])
    c2w_h = pose_h @ se3_exp(-dx_h[:6])       # left-increment on world-to-cam
    c2w_t = pose_t @ se3_exp(-dx_t[:6])
    a_h = aff_h[0] + dx_h[6]
    b_h = aff_h[1] + dx_h[7]
    a_t = aff_t[0] + dx_t[6]
    b_t = aff_t[1] + dx_t[7]

    T_th = se3_inverse(c2w_t) @ c2w_h          # host -> target
    R, t = T_th[:3, :3], T_th[:3, 3]

    u = uv[0] + PATTERN[:, 0]
    v = uv[1] + PATTERN[:, 1]
    ray = jnp.stack([(u - cx) / fx, (v - cy) / fy, jnp.ones(8)], -1)
    q = ray @ R.T + t[None] * id_n
    qz = q[:, 2]
    qz_safe = jnp.where(qz > 1e-6, qz, 1.0)
    px = fx * q[:, 0] / qz_safe + cx
    py = fy * q[:, 1] / qz_safe + cy

    H, W = img_t.shape
    ok = (qz > 1e-6) & (px > 2) & (px < W - 3) & (py > 2) & (py < H - 3)

    hit = _bilinear(img_t, px, py)
    gain = jnp.exp(a_t - a_h)
    r = hit - gain * colors - (b_t - gain * b_h)
    return jnp.where(ok, r, 0.0), ok


def _image_gradients(images):
    """Central-difference gradients of (F, H, W) images."""
    gx = jnp.zeros_like(images)
    gy = jnp.zeros_like(images)
    gx = gx.at[:, :, 1:-1].set(0.5 * (images[:, :, 2:] - images[:, :, :-2]))
    gy = gy.at[:, 1:-1, :].set(0.5 * (images[:, 2:, :] - images[:, :-2, :]))
    return gx, gy


def _flat_trilerp(stacked, px, py, f_idx, H, W):
    """Bilinear-sample (F, H, W, C) ``stacked`` at (px, py) where axis 1 of
    px/py is the frame (px[:, f] samples frame f). The four bilinear corners
    are packed side by side into (H-1, W-1, 4C) rows (TPU gather cost scales
    with row count, not width — one 4C-row gather is ~10x faster than four
    C-row gathers) and each frame is gathered from ITS OWN table: per-frame
    tables stay under the ~34 MB cache cliff past which TPU gather
    throughput drops ~5x (the F-folded table was 147 MB). Callers mask
    samples near the border, so the index clip never changes a used value.

    :param f_idx: unused (kept for signature stability); the frame IS axis 1
    """
    F = stacked.shape[0]
    C = stacked.shape[-1]
    packed = jnp.concatenate(
        [stacked[:, :-1, :-1], stacked[:, :-1, 1:],
         stacked[:, 1:, :-1], stacked[:, 1:, 1:]], -1)  # (F, H-1, W-1, 4C)
    N = px.shape[0]
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    xi = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    yi = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    base = yi * (W - 1) + xi                           # (N, F, 8)
    wts = jnp.stack([(1 - wx) * (1 - wy), wx * (1 - wy),
                     (1 - wx) * wy, wx * wy], -1)      # (N, F, 8, 4)
    outs = []
    for f in range(F):
        rows = packed[f].reshape(-1, 4 * C)[base[:, f].reshape(-1)]
        v = rows.reshape(-1, 4, C)
        outs.append(jnp.einsum("mkc,mk->mc", v,
                               wts[:, f].reshape(-1, 4)).reshape(N, -1, C))
    return jnp.stack(outs, 1)                          # (N, F, 8, C)


def _system_terms(state: BAState, images, K, newest_slot=None):
    """Residuals + analytic Jacobians for all (point, target) pairs.

    DSO-style hand-derived Jacobians (the reference's linearize residual,
    Residuals.cpp) instead of autodiff: intensity+gradient sampling for all
    (N, F, 8) pattern pixels is ONE fused wide-row gather, and the pose/
    affine/idepth Jacobians are closed-form — an order of magnitude cheaper
    than jacfwd-per-pair on TPU.

    :param images: (F, H, W) level-0 intensities
    :param newest_slot: window slot of the newest keyframe — source of the
        adaptive pair-outlier threshold (setNewFrameEnergyTH); None falls
        back to the quantile over ALL active pairs.
    :return: r (N, F, 8), J_frames (N, F, 8, 16) wrt [host(8), target(8)]
        with per-slot layout [xi(6), a, b], J_id (N, F, 8), J_K (N, F, 8, 4)
        wrt (fx, fy, cx, cy), w (N, F, 8), active (N, F), e_total (scalar
        huber energy with outlier pairs clamped at the threshold)
    """
    # Effective calibration = boot K + the solve's calib correction (DSO
    # CalibHessian value_scaled = initial + step).
    fx = K[0] + state.calib[0]
    fy = K[1] + state.calib[1]
    cx = K[2] + state.calib[2]
    cy = K[3] + state.calib[3]
    F, H, W = images.shape
    N = state.pt_frame.shape[0]

    pose_h = state.poses[state.pt_frame]          # (N, 4, 4)
    aff_h = state.aff[state.pt_frame]             # (N, 2)

    # Relative transforms T_th = w2c_t @ c2w_h for all (N, F)
    w2c_t = se3_inverse(state.poses)              # (F, 4, 4)
    T = jnp.einsum("fij,njk->nfik", w2c_t, pose_h)  # (N, F, 4, 4)
    R = T[..., :3, :3]
    t = T[..., :3, 3]

    # Pattern rays in the host frame (N, 8, 3)
    u = state.pt_uv[:, 0:1] + PATTERN[None, :, 0]
    v = state.pt_uv[:, 1:2] + PATTERN[None, :, 1]
    ray = jnp.stack([(u - cx) / fx, (v - cy) / fy, jnp.ones_like(u)], -1)

    idn = state.pt_idepth[:, None, None]          # (N, 1, 1)
    q = (jnp.einsum("nfij,npj->nfpi", R, ray)
         + t[:, :, None, :] * idn[..., None])     # (N, F, 8, 3)
    qz = q[..., 2]
    qz_safe = jnp.where(qz > 1e-6, qz, 1.0)
    px = fx * q[..., 0] / qz_safe + cx
    py = fy * q[..., 1] / qz_safe + cy
    ok = (qz > 1e-6) & (px > 2) & (px < W - 3) & (py > 2) & (py < H - 3)

    # One gather for intensity + gradients of all samples
    gx_im, gy_im = _image_gradients(images)
    stacked = jnp.stack([images, gx_im, gy_im], -1)  # (F, H, W, 3)
    f_idx = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[None, :, None],
                             px.shape)
    samp = _flat_trilerp(stacked, px, py, f_idx, H, W)
    hit, gx, gy = samp[..., 0], samp[..., 1], samp[..., 2]

    # Residual with the relative exposure-affine model
    a_t = state.aff[None, :, 0:1]                 # (1, F, 1)
    b_t = state.aff[None, :, 1:2]
    a_h = aff_h[:, None, 0:1]                     # (N, 1, 1)
    b_h = aff_h[:, None, 1:2]
    gain = jnp.exp(a_t - a_h)
    colors = state.pt_color[:, None, :]           # (N, 1, 8)
    r = hit - gain * colors - (b_t - gain * b_h)
    r = jnp.where(ok, r, 0.0)

    # --- analytic Jacobians -------------------------------------------
    # d pixel / d q
    inv_z = 1.0 / qz_safe
    du_dq = jnp.stack([fx * inv_z, jnp.zeros_like(inv_z),
                       -fx * q[..., 0] * inv_z * inv_z], -1)  # (N, F, 8, 3)
    dv_dq = jnp.stack([jnp.zeros_like(inv_z), fy * inv_z,
                       -fy * q[..., 1] * inv_z * inv_z], -1)
    g_dq = gx[..., None] * du_dq + gy[..., None] * dv_dq      # dr/dq

    def hat(p):
        z = jnp.zeros_like(p[..., 0])
        return jnp.stack([
            jnp.stack([z, -p[..., 2], p[..., 1]], -1),
            jnp.stack([p[..., 2], z, -p[..., 0]], -1),
            jnp.stack([-p[..., 1], p[..., 0], z], -1)], -2)

    # Increment convention matches ba_iterate's update c2w <- c2w exp(-dx)
    # (equivalently w2c <- exp(dx) w2c).
    # Target frame: dq/dv = id I, dq/dw = -hat(q).
    Jt_v = idn[..., None] * g_dq                               # (N, F, 8, 3)
    Jt_w = -jnp.einsum("nfpi,nfpij->nfpj", g_dq, hat(q))
    # Host frame: dq/dv = -id R, dq/dw = R hat(ray).
    g_R = jnp.einsum("nfpi,nfij->nfpj", g_dq, R)               # g^T R
    Jh_v = -idn[..., None] * g_R
    hat_ray = hat(ray)                                         # (N, 8, 3, 3)
    Jh_w = jnp.einsum("nfpi,npij->nfpj", g_R, hat_ray)
    # Affine: dr/da_t = -gain (c - b_h), dr/db_t = -1;
    #         dr/da_h = +gain (c - b_h), dr/db_h = +gain
    dgain = gain * (colors - b_h)                              # (N, F, 8)
    Jt_a = -dgain
    Jt_b = -jnp.ones_like(r)
    Jh_a = dgain
    Jh_b = gain * jnp.ones_like(r)
    # idepth: dq/did = t
    Ji = jnp.einsum("nfpi,nfi->nfp", g_dq, t)

    # Calibration (fx, fy, cx, cy): K enters twice — host back-projection
    # ray = K^-1 [u v 1] and target projection p = K q / qz (DSO's
    # ResidualProjections projectPoint both-sides derivative):
    #   d ray/d fx = [-rx/fx, 0, 0], d ray/d cx = [-1/fx, 0, 0] (sym. y)
    #   direct: d px/d fx = q0/qz, d px/d cx = 1 (sym. y)
    # chain term g^T R col_k is already available as g_R.
    rx = ray[..., 0][:, None, :]                               # (N, 1, 8)
    ry = ray[..., 1][:, None, :]
    J_fx = gx * q[..., 0] * inv_z - (rx / fx) * g_R[..., 0]
    J_fy = gy * q[..., 1] * inv_z - (ry / fy) * g_R[..., 1]
    J_cx = gx - g_R[..., 0] / fx
    J_cy = gy - g_R[..., 1] / fy
    J_K = jnp.stack([J_fx, J_fy, J_cx, J_cy], -1)              # (N, F, 8, 4)

    Jf = jnp.concatenate([
        Jh_v, Jh_w, Jh_a[..., None], Jh_b[..., None],
        Jt_v, Jt_w, Jt_a[..., None], Jt_b[..., None]], -1)     # (N, F, 8, 16)

    tgt = jnp.arange(F)
    active = (state.pt_valid[:, None] & state.frame_valid[None, :]
              & (state.pt_frame[:, None] != tgt[None, :]))
    absr = jnp.abs(r)
    hw = jnp.where(absr < HUBER_TH, 1.0, HUBER_TH / jnp.maximum(absr, 1e-9))
    # Gradient-dependent downweight (Residuals.cpp:203):
    # w = sqrt(c^2 / (c^2 + |grad I_t|^2)), c = 50 — high-gradient samples
    # (where occlusion boundaries and interpolation error live) count less.
    wg = jnp.sqrt(OUTLIER_TH_SUM_COMPONENT
                  / (OUTLIER_TH_SUM_COMPONENT + gx * gx + gy * gy))
    mask = ok.astype(jnp.float32) * active[..., None].astype(jnp.float32)

    # Per-(point, target) PAIR outlier gate (Residuals.cpp:262-266): the
    # pair's huber energy  sum_p wg^2 hw (2-hw) r^2  is compared to an
    # adaptive frame energy threshold and OUTLIER pairs are cut from the
    # Hessian entirely (their energy clamps at the threshold). This is the
    # mechanism that keeps occluded observations — a point passing behind
    # foreground geometry in SOME target frames — from biasing the window:
    # Huber alone still pulls with |r|*k forever, the gate removes the pair.
    e_px = wg * wg * hw * (2.0 - hw) * r * r * mask
    e_pair = jnp.sum(e_px, axis=2)                          # (N, F)
    pair_active = active & jnp.any(ok, axis=2)
    # Adaptive threshold (setNewFrameEnergyTH, FullSystemOptimize.cpp:93-
    # 131): nth = sqrt(0.7-quantile of pair energies into the NEWEST frame),
    # TH = (0.5*26 + 0.5*1.5*nth)^2. Deviation: one global TH instead of a
    # per-frame max(host, target) — the window shares one capture regime.
    sel = pair_active & ((tgt[None, :] == newest_slot) if newest_slot
                         is not None else True)
    vals = jnp.where(sel, e_pair, jnp.nan)
    nth = jnp.sqrt(jnp.maximum(jnp.nanquantile(vals, 0.7), 0.0))
    th = jnp.square(0.5 * 26.0 + 0.5 * 1.5 * nth)
    th = jnp.where(jnp.isfinite(th), th, 144.0 * 8.0)
    inlier = (e_pair <= th)[..., None].astype(jnp.float32)

    w = wg * hw * mask * inlier
    # Total energy with outlier pairs clamped at TH (DSO's accept/reject
    # quantity: linearizeAll sums energyLeft, outliers contribute TH).
    e_total = jnp.sum(jnp.where(pair_active, jnp.minimum(e_pair, th), 0.0))
    return r, Jf, Ji, J_K, w, active, e_total


def _assemble(state: BAState, r, Jf, Ji, J_K, w):
    """Build the Schur-reduced frame+calib system (8F+4 columns; the 4
    calib columns are global — every residual contributes directly)."""
    F = state.poses.shape[0]
    N = state.pt_frame.shape[0]
    P = F * 8 + 4

    host_oh = jax.nn.one_hot(state.pt_frame, F)          # (N, F)
    tgt_oh = jnp.eye(F)                                   # (F, F)

    # G (N, Ftgt, 8res, F, 8par): host part scattered by host_oh, target by f.
    Jh = Jf[..., :8]
    Jt = Jf[..., 8:]
    G = (Jh[:, :, :, None, :] * host_oh[:, None, None, :, None]
         + Jt[:, :, :, None, :] * tgt_oh[None, :, None, :, None])
    G = jnp.concatenate([G.reshape(N, F, 8, F * 8), J_K], -1)

    wG = G * w[..., None]
    H_ff = jnp.einsum("nfrp,nfrq->pq", wG, G)
    b_f = jnp.einsum("nfrp,nfr->p", wG, r)

    H_pp = jnp.einsum("nfr,nfr->n", w * Ji, Ji)           # (N,)
    H_fp = jnp.einsum("nfrp,nfr->np", wG, Ji)             # (N, P)
    b_p = jnp.einsum("nfr,nfr->n", w * Ji, r)             # (N,)

    energy = jnp.sum(w * r * r)
    return H_ff, b_f, H_pp, H_fp, b_p, energy


def _total_energy(state: BAState, images, K):
    """Residual energy + marginalization-prior energy at the current
    estimate (the quantity DSO's LM accept/reject compares,
    FullSystemOptimize.cpp:470-545 + calcMEnergy)."""
    r, Jf, Ji, J_K, w, active, e_res = _system_terms(state, images, K)
    d = _prior_delta(state)
    e_pr = 2.0 * jnp.dot(state.bm, d) + jnp.dot(d, state.Hm @ d)
    return e_res + e_pr


@partial(jax.jit, static_argnums=(3,))
@partial(jax.jit, static_argnums=(3, 4, 5))
def ba_iterate(state: BAState, images, K, iters: int = 6,
               idepth_prior: float = 1e-1, newest_slot=None):
    """Windowed LM with energy-based accept/reject. One jitted program —
    run eagerly this composition dispatched dozens of mini-programs and
    measured 20 ms vs 12 jitted (the round-5 program-count law).

    Parity target: FullSystemOptimize.cpp:470-545 — solve, apply, compare
    total energy; accept -> lambda x0.25, reject -> revert + lambda x1e2;
    stop when the step is tiny (canbreak). The marginalization prior enters
    with first-estimate Jacobians: H stays fixed, b is evaluated as
    bm + Hm @ delta(x, x_lin) (FEJ).

    :param images: (F, H, W); K: (fx, fy, cx, cy) tuple of scalars (boot
        calibration; the solve's 4 calib parameters correct it via
        state.calib, anchored by the prior seeded in create_ba_state)
    :return: (new_state, energy)
    """
    F = state.poses.shape[0]
    P = F * 8 + 4

    # Gauge priors: lock frame 0 (pose+aff); weak idepth prior. The calib
    # anchor lives in the marginalization prior (create_ba_state).
    gauge = jnp.zeros((P,)).at[:8].set(1e8)

    def prior_energy(cur):
        d = _prior_delta(cur)
        return 2.0 * jnp.dot(cur.bm, d) + jnp.dot(d, cur.Hm @ d)

    def system_of(cur):
        r, Jf, Ji, J_K, w, _, e_res = _system_terms(cur, images, K,
                                                    newest_slot)
        H_ff, b_f, H_pp, H_fp, b_p, _ = _assemble(cur, r, Jf, Ji, J_K, w)
        return H_ff, b_f, H_pp, H_fp, b_p, e_res + prior_energy(cur)

    # The residual system of the ACCEPTED state rides in the loop carry so
    # each LM iteration evaluates _system_terms exactly ONCE (the candidate
    # evaluation doubles as the next iteration's system on accept; XLA
    # cannot CSE across while_loop iterations).
    sys0 = system_of(state)

    def cond(carry):
        it, done, *_ = carry
        return (it < iters) & ~done

    def body(carry):
        (it, done, poses, aff, idepth, calib, lam, energy,
         H_ff_r, b_f_r, H_pp, H_fp, b_p) = carry
        cur = state._replace(poses=poses, aff=aff, pt_idepth=idepth,
                             calib=calib)

        # FEJ prior: fixed Hm, b transported to the current estimate.
        d = _prior_delta(cur)
        H_ff = H_ff_r + cur.Hm + jnp.diag(gauge)
        b_f = b_f_r + cur.bm + cur.Hm @ d

        H_pp_safe = H_pp + idepth_prior
        # Schur complement over points
        H_sc = jnp.einsum("np,n,nq->pq", H_fp, 1.0 / H_pp_safe, H_fp)
        b_sc = jnp.einsum("np,n->p", H_fp, b_p / H_pp_safe)

        A = H_ff - H_sc + lam * jnp.diag(jnp.diag(H_ff)) \
            + 1e-6 * jnp.eye(P)
        rhs = -(b_f - b_sc)
        dx = solve_gauss_jordan(A, rhs, P)                # (P,)

        d_id = -(b_p + H_fp @ dx) / H_pp_safe             # (N,)
        d_id = jnp.where(cur.pt_valid, d_id, 0.0)

        # Numerical safety: a degenerate window (e.g. zero active points)
        # must not poison the state with NaNs.
        finite = jnp.isfinite(dx).all() & jnp.isfinite(d_id).all()
        dx = jnp.where(finite, dx, 0.0)
        d_id = jnp.where(finite, d_id, 0.0)

        dxf = dx[:F * 8].reshape(F, 8)
        upd = cur.frame_valid[:, None]
        new_poses = jnp.einsum(
            "fij,fjk->fik", poses,
            se3_exp(-jnp.where(upd, dxf[:, :6], 0.0)))
        new_aff = aff + jnp.where(upd, dxf[:, 6:], 0.0)
        new_id = jnp.clip(idepth + d_id, 1e-4, 1e3)
        new_calib = calib + dx[F * 8:]

        cand = state._replace(poses=new_poses, aff=new_aff,
                              pt_idepth=new_id, calib=new_calib)
        cH_ff, cb_f, cH_pp, cH_fp, cb_p, e_new = system_of(cand)
        accept = jnp.isfinite(e_new) & (e_new < energy)

        # canbreak: accepted step that is already tiny
        step = jnp.max(jnp.abs(dx))
        done_new = (accept & (step < 1e-5)) | (~accept & (lam > 1e5))
        lam_new = jnp.where(accept, jnp.maximum(lam * 0.25, 1e-6),
                            jnp.minimum(lam * 1e2, 1e7))
        sel = lambda a, b: jnp.where(accept, a, b)
        return (it + 1, done_new,
                sel(new_poses, poses), sel(new_aff, aff),
                sel(new_id, idepth), sel(new_calib, calib), lam_new,
                jnp.where(accept, e_new, energy),
                sel(cH_ff, H_ff_r), sel(cb_f, b_f_r), sel(cH_pp, H_pp),
                sel(cH_fp, H_fp), sel(cb_p, b_p))

    carry = (jnp.int32(0), jnp.bool_(False), state.poses, state.aff,
             state.pt_idepth, state.calib, jnp.float32(1e-3), sys0[5],
             sys0[0], sys0[1], sys0[2], sys0[3], sys0[4])
    carry = lax.while_loop(cond, body, carry)
    _, _, poses, aff, idepth, calib, _, energy, *_ = carry
    return state._replace(poses=poses, aff=aff, pt_idepth=idepth,
                          calib=calib), energy


@jax.jit
def ba_log_system(state: BAState, images, K):
    """Schur-reduced window system for debug logging — DSO's ``lastHS`` /
    ``lastbS`` (EnergyFunctional.cpp:842-848: HFinal_top = HL+HM+HA;
    lastHS = HFinal_top - H_sc), consumed by printEigenValLine
    (FullSystem.cpp:1709-1781). Column layout matches DSO: 4 calib (CPARS)
    columns FIRST, then 8 per frame — the repo's solver keeps calib last,
    so logs stay diffable against reference dumps.

    :return: (H (P, P), b (P,), nullspaces (P, 9), n_active_residuals)
        with P = 8F + 4.
    """
    F = state.poses.shape[0]
    r, Jf, Ji, J_K, w, active, _ = _system_terms(state, images, K)
    H_ff, b_f, H_pp, H_fp, b_p, _ = _assemble(state, r, Jf, Ji, J_K, w)
    d = _prior_delta(state)
    H = H_ff + state.Hm
    b = b_f + state.bm + state.Hm @ d
    H_pp_safe = H_pp + 1e-1
    H = H - jnp.einsum("np,n,nq->pq", H_fp, 1.0 / H_pp_safe, H_fp)
    b = b - jnp.einsum("np,n->p", H_fp, b_p / H_pp_safe)
    perm = jnp.concatenate([jnp.arange(F * 8, F * 8 + 4),
                            jnp.arange(F * 8)])
    ns = gauge_nullspaces(state.poses, state.frame_valid)[perm]
    # active: per-(point, frame) residual activity -> DSO's resInA count
    n_active = jnp.sum(active.astype(jnp.int32))
    return H[perm][:, perm], b[perm], ns, n_active


@jax.jit
def remove_outliers(state: BAState, images, K,
                    energy_threshold: float = 12.0 ** 2):
    """Deactivate points whose mean per-pixel residual energy across their
    active observations exceeds the threshold (FullSystem removeOutliers /
    flagPointsForRemoval semantics). Pairs cut by the per-pair outlier gate
    have w == 0, so a point whose observations are ALL outliers loses its
    n_obs and is dropped (DSO drops points with no IN residuals)."""
    r, Jf, Ji, J_K, w, active, _ = _system_terms(state, images, K)
    ok = (w > 0).astype(jnp.float32)
    e = jnp.sum(r * r * ok, axis=(1, 2)) / jnp.maximum(
        jnp.sum(ok, axis=(1, 2)), 1.0)
    n_obs = jnp.sum(jnp.any(w > 0, axis=2), axis=1)
    bad = (e > energy_threshold) | (n_obs < 1)
    return state._replace(pt_valid=state.pt_valid & ~bad)


@jax.jit
def marginalize_frame(state: BAState, images, K, frame_idx):
    """Fold one frame's parameters into the prior (Hm, bm) and deactivate it.

    DSO parity target: EnergyFunctional::marginalizeFrame (Schur elimination
    of the frame block, EnergyFunctional.cpp:80-). Only the residuals that
    INVOLVE the dropped frame are folded — the surviving active residuals
    stay live in future solves (folding the full Hessian would double-count
    their energy on every marginalization and blow up the prior). Points
    hosted in the marginalized frame are dropped after their information is
    absorbed (the reference marginalizes good ones via flagPointsForRemoval).
    """
    F = state.poses.shape[0]
    P = F * 8 + 4

    r, Jf, Ji, J_K, w, active, _ = _system_terms(state, images, K)
    # Keep only residual pairs that involve the marginalized frame.
    involved = ((state.pt_frame[:, None] == frame_idx)
                | (jnp.arange(F)[None, :] == frame_idx))       # (N, F)
    w = w * involved[..., None].astype(w.dtype)
    H_ff, b_f, H_pp, H_fp, b_p, _ = _assemble(state, r, Jf, Ji, J_K, w)

    # Schur-eliminate the involved points' idepths from this sub-system
    # (their host-frame block couples through H_fp).
    H_pp_safe = H_pp + 1e-1
    H_ff = H_ff - jnp.einsum("np,n,nq->pq", H_fp, 1.0 / H_pp_safe, H_fp)
    b_f = b_f - jnp.einsum("np,n->p", H_fp, b_p / H_pp_safe)

    # Transport the old prior's b to the current estimate (FEJ: Hm fixed,
    # linearization point moves to the current state below).
    d_old = _prior_delta(state)
    H = H_ff + state.Hm
    b = b_f + state.bm + state.Hm @ d_old

    sl = frame_idx * 8
    idx = jnp.arange(P)
    keep = ~((idx >= sl) & (idx < sl + 8))

    Hbb8 = lax.dynamic_slice(H, (sl, sl), (8, 8)) + 1e-4 * jnp.eye(8)
    Hab = jnp.where(keep[:, None] & ~keep[None, :], H, 0.0)
    Hab8 = lax.dynamic_slice(Hab, (0, sl), (P, 8))       # (P, 8)
    bb8 = lax.dynamic_slice(b, (sl,), (8,))

    Hbb_inv = inv_psd_small(Hbb8, 8)
    Hm_new = H - Hab8 @ Hbb_inv @ Hab8.T
    bm_new = b - Hab8 @ (Hbb_inv @ bb8)
    Hm_new = jnp.where(keep[:, None] & keep[None, :], Hm_new, 0.0)
    Hm_new = 0.5 * (Hm_new + Hm_new.T)                   # keep symmetric
    bm_new = jnp.where(keep, bm_new, 0.0)

    new_frame_valid = state.frame_valid.at[frame_idx].set(False)
    # Orthogonalize against the gauge nullspace at the new linearization
    # point so the prior carries no information along unobservable
    # directions (EnergyFunctional.cpp:718).
    ns = gauge_nullspaces(state.poses, new_frame_valid)
    Hm_new, bm_new = _orthogonalize_prior(Hm_new, bm_new, ns)

    drop_pts = state.pt_frame == frame_idx
    return state._replace(
        frame_valid=new_frame_valid,
        pt_valid=state.pt_valid & ~drop_pts,
        Hm=Hm_new, bm=bm_new,
        poses_lin=state.poses, aff_lin=state.aff,
        calib_lin=state.calib)
