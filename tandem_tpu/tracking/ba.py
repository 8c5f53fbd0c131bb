"""Sliding-window photometric bundle adjustment on TPU.

Re-design of DSO's optimization backend (tandem/src/OptimizationBackend/
EnergyFunctional.{h,cpp}, AccumulatedTopHessian/AccumulatedSCHessian,
FullSystemOptimize.cpp:408-560): the hand-derived SSE 13x13 accumulators
become autodiff Jacobians (jax.jacfwd of the 8-pattern photometric residual)
assembled into the frame Hessian with one-hot einsums, and the per-point
Schur complement is a vectorized rank-1 elimination (each point's inverse
depth is scalar).

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

from ..core.se3 import se3_exp, se3_inverse
from ..ops.linalg import inv_psd_small, solve_psd

# DSO's 8-point residual pattern (tandem/src/util/settings.h staticPattern).
PATTERN = np.array([[0, -2], [-1, -1], [1, -1], [-2, 0],
                    [0, 0], [2, 0], [-1, 1], [0, 2]], np.float32)

HUBER_TH = 9.0


class BAState(NamedTuple):
    poses: jnp.ndarray       # (F, 4, 4) cam_to_world
    aff: jnp.ndarray         # (F, 2) (a, b)
    frame_valid: jnp.ndarray  # (F,) bool
    pt_frame: jnp.ndarray    # (N,) int32 host frame slot
    pt_uv: jnp.ndarray       # (N, 2) float32 pixel in host frame
    pt_idepth: jnp.ndarray   # (N,) float32
    pt_color: jnp.ndarray    # (N, 8) host pattern intensities
    pt_valid: jnp.ndarray    # (N,) bool
    # Marginalization prior over frame parameters (8 per slot): H, b with
    # energy 0.5 dx^T H dx + b^T dx around the current linearization.
    Hm: jnp.ndarray          # (F*8, F*8)
    bm: jnp.ndarray          # (F*8,)


def create_ba_state(num_frames: int, num_points: int) -> BAState:
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
        Hm=jnp.zeros((F * 8, F * 8)),
        bm=jnp.zeros((F * 8,)),
    )


def _bilinear(img, x, y):
    H, W = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    xi = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    yi = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    f = img.reshape(-1)
    i = yi * W + xi
    return (f[i] * (1 - wx) * (1 - wy) + f[i + 1] * wx * (1 - wy)
            + f[i + W] * (1 - wx) * wy + f[i + W + 1] * wx * wy)


def _residual_one(dx_h, dx_t, id_n, pose_h, pose_t, aff_h, aff_t, uv, colors,
                  img_t, K):
    """8-pattern residual of one point in one target frame.

    dx_h/dx_t: (8,) parameter increments [xi(6), da, db] applied on top of the
    linearization (pose_*, aff_*). Autodiff happens wrt these.
    """
    fx, fy, cx, cy = K
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


def _system_terms(state: BAState, images, K):
    """Residuals + Jacobians for all (point, target) pairs.

    :param images: (F, H, W) level-0 intensities
    :return: r (N, F, 8), J_frames (N, F, 8, 16) wrt [host(8), target(8)],
        J_id (N, F, 8), weight (N, F, 8), active (N, F)
    """
    F = state.poses.shape[0]
    N = state.pt_frame.shape[0]

    pose_h = state.poses[state.pt_frame]          # (N, 4, 4)
    aff_h = state.aff[state.pt_frame]             # (N, 2)

    def per_pair(pose_h_n, aff_h_n, uv_n, col_n, id_n, pose_t, aff_t, img_t):
        zero8 = jnp.zeros(8)

        def f(dh, dt, di):
            r, ok = _residual_one(dh, dt, id_n + di, pose_h_n, pose_t,
                                  aff_h_n, aff_t, uv_n, col_n, img_t, K)
            return r

        r, ok = _residual_one(zero8, zero8, id_n, pose_h_n, pose_t, aff_h_n,
                              aff_t, uv_n, col_n, img_t, K)
        Jh, Jt, Ji = jax.jacfwd(f, argnums=(0, 1, 2))(zero8, zero8, 0.0)
        return r, ok, jnp.concatenate([Jh, Jt], -1), Ji

    # vmap over targets then over points.
    over_targets = jax.vmap(per_pair, in_axes=(None, None, None, None, None,
                                               0, 0, 0))
    over_points = jax.vmap(over_targets, in_axes=(0, 0, 0, 0, 0, None, None,
                                                  None))
    r, ok, Jf, Ji = over_points(pose_h, aff_h, state.pt_uv, state.pt_color,
                                state.pt_idepth, state.poses, state.aff,
                                images)
    # r (N, F, 8), Jf (N, F, 8, 16), Ji (N, F, 8)

    tgt = jnp.arange(F)
    active = (state.pt_valid[:, None] & state.frame_valid[None, :]
              & (state.pt_frame[:, None] != tgt[None, :]))
    absr = jnp.abs(r)
    hw = jnp.where(absr < HUBER_TH, 1.0, HUBER_TH / jnp.maximum(absr, 1e-9))
    w = hw * ok.astype(jnp.float32) * active[..., None].astype(jnp.float32)
    return r, Jf, Ji, w, active


def _assemble(state: BAState, r, Jf, Ji, w):
    """Build the Schur-reduced frame system."""
    F = state.poses.shape[0]
    N = state.pt_frame.shape[0]
    P = F * 8

    host_oh = jax.nn.one_hot(state.pt_frame, F)          # (N, F)
    tgt_oh = jnp.eye(F)                                   # (F, F)

    # G (N, Ftgt, 8res, F, 8par): host part scattered by host_oh, target by f.
    Jh = Jf[..., :8]
    Jt = Jf[..., 8:]
    G = (Jh[:, :, :, None, :] * host_oh[:, None, None, :, None]
         + Jt[:, :, :, None, :] * tgt_oh[None, :, None, :, None])
    G = G.reshape(N, F, 8, P)

    wG = G * w[..., None]
    H_ff = jnp.einsum("nfrp,nfrq->pq", wG, G)
    b_f = jnp.einsum("nfrp,nfr->p", wG, r)

    H_pp = jnp.einsum("nfr,nfr->n", w * Ji, Ji)           # (N,)
    H_fp = jnp.einsum("nfrp,nfr->np", wG, Ji)             # (N, P)
    b_p = jnp.einsum("nfr,nfr->n", w * Ji, r)             # (N,)

    energy = jnp.sum(w * r * r)
    return H_ff, b_f, H_pp, H_fp, b_p, energy


@partial(jax.jit, static_argnums=(3,))
def ba_iterate(state: BAState, images, K, iters: int = 4,
               idepth_prior: float = 1e-1, lm_lambda: float = 1e-3):
    """Run GN/LM iterations of the windowed BA.

    :param images: (F, H, W); K: (fx, fy, cx, cy) tuple of scalars
    :return: (new_state, energy)
    """
    F = state.poses.shape[0]
    P = F * 8

    # Gauge priors: lock frame 0 (pose+aff); weak idepth prior.
    gauge = jnp.zeros((P,)).at[:8].set(1e8)

    def one_iter(carry, _):
        state, _ = carry
        r, Jf, Ji, w, active = _system_terms(state, images, K)
        H_ff, b_f, H_pp, H_fp, b_p, energy = _assemble(state, r, Jf, Ji, w)

        H_ff = H_ff + state.Hm + jnp.diag(gauge)
        b_f = b_f + state.bm

        H_pp_safe = H_pp + idepth_prior
        # Schur complement over points
        H_sc = jnp.einsum("np,n,nq->pq", H_fp, 1.0 / H_pp_safe, H_fp)
        b_sc = jnp.einsum("np,n->p", H_fp, b_p / H_pp_safe)

        A = H_ff - H_sc + lm_lambda * jnp.diag(jnp.diag(H_ff)) \
            + 1e-6 * jnp.eye(P)
        rhs = -(b_f - b_sc)
        dx = solve_psd(A, rhs)                            # (P,)

        d_id = -(b_p + H_fp @ dx) / H_pp_safe             # (N,)
        d_id = jnp.where(state.pt_valid, d_id, 0.0)

        dxf = dx.reshape(F, 8)
        upd = state.frame_valid[:, None]
        new_poses = jnp.einsum(
            "fij,fjk->fik", state.poses,
            se3_exp(-jnp.where(upd, dxf[:, :6], 0.0)))
        new_aff = state.aff + jnp.where(upd, dxf[:, 6:], 0.0)
        new_id = jnp.clip(state.pt_idepth + d_id, 1e-4, 1e3)

        new_state = state._replace(poses=new_poses, aff=new_aff,
                                   pt_idepth=new_id)
        return (new_state, energy), energy

    (state, energy), _ = lax.scan(one_iter, (state, jnp.float32(0.0)),
                                  None, length=iters)
    return state, energy


@jax.jit
def remove_outliers(state: BAState, images, K,
                    energy_threshold: float = 12.0 ** 2):
    """Deactivate points whose mean per-pixel residual energy across their
    active observations exceeds the threshold (FullSystem removeOutliers /
    flagPointsForRemoval semantics)."""
    r, Jf, Ji, w, active = _system_terms(state, images, K)
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
    of the frame block, EnergyFunctional.cpp:80-). Points hosted in the
    marginalized frame are dropped (the reference marginalizes good ones into
    the prior first — FullSystem flagPointsForRemoval).
    """
    F = state.poses.shape[0]
    P = F * 8

    r, Jf, Ji, w, active = _system_terms(state, images, K)
    H_ff, b_f, H_pp, H_fp, b_p, _ = _assemble(state, r, Jf, Ji, w)
    H = H_ff + state.Hm
    b = b_f + state.bm

    sl = frame_idx * 8
    idx = jnp.arange(P)
    in_blk = (idx >= sl) & (idx < sl + 8)

    # Permute the marginalized block to the end implicitly via masking math:
    # H = [[Haa, Hab], [Hba, Hbb]] with b-block = the frame; prior update
    # Haa' = Haa - Hab Hbb^-1 Hba.
    keep = ~in_blk
    Hbb = jnp.where(in_blk[:, None] & in_blk[None, :], H, 0.0)
    # Extract the dense 8x8 block via dynamic slice
    Hbb8 = lax.dynamic_slice(H, (sl, sl), (8, 8)) + 1e-6 * jnp.eye(8)
    Hab = jnp.where(keep[:, None] & in_blk[None, :], H, 0.0)
    Hab8 = lax.dynamic_slice(Hab, (0, sl), (P, 8))       # (P, 8), rows b-blk 0
    bb8 = lax.dynamic_slice(b, (sl,), (8,))

    Hbb_inv = inv_psd_small(Hbb8, 8)
    Hm_new = H - Hab8 @ Hbb_inv @ Hab8.T
    bm_new = b - Hab8 @ (Hbb_inv @ bb8)
    # Zero out the marginalized row/col entirely.
    Hm_new = jnp.where(keep[:, None] & keep[None, :], Hm_new, 0.0)
    bm_new = jnp.where(keep, bm_new, 0.0)

    drop_pts = state.pt_frame == frame_idx
    return state._replace(
        frame_valid=state.frame_valid.at[frame_idx].set(False),
        pt_valid=state.pt_valid & ~drop_pts,
        Hm=Hm_new, bm=bm_new)
