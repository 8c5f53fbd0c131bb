"""dvo-core DenseTracker: bivariate (intensity + depth) RGB-D alignment.

TPU-native re-design of the vendored Dense Visual Odometry tracker the
reference uses in RGB-D mode (tandem/src/dvo-core/):

- ``DenseTracker::match`` (dense_tracking.cpp:132-424): per-level IRLS loop —
  warp reference points, bivariate residual r = [r_I, r_Z], multivariate
  Student-t scale/weight estimation, 2x6 Jacobian normal equations, LM
  damping with log-likelihood accept/revert.
- ``computeResiduals`` (dense_tracking_impl.cpp:36-121 scalar form, :134-395
  SSE): the 8-channel "acceleration structure" [I, Z, Idx, Idy, Zdx, Zdy]
  is bilinearly sampled at the projected reference points; the reference
  intensity gets the affine light model a*I+b; the reference depth channel
  is replaced by the z of the transformed point so r_Z = Z_cur(warped) - z;
  occlusion gate r_Z > -20 * sigma_z(Z_ref) (depthStdDevZ :123-129).
- ``computeWeights`` / ``computeScale`` (dense_tracking_impl.cpp:643-660,
  569-590): w_i = (nu+2) / (nu + r^T Lambda r), Sigma = 1/(n-3) sum w r r^T,
  Lambda = Sigma^-1 — the 2D t-distribution IRLS (nu = 5).
- ``computeCompleteDataLogLikelihood`` (dense_tracking_impl.cpp:409-430).
- Jacobians: ``computeJacobianOfProjectionAndTransformation`` /
  ``compute3rdRowOfJacobianOfTransformation`` (dense_tracking.cpp:490-520),
  evaluated at the *reference* point ("fwd. comp. for now") with the ESM
  intensity derivative 0.5*(grad_ref + grad_cur) and current-only depth
  derivative (the wref/wcur 8-vectors, dense_tracking.cpp:228-235).
- Pyramid: intensity 2x2 mean downsample, depth subsample, central-diff
  derivatives with clamped edges (rgbd_image.cpp:39-56,128-141,419-433);
  K scales by 0.5 per level (intrinsic_matrix.cpp:90-93).

TPU idiom shifts (behaviour preserved):
- per-pixel dense masks instead of compacted point vectors — static shapes;
  the PointSelection predicate (finite depth, derivative thresholds) becomes
  part of the mask. Default thresholds are 0 like the tandem config
  (CoarseTracker.cpp:100-101 uses getDefaultConfig()).
- the per-point scalar loop becomes one wide-row bilinear gather (all six
  channels' four corners in a single row — gather cost scales with row
  count, docs/PERF.md) + masked einsum reductions.
- the do/while with Revertable<SE3> state becomes a lax.while_loop carrying
  (estimate, previous estimate, lambda, error, precision).

Deviations (documented):
- computeCompleteDataLogLikelihood accumulates log(prod(1 + 0.2 d_i)) in
  groups of 50 and DROPS the final partial group (dense_tracking_impl.cpp:
  417-427 only flushes at c%50==0); we sum every term. The dropped tail is a
  data-ordering artifact, not semantics; it only perturbs the accept test by
  O(50/n) of the total.
- Cross-level increment carry-over: the reference starts each pyramid level
  with x = inc.log() where inc is the PREVIOUS level's last solved —
  possibly LM-rejected — increment (dense_tracking.cpp:190,~260), so a
  leftover rejected step is re-applied once at the next level. dense_match
  restarts every level from x0 = log(accumulated T) instead (the rejected
  increment is discarded, matching the Revertable<Sophus::SE3> revert of the
  ESTIMATE but not the warm-started inc). The shipped runtime path
  (on_level=1, a single level) is identical either way; the full
  coarse-to-fine schedule can differ by at most one extra trial step per
  level boundary.

The reference runs this at on_level=1 only (trackNewestCoarseDense,
CoarseTracker.cpp:939-964, with Config FirstLevel=3/LastLevel=1 overridden
by the explicit on_level argument); ``match`` here supports both the single
level and the full coarse-to-fine schedule.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.se3 import se3_exp
from ..ops.linalg import solve_gauss_jordan

NU = 5.0          # TDistribution DEFAULT_DOF (weight_calculation.h)


class DvoConfig(NamedTuple):
    """DenseTracker::Config (dense_tracking_config.cpp:27-42 defaults)."""
    first_level: int = 3
    last_level: int = 1
    max_iterations: int = 5
    precision: float = 1e-4
    mu: float = 0.0
    intensity_derivative_threshold: float = 0.0
    depth_derivative_threshold: float = 0.0


class RgbdLevel(NamedTuple):
    """One pyramid level of the acceleration structure.

    ``packed`` holds the four bilinear corners of all 6 channels side by
    side: (H-1, W-1, 24) rows [I,Z,Idx,Idy,Zdx,Zdy] x {00,10,01,11} — one
    gather per warped sample instead of 24.
    """
    intensity: jnp.ndarray      # (H, W) float 0..255
    depth: jnp.ndarray          # (H, W) float metres (<=0 / nan = invalid)
    idx: jnp.ndarray            # (H, W) dI/dx (central diff * 0.5)
    idy: jnp.ndarray
    zdx: jnp.ndarray
    zdy: jnp.ndarray
    packed: jnp.ndarray         # (H-1, W-1, 24)
    K: Tuple[float, float, float, float]   # fx, fy, cx, cy at this level


def _central_diff(img, axis):
    """(img[next] - img[prev]) * 0.5 with clamped borders
    (rgbd_image.cpp:419-433). NaNs in invalid depth propagate into the
    derivative exactly like the reference's cv::Mat arithmetic."""
    nxt = jnp.roll(img, -1, axis)
    prv = jnp.roll(img, 1, axis)
    # clamp: at the border, next==self / prev==self
    if axis == 1:
        nxt = nxt.at[:, -1].set(img[:, -1])
        prv = prv.at[:, 0].set(img[:, 0])
    else:
        nxt = nxt.at[-1, :].set(img[-1, :])
        prv = prv.at[0, :].set(img[0, :])
    return (nxt - prv) * 0.5


def _build_level(intensity, depth, K) -> RgbdLevel:
    idx = _central_diff(intensity, 1)
    idy = _central_diff(intensity, 0)
    zdx = _central_diff(depth, 1)
    zdy = _central_diff(depth, 0)
    s = jnp.stack([intensity, depth, idx, idy, zdx, zdy], -1)  # (H, W, 6)
    packed = jnp.concatenate([s[:-1, :-1], s[:-1, 1:],
                              s[1:, :-1], s[1:, 1:]], -1)      # (H-1,W-1,24)
    return RgbdLevel(intensity, depth, idx, idy, zdx, zdy, packed, K)


def build_rgbd_pyramid(intensity, depth, fx, fy, cx, cy,
                       num_levels: int = 4) -> Tuple[RgbdLevel, ...]:
    """RgbdImagePyramid: level 0 = input; intensity 2x2 mean, depth 2x2
    subsample (rgbd_image.cpp:164-169), K *= 0.5 per level
    (intrinsic_matrix.cpp:90). Invalid depth is NaN or <= 0."""
    levels = [_build_level(jnp.asarray(intensity, jnp.float32),
                           jnp.asarray(depth, jnp.float32),
                           (float(fx), float(fy), float(cx), float(cy)))]
    for _ in range(1, num_levels):
        prev = levels[-1]
        ih, iw = prev.intensity.shape
        i2 = prev.intensity[:ih - ih % 2, :iw - iw % 2]
        inten = (i2[0::2, 0::2] + i2[0::2, 1::2]
                 + i2[1::2, 0::2] + i2[1::2, 1::2]) * 0.25
        dep = prev.depth[:ih - ih % 2:2, :iw - iw % 2:2]
        fxl, fyl, cxl, cyl = prev.K
        levels.append(_build_level(
            inten, dep, (fxl * 0.5, fyl * 0.5, cxl * 0.5, cyl * 0.5)))
    return tuple(levels)


def _warp_residuals(lvl_ref: RgbdLevel, lvl_cur: RgbdLevel, T, affine_a,
                    affine_b, ref_valid):
    """computeResidualsSse semantics on dense pixel grids.

    Returns r (N, 2), g_i (N, 2) the fx/255-scaled ESM intensity gradient,
    g_z (N, 2), p_ref (N, 3) reference 3D points, valid (N,).
    """
    H, W = lvl_ref.intensity.shape
    fx, fy, cx, cy = lvl_ref.K
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    z_ref = lvl_ref.depth
    # buildPointCloud (rgbd_image.cpp:245-262): ((x-ox)/fx, (y-oy)/fy, 1)*z
    px = (gx - cx) / fx * z_ref
    py = (gy - cy) / fy * z_ref
    R = T[:3, :3]
    t = T[:3, 3]
    q = (R[0, 0] * px + R[0, 1] * py + R[0, 2] * z_ref + t[0],
         R[1, 0] * px + R[1, 1] * py + R[1, 2] * z_ref + t[1],
         R[2, 0] * px + R[2, 1] * py + R[2, 2] * z_ref + t[2])
    zt = q[2]
    zt_safe = jnp.where(jnp.abs(zt) < 1e-12, 1e-12, zt)
    u = fx * q[0] / zt_safe + cx
    v = fy * q[1] / zt_safe + cy
    # inImage(x, y) && inImage(x+1, y+1) (dense_tracking_impl.cpp:78)
    inb = (u >= 0) & (v >= 0) & (u < W - 1) & (v < H - 1) & (zt > 0)

    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    wx1 = u - x0
    wy1 = v - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    rows = lvl_cur.packed.reshape(-1, 24)[(y0i * (W - 1) + x0i).reshape(-1)]
    w00 = ((1 - wx1) * (1 - wy1)).reshape(-1, 1)
    w10 = (wx1 * (1 - wy1)).reshape(-1, 1)
    w01 = ((1 - wx1) * wy1).reshape(-1, 1)
    w11 = (wx1 * wy1).reshape(-1, 1)
    interp = (rows[:, 0:6] * w00 + rows[:, 6:12] * w10
              + rows[:, 12:18] * w01 + rows[:, 18:24] * w11)   # (N, 6)

    i_cur, z_cur = interp[:, 0], interp[:, 1]
    idx_c, idy_c = interp[:, 2], interp[:, 3]
    zdx_c, zdy_c = interp[:, 4], interp[:, 5]

    i_ref = lvl_ref.intensity.reshape(-1)
    zr = z_ref.reshape(-1)
    ztf = zt.reshape(-1)
    # residual = wcur . interp + wref . (affine'd reference with depth
    # replaced by the transformed z) — dense_tracking.cpp:228-235,
    # dense_tracking_impl.cpp:270-276.
    r_i = (i_cur - (affine_a * i_ref + affine_b)) * (1.0 / 255.0)
    r_z = z_cur - ztf
    # ESM intensity derivative, current-only depth derivative.
    g_iu = 0.5 * (idx_c + lvl_ref.idx.reshape(-1)) * (fx / 255.0)
    g_iv = 0.5 * (idy_c + lvl_ref.idy.reshape(-1)) * (fy / 255.0)
    g_zu = zdx_c * fx
    g_zv = zdy_c * fy

    # Occlusion gate (dense_tracking_impl.cpp:123-129,279):
    # sigma_z = 0.0012 + 0.0019 (z - 0.4)^2
    sigma_z = 0.0012 + 0.0019 * (zr - 0.4) ** 2
    finite = jnp.isfinite(interp).all(axis=-1)
    valid = (ref_valid.reshape(-1) & inb.reshape(-1) & finite
             & (r_z > -20.0 * sigma_z))

    r = jnp.stack([r_i, r_z], -1)
    r = jnp.where(valid[:, None], r, 0.0)
    p_ref = jnp.stack([px.reshape(-1), py.reshape(-1), zr], -1)
    return (r, jnp.stack([g_iu, g_iv], -1), jnp.stack([g_zu, g_zv], -1),
            p_ref, valid)


def _system(r, g_i, g_z, p_ref, valid, w, prec):
    """A = sum J^T (w Lambda) J, b = -sum J^T (w Lambda) r
    (least_squares.cpp:58-64) with the 2x6 Jacobian of
    dense_tracking.cpp:355-366 evaluated at the reference point.

    Column order [tx ty tz wx wy wz] (computeJacobianOfProjection...,
    dense_tracking.cpp:490-520)."""
    x, y, z = p_ref[:, 0], p_ref[:, 1], p_ref[:, 2]
    zi = jnp.where(jnp.abs(z) > 1e-12, 1.0 / z, 0.0)
    zi2 = zi * zi
    zero = jnp.zeros_like(zi)
    one = jnp.ones_like(zi)
    # Jw rows (2, 6) per point
    jw0 = jnp.stack([zi, zero, -x * zi2, -x * y * zi2,
                     1.0 + x * x * zi2, -y * zi], -1)
    jw1 = jnp.stack([zero, zi, -y * zi2, -(1.0 + y * y * zi2),
                     x * y * zi2, x * zi], -1)
    # Jz = dz'/dxi at p (dense_tracking.cpp:510-519)
    jz = jnp.stack([zero, zero, one, y, -x, zero], -1)

    J0 = g_i[:, 0:1] * jw0 + g_i[:, 1:2] * jw1                 # (N, 6)
    J1 = g_z[:, 0:1] * jw0 + g_z[:, 1:2] * jw1 - jz
    Jt = jnp.stack([J0, J1], 1)                                # (N, 2, 6)
    wm = jnp.where(valid, w, 0.0)
    WL = wm[:, None, None] * prec[None]                        # (N, 2, 2)
    A = jnp.einsum("nai,nab,nbj->ij", Jt, WL, Jt)
    b = -jnp.einsum("nai,nab,nb->i", Jt, WL, r)
    return A, b


def _tdist_precision(r, valid, w):
    """Sigma = 1/(n-3) sum_i w_i r_i r_i^T, Lambda = Sigma^-1 (closed-form
    2x2 inverse; computeScale dense_tracking_impl.cpp:569-590)."""
    n = jnp.sum(valid.astype(jnp.float32))
    wm = jnp.where(valid, w, 0.0)
    S = jnp.einsum("n,na,nb->ab", wm, r, r) / jnp.maximum(n - 3.0, 1.0)
    # Variance floor at sensor-model minimums: on noiseless (synthetic)
    # data one channel's residuals can be EXACTLY zero, making Sigma
    # singular — its inverse then zeroes the other channel's precision and
    # puts an unbounded weight on the degenerate one. The reference divides
    # by the raw determinant and would produce the same degenerate weights
    # on such data. Floors: intensity (0.5/255)^2 (half a grey level),
    # depth 0.0012^2 (depthStdDevZ at its 0.4 m minimum,
    # dense_tracking_impl.cpp:123-129) — both far below real residual
    # variances, so the floor is invisible on real data.
    floor = jnp.array([(0.5 / 255.0) ** 2, 0.0012 ** 2])
    S = (jnp.diag(jnp.maximum(jnp.diag(S), floor) - jnp.diag(S)) + S)
    det = S[0, 0] * S[1, 1] - S[0, 1] * S[1, 0]
    det = jnp.where(jnp.abs(det) < 1e-24, 1e-24, det)
    inv = jnp.array([[S[1, 1], -S[0, 1]], [-S[1, 0], S[0, 0]]]) / det
    return inv, n


def _tdist_weights(r, prec):
    d = jnp.einsum("na,ab,nb->n", r, prec, r)
    return (NU + 2.0) / (NU + d)


def _log_likelihood(r, valid, w, prec, n):
    """0.5 n log det(Lambda) - 0.5 (nu+2) sum log(1 + d/nu); the reference
    folds 1/nu into the 0.2 factor (dense_tracking_impl.cpp:409-430)."""
    d = jnp.einsum("na,ab,nb->n", r, prec, r)
    s = jnp.sum(jnp.where(valid, jnp.log1p(0.2 * d), 0.0))
    det = prec[0, 0] * prec[1, 1] - prec[0, 1] * prec[1, 0]
    return 0.5 * n * jnp.log(jnp.maximum(det, 1e-30)) - 0.5 * (NU + 2.0) * s


@partial(jax.jit, static_argnums=(5,))
def dense_match_level(lvl_ref: RgbdLevel, lvl_cur: RgbdLevel, T_init,
                      lam_init, affine, cfg: DvoConfig = DvoConfig()):
    """One pyramid level of DenseTracker::match (the do/while at
    dense_tracking.cpp:259-400). ``T_init`` is the warp transform mapping
    reference points into the current frame (the reference API's
    ``Transformation`` is its inverse, dense_tracking.cpp:417).

    Returns dict with T (ref->cur), T_api (= inv(T), the reference's
    Result.Transformation), information A, log-likelihood, lambda, n.
    """
    affine_a, affine_b = affine[0], affine[1]
    # PointSelection predicate: finite positive depth + derivative
    # thresholds (both 0 in the tandem config).
    dmag = (jnp.abs(lvl_ref.idx) + jnp.abs(lvl_ref.idy)
            >= cfg.intensity_derivative_threshold)
    zmag = (jnp.abs(lvl_ref.zdx) + jnp.abs(lvl_ref.zdy)
            >= cfg.depth_derivative_threshold)
    ref_valid = (jnp.isfinite(lvl_ref.depth) & (lvl_ref.depth > 0)
                 & dmag & zmag)

    I6 = jnp.eye(6)

    def body(carry):
        (it, done, x, est, lam, last_err, prec_prev, A_last, ll_last,
         n_last) = carry
        inc = se3_exp(x)
        est_new = inc @ est
        r, g_i, g_z, p_ref, valid = _warp_residuals(
            lvl_ref, lvl_cur, est_new, affine_a, affine_b, ref_valid)
        # First iteration on the level: weights = 1
        # (dense_tracking.cpp:303-310); afterwards from the previous
        # iteration's precision.
        w = jnp.where(it == 0, jnp.ones(r.shape[0]),
                      _tdist_weights(r, prec_prev))
        prec, n = _tdist_precision(r, valid, w)
        ll = _log_likelihood(r, valid, w, prec, n)
        err = -ll
        too_few = n < 6.0
        accept = (err < last_err) & ~too_few

        A, b = _system(r, g_i, g_z, p_ref, valid, w, prec)
        A = A + cfg.mu * I6
        A = A * (1.0 + lam * I6)          # diag *= (1 + lambda)
        x_new = solve_gauss_jordan(A, b, 6)
        small = jnp.max(jnp.abs(x_new)) <= cfg.precision
        return (it + 1, done | ~accept | small,
                jnp.where(accept, x_new, x),
                jnp.where(accept, est_new, est),
                jnp.where(accept, lam * 0.5, lam),
                jnp.where(accept, err, last_err),
                jnp.where(accept, prec, prec_prev),
                jnp.where(accept, A, A_last),
                jnp.where(accept, ll, ll_last),
                jnp.where(accept, n, n_last))

    def cond(carry):
        it, done = carry[0], carry[1]
        return (~done) & (it < cfg.max_iterations)

    # x starts as the log of the initial increment: the first iteration
    # applies T_init itself (dense_tracking.cpp:148-151,255-258 "our first
    # increment is the given guess"), so est starts at identity.
    from ..core.se3 import se3_log
    x0 = se3_log(T_init)
    carry = (jnp.int32(0), jnp.bool_(False), x0, jnp.eye(4),
             jnp.asarray(lam_init, jnp.float32), jnp.float32(jnp.inf),
             jnp.eye(2), jnp.eye(6), jnp.float32(-jnp.inf), jnp.float32(0))
    carry = lax.while_loop(cond, body, carry)
    _, _, _, est, lam, err, _, A_last, ll, n = carry
    Rt = est[:3, :3].T
    T_api = jnp.eye(4).at[:3, :3].set(Rt).at[:3, 3].set(-Rt @ est[:3, 3])
    return {"T": est, "T_api": T_api,
            "information": A_last * (0.008 * 0.008),   # dense_tracking.cpp:419
            "log_likelihood": ll, "lambda": lam, "error": err, "n": n}


def dense_match(ref_pyr: Sequence[RgbdLevel], cur_pyr: Sequence[RgbdLevel],
                T_init, cfg: DvoConfig = DvoConfig(),
                on_level: Optional[int] = None, lam: float = 0.01,
                affine_a: float = 1.0, affine_b: float = 0.0):
    """DenseTracker::match over the level schedule. With ``on_level`` (the
    tandem runtime always passes 1, CoarseTracker.cpp:954) only that level
    runs; otherwise coarse-to-fine FirstLevel..LastLevel. The lambda state
    threads across levels like the reference's by-reference float."""
    if on_level is not None:
        start = end = on_level
    else:
        start, end = cfg.first_level, cfg.last_level
    out = None
    T = jnp.asarray(T_init, jnp.float32)
    affine = jnp.array([affine_a, affine_b], jnp.float32)
    lam_d = jnp.asarray(lam, jnp.float32)
    for level in range(start, end - 1, -1):
        out = dense_match_level(ref_pyr[level], cur_pyr[level], T, lam_d,
                                affine, cfg)
        T = out["T"]
        lam_d = out["lambda"]
    return out
