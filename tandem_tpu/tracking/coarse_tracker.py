"""Dense coarse tracker: pyramid photometric LM alignment on TPU.

Re-design of the reference CoarseTracker (tandem/src/FullSystem/
CoarseTracker.cpp:736-937 trackNewestCoarse, :148- makeCoarseDepthL0, and the
GPU residual kernels in libdr/cuda_coarse_tracker): DSO's per-point lists
become dense per-level inverse-depth maps with validity masks, so every LM
iteration is a fixed-shape vectorized XLA program (bilinear gather from the
new image + masked 8x8 normal-equation reduction — the 45-accumulator kernel
cuda_coarse_tracker_private.cu:261-445 becomes one einsum).

Model: ref pixel (x, y) with inverse depth id maps to the new frame via
q = R K^-1 (x,y,1) + t*id, pixel' = K (q/qz); photometric residual
r = I_new(pixel') - (a * I_ref(x,y) + b) with Huber weighting and an energy
cutoff (setting_coarseCutoffTH, settings.cpp). The full coarse-to-fine LM
(6 levels) runs inside ONE jitted call; lambda control uses lax.while_loop.

TANDEM dense mode: depth rendered from the global TSDF is reprojected into
the reference keyframe with an occlusion-aware min-z splat and fills pixels
that have no sparse point (CoarseTracker.cpp:633-733 semantics).
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.pyramid import build_pyramid, pyramid_intrinsics
from ..core.se3 import se3_exp
from ..ops.linalg import solve_gauss_jordan

NUM_LEVELS = 6
# DSO's per-level LM iteration caps (CoarseTracker trackNewestCoarse
# maxIterations {10,20,50,50,50,50})
MAX_ITERS = (10, 20, 50, 50, 50, 50)
CUTOFF_TH = 20.0                       # setting_coarseCutoffTH
HUBER_TH = 9.0                         # setting_huberTH


class CoarseTrackerRef(NamedTuple):
    """Per-level dense reference state (fine -> coarse lists stacked)."""
    images: Tuple[jnp.ndarray, ...]    # (H_l, W_l) intensities
    idepth: Tuple[jnp.ndarray, ...]    # (H_l, W_l)
    valid: Tuple[jnp.ndarray, ...]     # (H_l, W_l) bool
    K: Tuple[Tuple[float, float, float, float], ...]  # fx, fy, cx, cy per level


def _downsample_idepth(idepth, weight):
    H, W = idepth.shape
    H2, W2 = H // 2, W // 2
    idepth = idepth[:H2 * 2, :W2 * 2]
    weight = weight[:H2 * 2, :W2 * 2]
    i4 = (idepth * weight).reshape(H2, 2, W2, 2).sum((1, 3))
    w4 = weight.reshape(H2, 2, W2, 2).sum((1, 3))
    return jnp.where(w4 > 0, i4 / jnp.maximum(w4, 1e-12), 0.0), w4


def _dilate_fill(idepth, weight):
    """Fill invalid pixels from the 3x3 neighbourhood average (DSO dilates
    coarse idepth maps, makeCoarseDepthL0)."""
    pad_i = jnp.pad(idepth * weight, 1)
    pad_w = jnp.pad(weight, 1)
    H, W = idepth.shape
    si = jnp.zeros_like(idepth)
    sw = jnp.zeros_like(weight)
    for dy in range(3):
        for dx in range(3):
            si = si + pad_i[dy:dy + H, dx:dx + W]
            sw = sw + pad_w[dy:dy + H, dx:dx + W]
    fill = (weight <= 0) & (sw > 0)
    out_i = jnp.where(fill, si / jnp.maximum(sw, 1e-12), idepth)
    out_w = jnp.where(fill, sw / 9.0, weight)
    return out_i, out_w


@partial(jax.jit, static_argnums=(4, 5))
def splat_depth_to_ref(render_depth, render_c2w, ref_c2w, K, H: int, W: int,
                       stride: int = 3):
    """Occlusion-aware min-z reprojection of a rendered depth map into the
    reference keyframe (CoarseTracker.cpp:683-724).

    :param render_depth: (H, W) depth in the render camera
    :param render_c2w / ref_c2w: (4, 4) camera-to-world poses
    :param K: (3, 3) level-0 intrinsics
    :return: idepth map (H, W), weight map (H, W) with entries on the stride
        grid only
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u = jnp.tile(jnp.arange(W, dtype=jnp.float32), H)
    v = jnp.repeat(jnp.arange(H, dtype=jnp.float32), W)
    d = render_depth.reshape(-1)
    ok = d > 0

    x = (u - cx) / fx * d
    y = (v - cy) / fy * d
    pts_w = jnp.stack([x, y, d], -1) @ render_c2w[:3, :3].T + render_c2w[:3, 3]
    R = ref_c2w[:3, :3].T
    t = -R @ ref_c2w[:3, 3]
    pts_r = pts_w @ R.T + t
    z = pts_r[:, 2]
    ok = ok & (z > 0.01)
    z_safe = jnp.maximum(z, 1e-6)
    ur = jnp.round(fx * pts_r[:, 0] / z_safe + cx).astype(jnp.int32)
    vr = jnp.round(fy * pts_r[:, 1] / z_safe + cy).astype(jnp.int32)
    ok = ok & (ur >= 0) & (ur < W) & (vr >= 0) & (vr < H)
    flat = jnp.where(ok, vr * W + ur, H * W)

    zbuf = jnp.full((H * W,), jnp.inf).at[flat].min(z_safe, mode="drop")
    zbuf = zbuf.reshape(H, W)
    hit = jnp.isfinite(zbuf)

    # Stride grid: only every `stride`-th pixel becomes a tracking point
    gy = jnp.arange(H) % stride == 0
    gx = jnp.arange(W) % stride == 0
    on_grid = gy[:, None] & gx[None, :]
    use = hit & on_grid
    idepth = jnp.where(use, 1.0 / jnp.where(hit, zbuf, 1.0), 0.0)
    weight = use.astype(jnp.float32)
    return idepth, weight


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def make_tracker_ref(ref_image, fx, fy, cx, cy, sparse_idepth=None,
                     sparse_weight=None, dense_idepth=None,
                     dense_weight=None) -> CoarseTrackerRef:
    """Build the per-level reference state from level-0 idepth/weight maps.
    One jitted call — pyramids, downsampling, and dilation run as a single
    device program (this runs at keyframe rate and during initialization).

    :param ref_image: (H, W) float intensity
    :param sparse_idepth/weight: (H, W) maps from projected active points
        (makeCoarseDepthL0 analogue); may be None
    :param dense_idepth/weight: (H, W) maps from the TSDF-rendered depth
        (dense tracking injection); only fills pixels without sparse points
    """
    H, W = ref_image.shape
    if sparse_idepth is None:
        sparse_idepth = jnp.zeros((H, W))
        sparse_weight = jnp.zeros((H, W))
    idepth0, weight0 = sparse_idepth, sparse_weight
    if dense_idepth is not None:
        fill = (weight0 <= 0) & (dense_weight > 0)
        idepth0 = jnp.where(fill, dense_idepth, idepth0)
        weight0 = jnp.where(fill, dense_weight, weight0)

    pyr = build_pyramid(ref_image, NUM_LEVELS)
    Ks = pyramid_intrinsics(fx, fy, cx, cy, NUM_LEVELS)

    images, idepths, valids = [], [], []
    cur_i, cur_w = idepth0, weight0
    for lvl in range(NUM_LEVELS):
        if lvl > 0:
            cur_i, cur_w = _downsample_idepth(cur_i, cur_w)
            cur_i, cur_w = _dilate_fill(cur_i, cur_w)
        images.append(pyr[lvl]["img"])
        idepths.append(cur_i)
        valids.append(cur_w > 0)
    return CoarseTrackerRef(images=tuple(images), idepth=tuple(idepths),
                            valid=tuple(valids), K=tuple(Ks))


def _bilinear_with_grad(img, gx, gy, x, y):
    """Sample intensity and gradients at float pixel coords (flat arrays)."""
    H, W = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    idx = y0i * W + x0i

    def samp(a):
        f = a.reshape(-1)
        v00 = f[idx]
        v01 = f[idx + 1]
        v10 = f[idx + W]
        v11 = f[idx + W + 1]
        return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
                + v10 * (1 - wx) * wy + v11 * wx * wy)

    return samp(img), samp(gx), samp(gy)


def _level_residuals(T, aff, ref_img, ref_idepth, ref_valid, new_img, new_gx,
                     new_gy, Klvl):
    """Residuals + Jacobians for one level. Returns per-pixel arrays."""
    fx, fy, cx, cy = Klvl
    H, W = ref_img.shape
    xs = jnp.tile(jnp.arange(W, dtype=jnp.float32), H)
    ys = jnp.repeat(jnp.arange(H, dtype=jnp.float32), W)
    idv = ref_idepth.reshape(-1)
    ref_c = ref_img.reshape(-1)
    msk = ref_valid.reshape(-1)

    # Normalized camera ray of the ref pixel
    un = (xs - cx) / fx
    vn = (ys - cy) / fy
    R = T[:3, :3]
    t = T[:3, 3]
    q = jnp.stack([un, vn, jnp.ones_like(un)], -1) @ R.T + t[None] * idv[:, None]
    qz = q[:, 2]
    good = msk & (qz > 1e-6)
    qz_safe = jnp.where(qz > 1e-6, qz, 1.0)
    u2 = q[:, 0] / qz_safe
    v2 = q[:, 1] / qz_safe
    px = fx * u2 + cx
    py = fy * v2 + cy
    inb = (px > 2) & (px < W - 3) & (py > 2) & (py < H - 3)
    good = good & inb

    hit, gx_i, gy_i = _bilinear_with_grad(new_img, new_gx, new_gy, px, py)
    a, b = aff[0], aff[1]
    r = hit - (a * ref_c + b)

    idn = idv / qz_safe
    dxf = gx_i * fx
    dyf = gy_i * fy
    J = jnp.stack([
        idn * dxf,
        idn * dyf,
        -idn * (u2 * dxf + v2 * dyf),
        -(u2 * v2 * dxf + (1 + v2 * v2) * dyf),
        (1 + u2 * u2) * dxf + u2 * v2 * dyf,
        u2 * dyf - v2 * dxf,
        -ref_c,
        -jnp.ones_like(ref_c),
    ], -1)  # (N, 8)
    return r, J, good, px, py, xs, ys


def _energy_and_system(T, aff, ref_img, ref_idepth, ref_valid, new_img,
                       new_gx, new_gy, Klvl):
    r, J, good, *_ = _level_residuals(T, aff, ref_img, ref_idepth, ref_valid,
                                      new_img, new_gx, new_gy, Klvl)
    absr = jnp.abs(r)
    cut = absr < CUTOFF_TH
    use = good & cut
    hw = jnp.where(absr < HUBER_TH, 1.0, HUBER_TH / jnp.maximum(absr, 1e-12))
    # DSO energy form: hw * r^2 * (2 - hw); saturated residuals add the max
    e_pix = jnp.where(use, hw * r * r * (2.0 - hw),
                      jnp.where(good, CUTOFF_TH * CUTOFF_TH, 0.0))
    energy = jnp.sum(e_pix)
    num = jnp.sum(good.astype(jnp.float32))

    wf = jnp.where(use, hw, 0.0)
    # H = J^T diag(w) J, g = J^T diag(w) r — the 45-value reduction.
    Jw = J * wf[:, None]
    Hm = Jw.T @ J
    g = Jw.T @ r
    return energy, num, Hm, g


def _lm_level(T, aff, level_data, max_iter):
    """LM loop for one level inside jit."""
    (ref_img, ref_idepth, ref_valid, new_img, new_gx, new_gy, Klvl) = level_data

    def energy_of(T, aff):
        e, n, Hm, g = _energy_and_system(T, aff, ref_img, ref_idepth,
                                         ref_valid, new_img, new_gx, new_gy,
                                         Klvl)
        return e, n, Hm, g

    e0, n0, H0, g0 = energy_of(T, aff)

    def cond(state):
        it, done, T, aff, lam, *_ = state
        # DSO also exits when lambda explodes (no progress possible)
        return (it < max_iter) & (~done) & (lam < 1e4)

    def body(state):
        it, done, T, aff, lam, e, n, Hm, g = state
        # Solve (H + lam * diag(H)) dx = -g with light Tikhonov for rank safety
        Hl = Hm + lam * jnp.diag(jnp.diag(Hm)) + 1e-5 * jnp.eye(8)
        dx = -solve_gauss_jordan(Hl, g, 8)
        T_new = se3_exp(dx[:6]) @ T
        aff_new = aff + dx[6:]
        e_new, n_new, H_new, g_new = energy_of(T_new, aff_new)

        e_old_n = e / jnp.maximum(n, 1.0)
        e_new_n = e_new / jnp.maximum(n_new, 1.0)
        accept = e_new_n < e_old_n
        # Converged: tiny step, or an accepted step that barely improved the
        # energy (DSO breaks on small relative improvement) — without this,
        # noisy sparse refs burn the full iteration budget.
        small = (jnp.max(jnp.abs(dx)) < 1e-5) | \
            (accept & (e_old_n - e_new_n < 1e-4 * jnp.maximum(e_old_n, 1e-6)))
        return (it + 1, small,
                jnp.where(accept, T_new, T),
                jnp.where(accept, aff_new, aff),
                jnp.where(accept, lam * 0.5, lam * 4.0),
                jnp.where(accept, e_new, e),
                jnp.where(accept, n_new, n),
                jax.tree_util.tree_map(
                    lambda a, b: jnp.where(accept, a, b), H_new, Hm),
                jnp.where(accept, g_new, g))

    state = (jnp.int32(0), jnp.bool_(False), T, aff, jnp.float32(0.01),
             e0, n0, H0, g0)
    state = lax.while_loop(cond, body, state)
    _, _, T_out, aff_out, _, e, n, _, _ = state
    # A level with too few valid residuals cannot constrain 8 DoF — keep the
    # incoming estimate (sparse maps can starve the coarsest levels).
    enough = n0 >= 32.0
    T_out = jnp.where(enough, T_out, T)
    aff_out = jnp.where(enough, aff_out, aff)
    return T_out, aff_out, e, n


def rotation_perturbations(scale: float = 0.02):
    """The DSO-style retry list: identity + small rotations about each axis
    and their combinations (trackNewCoarse tries ~27 perturbed
    initializations when the motion model fails, FullSystem.cpp:449-529).
    Returns (N, 4, 4)."""
    import numpy as np
    deltas = [np.zeros(3)]
    for axis in range(3):
        for sign in (1, -1):
            e = np.zeros(3)
            e[axis] = sign * scale
            deltas.append(e)
    for sx in (1, -1):
        for sy in (1, -1):
            for sz in (1, -1):
                deltas.append(np.array([sx, sy, sz]) * scale * 0.7)
    out = []
    for d in deltas:
        xi = np.concatenate([np.zeros(3), d]).astype(np.float32)
        out.append(np.asarray(se3_exp(jnp.asarray(xi))))
    return np.stack(out)


@jax.jit
def track_frame_multi(ref: CoarseTrackerRef, new_image, T_inits, aff_init):
    """Try several initializations in parallel (vmapped coarse-to-fine LM)
    and return the best by level-0 energy."""
    outs = jax.vmap(lambda T: track_frame(ref, new_image, T, aff_init))(
        T_inits)
    best = jnp.argmin(jnp.where(jnp.isfinite(outs["energy"]),
                                outs["energy"], jnp.inf))
    return jax.tree_util.tree_map(lambda x: x[best], outs)


@jax.jit
def track_frame(ref: CoarseTrackerRef, new_image, T_init, aff_init):
    """Coarse-to-fine photometric LM alignment.

    :param new_image: (H, W) float intensity
    :param T_init: (4, 4) initial ref->new pose guess
    :param aff_init: (2,) initial affine (a, b)
    :return: dict with 'T' (4,4), 'aff' (2,), 'energy' per-pixel mean at level
        0, 'valid' fraction of usable residuals, 'flow' (3,) flow indicators
        for the keyframe heuristic (FullSystem.cpp:1038-1058)
    """
    new_pyr = build_pyramid(new_image, NUM_LEVELS)
    T, aff = T_init, aff_init

    results = {}
    for lvl in range(NUM_LEVELS - 1, -1, -1):
        data = (ref.images[lvl], ref.idepth[lvl], ref.valid[lvl],
                new_pyr[lvl]["img"], new_pyr[lvl]["gx"], new_pyr[lvl]["gy"],
                ref.K[lvl])
        T, aff, e, n = _lm_level(T, aff, data, MAX_ITERS[lvl])
        if lvl == 0:
            results["energy"] = e / jnp.maximum(n, 1.0)
            results["num_terms"] = n

    # Flow indicators at level 0: RMS pixel displacement under full motion and
    # translation-only motion (CoarseTracker calcRes sumSquaredShift*).
    lvl = 0
    r, J, good, px, py, xs, ys = _level_residuals(
        T, aff, ref.images[lvl], ref.idepth[lvl], ref.valid[lvl],
        new_pyr[lvl]["img"], new_pyr[lvl]["gx"], new_pyr[lvl]["gy"], ref.K[lvl])
    disp2 = (px - xs) ** 2 + (py - ys) ** 2
    T_t = jnp.eye(4).at[:3, 3].set(T[:3, 3])
    _, _, good_t, px_t, py_t, _, _ = _level_residuals(
        T_t, aff, ref.images[lvl], ref.idepth[lvl], ref.valid[lvl],
        new_pyr[lvl]["img"], new_pyr[lvl]["gx"], new_pyr[lvl]["gy"], ref.K[lvl])
    disp2_t = (px_t - xs) ** 2 + (py_t - ys) ** 2

    def rms(d2, m):
        return jnp.sqrt(jnp.sum(jnp.where(m, d2, 0.0))
                        / jnp.maximum(jnp.sum(m.astype(jnp.float32)), 1.0))

    results.update({
        "T": T, "aff": aff,
        "valid_frac": (jnp.sum(good.astype(jnp.float32))
                       / jnp.maximum(jnp.sum(ref.valid[0]), 1.0)),
        "flow": jnp.stack([rms(disp2, good), rms(disp2_t, good_t),
                           rms(disp2 - disp2_t, good & good_t)]),
    })
    return results
