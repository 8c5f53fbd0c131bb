"""Dense coarse tracker: pyramid photometric LM alignment on TPU.

Re-design of the reference CoarseTracker (tandem/src/FullSystem/
CoarseTracker.cpp:736-937 trackNewestCoarse, :148- makeCoarseDepthL0, and the
GPU residual kernels in libdr/cuda_coarse_tracker): like DSO's per-level
point clouds (pc_u/pc_v/pc_idepth/pc_color, CoarseTracker.h:76-81), the
reference state is a fixed-capacity point list per pyramid level, compacted
once per keyframe from the projected idepth maps. Every LM iteration is then
a fixed-shape O(points) program (bilinear gather from the new image + masked
8x8 normal-equation reduction — the 45-accumulator kernel
cuda_coarse_tracker_private.cu:261-445 becomes one einsum over the list).

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
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.pyramid import build_pyramid, pyramid_intrinsics
from ..core.se3 import se3_exp
from ..ops.linalg import solve_gauss_jordan_batched

NUM_LEVELS = 6
# DSO's per-level LM iteration caps (CoarseTracker trackNewestCoarse
# maxIterations {10,20,50,50,50,50})
MAX_ITERS = (10, 20, 50, 50, 50, 50)
CUTOFF_TH = 20.0                       # setting_coarseCutoffTH
HUBER_TH = 9.0                         # setting_huberTH


class CoarseTrackerRef(NamedTuple):
    """Per-level point lists (fine -> coarse), fixed capacity per level.

    DSO equivalent: pc_u/pc_v/pc_idepth/pc_color + pc_n
    (CoarseTracker.h:76-81); capacity padding is masked by ``pvalid``.
    """
    pu: Tuple[jnp.ndarray, ...]        # (N_l,) pixel x
    pv: Tuple[jnp.ndarray, ...]        # (N_l,) pixel y
    pid: Tuple[jnp.ndarray, ...]       # (N_l,) inverse depth
    pcolor: Tuple[jnp.ndarray, ...]    # (N_l,) ref intensity at the point
    pvalid: Tuple[jnp.ndarray, ...]    # (N_l,) bool
    K: Tuple[Tuple[float, float, float, float], ...]  # fx, fy, cx, cy


def _level_caps(H: int, W: int, dense: bool):
    """Static per-level point capacities.

    Dense (TANDEM) refs carry a stride-3 grid (~H*W/9 points at level 0,
    CoarseTracker.cpp:706-724); sparse DSO refs carry ~2k active points plus
    dilation growth at coarse levels. Over-capacity maps are decimated
    evenly, so a generous bound is safe and a tight one only subsamples.
    """
    caps = []
    for lvl in range(NUM_LEVELS):
        hw = max((H >> lvl) * (W >> lvl), 1)
        if dense:
            want = (hw // 8 + 4096, 16384, 8192, 8192, 8192, 8192)[lvl]
        else:
            want = (4096, 6144, 8192, 8192, 8192, 8192)[lvl]
        cap = min(hw, want)
        caps.append(-(-cap // 128) * 128)
    return caps


def _compact_level(img, idepth, weight, cap: int):
    """Dense (H, W) maps -> fixed-size point list. Evenly decimates when the
    valid count exceeds ``cap`` (stride over the valid ranks, no spatial
    bias)."""
    H, W = img.shape
    flat = (weight > 0).reshape(-1)
    count = jnp.sum(flat.astype(jnp.int32))
    # Even decimation keeping ~cap points exactly: keep valid point r iff
    # floor(r*cap/count) advances. (A ceil-stride `rank % step` halves the
    # yield the moment count exceeds cap by one.)
    rank = jnp.cumsum(flat.astype(jnp.int32)) - 1
    cnt = jnp.maximum(count, 1)
    keep = flat & ((rank * cap) // cnt != ((rank - 1) * cap) // cnt)
    keep = jnp.where(count <= cap, flat, keep)
    idx = jnp.nonzero(keep, size=cap, fill_value=-1)[0]
    ok = idx >= 0
    idxc = jnp.maximum(idx, 0)
    pu = (idxc % W).astype(jnp.float32)
    pv = (idxc // W).astype(jnp.float32)
    pid = idepth.reshape(-1)[idxc]
    pcol = img.reshape(-1)[idxc]
    return pu, pv, pid, pcol, ok


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
    """Build the per-level point lists from level-0 idepth/weight maps.
    One jitted call — pyramids, downsampling, dilation, and compaction run
    as a single device program (this runs at keyframe rate).

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
    caps = _level_caps(H, W, dense=dense_idepth is not None)

    pu, pv, pid, pcol, pval = [], [], [], [], []
    cur_i, cur_w = idepth0, weight0
    for lvl in range(NUM_LEVELS):
        if lvl > 0:
            cur_i, cur_w = _downsample_idepth(cur_i, cur_w)
            cur_i, cur_w = _dilate_fill(cur_i, cur_w)
        u, v, idp, col, ok = _compact_level(pyr[lvl]["img"], cur_i, cur_w,
                                            caps[lvl])
        pu.append(u)
        pv.append(v)
        pid.append(idp)
        pcol.append(col)
        pval.append(ok)
    return CoarseTrackerRef(pu=tuple(pu), pv=tuple(pv), pid=tuple(pid),
                            pcolor=tuple(pcol), pvalid=tuple(pval),
                            K=tuple(Ks))


def _pack_level(img, gx, gy):
    """(H, W) intensity + gradients -> (H-1, W-1, 12) corner-packed table.

    TPU gather cost scales with the row COUNT, not row width: packing the
    four bilinear corners of all three channels side by side turns the 12
    gathers per sample into ONE wide-row gather (~10x measured). Built once
    per level per frame, outside the LM while_loop."""
    s = jnp.stack([img, gx, gy], -1)                         # (H, W, 3)
    return jnp.concatenate([s[:-1, :-1], s[:-1, 1:],
                            s[1:, :-1], s[1:, 1:]], -1)      # (H-1, W-1, 12)


def _bilinear_with_grad(packed, H, W, x, y):
    """Sample intensity and gradients at float pixel coords from a
    corner-packed table (see _pack_level). x/y may carry a leading
    candidate-batch dim; the gather index is folded flat (batched gathers
    lower to per-element gathers ~30x slower on TPU). Callers mask samples
    near the border, so index clipping never changes a used value."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    idx = (y0i * (W - 1) + x0i).reshape(-1)

    rows = packed.reshape(-1, 12)[idx]                       # (M, 12)
    v = rows.reshape(-1, 4, 3)
    w = jnp.stack([(1 - wx) * (1 - wy), wx * (1 - wy),
                   (1 - wx) * wy, wx * wy], -1).reshape(-1, 4)
    out = jnp.einsum("mkc,mk->mc", v, w)
    sh = x.shape
    return (out[:, 0].reshape(sh), out[:, 1].reshape(sh),
            out[:, 2].reshape(sh))


def _level_residuals(T, aff, pts, packed, H, W, Klvl):
    """Residuals + Jacobians for one level's point list, batched over B
    candidate poses.

    :param T: (B, 4, 4); aff: (B, 2)
    :param pts: (pu, pv, pid, pcolor, pvalid) fixed-size (N,) arrays
    :param packed: (H-1, W-1, 12) corner-packed (img, gx, gy) table
    :return: per-point arrays (r (B,N), J (B,N,8), good (B,N), px, py)
    """
    pu, pv, idv, ref_c, msk = pts
    fx, fy, cx, cy = Klvl

    # Normalized camera ray of the ref pixel
    un = (pu - cx) / fx
    vn = (pv - cy) / fy
    ray = jnp.stack([un, vn, jnp.ones_like(un)], -1)          # (N, 3)
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    q = (jnp.einsum("bij,nj->bni", R, ray)
         + t[:, None, :] * idv[None, :, None])                # (B, N, 3)
    qz = q[..., 2]
    good = msk[None] & (qz > 1e-6)
    qz_safe = jnp.where(qz > 1e-6, qz, 1.0)
    u2 = q[..., 0] / qz_safe
    v2 = q[..., 1] / qz_safe
    px = fx * u2 + cx
    py = fy * v2 + cy
    inb = (px > 2) & (px < W - 3) & (py > 2) & (py < H - 3)
    good = good & inb

    hit, gx_i, gy_i = _bilinear_with_grad(packed, H, W, px, py)
    a = aff[:, 0:1]
    b = aff[:, 1:2]
    r = hit - (a * ref_c[None] + b)

    idn = idv[None] / qz_safe
    dxf = gx_i * fx
    dyf = gy_i * fy
    refc = jnp.broadcast_to(ref_c[None], r.shape)
    J = jnp.stack([
        idn * dxf,
        idn * dyf,
        -idn * (u2 * dxf + v2 * dyf),
        -(u2 * v2 * dxf + (1 + v2 * v2) * dyf),
        (1 + u2 * u2) * dxf + u2 * v2 * dyf,
        u2 * dyf - v2 * dxf,
        -refc,
        -jnp.ones_like(refc),
    ], -1)  # (B, N, 8)
    return r, J, good, px, py


TDIST_DOF = 5.0                        # dvo t-distribution nu (dense_tracking.h)


def _tdist_weights(r, use):
    """Student-t robust weights with iterative scale estimation (dvo-core
    parity: TDistributionScaleEstimator fixed-point +
    TDistributionInfluenceFunction, weight_calculation.cpp:437-489):

        sigma^2 <- mean_i r_i^2 (nu+1) / (nu + r_i^2 / sigma^2)   (x5)
        w_i      = (nu+1) / (nu + r_i^2 / sigma^2)

    The scale iteration makes the weights invariant to the residual
    magnitude, which is what lets heavy depth-outlier populations (sensor
    shadows, dynamic objects) be down-weighted where a fixed Huber threshold
    saturates. r/use: (B, N)."""
    nu = TDIST_DOF
    r2 = jnp.where(use, r * r, 0.0)
    n = jnp.maximum(jnp.sum(use.astype(jnp.float32), axis=-1,
                            keepdims=True), 1.0)
    mean_r2 = jnp.sum(r2, axis=-1, keepdims=True) / n
    # Init from the below-the-mean trimmed mean (a cheap low quantile):
    # heavy contamination inflates the plain mean by orders of magnitude and
    # the fixed point — though unique — converges slowly from far above.
    low = use & (r2 <= mean_r2)
    n_low = jnp.maximum(jnp.sum(low.astype(jnp.float32), axis=-1,
                                keepdims=True), 1.0)
    sigma2 = jnp.maximum(
        jnp.sum(jnp.where(low, r2, 0.0), axis=-1, keepdims=True) / n_low,
        1e-6)
    for _ in range(10):
        w = (nu + 1.0) / (nu + r2 / sigma2)
        sigma2 = jnp.maximum(
            jnp.sum(jnp.where(use, r2 * w, 0.0), axis=-1, keepdims=True) / n,
            1e-6)
    return (nu + 1.0) / (nu + r2 / sigma2)


def _energy_and_system(T, aff, pts, packed, H, W, Klvl,
                       tdist: bool = False):
    r, J, good, *_ = _level_residuals(T, aff, pts, packed, H, W, Klvl)
    if tdist:
        # dvo DenseTracker weighting: no cutoff/Huber — the t-distribution
        # scale iteration handles arbitrary outlier fractions.
        use = good
        wf = jnp.where(use, _tdist_weights(r, use), 0.0)
        e_pix = wf * r * r
    else:
        absr = jnp.abs(r)
        cut = absr < CUTOFF_TH
        use = good & cut
        hw = jnp.where(absr < HUBER_TH, 1.0,
                       HUBER_TH / jnp.maximum(absr, 1e-12))
        # DSO energy form: hw * r^2 * (2 - hw); saturated residuals add the max
        e_pix = jnp.where(use, hw * r * r * (2.0 - hw),
                          jnp.where(good, CUTOFF_TH * CUTOFF_TH, 0.0))
        wf = jnp.where(use, hw, 0.0)
    energy = jnp.sum(e_pix, axis=-1)                          # (B,)
    num = jnp.sum(good.astype(jnp.float32), axis=-1)          # (B,)

    # H = J^T diag(w) J, g = J^T diag(w) r — the 45-value reduction.
    Jw = J * wf[..., None]
    Hm = jnp.einsum("bni,bnj->bij", Jw, J)                    # (B, 8, 8)
    g = jnp.einsum("bni,bn->bi", Jw, r)                       # (B, 8)
    return energy, num, Hm, g


def _bwhere(cond, a, b):
    """jnp.where with a (B,)-shaped condition broadcast over trailing dims."""
    return jnp.where(cond.reshape(cond.shape + (1,) * (a.ndim - 1)), a, b)


def _lm_level(T, aff, level_data, max_iter, tdist: bool = False):
    """Batched LM loop for one level inside jit. T: (B,4,4), aff: (B,2)."""
    (pts, packed, H, W, Klvl) = level_data
    B = T.shape[0]

    def energy_of(T, aff):
        e, n, Hm, g = _energy_and_system(T, aff, pts, packed, H, W, Klvl,
                                         tdist=tdist)
        return e, n, Hm, g

    e0, n0, H0, g0 = energy_of(T, aff)

    def cond(state):
        it, done, T, aff, lam, *_ = state
        # DSO also exits when lambda explodes (no progress possible)
        return (it < max_iter) & jnp.any(~done & (lam < 1e4))

    def body(state):
        it, done, T, aff, lam, e, n, Hm, g = state
        # Solve (H + lam * diag(H)) dx = -g with light Tikhonov for rank safety
        diag = jnp.einsum("bii->bi", Hm)
        Hl = Hm + lam[:, None, None] * (diag[:, :, None] * jnp.eye(8)) \
            + 1e-5 * jnp.eye(8)
        dx = -solve_gauss_jordan_batched(Hl, g, 8)
        T_new = jnp.einsum("bij,bjk->bik", se3_exp(dx[:, :6]), T)
        aff_new = aff + dx[:, 6:]
        e_new, n_new, H_new, g_new = energy_of(T_new, aff_new)

        e_old_n = e / jnp.maximum(n, 1.0)
        e_new_n = e_new / jnp.maximum(n_new, 1.0)
        accept = (e_new_n < e_old_n) & ~done
        # Converged: tiny step, or an accepted step that barely improved the
        # energy (DSO breaks on small relative improvement) — without this,
        # noisy sparse refs burn the full iteration budget.
        small = (jnp.max(jnp.abs(dx), axis=-1) < 1e-5) | \
            (accept & (e_old_n - e_new_n < 1e-4 * jnp.maximum(e_old_n, 1e-6)))
        return (it + 1, done | small,
                _bwhere(accept, T_new, T),
                _bwhere(accept, aff_new, aff),
                jnp.where(done, lam, jnp.where(accept, lam * 0.5, lam * 4.0)),
                jnp.where(accept, e_new, e),
                jnp.where(accept, n_new, n),
                _bwhere(accept, H_new, Hm),
                _bwhere(accept, g_new, g))

    state = (jnp.int32(0), jnp.zeros(B, bool), T, aff,
             jnp.full((B,), 0.01, jnp.float32), e0, n0, H0, g0)
    state = lax.while_loop(cond, body, state)
    _, _, T_out, aff_out, _, e, n, _, _ = state
    # A level with too few valid residuals cannot constrain 8 DoF — keep the
    # incoming estimate (sparse maps can starve the coarsest levels).
    enough = n0 >= 32.0
    T_out = _bwhere(enough, T_out, T)
    aff_out = _bwhere(enough, aff_out, aff)
    return T_out, aff_out, e, n


def rotation_perturbations(scale: float = 0.02):
    """The DSO-style retry list: identity + small rotations about each axis
    and their combinations (trackNewCoarse tries ~27 perturbed
    initializations when the motion model fails, FullSystem.cpp:449-529).
    Returns (N, 4, 4). Pure numpy — host-side eager JAX ops whose results are
    pulled to numpy degrade every subsequent dispatch on remote backends."""
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
    for w in deltas:
        theta = np.linalg.norm(w)
        Wm = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        if theta < 1e-8:
            R = np.eye(3)
        else:
            R = (np.eye(3) + np.sin(theta) / theta * Wm
                 + (1 - np.cos(theta)) / theta ** 2 * (Wm @ Wm))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R.astype(np.float32)
        out.append(T)
    return np.stack(out)


def _track_frame_batched(ref: CoarseTrackerRef, new_image, T_inits,
                         aff_inits, tdist: bool = False):
    """Coarse-to-fine photometric LM over B candidate initializations,
    batched through the whole pyramid (folded gathers; no vmap)."""
    new_pyr = build_pyramid(new_image, NUM_LEVELS)
    T, aff = T_inits, aff_inits

    results = {}
    packed0 = None
    for lvl in range(NUM_LEVELS - 1, -1, -1):
        pts = (ref.pu[lvl], ref.pv[lvl], ref.pid[lvl], ref.pcolor[lvl],
               ref.pvalid[lvl])
        H, W = new_pyr[lvl]["img"].shape
        packed = _pack_level(new_pyr[lvl]["img"], new_pyr[lvl]["gx"],
                             new_pyr[lvl]["gy"])
        data = (pts, packed, H, W, ref.K[lvl])
        T, aff, e, n = _lm_level(T, aff, data, MAX_ITERS[lvl], tdist=tdist)
        if lvl == 0:
            packed0, H0, W0 = packed, H, W
            results["energy"] = e / jnp.maximum(n, 1.0)
            results["num_terms"] = n

    # Flow indicators at level 0 (reference calcRes,
    # CoarseTracker.cpp:503-563,620-626).
    lvl = 0
    pts0 = (ref.pu[lvl], ref.pv[lvl], ref.pid[lvl], ref.pcolor[lvl],
            ref.pvalid[lvl])
    r, J, good, px, py = _level_residuals(
        T, aff, pts0, packed0, H0, W0, ref.K[lvl])

    results.update({
        "T": T, "aff": aff,
        "valid_frac": (jnp.sum(good.astype(jnp.float32), axis=-1)
                       / jnp.maximum(jnp.sum(ref.pvalid[0]), 1.0)),
        "flow": _flow_indicators(T, pts0, ref.K[lvl]),
    })
    return results


def _flow_indicators(T, pts0, Klvl):
    """The reference's keyframe-flow statistics (calcRes,
    CoarseTracker.cpp:503-563, rs assignment :620-626): per tracked point,
    the squared pixel displacement under translation-only motion (+t and -t)
    and under the full tracked motion (R, +/-t), averaged with the +0.1
    denominator guard. Returns (B, 3) = tres[1..3]: [mean shiftT^2, 0 (the
    reference never fills rs[3] - rotation weight is 0 anyway),
    mean shiftRT^2].

    Deviations from the reference loop, both documented: every valid point
    contributes (the reference subsamples i%32 - a CPU cost trick, not
    semantics), and points whose +/- projection falls behind the camera are
    masked out (the reference accumulates their unchecked garbage
    projections into the statistic)."""
    pu, pv, idv, _, msk = pts0
    fx, fy, cx, cy = Klvl
    un = (pu - cx) / fx
    vn = (pv - cy) / fy
    ray = jnp.stack([un, vn, jnp.ones_like(un)], -1)        # (N, 3)
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    ray_rot = jnp.einsum("bij,nj->bni", R, ray)             # (B, N, 3)

    def mean_disp2(base, sign):
        q = base + sign * t[:, None, :] * idv[None, :, None]
        qz = q[..., 2]
        ok = msk[None] & (qz > 1e-6)
        qzs = jnp.where(qz > 1e-6, qz, 1.0)
        du = fx * q[..., 0] / qzs + cx - pu[None]
        dv = fy * q[..., 1] / qzs + cy - pv[None]
        d2 = jnp.where(ok, du * du + dv * dv, 0.0)
        return jnp.sum(d2, -1), jnp.sum(ok.astype(jnp.float32), -1)

    ray_b = jnp.broadcast_to(ray[None], ray_rot.shape)
    s_tp, n_tp = mean_disp2(ray_b, 1.0)
    s_tn, n_tn = mean_disp2(ray_b, -1.0)
    s_fp, n_fp = mean_disp2(ray_rot, 1.0)
    s_fn, n_fn = mean_disp2(ray_rot, -1.0)
    shift_t = (s_tp + s_tn) / (n_tp + n_tn + 0.1)
    shift_rt = (s_fp + s_fn) / (n_fp + n_fn + 0.1)
    return jnp.stack([shift_t, jnp.zeros_like(shift_t), shift_rt], -1)


@partial(jax.jit, static_argnums=(4,))
def track_frame_multi(ref: CoarseTrackerRef, new_image, T_inits, aff_init,
                      tdist: bool = False):
    """Try several initializations in parallel (batched coarse-to-fine LM)
    and return the best by level-0 energy."""
    B = T_inits.shape[0]
    affs = jnp.broadcast_to(aff_init[None], (B, 2))
    outs = _track_frame_batched(ref, new_image, T_inits, affs, tdist=tdist)
    best = jnp.argmin(jnp.where(jnp.isfinite(outs["energy"]),
                                outs["energy"], jnp.inf))
    return jax.tree_util.tree_map(lambda x: x[best], outs)


@jax.jit
def calc_res_eval(ref: CoarseTrackerRef, new_image, T, aff):
    """Level-0 residual statistics at a FIXED pose — the reference's single
    ``calcRes(0, lastToNew, aff, setting_coarseCutoffTH)`` call after the
    dvo dense match (trackNewestCoarseDense, CoarseTracker.cpp:960-963):
    lastResiduals[0] and the flow indicators come from the DSO Huber energy
    even though the pose was estimated by the t-distribution tracker.

    Returns the same dict shape as ``track_frame`` (T/aff passed through).
    """
    new_pyr = build_pyramid(new_image, NUM_LEVELS)
    packed0 = _pack_level(new_pyr[0]["img"], new_pyr[0]["gx"],
                          new_pyr[0]["gy"])
    H, W = new_pyr[0]["img"].shape
    pts0 = (ref.pu[0], ref.pv[0], ref.pid[0], ref.pcolor[0], ref.pvalid[0])
    Tb, affb = T[None], aff[None]
    e, n, _, _ = _energy_and_system(Tb, affb, pts0, packed0, H, W, ref.K[0])
    _, _, good, _, _ = _level_residuals(Tb, affb, pts0, packed0, H, W,
                                        ref.K[0])
    return {
        "T": T, "aff": aff,
        "energy": e[0] / jnp.maximum(n[0], 1.0),
        "num_terms": n[0],
        "valid_frac": (jnp.sum(good[0].astype(jnp.float32))
                       / jnp.maximum(jnp.sum(ref.pvalid[0]), 1.0)),
        "flow": _flow_indicators(Tb, pts0, ref.K[0])[0],
    }


@partial(jax.jit, static_argnums=(4,))
def track_frame(ref: CoarseTrackerRef, new_image, T_init, aff_init,
                tdist: bool = False):
    """Coarse-to-fine photometric LM alignment.

    :param new_image: (H, W) float intensity
    :param T_init: (4, 4) initial ref->new pose guess
    :param aff_init: (2,) initial affine (a, b)
    :param tdist: use dvo-core's Student-t robust weighting instead of DSO's
        Huber+cutoff (the RGB-D trackNewestCoarseDense path,
        dense_tracking.h:156-160)
    :return: dict with 'T' (4,4), 'aff' (2,), 'energy' per-pixel mean at level
        0, 'valid' fraction of usable residuals, 'flow' (3,) flow indicators
        for the keyframe heuristic (FullSystem.cpp:1038-1058)
    """
    outs = _track_frame_batched(ref, new_image, T_init[None],
                                aff_init[None], tdist=tdist)
    return jax.tree_util.tree_map(lambda x: x[0], outs)
