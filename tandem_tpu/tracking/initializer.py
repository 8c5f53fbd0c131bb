"""CoarseInitializer: joint multi-level pose + per-point inverse-depth LM
for monocular bootstrap.

Parity target: tandem/src/FullSystem/CoarseInitializer.{h,cpp} — setFirst
(multi-density per-level point selection), trackFrame (coarse-to-fine LM over
[xi(6), a, b] + one inverse depth per point, Schur-eliminated), the
alpha/coupling prior schedule (alphaEnergy cap -> "snapped" detection,
CoarseInitializer.cpp:519-533), propagateUp/Down between levels, and the
snapped && frameID > snappedAt+5 готово criterion (:264-275).

TPU re-design choices (vs the reference's per-point C++ loops):
- Fixed-capacity point lists per level; every LM iteration is one
  fixed-shape program: residuals/Jacobians for all points x 8 pattern pixels
  batched, the 8x8 system + Schur terms assembled with einsums, the whole
  level loop a lax.while_loop (the reference's acc9/acc9SC SSE accumulators
  become einsums).
- The 10-nearest-neighbour graph (makeNN, KDTree) used for iR regularization
  and up/down propagation becomes GRID-based: good-point idepths are
  splatted to the level grid, box-filtered / 2x2-pooled, and re-sampled —
  a neighbourhood MEAN instead of DSO's 10-NN median (documented deviation;
  same smoothing role, no tree build).
- The reference preconditions its 8x8 solve with wM/(0.01/wh) scalings
  (CoarseInitializer.cpp:160-178) purely for LDLT conditioning; these cancel
  algebraically (inc = -H^-1 b) and are dropped — the Gauss-Jordan solve
  runs in f64-free f32 with a tiny Tikhonov floor instead.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.pyramid import build_pyramid, pyramid_intrinsics
from ..core.se3 import se3_exp, se3_log
from ..ops.linalg import solve_gauss_jordan
from .ba import PATTERN
from .coarse_tracker import _bilinear_with_grad, _pack_level

NUM_LEVELS = 6
MAX_ITERS = (5, 5, 10, 30, 50, 50)       # maxIterations[] (:88), top reuses 50
ALPHA_K = 2.5 * 2.5                      # :92
ALPHA_W = 150.0 * 150.0                  # :93
REG_WEIGHT = 0.8                         # :94
COUPLING_WEIGHT = 1.0                    # :95
HUBER_TH = 9.0                           # setting_huberTH
OUTLIER_E = 8 * 12.0 * 12.0 * 20.0       # energy > outlierTH*20 (:457)
MAX_PIXEL_STEP = 0.25                    # doStep (:885)
EPS_INC = 1e-4                           # :135
# Per-level selection: candidate-cell size + list capacity (stands in for
# PixelSelector densities {0.03,0.05,0.15,0.5,1}, CoarseInitializer.cpp:778)
POTENTIALS = (4, 2, 2, 1, 1, 1)
CAPS = (8192, 4096, 2048, 1024, 512, 256)


class InitializerState(NamedTuple):
    """Per-level fixed-capacity point lists (fine -> coarse) + frame state."""
    pu: Tuple[jnp.ndarray, ...]          # (N_l,) pixel x (integer-valued)
    pv: Tuple[jnp.ndarray, ...]          # (N_l,) pixel y
    pcolor: Tuple[jnp.ndarray, ...]      # (N_l, 8) ref pattern intensities
    pvalid: Tuple[jnp.ndarray, ...]      # (N_l,) selection mask
    idepth: Tuple[jnp.ndarray, ...]      # (N_l,)
    iR: Tuple[jnp.ndarray, ...]          # (N_l,) regularized target
    last_hessian: Tuple[jnp.ndarray, ...]  # (N_l,) idepth Hessian
    is_good: Tuple[jnp.ndarray, ...]     # (N_l,) bool
    energy: Tuple[jnp.ndarray, ...]      # (N_l,) accepted photometric energy
    ref_packed: Tuple[jnp.ndarray, ...]  # (H-1, W-1, 12) ref pyramid tables
    T: jnp.ndarray                       # (4, 4) thisToNext (ref -> new)
    aff: jnp.ndarray                     # (2,) (a_log, b)
    snapped: jnp.ndarray                 # () bool
    snapped_at: jnp.ndarray              # () int32
    frame_id: jnp.ndarray                # () int32


def _level_dims(H: int, W: int):
    return [(H >> l, W >> l) for l in range(NUM_LEVELS)]


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def make_initializer(image, fx, fy, cx, cy) -> InitializerState:
    """setFirst: select points at every pyramid level, idepth = 1."""
    from .point_selection import select_pixels

    H, W = image.shape
    pyr = build_pyramid(image, NUM_LEVELS)
    pu, pv, pcolor, pvalid = [], [], [], []
    idepth, iR, lastH, isG, energy = [], [], [], [], []
    ref_packed = []
    for lvl in range(NUM_LEVELS):
        img = pyr[lvl]["img"]
        Hl, Wl = img.shape
        cap = CAPS[lvl]
        if Hl >= 64:
            # select_pixels already excludes a 3px border (pattern margin).
            # In-jit density adaptation (PixelSelector's recursion on
            # desired density): fall back to a laxer threshold when the
            # scene's gradients are weak.
            m_hi = select_pixels(pyr[lvl]["abs_grad2"], block=32,
                                 potential=POTENTIALS[lvl],
                                 threshold_factor=1.0)
            m_lo = select_pixels(pyr[lvl]["abs_grad2"], block=32,
                                 potential=POTENTIALS[lvl],
                                 threshold_factor=0.2)
            enough = jnp.sum(m_hi.astype(jnp.int32)) >= cap // 4
            mask = jnp.where(enough, m_hi, m_lo)
        else:
            # Tiny coarse levels (density 1 in the reference's selector):
            # every non-border pixel with any gradient signal.
            g2 = pyr[lvl]["abs_grad2"]
            border = jnp.zeros((Hl, Wl), jnp.bool_).at[3:-3, 3:-3].set(True)
            mask = (g2 > 1.0) & border
        flat = mask.reshape(-1)
        idx = jnp.nonzero(flat, size=cap, fill_value=-1)[0]
        ok = idx >= 0
        idxc = jnp.maximum(idx, 0)
        u = (idxc % Wl).astype(jnp.float32)
        v = (idxc // Wl).astype(jnp.float32)
        # Pattern intensities: integer coords + integer pattern -> direct
        # lookup (getInterpolatedElement31 at integer coords).
        uu = (u[:, None] + PATTERN[None, :, 0]).astype(jnp.int32)
        vv = (v[:, None] + PATTERN[None, :, 1]).astype(jnp.int32)
        col = img.reshape(-1)[(vv * Wl + uu).reshape(-1)].reshape(cap, 8)
        pu.append(u)
        pv.append(v)
        pcolor.append(col)
        pvalid.append(ok)
        idepth.append(jnp.ones((cap,)))
        iR.append(jnp.ones((cap,)))
        lastH.append(jnp.zeros((cap,)))
        isG.append(ok)
        energy.append(jnp.zeros((cap,)))
        ref_packed.append(_pack_level(img, pyr[lvl]["gx"], pyr[lvl]["gy"]))
    return InitializerState(
        pu=tuple(pu), pv=tuple(pv), pcolor=tuple(pcolor), pvalid=tuple(pvalid),
        idepth=tuple(idepth), iR=tuple(iR), last_hessian=tuple(lastH),
        is_good=tuple(isG), energy=tuple(energy), ref_packed=tuple(ref_packed),
        T=jnp.eye(4), aff=jnp.zeros(2), snapped=jnp.bool_(False),
        snapped_at=jnp.int32(0), frame_id=jnp.int32(0))


def _neighbor_mean(pu, pv, val, weight, Hl: int, Wl: int, radius: int = 4):
    """Splat (val*weight, weight) to the level grid and box-filter: the
    grid-based stand-in for DSO's 10-NN median (optReg/resetPoints).

    :return: (mean at each point, neighbour weight sum at each point)
    """
    flat = (pv.astype(jnp.int32) * Wl + pu.astype(jnp.int32))
    sv = jnp.zeros((Hl * Wl,)).at[flat].add(val * weight).reshape(Hl, Wl)
    sw = jnp.zeros((Hl * Wl,)).at[flat].add(weight).reshape(Hl, Wl)
    k = 2 * radius + 1
    pvd = jnp.pad(sv, radius)
    pwd = jnp.pad(sw, radius)
    bv = jnp.zeros_like(sv)
    bw = jnp.zeros_like(sw)
    for dy in range(k):
        for dx in range(k):
            bv = bv + pvd[dy:dy + Hl, dx:dx + Wl]
            bw = bw + pwd[dy:dy + Hl, dx:dx + Wl]
    bv = bv.reshape(-1)[flat]
    bw = bw.reshape(-1)[flat]
    return jnp.where(bw > 0, bv / jnp.maximum(bw, 1e-12), 0.0), bw


def _opt_reg(pu, pv, idepth, iR, is_good, snapped, Hl: int, Wl: int):
    """optReg (CoarseInitializer.cpp:633-666): pull iR toward the local
    good-point neighbourhood (grid mean for DSO's 10-NN median); iR = 1
    until snapped."""
    w = is_good.astype(jnp.float32)
    mean, nsum = _neighbor_mean(pu, pv, iR, w, Hl, Wl)
    has_nn = nsum > 2
    new_iR = jnp.where(is_good & has_nn,
                       (1.0 - REG_WEIGHT) * idepth + REG_WEIGHT * mean, iR)
    return jnp.where(snapped, new_iR, jnp.ones_like(iR))


def _calc_res_gs(T, aff, idepth, is_good, energy_old, iR, lvl_const,
                 snapped):
    """calcResAndGS (CoarseInitializer.cpp:326-585) for all points at once.

    :param lvl_const: (pu, pv, pcolor, pvalid, packed, Hl, Wl, K)
    :return: dict with the accepted-candidate state + system blocks
    """
    pu, pv, pcolor, pvalid, packed, Hl, Wl, K = lvl_const
    fx, fy, cx, cy = K
    N = pu.shape[0]
    npts = jnp.sum(pvalid.astype(jnp.float32))

    R = T[:3, :3]
    t = T[:3, 3]
    gain = jnp.exp(aff[0])

    u8 = pu[:, None] + PATTERN[None, :, 0]               # (N, 8)
    v8 = pv[:, None] + PATTERN[None, :, 1]
    ray = jnp.stack([(u8 - cx) / fx, (v8 - cy) / fy,
                     jnp.ones_like(u8)], -1)             # (N, 8, 3)
    pt = jnp.einsum("ij,npj->npi", R, ray) \
        + t[None, None, :] * idepth[:, None, None]       # (N, 8, 3)
    zu = pt[..., 0] / pt[..., 2]
    zv = pt[..., 1] / pt[..., 2]
    Ku = fx * zu + cx
    Kv = fy * zv + cy
    new_id = idepth[:, None] / pt[..., 2]
    inb = (Ku > 1) & (Kv > 1) & (Ku < Wl - 2) & (Kv < Hl - 2) & (new_id > 0)

    hit, gxi, gyi = _bilinear_with_grad(packed, Hl, Wl, Ku, Kv)
    r = hit - gain * pcolor - aff[1]
    hw_e = jnp.where(jnp.abs(r) < HUBER_TH, 1.0,
                     HUBER_TH / jnp.maximum(jnp.abs(r), 1e-12))
    e_pat = hw_e * r * r * (2.0 - hw_e)

    ok_all = jnp.all(inb, axis=1)                        # any bad pattern px
    energy_new = jnp.sum(jnp.where(inb, e_pat, 0.0), axis=1)
    good_new = is_good & ok_all & (energy_new < OUTLIER_E)
    # Bad points contribute their old accepted energy (calcResAndGS :365,:459)
    E_photo = jnp.sum(jnp.where(pvalid,
                                jnp.where(good_new, energy_new, energy_old),
                                0.0))

    # --- Jacobians with sqrt-Huber folding (:427-447) ------------------
    hw = jnp.where(hw_e < 1.0, jnp.sqrt(hw_e), 1.0)
    dxdd = (t[0] - t[2] * zu) / pt[..., 2]
    dydd = (t[1] - t[2] * zv) / pt[..., 2]
    dxI = hw * gxi * fx
    dyI = hw * gyi * fy
    dp = jnp.stack([
        new_id * dxI,
        new_id * dyI,
        -new_id * (zu * dxI + zv * dyI),
        -zu * zv * dxI - (1 + zv * zv) * dyI,
        (1 + zu * zu) * dxI + zu * zv * dyI,
        -zv * dxI + zu * dyI,
        -hw * gain * pcolor,
        -hw * jnp.ones_like(r)], -1)                     # (N, 8, 8)
    dd = dxI * dxdd + dyI * dydd                         # (N, 8)
    rw = hw * r

    maxstep = jnp.min(jnp.where(
        inb, 1.0 / jnp.maximum(
            jnp.sqrt((dxdd * fx) ** 2 + (dydd * fy) ** 2), 1e-10), 1e10),
        axis=1)

    use = (good_new & pvalid)[:, None].astype(jnp.float32)
    dpw = dp * use[..., None]
    H8 = jnp.einsum("npi,npj->ij", dpw, dp)
    b8 = jnp.einsum("npi,np->i", dpw, rw)

    Jb = jnp.concatenate([
        jnp.einsum("npi,np->ni", dp, dd),                # dp . dd  (8)
        jnp.einsum("np,np->n", rw, dd)[:, None],         # r . dd
        jnp.einsum("np,np->n", dd, dd)[:, None]], -1)    # dd . dd
    lastH_new = Jb[:, 9]

    # --- alpha energy + opt (:503-533) ----------------------------------
    EAlpha = jnp.sum(jnp.where(good_new & pvalid, (idepth - 1.0) ** 2, 0.0))
    t2 = jnp.sum(t * t)
    alpha_energy_raw = ALPHA_W * (EAlpha + t2 * npts)
    capped = alpha_energy_raw > ALPHA_K * npts
    alpha_energy = jnp.where(capped, ALPHA_K * npts, alpha_energy_raw)
    alpha_opt = jnp.where(capped, 0.0, ALPHA_W)
    snapped_new = snapped | capped

    Jb8 = Jb[:, 8] + alpha_opt * (idepth - 1.0) \
        + jnp.where(capped, COUPLING_WEIGHT * (idepth - iR), 0.0)
    Jb9 = Jb[:, 9] + alpha_opt + jnp.where(capped, COUPLING_WEIGHT, 0.0)
    Jb9 = 1.0 / (1.0 + Jb9)                              # (:558)
    Jb = Jb.at[:, 8].set(Jb8).at[:, 9].set(Jb9)

    Jbw = Jb[:, :8] * (use * Jb9[:, None])
    Hsc = jnp.einsum("ni,nj->ij", Jbw, Jb[:, :8])
    bsc = jnp.einsum("ni,n->i", Jbw, Jb8)

    tlog = se3_log(T[None])[0, :3]
    H8 = H8.at[jnp.arange(3), jnp.arange(3)].add(alpha_opt * npts)
    b8 = b8.at[:3].add(tlog * alpha_opt * npts)

    return dict(E_photo=E_photo, E_alpha=alpha_energy, good=good_new,
                energy=jnp.where(good_new, energy_new, energy_old),
                H=H8, b=b8, Hsc=Hsc, bsc=bsc, Jb=Jb, lastH=lastH_new,
                maxstep=maxstep, snapped=snapped_new)


def _lm_level_joint(lvl_const, T, aff, idepth, iR, is_good, energy, snapped,
                    max_iter: int):
    """One level of trackFrame's joint LM (CoarseInitializer.cpp:130-245)."""
    pu, pv, pcolor, pvalid, packed, Hl, Wl, K = lvl_const

    res0 = _calc_res_gs(T, aff, idepth, is_good, energy, iR, lvl_const,
                        snapped)
    # applyStep at :132: the pre-loop system becomes the accepted state.
    # NOTE: snapped is NOT taken from res0 — the reference latches it only
    # inside the accept branch (:213), never from the pre-loop evaluation.
    state0 = (jnp.int32(0), jnp.int32(0), jnp.bool_(False),
              T, aff, idepth, iR, res0["good"], res0["energy"],
              res0["lastH"], snapped,
              res0["H"], res0["b"], res0["Hsc"], res0["bsc"], res0["Jb"],
              res0["maxstep"], res0["E_photo"], res0["E_alpha"],
              jnp.float32(0.1))

    def cond(s):
        it, fails, done, *_ = s
        return (it < max_iter) & (fails < 2) & ~done

    def body(s):
        (it, fails, done, T, aff, idepth, iR, good, energy, lastH, snapped,
         H, b, Hsc, bsc, Jb, maxstep, E_photo, E_alpha, lam) = s

        f = 1.0 / (1.0 + lam)
        Hl8 = H + jnp.diag(jnp.diag(H)) * lam - Hsc * f
        bl8 = b - bsc * f
        # fixAffine=true (:61): solve the 6-dof pose block only.
        Hl6 = Hl8[:6, :6] + 1e-8 * jnp.eye(6)
        inc6 = -solve_gauss_jordan(Hl6, bl8[:6], 6)
        inc = jnp.concatenate([inc6, jnp.zeros(2)])
        finite = jnp.isfinite(inc).all()
        inc = jnp.where(finite, inc, 0.0)

        T_new = se3_exp(inc[None, :6])[0] @ T
        aff_new = aff + inc[6:]
        # doStep (:882-908): idepth back-substitution with pixel-step clamp
        bstep = Jb[:, 8] + Jb[:, :8] @ inc
        step = -bstep * Jb[:, 9] * f
        mstep = jnp.minimum(MAX_PIXEL_STEP * maxstep, 1e10)
        step = jnp.clip(step, -mstep, mstep)
        id_new = jnp.where(good, jnp.clip(idepth + step, 1e-3, 50.0), idepth)

        res = _calc_res_gs(T_new, aff_new, id_new, good, energy, iR,
                           lvl_const, snapped)
        # calcEC (:612-631): coupling energy old vs new (0 until snapped)
        use = (res["good"] & pvalid).astype(jnp.float32)
        ec_old = jnp.sum(use * (idepth - iR) ** 2) * COUPLING_WEIGHT
        ec_new = jnp.sum(use * (id_new - iR) ** 2) * COUPLING_WEIGHT
        ec_old = jnp.where(snapped, ec_old, 0.0)
        ec_new = jnp.where(snapped, ec_new, 0.0)

        accept = (E_photo + E_alpha + ec_old
                  > res["E_photo"] + res["E_alpha"] + ec_new) & finite

        # optReg on accept (:227)
        iR_acc = _opt_reg(pu, pv, id_new, iR, res["good"], res["snapped"],
                          Hl, Wl)

        sel = lambda a, b: jnp.where(accept, a, b)
        lam_new = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-4),
                            jnp.minimum(lam * 4.0, 1e4))
        done_new = jnp.sqrt(jnp.sum(inc * inc)) <= EPS_INC
        return (it + 1, jnp.where(accept, 0, fails + 1), done_new,
                sel(T_new, T), sel(aff_new, aff), sel(id_new, idepth),
                sel(iR_acc, iR), sel(res["good"], good),
                sel(res["energy"], energy), sel(res["lastH"], lastH),
                # snapped latches ONLY from an accepted step (:213); a
                # rejected diverged candidate must not flip the prior
                # schedule or start the done countdown.
                snapped | (accept & res["snapped"]),
                sel(res["H"], H), sel(res["b"], b), sel(res["Hsc"], Hsc),
                sel(res["bsc"], bsc), sel(res["Jb"], Jb),
                sel(res["maxstep"], maxstep),
                sel(res["E_photo"], E_photo), sel(res["E_alpha"], E_alpha),
                lam_new)

    s = lax.while_loop(cond, body, state0)
    (_, _, _, T, aff, idepth, iR, good, energy, lastH, snapped,
     *_) = s
    return T, aff, idepth, iR, good, energy, lastH, snapped


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def initializer_track(state: InitializerState, new_image, fx, fy, cx, cy,
                      img_hw) -> Tuple[InitializerState, jnp.ndarray]:
    """trackFrame (CoarseInitializer.cpp:114-276): coarse-to-fine joint LM
    with inter-level propagation; returns (state, done).

    done = snapped && frameID > snappedAt + 5.
    """
    H, W = img_hw
    dims = _level_dims(H, W)
    pyr = build_pyramid(new_image, NUM_LEVELS)
    Ks = pyramid_intrinsics(fx, fy, cx, cy, NUM_LEVELS)

    T, aff = state.T, state.aff
    snapped = state.snapped
    idepth = list(state.idepth)
    iR = list(state.iR)
    good = list(state.is_good)
    energy = list(state.energy)
    lastH = list(state.last_hessian)

    for lvl in range(NUM_LEVELS - 1, -1, -1):
        Hl, Wl = dims[lvl]
        if lvl < NUM_LEVELS - 1:
            # propagateDown(lvl+1) (:712-739): children take their "parent"
            # — here the Hessian-weighted neighbourhood mean of coarser
            # points around the child's half-res position (grid stand-in
            # for DSO's nearest-parent pointers from makeNN).
            sl = lvl + 1
            Hs, Ws = dims[sl]
            pw = jnp.where(good[sl] & (lastH[sl] >= 0.1), lastH[sl], 0.0)
            flat_src = (state.pv[sl].astype(jnp.int32) * Ws
                        + state.pu[sl].astype(jnp.int32))
            sv = jnp.zeros((Hs * Ws,)).at[flat_src].add(
                iR[sl] * pw).reshape(Hs, Ws)
            sw = jnp.zeros((Hs * Ws,)).at[flat_src].add(pw).reshape(Hs, Ws)
            rad = 2
            k = 2 * rad + 1
            pvd = jnp.pad(sv, rad)
            pwd = jnp.pad(sw, rad)
            bv = jnp.zeros_like(sv)
            bw = jnp.zeros_like(sw)
            for dy in range(k):
                for dx in range(k):
                    bv = bv + pvd[dy:dy + Hs, dx:dx + Ws]
                    bw = bw + pwd[dy:dy + Hs, dx:dx + Ws]
            cu = jnp.clip((state.pu[lvl] * 0.5).astype(jnp.int32), 0, Ws - 1)
            cv = jnp.clip((state.pv[lvl] * 0.5).astype(jnp.int32), 0, Hs - 1)
            flat = cv * Ws + cu
            par_H = bw.reshape(-1)[flat]
            par_iR = jnp.where(par_H > 0, bv.reshape(-1)[flat]
                               / jnp.maximum(par_H, 1e-12), 0.0)
            has_par = par_H > 0.1
            was_bad = ~good[lvl] & has_par & state.pvalid[lvl]
            mixed = (iR[lvl] * lastH[lvl] * 2 + par_iR * par_H) \
                / jnp.maximum(lastH[lvl] * 2 + par_H, 1e-12)
            new_val = jnp.where(was_bad, par_iR,
                                jnp.where(good[lvl] & has_par, mixed,
                                          idepth[lvl]))
            idepth[lvl] = new_val
            iR[lvl] = jnp.where(was_bad | (good[lvl] & has_par), new_val,
                                iR[lvl])
            good[lvl] = good[lvl] | was_bad
            lastH[lvl] = jnp.where(was_bad, 0.0, lastH[lvl])
            iR[lvl] = _opt_reg(state.pu[lvl], state.pv[lvl], idepth[lvl],
                               iR[lvl], good[lvl], snapped, Hl, Wl)
        else:
            # resetPoints top level (:854-880): reseed bad points from the
            # good-neighbourhood mean.
            mean, nsum = _neighbor_mean(
                state.pu[lvl], state.pv[lvl], iR[lvl],
                good[lvl].astype(jnp.float32), Hl, Wl)
            reseed = ~good[lvl] & (nsum > 0) & state.pvalid[lvl]
            idepth[lvl] = jnp.where(reseed, mean, idepth[lvl])
            iR[lvl] = jnp.where(reseed, mean, iR[lvl])
            good[lvl] = good[lvl] | reseed
        energy[lvl] = jnp.zeros_like(energy[lvl])        # resetPoints

        packed = _pack_level(pyr[lvl]["img"], pyr[lvl]["gx"], pyr[lvl]["gy"])
        lvl_const = (state.pu[lvl], state.pv[lvl], state.pcolor[lvl],
                     state.pvalid[lvl], packed, Hl, Wl, Ks[lvl])
        T, aff, idepth[lvl], iR[lvl], good[lvl], energy[lvl], lastH[lvl], \
            snapped = _lm_level_joint(
                lvl_const, T, aff, idepth[lvl], iR[lvl], good[lvl],
                energy[lvl], snapped, MAX_ITERS[lvl])

    # propagateUp chain fine -> coarse (:243 loop, :668-707): parents take
    # the Hessian-weighted mean of their children's iR (2x2 pool + small box
    # filter stands in for the child->parent pointer sums).
    for sl in range(NUM_LEVELS - 1):
        tl = sl + 1
        Hs, Ws = dims[sl]
        Ht, Wt = dims[tl]
        w_ch = jnp.where(good[sl], lastH[sl], 0.0)
        flat_src = (state.pv[sl].astype(jnp.int32) * Ws
                    + state.pu[sl].astype(jnp.int32))
        sv = jnp.zeros((Hs * Ws,)).at[flat_src].add(iR[sl] * w_ch)
        sw = jnp.zeros((Hs * Ws,)).at[flat_src].add(w_ch)
        # 2x2 pool to the coarser grid, then 3x3 box so sparse children
        # still reach their parent point's cell
        sv = sv.reshape(Hs, Ws)[:Ht * 2, :Wt * 2].reshape(
            Ht, 2, Wt, 2).sum((1, 3))
        sw = sw.reshape(Hs, Ws)[:Ht * 2, :Wt * 2].reshape(
            Ht, 2, Wt, 2).sum((1, 3))
        pvd = jnp.pad(sv, 1)
        pwd = jnp.pad(sw, 1)
        bv = jnp.zeros_like(sv)
        bw = jnp.zeros_like(sw)
        for dy in range(3):
            for dx in range(3):
                bv = bv + pvd[dy:dy + Ht, dx:dx + Wt]
                bw = bw + pwd[dy:dy + Ht, dx:dx + Wt]
        sv = bv.reshape(-1)
        sw = bw.reshape(-1)
        flat_t = (state.pv[tl].astype(jnp.int32) * Wt
                  + state.pu[tl].astype(jnp.int32))
        got = sw[flat_t] > 0
        newv = jnp.where(got, sv[flat_t] / jnp.maximum(sw[flat_t], 1e-12),
                         iR[tl])
        iR[tl] = newv
        idepth[tl] = jnp.where(got, newv, idepth[tl])
        good[tl] = good[tl] | (got & state.pvalid[tl])
        iR[tl] = _opt_reg(state.pu[tl], state.pv[tl], idepth[tl], iR[tl],
                          good[tl], snapped, Ht, Wt)

    frame_id = state.frame_id + 1
    snapped_at = jnp.where(snapped,
                           jnp.where(state.snapped_at == 0, frame_id,
                                     state.snapped_at),
                           jnp.int32(0))
    done = snapped & (frame_id > snapped_at + 5)

    new_state = state._replace(
        idepth=tuple(idepth), iR=tuple(iR), is_good=tuple(good),
        energy=tuple(energy), last_hessian=tuple(lastH),
        T=T, aff=aff, snapped=snapped, snapped_at=snapped_at,
        frame_id=frame_id)
    return new_state, done
