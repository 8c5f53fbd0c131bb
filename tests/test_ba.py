"""Windowed photometric BA: convergence on a synthetic multi-frame scene."""

import numpy as np
import pytest

import jax.numpy as jnp

from tandem_tpu.core.se3 import se3_exp, se3_inverse
from tandem_tpu.tracking.ba import (BAState, create_ba_state, ba_iterate,
                                    marginalize_frame, PATTERN, _bilinear)
from tests.test_coarse_tracker import render_plane, H, W, FX, FY, CX, CY

K = (FX, FY, CX, CY)
F_SLOTS, N_PTS = 4, 256


def _build_scene(rng, pose_noise=0.01, idepth_noise=0.08):
    xis = [np.zeros(6)]
    for i in range(1, F_SLOTS):
        xis.append(np.array([0.05 * i, -0.02 * i, 0.03 * i,
                             0.01 * i, -0.008 * i, 0.006 * i]))
    poses_gt = [np.asarray(se3_exp(jnp.array(x, jnp.float32))) for x in xis]
    frames = [render_plane(p) for p in poses_gt]
    images = jnp.asarray(np.stack([f[0] for f in frames]))

    state = create_ba_state(F_SLOTS, N_PTS)

    # Points hosted in frames 0 and 1 on a grid
    pts_f, pts_uv, pts_id, pts_col = [], [], [], []
    for host in (0, 1):
        img, depth = frames[host]
        for y in range(8, H - 8, 10):
            for x in range(8, W - 8, 10):
                if len(pts_f) >= N_PTS:
                    break
                pts_f.append(host)
                pts_uv.append((x, y))
                id_gt = 1.0 / depth[y, x]
                pts_id.append(id_gt * (1 + idepth_noise * rng.randn()))
                cols = [img[y + int(dy), x + int(dx)] for dx, dy in PATTERN]
                pts_col.append(cols)
    n = len(pts_f)

    # Perturb non-anchor poses
    poses_init = [poses_gt[0]]
    for i in range(1, F_SLOTS):
        dx = pose_noise * rng.randn(6).astype(np.float32)
        poses_init.append(np.asarray(
            jnp.asarray(poses_gt[i]) @ se3_exp(jnp.array(dx))))

    state = state._replace(
        poses=jnp.asarray(np.stack(poses_init), jnp.float32),
        frame_valid=jnp.ones((F_SLOTS,), bool),
        pt_frame=jnp.zeros((N_PTS,), jnp.int32).at[:n].set(jnp.array(pts_f)),
        pt_uv=jnp.zeros((N_PTS, 2)).at[:n].set(jnp.array(pts_uv, jnp.float32)),
        pt_idepth=jnp.ones((N_PTS,)).at[:n].set(jnp.array(pts_id, jnp.float32)),
        pt_color=jnp.zeros((N_PTS, 8)).at[:n].set(jnp.array(pts_col, jnp.float32)),
        pt_valid=jnp.zeros((N_PTS,), bool).at[:n].set(True))
    return state, images, poses_gt, frames


def _pose_err(state, poses_gt, align_scale=True):
    """Max translation error; monocular photometric BA has a free scale
    gauge, so optionally align the global scale first (the runtime anchors
    scale through the marginalization prior instead)."""
    est = np.stack([np.asarray(state.poses[i])[:3, 3]
                    for i in range(1, F_SLOTS)])
    gt = np.stack([poses_gt[i][:3, 3] for i in range(1, F_SLOTS)])
    if align_scale:
        s = (est * gt).sum() / np.maximum((est * est).sum(), 1e-12)
    else:
        s = 1.0
    errs = np.abs(s * est - gt)
    rot_errs = [np.abs(np.asarray(state.poses[i])[:3, :3]
                       - poses_gt[i][:3, :3]).max() for i in range(1, F_SLOTS)]
    return max(errs.max(), max(rot_errs))


def test_ba_converges(rng):
    state, images, poses_gt, frames = _build_scene(rng)
    err0 = _pose_err(state, poses_gt)
    state2, energy = ba_iterate(state, images, K, iters=8)
    err1 = _pose_err(state2, poses_gt)
    assert err1 < err0 * 0.35, (err0, err1)
    assert err1 < 4e-3

    # idepth converges toward GT (up to the global scale gauge)
    depth0 = frames[0][1]
    uv = np.asarray(state2.pt_uv)
    idp = np.asarray(state2.pt_idepth)
    hostm = (np.asarray(state2.pt_frame) == 0) & np.asarray(state2.pt_valid)
    gt_id = 1.0 / depth0[uv[hostm, 1].astype(int), uv[hostm, 0].astype(int)]
    s = (idp[hostm] * gt_id).sum() / np.maximum((idp[hostm] ** 2).sum(), 1e-12)
    rel = np.abs(s * idp[hostm] - gt_id) / gt_id
    assert np.median(rel) < 0.02


def _rotation_scene(calib_prior):
    """Large-rotation window (rotational flow K R K^-1 is idepth-independent,
    so calib is observable) with frames + idepths anchored, leaving calib the
    only free direction."""
    xis = [np.zeros(6),
           np.array([0.05, -0.02, 0.02, 0.12, -0.06, 0.04]),
           np.array([-0.04, 0.03, 0.01, -0.10, 0.12, -0.05])]
    poses = [np.asarray(se3_exp(jnp.asarray(x.astype(np.float32))))
             for x in xis]
    frames = [render_plane(p) for p in poses]
    images = jnp.asarray(np.stack([f[0] for f in frames]))
    from tandem_tpu.tracking.ba import create_ba_state as _create
    st = _create(3, N_PTS, calib_prior=calib_prior)
    img, depth = frames[0]
    uvs, ids, cols = [], [], []
    for y in range(8, H - 8, 6):
        for x in range(8, W - 8, 6):
            if len(uvs) >= N_PTS:
                break
            uvs.append((x, y))
            ids.append(1.0 / depth[y, x])
            cols.append([img[y + int(dy), x + int(dx)] for dx, dy in PATTERN])
    n = len(uvs)
    Hm = np.asarray(st.Hm).copy()
    for i in range(3 * 8):
        Hm[i, i] = 1e8                        # anchor all frame params
    pj = jnp.asarray(np.stack(poses), jnp.float32)
    return st._replace(
        Hm=jnp.asarray(Hm), poses=pj, poses_lin=pj,
        frame_valid=jnp.ones(3, bool),
        pt_frame=jnp.zeros(N_PTS, jnp.int32),
        pt_uv=jnp.zeros((N_PTS, 2)).at[:n].set(jnp.array(uvs, jnp.float32)),
        pt_idepth=jnp.ones(N_PTS).at[:n].set(jnp.array(ids, jnp.float32)),
        pt_color=jnp.zeros((N_PTS, 8)).at[:n].set(
            jnp.array(cols, jnp.float32)),
        pt_valid=jnp.zeros(N_PTS, bool).at[:n].set(True)), images


def test_calib_in_the_solve():
    """The window solve estimates the 4 camera intrinsics (DSO's 8F+4
    system, NumType.h CPARS=4): with a weak anchor prior and a wrong boot
    focal length, the photometric residuals pull state.calib toward the
    true K; under the default DSO-strength prior
    (setting_initialCalibHessian) the correction stays pinned at zero.
    Frames/idepths are anchored because in a free monocular window a focal
    error is gauge-absorbable (idepth scale cancels it in the translation
    term — the very reason DSO uses a 5e9 prior)."""
    from tandem_tpu.tracking.ba import _total_energy

    K_wrong = (FX - 2.0, FY, CX, CY)

    st, images = _rotation_scene(calib_prior=1e1)
    e0 = float(_total_energy(st, images, K_wrong))
    st2, e1 = ba_iterate(st, images, K_wrong, iters=10, idepth_prior=1e8)
    d_fx = float(st2.calib[0])
    assert abs(d_fx - 2.0) < 0.8, d_fx    # most of the 2 px error recovered
    assert float(e1) < 0.15 * e0          # and it explains the residuals

    # DSO-strength prior: calib effectively frozen at the boot value
    st_strong, images = _rotation_scene(calib_prior=2e6)
    st3, _ = ba_iterate(st_strong, images, K_wrong, iters=10,
                        idepth_prior=1e8)
    assert np.abs(np.asarray(st3.calib)).max() < 0.05


def test_marginalize_frame(rng):
    state, images, poses_gt, _ = _build_scene(rng)
    state, _ = ba_iterate(state, images, K, iters=5)
    n_before = int(np.asarray(state.pt_valid).sum())

    state2 = marginalize_frame(state, images, K, 1)
    assert not bool(state2.frame_valid[1])
    assert int(np.asarray(state2.pt_valid).sum()) < n_before
    # Prior picked up information (non-zero block outside the dropped frame)
    Hm = np.asarray(state2.Hm)
    assert np.abs(Hm).sum() > 0
    assert np.abs(Hm[8:16]).sum() == 0  # dropped frame rows cleared

    # BA still runs after marginalization
    state3, energy = ba_iterate(state2, images, K, iters=2)
    assert np.isfinite(float(energy))


def test_lm_energy_monotone(rng):
    """Energy-based accept/reject (FullSystemOptimize.cpp:470-545): the
    returned energy never exceeds the initial energy, even from a terrible
    initialization where plain GN steps diverge."""
    from tandem_tpu.tracking.ba import _total_energy

    state, images, poses_gt, _ = _build_scene(rng, pose_noise=0.15,
                                              idepth_noise=0.5)
    e0 = float(_total_energy(state, images, K))
    state2, e1 = ba_iterate(state, images, K, iters=6)
    assert np.isfinite(float(e1))
    assert float(e1) <= e0 + 1e-3, (e0, float(e1))


def test_marginalization_prior_gauge_orthogonal(rng):
    """After marginalization the prior carries no information along the
    gauge nullspace (EnergyFunctional.cpp:718): Hm @ N ~ 0 and bm . N ~ 0
    for global translation/rotation/scale/affine directions."""
    from tandem_tpu.tracking.ba import gauge_nullspaces

    state, images, _, _ = _build_scene(rng)
    state, _ = ba_iterate(state, images, K, iters=5)
    state2 = marginalize_frame(state, images, K, 1)

    ns = np.asarray(gauge_nullspaces(state2.poses, state2.frame_valid))
    Hm = np.asarray(state2.Hm)
    bm = np.asarray(state2.bm)
    scale = max(np.abs(Hm).max(), 1e-6)
    # Residual projection after orthogonalization, relative to prior scale
    assert np.abs(Hm @ ns).max() < 1e-3 * scale
    assert np.abs(bm @ ns).max() < 1e-3 * max(np.abs(bm).max(), 1e-6)


def test_fej_prior_transport(rng):
    """FEJ: moving the estimate away from the linearization point changes
    the prior gradient by Hm @ delta (b-transport), so a window that
    re-solves after marginalization is pulled back toward the linearization
    point rather than re-zeroing its gradient (no free drift)."""
    from tandem_tpu.tracking.ba import _prior_delta, _total_energy

    state, images, _, _ = _build_scene(rng)
    state, _ = ba_iterate(state, images, K, iters=5)
    state2 = marginalize_frame(state, images, K, 1)
    e_at_lin = float(_total_energy(state2, images, K))

    # Perturb frame 2's pose along a NON-gauge direction (relative motion)
    dx = np.zeros(6, np.float32)
    dx[0] = 0.02
    poses = np.asarray(state2.poses).copy()
    poses[2] = poses[2] @ np.asarray(se3_exp(jnp.asarray(-dx)))
    state3 = state2._replace(poses=jnp.asarray(poses))
    d = np.asarray(_prior_delta(state3))
    assert np.abs(d[16:22]).max() > 1e-3  # delta registered for frame 2
    e_moved = float(_total_energy(state3, images, K))
    # The prior + photometric energy increases away from the solution
    assert e_moved > e_at_lin
