"""CoarseInitializer: joint pose+idepth monocular bootstrap on a textured
NON-planar synthetic scene (two depth layers with a discontinuity)."""

import numpy as np
import jax
import jax.numpy as jnp

from tandem_tpu.core.se3 import se3_exp, se3_inverse
from tandem_tpu.tracking.initializer import (initializer_track,
                                             make_initializer)

H, W = 96, 128
FX = FY = 90.0
CX, CY = (W - 1) / 2, (H - 1) / 2
Z_NEAR, Z_FAR = 1.6, 2.6


def tex(x, y):
    return (120 + 50 * np.sin(2.1 * x) * np.cos(1.7 * y)
            + 30 * np.sin(5.3 * x + 1) + 25 * np.cos(4.3 * y + 2)
            + 15 * np.sin(9.1 * x * y))


def render_two_planes(c2w):
    """Two textured fronto-parallel layers: world x < 0 lives on z=Z_NEAR,
    x >= 0 on z=Z_FAR (a piecewise-planar scene with a depth step)."""
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    rays = np.stack([(u - CX) / FX, (v - CY) / FY, np.ones_like(u)], -1)
    R, t = c2w[:3, :3], c2w[:3, 3]
    rays_w = rays @ R.T

    def hit(zp):
        tp = (zp - t[2]) / rays_w[..., 2]
        return t[None, None] + rays_w * tp[..., None], tp

    p_near, t_near = hit(Z_NEAR)
    p_far, t_far = hit(Z_FAR)
    use_near = p_near[..., 0] < 0.0
    pts = np.where(use_near[..., None], p_near, p_far)
    depth = np.where(use_near, t_near, t_far)
    img = tex(pts[..., 0], pts[..., 1])
    return img.astype(np.float32), depth.astype(np.float32)


def test_initializer_converges_two_layers():
    """VERDICT #5 done-criterion: converges within ~10 frames on a textured
    non-planar sequence to < ~1% scale-aligned median idepth error."""
    ref_img, ref_depth = render_two_planes(np.eye(4))
    st = make_initializer(jnp.asarray(ref_img), FX, FY, CX, CY)

    done = False
    n_frames = 0
    for i in range(1, 13):
        s = 0.022 * i
        xi = np.array([s, 0.5 * s, 0.15 * s, 0.05 * s, -0.04 * s, 0.02 * s],
                      np.float32)
        c2w = np.asarray(se3_exp(jnp.array(xi)))
        img, _ = render_two_planes(c2w)
        st, d = initializer_track(st, jnp.asarray(img), FX, FY, CX, CY,
                                  (H, W))
        n_frames = i
        if bool(np.asarray(d)):
            done = True
            break
    assert bool(np.asarray(st.snapped)), "never snapped"
    assert done and n_frames <= 12, n_frames

    # Level-0 idepth accuracy after per-run scale alignment.
    iR = np.asarray(st.iR[0])
    good = np.asarray(st.is_good[0]) & np.asarray(st.pvalid[0])
    pu = np.asarray(st.pu[0]).astype(int)
    pv = np.asarray(st.pv[0]).astype(int)
    gt_id = 1.0 / ref_depth[pv[good], pu[good]]
    est = iR[good]
    scale = np.median(gt_id / est)
    rel = np.abs(est * scale - gt_id) / gt_id
    assert np.median(rel) < 0.03, np.median(rel)
    # The depth STEP must be resolved: points on each layer separate.
    assert good.sum() > 200
    near = gt_id > 1.0 / ((Z_NEAR + Z_FAR) / 2)
    if near.sum() > 20 and (~near).sum() > 20:
        est_near = np.median(est[near] * scale)
        est_far = np.median(est[~near] * scale)
        assert est_near > est_far * 1.2


def test_full_system_monocular_init():
    """FullSystem bootstraps through the joint initializer and never trips
    the auto-reset on a well-textured sequence."""
    from tandem_tpu.pipeline.full_system import (FullSystem,
                                                 FullSystemOptions)

    opts = FullSystemOptions(selection_threshold_factor=0.35,
                             kf_global_weight=6.0)
    fs = FullSystem(FX, FY, CX, CY, H, W, options=opts)
    poses = []
    for i in range(14):
        s = 0.022 * i
        xi = np.array([s, 0.5 * s, 0.1 * s, 0.04 * s, -0.03 * s, 0.015 * s],
                      np.float32)
        c2w = np.asarray(se3_exp(jnp.array(xi)))
        poses.append(c2w)
        img, _ = render_two_planes(c2w)
        fs.add_active_frame(img, i, float(i) * 0.1)
        assert not fs.init_failed
        assert not fs.is_lost
    assert fs.initialized

    # Scale-aligned trajectory sanity over the post-init frames.
    est = np.stack([p[:3, 3] for p in fs.all_poses])
    gt = np.stack([p[:3, 3] for p in poses])
    nrm = np.linalg.norm(est, axis=1)
    use = nrm > 1e-6
    scale = np.median(np.linalg.norm(gt[use], axis=1) / nrm[use])
    err = np.linalg.norm(est * scale - gt, axis=1)
    assert err.max() < 0.05, err.max()


def test_initializer_rejects_pure_rotation():
    """The alpha-energy cap ("snapped") requires real parallax: a
    rotation-only sequence must NOT snap (CoarseInitializer.cpp:519-533 —
    alphaEnergy stays below alphaK*npts without translation)."""
    ref_img, _ = render_two_planes(np.eye(4))
    st = make_initializer(jnp.asarray(ref_img), FX, FY, CX, CY)
    for i in range(1, 8):
        s = 0.01 * i
        xi = np.array([0, 0, 0, s, -0.7 * s, 0.4 * s], np.float32)
        img, _ = render_two_planes(np.asarray(se3_exp(jnp.array(xi))))
        st, d = initializer_track(st, jnp.asarray(img), FX, FY, CX, CY,
                                  (H, W))
        assert not bool(np.asarray(d))
    assert not bool(np.asarray(st.snapped))
