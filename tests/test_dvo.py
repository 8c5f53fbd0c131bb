"""dvo-core DenseTracker parity tests (tandem_tpu/tracking/dvo.py vs
tandem/src/dvo-core semantics: bivariate residual, multivariate-t IRLS,
LM accept/revert, pyramid construction)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tandem_tpu.tracking.dvo import (DvoConfig, build_rgbd_pyramid,
                                     dense_match, dense_match_level)

FX, FY = 300.0, 300.0
H, W = 120, 160
CX, CY = (W - 1) / 2.0, (H - 1) / 2.0


def render_plane(c2w, zw=2.0):
    """Analytic render of a textured world plane z_w = zw: intensity and
    depth for a camera at ``c2w`` (exact ray-plane intersection)."""
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    d_cam = np.stack([(u - CX) / FX, (v - CY) / FY, np.ones_like(u)], -1)
    R, t = c2w[:3, :3], c2w[:3, 3]
    d_w = d_cam @ R.T
    lam = (zw - t[2]) / d_w[..., 2]
    xw = t[0] + lam * d_w[..., 0]
    yw = t[1] + lam * d_w[..., 1]
    tex = (128.0 + 60.0 * np.sin(3.0 * xw) * np.cos(2.5 * yw)
           + 40.0 * np.sin(7.0 * xw + 1.0) + 20.0 * np.cos(9.0 * yw))
    depth = lam * 1.0  # z-depth in camera frame: d_cam z-component is 1
    return tex.astype(np.float32), depth.astype(np.float32)


def _pose(tx=0.0, ty=0.0, tz=0.0, wy=0.0):
    c, s = np.cos(wy), np.sin(wy)
    P = np.eye(4)
    P[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    P[:3, 3] = [tx, ty, tz]
    return P


def test_pyramid_construction():
    inten = np.arange(16, dtype=np.float32).reshape(4, 4)
    depth = np.full((4, 4), 2.0, np.float32)
    depth[1, 1] = -1.0  # invalid
    pyr = build_rgbd_pyramid(inten, depth, 100.0, 100.0, 2.0, 1.5,
                             num_levels=2)
    # level1 intensity: 2x2 mean; depth: subsample (rgbd_image.cpp:164-169)
    np.testing.assert_allclose(np.asarray(pyr[1].intensity),
                               [[2.5, 4.5], [10.5, 12.5]])
    np.testing.assert_allclose(np.asarray(pyr[1].depth),
                               [[2.0, 2.0], [2.0, 2.0]])
    # K scales by 0.5 including the principal point
    # (intrinsic_matrix.cpp:90-93)
    assert pyr[1].K == (50.0, 50.0, 1.0, 0.75)
    # central-difference derivative with clamped borders * 0.5
    np.testing.assert_allclose(np.asarray(pyr[0].idx)[0],
                               [0.5, 1.0, 1.0, 0.5])
    np.testing.assert_allclose(np.asarray(pyr[0].idy)[:, 0],
                               [2.0, 4.0, 4.0, 2.0])


def test_identity_residual_zero():
    inten, depth = render_plane(np.eye(4))
    pyr = build_rgbd_pyramid(inten, depth, FX, FY, CX, CY, num_levels=2)
    out = dense_match_level(pyr[1], pyr[1], jnp.eye(4), 0.01,
                            jnp.array([1.0, 0.0]),
                            DvoConfig(max_iterations=3))
    # Identity init on identical frames: the estimate stays ~identity
    np.testing.assert_allclose(np.asarray(out["T"]), np.eye(4), atol=1e-4)
    assert float(out["n"]) > 0.9 * (H // 2) * (W // 2)


@pytest.mark.parametrize("motion", [
    dict(tx=0.03), dict(tz=0.04), dict(wy=0.01), dict(tx=0.02, wy=0.008)])
def test_recovers_pose(motion):
    c2w_cur = _pose(**motion)
    ref_i, ref_d = render_plane(np.eye(4))
    cur_i, cur_d = render_plane(c2w_cur)
    T_gt = np.linalg.inv(c2w_cur)  # warps ref-frame points into cur frame
    ref = build_rgbd_pyramid(ref_i, ref_d, FX, FY, CX, CY, num_levels=2)
    cur = build_rgbd_pyramid(cur_i, cur_d, FX, FY, CX, CY, num_levels=2)
    out = dense_match(ref, cur, jnp.eye(4),
                      DvoConfig(max_iterations=12), on_level=1)
    T = np.asarray(out["T"])
    assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 5e-3
    assert np.linalg.norm(T[:3, :3] - T_gt[:3, :3]) < 5e-3


def test_tdist_downweights_outliers():
    """A corrupted intensity blob must not destroy the estimate — the
    multivariate-t weights absorb the large-residual rows
    (weight_calculation semantics). Kinect-class noise keeps the scale
    estimates honest (a noiseless channel pins sigma at its floor).

    The blob corrupts intensity only: a DEPTH step edge additionally
    creates high-leverage Jacobian rows with near-zero residuals that IRLS
    cannot identify — a failure mode inherent to the reference formulation
    too (its occlusion gate only removes occluding points, r_z << 0, not
    edge-gradient leverage)."""
    rng = np.random.RandomState(7)
    c2w_cur = _pose(tx=0.025)
    ref_i, ref_d = render_plane(np.eye(4))
    cur_i, cur_d = render_plane(c2w_cur)
    for d in (ref_d, cur_d):
        d += rng.normal(0, 0.003, d.shape).astype(np.float32)
    for i in (ref_i, cur_i):
        i += rng.normal(0, 1.0, i.shape).astype(np.float32)
    cur_i[20:60, 30:80] = 255.0
    T_gt = np.linalg.inv(c2w_cur)
    ref = build_rgbd_pyramid(ref_i, ref_d, FX, FY, CX, CY, num_levels=2)
    cur = build_rgbd_pyramid(cur_i, cur_d, FX, FY, CX, CY, num_levels=2)
    # Warm start at 60% of the motion — the runtime always seeds from the
    # motion model (trackNewestCoarseDense passes lastToNew_out); from a
    # cold identity the reference's greedy break-on-ll-decrease stops
    # before the reweighting fully suppresses the blob.
    T_init = np.linalg.inv(_pose(tx=0.015)).astype(np.float32)
    out = dense_match(ref, cur, jnp.asarray(T_init),
                      DvoConfig(max_iterations=12), on_level=1)
    T = np.asarray(out["T"])
    assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 8e-3
    # And the blob must actually have been down-weighted: the no-reweight
    # fixed point (plain least squares on level 1) lands measurably worse.
    assert abs(T[0, 3] - T_gt[0, 3]) < 2e-3


def test_occlusion_gate_and_invalid_depth():
    """Points whose depth residual is far negative (occluded) and invalid
    reference depths are excluded from n (dense_tracking_impl.cpp:123-129,
    279)."""
    ref_i, ref_d = render_plane(np.eye(4))
    cur_i = ref_i.copy()
    cur_d = ref_d.copy()
    ref_d2 = ref_d.copy()
    ref_d2[:30] = np.nan                      # invalid ref depth rows
    # Make current depth much CLOSER over a band: r_z = z_cur - z_ref << 0
    cur_d[60:90] = 0.2
    ref = build_rgbd_pyramid(ref_i, ref_d2, FX, FY, CX, CY, num_levels=1)
    cur = build_rgbd_pyramid(cur_i, cur_d, FX, FY, CX, CY, num_levels=1)
    out = dense_match_level(ref[0], cur[0], jnp.eye(4), 0.01,
                            jnp.array([1.0, 0.0]),
                            DvoConfig(max_iterations=1))
    n = float(out["n"])
    total = H * W
    # ~30/120 rows invalid + ~30/120 occluded (+1px border) -> well below
    assert n < 0.55 * total
    assert n > 0.3 * total


def test_affine_light_model():
    """r_I uses a*I_ref + b (the PHOTO_MASK affine blend,
    dense_tracking_impl.cpp:270-274): matching gain/offset must track as
    well as the plain case."""
    c2w_cur = _pose(tx=0.02)
    ref_i, ref_d = render_plane(np.eye(4))
    cur_i, cur_d = render_plane(c2w_cur)
    a, b = 1.2, -10.0
    cur_scaled = (cur_i * a + b).astype(np.float32)
    T_gt = np.linalg.inv(c2w_cur)
    ref = build_rgbd_pyramid(ref_i, ref_d, FX, FY, CX, CY, num_levels=2)
    cur = build_rgbd_pyramid(cur_scaled, cur_d, FX, FY, CX, CY,
                             num_levels=2)
    # affine maps the REFERENCE into the current frame's exposure:
    # I_cur = a*I_ref + b  =>  pass (a, b)
    out = dense_match(ref, cur, jnp.eye(4), DvoConfig(max_iterations=12),
                      on_level=1, affine_a=a, affine_b=b)
    T = np.asarray(out["T"])
    assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 5e-3


def test_reference_api_inverse():
    """Result.Transformation is the INVERSE of the warp estimate
    (dense_tracking.cpp:417)."""
    ref_i, ref_d = render_plane(np.eye(4))
    pyr = build_rgbd_pyramid(ref_i, ref_d, FX, FY, CX, CY, num_levels=1)
    T0 = np.asarray(_pose(tx=0.01), np.float32)
    out = dense_match_level(pyr[0], pyr[0], jnp.asarray(T0), 0.01,
                            jnp.array([1.0, 0.0]),
                            DvoConfig(max_iterations=2))
    T = np.asarray(out["T"])
    T_api = np.asarray(out["T_api"])
    np.testing.assert_allclose(T_api @ T, np.eye(4), atol=1e-5)
