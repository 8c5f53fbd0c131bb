"""Analytic BA Jacobians vs autodiff of the per-pair residual."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tandem_tpu.core.se3 import se3_exp
from tandem_tpu.tracking.ba import (_residual_one, _system_terms,
                                    create_ba_state)
from tests.test_coarse_tracker import render_plane, H, W, FX, FY, CX, CY

K = (FX, FY, CX, CY)


def test_analytic_jacobians_match_autodiff(rng):
    F_SLOTS, N = 3, 16
    state = create_ba_state(F_SLOTS, N)
    imgs, poses = [], []
    for i in range(F_SLOTS):
        xi = np.array([0.05 * i, -0.02 * i, 0.03 * i, 0.01 * i, -0.01 * i,
                       0.008 * i], np.float32)
        c2w = np.asarray(se3_exp(jnp.asarray(xi)))
        img, depth = render_plane(c2w)
        imgs.append(img)
        poses.append(c2w)
    images = jnp.asarray(np.stack(imgs))

    uv = np.stack([rng.randint(8, W - 8, N), rng.randint(8, H - 8, N)],
                  -1).astype(np.float32)
    host = rng.randint(0, F_SLOTS, N).astype(np.int32)
    idep = (0.3 + 0.4 * rng.rand(N)).astype(np.float32)
    colors = rng.rand(N, 8).astype(np.float32) * 100

    state = state._replace(
        poses=jnp.asarray(np.stack(poses)),
        aff=jnp.asarray(rng.randn(F_SLOTS, 2).astype(np.float32) * 0.1),
        frame_valid=jnp.ones(F_SLOTS, bool),
        pt_frame=jnp.asarray(host), pt_uv=jnp.asarray(uv),
        pt_idepth=jnp.asarray(idep), pt_color=jnp.asarray(colors),
        pt_valid=jnp.ones(N, bool))

    r, Jf, Ji, w, active = _system_terms(state, images, K)

    # Autodiff reference on a handful of (point, target) pairs
    zero8 = jnp.zeros(8)
    checked = 0
    for n in range(N):
        for f in range(F_SLOTS):
            if host[n] == f:
                continue
            ok_mask = w[n, f] > 0
            if not bool(ok_mask.all()):
                continue  # only compare fully-interior pattern samples

            def res(dh, dt, di):
                rr, _ = _residual_one(
                    dh, dt, state.pt_idepth[n] + di, state.poses[host[n]],
                    state.poses[f], state.aff[host[n]], state.aff[f],
                    state.pt_uv[n], state.pt_color[n], images[f], K)
                return rr

            r_ref = res(zero8, zero8, 0.0)
            Jh_ref, Jt_ref, Ji_ref = jax.jacfwd(res, argnums=(0, 1, 2))(
                zero8, zero8, 0.0)
            # Residuals identical
            np.testing.assert_allclose(np.asarray(r[n, f]),
                                       np.asarray(r_ref), atol=1e-3)
            # Pose/idepth Jacobians: the analytic version uses interpolated
            # central-difference image gradients (like DSO); autodiff
            # differentiates the bilinear surface exactly. Compare in the
            # Frobenius norm.

            def frob_close(mine, ref, tol=0.12, abs_tol=3.0):
                mine, ref = np.asarray(mine), np.asarray(ref)
                diff = np.linalg.norm(mine - ref)
                denom = max(np.linalg.norm(ref), 1e-6)
                # relative OR absolute: small-magnitude blocks are dominated
                # by the gradient-estimator difference
                assert diff / denom < tol or diff < abs_tol, (diff, denom)

            frob_close(Jf[n, f, :, :6], Jh_ref[:, :6])
            frob_close(Jf[n, f, :, 8:14], Jt_ref[:, :6])
            # Ji is tiny in magnitude -> relatively noisier under the
            # gradient-estimator difference
            frob_close(Ji[n, f], Ji_ref, tol=0.25)
            # Affine columns involve no image gradients: exact
            np.testing.assert_allclose(np.asarray(Jf[n, f, :, 6:8]),
                                       np.asarray(Jh_ref[:, 6:]), atol=1e-3)
            np.testing.assert_allclose(np.asarray(Jf[n, f, :, 14:]),
                                       np.asarray(Jt_ref[:, 6:]), atol=1e-3)
            checked += 1
    assert checked > 5
