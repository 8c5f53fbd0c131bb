"""Analytic BA Jacobians validated against moderate-step finite differences.

FD with h=1e-2 is the right reference: autodiff of the bilinear sampler gives
the piecewise-constant in-cell derivative (up to ~22% off the local secant),
while the analytic Jacobians use interpolated central-difference gradients
(DSO's estimator) and land within ~3% of the secant.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tandem_tpu.core.se3 import se3_exp
from tandem_tpu.tracking.ba import (_residual_one, _system_terms,
                                    create_ba_state)
from tests.test_coarse_tracker import render_plane, H, W, FX, FY, CX, CY

K = (FX, FY, CX, CY)
H_STEP = 1e-2


def test_analytic_jacobians_match_finite_differences():
    rng = np.random.RandomState(1234)
    F_SLOTS, N = 3, 12
    state = create_ba_state(F_SLOTS, N)
    imgs, poses = [], []
    for i in range(F_SLOTS):
        xi = np.array([0.05 * i, -0.02 * i, 0.03 * i, 0.01 * i, -0.01 * i,
                       0.008 * i], np.float32)
        c2w = np.asarray(se3_exp(jnp.asarray(xi)))
        img, _ = render_plane(c2w)
        imgs.append(img)
        poses.append(c2w)
    images = jnp.asarray(np.stack(imgs))

    uv = np.stack([rng.randint(8, W - 8, N), rng.randint(8, H - 8, N)],
                  -1).astype(np.float32)
    host = rng.randint(0, F_SLOTS, N).astype(np.int32)
    state = state._replace(
        poses=jnp.asarray(np.stack(poses)),
        aff=jnp.asarray(rng.randn(F_SLOTS, 2).astype(np.float32) * 0.1),
        frame_valid=jnp.ones(F_SLOTS, bool),
        pt_frame=jnp.asarray(host), pt_uv=jnp.asarray(uv),
        pt_idepth=jnp.asarray((0.3 + 0.4 * rng.rand(N)).astype(np.float32)),
        pt_color=jnp.asarray(rng.rand(N, 8).astype(np.float32) * 100),
        pt_valid=jnp.ones(N, bool))

    r, Jf, Ji, J_K, w, active, _ = _system_terms(state, images, K)
    zero8 = jnp.zeros(8)
    zero4 = jnp.zeros(4)
    checked = 0

    for n in range(N):
        for f in range(F_SLOTS):
            if host[n] == f or not bool((w[n, f] > 0).all()):
                continue

            def res(dh, dt, di, dk=zero4):
                rr, _ = _residual_one(
                    dh, dt, state.pt_idepth[n] + di, state.poses[host[n]],
                    state.poses[f], state.aff[host[n]], state.aff[f],
                    state.pt_uv[n], state.pt_color[n], images[f], K, dk)
                return np.asarray(rr)

            np.testing.assert_allclose(np.asarray(r[n, f]),
                                       res(zero8, zero8, 0.0), atol=1e-3)

            def fd_block(argpos):
                J = np.zeros((8, 8), np.float32)
                for k in range(8):
                    e = np.zeros(8, np.float32)
                    e[k] = H_STEP
                    args_p = [zero8, zero8, 0.0]
                    args_m = [zero8, zero8, 0.0]
                    args_p[argpos] = jnp.asarray(e)
                    args_m[argpos] = jnp.asarray(-e)
                    J[:, k] = (res(*args_p) - res(*args_m)) / (2 * H_STEP)
                return J

            Jh_fd = fd_block(0)
            Jt_fd = fd_block(1)
            Ji_fd = (res(zero8, zero8, H_STEP)
                     - res(zero8, zero8, -H_STEP)) / (2 * H_STEP)
            Jk_fd = np.zeros((8, 4), np.float32)
            for k in range(4):
                e = np.zeros(4, np.float32)
                e[k] = H_STEP
                Jk_fd[:, k] = (res(zero8, zero8, 0.0, jnp.asarray(e))
                               - res(zero8, zero8, 0.0, jnp.asarray(-e))
                               ) / (2 * H_STEP)

            for mine, ref in ((np.asarray(Jf[n, f, :, :8]), Jh_fd),
                              (np.asarray(Jf[n, f, :, 8:]), Jt_fd),
                              (np.asarray(Ji[n, f]), Ji_fd),
                              (np.asarray(J_K[n, f]), Jk_fd)):
                diff = np.linalg.norm(mine - ref)
                denom = max(np.linalg.norm(ref), 1e-6)
                assert diff / denom < 0.10 or diff < 2.5, (diff, denom)
            checked += 1
    assert checked > 5
