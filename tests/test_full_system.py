"""FullSystem VO smoke test on a synthetic textured-plane sequence."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from tandem_tpu.core.se3 import se3_exp
from tandem_tpu.pipeline.full_system import FullSystem, FullSystemOptions
from tests.test_coarse_tracker import render_plane, H, W, FX, FY, CX, CY


def make_sequence(n=12, step=0.02):
    poses, images = [], []
    for i in range(n):
        xi = np.array([step * i, -0.4 * step * i, 0.3 * step * i,
                       0.15 * step * i, -0.1 * step * i, 0.05 * step * i],
                      np.float32)
        c2w = np.asarray(se3_exp(jnp.asarray(xi)))
        img, _ = render_plane(c2w)
        poses.append(c2w)
        images.append(img)
    return poses, images


def _align_sim3_translations(est, gt):
    """Umeyama-style scale+rigid alignment of trajectories (translation)."""
    est = np.asarray(est, np.float64)
    gt = np.asarray(gt, np.float64)
    mu_e, mu_g = est.mean(0), gt.mean(0)
    e, g = est - mu_e, gt - mu_g
    scale = (e * g).sum() / np.maximum((e * e).sum(), 1e-12)
    return np.abs(scale * e - g).max()


def test_vo_tracks_sequence(tmp_path):
    # 18 frames: the DSO-grade joint initializer needs snapped + 5 stable
    # frames before promoting (CoarseInitializer :275), so keyframing only
    # starts around frame 8.
    poses_gt, images = make_sequence(n=18)
    opts = FullSystemOptions(selection_threshold_factor=0.35,
                             kf_flow_threshold=0.35, ba_iters=4,
                             init_max_width=0.4)
    fs = FullSystem(FX, FY, CX, CY, H, W, options=opts)
    for i, img in enumerate(images):
        fs.add_active_frame(img, i, float(i) * 0.1)
        assert not fs.is_lost

    assert fs.initialized
    assert len(fs.keyframes) >= 3
    assert len(fs.all_poses) == len(images)

    err = _align_sim3_translations([p[:3, 3] for p in fs.all_poses],
                                   [p[:3, 3] for p in poses_gt])
    # Aligned trajectory error well below the total motion (~0.25 m)
    assert err < 0.03, err

    fs.write_results(str(tmp_path))
    for fname in ("result.txt", "poses_dso.txt", "keyframes_dso.txt",
                  "dso_optimization_windows.txt"):
        assert os.path.exists(tmp_path / fname)
    lines = open(tmp_path / "result.txt").readlines()
    assert len(lines) == len(images)
    assert len(lines[0].split()) == 8
