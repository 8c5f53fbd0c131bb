"""RGB-D mode: metric-scale VO with sensor depth (no scale alignment)."""

import numpy as np
import pytest

from tandem_tpu.pipeline.full_system import FullSystem, FullSystemOptions
from tests.test_coarse_tracker import render_plane, H, W, FX, FY, CX, CY
from tests.test_full_system import make_sequence


def test_rgbd_vo_metric_scale(tmp_path):
    poses_gt, images = make_sequence(n=10, step=0.02)
    opts = FullSystemOptions(selection_threshold_factor=0.35,
                             kf_global_weight=6.0, rgbd=True)
    fs = FullSystem(FX, FY, CX, CY, H, W, options=opts)
    for i, (img, pose) in enumerate(zip(images, poses_gt)):
        _, depth = render_plane(pose)
        fs.add_active_frame(img, i, float(i) * 0.1, depth=depth)
        assert not fs.is_lost

    assert fs.initialized
    # RGB-D fixes metric scale: compare translations WITHOUT scale alignment
    est = np.stack([p[:3, 3] for p in fs.all_poses])
    gt = np.stack([p[:3, 3] for p in poses_gt])
    err = np.abs(est - gt).max()
    assert err < 0.02, err


def test_ba_remove_outliers(rng):
    import jax.numpy as jnp
    from tandem_tpu.tracking.ba import ba_iterate, remove_outliers
    from tests.test_ba import _build_scene, K

    state, images, poses_gt, frames = _build_scene(rng)
    state, _ = ba_iterate(state, images, K, iters=5)
    n0 = int(np.asarray(state.pt_valid).sum())

    # Corrupt a few points' idepths badly -> they become outliers
    bad_idx = jnp.arange(5)
    state = state._replace(
        pt_idepth=state.pt_idepth.at[bad_idx].set(10.0))
    state2 = remove_outliers(state, images, K)
    n1 = int(np.asarray(state2.pt_valid).sum())
    assert n1 < n0
    assert not bool(np.asarray(state2.pt_valid)[:5].any())
