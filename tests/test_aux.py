"""Tests: ATE/RPE tools, augmentation, undistortion, timer, TB logger."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tandem_tpu.eval.ate import (align_horn, associate, evaluate_ate,
                                 evaluate_rpe, evaluate_rpe_stamped,
                                 rpe_stats)
from tandem_tpu.data.augment import augment_batch, color_jitter, motion_blur
from tandem_tpu.utils.timer import Timer


def test_ate_horn_exact_recovery(rng):
    gt = rng.randn(50, 3)
    R_true, _, _ = align_horn(rng.randn(3, 10), rng.randn(3, 10))  # random R
    s_true = 2.0
    t_true = np.array([1.0, -2.0, 0.5])
    est = (gt @ R_true.T) / s_true - (R_true.T @ t_true) / s_true  # inverse map
    # est transformed by (s R | t) should equal gt
    res = evaluate_ate(gt, est, with_scale=True)
    assert res["rmse"] < 1e-6
    assert abs(res["scale"] - s_true) < 1e-6

    res_noscale = evaluate_ate(gt, est, with_scale=False)
    assert res_noscale["rmse"] > 0.1  # scale mismatch not absorbed


def test_rpe_identity():
    poses = [np.eye(4) for _ in range(10)]
    for i, p in enumerate(poses):
        p[0, 3] = 0.1 * i
    res = evaluate_rpe(poses, [p.copy() for p in poses])
    assert res["trans_rmse"] < 1e-12
    assert res["rot_rmse"] < 1e-12


def _traj_line(n, step_t, step_rot=0.0, dt=0.1):
    """{stamp: 4x4} straight-line trajectory: x += step_t, yaw += step_rot."""
    traj = {}
    for i in range(n):
        c, s = np.cos(step_rot * i), np.sin(step_rot * i)
        T = np.eye(4)
        T[:2, :2] = [[c, -s], [s, c]]
        T[0, 3] = step_t * i
        traj[round(i * dt, 6)] = T
    return traj


def test_rpe_stamped_fixed_delta_frames():
    # gt steps 0.10 m/frame, est 0.11 m/frame -> per-pair error 0.01*d m.
    gt = _traj_line(20, 0.10)
    est = _traj_line(20, 0.11)
    for d in (1, 4):
        rows = evaluate_rpe_stamped(gt, est, fixed_delta=True, delta=d,
                                    delta_unit="f")
        te = np.array([r[4] for r in rows])
        assert len(rows) == 20 - d - 1  # pairs hitting the last index drop
        np.testing.assert_allclose(te, 0.01 * d, atol=1e-9)


def test_rpe_stamped_rotation_and_seconds():
    # yaw drift 0.005 rad/frame; stamps at 10 Hz, delta = 0.5 s = 5 frames.
    gt = _traj_line(20, 0.1, step_rot=0.020)
    est = _traj_line(20, 0.1, step_rot=0.025)
    rows = evaluate_rpe_stamped(gt, est, fixed_delta=True, delta=0.5,
                                delta_unit="s")
    re = np.array([r[5] for r in rows])
    np.testing.assert_allclose(re, 0.005 * 5, atol=1e-9)
    stats = rpe_stats(rows)
    assert abs(stats["rot_rmse"] - 0.025) < 1e-9


def test_rpe_stamped_meters_unit():
    # est moves 0.11 m/frame; delta=0.33 m -> closest index 3 frames away.
    gt = _traj_line(20, 0.10)
    est = _traj_line(20, 0.11)
    rows = evaluate_rpe_stamped(gt, est, fixed_delta=True, delta=0.33,
                                delta_unit="m")
    te = np.array([r[4] for r in rows])
    np.testing.assert_allclose(te, 0.01 * 3, atol=1e-9)


def test_rpe_stamped_all_pairs_and_max_pairs():
    gt = _traj_line(6, 0.10)
    est = _traj_line(6, 0.11)
    rows = evaluate_rpe_stamped(gt, est, max_pairs=10000)  # 6 < sqrt(1e4)
    assert len(rows) == 36  # all i,j pairs incl. i==j
    capped = evaluate_rpe_stamped(_traj_line(30, 0.1), _traj_line(30, 0.11),
                                  fixed_delta=True, delta=1, delta_unit="f",
                                  max_pairs=5)
    assert len(capped) == 5


def test_rpe_stamped_scale_compensates():
    gt = _traj_line(15, 0.10)
    est = _traj_line(15, 0.11)
    rows = evaluate_rpe_stamped(gt, est, fixed_delta=True, delta=1,
                                delta_unit="f", scale=0.10 / 0.11)
    assert rpe_stats(rows)["trans_rmse"] < 1e-9


def test_associate():
    a = {0.0: 1, 1.0: 2, 2.0: 3}
    b = {0.01: 1, 1.015: 2, 5.0: 3}
    m = associate(a, b)
    assert len(m) == 2
    assert m[0] == (0.0, 0.01)


def test_color_jitter_bounds(rng):
    img = jnp.asarray(rng.rand(16, 16, 3).astype(np.float32))
    out = color_jitter(jax.random.PRNGKey(0), img)
    out = np.asarray(out)
    assert out.shape == (16, 16, 3)
    assert (out >= 0).all() and (out <= 1).all()
    assert np.abs(out - np.asarray(img)).mean() > 1e-5  # something changed


def test_motion_blur_preserves_mean(rng):
    img = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
    out = motion_blur(jax.random.PRNGKey(1), img)
    assert np.asarray(out).shape == (32, 32, 3)
    # kernel is normalized -> interior mean roughly preserved
    assert abs(float(out[8:-8, 8:-8].mean())
               - float(img[8:-8, 8:-8].mean())) < 0.05


def test_augment_batch_shapes(rng):
    batch = {"image": jnp.asarray(rng.rand(2, 3, 3, 32, 32).astype(np.float32)),
             "depth_min": jnp.ones(2)}
    out = augment_batch(jax.random.PRNGKey(0), batch)
    assert out["image"].shape == (2, 3, 3, 32, 32)
    assert "depth_min" in out
    out2 = augment_batch(jax.random.PRNGKey(0), batch, same_on_views=True)
    assert out2["image"].shape == (2, 3, 3, 32, 32)


def test_timer(tmp_path):
    t = Timer()
    tid = t.start_timing("foo")
    t.end_timing("foo", tid)
    tid = t.start_timing("foo")
    t.end_timing("foo", tid)
    assert len(t.intervals["foo"]) == 2
    t.write_to_file(str(tmp_path / "dr_times.txt"))
    content = open(tmp_path / "dr_times.txt").read()
    assert "foo n=2" in content


def test_undistort_pinhole_identity(tmp_path, rng):
    from tandem_tpu.data.undistort import Undistort
    calib = tmp_path / "calib.txt"
    calib.write_text("Pinhole 300 300 160 120 0\n320 240\nnone\n320 240\n")
    und = Undistort.from_file(str(calib))
    img = (rng.rand(240, 320) * 255).astype(np.float32)
    out = und.undistort_image(img)
    # Pinhole + none: identity remap (interior)
    assert np.abs(out[5:-5, 5:-5] - img[5:-5, 5:-5]).max() < 1e-3


def test_undistort_radtan_runs(tmp_path, rng):
    from tandem_tpu.data.undistort import Undistort
    calib = tmp_path / "calib.txt"
    calib.write_text(
        "RadTan 0.5 0.5 0.5 0.5 -0.28 0.07 0.0002 0.00002\n"
        "752 480\ncrop\n640 480\n")
    und = Undistort.from_file(str(calib))
    assert und.K[0, 0] > 0
    img = (rng.rand(480, 752) * 255).astype(np.float32)
    out = und.undistort_image(img)
    assert out.shape == (480, 640)
    assert np.isfinite(out).all()


def test_photometric_undistorter(tmp_path):
    from tandem_tpu.data.undistort import PhotometricUndistorter
    gamma = tmp_path / "pcalib.txt"
    # quadratic response
    vals = (np.arange(256) ** 1.5)
    gamma.write_text(" ".join(str(v) for v in vals))
    pu = PhotometricUndistorter(str(gamma))
    img = np.array([[0, 128, 255]], np.uint8)
    out = pu.process(img)
    assert out[0, 0] == 0.0
    assert abs(out[0, 2] - 255.0) < 1e-3
    assert out[0, 1] < 128  # concave-up response maps midtones down


def test_panel_output_wrapper(tmp_path):
    """Viewer-grade headless sink: pushDrKfImage/pushDrKfDepth render into
    a composed [image | rainbow idepth | confidence] panel."""
    import numpy as np
    from tandem_tpu.pipeline.output_wrapper import PanelOutputWrapper

    H, W = 32, 48
    ow = PanelOutputWrapper(str(tmp_path))
    rng = np.random.RandomState(0)
    ow.push_dr_kf_image(rng.randint(0, 255, (H, W, 3)).astype(np.uint8))
    depth = rng.uniform(0.5, 3.0, (H, W)).astype(np.float32)
    depth[:4] = 0.0                       # invalid region renders black
    ow.push_dr_kf_depth(depth, rng.rand(H, W).astype(np.float32))
    import cv2
    panel = cv2.imread(str(tmp_path / "dr_kf_000000.png"))
    assert panel is not None and panel.shape == (H, 3 * W, 3)
    # invalid depth -> black in the middle panel
    assert panel[:4, W:2 * W].max() == 0
    # valid depth uses the rainbow ramp (colored, not grayscale)
    mid = panel[8:, W:2 * W].astype(int)
    assert np.abs(mid[..., 0] - mid[..., 2]).max() > 30


def test_tb_logger_summaries(tmp_path, rng):
    """All four IO.SUMMARIES groups (image/depth/confidence/warp —
    tb_logger.py:172-243) write image events without error."""
    from tandem_tpu.train.tb_logger import TBLogger, _HAS_TB
    if not _HAS_TB:
        pytest.skip("tensorboard not available")

    V, H, W = 3, 32, 32
    batch = {
        "image": rng.rand(1, V, 3, H, W).astype(np.float32),
        "image_noaug": rng.rand(1, V, 3, H, W).astype(np.float32),
        "cam_to_world": np.broadcast_to(np.eye(4, dtype=np.float32),
                                        (1, V, 4, 4)).copy(),
        "depth_max": np.array([4.0], np.float32),
        "depth": {}, "mask": {}, "intrinsics": {},
    }
    outputs = {}
    for i, (s, sc) in enumerate(zip(("stage1", "stage2", "stage3"),
                                    (4, 2, 1))):
        h, w = H // sc, W // sc
        batch["depth"][s] = 1.0 + rng.rand(1, h, w).astype(np.float32)
        batch["mask"][s] = (rng.rand(1, h, w) > 0.1)
        K = np.array([[20.0 / sc, 0, (w - 1) / 2],
                      [0, 20.0 / sc, (h - 1) / 2], [0, 0, 1]], np.float32)
        batch["intrinsics"][s] = {"K": K[None]}
        outputs[s] = {"depth": 1.0 + rng.rand(1, h, w).astype(np.float32),
                      "confidence": rng.rand(1, h, w).astype(np.float32)}
    for v in range(V):
        batch["cam_to_world"][0, v, 0, 3] = 0.05 * v

    logger = TBLogger(str(tmp_path), samples_per_step=2, enabled=True)
    logger.add_summaries("train", batch, outputs, global_step=3,
                         summaries=("image", "depth", "confidence", "warp"))
    logger.flush()
    logger.close()
    events = [os.path.join(r, f) for r, _, fs in os.walk(tmp_path)
              for f in fs if "tfevents" in f]
    assert events, "no event files written"
    assert max(os.path.getsize(e) for e in events) > 10_000, (
        "image summaries missing (event file too small)")
