"""Data layer tests on a synthetic Replica-format scene."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tandem_tpu.data.replica import MVSScene, MVSDataset, collate, make_batches


def write_scene(scene_dir, n_frames=10, H=48, W=64, depth_scale=6.5535e-5 * 10):
    os.makedirs(os.path.join(scene_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(scene_dir, "depths"), exist_ok=True)
    rng = np.random.RandomState(0)
    with open(os.path.join(scene_dir, "camera.txt"), "w") as f:
        f.write("60.0 60.0 31.5 23.5 0\n")
        f.write(f"{W} {H}\n")
    with open(os.path.join(scene_dir, "depths", "scale.txt"), "w") as f:
        f.write(f"{depth_scale}\n")
    with open(os.path.join(scene_dir, "poses_gt.txt"), "w") as f:
        for i in range(n_frames):
            T = np.eye(4)
            T[0, 3] = 0.1 * i
            vals = " ".join(str(v) for v in T.reshape(-1))
            f.write(f"{i} {vals}\n")
    # 7-view dso windows with scale column
    with open(os.path.join(scene_dir, "tuples_dso_optimization_windows.txt"), "w") as f:
        for i in range(n_frames - 7):
            frames = " ".join(str(i + j) for j in range(7))
            f.write(f"7 {frames} 1.5\n")
    for i in range(n_frames):
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        cv2.imwrite(os.path.join(scene_dir, "images", f"{i:06d}.jpg"), img)
        depth = rng.randint(1000, 60000, (H, W)).astype(np.uint16)
        cv2.imwrite(os.path.join(scene_dir, "depths", f"{i:06d}.png"), depth)
    return scene_dir


def test_scene_window_ordering(tmp_path):
    scene = MVSScene(write_scene(str(tmp_path / "scene0")))
    # dso_optimization_windows: ref view is one before last (datasets.py:323)
    assert scene.ref_index == 5
    assert scene.out_indices == (5, 0, 1, 2, 3, 4, 6)
    item = scene[0]
    assert item["image"].shape == (7, 3, 48, 64)
    assert item["cam_to_world"].shape == (7, 4, 4)
    # ref-first ordering: view 0 pose is frame index 5's pose (x = 0.5 * 1.0)
    # NOTE scale ignored by default (ignore_pose_scale=True)
    assert np.isclose(item["cam_to_world"][0, 0, 3], 0.5)


def test_scene_pose_scale(tmp_path):
    scene = MVSScene(write_scene(str(tmp_path / "scene1")),
                     ignore_pose_scale=False)
    item = scene[0]
    # scale 1.5 applied to translation
    assert np.isclose(item["cam_to_world"][0, 0, 3], 0.75)


def test_masks_and_stage_depths(tmp_path):
    scene = MVSScene(write_scene(str(tmp_path / "scene2")))
    item = scene[0]
    for stage, scale in (("stage1", 4), ("stage2", 2), ("stage3", 1)):
        d = item["depth"][stage]
        m = item["mask"][stage]
        assert d.shape == (48 // scale, 64 // scale)
        assert ((d == 0) | ((d >= 0.01) & (d <= 10.0))).all()
        assert set(np.unique(m)).issubset({0.0, 1.0})
        K = item["intrinsics"][stage]["K"]
        assert K.shape == (7, 3, 3)
    # stage2 K uses half-pixel-aware resize, not naive 0.5x
    K3 = item["intrinsics"]["stage3"]["K"][0]
    K2 = item["intrinsics"]["stage2"]["K"][0]
    assert np.isclose(K2[0, 0], 0.5 * K3[0, 0])
    assert np.isclose(K2[0, 2], 0.5 * (64 // 2 - 1) + 0.5 * (K3[0, 2] - 31.5))


def test_dataset_and_batches(tmp_path):
    root = tmp_path / "root"
    os.makedirs(root, exist_ok=True)
    write_scene(str(root / "office0"))
    write_scene(str(root / "office1"))
    with open(root / "val.txt", "w") as f:
        f.write("office0 office1\n")  # reference format: one line
    ds = MVSDataset(str(root), "val")
    assert len(ds) == 6
    batches = list(make_batches(ds, batch_size=2, shuffle=True))
    assert len(batches) == 3
    b = batches[0]
    assert b["image"].shape == (2, 7, 3, 48, 64)
    assert b["depth"]["stage1"].shape == (2, 12, 16)
    assert b["depth_min"].shape == (2,)


def test_named_truncated_wrappers(tmp_path):
    """NamedDataset tags samples; TruncatedDataset limits length with the
    front/back offset semantics (datasets.py:573-615)."""
    from tandem_tpu.data.replica import NamedDataset, TruncatedDataset

    scene = MVSScene(write_scene(str(tmp_path / "scene9")))
    named = NamedDataset(name="replica", dataset=scene)
    assert len(named) == len(scene)
    assert named[0]["dataset_name"] == "replica"

    n = len(scene)
    back = TruncatedDataset(length=n - 1, dataset=scene)
    front = TruncatedDataset(length=n - 1, dataset=scene, front=True)
    assert len(back) == len(front) == n - 1
    assert np.array_equal(back[0]["image"], scene[0]["image"])
    assert np.array_equal(front[0]["image"], scene[1]["image"])
    try:
        back[n - 1]
        assert False, "expected IndexError"
    except IndexError:
        pass


def test_make_batches_workers_identical(tmp_path):
    """num_workers>0 yields byte-identical batches in identical order to the
    serial path (in-order assembly), for both shuffle modes."""
    root = tmp_path / "root"
    os.makedirs(root, exist_ok=True)
    write_scene(str(root / "office0"))
    with open(root / "val.txt", "w") as f:
        f.write("office0\n")
    ds = MVSDataset(str(root), "val")
    for shuffle in (False, True):
        serial = list(make_batches(ds, 1, shuffle=shuffle, seed=7))
        threaded = list(make_batches(ds, 1, shuffle=shuffle, seed=7,
                                     num_workers=3))
        assert len(serial) == len(threaded) == 3
        for a, b in zip(serial, threaded):
            np.testing.assert_array_equal(a["image"], b["image"])
            np.testing.assert_array_equal(a["depth"]["stage3"],
                                          b["depth"]["stage3"])
            np.testing.assert_array_equal(a["cam_to_world"],
                                          b["cam_to_world"])


def test_make_batches_workers_overlap():
    """Loader overlap (datasets.py:622-655 num_workers parity): with a slow
    dataset and a slow consumer, the threaded loader hides the decode time
    inside the consume time — wall clock ~ max, not sum."""
    import time

    class SlowDS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            time.sleep(0.05)           # 'decode'
            return {"x": np.full((4,), i, np.float32)}

    ds = SlowDS()

    def consume(num_workers):
        t0 = time.time()
        seen = []
        for b in make_batches(ds, 1, num_workers=num_workers,
                              prefetch_batches=3):
            time.sleep(0.05)           # 'train step'
            seen.append(int(b["x"][0, 0]))
        return time.time() - t0, seen

    t_serial, order_s = consume(0)
    t_thread, order_t = consume(3)
    assert order_s == order_t == list(range(8))
    # serial ~ 8*(0.05+0.05) = 0.8 s; threaded ~ 8*0.05 + startup ~ 0.45 s
    assert t_thread < 0.75 * t_serial, (t_thread, t_serial)
