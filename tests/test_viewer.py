"""Software 3D viewer tests (pipeline/viewer.py — the PangolinDSOViewer
substitute): projection geometry, scene sinks, toggles, recording."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tandem_tpu.pipeline.viewer import Viewer3DWrapper


class _KF:
    def __init__(self, c2w):
        self.c2w = c2w


def make_viewer(**kw):
    kw.setdefault("interactive", False)
    kw.setdefault("size", (320, 240))
    return Viewer3DWrapper(**kw)


def test_render_empty_scene():
    v = make_viewer()
    img = v.render()
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    # Ground grid lines should leave some non-background pixels.
    assert (img > 30).any()


def test_trajectory_projects_to_pixels():
    v = make_viewer()
    v.show_mesh = v.show_points = v.show_kfs = False
    v.follow = False
    v.cam.target = np.zeros(3)
    # Straight-line trajectory through the orbit target.
    for i in range(10):
        c2w = np.eye(4)
        c2w[:3, 3] = [0.1 * i - 0.5, 0.0, 0.0]
        v.publish_cam_pose(i, c2w)
    base = make_viewer()
    base.show_mesh = base.show_points = base.show_kfs = False
    base.follow = False
    img, empty = v.render(), base.render()
    # The green polyline adds pixels the empty render lacks, near mid-frame.
    diff = (img.astype(int) - empty.astype(int)).sum(-1)
    ys, xs = np.nonzero(np.abs(diff) > 30)
    assert len(xs) > 20
    assert abs(xs.mean() - 160) < 80 and abs(ys.mean() - 120) < 80
    # and it is greenish (B, G, R) — G dominant where changed
    ch = img[ys, xs].astype(int)
    assert ch[:, 1].mean() > ch[:, 0].mean()
    assert ch[:, 1].mean() > ch[:, 2].mean()


def test_keyframe_frusta_and_toggle():
    v = make_viewer()
    v.show_mesh = v.show_points = v.show_trajectory = False
    v.follow = False
    kfs = [_KF(np.eye(4))]
    v.publish_keyframes(kfs)
    with_kf = v.render().copy()
    v.show_kfs = False
    without = v.render()
    assert (with_kf != without).any()


def test_depth_backprojection_point_cloud():
    v = make_viewer(K=(100.0, 100.0, 63.5, 47.5))
    v.publish_keyframes([_KF(np.eye(4))])
    depth = np.full((96, 128), 2.0, np.float32)
    v.push_dr_kf_depth(depth, np.ones_like(depth))
    assert v.points is not None and len(v.points) > 500
    # All points lie on the z=2 plane in front of the identity keyframe.
    np.testing.assert_allclose(v.points[:, 2], 2.0, atol=1e-5)
    assert v.point_colors.shape == v.points.shape


def test_mesh_render_and_record(tmp_path):
    out = str(tmp_path / "rec")
    v = make_viewer(out_dir=out)
    v.follow = False
    verts = np.array([[-1, -1, 3], [1, -1, 3], [0, 1, 3]], np.float32)
    faces = np.array([[0, 1, 2]], np.int64)
    v.push_dr_mesh(verts, faces)
    img = v.render()
    # The shaded triangle covers a solid area near the image center.
    grey = img.mean(-1)
    assert (grey > 60).sum() > 500
    # Recording wrote a PNG on the mesh push.
    assert os.path.exists(os.path.join(out, "view3d_000000.png"))


def test_snapshot(tmp_path):
    v = make_viewer()
    p = str(tmp_path / "snap.png")
    v.snapshot(p)
    assert cv2.imread(p) is not None
