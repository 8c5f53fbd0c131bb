"""Software-rasterized 3D viewer — the PangolinDSOViewer substitute.

Parity target: tandem/src/IOWrapper/Pangolin/PangolinDSOViewer.{h,cpp} —
the GL viewer that renders the camera trajectory, keyframe frusta
(KeyFrameDisplay), the fused TANDEM mesh (pushDrMesh,
PangolinDSOViewer.cpp:803), the dense keyframe depth as a colored point
cloud, and 2D video/depth panels, with panel checkboxes (follow camera,
show trajectory/KFs/mesh/points).

TPU-native/headless redesign: no OpenGL. A pure numpy+OpenCV painter's
rasterizer renders the same scene state to an image; when an interactive
HighGUI is available (DISPLAY set) a background thread shows it at ~10 Hz
with mouse orbit/pan/zoom and the panel toggles as key bindings; headless
it writes numbered PNGs (ffmpeg-ready), so every rendering path is testable
in CI. The scene state and draw order match the reference viewer:

  trajectory polyline (green), keyframe frusta (blue; current camera red),
  depth point cloud colored by the rainbow idepth ramp, mesh triangles
  flat-shaded by face normal, horizon grid for orientation.

Keys (interactive): f follow-camera, t trajectory, k keyframes, m mesh,
p points, q/ESC quit — the PangolinDSOViewer panel checkboxes.
"""

from __future__ import annotations

import os
import threading
import time
from typing import List, Optional

import numpy as np

from .output_wrapper import Output3DWrapper, _rainbow


class ViewCamera:
    """Orbit camera: azimuth/elevation/radius around a target point."""

    def __init__(self):
        self.azimuth = -0.5
        self.elevation = -0.45
        self.radius = 6.0
        self.target = np.zeros(3)

    def view_matrix(self) -> np.ndarray:
        """world -> view (4, 4), right-handed, camera looks down +z."""
        ca, sa = np.cos(self.azimuth), np.sin(self.azimuth)
        ce, se = np.cos(self.elevation), np.sin(self.elevation)
        # Camera position on the orbit sphere.
        off = np.array([self.radius * ca * ce, self.radius * se,
                        self.radius * sa * ce])
        eye = self.target + off
        fwd = self.target - eye
        fwd = fwd / np.linalg.norm(fwd)
        up0 = np.array([0.0, -1.0, 0.0])  # DSO world: y points down
        right = np.cross(fwd, up0)
        n = np.linalg.norm(right)
        if n < 1e-6:
            right = np.array([1.0, 0.0, 0.0])
        else:
            right = right / n
        up = np.cross(fwd, right)
        V = np.eye(4)
        V[0, :3], V[1, :3], V[2, :3] = right, up, fwd
        V[:3, 3] = -V[:3, :3] @ eye
        return V


class Viewer3DWrapper(Output3DWrapper):
    """Drop-in Output3DWrapper that renders the 3D scene.

    :param size: (width, height) of the render canvas
    :param K: optional (fx, fy, cx, cy) of the SLAM camera — used to
        back-project pushed keyframe depths into the world point cloud
        (KeyFrameDisplay semantics); without it depth pushes only feed the
        2D panel sinks.
    :param out_dir: when set, every render is saved as view3d_NNNNNN.png
        (headless recording; PangolinDSOViewer's video-record analogue).
    :param interactive: open a HighGUI window on a background thread when
        possible; default auto (DISPLAY set and cv2 import works).
    """

    MAX_TRI = 60000          # painter budget per frame
    MAX_PTS = 120000

    def __init__(self, size=(960, 540), K=None, out_dir: Optional[str] = None,
                 interactive: Optional[bool] = None, point_stride: int = 4):
        self.W, self.H = int(size[0]), int(size[1])
        self.K = K
        self.point_stride = point_stride
        self.out_dir = out_dir
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        self.cam = ViewCamera()
        self.lock = threading.Lock()
        # Scene state
        self.trajectory: List[np.ndarray] = []
        self.kf_poses: List[np.ndarray] = []
        self.current_c2w: Optional[np.ndarray] = None
        self.points: Optional[np.ndarray] = None      # (N, 3)
        self.point_colors: Optional[np.ndarray] = None  # (N, 3) uint8 BGR
        self.mesh: Optional[tuple] = None             # (verts, faces, cols)
        self._last_kf_c2w: Optional[np.ndarray] = None
        self._frame_count = 0
        # Panel toggles (the PangolinDSOViewer checkboxes)
        self.follow = True
        self.show_trajectory = True
        self.show_kfs = True
        self.show_mesh = True
        self.show_points = True
        self._stop = False
        self._thread = None
        if interactive is None:
            interactive = bool(os.environ.get("DISPLAY"))
        if interactive:
            self._thread = threading.Thread(target=self._ui_loop, daemon=True)
            self._thread.start()

    # -- Output3DWrapper sink API --------------------------------------
    def publish_cam_pose(self, frame_id, c2w):
        with self.lock:
            c2w = np.asarray(c2w, np.float64)
            self.trajectory.append(c2w[:3, 3].copy())
            self.current_c2w = c2w
            if self.follow:
                self.cam.target = c2w[:3, 3].copy()

    def publish_keyframes(self, keyframes):
        with self.lock:
            self.kf_poses = [np.asarray(kf.c2w, np.float64)
                             for kf in keyframes]
            if self.kf_poses:
                self._last_kf_c2w = self.kf_poses[-1]

    def push_dr_kf_depth(self, depth, confidence):
        """Back-project the MVS keyframe depth into a world point cloud
        (KeyFrameDisplay / DrFrameDisplay point rendering)."""
        if self.K is None or self._last_kf_c2w is None:
            return
        d = np.asarray(depth, np.float32)
        fx, fy, cx, cy = self.K
        s = self.point_stride
        ds = d[::s, ::s]
        v, u = np.mgrid[0:d.shape[0]:s, 0:d.shape[1]:s].astype(np.float32)
        ok = ds > 0
        z = ds[ok]
        x = (u[ok] - cx) / fx * z
        y = (v[ok] - cy) / fy * z
        pts_cam = np.stack([x, y, z], -1)
        R, t = self._last_kf_c2w[:3, :3], self._last_kf_c2w[:3, 3]
        pts = pts_cam @ R.T + t
        idep = 1.0 / np.maximum(z, 1e-6)
        hi = np.percentile(idep, 98) if idep.size else 1.0
        cols = _rainbow(idep / max(hi, 1e-6))
        with self.lock:
            if self.points is None:
                self.points, self.point_colors = pts, cols
            else:
                self.points = np.concatenate([self.points, pts])[-self.MAX_PTS:]
                self.point_colors = np.concatenate(
                    [self.point_colors, cols])[-self.MAX_PTS:]
        self._maybe_record()

    def push_dr_mesh(self, vertices, faces, colors=None):
        with self.lock:
            self.mesh = (np.asarray(vertices, np.float32),
                         np.asarray(faces, np.int64),
                         None if colors is None
                         else np.asarray(colors))
        self._maybe_record()

    def join(self):
        self._stop = True
        if self._thread is not None:
            self._thread.join(timeout=2.0)

    # -- rendering ------------------------------------------------------
    def _project(self, pts_w: np.ndarray, V: np.ndarray):
        """world (N, 3) -> pixel (N, 2), depth (N,), valid (N,). Simple
        pinhole with focal = H (a ~53 deg vertical FOV like the
        reference's default view)."""
        pv = pts_w @ V[:3, :3].T + V[:3, 3]
        z = pv[:, 2]
        valid = z > 0.05
        zs = np.where(valid, z, 1.0)
        f = float(self.H)
        px = pv[:, 0] / zs * f + self.W / 2.0
        py = pv[:, 1] / zs * f + self.H / 2.0
        valid &= (px > -4 * self.W) & (px < 5 * self.W) \
            & (py > -4 * self.H) & (py < 5 * self.H)
        return np.stack([px, py], -1), z, valid

    @staticmethod
    def _frustum_lines(c2w, scale=0.12):
        w, h, z = 0.8 * scale, 0.5 * scale, scale
        c = np.array([[0, 0, 0], [w, h, z], [w, -h, z], [-w, -h, z],
                      [-w, h, z]])
        pts = c @ c2w[:3, :3].T + c2w[:3, 3]
        idx = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4),
               (4, 1)]
        return pts, idx

    def render(self, canvas: Optional[np.ndarray] = None) -> np.ndarray:
        """Rasterize the current scene; returns (H, W, 3) uint8 BGR."""
        import cv2
        with self.lock:
            traj = np.asarray(self.trajectory, np.float64) \
                if self.trajectory else None
            kfs = list(self.kf_poses)
            cur = self.current_c2w
            pts = None if self.points is None else self.points.copy()
            cols = None if self.point_colors is None \
                else self.point_colors.copy()
            mesh = self.mesh
            V = self.cam.view_matrix()
        img = canvas if canvas is not None else np.full(
            (self.H, self.W, 3), 18, np.uint8)

        # Ground grid (orientation cue; Pangolin's gl grid)
        g = np.arange(-5, 6, 1.0)
        for gv in g:
            for seg in ([[gv, 1.5, -5], [gv, 1.5, 5]],
                        [[-5, 1.5, gv], [5, 1.5, gv]]):
                self._draw_line(img, np.asarray(seg, np.float64), V,
                                (40, 40, 40), 1, cv2)

        # Mesh (painter's algorithm, flat shading by face normal)
        if self.show_mesh and mesh is not None and len(mesh[1]):
            verts, faces, vcols = mesh
            if len(faces) > self.MAX_TRI:
                faces = faces[:: int(np.ceil(len(faces) / self.MAX_TRI))]
            p2, z, ok = self._project(verts, V)
            tri_ok = ok[faces].all(axis=1)
            f2 = faces[tri_ok]
            if len(f2):
                tz = z[f2].mean(axis=1)
                order = np.argsort(-tz)      # back to front
                e1 = verts[f2[:, 1]] - verts[f2[:, 0]]
                e2 = verts[f2[:, 2]] - verts[f2[:, 0]]
                n = np.cross(e1, e2)
                n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True),
                                1e-9)
                shade = (0.35 + 0.65 * np.abs(n @ np.array([0.3, -0.8,
                                                            0.52])))
                if vcols is not None:
                    base = vcols[f2].mean(axis=1)
                    if base.max() <= 1.0:
                        base = base * 255.0
                    base = base[:, ::-1]     # RGB -> BGR
                else:
                    base = np.full((len(f2), 3), 170.0)
                tri_px = p2[f2].astype(np.int32)
                col = np.clip(base * shade[:, None], 0, 255).astype(int)
                for i in order:
                    cv2.fillConvexPoly(img, tri_px[i],
                                       tuple(int(v) for v in col[i]),
                                       lineType=cv2.LINE_8)

        # Point cloud (z-sorted scatter)
        if self.show_points and pts is not None and len(pts):
            p2, z, ok = self._project(pts, V)
            p2i = p2[ok].astype(np.int32)
            c2 = cols[ok]
            zo = np.argsort(-z[ok])
            p2i, c2 = p2i[zo], c2[zo]
            inb = ((p2i[:, 0] >= 0) & (p2i[:, 0] < self.W)
                   & (p2i[:, 1] >= 0) & (p2i[:, 1] < self.H))
            p2i, c2 = p2i[inb], c2[inb]
            img[p2i[:, 1], p2i[:, 0]] = c2

        # Trajectory polyline
        if self.show_trajectory and traj is not None and len(traj) > 1:
            self._draw_line(img, traj, V, (80, 220, 80), 2, cv2)

        # Keyframe frusta + current camera
        if self.show_kfs:
            for c2w in kfs:
                self._draw_frustum(img, c2w, V, (230, 140, 60), cv2)
        if cur is not None:
            self._draw_frustum(img, cur, V, (60, 60, 235), cv2, scale=0.16)
        return img

    def _draw_line(self, img, pts_w, V, color, thick, cv2):
        p2, _, ok = self._project(np.asarray(pts_w, np.float64), V)
        p2 = p2.astype(np.int32)
        for i in range(len(p2) - 1):
            if ok[i] and ok[i + 1]:
                cv2.line(img, tuple(p2[i]), tuple(p2[i + 1]), color, thick,
                         cv2.LINE_AA)

    def _draw_frustum(self, img, c2w, V, color, cv2, scale=0.12):
        pts, idx = self._frustum_lines(np.asarray(c2w, np.float64), scale)
        p2, _, ok = self._project(pts, V)
        p2 = p2.astype(np.int32)
        for a, b in idx:
            if ok[a] and ok[b]:
                cv2.line(img, tuple(p2[a]), tuple(p2[b]), color, 1,
                         cv2.LINE_AA)

    def _maybe_record(self):
        if not self.out_dir:
            return
        try:
            import cv2
        except ImportError:
            return
        img = self.render()
        cv2.imwrite(os.path.join(
            self.out_dir, f"view3d_{self._frame_count:06d}.png"), img)
        self._frame_count += 1

    # -- interactive loop ----------------------------------------------
    def _ui_loop(self):
        try:
            import cv2
            cv2.namedWindow("tandem-tpu 3D", cv2.WINDOW_NORMAL)
        except Exception:
            return

        state = {"drag": None}

        def on_mouse(event, x, y, flags, _):
            if event == cv2.EVENT_LBUTTONDOWN:
                state["drag"] = (x, y)
            elif event == cv2.EVENT_LBUTTONUP:
                state["drag"] = None
            elif event == cv2.EVENT_MOUSEMOVE and state["drag"]:
                dx, dy = x - state["drag"][0], y - state["drag"][1]
                state["drag"] = (x, y)
                with self.lock:
                    self.cam.azimuth += dx * 0.008
                    self.cam.elevation = float(np.clip(
                        self.cam.elevation + dy * 0.008, -1.5, 1.5))
            elif event == cv2.EVENT_MOUSEWHEEL:
                # HighGUI packs the wheel delta into the high bits of
                # `flags`; the raw sign is platform-dependent —
                # getMouseWheelDelta extracts it portably.
                delta = cv2.getMouseWheelDelta(flags)
                with self.lock:
                    self.cam.radius *= 0.9 if delta > 0 else 1.1

        cv2.setMouseCallback("tandem-tpu 3D", on_mouse)
        toggles = {ord("f"): "follow", ord("t"): "show_trajectory",
                   ord("k"): "show_kfs", ord("m"): "show_mesh",
                   ord("p"): "show_points"}
        while not self._stop:
            img = self.render()
            cv2.imshow("tandem-tpu 3D", img)
            key = cv2.waitKey(100) & 0xFF
            if key in (27, ord("q")):
                break
            if key in toggles:
                with self.lock:
                    setattr(self, toggles[key],
                            not getattr(self, toggles[key]))
        cv2.destroyWindow("tandem-tpu 3D")

    # convenience for tests / offline use
    def snapshot(self, path: str):
        import cv2
        cv2.imwrite(path, self.render())
