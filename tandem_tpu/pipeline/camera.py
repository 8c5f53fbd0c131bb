"""Live camera interface for the demo path.

Parity target: tandem/src/realsense/* (D455 mono RGB stream wrapper,
realsense.h:17,37: intrinsics -> DSO calib conversion) and
main_tandem_realsense.cpp. Without librealsense on TPU hosts, the interface
is a small ABC with two implementations: an OpenCV VideoCapture camera (any
UVC webcam) and a replay camera over an image folder (for demo testing).
"""

from __future__ import annotations

import time
from typing import Iterator, Optional, Tuple

import numpy as np


class Camera:
    """Mono RGB stream with pinhole intrinsics."""

    def intrinsics(self) -> Tuple[float, float, float, float, int, int]:
        """:return: fx, fy, cx, cy, width, height (DSO calib convention)."""
        raise NotImplementedError

    def frames(self) -> Iterator[Tuple[np.ndarray, float]]:
        """Yield (bgr uint8 HxWx3, timestamp seconds)."""
        raise NotImplementedError

    def write_calib(self, path: str):
        """Emit a DSO-format camera.txt (realsense.h intrinsics->calib)."""
        fx, fy, cx, cy, w, h = self.intrinsics()
        with open(path, "w") as f:
            f.write(f"Pinhole {fx} {fy} {cx} {cy} 0\n{w} {h}\n")
            f.write("none\n")
            f.write(f"{w} {h}\n")


class OpenCVCamera(Camera):
    def __init__(self, device: int = 0, width: int = 640, height: int = 480,
                 fov_deg: float = 70.0):
        import cv2
        self.cap = cv2.VideoCapture(device)
        self.cap.set(cv2.CAP_PROP_FRAME_WIDTH, width)
        self.cap.set(cv2.CAP_PROP_FRAME_HEIGHT, height)
        self.w, self.h = width, height
        # Coarse focal approximation when no calibration is given (the
        # reference demo supports calib=X omitted with a coarse approx,
        # DEMO.md).
        self.fx = 0.5 * width / np.tan(np.deg2rad(fov_deg) / 2)

    def intrinsics(self):
        return (self.fx, self.fx, (self.w - 1) / 2.0, (self.h - 1) / 2.0,
                self.w, self.h)

    def frames(self):
        while True:
            ok, frame = self.cap.read()
            if not ok:
                return
            yield frame, time.time()


class ReplayCamera(Camera):
    """Image-folder replay with the live-camera interface (demo testing)."""

    def __init__(self, folder: str, calib: Tuple[float, float, float, float],
                 fps: float = 30.0, realtime: bool = False):
        import os
        import cv2
        self.cv2 = cv2
        self.files = sorted(
            os.path.join(folder, f) for f in os.listdir(folder)
            if f.lower().endswith((".png", ".jpg", ".jpeg")))
        first = cv2.imread(self.files[0])
        self.h, self.w = first.shape[:2]
        self.fx, self.fy, self.cx, self.cy = calib
        self.fps = fps
        self.realtime = realtime

    def intrinsics(self):
        return self.fx, self.fy, self.cx, self.cy, self.w, self.h

    def frames(self):
        t0 = time.time()
        for i, f in enumerate(self.files):
            ts = i / self.fps
            if self.realtime:
                lag = ts - (time.time() - t0)
                if lag > 0:
                    time.sleep(lag)
            yield self.cv2.imread(f), ts
