"""DSO-style dataset readers: image folders with times.txt + undistortion.

Parity target: tandem/src/util/DatasetReader.h:115-505 (ImageFolderReader:
alphabetically sorted dir or zip of images, optional times.txt with
"id timestamp exposure" lines, per-image geometric+photometric undistortion
to a float intensity image plus a BGR image for the MVS path) and :506
(RGBDReader adding 16-bit depth PNGs).
"""

from __future__ import annotations

import os
import zipfile
from typing import List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from .undistort import PhotometricUndistorter, Undistort
from .. import native_bridge


class ImageFolderReader:
    def __init__(self, path: str, calib: Optional[str] = None,
                 gamma: Optional[str] = None, vignette: Optional[str] = None,
                 preload: bool = False):
        self.path = path
        self.zip = None
        if path.endswith(".zip"):
            self.zip = zipfile.ZipFile(path)
            names = [n for n in self.zip.namelist()
                     if n.lower().endswith((".jpg", ".png", ".jpeg"))]
            self.files = sorted(names)
        else:
            self.files = sorted(
                f for f in os.listdir(path)
                if f.lower().endswith((".jpg", ".png", ".jpeg")))

        self.undistort = Undistort.from_file(calib) if calib else None
        size = ((self.undistort.w, self.undistort.h)
                if self.undistort else None)
        self.photometric = PhotometricUndistorter(gamma, vignette, size)

        self.timestamps: List[float] = []
        self.exposures: List[float] = []
        self._load_timestamps()

        self._cache = {}
        self._last = (-1, None)   # (idx, bgr): get_image + get_image_bgr
                                  # both read the same frame each step
        self._prefetch = None
        if preload:
            for i in range(len(self.files)):
                self._cache[i] = self._read_raw(i)
        elif self.zip is None:
            # Native background decoder (DatasetReader read-path parity):
            # PNG/JPEG decode runs ahead of the tracking loop.
            from .. import native_bridge
            pf = native_bridge.PrefetchImageLoader(
                [os.path.join(path, f) for f in self.files])
            self._prefetch = pf if pf.native else None

    # ------------------------------------------------------------------
    def _load_timestamps(self):
        """times.txt: 'id timestamp [exposure]' (DatasetReader.h:414)."""
        times_file = (os.path.join(os.path.dirname(self.path.rstrip("/")),
                                   "times.txt")
                      if not self.zip else None)
        candidates = [times_file,
                      os.path.join(self.path, "..", "times.txt")
                      if not self.zip else None]
        for cand in candidates:
            if cand and os.path.exists(cand):
                for line in open(cand):
                    parts = line.split()
                    if len(parts) >= 2:
                        self.timestamps.append(float(parts[1]))
                        self.exposures.append(
                            float(parts[2]) if len(parts) >= 3 else 1.0)
                break
        if not self.timestamps:
            self.timestamps = [i / 30.0 for i in range(len(self.files))]
            self.exposures = [1.0] * len(self.files)

    def _read_raw(self, idx: int) -> np.ndarray:
        if self._last[0] == idx and self._last[1] is not None:
            return self._last[1]
        if self.zip is not None:
            data = np.frombuffer(self.zip.read(self.files[idx]), np.uint8)
            bgr = cv2.imdecode(data, cv2.IMREAD_COLOR)
        elif self._prefetch is not None:
            bgr = self._prefetch.read(idx)
        else:
            bgr = cv2.imread(os.path.join(self.path, self.files[idx]),
                             cv2.IMREAD_COLOR)
        self._last = (idx, bgr)
        return bgr

    def __len__(self):
        return len(self.files)

    def get_timestamp(self, idx: int) -> float:
        """Timestamp only (no decode) — timed-playback scheduling."""
        return self.timestamps[idx]

    def get_image(self, idx: int) -> Tuple[np.ndarray, float, float]:
        """:return: (intensity HxW after undistortion+photometric, timestamp,
        exposure) — ImageAndExposure equivalent. Dtype is uint8 when the
        photometric calibration is identity (values are exact integers
        either way, and uint8 uploads cost 4x less host->device bandwidth —
        FullSystem.add_active_frame upcasts on device); float32 when a
        gamma/vignette correction produces fractional irradiance."""
        bgr = self._cache.get(idx)
        if bgr is None:
            bgr = self._read_raw(idx)
        gray_u8 = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
        if self.photometric.is_identity:
            if self.undistort is not None:
                gray_u8 = native_bridge.remap_u8(
                    gray_u8, self.undistort.remap_x, self.undistort.remap_y)
            return gray_u8, self.timestamps[idx], self.exposures[idx]
        gray = self.photometric.process(gray_u8)
        if self.undistort is not None:
            gray = native_bridge.remap_u8(
                np.clip(gray, 0, 255).astype(np.uint8),
                self.undistort.remap_x, self.undistort.remap_y)
        return gray.astype(np.float32), self.timestamps[idx], \
            self.exposures[idx]

    def get_image_bgr(self, idx: int) -> np.ndarray:
        """Undistorted BGR uint8 for the MVS path
        (getImageBGR_8UC3_undis, DatasetReader.h:270)."""
        bgr = self._cache.get(idx)
        if bgr is None:
            bgr = self._read_raw(idx)
        if self.undistort is not None:
            out = native_bridge.remap_u8(bgr, self.undistort.remap_x,
                                         self.undistort.remap_y)
            return np.clip(out, 0, 255).astype(np.uint8)
        return bgr


class RGBDReader(ImageFolderReader):
    """Adds 16-bit depth PNGs from a sibling 'depth' directory
    (DatasetReader.h:506 RGBDReader)."""

    def __init__(self, path: str, depth_path: Optional[str] = None,
                 depth_scale: float = 1.0 / 5000.0, **kwargs):
        super().__init__(path, **kwargs)
        self.depth_path = depth_path or os.path.join(
            os.path.dirname(path.rstrip("/")), "depth")
        self.depth_scale = depth_scale
        self.depth_files = sorted(
            f for f in os.listdir(self.depth_path)
            if f.lower().endswith(".png"))

    def get_depth(self, idx: int) -> np.ndarray:
        d = cv2.imread(os.path.join(self.depth_path, self.depth_files[idx]),
                       -1)
        return d.astype(np.float32) * self.depth_scale
