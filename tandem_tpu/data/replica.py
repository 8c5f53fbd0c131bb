"""Replica-TANDEM-Ext dataset reader.

Format spec: reference replica/README.md; behavioural parity target is
cva_mvsnet/models/datasets.py:276-570 (MVSScene/MVSDataset):

- scene dir holds camera.txt, poses_<ext>.txt, tuples_<ext>.txt,
  images/%06d.jpg|png, depths/%06d.png (uint16 * depths/scale.txt).
- tuples may carry a per-tuple DSO scale; poses' translations get multiplied
  unless ignore_pose_scale.
- view ordering: for dso_optimization_windows the reference view is
  ``num_views - 2`` (one before last), otherwise the middle view; output is
  ref-first followed by the remaining views in index order
  (datasets.py:310-324).
- per-stage intrinsics from half-pixel-aware cam_resize; per-stage GT depth
  via nearest resize; masks = depth in [depth_min, depth_max]
  (datasets.py:329-391).

This module is plain numpy (host-side data path); batches feed jitted model
functions directly.
"""

from __future__ import annotations

import os
from os.path import exists, join, splitext
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..core.camera import cam_intrinsics, cam_resize, cam_stack


def _readlines(path: str, num_lines: Optional[int] = None) -> List[str]:
    with open(path, "r") as fp:
        lines = [ln.rstrip() for ln in fp
                 if not ln.startswith("#") and len(ln.strip()) > 0]
    if num_lines is not None and len(lines) != num_lines:
        raise ValueError(f"{path}: expected {num_lines} lines, got {len(lines)}")
    return lines


def _resize(img, height, width, interpolation):
    if height is None or width is None:
        return img
    if img.shape[0] == height and img.shape[1] == width:
        return img
    return cv2.resize(img, (width, height), interpolation=interpolation)


def mask_depth(depth, depth_min, depth_max):
    mask = np.logical_and(depth >= depth_min, depth <= depth_max)
    depth = np.where(mask, depth, 0).astype(depth.dtype)
    return depth, mask.astype(depth.dtype)


class MVSScene:
    """One Replica scene: lazily loads (image, depth, pose) view tuples."""

    def __init__(self, scene_dir: str, pose_ext: str = "gt",
                 height: Optional[int] = None, width: Optional[int] = None,
                 tuples_ext: Optional[str] = "dso_optimization_windows",
                 ignore_pose_scale: bool = True,
                 tuples_default_flag: bool = False,
                 tuples_default_frame_num: int = 3,
                 tuples_default_frame_dist: int = 20,
                 depth_min: float = 0.01, depth_max: float = 10.0,
                 dtype: str = "float32", interpolation: Optional[int] = None):
        self.scene_dir = scene_dir
        self.dtype = dtype
        self.depth_min = depth_min
        self.depth_max = depth_max
        self.interpolation = (interpolation if interpolation is not None
                              else (cv2.INTER_NEAREST if cv2 else 0))

        tuples_ext = tuples_ext if tuples_ext is not None else pose_ext
        self.tuples_file = join(scene_dir, f"tuples_{tuples_ext}.txt")
        self.poses_file = join(scene_dir, f"poses_{pose_ext}.txt")
        self.depth_scale = float(
            _readlines(join(scene_dir, "depths", "scale.txt"), 1)[0])

        self.cam_base = self._read_camera()
        self.height = height if height is not None else self.cam_base["height"]
        self.width = width if width is not None else self.cam_base["width"]
        assert self.height % 4 == 0 and self.width % 4 == 0

        self.poses = self._read_poses()
        if tuples_default_flag:
            self.scales = None
            self.tuples = self._generate_tuples(
                tuples_default_frame_num, tuples_default_frame_dist)
        else:
            self.tuples, self.scales = self._read_tuples(ignore_pose_scale)

        self.num_views = len(self.tuples[0])
        if tuples_ext == "dso_optimization_windows":
            self.ref_index = self.num_views - 2  # one before last
        else:
            self.ref_index = self.num_views // 2
        self.out_indices = (self.ref_index,) + tuple(
            i for i in range(self.num_views) if i != self.ref_index)

    # --- file parsing -----------------------------------------------------
    def _read_camera(self) -> dict:
        lines = _readlines(join(self.scene_dir, "camera.txt"))
        parts = lines[0].split(" ")
        if parts[0].lower() == "pinhole":
            parts = parts[1:]
        fx, fy, cx, cy, flag = [float(x) for x in parts[:5]]
        assert int(flag) == 0, "only half_pixel_centers=False supported"
        w, h = [int(x) for x in lines[1].split(" ")[:2]]
        return cam_intrinsics(height=h, width=w, fx=fx, fy=fy, cx=cx, cy=cy,
                              dtype=np.dtype(self.dtype))

    def _read_poses(self) -> Dict[int, np.ndarray]:
        poses = {}
        for line in _readlines(self.poses_file):
            vals = line.split(" ")
            idx = int(vals[0])
            poses[idx] = np.array([float(v) for v in vals[1:17]],
                                  dtype=self.dtype).reshape(4, 4)
        return poses

    def _read_tuples(self, ignore_scale: bool):
        lines = _readlines(self.tuples_file)
        num_views = int(lines[0].split(" ")[0])
        has_scale = len(lines[0].split(" ")) == num_views + 2
        use_scale = has_scale and not ignore_scale
        tuples, scales = [], ([] if use_scale else None)
        for line in lines:
            vals = line.split(" ")
            assert int(vals[0]) == num_views
            tuples.append(tuple(int(v) for v in vals[1:1 + num_views]))
            if use_scale:
                scales.append(float(vals[-1]))
        return tuple(tuples), (tuple(scales) if use_scale else None)

    def _generate_tuples(self, frame_num: int, frame_dist: int):
        lo, hi = min(self.poses), max(self.poses)
        spaced = 1 + (hi - lo) // frame_dist
        count = spaced - frame_num + 1
        tuples = tuple(
            tuple((i + j) * frame_dist for j in range(frame_num))
            for i in range(count))
        for tup in tuples:
            for f in tup:
                assert f in self.poses, f"frame {f} has no pose"
        return tuples

    # --- per-frame IO -----------------------------------------------------
    def read_image(self, frame_index: int) -> np.ndarray:
        fname = join(self.scene_dir, "images", f"{frame_index:06d}.jpg")
        if not exists(fname):
            fname = splitext(fname)[0] + ".png"
        img = cv2.imread(fname, -1)
        assert img is not None, fname
        img = _resize(img, self.height, self.width, self.interpolation)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return np.transpose(img, (2, 0, 1)).astype(self.dtype) / 255.0

    def read_depth(self, frame_index: int) -> np.ndarray:
        fname = join(self.scene_dir, "depths", f"{frame_index:06d}.png")
        depth = cv2.imread(fname, -1)
        assert depth is not None, fname
        depth = _resize(depth, self.height, self.width, self.interpolation)
        return self.depth_scale * depth.astype(self.dtype)

    # --- dataset protocol -------------------------------------------------
    def __len__(self):
        return len(self.tuples)

    def __getitem__(self, idx: int) -> dict:
        cam_base = cam_resize(self.cam_base, self.height, self.width)
        current = self.tuples[idx]

        poses, images, depths, cams = [], [], [], []
        for view_index in self.out_indices:
            frame = current[view_index]
            p = np.copy(self.poses[frame])
            if self.scales is not None:
                p[:3, 3] *= self.scales[idx]
            poses.append(p)
            images.append(self.read_image(frame))
            depths.append(self.read_depth(frame))
            cams.append(dict(cam_base))

        poses = np.stack(poses)
        images = np.stack(images)

        depth_s3 = np.copy(depths[0])
        depth_s2 = _resize(depth_s3, self.height // 2, self.width // 2,
                           self.interpolation)
        depth_s1 = _resize(depth_s3, self.height // 4, self.width // 4,
                           self.interpolation)
        depth_s3, mask_s3 = mask_depth(depth_s3, self.depth_min, self.depth_max)
        depth_s2, mask_s2 = mask_depth(depth_s2, self.depth_min, self.depth_max)
        depth_s1, mask_s1 = mask_depth(depth_s1, self.depth_min, self.depth_max)

        return {
            "intrinsics": {
                "stage3": cam_stack(cams),
                "stage2": cam_stack([cam_resize(c, c["height"] // 2,
                                                c["width"] // 2) for c in cams]),
                "stage1": cam_stack([cam_resize(c, c["height"] // 4,
                                                c["width"] // 4) for c in cams]),
            },
            "depth": {"stage3": depth_s3, "stage2": depth_s2, "stage1": depth_s1},
            "mask": {"stage3": mask_s3, "stage2": mask_s2, "stage1": mask_s1},
            "cam_to_world": poses,
            "image": images,
            "depth_min": np.dtype(self.dtype).type(self.depth_min),
            "depth_max": np.dtype(self.dtype).type(self.depth_max),
            "view_index": np.array(self.out_indices, dtype=np.int64),
        }


class MVSDataset:
    """Concatenation of the scenes listed in <root>/<split>.txt
    (datasets.py:524-570). Format parity: the split file holds ONE line of
    space-separated scene names and scenes live directly under the root
    (read_scene_names, datasets.py:568-570); one-name-per-line files are
    also accepted."""

    def __init__(self, root_dir: str, split: str, **scene_kwargs):
        lines = _readlines(join(root_dir, split if split.endswith(".txt")
                                else f"{split}.txt"))
        scene_names = [name for line in lines for name in line.split(" ")
                       if name]
        self.scenes = [MVSScene(join(root_dir, name), **scene_kwargs)
                       for name in scene_names]
        self.start = np.cumsum([0] + [len(s) for s in self.scenes])

    def __len__(self):
        return int(self.start[-1])

    def __getitem__(self, idx: int) -> dict:
        scene_idx = int(np.searchsorted(self.start, idx, side="right") - 1)
        return self.scenes[scene_idx][idx - int(self.start[scene_idx])]


class NamedDataset:
    """Tags every sample with its dataset name (datasets.py:573-593) — the
    per-dataset epoch_end_mean reducers key off ``dataset_name``."""

    def __init__(self, *, name: str, dataset):
        self.name = name
        self.dataset = dataset

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        item = self.dataset[idx]
        assert isinstance(item, dict)
        assert "dataset_name" not in item, list(item.keys())
        item["dataset_name"] = self.name
        return item

    def __repr__(self):
        return f"NamedDataset: name={self.name}, dataset={self.dataset!r}"


class TruncatedDataset:
    """Length-limited view of a dataset; ``front=True`` keeps the LAST
    ``length`` samples (datasets.py:596-615 semantics, offset included)."""

    def __init__(self, *, length: int, dataset, front: bool = False):
        self.length = min(length, len(dataset))
        self.dataset = dataset
        self.offset = len(dataset) - self.length if front else 0

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        if idx < self.length:
            return self.dataset[self.offset + idx]
        raise IndexError(f"Index {idx} out of bounds for TruncatedDataset "
                         f"of length {self.length}")

    def __repr__(self):
        return (f"TruncatedDataset: length={self.length}, "
                f"offset={self.offset}, dataset={self.dataset!r}")


def collate(items: Sequence[dict]) -> dict:
    """Stack sample dicts into batched numpy arrays (model input contract)."""
    def stack(key_path, items):
        v0 = items[0]
        if isinstance(v0, dict):
            return {k: stack(key_path + (k,), [it[k] for it in items])
                    for k in v0}
        return np.stack([np.asarray(it) for it in items])
    return stack((), list(items))


def make_batches(dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = True, seed: int = 1234,
                 num_workers: int = 0, prefetch_batches: int = 2):
    """Host-side batch iterator (replaces the torch DataLoader,
    datasets.py:622-655).

    With ``num_workers > 0`` samples are decoded by a thread pool and
    assembled into IN-ORDER batches with a bounded lookahead of
    ``prefetch_batches`` beyond the one being consumed — the reference's
    num_workers=3 loader overlap (the decode path is cv2.imread/resize +
    numpy, which all release the GIL, so threads scale where torch needs
    worker processes). Batch contents and order are identical to the
    serial path for the same seed.
    """
    order = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    n = len(order)
    end = n - (n % batch_size) if drop_last else n
    batches = [order[i:i + batch_size] for i in range(0, end, batch_size)]

    if num_workers <= 0:
        for idx in batches:
            yield collate([dataset[int(j)] for j in idx])
        return

    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        pending = deque()   # deque of per-batch [sample futures]
        bi = iter(batches)

        def submit():
            idx = next(bi, None)
            if idx is None:
                return False
            pending.append([ex.submit(dataset.__getitem__, int(j))
                            for j in idx])
            return True

        for _ in range(1 + prefetch_batches):
            if not submit():
                break
        while pending:
            futs = pending.popleft()
            yield collate([f.result() for f in futs])
            submit()
