"""Trajectory evaluation: ATE (Horn alignment), RPE, Sim(3) alignment.

Python-3 re-implementation of the TUM RGB-D evaluation tools the reference
vendors (tandem/tum_rgbd_eval_tools/: associate.py, evaluate_ate.py with the
Horn closed-form alignment :48-60, evaluate_rpe.py, align_se3.py which also
outputs the scale used by the EuRoC scripts).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def associate(first: Dict[float, np.ndarray], second: Dict[float, np.ndarray],
              offset: float = 0.0, max_difference: float = 0.02
              ) -> List[Tuple[float, float]]:
    """Greedy timestamp matching (associate.py semantics)."""
    first_keys = sorted(first.keys())
    second_keys = sorted(second.keys())
    potential = [(abs(a - (b + offset)), a, b)
                 for a in first_keys for b in second_keys
                 if abs(a - (b + offset)) < max_difference]
    potential.sort()
    matches = []
    used_a, used_b = set(), set()
    for _, a, b in potential:
        if a not in used_a and b not in used_b:
            used_a.add(a)
            used_b.add(b)
            matches.append((a, b))
    matches.sort()
    return matches


def align_horn(model: np.ndarray, data: np.ndarray,
               with_scale: bool = False):
    """Closed-form rigid (or similarity) alignment of 3xN point sets:
    returns (R, t, s) minimizing ||s R model + t - data||.

    evaluate_ate.py:48-60 (Horn 1987); align_se3.py adds the scale.
    """
    mu_m = model.mean(axis=1, keepdims=True)
    mu_d = data.mean(axis=1, keepdims=True)
    mc = model - mu_m
    dc = data - mu_d
    W = mc @ dc.T
    U, S, Vt = np.linalg.svd(W)
    D = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        D[2, 2] = -1
    R = Vt.T @ D @ U.T
    if with_scale:
        s = np.trace(np.diag(S) @ D) / np.maximum((mc * mc).sum(), 1e-12)
    else:
        s = 1.0
    t = mu_d - s * (R @ mu_m)
    return R, t, s


def align_sim3(model: np.ndarray, data: np.ndarray):
    return align_horn(model, data, with_scale=True)


def evaluate_ate(gt_xyz: np.ndarray, est_xyz: np.ndarray,
                 with_scale: bool = False) -> Dict[str, float]:
    """:param gt_xyz, est_xyz: (N, 3) associated positions
    :return: dict with rmse/mean/median/std/min/max of aligned errors."""
    model = est_xyz.T
    data = gt_xyz.T
    R, t, s = align_horn(model, data, with_scale=with_scale)
    aligned = s * (R @ model) + t
    err = np.linalg.norm(aligned - data, axis=0)
    return {
        "rmse": float(np.sqrt((err ** 2).mean())),
        "mean": float(err.mean()),
        "median": float(np.median(err)),
        "std": float(err.std()),
        "min": float(err.min()),
        "max": float(err.max()),
        "scale": float(s),
        "num_pairs": int(err.shape[0]),
    }


def _pose_distance(T: np.ndarray) -> Tuple[float, float]:
    trans = float(np.linalg.norm(T[:3, 3]))
    angle = float(np.arccos(np.clip((np.trace(T[:3, :3]) - 1) / 2, -1, 1)))
    return trans, angle


def evaluate_rpe(gt_poses: Sequence[np.ndarray],
                 est_poses: Sequence[np.ndarray],
                 delta: int = 1) -> Dict[str, float]:
    """Relative pose error over frame pairs (i, i+delta)
    (evaluate_rpe.py semantics, fixed delta in frames)."""
    terrs, rerrs = [], []
    n = min(len(gt_poses), len(est_poses))
    for i in range(n - delta):
        gt_rel = np.linalg.inv(gt_poses[i]) @ gt_poses[i + delta]
        est_rel = np.linalg.inv(est_poses[i]) @ est_poses[i + delta]
        err = np.linalg.inv(gt_rel) @ est_rel
        te, re = _pose_distance(err)
        terrs.append(te)
        rerrs.append(re)
    terrs = np.array(terrs)
    rerrs = np.array(rerrs)
    return {
        "trans_rmse": float(np.sqrt((terrs ** 2).mean())),
        "trans_mean": float(terrs.mean()),
        "rot_rmse": float(np.sqrt((rerrs ** 2).mean())),
        "rot_mean": float(rerrs.mean()),
        "num_pairs": int(len(terrs)),
    }


def load_tum_trajectory(path: str) -> Dict[float, np.ndarray]:
    """Read a TUM-format file -> {timestamp: (tx ty tz qx qy qz qw)}."""
    out = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            vals = [float(v) for v in line.split()]
            out[vals[0]] = np.array(vals[1:8])
    return out


def tum_to_xyz(traj: Dict[float, np.ndarray], keys) -> np.ndarray:
    return np.stack([traj[k][:3] for k in keys])
