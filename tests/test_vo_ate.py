"""End-to-end VO trajectory quality gate: ATE on the committed fixture.

Drives the REAL cli/tandem_dataset path headless over the trajectory-grade
fixture (tests/fixtures/replica_traj: 64 frames, 256x192, ~1.5 m travel,
supersampled renders, GT poses), then Sim3-aligns result.txt vs GT and
asserts ATE below committed thresholds — the EuRoC stand-in for the
reference's trajectory record (scripts/tracking_euroc_eval.bash ->
align_se3.py scale + tum_rgbd_eval_tools/evaluate_ate.py:48-60 Horn
alignment; no EuRoC data ships in this environment).

Two configurations:
  1. Monocular VO only (sparse photometric tracking + windowed BA).
  2. The FULL pipeline: trained abl04 (48,4,4) weights, MVS depth -> TSDF
     fusion -> rendered-depth dense tracking — the system's novel feedback
     loop, end to end, with a mesh-non-empty check.

Measured 2026-08-19 (docs/PERF.md round 4): VO-only 10.26 mm RMSE, full
pipeline 10.15 mm RMSE over ~1.5 m travel, 64/64 frames, bit-identical
across repeated runs (XLA CPU is deterministic). Thresholds carry ~3x
margin so regressions fail loudly while compiler-version drift cannot
flake.
"""

import os

import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "replica_traj", "scene0")
EXPORTED = os.path.join(REPO, "exported", "tandem")


def _run_pipeline(out_dir: str, mvsnet: bool) -> dict:
    from tandem_tpu.cli import tandem_dataset
    from tandem_tpu.eval.ate import (associate, evaluate_ate,
                                     load_tum_trajectory, tum_to_xyz)

    argv = [
        "preset=dataset",
        f"files={os.path.join(FIXTURE, 'images')}",
        f"calib={os.path.join(FIXTURE, 'camera_dso.txt')}",
        f"result_folder={out_dir}",
    ]
    if mvsnet:
        argv.append(f"mvsnet_folder={EXPORTED}")
    tandem_dataset.main(argv)

    gt = load_tum_trajectory(os.path.join(FIXTURE, "gt_tum.txt"))
    est = load_tum_trajectory(os.path.join(out_dir, "result.txt"))
    matches = associate(gt, est)
    assert len(matches) >= 56, (
        f"only {len(matches)}/64 frames tracked — VO lost or frames dropped")
    gt_xyz = tum_to_xyz(gt, [a for a, _ in matches])
    est_xyz = tum_to_xyz(est, [b for _, b in matches])
    # Monocular: scale is unobservable -> Sim3 alignment (align_se3.py).
    return evaluate_ate(gt_xyz, est_xyz, with_scale=True)


@pytest.mark.slow
def test_vo_only_ate(tmp_path):
    stats = _run_pipeline(str(tmp_path), mvsnet=False)
    print(f"VO-only ATE rmse {stats['rmse'] * 1000:.1f} mm "
          f"(scale {stats['scale']:.3f}, {stats['num_pairs']} pairs)")
    # Measured 2026-08-19: 10.26 mm. Threshold at ~3x.
    assert stats["rmse"] < 0.030, f"ATE rmse {stats['rmse']:.4f} m"


@pytest.mark.slow
def test_full_pipeline_ate_and_mesh(tmp_path):
    if not os.path.exists(os.path.join(EXPORTED, "model_variables.pkl")):
        pytest.skip("trained unit not built (scripts/make_trained_export.py)")
    stats = _run_pipeline(str(tmp_path), mvsnet=True)
    print(f"full-pipeline ATE rmse {stats['rmse'] * 1000:.1f} mm "
          f"(scale {stats['scale']:.3f}, {stats['num_pairs']} pairs)")
    # Measured 2026-08-19: 10.15 mm (better than VO-only — the rendered-depth
    # dense tracking injection does not degrade the trajectory). ~3x margin.
    assert stats["rmse"] < 0.030, f"ATE rmse {stats['rmse']:.4f} m"
    # The fused global model must be non-empty and geometrically sane.
    mesh_path = os.path.join(str(tmp_path), "mesh.obj")
    assert os.path.exists(mesh_path)
    verts = [ln for ln in open(mesh_path) if ln.startswith("v ")]
    faces = [ln for ln in open(mesh_path) if ln.startswith("f ")]
    assert len(verts) > 1000, f"mesh has only {len(verts)} vertices"
    assert len(faces) > 1000, f"mesh has only {len(faces)} faces"
    xyz = np.array([[float(x) for x in ln.split()[1:4]] for ln in verts])
    assert np.isfinite(xyz).all()
    assert xyz.std(axis=0).max() > 0.1, "mesh is degenerate (near a point)"


ADV_FIXTURE = os.path.join(REPO, "tests", "fixtures", "adv_traj", "scene0")


@pytest.mark.slow
def test_adversarial_sequence_recovers(tmp_path):
    """The adversarial 208-frame sequence (tests/fixtures/adv_traj):
    rotation-only opening (the initializer's rotation-only guard refuses
    to snap until parallax exists), 0.45-rad orbit pans away/back with a
    revisit, a 4x-motion jerk, a close occluder pass — imaged through a
    gamma-2.2 response, radial vignette and a +-0.18 exposure ramp,
    inverted through the PhotometricUndistorter (pcalib.txt +
    vignette.png, Undistort.h:40).

    Measured 2026-08-20 after the window-visibility point-retention fix
    (flagPointsForRemoval parity): 208/208 frames tracked, zero resets,
    cruise-segment Sim3 ATE 13.5 mm; the orbit segments carry monocular
    scale drift (segment scales 0.6-8.6), so the full-trajectory
    single-scale ATE is ~0.34 m — the gates below separate the
    robustness contract (continuous tracking through every stressor)
    from local accuracy (cruise segment) and leave the global number as
    a sanity bound.
    """
    from tandem_tpu.cli import tandem_dataset
    from tandem_tpu.eval.ate import (associate, evaluate_ate,
                                     load_tum_trajectory, tum_to_xyz)

    argv = [
        "preset=dataset",
        f"files={os.path.join(ADV_FIXTURE, 'images')}",
        f"calib={os.path.join(ADV_FIXTURE, 'camera_dso.txt')}",
        f"gamma={os.path.join(ADV_FIXTURE, 'pcalib.txt')}",
        f"vignette={os.path.join(ADV_FIXTURE, 'vignette.png')}",
        f"result_folder={tmp_path}",
    ]
    tandem_dataset.main(argv)

    gt = load_tum_trajectory(os.path.join(ADV_FIXTURE, "gt_tum.txt"))
    est = load_tum_trajectory(os.path.join(str(tmp_path), "result.txt"))
    matches = associate(gt, est)
    frames = sorted(round(b * 30) for _, b in matches)
    assert len(matches) >= 190, (
        f"only {len(matches)}/208 frames tracked — lost tracking")
    assert frames[-1] >= 205, f"tracking died at frame {frames[-1]}"
    gaps = max((b - a for a, b in zip(frames, frames[1:])), default=0)
    assert gaps <= 15, f"a {gaps}-frame hole in the trajectory (reset/loss)"
    jerk = [f for f in frames if 150 <= f <= 157]
    assert len(jerk) >= 6, f"jerk segment lost ({len(jerk)}/8) — retry ladder"

    def seg_ate(lo, hi):
        mm = [(a, b) for a, b in matches if lo <= round(a * 30) <= hi]
        gt_xyz = tum_to_xyz(gt, [a for a, _ in mm])
        est_xyz = tum_to_xyz(est, [b for _, b in mm])
        return evaluate_ate(gt_xyz, est_xyz, with_scale=True)

    cruise = seg_ate(12, 69)
    full = seg_ate(0, 207)
    print(f"adversarial: cruise ATE {cruise['rmse'] * 1000:.1f} mm, "
          f"full-trajectory {full['rmse'] * 1000:.1f} mm "
          f"(scale {full['scale']:.3f}, {len(matches)} frames)")
    # Measured 13.5 mm cruise / 335 mm full; margins ~4x / ~2x (run-to-run
    # variance from host-threaded float reordering is real — the r4
    # fixture's bound discipline applies).
    assert cruise["rmse"] < 0.060, f"cruise ATE {cruise['rmse']:.4f} m"
    assert full["rmse"] < 0.70, f"full-traj ATE {full['rmse']:.4f} m"
