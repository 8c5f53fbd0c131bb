"""setting_logStuff / debugSaveDepthImages observability parity.

Reference surface: logs/*.txt written by printLogLine/printEigenValLine/
trackNewCoarse/printFrameLifetimes (FullSystem.cpp:78-121,635-643,
1664-1812) and the per-frame u16 depth dumps (CoarseTracker.cpp:1073-1215).
"""

import os

import numpy as np

from tandem_tpu.pipeline.full_system import FullSystem, FullSystemOptions
from tests.test_coarse_tracker import FX, FY, CX, CY, H, W
from tests.test_full_system import make_sequence


def _drive(tmp_path):
    poses_gt, images = make_sequence(n=16)
    opts = FullSystemOptions(
        selection_threshold_factor=0.35, kf_global_weight=6.0, ba_iters=4,
        init_max_width=0.4, log_stuff=True,
        log_dir=str(tmp_path / "logs"),
        debug_save_depth_images=True,
        depth_save_folder=str(tmp_path / "depths"))
    fs = FullSystem(FX, FY, CX, CY, H, W, options=opts)
    for i, img in enumerate(images):
        fs.add_active_frame(img, i, float(i) * 0.1)
        assert not fs.is_lost
    fs.write_results(str(tmp_path / "out"))
    return fs


def test_log_stuff_files(tmp_path):
    fs = _drive(tmp_path)
    d = tmp_path / "logs"
    n_kf = len(fs.keyframes)
    assert n_kf >= 2

    # numsLog: one line per keyframe (after init), 17 columns like
    # FullSystem.cpp:1684-1703
    nums = (d / "numsLog.txt").read_text().strip().splitlines()
    assert len(nums) == n_kf - 1  # the init KF pair logs once
    cols = nums[-1].split()
    assert len(cols) == 17
    assert int(cols[16]) >= 2          # window size
    assert int(cols[2]) > 0            # created points accumulate

    # eigen logs: id + nz values, eigenvalues ascending, H PSD-ish
    nz = max(100, fs.opt.max_keyframes * 10)
    for name in ("eigenAllLog.txt", "eigenPLog.txt", "eigenALog.txt",
                 "diagonal.txt", "variancesLog.txt"):
        lines = (d / name).read_text().strip().splitlines()
        assert len(lines) == n_kf - 1, name
        vals = np.array([float(v) for v in lines[-1].split()[1:]])
        assert len(vals) == nz, name
    eig = np.array([float(v)
                    for v in (d / "eigenAllLog.txt").read_text().strip()
                    .splitlines()[-1].split()[1:]])
    live = eig[eig != 0.0]
    assert np.all(np.diff(live) >= -1e-6 * np.abs(live[:-1]))  # sorted

    # nullspacesLog: id + 2 values per nullspace (9 nullspaces)
    ns_line = (d / "nullspacesLog.txt").read_text().strip() \
        .splitlines()[-1].split()
    assert len(ns_line) == 1 + 2 * 9
    # Gauge directions carry near-zero energy relative to the spectrum
    # (photometric residuals are invariant to global SE3 x scale; the
    # idepth prior and FD nullspace basis leave numerical residue).
    forms = np.abs(np.array([float(v) for v in ns_line[1::2]]))
    assert np.all(np.isfinite(forms))
    assert np.all(forms <= 1e-2 * np.abs(live).max() + 10.0)

    # coarseTrackingLog: one line per post-init tracked frame; 13 fields
    # (id ts exposure xi[6] a b res tries, FullSystem.cpp:635-643)
    ct = (d / "coarseTrackingLog.txt").read_text().strip().splitlines()
    assert len(ct) >= 3
    assert len(ct[-1].split()) == 13

    # lifetimeLog written at write_results: one line per recorded frame
    lt = (d / "lifetimeLog.txt").read_text().strip().splitlines()
    assert len(lt) == len(fs.all_poses)
    assert all(len(l.split()) == 5 for l in lt)


def test_depth_dumps(tmp_path):
    import cv2

    fs = _drive(tmp_path)
    folder = tmp_path / "depths"
    pngs = sorted(p for p in os.listdir(folder) if p.endswith(".png"))
    # every post-init frame (KF or not) dumps a depth map
    assert len(pngs) >= len(fs.keyframes) - 1
    img = cv2.imread(str(folder / pngs[-1]), cv2.IMREAD_UNCHANGED)
    assert img.dtype == np.uint16 and img.shape == (H, W)
    scale = float((folder / pngs[-1].replace(".png", "_scale.txt"))
                  .read_text())
    depth = img.astype(np.float64) * scale
    pos = depth[img > 0]
    assert len(pos) > 0
    # u16 max bin must decode back to the max depth (the scale contract)
    assert abs(pos.max() - 65535 * scale) < 2 * scale
