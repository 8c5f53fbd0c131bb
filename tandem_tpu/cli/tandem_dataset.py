"""Runtime CLI — the reference tandem_dataset equivalent (headless).

Runs the full TANDEM pipeline over an image folder: per-frame dense coarse
tracking, keyframe windowed BA, CVA-MVSNet depth, TSDF fusion with raycast
feedback, and mesh output. Writes result.txt / poses_dso.txt /
keyframes_dso.txt / dso_optimization_windows.txt / mesh.obj / dr_times.txt
(main_tandem_pangolin.cpp output contract; the Pangolin GUI is replaced by
file outputs).

Usage:
  python -m tandem_tpu.cli.tandem_dataset preset=dataset \
      files=IMG_DIR calib=CAMERA.txt result_folder=OUT \
      [mvsnet_folder=EXPORTED_DIR] [end=N]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def parse_args(argv):
    """Strict key=value argument chain (commandline.cpp:149-410): routed
    through settings.parse_arguments so unknown keys raise KeyError."""
    from ..settings import parse_arguments, preset
    return parse_arguments(argv, base=preset("dataset"))


def read_calib(path):
    """DSO camera.txt. For a plain pinhole file returns its intrinsics; for
    a distortion-model calib (FOV/RadTan/Equidistant/KB + rectification),
    returns the RECTIFIED pinhole intrinsics and output size — per-frame
    undistortion then happens in the reader (Undistort semantics)."""
    lines = [ln.strip() for ln in open(path)
             if ln.strip() and not ln.startswith("#")]
    parts = lines[0].split()
    model = parts[0].lower()
    simple_pinhole = (model == "pinhole"
                      and (len(lines) < 3 or lines[2].split()[0] == "none"))
    if simple_pinhole:
        fx, fy, cx, cy = [float(x) for x in parts[1:5]]
        w, h = [int(x) for x in lines[1].split()[:2]]
        return fx, fy, cx, cy, w, h
    from ..data.undistort import Undistort
    und = Undistort.from_file(path)
    return (float(und.K[0, 0]), float(und.K[1, 1]), float(und.K[0, 2]),
            float(und.K[1, 2]), und.w, und.h)


def playback_gate(target: float, since_start: float, frame_parity: int):
    """Timed-playback decision (main_tandem_pangolin.cpp:216-228):
    returns ('sleep', seconds) when ahead of schedule, ('skip', lateness)
    when more than 0.5 + 0.1*(parity) s behind, else ('ok', 0.0). The
    parity jitter staggers skips so consecutive frames don't all drop on
    the same threshold."""
    if since_start < target:
        return "sleep", target - since_start
    late = since_start - target
    if late > 0.5 + 0.1 * (frame_parity % 2):
        return "skip", late
    return "ok", 0.0


def main(argv=None):
    s = parse_args(argv if argv is not None else sys.argv[1:])
    assert s.files, "files=IMG_DIR required"
    assert s.calib, "calib=CAMERA.txt required"

    import cv2
    import jax.numpy as jnp

    from ..mapping.mesh import save_obj
    from ..mapping.tsdf import TsdfConfig
    from ..pipeline.backend import TandemBackend
    from ..pipeline.full_system import (FullSystem, FullSystemOptions,
                                        make_full_system_options)
    from ..pipeline.mvsnet_runner import MvsnetRunner
    from ..models.cva_mvsnet import CvaMVSNet
    from ..utils.timer import Timer

    fx, fy, cx, cy, W, H = read_calib(s.calib)
    K_mat = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    timer = Timer(enabled=bool(s.dr_timing))

    backend = None
    if s.mvsnet_folder:
        import pickle
        pkl = os.path.join(s.mvsnet_folder, "model_variables.pkl")
        pack = os.path.join(s.mvsnet_folder, "sample_inputs.npz")
        if os.path.exists(pkl):
            with open(pkl, "rb") as f:
                variables = pickle.load(f)
            from .tandem_export import load_model_config
            model = CvaMVSNet(**load_model_config(s.mvsnet_folder),
                              dtype=jnp.bfloat16)
            runner = MvsnetRunner(model, variables, H, W,
                                  view_num=s.dr_mvsnet_view_num,
                                  staged=s.mvsnet_staged)
            # Boot-time golden self-check (FullSystem initDr, dr_mvsnet_test)
            if os.path.exists(pack):
                from .tandem_export import verify_golden, GOLDEN_TOL
                err = verify_golden(pack, variables)
                print(f"MVSNet golden self-check: {err:.2e}")
                # bf16 runtime vs f32 golden: widen tolerance accordingly
                assert err < 10 * GOLDEN_TOL
        else:
            # Weightless deployment: serve the self-contained StableHLO
            # unit directly (the reference deploys with only model.pt,
            # main_tandem_pangolin.cpp; same contract here).
            from ..pipeline.mvsnet_runner import StablehloRunner
            runner = StablehloRunner(
                os.path.join(s.mvsnet_folder, "model.stablehlo"), H, W,
                view_num=s.dr_mvsnet_view_num)
            if os.path.exists(pack):
                from .tandem_export import GOLDEN_TOL, verify_stablehlo
                err = verify_stablehlo(s.mvsnet_folder)
                print(f"MVSNet golden self-check (stablehlo): {err:.2e}")
                assert err < GOLDEN_TOL
        cfg = TsdfConfig()
        backend = TandemBackend(runner, cfg, K_mat, H, W,
                                mesh_extraction_freq=s.mesh_extraction_freq,
                                timer=timer)
        if s.save_dr_video:
            from ..pipeline.output_wrapper import PanelOutputWrapper
            backend.output_wrappers.append(PanelOutputWrapper(
                os.path.join(s.result_folder, "dr_video")))

    outputs = []
    viewer = None
    if s.viewer3d:
        # PangolinDSOViewer substitute: interactive when DISPLAY allows,
        # PNG recordings under result_folder otherwise (pipeline/viewer.py).
        from ..pipeline.viewer import Viewer3DWrapper
        viewer = Viewer3DWrapper(
            K=(fx, fy, cx, cy),
            out_dir=(None if os.environ.get("DISPLAY")
                     else os.path.join(s.result_folder, "view3d")))
        outputs.append(viewer)
        if backend is not None:
            backend.output_wrappers.append(viewer)

    opts = make_full_system_options(s)
    fs = FullSystem(fx, fy, cx, cy, H, W, options=opts, backend=backend,
                    timer=timer, outputs=outputs)

    # ImageFolderReader handles undistortion (geometric + photometric) and
    # times.txt timestamps (DatasetReader semantics).
    from ..data.reader import ImageFolderReader
    needs_undistort = False
    with open(s.calib) as f:
        clines = [ln.strip() for ln in f if ln.strip()]
    if len(clines) >= 3 and clines[2].split()[0] != "none":
        needs_undistort = True
    if clines[0].split()[0].lower() not in ("pinhole",):
        needs_undistort = True
    reader = ImageFolderReader(
        s.files, calib=s.calib if needs_undistort else None,
        gamma=s.gamma or None, vignette=s.vignette or None,
        preload=s.preload)

    end = min(s.end, len(reader)) if s.end >= 0 else len(reader)
    indices = list(range(s.start, end))
    if s.reverse:
        # Play the sequence backwards (commandline.cpp reverse=1).
        indices.reverse()

    # Timed playback (main_tandem_pangolin.cpp:216-228): with speed=S the
    # frame at dataset timestamp t plays at wall time (t - t0)/S; the loop
    # sleeps when ahead and SKIPS the frame when it has fallen more than
    # ~0.5 s behind (catch-up under load). speed=0 -> linearize mode, every
    # frame processed.
    times_to_play = None
    if s.playback_speed > 0:
        stamps = [reader.get_timestamp(ii) for ii in indices]
        times_to_play = [(t - stamps[0]) / s.playback_speed for t in stamps]

    t_start = time.time()
    init_offset = 0.0
    n_skipped = 0
    for ii, i in enumerate(indices):
        if times_to_play is not None and not fs.initialized:
            # Initialization time does not count against playback (DSO
            # main: reset the clock until the initializer snaps).
            t_start = time.time()
            init_offset = times_to_play[ii]
        gray, ts, _ = reader.get_image(i)
        bgr = reader.get_image_bgr(i)
        if times_to_play is not None:
            since_start = init_offset + (time.time() - t_start)
            target = times_to_play[ii]
            action, amount = playback_gate(target, since_start, ii)
            if action == "sleep":
                time.sleep(amount)
            elif action == "skip":
                print(f"SKIPFRAME {ii} (play at {target:.3f}, now it is "
                      f"{since_start:.3f})!")
                n_skipped += 1
                continue
        fs.add_active_frame(gray, i, ts, bgr=bgr)
        # Auto-reset within the first 250 frames on init failure / early loss
        # (main_tandem_pangolin.cpp:237-255).
        if (fs.init_failed or fs.is_lost) and i < 250:
            print(f"RESETTING at frame {i} (init_failed={fs.init_failed})")
            fs = FullSystem(fx, fy, cx, cy, H, W, options=opts,
                            backend=backend, timer=timer)
            continue
        if fs.is_lost:
            print(f"LOST at frame {i}")
            break
    elapsed = time.time() - t_start

    out = s.result_folder
    os.makedirs(out, exist_ok=True)
    fs.write_results(out)
    if backend is not None:
        verts, faces, cols = backend.extract_mesh_now()
        save_obj(os.path.join(out, "mesh.obj"), verts, faces, cols)
    if s.dr_timing:
        timer.write_to_file(os.path.join(out, "dr_times.txt"))
    if viewer is not None:
        # Final scene snapshot + window teardown (viewer->join, main:267).
        viewer.snapshot(os.path.join(out, "view3d_final.png"))
        viewer.join()

    n = len(fs.all_poses)
    # End-of-run FPS block (main_tandem_pangolin.cpp:276-283)
    print("=" * 30 + " TANDEM TIMING " + "=" * 30)
    print(f"Frames: {n}; Time: {elapsed:.2f} s; "
          f"FPS: {n / max(elapsed, 1e-9):.2f}")


if __name__ == "__main__":
    main()
