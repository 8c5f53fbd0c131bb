"""Live-camera demo CLI — the tandem_demo (realsense) equivalent.

Runs the full TANDEM pipeline on a live camera (OpenCV UVC) or a replayed
image folder for ``demo_secs`` seconds (main_tandem_realsense.cpp:162-190
loop semantics), then writes results + mesh.

Usage:
  python -m tandem_tpu.cli.tandem_demo camera=0 demo_secs=30 \
      [calib=camera.txt] [mvsnet_folder=DIR] [result_folder=OUT]
  python -m tandem_tpu.cli.tandem_demo replay=IMG_DIR calib=camera.txt ...
  python -m tandem_tpu.cli.tandem_demo camera=0 record=SESSION_DIR ...

``record=DIR`` additionally captures the session as a dataset-compatible
folder (images/ + times.txt + camera.txt from the camera intrinsics — the
realsense recorder's calib-export role, realsense.h:37), so recorded runs
replay bit-exactly through tandem_dataset / tandem_demo replay=.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    from ..settings import parse_arguments, preset
    s = parse_arguments(argv, base=preset("demo"))
    s.result_folder = (s.result_folder if s.result_folder != "results"
                       else "demo_results")

    import cv2

    from ..pipeline.camera import OpenCVCamera, ReplayCamera
    from ..pipeline.full_system import FullSystem
    from .tandem_dataset import read_calib

    if s.replay:
        assert s.calib, "replay needs calib="
        fx, fy, cx, cy, W, H = read_calib(s.calib)
        cam = ReplayCamera(s.replay, (fx, fy, cx, cy))
    else:
        cam = OpenCVCamera(int(s.camera or 0))
    fx, fy, cx, cy, W, H = cam.intrinsics()

    backend = None
    if s.mvsnet_folder:
        import pickle
        import jax.numpy as jnp
        from ..mapping.tsdf import TsdfConfig
        from ..models.cva_mvsnet import CvaMVSNet
        from ..pipeline.backend import TandemBackend
        from ..pipeline.mvsnet_runner import MvsnetRunner
        with open(os.path.join(s.mvsnet_folder,
                               "model_variables.pkl"), "rb") as f:
            variables = pickle.load(f)
        from .tandem_export import load_model_config
        model = CvaMVSNet(**load_model_config(s.mvsnet_folder),
                          dtype=jnp.bfloat16)
        runner = MvsnetRunner(model, variables, H, W,
                              view_num=s.dr_mvsnet_view_num,
                              staged=s.mvsnet_staged)
        K_mat = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        backend = TandemBackend(runner, TsdfConfig(), K_mat, H, W)

    # Session recorder (realsense calib/stream capture parity): dataset-
    # compatible output so recorded sessions replay through tandem_dataset.
    # PNG encode runs on a writer thread — a synchronous imwrite would put
    # 10-30 ms of compression on the live tracking loop.
    rec_times = None
    rec_queue = None
    if s.record:
        import queue
        import threading
        os.makedirs(os.path.join(s.record, "images"), exist_ok=True)
        cam.write_calib(os.path.join(s.record, "camera.txt"))
        rec_times = []
        rec_queue = queue.Queue(maxsize=64)

        def _writer():
            while True:
                item = rec_queue.get()
                if item is None:
                    return
                idx, frame = item
                cv2.imwrite(os.path.join(s.record, "images",
                                         f"{idx:06d}.png"), frame)
        rec_thread = threading.Thread(target=_writer, daemon=True)
        rec_thread.start()

    fs = FullSystem(fx, fy, cx, cy, H, W, backend=backend)
    t0 = time.time()
    n = 0
    for bgr, ts in cam.frames():
        if time.time() - t0 > s.demo_secs:
            break
        if rec_times is not None:
            rec_queue.put((n, bgr.copy()))
            rec_times.append((n, ts))
        gray = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY).astype(np.float32)
        fs.add_active_frame(gray, n, ts, bgr=bgr)
        n += 1
        if fs.is_lost:
            print("tracking lost")
            break

    if rec_times is not None:
        rec_queue.put(None)
        rec_thread.join()
        with open(os.path.join(s.record, "times.txt"), "w") as f:
            for i, ts in rec_times:
                f.write(f"{i:06d} {ts:.6f} 1.0\n")

    os.makedirs(s.result_folder, exist_ok=True)
    fs.write_results(s.result_folder)
    if backend is not None:
        from ..mapping.mesh import save_obj
        verts, faces, cols = backend.extract_mesh_now()
        save_obj(os.path.join(s.result_folder, "mesh.obj"),
                 verts, faces, cols)
    print(f"demo: {n} frames in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
