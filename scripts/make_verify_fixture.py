"""Regenerate the /tmp/verify_run drive fixture (verify-skill step 1-2).

Renders the textured plane from tests/test_coarse_tracker.py into a
40-frame 96x128 PNG sequence with a DSO camera.txt, TUM ground truth, and
a random-weight MVSNet export unit at the deployed (48, 4, 4) depth
hypothesis counts — everything `python -m tandem_tpu.cli.tandem_dataset`
needs for an end-to-end pipeline drive (the synthetic plane is degenerate
for monocular BA over long windows; this is a plumbing check, not a
quality gate — quality gates live in tests/test_vo_ate.py).

Run: TANDEM_PLATFORM=cpu python scripts/make_verify_fixture.py [outdir]
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_run"
    from test_coarse_tracker import CX, CY, FX, FY, H, W, render_plane

    img_dir = os.path.join(out, "imgs40")
    os.makedirs(img_dir, exist_ok=True)

    from PIL import Image

    from tandem_tpu.pipeline.io import write_result_tum

    poses = []
    for i in range(40):
        c2w = np.eye(4)
        # Slow lateral + forward dolly with mild yaw: enough parallax for
        # KF creation, plane stays in view.
        t = i / 39.0
        c2w[0, 3] = 0.8 * t
        c2w[1, 3] = 0.22 * np.sin(2 * np.pi * t)
        c2w[2, 3] = 0.45 * t
        yaw = 0.12 * np.sin(2 * np.pi * t)
        c2w[:3, :3] = np.array(
            [[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
             [-np.sin(yaw), 0, np.cos(yaw)]])
        img, _ = render_plane(c2w)
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"{i:05d}.png"))
        poses.append(c2w)

    with open(os.path.join(out, "camera40.txt"), "w") as f:
        f.write(f"Pinhole {FX} {FY} {CX} {CY} 0\n{W} {H}\n")
    write_result_tum(os.path.join(out, "gt40.txt"),
                     [float(i) for i in range(40)], poses)

    # Random-weight MVSNet unit at the deployed abl04 architecture.
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tandem_tpu.models.cva_mvsnet import CvaMVSNet
    from tandem_tpu.pipeline.mvsnet_runner import init_variables

    model = CvaMVSNet(depth_num=(48, 4, 4), view_aggregation=True)
    variables = init_variables(model, H, W, 7)
    vars_pkl = os.path.join(out, "vars.pkl")
    with open(vars_pkl, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, variables), f)

    from tandem_tpu.cli.tandem_export import main as export_main, parser

    export_main(parser.parse_args(
        ["--ckpt", vars_pkl, "--out-dir", os.path.join(out, "exported"),
         "--width", str(W), "--height", str(H), "--view-num", "7",
         "--depth-num", "48,4,4"]))
    print(f"verify fixture ready under {out}")


if __name__ == "__main__":
    main()
