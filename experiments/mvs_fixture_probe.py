"""Isolate MVS depth quality on the trajectory fixture at 256x192.

Feeds a 7-view GT-pose window from replica_traj to the trained abl04
(48,4,4) runner at the fixture resolution and reports abs_rel vs GT depth
— separates "the model degrades at this resolution/content" from "the
pipeline feeds it garbage" when debugging the dense-feedback ATE.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
FIXTURE = os.path.join(REPO, "tests", "fixtures", "replica_traj", "scene0")
DEPTH_SCALE = 2.0e-4


def main():
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import pickle

    from tandem_tpu.cli.tandem_export import load_model_config
    from tandem_tpu.models.cva_mvsnet import CvaMVSNet
    from tandem_tpu.pipeline.mvsnet_runner import MvsnetRunner

    H, W = 192, 256
    fx = fy = 200.0
    cx, cy = 127.5, 95.5
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)

    exported = os.path.join(REPO, "exported", "tandem")
    with open(os.path.join(exported, "model_variables.pkl"), "rb") as f:
        variables = pickle.load(f)
    model = CvaMVSNet(**load_model_config(exported), dtype=jnp.bfloat16)
    runner = MvsnetRunner(model, variables, H, W, view_num=7, staged="mono")

    poses = {}
    for ln in open(os.path.join(FIXTURE, "poses_gt.txt")):
        v = ln.split()
        poses[int(v[0])] = np.array([float(x) for x in v[1:]],
                                    np.float32).reshape(4, 4)

    for tup in ([24, 25, 26, 27, 28, 29, 30], [0, 5, 10, 15, 20, 25, 30],
                [30, 32, 34, 36, 38, 40, 42]):
        # ref = view_num - 2 position in reference tuples; here pass ref
        # explicitly as the middle-ish frame, reordered ref-first like
        # deliverDrFrame does.
        ref = tup[-2]
        order = [ref] + [i for i in tup if i != ref]
        bgrs = [cv2.imread(os.path.join(FIXTURE, "images", f"{i:06d}.png"))
                for i in order]
        c2ws = [poses[i] for i in order]
        gt = cv2.imread(os.path.join(FIXTURE, "depths", f"{ref:06d}.png"),
                        cv2.IMREAD_UNCHANGED).astype(np.float32) * DEPTH_SCALE

        dmin, dmax = 0.01, float(np.percentile(gt, 80) * 3)
        runner.call_async(bgrs, c2ws, K, depth_min=dmin, depth_max=dmax,
                          discard_percentage=10.0, ref_index=0)
        res = runner.get_result()
        depth = np.asarray(res["depth"], np.float32)
        mask = (gt > 0.05) & (depth > 0)
        abs_rel = float(np.mean(np.abs(depth[mask] - gt[mask]) / gt[mask]))
        med_ratio = float(np.median(depth[mask] / gt[mask]))
        print(f"tuple ref={ref}: abs_rel {abs_rel:.4f}  med(pred/gt) "
              f"{med_ratio:.4f}  dmax {dmax:.2f}  "
              f"depth range [{depth[mask].min():.2f},{depth[mask].max():.2f}]"
              f"  gt range [{gt.min():.2f},{gt.max():.2f}]")


if __name__ == "__main__":
    main()
