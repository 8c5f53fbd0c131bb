"""ATE probe: drive the REAL tandem_dataset CLI over the replica_traj
fixture and report Sim3-aligned ATE vs GT (the EuRoC stand-in;
tracking_euroc_eval.bash -> align_se3.py + evaluate_ate.py:48-60).

Usage:
  JAX_PLATFORMS=cpu python experiments/vo_ate_probe.py [--mvsnet] [--end N]

--mvsnet adds mvsnet_folder=exported/tandem (trained (48,4,4) weights) so the
full feedback loop (MVS depth -> TSDF -> rendered-depth dense tracking) runs.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
FIXTURE = os.path.join(REPO, "tests", "fixtures", "replica_traj", "scene0")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mvsnet", action="store_true")
    ap.add_argument("--end", type=int, default=-1)
    ap.add_argument("--out", default="/tmp/vo_ate_probe")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("TANDEM_TEST_JIT_CACHE",
                                     "/tmp/tandem_tpu_jit_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from tandem_tpu.cli import tandem_dataset

    argv = [
        "preset=dataset",
        f"files={os.path.join(FIXTURE, 'images')}",
        f"calib={os.path.join(FIXTURE, 'camera_dso.txt')}",
        f"result_folder={args.out}",
        f"end={args.end}",
        "dr_timing=1",
    ]
    if args.mvsnet:
        argv.append(f"mvsnet_folder={os.path.join(REPO, 'exported', 'tandem')}")
    print("ARGS:", argv)
    t0 = time.time()
    tandem_dataset.main(argv)
    print(f"run wall: {time.time() - t0:.1f} s")

    from tandem_tpu.eval.ate import (associate, evaluate_ate,
                                     load_tum_trajectory, tum_to_xyz)
    gt = load_tum_trajectory(os.path.join(FIXTURE, "gt_tum.txt"))
    est = load_tum_trajectory(os.path.join(args.out, "result.txt"))
    matches = associate(gt, est)
    print(f"associated {len(matches)} / {len(gt)} gt frames "
          f"({len(est)} estimated)")
    gt_xyz = tum_to_xyz(gt, [a for a, _ in matches])
    est_xyz = tum_to_xyz(est, [b for _, b in matches])
    stats = evaluate_ate(gt_xyz, est_xyz, with_scale=True)
    print("ATE (Sim3-aligned):",
          {k: (round(v * 1000, 2) if k not in ("scale", "num_pairs") else v)
           for k, v in stats.items()}, "(mm except scale)")


if __name__ == "__main__":
    main()
