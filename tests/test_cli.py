"""CLI end-to-end smoke tests (headless runtime, export+golden, ATE)."""

import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tests.test_coarse_tracker import render_plane, H, W, FX, FY, CX, CY
from tests.test_full_system import make_sequence


def _write_image_folder(tmp_path, n=10):
    img_dir = tmp_path / "images"
    os.makedirs(img_dir, exist_ok=True)
    poses, images = make_sequence(n=n, step=0.02)
    for i, img in enumerate(images):
        bgr = np.stack([img] * 3, -1).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i:06d}.png"), bgr)
    calib = tmp_path / "camera.txt"
    calib.write_text(f"Pinhole {FX} {FY} {CX} {CY} 0\n{W} {H}\n")
    return img_dir, calib


def test_tandem_dataset_cli(tmp_path):
    img_dir, calib = _write_image_folder(tmp_path)
    out = tmp_path / "out"
    from tandem_tpu.cli.tandem_dataset import main
    main([f"files={img_dir}", f"calib={calib}", f"result_folder={out}",
          "dr_timing=1"])
    assert (out / "result.txt").exists()
    assert (out / "poses_dso.txt").exists()
    assert (out / "dr_times.txt").exists()
    lines = open(out / "result.txt").readlines()
    assert len(lines) >= 8


@pytest.mark.slow
def test_tandem_export_and_golden(tmp_path):
    from tandem_tpu.cli import tandem_export as te
    from tandem_tpu.models.cva_mvsnet import CvaMVSNet
    from tandem_tpu.pipeline.mvsnet_runner import init_variables
    import pickle

    # Small synthetic export (no checkpoint: create random variables and
    # save them in the loader's format)
    model = CvaMVSNet(view_aggregation=True)
    variables = init_variables(model, 64, 96, 4)
    ckpt = tmp_path / "model_variables.pkl"
    import jax
    with open(ckpt, "wb") as f:
        pickle.dump(jax.device_get(variables), f)

    args = te.parser.parse_args([
        "--ckpt", str(ckpt), "--out-dir", str(tmp_path / "exported"),
        "--width", "96", "--height", "64", "--view-num", "4"])
    te.main(args)

    pack = tmp_path / "exported" / "sample_inputs.npz"
    assert pack.exists()
    # verify_golden passes on replay
    err = te.verify_golden(str(pack), variables, args)
    assert err < te.GOLDEN_TOL

    # Weightless deployment: the StableHLO unit alone serves the runner
    # protocol; result unpacking must match a direct module call on the
    # identically packed inputs.
    import jax.numpy as jnp

    shlo = tmp_path / "exported" / "model.stablehlo"
    assert shlo.exists()
    from tandem_tpu.pipeline.mvsnet_runner import StablehloRunner
    runner = StablehloRunner(str(shlo), 64, 96, view_num=4)
    rng = np.random.RandomState(7)
    bgrs = [rng.randint(0, 255, (64, 96, 3)).astype(np.uint8)
            for _ in range(4)]
    poses = []
    for v in range(4):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.05 * v
        poses.append(T)
    K = np.array([[57.6, 0, 47.5], [0, 57.6, 31.5], [0, 0, 1]], np.float32)
    runner.call_async(bgrs, poses, K, 0.5, 6.0, discard_percentage=10.0)
    res = runner.get_result()

    image, Ks, c2w = runner.pack_inputs(bgrs, poses, K)
    ref = runner._exp.call(
        jnp.asarray(image.astype(np.float32) / 255.0),
        jnp.asarray(Ks[0]), jnp.asarray(Ks[1]), jnp.asarray(Ks[2]),
        jnp.asarray(c2w), jnp.full((1,), 0.5, jnp.float32),
        jnp.full((1,), 6.0, jnp.float32),
        jnp.full((1,), 10.0, jnp.float32))
    np.testing.assert_allclose(res["depth"], np.asarray(ref[0][0]))
    np.testing.assert_allclose(res["depth_dense"], np.asarray(ref[2][0]))


def test_tandem_ate_cli(tmp_path, capsys):
    from tandem_tpu.cli import tandem_ate
    from tandem_tpu.pipeline.io import write_result_tum

    n = 20
    ts = [i * 0.1 for i in range(n)]
    poses = []
    for i in range(n):
        T = np.eye(4)
        T[:3, 3] = (0.1 * i, 0.05 * i, 0)
        poses.append(T)
    write_result_tum(str(tmp_path / "est.txt"), ts, poses)
    # gt = est scaled by 2 -> rmse ~0 with --scale
    poses_gt = [p.copy() for p in poses]
    for p in poses_gt:
        p[:3, 3] *= 2
    write_result_tum(str(tmp_path / "gt.txt"), ts, poses_gt)

    tandem_ate.main(tandem_ate.parser.parse_args(
        ["--est", str(tmp_path / "est.txt"), "--gt", str(tmp_path / "gt.txt"),
         "--scale"]))
    out = capsys.readouterr().out
    rmse = float([ln for ln in out.splitlines()
                  if "rmse" in ln][0].split()[1])
    assert rmse < 1e-6
    scale = float([ln for ln in out.splitlines()
                   if "alignment_scale" in ln][0].split()[1])
    assert abs(scale - 2.0) < 1e-6


def test_tandem_demo_record_replay(tmp_path):
    """Demo CLI in replay mode with the session recorder: the captured
    folder must itself be dataset-compatible (calib + times + images)."""
    img_dir, calib = _write_image_folder(tmp_path, n=10)
    rec = tmp_path / "session"
    out = tmp_path / "demo_out"
    from tandem_tpu.cli.tandem_demo import main
    main([f"replay={img_dir}", f"calib={calib}", "demo_secs=300",
          f"record={rec}", f"result_folder={out}"])
    assert (out / "result.txt").exists()
    assert (rec / "camera.txt").exists()
    times = (rec / "times.txt").read_text().strip().splitlines()
    imgs = sorted(os.listdir(rec / "images"))
    assert len(times) == len(imgs) == 10
    first = (rec / "camera.txt").read_text().splitlines()[0].split()
    assert first[0] == "Pinhole" and float(first[1]) == FX


def test_tandem_dataset_cli_reverse(tmp_path):
    """reverse=1 plays the sequence backwards (commandline.cpp)."""
    img_dir, calib = _write_image_folder(tmp_path, n=10)
    out = tmp_path / "out_rev"
    from tandem_tpu.cli.tandem_dataset import main
    main([f"files={img_dir}", f"calib={calib}", f"result_folder={out}",
          "reverse=1"])
    lines = open(out / "result.txt").readlines()
    assert len(lines) >= 8
    ts = [float(l.split()[0]) for l in lines]
    assert ts == sorted(ts, reverse=True)


def test_playback_gate():
    """Timed-playback catch-up semantics (main_tandem_pangolin.cpp:216-228):
    sleep when ahead, skip when >0.5(+0.1 parity jitter) s behind."""
    from tandem_tpu.cli.tandem_dataset import playback_gate

    act, amt = playback_gate(target=1.0, since_start=0.4, frame_parity=0)
    assert act == "sleep" and abs(amt - 0.6) < 1e-9
    assert playback_gate(1.0, 1.3, 0)[0] == "ok"      # late but < 0.5
    assert playback_gate(1.0, 1.55, 0)[0] == "skip"   # > 0.5 (even frame)
    assert playback_gate(1.0, 1.55, 1)[0] == "ok"     # < 0.6 (odd frame)
    assert playback_gate(1.0, 1.65, 1)[0] == "skip"
