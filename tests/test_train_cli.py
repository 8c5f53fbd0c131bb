"""Training CLI end-to-end smoke test on a synthetic Replica root."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tests.test_data import write_scene


@pytest.mark.slow
def test_train_cli_one_epoch(tmp_path):
    root = tmp_path / "replica"
    os.makedirs(root, exist_ok=True)
    write_scene(str(root / "office0"), n_frames=10, H=64, W=64)
    (root / "train.txt").write_text("office0\n")

    out_dir = tmp_path / "run"
    from tandem_tpu.cli import tandem_train

    args = tandem_train.parser.parse_args([
        str(out_dir),
        "DATA.ROOT_DIR", str(root),
        "DATA.IMG_HEIGHT", "64",
        "DATA.IMG_WIDTH", "64",
        "MODEL.DEPTH_NUM", "(8, 8, 4)",
        "TRAIN.EPOCHS", "1",
        "TRAIN.BATCH_SIZE", "1",
        "TRAIN.DEVICE", "cpu",
        "IO.LOG_INTERVAL", "1",
        "AUG.ANY", "True",
    ])
    tandem_train.main(args)

    ckpts = os.listdir(out_dir / "ckpt")
    assert len(ckpts) == 1 and ckpts[0].startswith("step_")
    assert (out_dir / "tb").exists()

    # Resume from the checkpoint as --pretrained (warm start path)
    out2 = tmp_path / "run2"
    args2 = tandem_train.parser.parse_args([
        str(out2),
        "--pretrained", str(out_dir / "ckpt" / ckpts[0]),
        "DATA.ROOT_DIR", str(root),
        "DATA.IMG_HEIGHT", "64",
        "DATA.IMG_WIDTH", "64",
        "MODEL.DEPTH_NUM", "(8, 8, 4)",
        "TRAIN.EPOCHS", "1",
        "TRAIN.BATCH_SIZE", "1",
        "TRAIN.DEVICE", "cpu",
    ])
    tandem_train.main(args2)
    assert len(os.listdir(out2 / "ckpt")) == 1


def test_train_cli_mesh_mode(tmp_path):
    """Data-parallel training over the 8-device virtual mesh."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")

    root = tmp_path / "replica"
    os.makedirs(root, exist_ok=True)
    # batch = BATCH_SIZE * world(8) = 8 tuples needed per step
    write_scene(str(root / "office0"), n_frames=16, H=64, W=64)
    (root / "train.txt").write_text("office0\n")

    out_dir = tmp_path / "run_mesh"
    from tandem_tpu.cli import tandem_train
    args = tandem_train.parser.parse_args([
        str(out_dir),
        "DATA.ROOT_DIR", str(root),
        "DATA.IMG_HEIGHT", "64",
        "DATA.IMG_WIDTH", "64",
        "MODEL.DEPTH_NUM", "(8, 8, 4)",
        "TRAIN.EPOCHS", "1",
        "TRAIN.BATCH_SIZE", "1",
        "TRAIN.DEVICE", "mesh",
        "IO.LOG_INTERVAL", "1",
    ])
    tandem_train.main(args)
    assert len(os.listdir(out_dir / "ckpt")) == 1
