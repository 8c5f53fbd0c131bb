"""Tests: settings/presets, reader, distance map, warp3d, train utils."""

import os

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from tandem_tpu.settings import Settings, parse_arguments, preset
from tandem_tpu.tracking.distance_map import distance_map, select_spread
from tandem_tpu.train.utils import (DictAverageMeter, epoch_end_mean,
                                    epoch_end_mean_named, sam_perturb,
                                    warmup_multi_step_lr, StreamingBinCount)


def test_settings_presets_and_args():
    s = parse_arguments(["preset=runtime", "mvsnet_folder=/tmp/m",
                         "tracking=dense:tpu", "mesh_extraction_freq=5"])
    assert s.preload is True
    assert s.mvsnet_flag is True
    assert s.tracking_type == "dense" and s.tracking_device == "tpu"
    assert s.mesh_extraction_freq == 5
    with pytest.raises(KeyError):
        parse_arguments(["bogus_key=1"])
    assert preset("dataset").preload is False


def test_distance_map():
    occ = np.zeros((16, 16), bool)
    occ[4, 4] = True
    occ[12, 12] = True
    d = np.asarray(distance_map(jnp.asarray(occ), max_dist=30))
    assert d[4, 4] == 0
    assert d[4, 7] == 3          # L1 distance
    assert d[8, 8] == 8
    cand = np.zeros((16, 16), bool)
    cand[0, 0] = True
    cand[5, 4] = True
    sel = select_spread(cand, occ, want=1)
    assert tuple(sel[0]) == (0, 0)  # far corner wins over neighbour


def test_warp3d_identity_roundtrip(rng):
    from tandem_tpu.ops.warp3d import depth_reprojection_warp
    B, H, W = 1, 16, 24
    depth = jnp.asarray(rng.rand(B, H, W).astype(np.float32) + 2)
    K = jnp.asarray(np.array([[[30.0, 0, (W - 1) / 2],
                               [0, 30.0, (H - 1) / 2], [0, 0, 1]]], np.float32))
    I = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    pix, d, mask = depth_reprojection_warp(
        depth, depth, src_K=K, src_cam_to_world=I, ref_K=K, ref_cam_to_world=I)
    # identical cameras: pixel maps to itself, depth equals input
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    m = np.asarray(mask[0]) > 0.5
    np.testing.assert_allclose(np.asarray(pix[0])[m][:, 0], gx[m], atol=1e-3)
    np.testing.assert_allclose(np.asarray(d[0])[m], np.asarray(depth[0])[m],
                               rtol=1e-4)


def test_warp3d_matches_torch_reference(rng):
    """Against the reference homo_warping_3d on a non-trivial pose."""
    if not os.path.isdir("/root/reference/cva_mvsnet"):
        pytest.skip("reference unavailable")
    from tests.torch_ref import import_reference_models
    module, _ = import_reference_models()
    from tandem_tpu.ops.warp3d import depth_reprojection_warp

    B, H, W = 1, 32, 48
    src_depth = (rng.rand(B, H, W) * 2 + 2).astype(np.float32)
    ref_depth = (rng.rand(B, H, W) * 2 + 2).astype(np.float32)
    K = np.array([[[40.0, 0, (W - 1) / 2], [0, 40.0, (H - 1) / 2],
                   [0, 0, 1]]], np.float32)
    c2w_ref = np.eye(4, dtype=np.float32)[None]
    c2w_src = np.eye(4, dtype=np.float32)[None].copy()
    c2w_src[0, 0, 3] = 0.1
    c2w_src[0, 1, 3] = -0.05

    with torch.no_grad():
        t_pix, t_d, t_m = module.homo_warping_3d(
            torch.from_numpy(src_depth), torch.from_numpy(ref_depth),
            src_intrinsics=torch.from_numpy(K),
            src_cam_to_world=torch.from_numpy(c2w_src),
            ref_intrinsics=torch.from_numpy(K),
            ref_cam_to_world=torch.from_numpy(c2w_ref),
            half_pixel_centers=False)

    pix, d, m = depth_reprojection_warp(
        jnp.asarray(src_depth), jnp.asarray(ref_depth),
        src_K=jnp.asarray(K), src_cam_to_world=jnp.asarray(c2w_src),
        ref_K=jnp.asarray(K), ref_cam_to_world=jnp.asarray(c2w_ref))

    both = (t_m.numpy() > 0.5) & (np.asarray(m) > 0.5)
    assert both.mean() > 0.5
    np.testing.assert_allclose(np.asarray(pix)[both], t_pix.numpy()[both],
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(d)[both], t_d.numpy()[both],
                               atol=1e-3)


def test_epoch_end_mean():
    outs = [{"loss": 1.0, "errs": {"a": 2.0}},
            {"loss": 3.0, "errs": {"a": 4.0}}]
    m = epoch_end_mean(outs)
    assert m["loss"] == 2.0
    assert m["errs"]["a"] == 3.0
    overall, per = epoch_end_mean_named(outs, names=["x", "y"])
    assert per["x"]["loss"] == 1.0 and per["y"]["loss"] == 3.0


def test_meters_and_schedules():
    m = DictAverageMeter()
    m.update({"a": 1})
    m.update({"a": 3})
    assert m.mean()["a"] == 2.0

    sb = StreamingBinCount(4, 0, 1)
    sb.update([0.1, 0.9, 0.95])
    assert sb.counts.sum() == 3

    fn = warmup_multi_step_lr(1.0, [100, 200], gamma=0.5, warmup_iters=10)
    assert float(fn(0)) < 0.5
    assert abs(float(fn(50)) - 1.0) < 1e-6
    assert abs(float(fn(150)) - 0.5) < 1e-6
    assert abs(float(fn(250)) - 0.25) < 1e-6


def test_sam_perturb():
    params = {"w": jnp.ones(3)}
    grads = {"w": jnp.array([3.0, 0.0, 4.0])}
    p2 = sam_perturb(params, grads, rho=0.05)
    step = np.asarray(p2["w"]) - 1.0
    np.testing.assert_allclose(np.linalg.norm(step), 0.05, rtol=1e-5)


def test_calib_convert_to_txt(tmp_path):
    """Basalt kb4 calibration.json -> DSO EquiDistant camera.txt
    (scripts/calib_convert_to_txt.py; reference script parity: half-pixel
    center rescale 1280x800 -> 512x320 and the 4-line crop format)."""
    import json
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from calib_convert_to_txt import convert

    calib = {"value0": {"intrinsics": [{
        "camera_type": "kb4",
        "intrinsics": {"fx": 640.0, "fy": 640.0, "cx": 639.5, "cy": 399.5,
                       "k1": 0.1, "k2": -0.02, "k3": 0.003, "k4": -0.0004},
    }]}}
    (tmp_path / "calibration.json").write_text(json.dumps(calib))
    out = convert(str(tmp_path))
    lines = open(out).read().splitlines()
    assert len(lines) == 4 and lines[2] == "crop"
    tok = lines[0].split()
    assert tok[0] == "EquiDistant"
    fx, fy, cx, cy = map(float, tok[1:5])
    # fx*512/1280, fy*320/800, (cx+.5)*scale-.5
    assert abs(fx - 256.0) < 1e-9 and abs(fy - 256.0) < 1e-9
    assert abs(cx - ((639.5 + .5) * 0.4 - .5)) < 1e-9
    assert abs(cy - ((399.5 + .5) * 0.4 - .5)) < 1e-9
    assert lines[1] == "512 320" and lines[3] == "512 320"
    assert [float(x) for x in tok[5:]] == [0.1, -0.02, 0.003, -0.0004]
