"""Core geometry + config tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from tandem_tpu import config as cfg
from tandem_tpu.core.se3 import (se3_exp, se3_log, se3_inverse, so3_exp, so3_log)
from tandem_tpu.core.camera import cam_resize, cam_intrinsics, scale_K_naive


def test_config_flatten_and_merge():
    c = cfg.default()
    assert c["MODEL.DEPTH_NUM"] == (48, 32, 8)
    assert c["DATA.DEPTH_MIN"] == 0.01
    cfg.merge_from_list(c, ["MODEL.DEPTH_NUM", "(24, 16, 4)"])
    assert c["MODEL.DEPTH_NUM"] == (24, 16, 4)
    with pytest.raises(KeyError):
        cfg.merge_from_config(c, {"NOT.A.KEY": 1})


def test_se3_roundtrip(rng):
    xi = rng.randn(16, 6).astype(np.float32) * 0.5
    T = se3_exp(jnp.array(xi))
    xi2 = se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-4)
    # inverse
    I = np.asarray(T @ se3_inverse(T))
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), I.shape), atol=1e-5)


def test_se3_small_angle(rng):
    xi = rng.randn(4, 6).astype(np.float32) * 1e-6
    T = np.asarray(se3_exp(jnp.array(xi)))
    np.testing.assert_allclose(T[:, :3, 3], xi[:, :3], atol=1e-8)
    xi2 = np.asarray(se3_log(jnp.array(T)))
    np.testing.assert_allclose(xi2, xi, atol=1e-7)


def test_so3_roundtrip():
    # Local RNG + bounded |w| < pi: the log is only unique below pi, and the
    # shared session RNG made this order-dependent.
    rng = np.random.RandomState(7)
    w = rng.randn(8, 3).astype(np.float32)
    w = w / np.maximum(np.linalg.norm(w, axis=1, keepdims=True), 1.0) * 1.5
    R = so3_exp(jnp.array(w))
    # orthonormality
    RtR = np.asarray(jnp.matmul(jnp.swapaxes(R, -1, -2), R))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape),
                               atol=1e-5)
    w2 = np.asarray(so3_log(R))
    # log is defined up to 2pi; our magnitudes are < pi so roundtrip holds
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_cam_resize_half_pixel():
    cam = cam_intrinsics(height=480, width=640, fx=300.0, fy=300.0,
                         cx=319.5, cy=239.5, dtype=np.float32)
    half = cam_resize(cam, 240, 320)
    assert np.isclose(half["K"][0, 0], 150.0)
    # principal point stays at the image centre under centred resize
    assert np.isclose(half["K"][0, 2], 0.5 * (320 - 1))
    naive = scale_K_naive(cam["K"], 0.5)
    assert np.isclose(naive[0, 2], 159.75)  # the runtime's biased variant


def test_ablation_configs_merge():
    """The four paper-Table-2 ablation configs (reference configs/abl0*.yaml)
    merge cleanly onto the default and set the documented knobs; abl04 is
    the SHIPPED runtime architecture (48, 4, 4)."""
    import os
    base = os.path.join(os.path.dirname(cfg.__file__), "configs")
    expect = {
        "abl01_baseline.yaml": ((48, 32, 8), False,
                                "dso_optimization_windows_last3"),
        "abl02_vo_window.yaml": ((48, 32, 8), False,
                                 "dso_optimization_windows"),
        "abl03_view_aggregation.yaml": ((48, 32, 8), True,
                                        "dso_optimization_windows"),
        "abl04_fewer_depth_planes.yaml": ((48, 4, 4), True,
                                          "dso_optimization_windows"),
    }
    for name, (dn, va, ext) in expect.items():
        c = cfg.default()
        cfg.merge_from_file(c, os.path.join(base, name))
        assert tuple(c["MODEL.DEPTH_NUM"]) == dn, name
        assert c["MODEL.VIEW_AGGREGATION"] is va, name
        assert c["DATA.TUPLES_EXT"] == ext, name
