"""Full TANDEM loop: VO + backend (depth -> TSDF -> render -> dense tracking).

Uses a stub depth oracle in place of CVA-MVSNet (random weights would poison
the loop); this validates the orchestration: one-keyframe lookahead, TSDF
integration, raycast rendering, A/B depth buffer, and dense injection into
the coarse tracker.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tandem_tpu.mapping.tsdf import TsdfConfig
from tandem_tpu.pipeline.backend import TandemBackend
from tandem_tpu.pipeline.full_system import FullSystem, FullSystemOptions
from tests.test_coarse_tracker import render_plane, H, W, FX, FY, CX, CY
from tests.test_full_system import make_sequence, _align_sim3_translations


class OracleRunner:
    """MvsnetRunner-compatible stub returning analytic GT depth for the
    reference view pose. ``busy=True`` simulates a device that never finishes
    by probe time (device_ready False while a call is pending) to exercise
    the real-time drop path."""
    view_num = 4

    def __init__(self, busy: bool = False):
        self._pending = None
        self._ready = True
        self.busy = busy

    def ready(self):
        return self._ready

    def device_ready(self):
        return self._pending is None or not self.busy

    def call_async(self, bgrs, cam_to_worlds, K, depth_min, depth_max,
                   discard_percentage=10.0, ref_index=None):
        assert self._ready
        ref_index = self.view_num - 2 if ref_index is None else ref_index
        _, depth = render_plane(np.asarray(cam_to_worlds[ref_index],
                                           np.float64))
        self._pending = {
            "depth": depth.astype(np.float32),
            "confidence": np.ones_like(depth),
            "depth_dense": depth.astype(np.float32),
            "confidence_dense": np.ones_like(depth),
        }
        self._ready = False

    def get_result(self, device: bool = False):
        res = self._pending
        self._pending = None
        self._ready = True
        return res

    def wait(self):
        pass


def test_tandem_loop(tmp_path):
    # Long enough for the joint initializer (~8 frames) plus a 4-KF window.
    poses_gt, images = make_sequence(n=22, step=0.02)
    K_mat = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)

    cfg = TsdfConfig(voxel_size=0.02, table_dim=64, pool_size=4096,
                     truncation=0.08, max_depth=8.0)
    backend = TandemBackend(OracleRunner(), cfg, K_mat, H, W,
                            mesh_extraction_freq=3)
    opts = FullSystemOptions(selection_threshold_factor=0.35,
                             kf_global_weight=7.0, init_max_width=0.4,
                             mvs_view_num=4)
    fs = FullSystem(FX, FY, CX, CY, H, W, options=opts, backend=backend)

    for i, img in enumerate(images):
        bgr = np.stack([img] * 3, -1).astype(np.uint8)
        fs.add_active_frame(img, i, float(i) * 0.1, bgr=bgr)
        assert not fs.is_lost

    assert fs.initialized
    assert backend.call_num >= 1, "backend never received a KF window"

    # After at least 2 calls the tracking depth map must be live (1-KF lag)
    if backend.call_num >= 2:
        dm = backend.get_tracking_depth_map()
        assert dm is not None and dm["valid"]
        d = dm["depth"]
        hit = d > 0
        assert hit.mean() > 0.3
        # rendered depth is metrically consistent with the scene scale the
        # oracle provided (plane at z=2 from near-identity poses)
        assert 1.0 < np.median(d[hit]) < 3.0

    verts, faces, cols = backend.extract_mesh_now()
    assert verts.shape[0] > 0

    err = _align_sim3_translations([p[:3, 3] for p in fs.all_poses],
                                   [p[:3, 3] for p in poses_gt])
    assert err < 0.04, err


def _drive(busy: bool, linearize: bool):
    """Run the loop with a backend whose device never looks finished
    (busy=True) under drop (linearize=False) or wait semantics."""
    poses_gt, images = make_sequence(n=22, step=0.02)
    K_mat = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)
    cfg = TsdfConfig(voxel_size=0.02, table_dim=64, pool_size=4096,
                     truncation=0.08, max_depth=8.0)
    backend = TandemBackend(OracleRunner(busy=busy), cfg, K_mat, H, W,
                            mesh_extraction_freq=0)
    opts = FullSystemOptions(selection_threshold_factor=0.35,
                             kf_global_weight=7.0, init_max_width=0.4,
                             mvs_view_num=4, linearize=linearize)
    fs = FullSystem(FX, FY, CX, CY, H, W, options=opts, backend=backend)
    for i, img in enumerate(images):
        bgr = np.stack([img] * 3, -1).astype(np.uint8)
        fs.add_active_frame(img, i, float(i) * 0.1, bgr=bgr)
    return fs, backend


def test_backend_drop_and_wait_modes():
    """Reference drop/wait parity (FullSystem.cpp:1144-1151): real-time mode
    DROPS keyframes while the backend is busy; linearize mode WAITS so no
    keyframe is ever dropped."""
    fs, backend = _drive(busy=True, linearize=False)
    assert fs.initialized
    # first window launches (backend idle), every later window is dropped
    # because the 'device' never finishes by probe time
    assert backend.call_num == 1
    assert fs.n_dropped_kf >= 1

    fs2, backend2 = _drive(busy=True, linearize=True)
    assert fs2.initialized
    assert fs2.n_dropped_kf == 0
    assert backend2.call_num >= 2    # waits instead of dropping
