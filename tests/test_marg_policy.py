"""Frame-marginalization selection policy (flagFramesForMarginalization,
FullSystemMarginalize.cpp:56-119): keep/drop decisions on synthetic windows."""

import numpy as np
import jax.numpy as jnp

from tandem_tpu.pipeline.full_system import (FullSystem, FullSystemOptions,
                                             Keyframe)

H, W = 48, 64
FX = FY = 40.0
CX, CY = (W - 1) / 2, (H - 1) / 2


def _build_window(centers, n_points=None, affs=None):
    """FullSystem with a synthetic active window: one KF per camera center.

    :param centers: (F, 3) camera centers, in keyframe order
    :param n_points: surviving BA point count per KF (default: plenty)
    :param affs: per-KF affine a (default zeros)
    """
    fs = FullSystem(FX, FY, CX, CY, H, W, options=FullSystemOptions())
    img = jnp.zeros((H, W), jnp.float32)
    F = len(centers)
    pt_frame = []
    for i, c in enumerate(centers):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = c
        kf = Keyframe(i, float(i), img, c2w)
        kf.kf_id = i
        kf.slot = i
        kf.n_points_total = 100
        kf.n_immature = 0
        fs.keyframes.append(kf)
        fs.kf_of_slot[i] = kf
        n = 100 if n_points is None else n_points[i]
        pt_frame += [i] * n
    pt_frame = np.asarray(pt_frame, np.int32)
    N = fs.ba_state.pt_frame.shape[0]
    pf = np.zeros(N, np.int32)
    pv = np.zeros(N, bool)
    pf[:len(pt_frame)] = pt_frame
    pv[:len(pt_frame)] = True
    aff = np.zeros((fs.ba_state.aff.shape[0], 2), np.float32)
    if affs is not None:
        aff[:F, 0] = affs
    fs.ba_state = fs.ba_state._replace(
        pt_frame=jnp.asarray(pf), pt_valid=jnp.asarray(pv),
        aff=jnp.asarray(aff),
        frame_valid=fs.ba_state.frame_valid.at[:F].set(True))
    return fs


def test_flags_low_point_fraction():
    """A frame whose surviving-point fraction fell below 5% is flagged."""
    centers = [(0.1 * i, 0, 0) for i in range(7)]
    n_points = [100] * 7
    n_points[2] = 3           # 3% survivors in KF 2
    fs = _build_window(centers, n_points=n_points)
    flagged = fs._flag_frames_for_marginalization()
    ids = {k.kf_id for k in flagged}
    assert 2 in ids


def test_flags_brightness_outlier():
    """|log gain| vs the newest frame above 0.7 flags the frame."""
    centers = [(0.1 * i, 0, 0) for i in range(7)]
    affs = np.zeros(7, np.float32)
    affs[1] = 1.0             # e^1 gain vs newest
    fs = _build_window(centers, affs=affs)
    flagged = fs._flag_frames_for_marginalization()
    assert 1 in {k.kf_id for k in flagged}


def test_distance_score_drops_redundant_far_frame():
    """With a full healthy window, the heuristic drops a redundant frame
    (close to others) far from the latest — NOT simply the oldest, and never
    the first keyframe."""
    # KFs 1 and 2 are nearly coincident (redundant pair) and far from the
    # latest; later frames are spread toward the latest.
    centers = [
        (0.0, 0.0, 0.0),      # KF0: exempt (frameID == 0 skip)
        (1.00, 0.0, 0.0),     # KF1: redundant with KF2, far from latest
        (1.01, 0.0, 0.0),     # KF2: redundant with KF1
        (2.0, 0.0, 0.0),
        (2.5, 0.0, 0.0),
        (2.8, 0.0, 0.0),
        (3.0, 0.0, 0.0),      # latest
    ]
    fs = _build_window(centers)
    flagged = fs._flag_frames_for_marginalization()
    assert len(flagged) == 1
    assert flagged[0].kf_id in (1, 2)


def test_keeps_distant_anchor():
    """A spatially isolated anchor survives; a clustered frame is dropped."""
    centers = [
        (0.0, 0.0, 0.0),      # KF0 exempt
        (-3.0, 0.0, 0.0),     # KF1: distant lone anchor (far from everyone)
        (1.9, 0.0, 0.0),      # KF2-4: dense cluster, far-ish from latest
        (1.95, 0.0, 0.0),
        (2.0, 0.0, 0.0),
        (2.9, 0.0, 0.0),
        (3.0, 0.0, 0.0),      # latest
    ]
    fs = _build_window(centers)
    flagged = fs._flag_frames_for_marginalization()
    assert len(flagged) == 1
    assert flagged[0].kf_id in (2, 3, 4), flagged[0].kf_id


def test_small_window_not_flagged():
    """Below max_keyframes with healthy frames: nothing is flagged."""
    centers = [(0.1 * i, 0, 0) for i in range(4)]
    fs = _build_window(centers)
    assert fs._flag_frames_for_marginalization() == []


def test_min_frames_floor():
    """Criterion (a) never shrinks the window below setting_minFrames (5)."""
    centers = [(0.1 * i, 0, 0) for i in range(6)]
    n_points = [2] * 6         # everyone is point-starved
    fs = _build_window(centers, n_points=n_points)
    flagged = fs._flag_frames_for_marginalization()
    assert len(fs.keyframes) - len(flagged) >= 5
