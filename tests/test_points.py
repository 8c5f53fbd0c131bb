"""Pixel selection + immature-point tracing tests on the synthetic plane."""

import numpy as np
import pytest

import jax.numpy as jnp

from tandem_tpu.core.pyramid import build_pyramid
from tandem_tpu.core.se3 import se3_exp
from tandem_tpu.tracking.point_selection import select_pixels
from tandem_tpu.tracking.immature import (make_immature, trace_points,
                                          activate_points, STATUS_GOOD)
from tests.test_coarse_tracker import render_plane, H, W, FX, FY, CX, CY

K = (FX, FY, CX, CY)


def test_select_pixels_spread():
    img, _ = render_plane(np.eye(4))
    pyr = build_pyramid(jnp.asarray(img), 1)
    # threshold_factor scaled down: the synthetic texture is much smoother
    # than real 0-255 imagery that DSO's median+7 threshold targets
    mask = np.asarray(select_pixels(pyr[0]["abs_grad2"],
                                    threshold_factor=0.35))
    n = mask.sum()
    assert 100 < n < H * W // 8
    # spread: every 24x24 region with strong texture has at least one point
    blocks = mask[:96, :120].reshape(4, 24, 5, 24).sum((1, 3))
    assert (blocks > 0).mean() > 0.8
    # no border selections
    assert mask[:3].sum() == 0 and mask[:, :3].sum() == 0


def test_trace_and_activate():
    host_c2w = np.eye(4, dtype=np.float32)
    img0, depth0 = render_plane(host_c2w)
    xi = np.array([0.12, 0.0, 0.0, 0.0, 0.0, 0.0], np.float32)  # baseline
    tgt_c2w = np.asarray(se3_exp(jnp.array(xi)))
    img1, _ = render_plane(tgt_c2w)

    ys, xs = np.mgrid[10:H - 10:12, 10:W - 10:12]
    uv = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1),
                     jnp.float32)
    pts = make_immature(uv, jnp.asarray(img0), id_min=0.05, id_max=2.0)

    pts = trace_points(pts, jnp.asarray(host_c2w), jnp.asarray(tgt_c2w),
                       jnp.asarray(img1), K)
    status = np.asarray(pts.status)
    assert (status == STATUS_GOOD).mean() > 0.7

    # Interval should have narrowed around gt idepth 1/2 = 0.5
    good = status == STATUS_GOOD
    id_mid = np.asarray(0.5 * (pts.id_min + pts.id_max))[good]
    gt = 1.0 / depth0[np.asarray(uv)[good, 1].astype(int),
                      np.asarray(uv)[good, 0].astype(int)]
    # widths shrank
    widths = np.asarray(pts.id_max - pts.id_min)[good]
    assert np.median(widths) < 0.4  # from initial 1.95

    # second trace narrows further; activation refines to gt
    pts = trace_points(pts, jnp.asarray(host_c2w), jnp.asarray(tgt_c2w),
                       jnp.asarray(img1), K)
    idep, ok = activate_points(pts, jnp.asarray(host_c2w),
                               jnp.asarray(tgt_c2w), jnp.asarray(img1), K)
    okn = np.asarray(ok)
    assert okn.mean() > 0.5
    gt_all = 1.0 / depth0[np.asarray(uv)[:, 1].astype(int),
                          np.asarray(uv)[:, 0].astype(int)]
    rel = np.abs(np.asarray(idep)[okn] - gt_all[okn]) / gt_all[okn]
    assert np.median(rel) < 0.05, np.median(rel)
