"""Layer-level parity vs torch: grid_sample, conv/deconv blocks, ranges."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from tandem_tpu.ops.grid_sample import grid_sample_bilinear
from tandem_tpu.models.ranges import uniform_depth_range, adaptive_depth_range
from tandem_tpu.models.edge_filter import depth_filter_edges
from tandem_tpu.models.layers import interpolate_bilinear, upsample_nearest_2x


def test_grid_sample_matches_torch(rng):
    B, H, W, C = 2, 13, 17, 5
    img = rng.randn(B, H, W, C).astype(np.float32)
    grid = (rng.rand(B, 7, 9, 2).astype(np.float32) * 2.6 - 1.3)

    ours = grid_sample_bilinear(jnp.array(img), jnp.array(grid))
    theirs = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2), torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=True)
    np.testing.assert_allclose(
        np.asarray(ours), theirs.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_uniform_depth_range(rng):
    dmin = np.array([0.5, 1.0], np.float32)
    dmax = np.array([5.0, 8.0], np.float32)
    depth, interval = uniform_depth_range(
        depth_min=dmin, depth_max=dmax, depth_num=48, height=4, width=6)
    assert depth.shape == (2, 48, 4, 6)
    np.testing.assert_allclose(np.asarray(depth[:, 0, 0, 0]), dmin, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(depth[:, -1, 0, 0]), dmax, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(interval), (dmax - dmin) / 47, rtol=1e-6)


def test_adaptive_depth_range(rng):
    depth = rng.rand(2, 5, 7).astype(np.float32) * 4 + 1
    interval = np.array([0.1, 0.2], np.float32)
    out = adaptive_depth_range(depth=jnp.array(depth), interval=jnp.array(interval),
                               depth_num=32)
    out = np.asarray(out)
    assert out.shape == (2, 32, 5, 7)
    # Uniform spacing == interval
    steps = np.diff(out, axis=1)
    np.testing.assert_allclose(steps, np.broadcast_to(
        interval[:, None, None, None], steps.shape), rtol=1e-4)
    # Centered: first sample = clamp(depth - D/2*interval, 0.001)
    expect0 = np.maximum(depth - 16 * interval[:, None, None], 0.001)
    np.testing.assert_allclose(out[:, 0], expect0, rtol=1e-4)
    assert (out > 0).all()


def test_adaptive_inverse_depth_range_torch_parity(rng):
    """Compare the inverse-depth spacing against the reference formula."""
    for depth_num, f in ((32, 0.5), (8, 0.3)):
        half = ((1 / torch.linspace(1 / f, 1 / 1, depth_num // 2) - f) / (1 - f))
        half = (half + 0.5 * half[1]) / (1 + 0.5 * half[1])
        both = 0.5 * torch.cat([-torch.flip(half, (0,)), half], 0) + 0.5

        depth = rng.rand(1, 3, 3).astype(np.float32) * 4 + 2
        interval = np.array([0.05], np.float32)
        ours = adaptive_depth_range(depth=jnp.array(depth),
                                    interval=jnp.array(interval),
                                    depth_num=depth_num, inverse_depth=True)
        dmin = depth - (depth_num / 2) * interval[:, None, None]
        dmax = dmin + depth_num * interval[:, None, None]
        expect = dmin[:, None] + (dmax - dmin)[:, None] * \
            both.numpy().reshape(1, -1, 1, 1)
        np.testing.assert_allclose(np.asarray(ours), expect, atol=1e-5)


def test_interpolate_bilinear_matches_torch(rng):
    x = rng.randn(2, 8, 10, 3).astype(np.float32)
    for align in (True, False):
        ours = interpolate_bilinear(jnp.array(x), 16, 20, align_corners=align)
        theirs = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                               (16, 20), mode="bilinear", align_corners=align)
        np.testing.assert_allclose(np.asarray(ours),
                                   theirs.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_upsample_nearest_matches_torch(rng):
    x = rng.randn(2, 5, 6, 4).astype(np.float32)
    ours = upsample_nearest_2x(jnp.array(x))
    theirs = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
                           mode="nearest")
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_edge_filter_zeroes_strongest_edges(rng):
    depth = rng.rand(2, 24, 32).astype(np.float32) * 3
    out, mask = depth_filter_edges(jnp.array(depth), jnp.array([10.0, 10.0]))
    out, mask = np.asarray(out), np.asarray(mask)
    frac = mask.mean(axis=(1, 2))
    assert (frac < 0.15).all()
    assert (out[mask] == 0).all()
    assert np.allclose(out[~mask], depth[~mask])


def test_conv3d_folded_matches_per_tap(rng):
    """conv3d_folded / deconv3d_folded (one fat banded 2D conv) must be
    algebraically identical to the per-tap decomposition."""
    import jax.numpy as jnp
    from tandem_tpu.models.layers import (conv3d_folded, conv3d_via_2d,
                                          deconv3d_folded, deconv3d_via_2d)

    cases = [(8, 8, 8, (1, 1, 1), (1, 1, 1)),
             (8, 8, 16, (2, 2, 2), (1, 1, 1)),
             (4, 16, 32, (1, 2, 2), (1, 1, 1))]
    for D, I, O, s, p in cases:
        x = jnp.asarray(rng.rand(2, D, 12, 16, I).astype(np.float32))
        k = jnp.asarray(rng.rand(3, 3, 3, I, O).astype(np.float32) - 0.5)
        a = np.asarray(conv3d_via_2d(x, k, s, p))
        b = np.asarray(conv3d_folded(x, k, s, p))
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)

    dcases = [(4, 16, 8, (2, 2, 2), (1, 1, 1)),
              (8, 8, 8, (1, 1, 1), (0, 0, 0)),
              (4, 16, 8, (1, 2, 2), (0, 1, 1))]
    for D, I, O, s, op in dcases:
        x = jnp.asarray(rng.rand(2, D, 12, 16, I).astype(np.float32))
        k = jnp.asarray(rng.rand(3, 3, 3, I, O).astype(np.float32) - 0.5)
        a = np.asarray(deconv3d_via_2d(x, k, s, (1, 1, 1), op))
        b = np.asarray(deconv3d_folded(x, k, s, (1, 1, 1), op))
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


def test_conv2d_patched_matches_plain(rng):
    """conv2d_patched (space-to-depth layout) must be algebraically identical
    to the plain 2D convolution for every FeatureNet configuration."""
    import jax
    from tandem_tpu.models.layers import (conv2d_patched, depth_to_space,
                                          space_to_depth)

    def ref(x, k, s, p):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(s, s), padding=[(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    cases = [(3, 1, 1, 2, 2, 3, 8), (3, 1, 1, 2, 2, 8, 8),
             (5, 2, 2, 2, 1, 8, 16), (1, 1, 0, 2, 2, 16, 32),
             (3, 1, 1, 2, 2, 32, 8)]
    for K, s, p, fi, fo, I, O in cases:
        x = jnp.asarray(rng.randn(2, 16, 24, I).astype(np.float32))
        k = jnp.asarray(rng.randn(K, K, I, O).astype(np.float32))
        want = ref(x, k, s, p)
        got = conv2d_patched(space_to_depth(x, fi), k, (s, s), (p, p),
                             f_in=fi, f_out=fo)
        if fo > 1:
            got = depth_to_space(got, fo)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_feature_net_patched_matches_plain(rng):
    """The space-to-depth inference FeatureNet must reproduce the plain path
    bit-for-bit up to float accumulation order, on the same variables."""
    from tandem_tpu.models.feature_net import FeatureNet

    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    plain = FeatureNet(dtype=jnp.float32, patched=False)
    vars_ = plain.init(jax.random.PRNGKey(0), x, train=False)
    # perturb batch_stats so BN isn't the identity
    vars_ = jax.tree.map(
        lambda a: a + 0.1 * np.arange(a.size, dtype=np.float32).reshape(
            a.shape) % 0.7, vars_)
    want = plain.apply(vars_, x, train=False)
    got = FeatureNet(dtype=jnp.float32, patched=True).apply(
        vars_, x, train=False)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-4, atol=1e-4)


def test_deconv2d_patched_out_matches_plain(rng):
    """deconv2d_patched_out (dense 2x2 conv in space-to-depth layout) vs the
    lhs_dilation transposed conv, stride-2 K=3 p=1 op=1."""
    from tandem_tpu.models.layers import (_deconv2d, deconv2d_patched_out,
                                          depth_to_space)
    x = jnp.asarray(rng.randn(2, 10, 14, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 16, 8).astype(np.float32))
    want = _deconv2d(x, k, (2, 2), (1, 1), (1, 1))
    got = depth_to_space(deconv2d_patched_out(x, k))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_cost_reg_patched_matches_plain(rng):
    """Stage3-style CostRegNet (D*C=64) must produce identical logits on the
    patched (space-to-depth full-res layers) and plain folded paths."""
    from tandem_tpu.models.cost_reg import CostRegNet

    x = jnp.asarray(rng.randn(1, 8, 32, 48, 8).astype(np.float32))
    plain = CostRegNet(base_channels=8, dtype=jnp.float32, patched=False)
    vars_ = plain.init(jax.random.PRNGKey(0), x, train=False)
    vars_ = jax.tree.map(
        lambda a: a + 0.1 * np.arange(a.size, dtype=np.float32).reshape(
            a.shape) % 0.7, vars_)
    want = plain.apply(vars_, x, train=False)
    got = CostRegNet(base_channels=8, dtype=jnp.float32, patched=True).apply(
        vars_, x, train=False)
    assert got.shape == want.shape == (1, 8, 32, 48, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
