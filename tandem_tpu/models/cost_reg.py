"""CostRegNet: 4-level 3D U-Net over (D, H, W) cost volumes, NDHWC layout.

Parity target: cva_mvsnet/models/module.py:534-600. Encoder strides 2 at each
level (the deepest level uses stride (1,2,2) when D==4, module.py:554-567),
decoder is torch-ConvTranspose3d-equivalent deconvs with skip additions, and a
final 3x3x3 single-channel logit conv without bias.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import (ConvBnRelu, DeconvBnRelu, _ConvParams, _EvalFoldedBN,
                     _batch_norm, _depth_band, _fold_depth_kernel,
                     conv2d_patched, conv3d_folded_nhwdc, depth_to_space,
                     space_to_depth)


class CostRegNet(nn.Module):
    base_channels: int = 8
    normalization: str = "batchnorm"
    has_four_depths: bool = False
    dtype: jnp.dtype = jnp.float32
    patched: bool = True      # allow the space-to-depth inference path

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base_channels
        # The whole U-Net runs in the FOLDED (B, H, W, D, C) layout: depth
        # rides the channel axis as block-banded 2D convs (conv3d_folded);
        # one transpose in, one out — no per-layer layout flips.
        kw = dict(ndim=3, normalization=self.normalization, folded=True,
                  dtype=self.dtype)
        s5 = (1, 2, 2) if self.has_four_depths else 2
        op5 = (0, 1, 1) if self.has_four_depths else 1

        B, D, H, W, C = x.shape
        x = x.transpose(0, 2, 3, 1, 4)                # (B, H, W, D, C)
        # Thin-volume stages (stage3: D*C = 64) additionally fold 2x2 pixel
        # blocks into channels for the full-resolution layers
        # (space_to_depth; exact rearrangement, same parameters) — 256-wide
        # convs at 1/4 the rows instead of 64-wide, and the stride-2 deconv
        # becomes one dense 2x2 conv instead of an lhs_dilation conv.
        patched = (self.patched and not train and D * C <= 128
                   and H % 2 == 0 and W % 2 == 0
                   and not self.has_four_depths
                   and self.normalization == "batchnorm")
        if patched:
            xp = space_to_depth(x.reshape(B, H, W, D * C))  # (H/2, W/2, 4DC)
            conv0p = ConvBnRelu(b, 3, padding=1, name="conv0", **kw,
                                f_in=2, f_out=2, depth_in=D)(xp, train)
            x1 = ConvBnRelu(2 * b, 3, stride=2, padding=1, name="conv1",
                            **kw, f_in=2, f_out=1, depth_in=D)(conv0p, train)
            conv1 = x1.reshape(B, H // 2, W // 2, D // 2, 2 * b)
        else:
            conv0 = ConvBnRelu(b, 3, padding=1, name="conv0", **kw)(x, train)
            conv1 = ConvBnRelu(2 * b, 3, stride=2, padding=1, name="conv1",
                               **kw)(conv0, train)
        conv2 = ConvBnRelu(2 * b, 3, padding=1, name="conv2", **kw)(conv1, train)
        conv4 = ConvBnRelu(4 * b, 3, padding=1, name="conv4", **kw)(
            ConvBnRelu(4 * b, 3, stride=2, padding=1, name="conv3", **kw)(conv2, train), train)
        x = ConvBnRelu(8 * b, 3, padding=1, name="conv6", **kw)(
            ConvBnRelu(8 * b, 3, stride=s5, padding=1, name="conv5", **kw)(conv4, train), train)

        x = conv4 + DeconvBnRelu(4 * b, stride=s5, output_padding=op5,
                                 name="conv7", **kw)(x, train)
        x = conv2 + DeconvBnRelu(2 * b, name="conv9", **kw)(x, train)
        if patched:
            xp = conv0p + DeconvBnRelu(b, name="conv11", **kw,
                                       f_out=2)(x, train)
            kernel, _ = _ConvParams((3, 3, 3, b, 1), False, name="prob")()
            big = _fold_depth_kernel(
                kernel.astype(self.dtype),
                _depth_band(3, D, D, 1, 1, transpose=False))
            lp = conv2d_patched(xp, big, (1, 1), (1, 1), f_in=2, f_out=2)
            logits = depth_to_space(lp).reshape(B, H, W, D, 1)
        else:
            x = conv0 + DeconvBnRelu(b, name="conv11", **kw)(x, train)
            kernel, _ = _ConvParams((3, 3, 3, x.shape[-1], 1), False,
                                    name="prob")()
            logits = conv3d_folded_nhwdc(x.astype(self.dtype),
                                         kernel.astype(self.dtype),
                                         (1, 1, 1), (1, 1, 1))
        return logits.transpose(0, 3, 1, 2, 4)        # (B, D, H, W, 1)


class VolumeGate(nn.Module):
    """Self-adaptive view-aggregation gate (Yi et al. PVA-MVSNet style):
    Conv3d(C->1, 1x1x1)+BN+ReLU then Conv3d(1->1, 1x1x1)+BN+ReLU.
    Parity target: cva_mvsnet/models/cva_mvsnet.py:76-83.

    At inference the whole net is a C-contraction followed by scalar FMAs:
    single-channel (..., 1) tensors tile 1/128 of the TPU's lane dimension,
    so the eval path contracts with an einsum and returns (B, D, H, W) —
    identical math on the identical parameter tree, no 1-lane tensors."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if train:
            y = nn.Conv(1, (1, 1, 1), use_bias=True, dtype=self.dtype,
                        name="gate0")(x)
            y = _batch_norm(y, train, self.dtype, name="bn0")
            y = nn.relu(y)
            y = nn.Conv(1, (1, 1, 1), use_bias=True, dtype=self.dtype,
                        name="gate1")(y)
            y = _batch_norm(y, train, self.dtype, name="bn1")
            y = nn.relu(y)
            return y[..., 0]  # (B, D, H, W)
        C = x.shape[-1]
        k0, b0 = _ConvParams((1, 1, 1, C, 1), True, name="gate0")()
        k1, b1 = _ConvParams((1, 1, 1, 1, 1), True, name="gate1")()
        y = (jnp.einsum("...c,c->...", x, k0[0, 0, 0, :, 0].astype(x.dtype))
             + b0[0].astype(x.dtype))
        y = nn.relu(_EvalFoldedBN(dtype=self.dtype, channels=1,
                                  name="bn0")(y))
        y = y * k1[0, 0, 0, 0, 0].astype(x.dtype) + b1[0].astype(x.dtype)
        y = nn.relu(_EvalFoldedBN(dtype=self.dtype, channels=1,
                                  name="bn1")(y))
        return y  # (B, D, H, W)
