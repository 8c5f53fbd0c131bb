"""CostRegNet: 4-level 3D U-Net over (D, H, W) cost volumes, NDHWC layout.

Parity target: cva_mvsnet/models/module.py:534-600. Encoder strides 2 at each
level (the deepest level uses stride (1,2,2) when D==4, module.py:554-567),
decoder is torch-ConvTranspose3d-equivalent deconvs with skip additions, and a
final 3x3x3 single-channel logit conv without bias.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import (ConvBnRelu, DeconvBnRelu, _ConvParams, _batch_norm,
                     conv3d_folded_nhwdc)


class CostRegNet(nn.Module):
    base_channels: int = 8
    normalization: str = "batchnorm"
    has_four_depths: bool = False
    dtype: jnp.dtype = jnp.float32

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

        x = x.transpose(0, 2, 3, 1, 4)                # (B, H, W, D, C)
        conv0 = ConvBnRelu(b, 3, padding=1, name="conv0", **kw)(x, train)
        conv2 = ConvBnRelu(2 * b, 3, padding=1, name="conv2", **kw)(
            ConvBnRelu(2 * b, 3, stride=2, padding=1, name="conv1", **kw)(conv0, train), train)
        conv4 = ConvBnRelu(4 * b, 3, padding=1, name="conv4", **kw)(
            ConvBnRelu(4 * b, 3, stride=2, padding=1, name="conv3", **kw)(conv2, train), train)
        x = ConvBnRelu(8 * b, 3, padding=1, name="conv6", **kw)(
            ConvBnRelu(8 * b, 3, stride=s5, padding=1, name="conv5", **kw)(conv4, train), train)

        x = conv4 + DeconvBnRelu(4 * b, stride=s5, output_padding=op5,
                                 name="conv7", **kw)(x, train)
        x = conv2 + DeconvBnRelu(2 * b, name="conv9", **kw)(x, train)
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
    Parity target: cva_mvsnet/models/cva_mvsnet.py:76-83."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(1, (1, 1, 1), use_bias=True, dtype=self.dtype,
                    name="gate0")(x)
        y = _batch_norm(y, train, self.dtype, name="bn0")
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1, 1), use_bias=True, dtype=self.dtype,
                    name="gate1")(y)
        y = _batch_norm(y, train, self.dtype, name="bn1")
        y = nn.relu(y)
        return y  # (B, D, H, W, 1)
