"""FeatureNet: 3-scale 2D feature pyramid (FPN).

Parity target: cva_mvsnet/models/module.py:435-531. Downsampling tower
(conv0 3x3x2, conv1 5x5s2+3x3+3x3, conv2 5x5s2+3x3+3x3), nearest-neighbour
upsampling with 1x1 skip convolutions, per-stage output convs:
stage1 1x1 (no bias), stage2/stage3 3x3 (no bias). Output channels are
{stage1: 4*base, stage2: 2*base, stage3: base} at scales {1/4, 1/2, 1}.
NHWC layout throughout.

Inference runs in space-to-depth ("patched") layout: every conv's 8-32
channels sit mostly idle on the TPU's 128-wide MXU contraction, so 2x2
pixel blocks are folded into channels (layers.conv2d_patched — an exact
0/1 rearrangement of the same weights) making each conv a 32-128 channel
conv at 1/4 the spatial positions. The nearest-neighbour 2x upsample is a
free channel tile in this layout (all four sub-positions of an upsampled
patch are the same source pixel). Parameter tree is identical to the plain
path, so checkpoints and the torch converter are unaffected.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from .layers import (ConvBnRelu, _ConvParams, conv2d_patched, depth_to_space,
                     space_to_depth, upsample_nearest_2x)


class FeatureNet(nn.Module):
    base_channels: int = 8
    normalization: str = "batchnorm"
    last_stage: int = 3
    dtype: jnp.dtype = jnp.float32
    patched: bool = True      # allow the space-to-depth inference path

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        patched = (self.patched and not train
                   and self.normalization == "batchnorm"
                   and x.shape[1] % 8 == 0 and x.shape[2] % 8 == 0)
        if patched:
            return self._patched(x, train)
        b = self.base_channels
        kw = dict(ndim=2, normalization=self.normalization, dtype=self.dtype)

        x = ConvBnRelu(b, 3, padding=1, name="conv0_0", **kw)(x, train)
        conv_s3 = ConvBnRelu(b, 3, padding=1, name="conv0_1", **kw)(x, train)

        x = ConvBnRelu(2 * b, 5, stride=2, padding=2, name="conv1_0", **kw)(conv_s3, train)
        x = ConvBnRelu(2 * b, 3, padding=1, name="conv1_1", **kw)(x, train)
        conv_s2 = ConvBnRelu(2 * b, 3, padding=1, name="conv1_2", **kw)(x, train)

        x = ConvBnRelu(4 * b, 5, stride=2, padding=2, name="conv2_0", **kw)(conv_s2, train)
        x = ConvBnRelu(4 * b, 3, padding=1, name="conv2_1", **kw)(x, train)
        conv_s1 = ConvBnRelu(4 * b, 3, padding=1, name="conv2_2", **kw)(x, train)

        res = {
            "stage1": nn.Conv(4 * b, (1, 1), use_bias=False, dtype=self.dtype,
                              name="out_stage1")(conv_s1)
        }
        if self.last_stage >= 2:
            skip2 = nn.Conv(4 * b, (1, 1), use_bias=True, dtype=self.dtype,
                            name="skip_stage2")(conv_s2)
            inter2 = upsample_nearest_2x(conv_s1) + skip2
            res["stage2"] = nn.Conv(2 * b, (3, 3), padding=[(1, 1), (1, 1)],
                                    use_bias=False, dtype=self.dtype,
                                    name="out_stage2")(inter2)
            if self.last_stage >= 3:
                skip3 = nn.Conv(4 * b, (1, 1), use_bias=True, dtype=self.dtype,
                                name="skip_stage3")(conv_s3)
                inter3 = upsample_nearest_2x(inter2) + skip3
                res["stage3"] = nn.Conv(b, (3, 3), padding=[(1, 1), (1, 1)],
                                        use_bias=False, dtype=self.dtype,
                                        name="out_stage3")(inter3)
        return res

    def _patched(self, x, train: bool) -> Dict[str, jnp.ndarray]:
        """Inference forward in space-to-depth layout (identical math)."""
        b = self.base_channels
        kw = dict(ndim=2, normalization=self.normalization, dtype=self.dtype)
        pp = dict(f_in=2, f_out=2)  # patched in -> patched out

        def head(name, cin, cout, k, use_bias, xin, f_out=2):
            kernel, bias = _ConvParams((k, k, cin, cout), use_bias,
                                       name=name)()
            y = conv2d_patched(xin, kernel.astype(self.dtype), (1, 1),
                               (k // 2, k // 2), f_in=2, f_out=f_out)
            if bias is not None:
                y = y + jnp.tile(bias, f_out * f_out).astype(self.dtype)
            return y

        xp = space_to_depth(x.astype(self.dtype))            # (H/2, W/2, 4*3)
        xp = ConvBnRelu(b, 3, padding=1, name="conv0_0", **kw, **pp)(xp, train)
        s3p = ConvBnRelu(b, 3, padding=1, name="conv0_1", **kw, **pp)(xp, train)

        # The stride-2 towers emit straight into the next scale's patched
        # layout (f_out=2): thin 16/32-channel outputs would idle the MXU's
        # output lanes, and the space_to_depth reshuffle disappears.
        x1 = ConvBnRelu(2 * b, 5, stride=2, padding=2, name="conv1_0",
                        **kw, **pp)(s3p, train)              # (H/4, W/4, 8b)
        x1 = ConvBnRelu(2 * b, 3, padding=1, name="conv1_1", **kw, **pp)(x1, train)
        s2p = ConvBnRelu(2 * b, 3, padding=1, name="conv1_2", **kw, **pp)(x1, train)

        x2 = ConvBnRelu(4 * b, 5, stride=2, padding=2, name="conv2_0",
                        **kw, **pp)(s2p, train)              # (H/8, W/8, 16b)
        x2 = ConvBnRelu(4 * b, 3, padding=1, name="conv2_1", **kw, **pp)(x2, train)
        s1p = ConvBnRelu(4 * b, 3, padding=1, name="conv2_2", **kw, **pp)(x2, train)

        res = {"stage1": depth_to_space(
            head("out_stage1", 4 * b, 4 * b, 1, False, s1p))}
        if self.last_stage >= 2:
            skip2 = head("skip_stage2", 2 * b, 4 * b, 1, True, s2p)
            # 2x nearest upsample == every patch sub-position takes the same
            # source pixel -> a channel tile of the un-patched source.
            s1u = depth_to_space(s1p)                        # (H/4, W/4, 4b)
            inter2 = jnp.tile(s1u, (1, 1, 1, 4)) + skip2
            res["stage2"] = depth_to_space(
                head("out_stage2", 4 * b, 2 * b, 3, False, inter2))
            if self.last_stage >= 3:
                skip3 = head("skip_stage3", b, 4 * b, 1, True, s3p)
                inter2u = depth_to_space(inter2)             # (H/2, W/2, 4b)
                inter3 = jnp.tile(inter2u, (1, 1, 1, 4)) + skip3
                res["stage3"] = depth_to_space(
                    head("out_stage3", 4 * b, b, 3, False, inter3))
        return res

    @property
    def out_channels(self) -> Dict[str, int]:
        return {"stage1": 4 * self.base_channels,
                "stage2": 2 * self.base_channels,
                "stage3": 1 * self.base_channels}
