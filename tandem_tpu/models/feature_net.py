"""FeatureNet: 3-scale 2D feature pyramid (FPN).

Parity target: cva_mvsnet/models/module.py:435-531. Downsampling tower
(conv0 3x3x2, conv1 5x5s2+3x3+3x3, conv2 5x5s2+3x3+3x3), nearest-neighbour
upsampling with 1x1 skip convolutions, per-stage output convs:
stage1 1x1 (no bias), stage2/stage3 3x3 (no bias). Output channels are
{stage1: 4*base, stage2: 2*base, stage3: base} at scales {1/4, 1/2, 1}.
NHWC layout throughout.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBnRelu, upsample_nearest_2x


class FeatureNet(nn.Module):
    base_channels: int = 8
    normalization: str = "batchnorm"
    last_stage: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
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

    @property
    def out_channels(self) -> Dict[str, int]:
        return {"stage1": 4 * self.base_channels,
                "stage2": 2 * self.base_channels,
                "stage3": 1 * self.base_channels}
