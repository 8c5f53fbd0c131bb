"""Conv/Deconv + BatchNorm + ReLU building blocks (flax, NHWC/NDHWC).

Semantics match the reference wrappers (cva_mvsnet/models/module.py:64-284):
- conv bias only when normalization is disabled,
- BatchNorm momentum 0.1 (torch) == flax momentum 0.9, eps 1e-5,
- Deconv reproduces torch ConvTranspose{2,3}d(stride, padding, output_padding)
  exactly via an input-dilated convolution with a spatially flipped kernel.

Kernels are stored in JAX layout ``(*spatial, in, out)``; the torch checkpoint
converter (torch_convert.py) handles the transpose/flip.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

IntOrTuple = Union[int, Tuple[int, ...]]


def _tup(v: IntOrTuple, n: int) -> Tuple[int, ...]:
    return (v,) * n if isinstance(v, int) else tuple(v)


class ConvBnRelu(nn.Module):
    """Conv (2D or 3D by kernel rank) + optional BatchNorm + optional ReLU."""
    features: int
    kernel: IntOrTuple
    ndim: int = 2
    stride: IntOrTuple = 1
    padding: IntOrTuple = 0
    relu: bool = True
    normalization: Optional[str] = "batchnorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = _tup(self.kernel, self.ndim)
        s = _tup(self.stride, self.ndim)
        p = _tup(self.padding, self.ndim)
        use_norm = self.normalization is not None
        x = nn.Conv(self.features, kernel_size=k, strides=s,
                    padding=[(pi, pi) for pi in p],
                    use_bias=not use_norm, dtype=self.dtype, name="conv")(x)
        if use_norm:
            if self.normalization == "batchnorm":
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
            elif self.normalization == "instancenorm":
                # torch InstanceNorm{2,3}d default: no affine for 2D wrapper,
                # affine=True for the 3D wrapper (module.py:94,202).
                x = _instance_norm(x, affine=self.ndim == 3, mdl=self)
            else:
                raise NotImplementedError(self.normalization)
        if self.relu:
            x = nn.relu(x)
        return x


def _instance_norm(x, affine: bool, mdl: nn.Module):
    red = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x, axis=red, keepdims=True)
    var = jnp.var(x, axis=red, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    if affine:
        c = x.shape[-1]
        scale = mdl.param("in_scale", nn.initializers.ones, (c,))
        bias = mdl.param("in_bias", nn.initializers.zeros, (c,))
        y = y * scale + bias
    return y


class DeconvBnRelu(nn.Module):
    """torch ConvTranspose-Nd equivalent + BatchNorm + ReLU.

    Implemented as ``conv_general_dilated`` with ``lhs_dilation=stride`` and
    per-dim padding ``(k-1-p, k-1-p+output_padding)``. The stored kernel is
    already spatially flipped relative to torch's (converter handles this), so
    at run time it is a plain correlation.
    """
    features: int
    ndim: int = 3
    kernel: IntOrTuple = 3
    stride: IntOrTuple = 2
    padding: IntOrTuple = 1
    output_padding: IntOrTuple = 1
    relu: bool = True
    normalization: Optional[str] = "batchnorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.ndim
        k = _tup(self.kernel, n)
        s = _tup(self.stride, n)
        p = _tup(self.padding, n)
        op = _tup(self.output_padding, n)
        use_norm = self.normalization is not None

        in_feat = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            k + (in_feat, self.features))
        pad = [(k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i]) for i in range(n)]
        dn = {2: ("NHWC", "HWIO", "NHWC"), 3: ("NDHWC", "DHWIO", "NDHWC")}[n]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1,) * n, padding=pad, lhs_dilation=s,
            dimension_numbers=dn)
        if not use_norm:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        if use_norm:
            if self.normalization == "batchnorm":
                y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32, name="bn")(y)
            elif self.normalization == "instancenorm":
                y = _instance_norm(y, affine=self.ndim == 3, mdl=self)
            else:
                raise NotImplementedError(self.normalization)
        if self.relu:
            y = nn.relu(y)
        return y


def upsample_nearest_2x(x):
    """Nearest-neighbour 2x upsample on the two spatial dims of NHWC input
    (torch nn.Upsample(scale_factor=2, mode='nearest') / F.interpolate)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


def interpolate_bilinear(x, out_h: int, out_w: int, align_corners: bool):
    """torch F.interpolate(mode='bilinear') on NHWC input."""
    B, H, W, C = x.shape
    if align_corners:
        ys = jnp.linspace(0.0, H - 1.0, out_h)
        xs = jnp.linspace(0.0, W - 1.0, out_w)
    else:
        ys = jnp.clip((jnp.arange(out_h) + 0.5) * (H / out_h) - 0.5, 0, H - 1)
        xs = jnp.clip((jnp.arange(out_w) + 0.5) * (W / out_w) - 0.5, 0, W - 1)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0).astype(x.dtype)
    wx = (xs - x0).astype(x.dtype)
    top = x[:, y0][:, :, x0] * (1 - wx)[None, None, :, None] \
        + x[:, y0][:, :, x1] * wx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * (1 - wx)[None, None, :, None] \
        + x[:, y1][:, :, x1] * wx[None, None, :, None]
    return top * (1 - wy)[None, :, None, None] + bot * wy[None, :, None, None]
