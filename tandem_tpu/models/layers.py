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
import numpy as np
from flax import linen as nn

IntOrTuple = Union[int, Tuple[int, ...]]


def _tup(v: IntOrTuple, n: int) -> Tuple[int, ...]:
    return (v,) * n if isinstance(v, int) else tuple(v)


def conv3d_via_2d(x, kernel, stride, padding):
    """3D convolution decomposed into kd 2D convolutions.

    XLA's TPU lowering of genuine 3D convolutions runs far off the MXU roof;
    folding the depth axis into the batch and summing the kd depth-taps as 2D
    convs recovers 2D-conv throughput (~100x here).

    :param x: (B, D, H, W, I); kernel: (kd, kh, kw, I, O)
    :param stride/padding: 3-tuples (d, h, w)
    """
    B, D, H, W, I = x.shape
    kd, kh, kw, _, O = kernel.shape
    sd, sh, sw = stride
    pd, ph, pw = padding
    xp = jnp.pad(x, ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0)))
    Dp = D + 2 * pd
    D_out = (Dp - kd) // sd + 1

    out = None
    for k in range(kd):
        # Depth slice for tap k: indices k, k+sd, ..., over D_out entries
        sl = jax.lax.slice_in_dim(xp, k, k + sd * (D_out - 1) + 1, sd, axis=1)
        y = jax.lax.conv_general_dilated(
            sl.reshape(B * D_out, H, W, I), kernel[k],
            window_strides=(sh, sw), padding=[(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = y if out is None else out + y
    Ho, Wo = out.shape[1], out.shape[2]
    return out.reshape(B, D_out, Ho, Wo, O)


def _depth_band(kd: int, D_in: int, D_out: int, sd: int, pd: int,
                transpose: bool) -> np.ndarray:
    """0/1 selector S (kd, D_in, D_out): which input depth feeds which output
    depth through tap k. Folding turns the depth axis into a banded channel
    mixing, so a 3D conv becomes ONE fat 2D conv (see conv3d_folded)."""
    S = np.zeros((kd, D_in, D_out), np.float32)
    if not transpose:
        for do in range(D_out):
            for k in range(kd):
                di = sd * do + k - pd
                if 0 <= di < D_in:
                    S[k, di, do] = 1.0
    elif sd == 1:
        # y[o] = e0 x[o-1] + e1 x[o] + e2 x[o+1] (kernel pre-flipped)
        for do in range(D_out):
            for k in range(kd):
                di = do + k - 1
                if 0 <= di < D_in:
                    S[k, di, do] = 1.0
    else:
        # sd=2, output_padding=1: y[2i] = e1 x[i]; y[2i+1] = e0 x[i] + e2 x[i+1]
        for i in range(D_in):
            S[1, i, 2 * i] = 1.0
            S[0, i, 2 * i + 1] = 1.0
            if i + 1 < D_in:
                S[2, i + 1, 2 * i + 1] = 1.0
    return S


def _fold_depth_kernel(kernel, S):
    """(kd, kh, kw, I, O) x (kd, D_in, D_out) -> (kh, kw, D_in*I, D_out*O)."""
    kd, kh, kw, I, O = kernel.shape
    _, D_in, D_out = S.shape
    big = jnp.einsum("kxyio,kde->xydieo", kernel, jnp.asarray(S, kernel.dtype))
    return big.reshape(kh, kw, D_in * I, D_out * O)


def conv3d_folded(x, kernel, stride, padding):
    """Exact 3D convolution as ONE 2D convolution with the depth axis folded
    into channels (block-banded weights).

    The per-tap decomposition (conv3d_via_2d) fixed XLA's 3D-conv lowering
    but still issues kd convs with tiny channel counts (C=8-32) that run far
    below the MXU roof and are launch/bandwidth bound. Folding gives channel
    widths D*C (64-384 across CostRegNet's levels) — the banded zeros waste
    FLOPs the MXU has to spare, and the conv count drops to one.

    :param x: (B, D, H, W, I); kernel: (kd, kh, kw, I, O)
    """
    B, D, H, W, I = x.shape
    kd, kh, kw, _, O = kernel.shape
    sd, sh, sw = stride
    pd, ph, pw = padding
    D_out = (D + 2 * pd - kd) // sd + 1
    big = _fold_depth_kernel(kernel, _depth_band(kd, D, D_out, sd, pd,
                                                 transpose=False))
    xf = x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, D * I)
    y = jax.lax.conv_general_dilated(
        xf, big, window_strides=(sh, sw), padding=[(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    Ho, Wo = y.shape[1], y.shape[2]
    return y.reshape(B, Ho, Wo, D_out, O).transpose(0, 3, 1, 2, 4)


def conv3d_folded_nhwdc(x5, kernel, stride, padding):
    """conv3d_folded operating on the FOLDED layout (B, H, W, D, C) so a
    whole 3D U-Net can stay folded with no per-layer transposes (reshapes
    between (B,H,W,D,C) and (B,H,W,D*C) are views, not data movement)."""
    B, H, W, D, I = x5.shape
    kd, kh, kw, _, O = kernel.shape
    sd, sh, sw = stride
    pd, ph, pw = padding
    D_out = (D + 2 * pd - kd) // sd + 1
    big = _fold_depth_kernel(kernel, _depth_band(kd, D, D_out, sd, pd,
                                                 transpose=False))
    y = jax.lax.conv_general_dilated(
        x5.reshape(B, H, W, D * I), big, window_strides=(sh, sw),
        padding=[(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(B, y.shape[1], y.shape[2], D_out, O)


def deconv3d_folded_nhwdc(x5, kernel, stride, padding, output_padding):
    """deconv3d_folded on the folded (B, H, W, D, C) layout."""
    B, H, W, D, I = x5.shape
    kd, kh, kw, _, O = kernel.shape
    sd, sh, sw = stride
    pd, ph, pw = padding
    od, oh, ow = output_padding
    assert kd == 3 and pd == 1, "CostRegNet deconv configuration"
    D_out = D if sd == 1 else 2 * D
    big = _fold_depth_kernel(kernel, _depth_band(kd, D, D_out, sd, pd,
                                                 transpose=True))
    y = _deconv2d(x5.reshape(B, H, W, D * I), big, (sh, sw), (ph, pw),
                  (oh, ow))
    return y.reshape(B, y.shape[1], y.shape[2], D_out, O)


def deconv3d_folded(x, kernel, stride, padding, output_padding):
    """Exact 3D transposed convolution as one 2D transposed conv with the
    depth axis folded into banded channels (see conv3d_folded; kernel is
    stored pre-flipped, depth included, like deconv3d_via_2d)."""
    B, D, H, W, I = x.shape
    kd, kh, kw, _, O = kernel.shape
    sd, sh, sw = stride
    pd, ph, pw = padding
    od, oh, ow = output_padding
    assert kd == 3 and pd == 1, "CostRegNet deconv configuration"
    D_out = D if sd == 1 else 2 * D
    big = _fold_depth_kernel(kernel, _depth_band(kd, D, D_out, sd, pd,
                                                 transpose=True))
    xf = x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, D * I)
    y = _deconv2d(xf, big, (sh, sw), (ph, pw), (oh, ow))
    Ho, Wo = y.shape[1], y.shape[2]
    return y.reshape(B, Ho, Wo, D_out, O).transpose(0, 3, 1, 2, 4)


def _deconv2d(x, kernel, stride_hw, pad_hw, outpad_hw):
    """2D transposed conv via input-dilated correlation; kernel is stored
    pre-flipped (see DeconvBnRelu)."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    (sh, sw), (ph, pw), (oh, ow) = stride_hw, pad_hw, outpad_hw
    pad = [(kh - 1 - ph, kh - 1 - ph + oh), (kw - 1 - pw, kw - 1 - pw + ow)]
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=pad, lhs_dilation=(sh, sw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def deconv3d_via_2d(x, kernel, stride, padding, output_padding):
    """3D transposed conv decomposed into 2D transposed convs.

    Supports the CostRegNet cases: kernel 3, depth stride 1 or 2 with
    padding 1 and output_padding (stride-1). kernel: (3, kh, kw, I, O),
    spatially pre-flipped (including the depth axis).
    """
    B, D, H, W, I = x.shape
    kd, kh, kw, _, O = kernel.shape
    sd, sh, sw = stride
    pd, ph, pw = padding
    od, oh, ow = output_padding
    assert kd == 3 and pd == 1, "CostRegNet deconv configuration"
    e0, e1, e2 = kernel[0], kernel[1], kernel[2]

    def d2(xs, k):
        y = _deconv2d(xs.reshape(B * D, H, W, I), k, (sh, sw), (ph, pw),
                      (oh, ow))
        return y.reshape(B, D, y.shape[1], y.shape[2], O)

    if sd == 1:
        assert od == 0
        # 3-tap depth conv: y[o] = e0 x[o-1] + e1 x[o] + e2 x[o+1]
        y1 = d2(x, e1)
        y0 = d2(x, e0)
        y2 = d2(x, e2)
        z = jnp.zeros_like(y1[:, :1])
        return (jnp.concatenate([z, y0[:, :-1]], 1) + y1
                + jnp.concatenate([y2[:, 1:], z], 1))
    assert sd == 2 and od == 1
    # y[2i] = e1 * x[i]; y[2i+1] = e0 * x[i] + e2 * x[i+1]
    y_even = d2(x, e1)
    y_odd_a = d2(x, e0)
    x_next = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], 1)
    y_odd = y_odd_a + d2(x_next, e2)
    Ho, Wo = y_even.shape[2], y_even.shape[3]
    inter = jnp.stack([y_even, y_odd], axis=2)  # (B, D, 2, Ho, Wo, O)
    return inter.reshape(B, 2 * D, Ho, Wo, O)


def space_to_depth(x, f: int = 2):
    """(B, H, W, C) -> (B, H/f, W/f, f*f*C); channel order (qy, qx, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // f, f, W // f, f, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // f, W // f, f * f * C)


def depth_to_space(x, f: int = 2):
    """Inverse of space_to_depth."""
    B, Hp, Wp, Cp = x.shape
    C = Cp // (f * f)
    x = x.reshape(B, Hp, Wp, f, f, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, Hp * f, Wp * f, C)


def _patch_selector(K: int, s: int, p: int, f_in: int, f_out: int):
    """Per-dimension 0/1 selector S[Kp, f_in, f_out, K] mapping an original
    conv tap k to patched tap m / input sub-position r / output sub-position
    q, plus (patch padding pp, patch stride sp). Brute-force over the pixel
    arithmetic: output pixel o = s*(f_out*P + q) reads input pixel
    i = o + k - p, which lives in input patch floor(i/f_in), sub i%f_in."""
    sp, rem = divmod(s * f_out, f_in)
    assert rem == 0, (K, s, f_in, f_out)
    hits = []
    for q in range(f_out):
        for k in range(K):
            i = s * q + k - p
            hits.append((i // f_in, i % f_in, q, k))
    pp = max(0, -min(m for m, _, _, _ in hits))
    Kp = max(m for m, _, _, _ in hits) + pp + 1
    S = np.zeros((Kp, f_in, f_out, K), np.float32)
    for m, r, q, k in hits:
        S[m + pp, r, q, k] = 1.0
    return S, pp, sp


def _patch_kernel(kernel, f_in: int, f_out: int, stride, padding):
    """(kh, kw, I, O) -> patched kernel (Kph, Kpw, f_in^2*I, f_out^2*O)
    with (ry, rx, c) / (qy, qx, c) channel orders, plus (pp, sp) per dim."""
    kh, kw, I, O = kernel.shape
    Sh, pph, sph = _patch_selector(kh, stride[0], padding[0], f_in, f_out)
    Sw, ppw, spw = _patch_selector(kw, stride[1], padding[1], f_in, f_out)
    big = jnp.einsum("arqk,bsgl,klio->abrsiqgo", jnp.asarray(Sh, kernel.dtype),
                     jnp.asarray(Sw, kernel.dtype), kernel)
    big = big.reshape(Sh.shape[0], Sw.shape[0], f_in * f_in * I,
                      f_out * f_out * O)
    return big, (pph, ppw), (sph, spw)


def _deconv_patch_selector():
    """Per-dim 0/1 selector Sd[m, q, t] for a stride-2 K=3 p=1 op=1
    transposed conv emitting f=2 patched output: y[2P+q] reads the
    (pre-flipped) tap t of input pixel P+m. Derived from the dilated
    correlation y[o] = sum_t W'[t] xd[o+t-1], xd[2i]=x[i]:
    y[2P]   = W'[1] x[P]
    y[2P+1] = W'[0] x[P] + W'[2] x[P+1]."""
    Sd = np.zeros((2, 2, 3), np.float32)
    Sd[0, 0, 1] = 1.0
    Sd[0, 1, 0] = 1.0
    Sd[1, 1, 2] = 1.0
    return Sd


def deconv2d_patched_out(x, kernel):
    """Stride-2 K=3 p=1 op=1 2D transposed conv (pre-flipped kernel, the
    CostRegNet configuration) emitting f=2 space-to-depth patched output:
    (B, H, W, I) -> (B, H, W, 4*O). A transposed conv viewed per output
    sub-position is a tiny stride-1 conv, so in patched layout the whole
    upsample is ONE dense 2x2 conv — no lhs_dilation, which XLA lowers
    poorly on TPU."""
    kh, kw, I, O = kernel.shape
    assert kh == kw == 3
    Sd = jnp.asarray(_deconv_patch_selector(), kernel.dtype)
    big = jnp.einsum("aqk,bgl,klio->abiqgo", Sd, Sd, kernel)
    big = big.reshape(2, 2, I, 4 * O)
    return jax.lax.conv_general_dilated(
        x, big, window_strides=(1, 1), padding=[(0, 1), (0, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv2d_patched(x, kernel, stride, padding, f_in: int = 2,
                   f_out: int = 1):
    """Exact 2D convolution evaluated in space-to-depth ("patched") layout.

    TPU convs with 3-32 channels run ~40x off the MXU roof: the 128-wide
    lane/contraction dims sit mostly empty. Rearranging f x f pixel blocks
    into channels (space_to_depth) makes every FeatureNet conv a 32-128
    channel conv at 1/f^2 the spatial positions — the same trick
    conv3d_folded plays on the depth axis. The patched kernel is a 0/1
    placement of the original taps (see _patch_selector), so the math is
    exactly the original convolution.

    :param x: (B, H/f_in, W/f_in, f_in^2*I) patched input
    :param kernel: original (kh, kw, I, O)
    :param stride/padding: ORIGINAL full-resolution conv parameters
    :param f_out: 1 -> plain (B, Ho, Wo, O) output; f -> patched output
    """
    big, pp, sp = _patch_kernel(kernel, f_in, f_out, stride, padding)
    y = jax.lax.conv_general_dilated(
        x, big, window_strides=sp,
        padding=[(pp[0], pp[0]), (pp[1], pp[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # Patch padding can exceed the original pixel padding by up to one
    # patch, over-producing trailing rows computed from pure zero padding
    # (e.g. K=3 s=2: 241 patch rows for 240 outputs) — slice to the exact
    # original output extent.
    kh, kw = kernel.shape[:2]
    ho = ((x.shape[1] * f_in + 2 * padding[0] - kh) // stride[0] + 1) // f_out
    wo = ((x.shape[2] * f_in + 2 * padding[1] - kw) // stride[1] + 1) // f_out
    return y[:, :ho, :wo, :]


class _EvalFoldedBN(nn.Module):
    """Inference BatchNorm as one fused per-channel FMA in the compute dtype.

    flax's nn.BatchNorm(dtype=float32) upcasts the whole activation tensor to
    f32 between the bf16 convs — for the memory-bound FeatureNet/CostRegNet
    that doubles the inter-layer traffic. At eval the BN is just
    y = x * (scale/sqrt(var+eps)) + (bias - mean*scale/sqrt(var+eps)); doing
    that f32 math on the (C,) parameter vectors and applying ONE bf16 FMA
    keeps the tensor in bf16 and lets XLA fold it into the conv epilogue.
    Declares the exact same params/batch_stats tree as nn.BatchNorm, so
    checkpoints and the torch converter are unaffected.
    """
    dtype: jnp.dtype = jnp.float32
    tile: int = 1     # apply in a patched layout whose channels = tile * C
    channels: Optional[int] = None   # override (e.g. 1-channel BN applied
                                     # to a squeezed tensor of any shape)

    @nn.compact
    def __call__(self, x):
        c = self.channels or x.shape[-1] // self.tile
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((c,), jnp.float32))
        inv = scale * jax.lax.rsqrt(var.value + 1e-5)
        off = bias - mean.value * inv
        if self.tile > 1:
            inv = jnp.tile(inv, self.tile)
            off = jnp.tile(off, self.tile)
        return x * inv.astype(self.dtype) + off.astype(self.dtype)


def _batch_norm(x, train: bool, dtype, name: str = "bn", tile: int = 1):
    """BatchNorm matching torch semantics; folded bf16 FMA at inference."""
    if train:
        assert tile == 1, "patched layout is an inference-only fast path"
        return nn.BatchNorm(use_running_average=False, momentum=0.9,
                            epsilon=1e-5, dtype=jnp.float32, name=name)(x)
    return _EvalFoldedBN(dtype=dtype, tile=tile, name=name)(x)


class _ConvParams(nn.Module):
    """Parameter holder keeping the ``<parent>/conv/kernel`` tree layout that
    the torch checkpoint converter expects."""
    shape: Tuple[int, ...]
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.variance_scaling(1.0, "fan_in",
                                                       "truncated_normal"),
            self.shape)
        bias = (self.param("bias", nn.initializers.zeros, (self.shape[-1],))
                if self.use_bias else None)
        return kernel, bias


class ConvBnRelu(nn.Module):
    """Conv (2D or 3D by kernel rank) + optional BatchNorm + optional ReLU.

    3D convolutions are decomposed into per-depth-tap 2D convolutions
    (conv3d_via_2d) — XLA's native 3D conv lowering runs ~100x off the MXU
    roof on TPU, the 2D decomposition does not."""
    features: int
    kernel: IntOrTuple
    ndim: int = 2
    stride: IntOrTuple = 1
    padding: IntOrTuple = 0
    relu: bool = True
    normalization: Optional[str] = "batchnorm"
    folded: bool = False        # 3D input in folded (B, H, W, D, C) layout
    f_in: int = 1               # 2D input in space-to-depth patched layout
    f_out: int = 1              # emit space-to-depth patched output
    depth_in: int = 0           # 3D patched-folded: input depth (flat 4D x)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = _tup(self.kernel, self.ndim)
        s = _tup(self.stride, self.ndim)
        p = _tup(self.padding, self.ndim)
        use_norm = self.normalization is not None
        bn_tile = 1
        if self.ndim == 3 and (self.f_in > 1 or self.f_out > 1):
            # Patched-folded: x is (B, H/f, W/f, f^2 * D_in * I); the depth-
            # folded kernel (one banded 2D conv) is further rearranged into
            # space-to-depth layout. Inference only.
            D_in = self.depth_in
            in_feat = x.shape[-1] // (self.f_in * self.f_in * D_in)
            kernel, bias = _ConvParams(k + (in_feat, self.features),
                                       not use_norm, name="conv")()
            D_out = (D_in + 2 * p[0] - k[0]) // s[0] + 1
            big = _fold_depth_kernel(
                kernel.astype(self.dtype),
                _depth_band(k[0], D_in, D_out, s[0], p[0], transpose=False))
            x = conv2d_patched(x.astype(self.dtype), big, s[1:], p[1:],
                               f_in=self.f_in, f_out=self.f_out)
            bn_tile = self.f_out * self.f_out * D_out
            if bias is not None:
                x = x + jnp.tile(bias, bn_tile).astype(self.dtype)
        elif self.ndim == 3:
            in_feat = x.shape[-1]
            kernel, bias = _ConvParams(k + (in_feat, self.features),
                                       not use_norm, name="conv")()
            conv = conv3d_folded_nhwdc if self.folded else conv3d_folded
            x = conv(x.astype(self.dtype), kernel.astype(self.dtype), s, p)
            if bias is not None:
                x = x + bias
        elif self.f_in > 1 or self.f_out > 1:
            in_feat = x.shape[-1] // (self.f_in * self.f_in)
            kernel, bias = _ConvParams(k + (in_feat, self.features),
                                       not use_norm, name="conv")()
            x = conv2d_patched(x.astype(self.dtype),
                               kernel.astype(self.dtype), s, p,
                               f_in=self.f_in, f_out=self.f_out)
            bn_tile = self.f_out * self.f_out
            if bias is not None:
                x = x + jnp.tile(bias, bn_tile).astype(self.dtype)
        else:
            x = nn.Conv(self.features, kernel_size=k, strides=s,
                        padding=[(pi, pi) for pi in p],
                        use_bias=not use_norm, dtype=self.dtype,
                        name="conv")(x)
        if use_norm:
            if self.normalization == "batchnorm":
                x = _batch_norm(x, train, self.dtype, tile=bn_tile)
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
    folded: bool = False        # input in folded (B, H, W, D, C) layout
    f_out: int = 1              # emit space-to-depth patched output (3D,
                                # stride-2 full configuration only)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.ndim
        k = _tup(self.kernel, n)
        s = _tup(self.stride, n)
        p = _tup(self.padding, n)
        op = _tup(self.output_padding, n)
        use_norm = self.normalization is not None
        bn_tile = 1

        in_feat = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            k + (in_feat, self.features))
        if n == 3 and self.f_out > 1:
            # Patched-out transposed conv: folded (B, H, W, D, C) input,
            # (B, H, W, f^2 * 2D * O) space-to-depth output. Inference only.
            assert s == (2, 2, 2) and p == (1, 1, 1) and op == (1, 1, 1)
            B, H, W, D, I = x.shape
            big = _fold_depth_kernel(
                kernel.astype(self.dtype),
                _depth_band(k[0], D, 2 * D, 2, 1, transpose=True))
            y = deconv2d_patched_out(
                x.astype(self.dtype).reshape(B, H, W, D * I), big)
            bn_tile = self.f_out * self.f_out * 2 * D
        elif n == 3:
            deconv = deconv3d_folded_nhwdc if self.folded \
                else deconv3d_folded
            y = deconv(x.astype(self.dtype), kernel.astype(self.dtype),
                       s, p, op)
        else:
            pad = [(k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i])
                   for i in range(n)]
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(1,) * n, padding=pad, lhs_dilation=s,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if not use_norm:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + (jnp.tile(bias, bn_tile).astype(self.dtype)
                     if bn_tile > 1 else bias)
        if use_norm:
            if self.normalization == "batchnorm":
                y = _batch_norm(y, train, self.dtype, tile=bn_tile)
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
