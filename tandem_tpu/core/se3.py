"""SE(3)/SO(3) Lie-group operations as pure JAX functions on (..., 4, 4) arrays.

Replaces the reference's Sophus usage (tandem/src/util/NumType.h). All ops are
batched, differentiable, and safe at the small-angle limit (Taylor fallbacks),
so they can sit inside jitted tracker/BA update loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_PREC = lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_PREC)

# Small-angle switch: in float32, 1-cos(theta) and 1-A/(2B) cancel
# catastrophically below theta ~ 3e-3; the Taylor branches are MORE accurate
# there (verified against float64 in test_core).
_EPS = 1e-8


def _hat(w):
    """so(3) hat operator. w: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], -1),
        jnp.stack([wz, z, -wx], -1),
        jnp.stack([-wy, wx, z], -1),
    ], -2)


def so3_exp(w):
    """Rodrigues formula with Taylor fallback. w: (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-5
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = _hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * _mm(W, W)


def so3_log(R):
    """Inverse of so3_exp. R: (..., 3, 3) -> (..., 3)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    theta2 = theta * theta
    small = theta2 < 1e-5
    # w_hat = theta / (2 sin(theta)) * (R - R^T)
    factor = jnp.where(small, 0.5 + theta2 / 12.0,
                       theta / (2.0 * jnp.sin(jnp.where(small, 1.0, theta))))
    skew = (R - jnp.swapaxes(R, -1, -2)) * factor[..., None, None]
    return jnp.stack([skew[..., 2, 1], skew[..., 0, 2], skew[..., 1, 0]], -1)


def se3_exp(xi):
    """se(3) exponential. xi = (..., 6) with (v, w) ordering: translation first
    (matches DSO's [trans, rot] increment ordering). Returns (..., 4, 4)."""
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-5
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / theta2)
    W = _hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = I + A[..., None, None] * W + B[..., None, None] * _mm(W, W)
    V = I + B[..., None, None] * W + C[..., None, None] * _mm(W, W)
    t = jnp.einsum("...ij,...j->...i", V, v, precision=_PREC)
    top = jnp.concatenate([R, t[..., None]], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], -2)


def se3_log(T):
    """Inverse of se3_exp. T: (..., 4, 4) -> (..., 6) with (v, w) ordering."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-5
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    # V^{-1} = I - 1/2 W + (1/theta2)(1 - A/(2B)) W^2
    D = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                  (1.0 - A / (2.0 * B)) / jnp.maximum(theta2, _EPS))
    W = _hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = I - 0.5 * W + D[..., None, None] * _mm(W, W)
    v = jnp.einsum("...ij,...j->...i", Vinv, t, precision=_PREC)
    return jnp.concatenate([v, w], -1)


def se3_inverse(T):
    """(..., 4, 4) rigid-transform inverse without a general solve."""
    R = T[..., :3, :3]
    t = T[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -_mm(Rt, t)], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], -2)


def se3_compose(A, B):
    return _mm(A, B)


def se3_identity(dtype=jnp.float32):
    return jnp.eye(4, dtype=dtype)
