"""Training-time augmentation: color jitter + motion blur in pure JAX.

Replaces the reference's kornia GPU pipeline (cva_mvsnet/models/datasets.py:
26-52 AugmentationPipeline; config keys AUG.* in configs/default.yaml:34-46):
ColorJitter(brightness, contrast, saturation, hue) and RandomMotionBlur
(kernel_size, angle, direction), applied per-view or shared across the views
of a tuple (SAME_ON_VIEWS).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _rgb_to_hsv_hue_shift(img, hue_shift):
    """Cheap hue rotation in YIQ space (avoids full HSV round trip)."""
    y = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    i = (0.596 * img[..., 0] - 0.274 * img[..., 1] - 0.322 * img[..., 2])
    q = (0.211 * img[..., 0] - 0.523 * img[..., 1] + 0.312 * img[..., 2])
    c = jnp.cos(hue_shift)
    s = jnp.sin(hue_shift)
    i2 = c * i - s * q
    q2 = s * i + c * q
    r = y + 0.956 * i2 + 0.621 * q2
    g = y - 0.272 * i2 - 0.647 * q2
    b = y - 1.106 * i2 + 1.703 * q2
    return jnp.stack([r, g, b], -1)


def color_jitter(key, img, brightness=0.05, contrast=0.05, saturation=0.05,
                 hue=0.05):
    """:param img: (..., H, W, 3) in [0, 1]"""
    kb, kc, ks, kh = jax.random.split(key, 4)
    b = 1.0 + jax.random.uniform(kb, (), minval=-brightness, maxval=brightness)
    c = 1.0 + jax.random.uniform(kc, (), minval=-contrast, maxval=contrast)
    s = 1.0 + jax.random.uniform(ks, (), minval=-saturation, maxval=saturation)
    h = jax.random.uniform(kh, (), minval=-hue, maxval=hue) * 2 * jnp.pi

    img = img * b
    mean = jnp.mean(img, axis=(-3, -2, -1), keepdims=True)
    img = (img - mean) * c + mean
    gray = jnp.mean(img, axis=-1, keepdims=True)
    img = (img - gray) * s + gray
    img = _rgb_to_hsv_hue_shift(img, h)
    return jnp.clip(img, 0.0, 1.0)


def motion_blur_kernel(key, kernel_size=11, angle_deg=70.0, direction=0.5):
    """Random oriented line kernel (kornia RandomMotionBlur semantics:
    random angle in +-angle_deg, direction biases the kernel asymmetry)."""
    ka, kd = jax.random.split(key)
    ang = jax.random.uniform(ka, (), minval=-angle_deg, maxval=angle_deg)
    ang = ang * jnp.pi / 180.0
    dirn = jax.random.uniform(kd, (), minval=-direction, maxval=direction)

    k = kernel_size
    r = (k - 1) / 2.0
    ys, xs = jnp.meshgrid(jnp.arange(k) - r, jnp.arange(k) - r, indexing="ij")
    # Distance from the blur line through the origin at angle `ang`
    dist = jnp.abs(-jnp.sin(ang) * xs + jnp.cos(ang) * ys)
    along = jnp.cos(ang) * xs + jnp.sin(ang) * ys
    on_line = jnp.maximum(0.0, 1.0 - dist)
    weights = on_line * (1.0 + dirn * along / jnp.maximum(r, 1.0))
    weights = jnp.maximum(weights, 0.0)
    return weights / jnp.maximum(weights.sum(), 1e-8)


def motion_blur(key, img, kernel_size=11, angle_deg=70.0, direction=0.5):
    """:param img: (H, W, 3)"""
    kern = motion_blur_kernel(key, kernel_size, angle_deg, direction)
    k = kernel_size
    pad = k // 2
    out = jax.lax.conv_general_dilated(
        img[None].transpose(0, 3, 1, 2),
        jnp.broadcast_to(kern, (3, 1, k, k)),
        window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
        feature_group_count=3,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out[0].transpose(1, 2, 0)


@partial(jax.jit, static_argnames=("same_on_views", "any_aug",
                                   "color_jitter_params",
                                   "motion_blur_params"))
def augment_batch(key, batch: Dict, same_on_views: bool = False,
                  any_aug: bool = True,
                  color_jitter_params: Tuple = (0.05, 0.05, 0.05, 0.05),
                  motion_blur_params: Tuple = (11, 70.0, 0.5)):
    """:param batch: dict with 'image' (B, V, 3, H, W); returns a copy with
    augmented images (other keys untouched)."""
    if not any_aug:
        return batch
    image = batch["image"]
    B, V = image.shape[:2]
    img = jnp.transpose(image, (0, 1, 3, 4, 2))  # (B, V, H, W, 3)

    n_keys = B if same_on_views else B * V
    keys = jax.random.split(key, 2 * n_keys).reshape(n_keys, 2, 2)

    def aug_one(k2, im):
        im = color_jitter(k2[0], im, *color_jitter_params)
        im = motion_blur(k2[1], im, int(motion_blur_params[0]),
                         motion_blur_params[1], motion_blur_params[2])
        return im

    if same_on_views:
        out = jax.vmap(lambda k2, ims: jax.vmap(
            lambda im: aug_one(k2, im))(ims))(keys, img)
    else:
        flat = img.reshape(B * V, *img.shape[2:])
        out = jax.vmap(aug_one)(keys, flat).reshape(img.shape)

    out = jnp.transpose(out, (0, 1, 4, 2, 3))
    new_batch = dict(batch)
    new_batch["image"] = out
    return new_batch
