"""On-device, jittable image augmentation + normalization.

The reference augments per-item on host workers with PIL
(RandomResizedCrop(scale=(0.2, 1)) + GaussianBlur(sigma U(0.1, 2)) p=0.5 +
RandomHorizontalFlip; multimodal_data_module.py:244-255). On TPU that host
work is the throughput ceiling, so here the host ships raw uint8 frames and
the whole augmentation pipeline runs batched on device inside the train-step
jit:

- random resized crop is expressed as a *static-shape* bilinear resample of
  a randomly chosen source window (dynamic crop sizes don't exist under
  XLA), matching torchvision's sampling distributions (area scale uniform,
  log-uniform aspect ratio; bound-clipped instead of reject-resampled);
- Gaussian blur is a separable 13-tap conv with per-image sigma;
- everything is vmapped over the batch and fuses with the normalize.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.core.constants import (
    CLIP_MEAN, CLIP_STD, IMAGENET_MEAN, IMAGENET_STD)


def normalize_image(x: jax.Array, mean=IMAGENET_MEAN, std=IMAGENET_STD
                    ) -> jax.Array:
    """uint8/float [..., H, W, 3] -> ImageNet-normalized float32."""
    x = x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 \
        else x.astype(jnp.float32)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def _bilinear_window_resample(img: jax.Array, box: jax.Array,
                              out_hw: Tuple[int, int]) -> jax.Array:
    """Sample the window ``box = (y0, x0, h, w)`` (float, source pixels) of
    ``img`` [H, W, C] onto a fixed (out_h, out_w) grid, bilinearly."""
    H, W, C = img.shape
    out_h, out_w = out_hw
    y0, x0, h, w = box
    ys = y0 + (jnp.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = x0 + (jnp.arange(out_w) + 0.5) * (w / out_w) - 0.5
    ys = jnp.clip(ys, 0.0, H - 1.0)
    xs = jnp.clip(xs, 0.0, W - 1.0)
    y_lo = jnp.floor(ys).astype(jnp.int32)
    x_lo = jnp.floor(xs).astype(jnp.int32)
    y_hi = jnp.minimum(y_lo + 1, H - 1)
    x_hi = jnp.minimum(x_lo + 1, W - 1)
    wy = (ys - y_lo)[:, None, None]
    wx = (xs - x_lo)[None, :, None]

    f = img.astype(jnp.float32)
    top = f[y_lo][:, x_lo] * (1 - wx) + f[y_lo][:, x_hi] * wx
    bot = f[y_hi][:, x_lo] * (1 - wx) + f[y_hi][:, x_hi] * wx
    return top * (1 - wy) + bot * wy


def _sample_crop_box(key: jax.Array, hw: Tuple[int, int],
                     scale=(0.2, 1.0), ratio=(3 / 4, 4 / 3)) -> jax.Array:
    H, W = hw
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = H * W * jax.random.uniform(k1, (), minval=scale[0],
                                      maxval=scale[1])
    log_ratio = jax.random.uniform(
        k2, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_ratio)
    w = jnp.sqrt(area * r)
    h = jnp.sqrt(area / r)
    w = jnp.clip(w, 8.0, float(W))
    h = jnp.clip(h, 8.0, float(H))
    y0 = jax.random.uniform(k3, ()) * (H - h)
    x0 = jax.random.uniform(k4, ()) * (W - w)
    return jnp.stack([y0, x0, h, w])


def _blur_separable(imgs: jax.Array, sigmas: jax.Array,
                    radius: int = 6) -> jax.Array:
    """Batched separable Gaussian blur [B, H, W, C] with per-image sigma."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    # [B, K] per-image kernels
    k = jnp.exp(-0.5 * (x[None, :] / sigmas[:, None]) ** 2)
    k = k / k.sum(axis=1, keepdims=True)

    def conv_axis(im, kern, axis):
        pad = [(0, 0)] * 4
        pad[axis] = (radius, radius)
        p = jnp.pad(im, pad, mode="edge")
        out = jnp.zeros_like(im)
        for i in range(2 * radius + 1):
            sl = [slice(None)] * 4
            sl[axis] = slice(i, i + im.shape[axis])
            out = out + p[tuple(sl)] * kern[:, i][:, None, None, None]
        return out

    y = conv_axis(imgs, k, 1)
    return conv_axis(y, k, 2)


@functools.partial(jax.jit, static_argnames=("out_size", "augment"))
def augment_batch(
    key: jax.Array,
    images: jax.Array,  # [B, H, W, 3] uint8
    out_size: int = 224,
    augment: bool = True,
) -> jax.Array:
    """Full train-time pipeline: RandomResizedCrop + GaussianBlur(p=.5) +
    HFlip + ImageNet normalize. Returns float32 [B, out, out, 3]."""
    B, H, W, _ = images.shape
    if not augment:
        x = images.astype(jnp.float32)
        if (H, W) != (out_size, out_size):
            x = jax.image.resize(
                x, (B, out_size, out_size, 3), method="bilinear")
        return normalize_image(x)

    k_crop, k_blur_p, k_blur_s, k_flip = jax.random.split(key, 4)

    # random resized crop (static output shape)
    boxes = jax.vmap(
        lambda k: _sample_crop_box(k, (H, W)))(
            jax.random.split(k_crop, B))
    x = jax.vmap(
        lambda im, box: _bilinear_window_resample(
            im, box, (out_size, out_size)))(images, boxes)

    # gaussian blur with p=0.5, sigma ~ U(0.1, 2)
    sigmas = jax.random.uniform(k_blur_s, (B,), minval=0.1, maxval=2.0)
    blurred = _blur_separable(x, sigmas)
    do_blur = jax.random.bernoulli(k_blur_p, 0.5, (B,))
    x = jnp.where(do_blur[:, None, None, None], blurred, x)

    # horizontal flip p=0.5
    do_flip = jax.random.bernoulli(k_flip, 0.5, (B,))
    x = jnp.where(do_flip[:, None, None, None], x[:, :, ::-1, :], x)

    return normalize_image(x)
