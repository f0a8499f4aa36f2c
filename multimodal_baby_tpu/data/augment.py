"""On-device, jittable image augmentation + normalization.

The reference augments per-item on host workers with PIL
(RandomResizedCrop(scale=(0.2, 1)) + GaussianBlur(sigma U(0.1, 2)) p=0.5 +
RandomHorizontalFlip; multimodal_data_module.py:244-255). On TPU that host
work is the throughput ceiling, so here the host ships raw uint8 frames and
the whole augmentation pipeline runs batched on device inside the train-step
jit.

TPU-first formulation: every augmentation here is LINEAR per image, so the
whole pipeline is expressed as batched separable matmuls that run on the
MXU instead of gathers/shifted adds on the VPU:

- random resized crop  -> per-image bilinear interpolation matrices
  (Ry [out, H], Cx [out, W]) built from the sampled crop boxes;
- horizontal flip      -> folded into the column coordinates (free);
- Gaussian blur        -> per-image band matrices (identity when the
  per-image coin flip says no blur).

Measured on v5e at B=256: 21.6 ms (gather + shifted-add version) ->
matmul form is a few ms (4 einsums, ~136 GFLOP, MXU-bound).

Sampling distributions match torchvision (area scale uniform, log-uniform
aspect ratio, bound-clipped instead of reject-resampled; sigma U(0.1, 2)).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.core.constants import (
    IMAGENET_MEAN, IMAGENET_STD)


def normalize_image(x: jax.Array, mean=IMAGENET_MEAN, std=IMAGENET_STD
                    ) -> jax.Array:
    """uint8/float [..., H, W, 3] -> ImageNet-normalized float32."""
    x = x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 \
        else x.astype(jnp.float32)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def _sample_crop_box(key: jax.Array, hw: Tuple[int, int],
                     scale=(0.2, 1.0), ratio=(3 / 4, 4 / 3)) -> jax.Array:
    H, W = hw
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = H * W * jax.random.uniform(k1, (), minval=scale[0],
                                      maxval=scale[1])
    log_ratio = jax.random.uniform(
        k2, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_ratio)
    w = jnp.clip(jnp.sqrt(area * r), 8.0, float(W))
    h = jnp.clip(jnp.sqrt(area / r), 8.0, float(H))
    y0 = jax.random.uniform(k3, ()) * (H - h)
    x0 = jax.random.uniform(k4, ()) * (W - w)
    return jnp.stack([y0, x0, h, w])


def _interp_matrices(coords: jax.Array, in_size: int) -> jax.Array:
    """coords: [B, out] float source positions -> bilinear interpolation
    matrices [B, out, in_size] (rows sum to 1; edge-clamped).

    No normalize pass: callers clip coords to [0, in_size-1], so each row
    is either one tap of weight 1 (integer/clamped coord) or two taps
    (1-frac, frac) summing to 1 exactly — the division it replaced was a
    mathematical no-op costing a reduce + divide over [B, out, in]."""
    grid = jnp.arange(in_size, dtype=jnp.float32)
    return jnp.maximum(
        0.0, 1.0 - jnp.abs(coords[:, :, None] - grid[None, None, :]))


_BLUR_RADIUS = 6  # 13-tap band, like a radius-6 discrete kernel


def _blur_matrices(key_p, key_s, batch: int, size: int,
                   dtype=jnp.float32) -> jax.Array:
    """Per-image Gaussian band matrices [B, size, size]; identity for the
    ~half of the batch that skips the blur (p=0.5, sigma ~ U(0.1, 2)).

    The band value at (p, q) depends only on q - p, so the whole matrix
    is determined by 13 taps per image: compute exp on [B, 13] (not the
    dense [B, s, s] the first version paid for), normalize per row
    against the edge-truncated tap sum (rows within RADIUS of the
    boundary lose taps), and materialize the dense matrix with the
    Toeplitz pad-and-reshift trick — row p of a width-(size+1) buffer,
    flattened, lands its taps at columns p-R..p+R of the dense view.
    One dense pass total, no dense transcendentals/reductions."""
    R = _BLUR_RADIUS
    sigmas = jax.random.uniform(key_s, (batch,), minval=0.1, maxval=2.0)
    do_blur = jax.random.bernoulli(key_p, 0.5, (batch,))
    if size <= 2 * R:
        # toy sizes: the Toeplitz row stride (size + 1) cannot hold the
        # 13-tap band; the dense construction is negligible here
        grid = jnp.arange(size, dtype=jnp.float32)
        d = grid[None, :, None] - grid[None, None, :]
        g = jnp.exp(-0.5 * (d / sigmas[:, None, None]) ** 2)
        g = jnp.where(jnp.abs(d) > float(R), 0.0, g)
        g = g / g.sum(-1, keepdims=True)
        eye = jnp.eye(size)[None]
        return jnp.where(do_blur[:, None, None], g, eye).astype(dtype)
    k = jnp.arange(-R, R + 1, dtype=jnp.float32)            # [13]
    band = jnp.exp(-0.5 * (k[None, :] / sigmas[:, None]) ** 2)  # [B, 13]
    band = jnp.where(do_blur[:, None], band,
                     (k == 0.0).astype(jnp.float32)[None])  # identity rows
    # row p keeps taps with 0 <= p + k < size
    p = jnp.arange(size, dtype=jnp.float32)
    valid = ((p[:, None] + k[None, :] >= 0.0)
             & (p[:, None] + k[None, :] <= size - 1.0))     # [s, 13]
    nb = band[:, None, :] * valid[None]                     # [B, s, 13]
    nb = (nb / nb.sum(-1, keepdims=True)).astype(dtype)
    # Toeplitz: nb[b, p, k] belongs at dense[b, p, p - R + k]; with row
    # stride size + 1, flat(p, k) = p*(size+1) + k = p*size + (p - R + k)
    # + R, so the dense view is the flat buffer shifted by R.
    buf = jnp.pad(nb, ((0, 0), (0, 0), (0, size + 1 - (2 * R + 1))))
    flat = buf.reshape(batch, size * (size + 1))
    return flat[:, R:R + size * size].reshape(batch, size, size)


def space_to_depth(x: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, H/2, W/2, 4C] in (i, j, c) channel order —
    the layout the s2d stem consumes (models/vision_resnext.py)."""
    b, h, w, c = x.shape
    xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(
        b, h // 2, w // 2, 4 * c)


@functools.partial(jax.jit,
                   static_argnames=("out_size", "augment", "dtype", "s2d"))
def augment_batch(
    key: jax.Array,
    images: jax.Array,  # [B, H, W, 3] uint8
    out_size: int = 224,
    augment: bool = True,
    dtype=jnp.float32,
    s2d: bool = False,
) -> jax.Array:
    """Full train-time pipeline: RandomResizedCrop + GaussianBlur(p=.5) +
    HFlip + ImageNet normalize. Returns [B, out, out, 3] in ``dtype``
    (pass bf16 on the train hot path: the trunk computes in bf16 anyway,
    and the normalize affine fuses into the last resample matmul).

    s2d=True emits the space-to-depth layout [B, out/2, out/2, 12]
    ((i, j, c) channel order) that the 4x4 stem consumes — FOR FREE on
    the augmented path: the composed row/col resample matrices are
    sliced into even/odd output taps (pure row slicing) and the 4
    half-sized einsums write the s2d slots directly, so no layout
    transpose ever touches the image tensor (the transpose was what
    sank the round-3 MMB_S2D_STEM experiment, BENCH_NOTES)."""
    B, H, W, _ = images.shape
    if not augment:
        if (H, W) == (out_size, out_size):
            x = normalize_image(images).astype(dtype)
        else:
            x = images.astype(jnp.float32)
            if images.dtype == jnp.uint8:
                x = x / 255.0
            x = jax.image.resize(
                x, (B, out_size, out_size, 3), method="bilinear")
            x = normalize_image(x).astype(dtype)
        # eval/init path is not perf-critical: explicit transpose is fine
        return space_to_depth(x) if s2d else x

    k_crop, k_blur_p, k_blur_s, k_flip = jax.random.split(key, 4)

    boxes = jax.vmap(
        lambda k: _sample_crop_box(k, (H, W)))(
            jax.random.split(k_crop, B))          # [B, 4] = y0, x0, h, w
    y0, x0, h, w = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]

    o = jnp.arange(out_size, dtype=jnp.float32) + 0.5
    ys = y0[:, None] + o[None, :] * (h / out_size)[:, None] - 0.5
    xs = x0[:, None] + o[None, :] * (w / out_size)[:, None] - 0.5
    # fold the horizontal flip into the column coordinates
    do_flip = jax.random.bernoulli(k_flip, 0.5, (B,))
    xs = jnp.where(do_flip[:, None], xs[:, ::-1], xs)

    ry = _interp_matrices(jnp.clip(ys, 0.0, H - 1.0), H)   # [B, out, H]
    cx = _interp_matrices(jnp.clip(xs, 0.0, W - 1.0), W)   # [B, out, W]
    gy = _blur_matrices(k_blur_p, k_blur_s, B, out_size,
                        dtype=jnp.bfloat16)                # [B, out, out]

    # compose blur into the interpolation matrices: the image is touched
    # by TWO [out, in] matmuls total instead of four (crop/resize and blur
    # are both linear; same sigma both axes like torchvision).
    # bf16 matrices: coordinates/weights are COMPUTED in f32 (bf16's ~8
    # mantissa bits would misplace pixels), but the materialized per-image
    # matrices are bf16 — resampling weights at 0.4% is below one 8-bit
    # pixel LSB, and it halves the ~300 MB/step of matrix traffic that
    # dominated the augment cost (scripts/perf_frontend.py: construction
    # was 1.0 of the 1.6 ms at B=256)
    ry, cx = (m.astype(jnp.bfloat16) for m in (ry, cx))
    a_row = jnp.einsum("bpo,boh->bph", gy, ry)             # [B, out, H]
    a_col = jnp.einsum("bsq,bqw->bsw", gy, cx)             # [B, out, W]

    f = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        f = f / 255.0
    # bf16 is ample precision for resampling 8-bit pixels; halves traffic
    f = f.astype(jnp.bfloat16)
    # per-channel normalize affine fuses into the einsum epilogue
    mean = jnp.asarray(IMAGENET_MEAN, dtype)
    std = jnp.asarray(IMAGENET_STD, dtype)
    if s2d:
        # even/odd row/col taps as separate half-einsums: x_ij is exactly
        # s2d slot (i, j); channel-concat gives the (i, j, c) order with
        # zero transposes (same total FLOPs as the 2-einsum path)
        rows = [jnp.einsum("bph,bhwc->bpwc", a_row[:, i::2], f)
                for i in range(2)]
        slots = [
            (jnp.einsum("bsw,bpwc->bpsc", a_col[:, j::2],
                        rows[i]).astype(dtype) - mean) / std
            for i in range(2) for j in range(2)]
        return jnp.concatenate(slots, axis=-1)
    if os.environ.get("MMB_AUG_CSPLIT", "0") == "1":
        # per-channel einsums: the batched "bsw,bpwc->bpsc" form makes
        # XLA broadcast a_col across the channel dim ([B,224,3,224]
        # materialized + relayouted, ~2.5 ms/step at B=1024 in the
        # round-4 trace). Splitting c gives plain [B]-batched matmuls
        # (no broadcast operand); the three [B,out,out] results concat
        # into the output tensor that had to be written anyway.
        outs = []
        for ch in range(f.shape[-1]):
            t = jnp.einsum("bph,bhw->bpw", a_row, f[..., ch])
            o = jnp.einsum("bsw,bpw->bps", a_col, t)
            outs.append((o.astype(dtype) - mean[ch]) / std[ch])
        return jnp.stack(outs, axis=-1)
    x = jnp.einsum("bph,bhwc->bpwc", a_row, f)
    x = jnp.einsum("bsw,bpwc->bpsc", a_col, x)
    return (x.astype(dtype) - mean) / std
