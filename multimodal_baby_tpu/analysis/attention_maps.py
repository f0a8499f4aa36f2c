"""Grad-CAM attention maps for the dual encoder.

Capability parity with the reference's Hook-based implementation
(multimodal/attention_maps.py:83-170): gradient of the image-text similarity
w.r.t. the last conv feature map, channel weights = spatial-mean gradients,
CAM = relu(sum_c alpha_c * activation_c), bicubic upsample to the input
size. In jax this is a direct ``jax.grad`` through the projection head — no
forward/backward hooks needed.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.models.multimodal import l2_normalize


def grad_cam(
    model,
    variables,
    images: jax.Array,       # [B, H, W, 3] normalized float
    text: jax.Array,         # [B, L] (one utterance per image)
    text_len: jax.Array,     # [B]
    out_size: Optional[int] = None,
) -> np.ndarray:
    """Returns saliency maps [B, out_size, out_size] in [0, 1]."""
    out_size = out_size or images.shape[1]

    # encode text once
    text_features, _ = model.apply(
        variables, text, text_len, method="encode_text")

    # feature map from the frozen trunk
    _, feature_map = model.apply(
        variables, images, method="encode_image")
    assert feature_map is not None, \
        "grad-CAM needs a CNN backbone with a spatial feature map"

    def similarity_from_map(fm):
        # re-run the head on the feature map: pooled -> head -> normalize
        def head_fn(m, fm):
            pooled = fm.mean(axis=(1, 2))
            feats = m.vision_encoder.head(pooled)
            if m.cfg.normalize_features:
                feats = l2_normalize(feats, axis=1)
            return (feats * text_features).sum()

        return model.apply(variables, fm, method=head_fn)

    grads = jax.grad(similarity_from_map)(feature_map)  # [B, h, w, C]
    alpha = grads.mean(axis=(1, 2), keepdims=True)      # [B, 1, 1, C]
    cam = jax.nn.relu((alpha * feature_map).sum(-1))    # [B, h, w]
    B, h, w = cam.shape
    cam = jax.image.resize(cam, (B, out_size, out_size), method="bicubic")
    cam = jnp.maximum(cam, 0.0)
    cam_max = cam.reshape(B, -1).max(axis=1).reshape(B, 1, 1)
    cam = jnp.where(cam_max > 0, cam / jnp.maximum(cam_max, 1e-12), cam)
    return np.asarray(cam)


def grad_cam_captioning(
    model,
    variables,
    image: jax.Array,        # [H, W, 3] normalized float (one image)
    text: jax.Array,         # [L] token ids
    text_len: int,
    out_size: Optional[int] = None,
    steps=None,
) -> np.ndarray:
    """Per-token-step grad-CAM for a captioning LM
    (analysis_tools/multimodal_visualization.py:10-62): for each step t,
    the CAM of the token-t cross-entropy w.r.t. the conv feature map.
    Returns [n_steps, out, out] (step 0 has no preceding prediction ->
    zero map, like the reference's None)."""
    from multimodal_baby_tpu.models.losses import lm_cross_entropy

    out_size = out_size or image.shape[0]
    steps = list(range(int(text_len))) if steps is None else list(steps)
    imgs = image[None]
    text_b = jnp.asarray(text)[None]
    len_b = jnp.asarray([text_len], jnp.int32)

    _, feature_map = model.apply(variables, imgs, method="encode_image")

    def step_loss(fm, step):
        def fwd(m, fm, step):
            pooled = fm.mean(axis=(1, 2))
            feats = m.vision_encoder.head(pooled)
            if m.cfg.normalize_features:
                feats = l2_normalize(feats, axis=1)
            _, logits, _ = m.lm_forward(text_b, len_b,
                                        image_features=feats)
            labels, logits = m.lm_labels_and_logits(text_b, logits)
            ce, _ = lm_cross_entropy(logits, labels)
            return ce[0, step]

        return model.apply(variables, fm, step, method=fwd)

    maps = []
    h, w = feature_map.shape[1:3]
    for step in steps:
        if step == 0:
            maps.append(np.zeros((out_size, out_size), np.float32))
            continue
        g = jax.grad(lambda fm: step_loss(fm, step - 1))(feature_map)
        alpha = (-g).mean(axis=(1, 2), keepdims=True)  # -grad: reference
        cam = jax.nn.relu((alpha * feature_map).sum(-1))[0]
        cam = jax.image.resize(cam, (out_size, out_size), method="bicubic")
        cam = jnp.maximum(cam, 0.0)
        m = float(cam.max())
        maps.append(np.asarray(cam / m if m > 0 else cam))
    return np.stack(maps)


def get_attention_overlay(image_01: np.ndarray, attn_map: np.ndarray,
                          blur_sigma: float = 0.02) -> np.ndarray:
    """Blend a [H, W, 3] image in [0,1] with a [H, W] attention map —
    the reference's getAttMap visualization (attention_maps.py:35-80),
    matplotlib-free."""
    a = attn_map.astype(np.float32)
    if blur_sigma > 0:
        # separable gaussian blur in numpy
        radius = max(1, int(3 * blur_sigma * image_01.shape[0]))
        x = np.arange(-radius, radius + 1, dtype=np.float32)
        k = np.exp(-0.5 * (x / (blur_sigma * image_01.shape[0])) ** 2)
        k /= k.sum()
        a = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), 0, a)
        a = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), 1, a)
        rng = a.max() - a.min()
        if rng > 0:
            a = (a - a.min()) / rng
    # simple red-heat overlay
    heat = np.stack([a, np.zeros_like(a), 1.0 - a], axis=-1)
    return (1 - a[..., None]) * image_01 + a[..., None] * heat
