"""VisionEncoder: backbone + projection head.

Parity with the reference VisionEncoder (multimodal/multimodal.py:56-194):
a (usually frozen) self-supervised backbone — ResNeXt-50 32x4d or DINO
ViT-B/14 — plus a trainable projection to the shared embedding space
(Linear for ``flat`` embeddings, 1x1 conv for ``spatial``).

Freezing is expressed TPU-natively: ``stop_gradient`` on the trunk outputs
(so XLA never builds the trunk backward pass) plus an optimizer mask in
``train.optimizer`` (so frozen params get no AdamW state). This replaces the
reference's ``requires_grad=False`` loop (multimodal.py:39-43).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax

from multimodal_baby_tpu.core.config import ModelConfig
from multimodal_baby_tpu.models.layers import TorchLinear
from multimodal_baby_tpu.models.vision_resnext import ResNeXt50
from multimodal_baby_tpu.models.vision_vit import vit_base


class TinyConvNet(nn.Module):
    """Minimal CNN trunk for unit tests and multi-chip dry-runs: same output
    contract as ResNeXt50 (pooled + spatial feature map) at negligible cost.
    Not part of the reference inventory — test infrastructure only."""

    features: int = 32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        y = nn.Conv(self.features, (8, 8), strides=(8, 8), name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.features, (4, 4), strides=(4, 4), name="conv2")(y)
        y = nn.relu(y)
        return {"pooled": y.mean(axis=(1, 2)), "feature_map": y}


class VisionEncoder(nn.Module):
    cfg: ModelConfig
    dtype: Any = None  # compute dtype for the trunk (bf16 on hot path)

    @property
    def last_out_dim(self) -> int:
        return self.cfg.vision.last_out_dim

    def setup(self):
        v = self.cfg.vision
        if v.backbone == "toy":
            self.backbone = TinyConvNet(name="backbone")
        elif v.vit_dino:
            # MMB_VIT_INT8=1: int8 MXU matmuls for the 48 frozen block
            # Denses (2x MXU rate — perf_xla_int8.py: 317 vs 201 T/s).
            # Refused when finetuning: int8_dense has zero gradient.
            vit_int8 = os.environ.get("MMB_VIT_INT8", "0") == "1"
            # MMB_VIT_LNFOLD=1: LayerNorm gamma/beta fold into the
            # adjacent qkv/fc1 kernels (hoisted constants; LNs become
            # pure normalizes). Frozen-trunk only: the fold stops
            # gradients through the folded kernels by construction.
            vit_lnfold = os.environ.get("MMB_VIT_LNFOLD", "0") == "1"
            if (vit_int8 or vit_lnfold) and v.finetune_cnn:
                raise ValueError(
                    "MMB_VIT_INT8/MMB_VIT_LNFOLD require a frozen ViT "
                    "trunk (finetune_cnn=False): the int8 matmul path is "
                    "non-differentiable and the LN-fold stops gradients.")
            self.backbone = vit_base(patch_size=14, dtype=self.dtype,
                                     int8=vit_int8, lnfold=vit_lnfold)
        else:
            # dense_groups: grouped-conv layout reshapes eliminated; safe
            # only when the trunk is frozen (see BottleneckX docstring)
            self.backbone = ResNeXt50(
                name="backbone", dtype=self.dtype,
                dense_groups=not v.finetune_cnn,
                trunk_int8=v.trunk_int8)

        if self.cfg.embedding_type == "flat":
            self.head = TorchLinear(self.last_out_dim, self.cfg.embedding_dim)
        elif self.cfg.embedding_type == "spatial":
            assert not v.vit_dino, \
                "spatial embeddings require the CNN backbone"
            # 1x1 conv mapping 2048 -> embedding_dim (multimodal.py:181-185);
            # on NHWC maps this is exactly a Dense on the channel dim
            self.head = TorchLinear(self.last_out_dim, self.cfg.embedding_dim)
        else:
            raise ValueError(self.cfg.embedding_type)

    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """x: [B, 224, 224, 3] NHWC, ImageNet-normalized.

        Returns (features, feature_map):
          flat:    features [B, E];       feature_map [B, 7, 7, 2048] (CNN)
          spatial: features [B, 7, 7, E]; feature_map [B, 7, 7, 2048]
        ViT has no spatial map (reference returns None, multimodal.py:89-93).
        """
        v = self.cfg.vision
        if v.vit_dino:
            cls = self.backbone(x)
            if not v.finetune_cnn:
                cls = jax.lax.stop_gradient(cls)
            return self.head(cls), None

        # frozen trunk may run BN on running averages (frozen_bn="running")
        bn_train = train and (v.finetune_cnn or v.frozen_bn == "batch")
        out = self.backbone(x, train=bn_train)
        pooled, feature_map = out["pooled"], out["feature_map"]
        if not v.finetune_cnn:
            pooled = jax.lax.stop_gradient(pooled)
            feature_map = jax.lax.stop_gradient(feature_map)

        if self.cfg.embedding_type == "flat":
            return self.head(pooled), feature_map
        return self.head(feature_map), feature_map
