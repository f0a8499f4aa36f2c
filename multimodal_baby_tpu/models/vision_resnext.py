"""ResNeXt-50 (32x4d) backbone in flax, NHWC layout.

Architecture-equivalent to ``torchvision.models.resnext50_32x4d`` so the
DINO-SAYCam / TC pretrained checkpoints convert 1:1 (reference loads them in
multimodal/multimodal.py:128-173 via multimodal/utils.py:145-214).

TPU-first choices:
- NHWC layout end to end (native for TPU convolutions; no transposes).
- Grouped convs map directly onto ``feature_group_count`` and tile onto the
  MXU.
- BatchNorm semantics mirror the reference's frozen-CNN quirk: the reference
  keeps the frozen CNN in train() mode (SURVEY.md section 7.3), i.e. BN uses
  *batch* statistics during training while running buffers keep updating.
  ``train=True`` reproduces that; ``train=False`` uses running averages
  (eval / embedding-parity mode).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# stage definition for resnext50_32x4d: (planes, num_blocks, stride)
RESNEXT50_STAGES: Sequence[Tuple[int, int, int]] = (
    (64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2),
)
EXPANSION = 4


def _bn(name: str, use_running_average: bool, dtype=None) -> nn.BatchNorm:
    # torch BatchNorm2d defaults: eps 1e-5, momentum 0.1 (flax momentum 0.9)
    return nn.BatchNorm(
        name=name, use_running_average=use_running_average,
        momentum=0.9, epsilon=1e-5, dtype=dtype)


class BottleneckX(nn.Module):
    """torchvision Bottleneck with groups=32, base_width=4."""

    planes: int
    stride: int = 1
    groups: int = 32
    base_width: int = 4
    has_downsample: bool = False
    dtype: Any = None  # compute dtype (bf16 on the train hot path)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * EXPANSION
        ura = not train
        dt = self.dtype

        identity = x
        y = nn.Conv(width, (1, 1), use_bias=False, name="conv1", dtype=dt)(x)
        y = _bn("bn1", ura, dt)(y)
        y = nn.relu(y)
        y = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                    padding=1, feature_group_count=self.groups,
                    use_bias=False, name="conv2", dtype=dt)(y)
        y = _bn("bn2", ura, dt)(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3", dtype=dt)(y)
        y = _bn("bn3", ura, dt)(y)

        if self.has_downsample:
            identity = nn.Conv(
                out_ch, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv", dtype=dt)(x)
            identity = _bn("downsample_bn", ura, dt)(identity)

        return nn.relu(y + identity)


class ResNeXt50(nn.Module):
    """Trunk only (no classifier head). Returns pooled [B, 2048] features and
    the layer4 feature map [B, 7, 7, 2048] — the reference captures the
    latter with a forward Hook (multimodal/multimodal.py:88-104); here it is
    simply a second output.

    ``dtype`` is the compute dtype: params stay f32, convs/BN run in bf16 on
    the train hot path (MXU-native); None = full f32 (parity/eval mode)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Dict[str, jax.Array]:
        ura = not train
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, name="conv1", dtype=dt)(x)
        y = _bn("bn1", ura, dt)(y)
        y = nn.relu(y)
        # torch MaxPool2d(3, stride=2, padding=1)
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        y = nn.max_pool(y, (3, 3), strides=(2, 2))

        in_ch = 64
        for stage_idx, (planes, blocks, stride) in enumerate(RESNEXT50_STAGES):
            for block_idx in range(blocks):
                s = stride if block_idx == 0 else 1
                needs_ds = block_idx == 0 and (
                    s != 1 or in_ch != planes * EXPANSION)
                y = BottleneckX(
                    planes=planes, stride=s, has_downsample=needs_ds,
                    dtype=dt,
                    name=f"layer{stage_idx + 1}_{block_idx}")(y, train=train)
                in_ch = planes * EXPANSION

        y = y.astype(jnp.float32)  # back to f32 at the trunk boundary
        feature_map = y  # [B, 7, 7, 2048]
        pooled = jnp.mean(y, axis=(1, 2))  # adaptive avg pool to 1x1
        return {"pooled": pooled, "feature_map": feature_map}
