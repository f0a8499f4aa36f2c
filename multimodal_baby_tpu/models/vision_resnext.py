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


class InferenceBN(nn.Module):
    """Running-average BatchNorm with the multiply folded to a single
    per-channel madd in the input dtype.

    flax's nn.BatchNorm promotes the (bf16) conv output to f32 before
    normalizing, materializing a full f32 copy of every activation tensor —
    profiled at ~10 ms/step of pure converts/copies on the ResNeXt trunk at
    B=256. Here ``mul``/``add`` are computed in f32 on the [C] vectors only
    and applied in bf16, so the whole op fuses into the producing conv.
    Variable structure matches nn.BatchNorm (params scale/bias, batch_stats
    mean/var) so checkpoints interchange."""

    features: int
    epsilon: float = 1e-5

    def setup(self):
        c = self.features
        self.scale = self.param("scale", nn.initializers.ones, (c,))
        self.bias = self.param("bias", nn.initializers.zeros, (c,))
        self.mean = self.variable("batch_stats", "mean",
                                  lambda: jnp.zeros((c,), jnp.float32))
        self.var = self.variable("batch_stats", "var",
                                 lambda: jnp.ones((c,), jnp.float32))

    def fold(self) -> Tuple[jax.Array, jax.Array]:
        """(mul, add) f32 vectors: y = x * mul + add."""
        mul = self.scale * jax.lax.rsqrt(self.var.value + self.epsilon)
        return mul, self.bias - self.mean.value * mul

    def __call__(self, x: jax.Array) -> jax.Array:
        mul, add = self.fold()
        return x * mul.astype(x.dtype) + add.astype(x.dtype)


def _bn(name: str, use_running_average: bool, dtype=None,
        features: int = 0):
    # torch BatchNorm2d defaults: eps 1e-5, momentum 0.1 (flax momentum 0.9)
    if use_running_average:
        return InferenceBN(features=features, name=name)
    return nn.BatchNorm(
        name=name, use_running_average=False,
        momentum=0.9, epsilon=1e-5, dtype=dtype)


class BottleneckX(nn.Module):
    """torchvision Bottleneck with groups=32, base_width=4.

    ``dense_groups`` expands the grouped 3x3 kernel to a dense
    block-diagonal kernel at call time: on TPU the grouped-conv lowering
    inserts [.., 32, 4] layout reshapes around every grouped conv
    (~0.7 ms each at layer1/B=256) that the dense form avoids. The
    parameter stays in its grouped [3, 3, 4, width] form (checkpoints
    unchanged); only safe for frozen trunks (the expansion's off-diagonal
    zeros would receive gradients)."""

    planes: int
    stride: int = 1
    groups: int = 32
    base_width: int = 4
    has_downsample: bool = False
    dtype: Any = None  # compute dtype (bf16 on the train hot path)
    # group packing for conv2: False/32 = true grouped conv; True/1 =
    # full block-diagonal dense; an int g in between packs 32/g groups
    # per super-group (feature_group_count=g, FLOPs x(32/g), fewer
    # grouped-conv layout transitions)
    dense_groups: Any = False
    fused_epilogue: bool = False  # Pallas conv3+bn3+residual+relu kernel

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * EXPANSION
        ura = not train
        dt = self.dtype

        fgc = self._packed_fgc()
        identity = x
        y = nn.Conv(width, (1, 1), use_bias=False, name="conv1", dtype=dt)(x)
        y = _bn("bn1", ura, dt, width)(y)
        y = nn.relu(y)
        if fgc != self.groups:
            y = self._dense_grouped_conv3x3(y, width, dt, fgc)
        else:
            y = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                        padding=1, feature_group_count=self.groups,
                        use_bias=False, name="conv2", dtype=dt)(y)
        y = _bn("bn2", ura, dt, width)(y)
        y = nn.relu(y)

        if self.has_downsample:
            identity = nn.Conv(
                out_ch, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv", dtype=dt)(x)
            identity = _bn("downsample_bn", ura, dt, out_ch)(identity)

        # fused Pallas epilogue (frozen trunks, running-BN): conv3 + bn3 +
        # residual + relu in one pass (ops/conv_epilogue.py). Measured
        # SLOWER than XLA's conv+fusion pipeline on v5e (66 vs 30 ms trunk
        # at B=256) — the naive tiled matmul loses XLA's cross-op
        # pipelining — so it stays opt-in for future tuning.
        if self.fused_epilogue and ura and dt is not None \
                and jax.devices()[0].platform == "tpu":
            from multimodal_baby_tpu.ops.conv_epilogue import (
                conv1x1_bn_residual_relu)
            w3 = _GroupedKernel((1, 1, width, out_ch), name="conv3")()
            mul, add = InferenceBN(out_ch, name="bn3").fold()
            B, Hh, Ww, _ = y.shape
            out = conv1x1_bn_residual_relu(
                y.reshape(B * Hh * Ww, width).astype(dt),
                w3.reshape(width, out_ch).astype(dt),
                mul, add,
                identity.reshape(B * Hh * Ww, out_ch))
            return out.reshape(B, Hh, Ww, out_ch)

        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3", dtype=dt)(y)
        y = _bn("bn3", ura, dt, out_ch)(y)
        return nn.relu(y + identity)

    def _packed_fgc(self) -> int:
        dg = self.dense_groups
        if dg is True:
            return 1
        if dg is False or dg is None:
            return self.groups
        return int(dg)

    def _dense_grouped_conv3x3(self, y, width, dt, fgc: int = 1):
        cg = width // self.groups
        # parameter lives under the same "conv2/kernel" path and grouped
        # shape as the nn.Conv variant, so checkpoints interchange
        w = _GroupedKernel((3, 3, cg, width), name="conv2")()
        if dt is not None:
            w = w.astype(dt)
        # expand [3,3,cg,width] to a block-diagonal masked kernel for
        # feature_group_count=fgc: each super-group spans 32/fgc groups
        sg = width // fgc  # input channels per super-group
        w_tiled = jnp.tile(w, (1, 1, sg // cg, 1))      # [3,3,sg,width]
        ids = jnp.arange(width) // cg
        row = jnp.arange(sg)
        col = jnp.arange(width)
        in_ch = (col[None, :] // sg) * sg + row[:, None]
        mask = (ids[in_ch] == ids[col][None, :]).astype(w_tiled.dtype)
        wd = w_tiled * mask
        dn = jax.lax.conv_dimension_numbers(
            y.shape, wd.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            y, wd, (self.stride, self.stride), ((1, 1), (1, 1)),
            dimension_numbers=dn, feature_group_count=fgc)


class _GroupedKernel(nn.Module):
    shape: Tuple[int, ...]

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape)

    def __call__(self):
        return self.kernel


class ResNeXt50(nn.Module):
    """Trunk only (no classifier head). Returns pooled [B, 2048] features and
    the layer4 feature map [B, 7, 7, 2048] — the reference captures the
    latter with a forward Hook (multimodal/multimodal.py:88-104); here it is
    simply a second output.

    ``dtype`` is the compute dtype: params stay f32, convs/BN run in bf16 on
    the train hot path (MXU-native); None = full f32 (parity/eval mode).
    ``dense_groups`` (frozen trunks only) see BottleneckX."""

    dtype: Any = None
    # per-stage dense-ification of the grouped 3x3 convs (see BottleneckX):
    # True = expand to a block-diagonal dense kernel (more FLOPs, MXU-
    # friendly), False = XLA grouped-conv lowering. A bool means
    # "layer1 only" (round-1 behavior); a 4-tuple picks per stage.
    dense_groups: Any = False

    def _dense_stage(self, stage_idx: int):
        """Per-stage dense_groups value passed to BottleneckX: bool or a
        packing factor int (see BottleneckX.dense_groups)."""
        if isinstance(self.dense_groups, (tuple, list)):
            return self.dense_groups[stage_idx]
        return self.dense_groups if stage_idx == 0 else False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Dict[str, jax.Array]:
        ura = not train
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, name="conv1", dtype=dt)(x)
        y = _bn("bn1", ura, dt, 64)(y)
        y = nn.relu(y)
        # torch MaxPool2d(3, stride=2, padding=1); window-level padding
        # avoids materializing a padded copy of the 112x112 stem output
        y = nn.max_pool(y, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        in_ch = 64
        for stage_idx, (planes, blocks, stride) in enumerate(RESNEXT50_STAGES):
            for block_idx in range(blocks):
                s = stride if block_idx == 0 else 1
                needs_ds = block_idx == 0 and (
                    s != 1 or in_ch != planes * EXPANSION)
                y = BottleneckX(
                    planes=planes, stride=s, has_downsample=needs_ds,
                    dtype=dt,
                    dense_groups=self._dense_stage(stage_idx),
                    fused_epilogue=False,  # see BottleneckX docstring
                    name=f"layer{stage_idx + 1}_{block_idx}")(y, train=train)
                in_ch = planes * EXPANSION

        # pool in f32 (49-way mean), but leave the feature map in the
        # compute dtype — consumers (spatial head, grad-CAM) cast as
        # needed, and the extra full-tensor f32 materialization is pure
        # HBM traffic on the hot path
        pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
        return {"pooled": pooled, "feature_map": y}
