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

import os
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

    def raw(self) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
        """(params, stats) dicts for the fold_block_params* helpers."""
        return ({"scale": self.scale, "bias": self.bias},
                {"mean": self.mean.value, "var": self.var.value})

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
    def __call__(self, x: jax.Array, train: bool = False,
                 fold_in_channels: int | None = None,
                 quant_in_amax: jax.Array | None = None,
                 transport_in_amax: jax.Array | None = None,
                 amax_chain: jax.Array | None = None) -> Any:
        if fold_in_channels is not None:
            if quant_in_amax is not None:
                return self._fold_q(fold_in_channels, quant_in_amax)
            if transport_in_amax is not None:
                return self._fold_t(fold_in_channels, transport_in_amax)
            return self._fold(fold_in_channels, amax_chain=amax_chain)
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

    def _fold(self, in_channels: int,
              amax_chain: jax.Array | None = None):
        """Declare this block's parameters (same names/shapes as the conv
        path, so checkpoints interchange) and return them folded with the
        running-average BN into the kernel-ready form consumed by
        ops/bottleneck_hwbc (w1/b1, packed w2/b2, w3/b3 [, wd/bd]).

        Only valid for frozen trunks (inference BN); used by the fused
        Pallas trunk on the TPU hot path. Reached via
        ``__call__(x, fold_in_channels=...)`` (the one compact method).

        ``amax_chain``: when a LATER stage of a mixed-precision trunk runs
        int8 (ResNeXt50.trunk_int8 per-stage plan), bf16 blocks still
        thread the activation-range chain so the bf16 -> int8 boundary has
        a quantization scale. The block then also declares its "out_amax"
        variable (same name/scope as the int8 fold, so
        models/quant_calib.py calibration lands on it) and returns
        (fw, out_amax) with the _fold_q fallback formula."""
        from multimodal_baby_tpu.ops.bottleneck_hwbc import pack_grouped_kernel
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * EXPANSION
        cg = width // self.groups
        dt = self.dtype or jnp.float32

        w1 = _GroupedKernel((1, 1, in_channels, width), name="conv1")()[0, 0]
        mul1, add1 = InferenceBN(width, name="bn1").fold()
        w2 = _GroupedKernel((3, 3, cg, width), name="conv2")()
        mul2, add2 = InferenceBN(width, name="bn2").fold()
        bn3 = InferenceBN(out_ch, name="bn3")
        w3 = _GroupedKernel((1, 1, width, out_ch), name="conv3")()[0, 0]
        mul3, add3 = bn3.fold()
        fw = {
            "w1": (w1 * mul1[None, :]).astype(dt), "b1": add1,
            "w2": pack_grouped_kernel(
                w2 * mul2[None, None, None, :], self.groups).astype(dt),
            "b2": add2,
            "w3": (w3 * mul3[None, :]).astype(dt), "b3": add3,
        }
        if self.has_downsample:
            wd = _GroupedKernel(
                (1, 1, in_channels, out_ch), name="downsample_conv")()[0, 0]
            muld, addd = InferenceBN(out_ch, name="downsample_bn").fold()
            fw["wd"] = (wd * muld[None, :]).astype(dt)
            fw["bd"] = addd
        if amax_chain is None:
            return fw
        bn3_params, _ = bn3.raw()
        out_amax = self._out_amax(bn3_params, amax_chain)
        return fw, jax.lax.stop_gradient(out_amax)

    def _declare_raw_params(self, in_channels: int):
        """The conv-path parameter tree (same variable names/shapes, so
        checkpoints interchange) in the params/stats/bns dict form the
        ops/quant.fold_block_params_{q,t} helpers consume."""
        width, out_ch = self._block_dims()
        params = {
            "conv1": {"kernel": _GroupedKernel(
                (1, 1, in_channels, width), name="conv1")()},
            "conv2": {"kernel": _GroupedKernel(
                (3, 3, width // self.groups, width), name="conv2")()},
            "conv3": {"kernel": _GroupedKernel(
                (1, 1, width, out_ch), name="conv3")()},
        }
        stats = {}
        bns = {}
        for name, c in (("bn1", width), ("bn2", width), ("bn3", out_ch)):
            bns[name], stats[name] = InferenceBN(c, name=name).raw()
            params[name] = bns[name]
        if self.has_downsample:
            params["downsample_conv"] = {"kernel": _GroupedKernel(
                (1, 1, in_channels, out_ch), name="downsample_conv")()}
            params["downsample_bn"], stats["downsample_bn"] = InferenceBN(
                out_ch, name="downsample_bn").raw()
        return params, stats, bns

    def _out_amax(self, bn3_params, base_amax: jax.Array) -> jax.Array:
        """Residual-sum activation bound: the calibrated "out_amax"
        variable when set (models/quant_calib.py lands on this name),
        else the BN-derived bound plus the incoming tensor's range."""
        from multimodal_baby_tpu.ops.quant import bn_amax_bound
        v = self.variable("quant_scales", "out_amax",
                          lambda: jnp.zeros((), jnp.float32))
        return jnp.where(v.value > 0, v.value,
                         bn_amax_bound(bn3_params) + base_amax)

    def _fold_q(self, in_channels: int, in_amax: jax.Array):
        """int8 fold: declare the same parameters as the conv path plus
        per-block activation-range variables (collection "quant_scales",
        0 = uncalibrated -> BN-derived bound, see ops/quant.resolve_amax),
        and return (fw_q, out_amax) for ops/bottleneck_hwbc int8 kernels."""
        from multimodal_baby_tpu.ops.quant import (
            fold_block_params_q, resolve_amax)
        params, stats, bns = self._declare_raw_params(in_channels)

        def amax_var(name, bn):
            v = self.variable("quant_scales", name,
                              lambda: jnp.zeros((), jnp.float32))
            return resolve_amax(v.value, bn)

        h1_amax = amax_var("h1_amax", bns["bn1"])
        h2_amax = amax_var("h2_amax", bns["bn2"])
        out_amax = self._out_amax(bns["bn3"], in_amax)

        fw = fold_block_params_q(
            params, stats, in_amax=in_amax, h1_amax=h1_amax,
            h2_amax=h2_amax, out_amax=out_amax, groups=self.groups)
        fw = jax.tree.map(jax.lax.stop_gradient, fw)
        return fw, jax.lax.stop_gradient(out_amax)

    def _fold_t(self, in_channels: int, in_amax: jax.Array):
        """int8-TRANSPORT fold: activations cross HBM as int8 but the
        dots run in the compute dtype (ops/quant.fold_block_params_t —
        the DMA saving without the Mosaic int8-dot and requant-epilogue
        givebacks). Declares the same parameters as the conv path plus
        only the out_amax range variable (no h1/h2 ranges: intermediates
        stay bf16 in VMEM). Returns (fw_t, out_amax)."""
        from multimodal_baby_tpu.ops.quant import fold_block_params_t
        params, stats, bns = self._declare_raw_params(in_channels)
        out_amax = self._out_amax(bns["bn3"], in_amax)
        fw = fold_block_params_t(
            params, stats, in_amax=in_amax, out_amax=out_amax,
            compute_dtype=self.dtype or jnp.float32, groups=self.groups)
        fw = jax.tree.map(jax.lax.stop_gradient, fw)
        return fw, jax.lax.stop_gradient(out_amax)

    def _block_dims(self) -> Tuple[int, int]:
        """(grouped-conv width, output channels)."""
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        return width, self.planes * EXPANSION

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


def _active_data_mesh():
    """(mesh, data_axis_size) from the ambient ``with mesh:`` context —
    (None, 1) when no multi-device data mesh is active. Lets the fused
    Pallas trunk shard_map itself over the data axis without any module
    plumbing (trainer/bench already run steps inside the mesh context)."""
    try:
        from jax._src.mesh import thread_resources
        mesh = thread_resources.env.physical_mesh
        from multimodal_baby_tpu.core.constants import DATA_AXIS
        if not mesh.empty and DATA_AXIS in mesh.shape \
                and mesh.shape[DATA_AXIS] > 1:
            return mesh, mesh.shape[DATA_AXIS]
    except Exception:
        pass
    return None, 1


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
    ``dense_groups`` (frozen trunks only) see BottleneckX.

    Gradient caveat: when the fused Pallas trunk is active (frozen bf16 TPU
    path) the trunk input is wrapped in stop_gradient, so gradients w.r.t.
    the *image* are zero — by design, since nothing on the hot path
    differentiates through a frozen trunk. Saliency-style analyses that
    need image gradients should either run the conv path
    (MMB_FUSED_TRUNK=0 / f32 dtype) or go through
    ops.bottleneck_hwbc.fused_bottleneck_hwbc_diff; in-repo grad-CAM
    differentiates w.r.t. the feature_map output, which is unaffected."""

    dtype: Any = None
    # per-stage dense-ification of the grouped 3x3 convs (see BottleneckX):
    # True = expand to a block-diagonal dense kernel (more FLOPs, MXU-
    # friendly), False = XLA grouped-conv lowering. A bool means
    # "layer1 only" (round-1 behavior); a 4-tuple picks per stage.
    dense_groups: Any = False
    # fused Pallas trunk (ops/bottleneck_hwbc): runs every bottleneck
    # block as a fused kernel in the batch-in-sublanes layout. Active only
    # on TPU for frozen trunks (running BN) in bf16; measured faster than
    # the XLA lowering on layers 2-4 at B=256 (see BENCH_NOTES.md).
    # Override with MMB_FUSED_TRUNK=0/1.
    fused_trunk: bool = True
    # int8-quantized fused trunk (see ops/quant.py). Needs the fused-trunk
    # preconditions plus B % 32 == 0; calibrate activation ranges with
    # models/quant_calib. True = whole trunk; a 4-tuple of bools picks
    # per stage — int8 stages must form a contiguous SUFFIX (the
    # bf16 -> int8 boundary quantizes + regroups sublanes once). Measured
    # on v5e (scripts/perf_hwbc_int8.py): int8 wins ~30-35% on the
    # weight/MXU-bound layers 3-4 but nothing on the activation-DMA-bound
    # layers 1-2, so the recommended mixed plan is (0, 0, 1, 1).
    # A "t" entry runs a stage in int8 TRANSPORT mode: activations cross
    # HBM as int8 (half the DMA bytes) but every dot stays bf16 — aimed
    # at the activation-DMA-bound layers 1-2 where full int8 gave
    # nothing back (ops/quant.fold_block_params_t).
    # Override with MMB_TRUNK_INT8=0 / 1 / "0,0,1,1" / "t,t,1,1".
    trunk_int8: Any = False

    def _int8_plan(self) -> Tuple[Any, ...]:
        """Per-stage int8 plan: each entry False (bf16), "q" (full int8
        dots) or "t" (int8 transport, bf16 dots); all-False = bf16
        trunk."""
        n = len(RESNEXT50_STAGES)
        env = os.environ.get("MMB_TRUNK_INT8")
        raw = env if env is not None else self.trunk_int8

        def tok(p):
            if isinstance(p, str):
                p = p.strip()
                if p in ("t", "q"):
                    return p
                if p in ("1", "true", "True"):
                    return "q"
                if p in ("0", "false", "False", ""):
                    return False
                raise ValueError(
                    f"int8-plan entry must be 0/1/t/q, got {p!r}")
            return "q" if p else False

        if isinstance(raw, str):
            if "," in raw:
                parts = raw.split(",")
                if len(parts) != n:
                    raise ValueError(
                        f"MMB_TRUNK_INT8 plan needs {n} comma-separated "
                        f"0/1/t entries, got {raw!r}")
                plan = tuple(tok(p) for p in parts)
            else:
                plan = (tok(raw),) * n
        elif isinstance(raw, (tuple, list)):
            if len(raw) != n:
                raise ValueError(
                    f"trunk_int8 plan needs {n} entries, got {raw!r}")
            plan = tuple(tok(p) for p in raw)
        else:
            plan = (tok(raw),) * n
        # int8 stages must form a contiguous suffix: the chain switches
        # layout/dtype once (bf16/bsub16 -> int8/bsub32) and never back
        for a, b in zip(plan, plan[1:]):
            if a and not b:
                raise ValueError(
                    "int8 stages must form a contiguous suffix of the "
                    f"trunk (got plan {plan}); an int8 -> bf16 boundary "
                    "is not supported")
        return plan

    def _use_fused(self, ura: bool) -> bool:
        # semantic preconditions: the fused trunk folds running-average BN
        # into the weights and stop_gradients the whole trunk, so it is
        # only equivalent to the conv path for frozen trunks in
        # inference-BN mode. The env override can force the choice only
        # when those hold — otherwise MMB_FUSED_TRUNK=1 would silently
        # change BN semantics (batch -> folded running stats) and zero the
        # trunk gradients.
        ok = ura and self.dtype == jnp.bfloat16
        env = os.environ.get("MMB_FUSED_TRUNK")
        if env is not None:
            force = env == "1"
            if force and not ok:
                raise ValueError(
                    "MMB_FUSED_TRUNK=1 requires a frozen trunk in "
                    "inference-BN mode with bf16 compute (got "
                    f"use_running_average={ura}, dtype={self.dtype}); the "
                    "fused trunk folds running BN stats and stops trunk "
                    "gradients, which would silently change training "
                    "semantics here.")
            return force
        return (self.fused_trunk and ok
                and jax.devices()[0].platform == "tpu")

    def _dense_stage(self, stage_idx: int):
        """Per-stage dense_groups value passed to BottleneckX: bool or a
        packing factor int (see BottleneckX.dense_groups)."""
        if isinstance(self.dense_groups, (tuple, list)):
            return self.dense_groups[stage_idx]
        return self.dense_groups if stage_idx == 0 else False

    def _stem_s2d(self, x: jax.Array) -> jax.Array:
        """Stem conv via space-to-depth: the 7x7 stride-2 conv over 3
        channels becomes a 4x4 stride-1 conv over 12 channels — the same
        sums in a different order (MLPerf-ResNet trick). XLA runs the
        C_in=3 conv far below MXU rate (measured 2.7 ms/step of the
        ~3.3 ms front-end at B=256, scripts/perf_frontend.py); the
        repacked K=4*4*12 form tiles cleanly. The parameter stays the
        reference-shaped [7,7,3,64] conv1/kernel — the remap is pure
        jnp (differentiable, checkpoint-compatible)."""
        from multimodal_baby_tpu.data.augment import space_to_depth
        return self._stem_from_s2d(space_to_depth(x))

    def _stem_from_s2d(self, xs: jax.Array) -> jax.Array:
        """4x4/s1 stem conv on an already space-to-depth input
        [B, 112, 112, 12] ((i, j, c) order — data/augment.space_to_depth
        or the free split-einsum emit in augment_batch(s2d=True)).

        MMB_STEM_CPAD=1 zero-pads the input channel dim 12 -> 16 (K=192
        -> K=256 exactly) before the conv — exact (pad taps contribute
        0), costs one pad copy; measured by scripts/perf_stem_cpad.py."""
        # kernel: [7,7,3,64] -> pad to [8,8] (tap index d = 2k + i - 1;
        # d = -1 is the zero row/col) -> [4, 2, 4, 2, 3, 64] -> [4,4,12,64]
        w7 = _GroupedKernel((7, 7, 3, 64), name="conv1")()
        wp = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w4 = jnp.transpose(
            wp.reshape(4, 2, 4, 2, 3, 64), (0, 2, 1, 3, 4, 5)
        ).reshape(4, 4, 12, 64).astype(xs.dtype)
        if os.environ.get("MMB_STEM_CPAD", "0") == "1":
            xs = jnp.pad(xs, ((0, 0),) * 3 + ((0, 4),))
            w4 = jnp.pad(w4, ((0, 0), (0, 0), (0, 4), (0, 0)))
        return jax.lax.conv_general_dilated(
            xs, w4, window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Dict[str, jax.Array]:
        ura = not train
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        # s2d stem (numerically the same conv, not bit-identical:
        # summation order differs). Default OFF: despite the MXU-
        # alignment theory (K=147 C_in=3 -> K=192 C_in=12), measured
        # end-to-end it LOSES ~2% at B=1024 (bench A/B, BENCH_NOTES
        # round 3) — XLA's s2d input transpose + its lowering of the
        # 4x4 conv cost more than the alignment saves. MMB_S2D_STEM=1
        # re-enables for future re-evaluation.
        if x.shape[-1] == 12:
            # pre-space-to-depth input (augment_batch(s2d=True): the split
            # resample einsums emit this layout with zero transposes)
            y = self._stem_from_s2d(x)
        elif dt == jnp.bfloat16 and x.shape[1] % 2 == 0 \
                and x.shape[2] % 2 == 0 \
                and os.environ.get("MMB_S2D_STEM", "0") == "1":
            y = self._stem_s2d(x)
        elif os.environ.get("MMB_STEM_CPAD", "0") == "1" \
                and x.shape[-1] == 3:
            # zero-pad C_in 3 -> 8 before the 7x7 (exact: pad taps are 0);
            # same parameter tree as the nn.Conv branch. Measured by
            # scripts/perf_stem_cpad.py probe B.
            w7 = _GroupedKernel((7, 7, 3, 64), name="conv1")().astype(
                x.dtype)
            y = jax.lax.conv_general_dilated(
                jnp.pad(x, ((0, 0),) * 3 + ((0, 5),)),
                jnp.pad(w7, ((0, 0), (0, 0), (0, 5), (0, 0))),
                window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                        use_bias=False, name="conv1", dtype=dt)(x)
        bn1_mod = _bn("bn1", ura, dt, 64)
        y = bn1_mod(y)
        y = nn.relu(y)
        # torch MaxPool2d(3, stride=2, padding=1); window-level padding
        # avoids materializing a padded copy of the 112x112 stem output
        y = nn.max_pool(y, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        # batch-in-sublanes layout needs B % 16 == 0 (32 for int8) on
        # every data shard; else fall back. With a multi-device mesh
        # active the fused chain runs under shard_map (a Pallas call is
        # an opaque custom call XLA cannot partition on its own).
        mesh, n_data = _active_data_mesh()
        b_local = y.shape[0] // n_data
        if self._use_fused(ura) and y.shape[0] % n_data == 0 \
                and b_local % 16 == 0:
            qplan = self._int8_plan()
            if b_local % 32 != 0:
                qplan = (False,) * len(qplan)
            stem_bn = bn1_mod.raw()[0] if any(qplan) else None
            return self._fused_stages(y, quant_plan=qplan,
                                      stem_bn=stem_bn, mesh=mesh)

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

    # per-stage kernel strategy for the fused trunk:
    #   "blocks"      — one fused Pallas call per bottleneck block
    #   "full"        — whole stage in one call, full spatial extent in VMEM
    #   "split"       — stride-2 head block alone + "full" for the tail
    #   "bandedN"     — whole stage, banded over N output rows per grid cell
    #   "splitbandN"  — head block alone + bandedN over the tail blocks
    #                   (N = tail output rows -> one band, zero halo
    #                   recompute, WITHOUT the head conv1's full-input-
    #                   width VMEM spike that makes whole-stage one-band
    #                   plans OOM on the large-spatial stages)
    # Override with MMB_TRUNK_PLAN="banded14,blocks,split,full"-style.
    # Default = measured-best on v5e at B=1024 under the mixed-precision
    # plan (bench A/B, BENCH_NOTES.md): 28-row bands through all of
    # layer 1 in VMEM, per-block kernels for layer 2, stride-2 head
    # block + whole-stage-in-VMEM tail for layer 3, the whole of layer 4
    # (head included) in one in-VMEM call. bandedN falls back to blocks
    # when N does not tile the stage's output rows (small eval images),
    # and full-int8 ("q") stages demote banded to blocks (the banded
    # kernel takes bf16/f32 dots only; int8-TRANSPORT stages stay
    # banded).
    fused_plan: Tuple[str, ...] = ("banded28", "blocks", "split", "full")

    def _fused_stages(self, y: jax.Array,
                      quant_plan: Tuple[Any, ...] = (False,) * 4,
                      stem_bn: Dict[str, jax.Array] | None = None,
                      mesh=None) -> Dict[str, jax.Array]:
        """Fused Pallas trunk: stem output [B, 56, 56, 64] -> pooled +
        feature map via fused kernels in the batch-in-sublanes layout.
        Declares the exact same parameters as the conv path (BottleneckX
        fold mode), so checkpoints interchange. ``quant_plan`` runs a
        contiguous suffix of stages in int8 (batch lanes 32, activation
        ranges from the "quant_scales" collection — see
        models/quant_calib.py); bf16 stages ahead of the first int8 stage
        thread the activation-range chain so the boundary quantization
        has a scale.

        Two phases: (1) fold every block's weights (module calls, declare
        params/variables); (2) a PURE kernel chain over the activations.
        With a multi-device data mesh active (``mesh``), phase 2 runs
        under shard_map over the data axis — each shard executes the
        Pallas kernels on its local batch; weights ride in replicated."""
        from multimodal_baby_tpu.ops.bottleneck_hwbc import (
            from_hwbc, fused_bottleneck_hwbc, fused_stage_banded,
            fused_stage_hwbc, to_hwbc)
        env = os.environ.get("MMB_TRUNK_PLAN")
        plan = tuple(env.split(",")) if env else self.fused_plan
        if len(plan) != len(RESNEXT50_STAGES):
            raise ValueError(
                f"MMB_TRUNK_PLAN needs {len(RESNEXT50_STAGES)} comma-"
                f"separated entries (one per stage), got {plan!r}")

        # ---- phase 1: fold weights (+ quant ranges) per stage ----
        any_q = any(quant_plan)
        in_amax = None
        if any_q:
            from multimodal_baby_tpu.ops.quant import resolve_amax
            v = self.variable("quant_scales", "stem_amax",
                              lambda: jnp.zeros((), jnp.float32))
            in_amax = jax.lax.stop_gradient(resolve_amax(v.value, stem_bn))
        stem_amax = in_amax
        q_entry_amax = stem_amax  # range at the bf16 -> int8 boundary
        stage_fws, stage_strides, stage_modes = [], [], []
        in_ch = 64
        for stage_idx, (planes, blocks, stride) in enumerate(RESNEXT50_STAGES):
            q_stage = quant_plan[stage_idx]
            if q_stage and not (stage_idx and quant_plan[stage_idx - 1]):
                q_entry_amax = in_amax  # first int8 stage's input range
            fws, strides = [], []
            for block_idx in range(blocks):
                s = stride if block_idx == 0 else 1
                needs_ds = block_idx == 0 and (
                    s != 1 or in_ch != planes * EXPANSION)
                block = BottleneckX(
                    planes=planes, stride=s, has_downsample=needs_ds,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}")
                if q_stage == "q":
                    fw, in_amax = block(None, fold_in_channels=in_ch,
                                        quant_in_amax=in_amax)
                elif q_stage == "t":
                    fw, in_amax = block(None, fold_in_channels=in_ch,
                                        transport_in_amax=in_amax)
                elif any_q:
                    # bf16 stage ahead of an int8 one: thread the range
                    # chain (and declare out_amax so calibration lands)
                    fw, in_amax = block(None, fold_in_channels=in_ch,
                                        amax_chain=in_amax)
                    fw = jax.tree.map(jax.lax.stop_gradient, fw)
                else:
                    fw = block(None, fold_in_channels=in_ch)
                    fw = jax.tree.map(jax.lax.stop_gradient, fw)
                fws.append(fw)
                strides.append(s)
                in_ch = planes * EXPANSION
            mode = plan[stage_idx]
            if q_stage == "q" and mode.startswith("banded"):
                mode = "blocks"  # banded kernels can't run int8 DOTS
                # (transport stages — int8 I/O, bf16 dots — stay banded)
            if q_stage == "q" and mode.startswith("splitband"):
                mode = "split"  # same int8-dot limitation in the tail
            stage_fws.append(fws)
            stage_strides.append(strides)
            stage_modes.append(mode)
        out_amax = in_amax  # final block's range (quant only)

        # ---- phase 2: pure kernel chain ----
        def chain(y, stage_fws):
            # optimization_barrier pins the layout transpose AFTER the
            # maxpool (XLA otherwise commutes it to the 4x larger 112x112
            # stem output — 3.6 ms/step of layout copies in the trace).
            y = jax.lax.optimization_barrier(y)
            if quant_plan[0]:
                from multimodal_baby_tpu.ops.quant import (
                    quantize_activation)
                y = quantize_activation(y.astype(jnp.float32), stem_amax)
                y = jax.lax.stop_gradient(to_hwbc(y, 32))
            else:
                y = jax.lax.stop_gradient(to_hwbc(y))
            for stage_idx, (fws, strides, mode) in enumerate(
                    zip(stage_fws, stage_strides, stage_modes)):
                if quant_plan[stage_idx] and not (
                        stage_idx and quant_plan[stage_idx - 1]) \
                        and not quant_plan[0]:
                    # bf16 -> int8 boundary: quantize with the threaded
                    # range, then regroup batch sublanes 16 -> 32
                    # ([H, B/16, W, 16, C] -> [H, B/32, W, 32, C]; one
                    # XLA copy of a small int8 tensor)
                    from multimodal_baby_tpu.ops.quant import (
                        quantize_activation)
                    y = quantize_activation(
                        y.astype(jnp.float32), q_entry_amax)
                    h, nq, w, bs, c = y.shape
                    y = y.reshape(h, nq // 2, 2, w, bs, c)
                    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
                    y = y.reshape(h, nq // 2, w, 2 * bs, c)
                if mode == "blocks":
                    for fw, s in zip(fws, strides):
                        y = fused_bottleneck_hwbc(y, fw, stride=s)
                elif mode == "full":
                    y = fused_stage_hwbc(y, fws, strides)
                elif mode == "split":
                    y = fused_bottleneck_hwbc(y, fws[0], stride=strides[0])
                    y = fused_stage_hwbc(y, fws[1:], strides[1:])
                elif mode.startswith("splitband"):
                    hh = int(mode[9:]) if len(mode) > 9 else 14
                    y = fused_bottleneck_hwbc(y, fws[0], stride=strides[0])
                    ho = y.shape[0]
                    hh = min(hh, ho)
                    if len(fws) == 1:
                        pass  # single-block stage: the head was the stage
                    elif ho % hh:  # band must tile the tail output rows
                        y = fused_stage_hwbc(y, fws[1:], strides[1:])
                    else:
                        y = fused_stage_banded(y, fws[1:], strides[1:],
                                               hh=hh)
                elif mode.startswith("banded"):
                    hh = int(mode[6:]) if len(mode) > 6 else 14
                    ho = y.shape[0] // strides[0]
                    hh = min(hh, ho)
                    if ho % hh:  # band must tile the output rows
                        for fw, s in zip(fws, strides):
                            y = fused_bottleneck_hwbc(y, fw, stride=s)
                    else:
                        y = fused_stage_banded(y, fws, strides, hh=hh)
                else:
                    raise ValueError(f"unknown fused-trunk mode {mode!r}")

            # y: [7, B/bsub, 7, bsub, 2048]; 49-way mean in f32
            if quant_plan[-1]:
                scale = jnp.maximum(out_amax, 1e-12) / 127.0
                y_f = y.astype(jnp.float32) * scale
                pooled = jnp.mean(y_f, axis=(0, 2)).reshape(
                    -1, y.shape[-1])
                fmap = from_hwbc(y_f.astype(self.dtype or jnp.float32))
                return pooled, fmap
            pooled = jnp.mean(y.astype(jnp.float32), axis=(0, 2))
            pooled = pooled.reshape(-1, y.shape[-1])
            return pooled, from_hwbc(y)

        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            from multimodal_baby_tpu.core.constants import DATA_AXIS
            wspecs = jax.tree.map(lambda _: P(), stage_fws)
            pooled, fmap = jax.shard_map(
                chain, mesh=mesh,
                in_specs=(P(DATA_AXIS), wspecs),
                out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                check_vma=False)(y, stage_fws)
        else:
            pooled, fmap = chain(y, stage_fws)
        return {"pooled": pooled, "feature_map": fmap}
