"""int8 quantization for the frozen ResNeXt trunk.

v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate
(scripts/perf_int8_mxu.py, marginal-cost method), and int8 activations
halve the trunk's HBM/DMA traffic — together the two biggest remaining
levers on the bandwidth/MXU-bound frozen trunk (BENCH_NOTES.md).

Scheme (standard post-training quantization, exact-int8 dots + f32
epilogues):

- weights: per-output-channel symmetric int8 (BN pre-folded, so scales
  absorb the BN multiply);
- activations: per-tensor scales on the relu outputs (non-negative ->
  int8 range [0, 127]). amax values come from a calibration pass over
  real batches (models/quant_calib.py); an uncalibrated fallback bound
  derives from the folded-BN statistics (post-BN channel c is
  ~N(beta_c, gamma_c^2) on the training distribution, so
  amax <~ max_c |beta_c| + K_SIGMA * |gamma_c|).

Requantization folds into the existing per-channel epilogue madd:

  h_q = clip(round(acc_i32 * a_c + b_c), 0, 127)   a_c = s_in * s_w_c / s_out
                                                   b_c = bias_c / s_out

so the fused kernels (ops/bottleneck_hwbc.py) run ONE code path for bf16
and int8: bf16 just uses unit `a` vectors.

The reference trains/serves this trunk in f32 (multimodal.py:88-104,
frozen via requires_grad=False); int8 is an inference-mode optimization
of the frozen feature extractor, off by default and gated on measured
feature/accuracy parity (tests/test_quant_trunk.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.ops.bottleneck_hwbc import BS, pack_grouped_kernel

K_SIGMA = 4.0  # uncalibrated fallback: amax = max|beta| + K_SIGMA*|gamma|


def quantize_weight(w: jax.Array, axis: int = -1
                    ) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: returns (w_q, scale[Cout])."""
    red = tuple(i for i in range(w.ndim) if i != axis % w.ndim)
    amax = jnp.max(jnp.abs(w), axis=red)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    shape = [1] * w.ndim
    shape[axis % w.ndim] = -1
    w_q = jnp.clip(jnp.round(w / scale.reshape(shape)), -127, 127)
    return w_q.astype(jnp.int8), scale


def quantize_activation(x: jax.Array, amax) -> jax.Array:
    """relu output -> int8 with per-tensor scale amax/127 (range [0,127])."""
    s = jnp.maximum(amax, 1e-12) / 127.0
    return jnp.clip(jnp.round(x / s), 0, 127).astype(jnp.int8)


def bn_amax_bound(bn_params: Dict) -> jax.Array:
    """Data-free fallback activation bound from BN affine params (the
    post-BN channel is ~N(beta, gamma^2) on the training distribution)."""
    return jnp.max(jnp.abs(bn_params["bias"])
                   + K_SIGMA * jnp.abs(bn_params["scale"]))


def resolve_amax(calibrated: jax.Array, bn_params: Dict) -> jax.Array:
    """Calibrated value if set (> 0), else the BN-derived bound."""
    return jnp.where(calibrated > 0, calibrated, bn_amax_bound(bn_params))


def fold_block_params_q(
    params: Dict,
    stats: Dict,
    in_amax: jax.Array,
    h1_amax: jax.Array,
    h2_amax: jax.Array,
    out_amax: jax.Array,
    groups: int = 32,
) -> Dict[str, jax.Array]:
    """BN-fold + int8-quantize one BottleneckX block.

    Returns the kernel-ready dict consumed by ops/bottleneck_hwbc with
    int8 weights and f32 per-channel requant vectors:
      w1 [Cin, W] i8, a1/b1 [W] f32, w2 [9, nb, BS, BS] i8, a2/b2 [W],
      w3 [W, Cout] i8, a3/b3 [Cout], (wd i8, ad/bd) | ai [Cout].
    """
    def fold(bn_p, bn_s):
        mul = bn_p["scale"] * jax.lax.rsqrt(bn_s["var"] + 1e-5)
        return mul, bn_p["bias"] - bn_s["mean"] * mul

    s_in = jnp.maximum(in_amax, 1e-12) / 127.0
    s_h1 = jnp.maximum(h1_amax, 1e-12) / 127.0
    s_h2 = jnp.maximum(h2_amax, 1e-12) / 127.0
    s_out = jnp.maximum(out_amax, 1e-12) / 127.0

    out: Dict[str, jax.Array] = {}

    mul1, add1 = fold(params["bn1"], stats["bn1"])
    w1 = params["conv1"]["kernel"][0, 0] * mul1[None, :]
    out["w1"], sw1 = quantize_weight(w1)
    out["a1"] = (s_in * sw1 / s_h1).astype(jnp.float32)
    out["b1"] = (add1 / s_h1).astype(jnp.float32)

    mul2, add2 = fold(params["bn2"], stats["bn2"])
    w2 = params["conv2"]["kernel"] * mul2[None, None, None, :]
    w2_q, sw2 = quantize_weight(w2)  # per out channel (last axis)
    out["w2"] = pack_grouped_kernel(w2_q.astype(jnp.float32),
                                    groups).astype(jnp.int8)
    out["a2"] = (s_h1 * sw2 / s_h2).astype(jnp.float32)
    out["b2"] = (add2 / s_h2).astype(jnp.float32)

    mul3, add3 = fold(params["bn3"], stats["bn3"])
    w3 = params["conv3"]["kernel"][0, 0] * mul3[None, :]
    out["w3"], sw3 = quantize_weight(w3)
    out["a3"] = (s_h2 * sw3 / s_out).astype(jnp.float32)
    out["b3"] = (add3 / s_out).astype(jnp.float32)

    cout = w3.shape[1]
    if "downsample_conv" in params:
        muld, addd = fold(params["downsample_bn"], stats["downsample_bn"])
        wd = params["downsample_conv"]["kernel"][0, 0] * muld[None, :]
        out["wd"], swd = quantize_weight(wd)
        out["ad"] = (s_in * swd / s_out).astype(jnp.float32)
        out["bd"] = (addd / s_out).astype(jnp.float32)
    else:
        # identity path: dequant-requant by a uniform per-channel vector
        out["ai"] = jnp.full((cout,), s_in / s_out, jnp.float32)
    return out


def fold_block_params_t(
    params: Dict,
    stats: Dict,
    in_amax: jax.Array,
    out_amax: jax.Array,
    compute_dtype=jnp.bfloat16,
    groups: int = 32,
) -> Dict[str, jax.Array]:
    """BN-fold one BottleneckX block for int8 TRANSPORT: activations
    cross HBM as int8 (half the DMA bytes — the binding constraint on
    the large-spatial stages, BENCH_NOTES), but every dot runs in
    ``compute_dtype`` (bf16), so there is no Mosaic int8-dot penalty and
    no requant epilogue on h1/h2 (the two giveback terms that made the
    full-int8 kernels flat-to-losing on layers 1-2,
    scripts/perf_hwbc_int8.py / perf_int8_l1.py).

    The input dequant folds into w1/wd (w *= s_in: the kernel converts
    the int8 tile to bf16 and the scale rides in the weights); the
    output quant folds into the conv3/downsample epilogue madd
    (a3 = mul3th/s_out via 1/s_out here since BN is already folded into
    w3; b3 = bias3/s_out) and the identity coefficient (ai = s_in/s_out)
    — so the only extra VPU work vs the bf16 kernel is one int8->bf16
    convert on the input tile and the round/clip on the output."""
    def fold(bn_p, bn_s):
        mul = bn_p["scale"] * jax.lax.rsqrt(bn_s["var"] + 1e-5)
        return mul, bn_p["bias"] - bn_s["mean"] * mul

    s_in = jnp.maximum(in_amax, 1e-12) / 127.0
    s_out = jnp.maximum(out_amax, 1e-12) / 127.0

    out: Dict[str, jax.Array] = {}
    mul1, add1 = fold(params["bn1"], stats["bn1"])
    w1 = params["conv1"]["kernel"][0, 0] * mul1[None, :]
    out["w1"] = (w1 * s_in).astype(compute_dtype)
    out["b1"] = add1.astype(jnp.float32)

    mul2, add2 = fold(params["bn2"], stats["bn2"])
    w2 = params["conv2"]["kernel"] * mul2[None, None, None, :]
    out["w2"] = pack_grouped_kernel(w2, groups).astype(compute_dtype)
    out["b2"] = add2.astype(jnp.float32)

    mul3, add3 = fold(params["bn3"], stats["bn3"])
    w3 = params["conv3"]["kernel"][0, 0] * mul3[None, :]
    out["w3"] = w3.astype(compute_dtype)
    cout = w3.shape[1]
    out["a3"] = jnp.full((cout,), 1.0, jnp.float32) / s_out
    out["b3"] = (add3 / s_out).astype(jnp.float32)

    if "downsample_conv" in params:
        muld, addd = fold(params["downsample_bn"], stats["downsample_bn"])
        wd = params["downsample_conv"]["kernel"][0, 0] * muld[None, :]
        out["wd"] = (wd * s_in).astype(compute_dtype)
        out["ad"] = jnp.full((cout,), 1.0, jnp.float32) / s_out
        out["bd"] = (addd / s_out).astype(jnp.float32)
    else:
        out["ai"] = jnp.full((cout,), s_in / s_out, jnp.float32)
    return out


def bottleneck_reference_t(x_q: jax.Array, fw: Dict[str, jax.Array],
                           *, stride: int = 1) -> jax.Array:
    """XLA oracle for the transport block ([B, H, W, C] int8 layout):
    int8 in/out, f32 compute with the transport-folded weights — the
    exact math the fused kernel must reproduce (same shape conventions
    as bottleneck_reference_q)."""
    B, H, W, cin = x_q.shape
    width = fw["w1"].shape[1]
    nb = fw["w2"].shape[1]

    x = x_q.astype(jnp.float32)
    h1 = jnp.maximum(
        x.reshape(-1, cin) @ fw["w1"].astype(jnp.float32) + fw["b1"], 0.0
    ).reshape(B, H, W, width)

    dense = jnp.zeros((9, width, width), jnp.float32)
    for b in range(nb):
        dense = dense.at[:, b * BS:(b + 1) * BS,
                         b * BS:(b + 1) * BS].set(
                             fw["w2"][:, b].astype(jnp.float32))
    whwio = dense.reshape(3, 3, width, width)
    dn = jax.lax.conv_dimension_numbers(
        h1.shape, whwio.shape, ("NHWC", "HWIO", "NHWC"))
    h2 = jnp.maximum(jax.lax.conv_general_dilated(
        h1, whwio, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=dn) + fw["b2"], 0.0)

    Ho, Wo = H // stride, W // stride
    y = (h2.reshape(-1, width) @ fw["w3"].astype(jnp.float32)
         ) * fw["a3"] + fw["b3"]
    if "wd" in fw:
        xs = x_q[:, ::stride, ::stride].astype(jnp.float32)
        ident = (xs.reshape(-1, cin) @ fw["wd"].astype(jnp.float32)
                 ) * fw["ad"] + fw["bd"]
    else:
        ident = x.reshape(-1, cin) * fw["ai"]
    out = jnp.clip(jnp.round(y + ident), 0, 127).astype(jnp.int8)
    return out.reshape(B, Ho, Wo, -1)


def bottleneck_reference_q(x_q: jax.Array, fw: Dict[str, jax.Array],
                           *, stride: int = 1) -> jax.Array:
    """Quantized-block oracle in plain XLA, [B, H, W, C] int8 layout —
    the exact integer/f32 math the fused kernel must reproduce."""
    B, H, W, cin = x_q.shape
    width = fw["w1"].shape[1]
    nb = fw["w2"].shape[1]

    def requant(acc, a, b):
        h = acc.astype(jnp.float32) * a + b
        return jnp.clip(jnp.round(h), 0, 127).astype(jnp.int8)

    acc1 = jax.lax.dot_general(
        x_q.reshape(-1, cin), fw["w1"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    h1 = requant(acc1, fw["a1"], fw["b1"]).reshape(B, H, W, width)

    dense = jnp.zeros((9, width, width), jnp.int8)
    for b in range(nb):
        dense = dense.at[:, b * BS:(b + 1) * BS,
                         b * BS:(b + 1) * BS].set(fw["w2"][:, b])
    whwio = dense.reshape(3, 3, width, width)
    dn = jax.lax.conv_dimension_numbers(
        h1.shape, whwio.shape, ("NHWC", "HWIO", "NHWC"))
    acc2 = jax.lax.conv_general_dilated(
        h1, whwio, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=dn, preferred_element_type=jnp.int32)
    h2 = requant(acc2, fw["a2"], fw["b2"])

    Ho, Wo = H // stride, W // stride
    acc3 = jax.lax.dot_general(
        h2.reshape(-1, width), fw["w3"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc3.astype(jnp.float32) * fw["a3"] + fw["b3"]

    x_id = x_q[:, ::stride, ::stride, :].reshape(-1, cin)
    if "wd" in fw:
        accd = jax.lax.dot_general(
            x_id, fw["wd"], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        ident = accd.astype(jnp.float32) * fw["ad"] + fw["bd"]
    else:
        ident = x_id.astype(jnp.float32) * fw["ai"]
    out = jnp.clip(jnp.round(y + ident), 0, 127).astype(jnp.int8)
    return out.reshape(B, Ho, Wo, -1)


def with_unit_scales(fw: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Augment a bf16 fold_block_params dict with unit `a` vectors so the
    unified kernel epilogue (acc * a + b) is a no-op rescale."""
    out = dict(fw)
    for key, wkey in (("a1", "w1"), ("a2", "w2"), ("a3", "w3")):
        if key not in out:
            c = fw[wkey].shape[-1] if wkey != "w2" else fw["w1"].shape[1]
            out[key] = jnp.ones((c,), jnp.float32)
    if "wd" in fw and "ad" not in out:
        out["ad"] = jnp.ones((fw["wd"].shape[-1],), jnp.float32)
    if "wd" not in fw and "ai" not in out:
        out["ai"] = jnp.ones((fw["w3"].shape[-1],), jnp.float32)
    return out


# ---------------------------------------------------------------------------
# int8 Dense for frozen transformer trunks (the ViT path)
# ---------------------------------------------------------------------------
#
# Unlike the ResNeXt trunk (Pallas kernels, static calibrated ranges),
# the ViT runs its matmuls through XLA, whose int8 dot_general hits the
# v5e MXU's 2x int8 rate directly (scripts/perf_xla_int8.py: 317 vs
# 201 T/s at ViT-B shapes). Activations are quantized DYNAMICALLY with a
# per-tensor amax computed on the fly — the reduction fuses into the
# producing op (LayerNorm/GELU), so there is no calibration machinery
# and no stale-range risk; weights are per-output-channel symmetric,
# quantized from the f32 params in-graph (loop-invariant for a frozen
# trunk, so XLA hoists the quantization out of the step loop).

def int8_dense(x, kernel, bias=None, out_dtype=None, amax_rows=None):
    """y = x @ kernel (+ bias) with an int8 MXU dot.

    x: [..., K] float; kernel: [K, N] f32/bf16 param; per-output-channel
    symmetric weight int8, per-tensor dynamic symmetric activation int8,
    f32 epilogue. Intended for FROZEN weights: jnp.round's zero gradient
    makes the quantization non-differentiable by design.

    amax_rows (static int): restrict the dynamic activation amax to the
    first amax_rows entries of the second-minor axis. Tile-padded token
    streams (MMB_VIT_PADSEQ) pass the real token count so pad rows —
    which carry bias/LN-beta garbage after block 0 — cannot inflate or
    deflate the per-tensor scale, keeping real-token outputs identical
    to the unpadded int8 computation."""
    xf = x.astype(jnp.float32)
    w_scale = jnp.maximum(
        jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=0), 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(kernel.astype(jnp.float32) / w_scale),
                   -127, 127).astype(jnp.int8)
    if amax_rows is not None and x.ndim >= 2 and amax_rows < x.shape[-2]:
        a = jnp.max(jnp.abs(xf[..., :amax_rows, :]))
    else:
        a = jnp.max(jnp.abs(xf))
    a_scale = jnp.maximum(a, 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (w_scale * a_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)
