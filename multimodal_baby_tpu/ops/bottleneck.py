"""Fused ResNeXt bottleneck block as one Pallas TPU kernel.

The XLA lowering of a bottleneck block round-trips every intermediate
through HBM: conv1 -> (write+read width tensor) -> grouped conv2 ->
(write+read) -> conv3 -> (read identity, write output). Measured on v5e at
B=256 that traffic — not MXU FLOPs — dominates the frozen-trunk forward
(stage deltas 7-8.5 ms vs ~1-2 ms of matmul time). This kernel keeps the
whole chain

    conv1(1x1) + bn1 + relu
    -> conv2(3x3, 32 groups, optional stride) + bn2 + relu
    -> conv3(1x1) + bn3 + residual(+ 1x1/stride downsample) + relu

in VMEM per image tile: HBM sees one read of the block input (which is
also the residual identity) and one write of the output.

Design notes (TPU-first):
- BN is inference-mode (frozen trunk) and pre-folded into the conv weights
  and a bias outside the kernel (fold_block_params) — zero in-kernel cost.
- The grouped 3x3 conv is computed as 9 shifted matmuls against
  *block-diagonal-compacted* weights [9, nb, 128, 128]: the 32 groups
  (4-32 channels each) are packed into 128-wide MXU tiles. On the MXU a
  grouped matmul with N=cg lanes runs at cg/128 utilization, so packing
  groups to N=128 is FLOP-optimal for any group width — the extra
  multiply-by-zero FLOPs are free relative to the lane limit.
- stride-2 blocks compute conv2 at full resolution and subsample the
  result (identical numerics: stride-2 conv == full conv + ::2 sampling);
  the identity path strides the already-resident input tile.
- Backward: the trunk is frozen (stop_gradient in models/vision.py), so
  only the forward runs on the train path. For completeness the op carries
  a custom VJP that differentiates an XLA reference implementation.

Reference workload anchor: the frozen CNN forward of
multimodal/multimodal.py:88-104 — all the FLOPs of the published CVCL
recipe live here.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS = 128  # MXU lane tile: groups are packed into BS-wide diagonal blocks


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


# ---------------------------------------------------------------------------
# weight preparation (XLA, negligible cost — weights are tiny)
# ---------------------------------------------------------------------------

def pack_grouped_kernel(w: jax.Array, groups: int) -> jax.Array:
    """Grouped conv kernel [3, 3, cg, W] (HWIO, feature_group_count=G) ->
    block-diagonal compact form [9, nb, BS, BS] where nb = W // BS.

    Tap t = ky*3+kx; block b holds the [BS, BS] diagonal block of the
    dense-ified [W_in, W_out] matrix for that tap (off-group entries zero).
    """
    kh, kw, cg, width = w.shape
    assert kh == 3 and kw == 3 and width % BS == 0
    nb = width // BS
    gpb = BS // cg  # groups per BS-block
    # per-group [cg_in, cg_out] blocks: w[t, ci, g*cg + co]
    blocks = w.reshape(9, cg, nb, gpb, cg)          # t, ci, b, g, co
    blocks = jnp.transpose(blocks, (0, 2, 3, 1, 4))  # t, b, g, ci, co
    # place on the block diagonal via a broadcast against eye(gpb) —
    # pure reshape/multiply (an elementwise-gather formulation here costs
    # ~30 ms/step on TPU when folding runs inside the train jit)
    eye = jnp.eye(gpb, dtype=w.dtype)
    dense = blocks[:, :, :, :, None, :] * eye[None, None, :, None, :, None]
    return dense.reshape(9, nb, BS, BS)


def fold_block_params(params: Dict, stats: Dict, compute_dtype,
                      groups: int = 32) -> Dict[str, jax.Array]:
    """Fold InferenceBN (scale, bias, mean, var) into conv weights/biases.

    params/stats: the flax BottleneckX subtree (conv1/bn1/.../downsample_*).
    Returns kernel-ready arrays: w1 [Cin, W], w2 [9, nb, BS, BS], w3
    [W, Cout], b1/b2 [W], b3 [Cout] (+ wd/bd when a downsample exists).
    """
    def fold(bn_p, bn_s):
        mul = bn_p["scale"] * jax.lax.rsqrt(bn_s["var"] + 1e-5)
        return mul, bn_p["bias"] - bn_s["mean"] * mul

    out: Dict[str, jax.Array] = {}
    mul1, add1 = fold(params["bn1"], stats["bn1"])
    w1 = params["conv1"]["kernel"][0, 0]                 # [Cin, W]
    out["w1"] = (w1 * mul1[None, :]).astype(compute_dtype)
    out["b1"] = add1.astype(jnp.float32)

    mul2, add2 = fold(params["bn2"], stats["bn2"])
    w2 = params["conv2"]["kernel"] * mul2[None, None, None, :]
    out["w2"] = pack_grouped_kernel(w2, groups).astype(compute_dtype)
    out["b2"] = add2.astype(jnp.float32)

    mul3, add3 = fold(params["bn3"], stats["bn3"])
    w3 = params["conv3"]["kernel"][0, 0]
    out["w3"] = (w3 * mul3[None, :]).astype(compute_dtype)
    out["b3"] = add3.astype(jnp.float32)

    if "downsample_conv" in params:
        muld, addd = fold(params["downsample_bn"], stats["downsample_bn"])
        wd = params["downsample_conv"]["kernel"][0, 0]
        out["wd"] = (wd * muld[None, :]).astype(compute_dtype)
        out["bd"] = addd.astype(jnp.float32)
    return out


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _block_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  wd_ref, bd_ref, out_ref, pad_scr, cat_scr,
                  *, stride: int, has_ds: bool):
    ipp, H, W, cin = x_ref.shape
    width = w1_ref.shape[1]
    nb = w2_ref.shape[1]
    cout = w3_ref.shape[1]
    M = ipp * H * W

    x = x_ref[:].reshape(M, cin)

    # conv1 (1x1) + bn1 + relu -> padded VMEM scratch
    h1 = jnp.maximum(
        jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:], 0.0).astype(x_ref.dtype)
    pad_scr[:] = jnp.zeros(pad_scr.shape, pad_scr.dtype)
    pad_scr[:, 1:H + 1, 1:W + 1, :] = h1.reshape(ipp, H, W, width)

    # conv2 (3x3 grouped, groups packed into BS-wide diagonal blocks),
    # computed at full resolution (stride applied by subsampling below).
    # The 9 taps are concatenated along K so each channel block is ONE
    # [M, 9*BS] x [9*BS, BS] matmul — big-K keeps the MXU pipeline full
    # (9 separate K=BS dots measured ~2.5x slower; a flat-layout variant
    # with contiguous tap slices measured 2.3x slower still: Mosaic
    # relayouts arbitrary-offset slices of the large flat buffer).
    h2_blocks = []
    for b in range(nb):
        for t in range(9):
            dy, dx = t // 3, t % 3
            cat_scr[:, t * BS:(t + 1) * BS] = pad_scr[
                :, dy:dy + H, dx:dx + W,
                b * BS:(b + 1) * BS].reshape(M, BS)
        w_b = w2_ref[:, b].reshape(9 * BS, BS)
        h2_blocks.append(jnp.dot(
            cat_scr[:], w_b, preferred_element_type=jnp.float32))
    h2 = jnp.concatenate(h2_blocks, axis=-1) if nb > 1 else h2_blocks[0]
    h2 = jnp.maximum(h2 + b2_ref[:], 0.0).astype(x_ref.dtype)
    h2 = h2.reshape(ipp, H, W, width)

    if stride == 2:
        # ::2 subsampling expressed as reshape + unit slice (Mosaic lowers
        # slices; >2D strided gathers it does not)
        Ho, Wo = H // 2, W // 2

        def every_other(a, C):
            a = a.reshape(ipp, Ho, 2, Wo, 2, C)
            a = jax.lax.slice(
                a, (0, 0, 0, 0, 0, 0), (ipp, Ho, 1, Wo, 1, C))
            return a.reshape(ipp * Ho * Wo, C)

        h2 = every_other(h2, width)
        x_id = every_other(x_ref[:], cin)
    else:
        h2 = h2.reshape(M, width)
        x_id = x

    # conv3 (1x1) + bn3 + residual + relu
    y = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32) \
        + b3_ref[:]
    if has_ds:
        identity = jnp.dot(x_id, wd_ref[:],
                           preferred_element_type=jnp.float32) + bd_ref[:]
    else:
        identity = x_id.astype(jnp.float32)
    out = jnp.maximum(y + identity, 0.0).astype(out_ref.dtype)
    out_ref[:] = out.reshape(out_ref.shape)


VMEM_LIMIT = 64 * 1024 * 1024  # v5e VMEM is 128 MiB; leave headroom


def _images_per_program(H: int, W: int, cin: int, width: int, cout: int,
                        nb: int) -> int:
    """Largest power-of-two image count fitting the raised VMEM budget:
    in/out blocks are double-buffered across the grid; the tap-concat
    scratch and h2/identity temps dominate the per-image set."""
    per_img = (2 * H * W * cin * 2      # x block (bf16, double-buffered)
               + 2 * H * W * cout * 2   # out block (double-buffered)
               + (H + 2) * (W + 2) * width * 2   # padded h1 scratch
               + H * W * 9 * BS * 2              # tap-concat scratch
               + H * W * width * 4               # h2 f32 temp
               + H * W * cout * 4)      # conv3/identity f32 temps
    weights = (cin * width + width * cout + cin * cout) * 2 \
        + 9 * nb * BS * BS * 2
    budget = int(VMEM_LIMIT * 0.7) - weights
    ipp = max(1, budget // per_img)
    return 1 << (ipp.bit_length() - 1)


def fused_bottleneck_forward(
    x: jax.Array,
    fw: Dict[str, jax.Array],
    *,
    stride: int = 1,
) -> jax.Array:
    """x: [B, H, W, Cin]; fw: fold_block_params output. Returns
    [B, H/stride, W/stride, Cout]."""
    B, H, W, cin = x.shape
    width = fw["w1"].shape[1]
    cout = fw["w3"].shape[1]
    nb = fw["w2"].shape[1]
    has_ds = "wd" in fw
    Ho, Wo = H // stride, W // stride

    ipp = _images_per_program(H, W, cin, width, cout, nb)
    ipp = min(ipp, B)
    while B % ipp:
        ipp //= 2

    wd = fw.get("wd", jnp.zeros((cin, cout), fw["w1"].dtype))
    bd = fw.get("bd", jnp.zeros((cout,), jnp.float32))

    kernel = functools.partial(_block_kernel, stride=stride, has_ds=has_ds)
    # conv1 + conv2 (full-res, BS-packed) + conv3 + optional downsample
    flops = 2 * B * H * W * (cin * width + 9 * width * BS) \
        + 2 * B * Ho * Wo * (width * cout + (cin * cout if has_ds else 0))
    return pl.pallas_call(
        kernel,
        grid=(B // ipp,),
        in_specs=[
            pl.BlockSpec((ipp, H, W, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, nb, BS, BS), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((width, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ipp, Ho, Wo, cout),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((ipp, H + 2, W + 2, width), x.dtype),
            pltpu.VMEM((ipp * H * W, 9 * BS), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=x.size * 2 + B * Ho * Wo * cout * 2),
        interpret=_interpret(),
    )(x, fw["w1"], fw["b1"].reshape(1, -1), fw["w2"],
      fw["b2"].reshape(1, -1), fw["w3"], fw["b3"].reshape(1, -1),
      wd, bd.reshape(1, -1))


# ---------------------------------------------------------------------------
# XLA reference (oracle + backward path)
# ---------------------------------------------------------------------------

def bottleneck_reference(x: jax.Array, fw: Dict[str, jax.Array],
                         *, stride: int = 1) -> jax.Array:
    """Same math in plain XLA ops (block-diag weights unpacked); used as
    the numerical oracle and for the (never-hot) backward."""
    B, H, W, cin = x.shape
    width = fw["w1"].shape[1]
    nb = fw["w2"].shape[1]
    h1 = jax.nn.relu(
        (x.reshape(-1, cin) @ fw["w1"]).astype(jnp.float32) + fw["b1"])
    h1 = h1.astype(x.dtype).reshape(B, H, W, width)
    # unpack [9, nb, BS, BS] -> dense HWIO [3, 3, W, W]
    dense = jnp.zeros((9, width, width), fw["w2"].dtype)
    for b in range(nb):
        dense = dense.at[:, b * BS:(b + 1) * BS,
                         b * BS:(b + 1) * BS].set(fw["w2"][:, b])
    whwio = dense.reshape(3, 3, width, width)
    dn = jax.lax.conv_dimension_numbers(
        h1.shape, whwio.shape, ("NHWC", "HWIO", "NHWC"))
    h2 = jax.lax.conv_general_dilated(
        h1, whwio, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=dn)
    h2 = jax.nn.relu(h2.astype(jnp.float32) + fw["b2"]).astype(x.dtype)
    Ho, Wo = H // stride, W // stride
    y = (h2.reshape(-1, width) @ fw["w3"]).astype(jnp.float32) + fw["b3"]
    if "wd" in fw:
        x_id = x[:, ::stride, ::stride, :].reshape(-1, cin)
        identity = (x_id @ fw["wd"]).astype(jnp.float32) + fw["bd"]
    else:
        identity = x[:, ::stride, ::stride, :].reshape(
            -1, cin).astype(jnp.float32)
    out = jax.nn.relu(y + identity).astype(x.dtype)
    return out.reshape(B, Ho, Wo, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_bottleneck(x, fw, stride: int = 1):
    """Differentiable wrapper: Pallas forward, XLA-reference backward
    (the trunk is frozen on the hot path, so backward never runs there)."""
    return fused_bottleneck_forward(x, fw, stride=stride)


def _fb_fwd(x, fw, stride):
    return fused_bottleneck_forward(x, fw, stride=stride), (x, fw)


def _fb_bwd(stride, res, g):
    x, fw = res
    _, vjp = jax.vjp(lambda x_, fw_: bottleneck_reference(
        x_, fw_, stride=stride), x, fw)
    return vjp(g)


fused_bottleneck.defvjp(_fb_fwd, _fb_bwd)
