"""Fused ResNeXt bottleneck block in batch-in-sublanes [H, Bq, W, Bs, C]
layout (Bs = 16 batch lanes in the VMEM sublane dimension, Bq = B/16).

Round-2 device traces (BENCH_NOTES.md) showed the frozen-trunk forward is
HBM-bandwidth-bound: XLA's conv fusions move ~4x the activation footprint
because 3x3 convolutions re-read their input-window taps from HBM, and the
first fused-block kernel (ops/bottleneck.py, [B, H, W, C] layout) lost its
traffic win to VPU-side sublane shuffles — with W in the sublane dimension,
every dx-shifted tap slice is a relayout.

This kernel changes the *layout*, not the algorithm. Two constraints pin
the dimension order:

- tap slices must be free: the (sublane, lane) VMEM tile has to be
  (batch, channel) so that h1[k+dy, :, dx:dx+W] is pure tile addressing
  (leading-dim offset dy, major-dim offset dx) — zero shuffles;
- HBM DMA must be contiguous: with ALL of B in the sublane dim a
  batch-tiled grid reads 8 KB stripes at 128 KB stride (~measured
  295 GB/s, 36% of the v5e's HBM); splitting B as [Bq, ..., 16] makes a
  (row, bq) grid cell one 448 KB contiguous stripe per (h, bq).

The whole chain

    conv1(1x1) + bn1 + relu
    -> conv2(3x3, 32 groups packed block-diagonal to 128 lanes, stride 1|2)
    -> conv3(1x1) + bn3 + residual(+ 1x1/stride-2 downsample) + relu

runs per (batch-tile, row-band) grid cell with one HBM read of the block
input (+ a 2-row halo) and one write of the output. The grouped conv is
nine accumulating K=128 dots straight off the tap slices (tile-addressed
loads feed the MXU; measured at MXU peak).

Row halos without manual DMA: the input is passed three times — the main
band plus two single-row views whose index maps address rows band*hh - 1
and band*hh + hh (clamped at the edges; the kernel zeroes the h1 halo row
at the image boundary to reproduce conv zero-padding). Single-row blocks
make 1-row offsets expressible in BlockSpec units, and Pallas pipelines /
double-buffers all three streams.

stride-2 blocks evaluate conv2 only at even output positions: even *rows*
are free (leading-dim slice); even *columns* use a pair-reshape
([.., Wp, ..] -> [.., Wp//2, 2, ..] -> take slot 0/1), which only touches
major dims and therefore stays relayout-free.

BN is inference-mode (frozen trunk) and folded into weights/biases outside
the kernel (fold_block_params below). The trunk is frozen on the
hot path (stop_gradient in models/vision.py); the custom VJP backward
differentiates the XLA reference for completeness.

Reference workload anchor: the frozen CNN forward of
multimodal/multimodal.py:88-104 — all the FLOPs of the published CVCL
recipe live here.
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_bottleneck_hwbc", "hwbc_reference", "fold_block_params",
    "pack_grouped_kernel", "bottleneck_reference", "to_hwbc", "from_hwbc",
    "BS",
]

BS = 128   # MXU lane tile: groups are packed into BS-wide diagonal blocks
BSUB = 16  # batch lanes in the sublane dimension (bf16 min tile is 16)


def VMEM_LIMIT() -> int:
    """Compiler VMEM cap per pallas_call, bytes. v5e VMEM is 128 MiB;
    leave headroom. MMB_HWBC_VMEM (MiB) overrides — the one-band
    whole-stage plans sit just above 100 MiB by arithmetic. Read at
    call time (not import) so queue scripts and test monkeypatches can
    set it after the package is imported."""
    return int(os.environ.get("MMB_HWBC_VMEM", "100")) * 1024 * 1024


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


# ---------------------------------------------------------------------------
# weight preparation (XLA, negligible cost — weights are tiny).
# Shared by every trunk kernel variant and by ops/quant's int8 folds.
# ---------------------------------------------------------------------------

def pack_grouped_kernel(w: jax.Array, groups: int) -> jax.Array:
    """Grouped conv kernel [3, 3, cg, W] (HWIO, feature_group_count=G) ->
    block-diagonal compact form [9, nb, BS, BS] where nb = W // BS.

    Tap t = ky*3+kx; block b holds the [BS, BS] diagonal block of the
    dense-ified [W_in, W_out] matrix for that tap (off-group entries zero).
    On the MXU a grouped matmul with N=cg lanes runs at cg/128
    utilization, so packing groups to N=128 is FLOP-optimal for any group
    width — the extra multiply-by-zero FLOPs are free vs the lane limit.
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


def bottleneck_reference(x: jax.Array, fw: Dict[str, jax.Array],
                         *, stride: int = 1) -> jax.Array:
    """One bottleneck block in plain XLA ops, [B, H, W, C] layout
    (block-diag weights unpacked); the numerical oracle for every kernel
    variant and the (never-hot) backward of the custom VJPs."""
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


def to_hwbc(x: jax.Array, bsub: int = BSUB) -> jax.Array:
    """[B, H, W, C] -> [H, B/bsub, W, bsub, C].

    bsub = batch lanes in the VMEM sublane dimension: 16 for bf16 (min
    tile (16, 128)), 32 for int8 (min tile (32, 128)).

    Formulated transpose -> reshape -> transpose (instead of splitting B
    first): when the producer left the tensor in a batch-minor layout
    (XLA's choice after the small-channel stem/pool), the leading
    transpose is a free bitcast and XLA needs one physical copy instead
    of two (-0.45 ms/step at B=256, measured).

    MMB_TO_HWBC=rt selects the reshape-first formulation (split B in
    the [B, H, W, C] frame, one logical transpose) — same result;
    built because the round-4 B=1024 trace shows the default STILL
    paying two physical passes at that batch (copy.163 +
    copy_bitcast_fusion.14, ~4.4 ms/step); which form XLA folds to one
    copy is empirical per batch/layout."""
    b, h, w, c = x.shape
    if os.environ.get("MMB_TO_HWBC", "trt") == "rt":
        t = x.reshape(b // bsub, bsub, h, w, c)
        return jnp.transpose(t, (2, 0, 3, 1, 4))
    t = jnp.transpose(x, (1, 2, 3, 0))
    t = t.reshape(h, w, c, b // bsub, bsub)
    return jnp.transpose(t, (0, 3, 1, 4, 2))


def from_hwbc(x: jax.Array) -> jax.Array:
    """[H, B/16, W, 16, C] -> [B, H, W, C]."""
    h, bq, w, bs, c = x.shape
    return jnp.transpose(x, (1, 3, 0, 2, 4)).reshape(bq * bs, h, w, c)


def _requant(acc, a, b, dt):
    """Unified epilogue: per-channel madd + relu (+ int8 round/clip).

    bf16 path: a is all-ones (the madd fuses into one VPU op). int8 path:
    acc is the int32 dot result, a = s_in*s_w_c/s_out, b = bias_c/s_out,
    and the clip-from-0 IS the relu (activations are non-negative)."""
    y = acc.astype(jnp.float32) * a + b
    if dt == jnp.int8:
        return jnp.clip(jnp.round(y), 0, 127).astype(dt)
    return jnp.maximum(y, 0.0).astype(dt)


def _kernel(*refs,
            stride: int, has_ds: bool, hh: int, R: int, W: int, Bq: int,
            bsub: int = BSUB,
            parts: str = "all", conv3_mode: str = "scratch",
            n_h_static: int = 0):
    """Fused bottleneck block body (bf16 or int8 — one code path; see
    _requant). Grid mode (n_h_static == 0): the band index comes from the
    Pallas grid. Tile mode (n_h_static > 0): the caller runs one band per
    call (XLA-fed VMEM operands) and passes the band index as a leading
    SMEM scalar."""
    if n_h_static:
        ih_ref, refs = refs[0], refs[1:]
    (x_lo_ref, x_main_ref, x_hi_ref, w1_ref, a1_ref, b1_ref, w2_ref,
     a2_ref, b2_ref, w3_ref, a3_ref, b3_ref, wd_ref, ad_ref, bd_ref,
     ai_ref, out_ref, h1pad, h2_scr) = refs
    cin = w1_ref.shape[0]
    width = w1_ref.shape[1]
    cout = w3_ref.shape[1]
    nb = w2_ref.shape[1]
    dt = out_ref.dtype
    # int8-TRANSPORT mode (int8 I/O, bf16 weights/dots): intermediates
    # and dot accumulation follow the WEIGHT dtype; only the final
    # epilogue (keyed on the out dtype) round/clips back to int8
    dt_mid = w1_ref.dtype
    BSUB = bsub
    pref = jnp.int32 if dt_mid == jnp.int8 else jnp.float32
    if n_h_static:
        i_h = ih_ref[0]
        n_h = n_h_static
    else:
        i_h = pl.program_id(1)
        n_h = pl.num_programs(1)
    hin = stride * hh            # main-band input rows
    Wo = W // stride
    Wp = h1pad.shape[2]          # W + 2 (s1) or W + 4 (s2, even)

    if parts == "copy":  # perf dissection: pure DMA in -> out (cin==cout)
        for k0 in range(0, hh, R):
            out_ref[k0:k0 + R] = x_main_ref[k0:k0 + R][..., :cout]
        return

    # zero the W-pad columns (cols [0] and [W+1 .. Wp-1])
    for c in range(Wp):
        if c == 0 or c > W:
            h1pad[:, :, c] = jnp.zeros((hin + 2, Bq, BSUB, width), dt_mid)

    def conv1(v, rows):
        m = rows * Bq * W * BSUB
        # .astype is a no-op except in transport mode (int8 x -> bf16)
        h = jnp.dot(v.reshape(m, cin).astype(dt_mid), w1_ref[:],
                    preferred_element_type=pref)
        h = _requant(h, a1_ref[0], b1_ref[0], dt_mid)
        return h.reshape(rows, Bq, W, BSUB, width)

    # h1pad row r holds conv1 of input row (band_start - 1 + r)
    h1pad[1:hin + 1, :, 1:W + 1] = conv1(x_main_ref[:], hin)
    h1pad[0:1, :, 1:W + 1] = conv1(x_lo_ref[:], 1)
    if stride == 1:
        h1pad[hin + 1:hin + 2, :, 1:W + 1] = conv1(x_hi_ref[:], 1)
    # else: row hin+1 is never selected by the even-row slice (see below)

    # conv zero-padding at the image boundary: the halo index maps clamp,
    # so overwrite the halo h1 rows with zeros there
    @pl.when(i_h == 0)
    def _():
        h1pad[0] = jnp.zeros((Bq, Wp, BSUB, width), dt_mid)

    if stride == 1:
        @pl.when(i_h == n_h - 1)
        def _():
            h1pad[hin + 1] = jnp.zeros((Bq, Wp, BSUB, width), dt_mid)

    def tap_slice(k0, b, t):
        dy, dx = divmod(t, 3)
        if stride == 1:
            tap = h1pad[k0 + dy:k0 + dy + R, :, dx:dx + W, :,
                        b * BS:(b + 1) * BS]
        else:
            v = h1pad[2 * k0 + dy:2 * k0 + dy + 2 * R, :, :, :,
                      b * BS:(b + 1) * BS]
            # even rows: offset dy already applied, take slot 0
            v = v.reshape(R, 2, Bq, Wp, BSUB, BS)[:, 0]
            # even output columns: pad col index = 2*w + dx
            vp = v.reshape(R, Bq, Wp // 2, 2, BSUB, BS)
            if dx < 2:
                tap = vp[:, :, 0:Wo, dx]
            else:
                tap = vp[:, :, 1:Wo + 1, 0]
        return tap.reshape(R * Bq * Wo * BSUB, BS)

    if parts == "c1only":  # perf dissection: conv1 + DMA in/out only
        for k0 in range(0, hh, R):
            if stride == 1:
                chunk = h1pad[k0 + 1:k0 + 1 + R, :, 1:W + 1]
            else:
                v = h1pad[2 * k0 + 1:2 * k0 + 1 + 2 * R, :, 1:W + 1]
                v = v.reshape(R, 2, Bq, W, BSUB, width)[:, 0]
                chunk = v.reshape(R, Bq, W // 2, 2, BSUB, width)[:, :, :, 0]
            reps = max(1, cout // width)
            out_ref[k0:k0 + R] = jnp.concatenate(
                [chunk] * reps, axis=-1)[..., :cout].astype(dt)
        return

    for k0 in range(0, hh, R):
        m = R * Bq * Wo * BSUB
        if parts == "noc2":  # perf dissection: bypass the grouped conv
            if stride == 1:
                h2_scr[:] = h1pad[k0 + 1:k0 + 1 + R, :, 1:W + 1]
            else:
                v = h1pad[2 * k0 + 1:2 * k0 + 1 + 2 * R, :, 1:W + 1]
                v = v.reshape(R, 2, Bq, W, BSUB, width)[:, 0]
                h2_scr[:] = v.reshape(
                    R, Bq, W // 2, 2, BSUB, width)[:, :, :, 0]
        # grouped 3x3 conv: groups packed into BS-wide diagonal blocks;
        # nine accumulating K=BS dots straight off the tap slices
        # (zero copies: tile-addressed loads feed the MXU)
        y = None
        for b in range(nb if parts != "noc2" else 0):
            h2b = jnp.dot(tap_slice(k0, b, 0), w2_ref[0, b],
                          preferred_element_type=pref)
            for t in range(1, 9):
                h2b = h2b + jnp.dot(tap_slice(k0, b, t), w2_ref[t, b],
                                    preferred_element_type=pref)
            h2b = _requant(h2b, a2_ref[0, b * BS:(b + 1) * BS],
                           b2_ref[0, b * BS:(b + 1) * BS], dt_mid)
            if conv3_mode == "accum":
                # conv3 folded in: consume h2 block while it's hot
                # (skips the h2 VMEM round trip)
                yb = jnp.dot(h2b, w3_ref[b * BS:(b + 1) * BS, :],
                             preferred_element_type=pref)
                y = yb if y is None else y + yb
            else:
                h2_scr[..., b * BS:(b + 1) * BS] = h2b.reshape(
                    R, Bq, Wo, BSUB, BS)

        # conv3 + bn3 + residual + relu
        if not (conv3_mode == "accum" and y is not None):
            y = jnp.dot(h2_scr[:].reshape(m, width), w3_ref[:],
                        preferred_element_type=pref)
        y = y.astype(jnp.float32) * a3_ref[0] + b3_ref[0]
        if stride == 1:
            xid = x_main_ref[k0:k0 + R].reshape(m, cin)
        else:
            v = x_main_ref[2 * k0:2 * k0 + 2 * R]
            v = v.reshape(R, 2, Bq, W, BSUB, cin)[:, 0]
            xid = v.reshape(R, Bq, Wo, 2, BSUB, cin)[:, :, :, 0].reshape(
                m, cin)
        if has_ds:
            ident = jnp.dot(xid.astype(dt_mid), wd_ref[:],
                            preferred_element_type=pref
                            ).astype(jnp.float32) * ad_ref[0] + bd_ref[0]
        else:
            ident = xid.astype(jnp.float32) * ai_ref[0]
        if parts == "nores":  # perf dissection: skip the residual path
            ident = 0.0
        v_out = y + ident
        if dt == jnp.int8:
            v_out = jnp.clip(jnp.round(v_out), 0, 127)
        else:
            v_out = jnp.maximum(v_out, 0.0)
        out_ref[k0:k0 + R] = v_out.astype(dt).reshape(
            R, Bq, Wo, BSUB, cout)


def _pick_band(ho: int, stride: int) -> int:
    """Largest divisor of the output height whose input band is <= 14 rows
    (VMEM: stride-2 blocks read 2x rows per output row)."""
    for hh in range(min(ho, 14 // stride), 0, -1):
        if ho % hh == 0:
            return hh
    return ho


def fused_bottleneck_hwbc(
    x: jax.Array,
    fw: Dict[str, jax.Array],
    *,
    stride: int = 1,
    Bc: int | None = None,
    hh: int | None = None,
    R: int | None = None,
    parts: str = "all",
    conv3_mode: str = "scratch",
) -> jax.Array:
    """x: [H, B/bsub, W, bsub, Cin] (batch-in-sublanes, see to_hwbc;
    bsub 16 for bf16, 32 for int8); fw: fold_block_params output (bf16)
    or ops.quant.fold_block_params_q output (int8). Bc = batch per grid
    cell (multiple of bsub). Returns [H/stride, B/bsub, W/stride, bsub,
    Cout] in the same layout."""
    from multimodal_baby_tpu.ops.quant import with_unit_scales
    H, nBq, W, bsub, cin = x.shape
    assert bsub in (16, 32)
    if Bc is None:
        Bc = bsub
    assert Bc % bsub == 0
    Bq = Bc // bsub
    fw = with_unit_scales(fw)
    width = fw["w1"].shape[1]
    cout = fw["w3"].shape[1]
    nb = fw["w2"].shape[1]
    has_ds = "wd" in fw
    Ho, Wo = H // stride, W // stride

    if hh is None or (stride * hh > 14 and Ho % (14 // stride) == 0):
        hh = _pick_band(Ho, stride)
    if R is None:
        R = next(r for r in (7, 4, 2, 1) if hh % r == 0)
    assert Ho % hh == 0 and hh % R == 0 and nBq % Bq == 0
    hin = stride * hh
    grid = (nBq // Bq, Ho // hh)

    # tiny placeholders when no downsample / no identity-rescale: the
    # kernel never reads them (has_ds is static), so don't waste
    # HBM->VMEM traffic on zeros
    wd = fw.get("wd", jnp.zeros((8, BS), fw["w1"].dtype))
    ad = fw.get("ad", jnp.ones((BS,), jnp.float32))
    bd = fw.get("bd", jnp.zeros((BS,), jnp.float32))
    ai = fw.get("ai", jnp.ones((cout,), jnp.float32))

    def const_map(n):
        return lambda ib, ih: (0,) * n

    def wspec(shape):
        return pl.BlockSpec(shape, const_map(len(shape)),
                            memory_space=pltpu.VMEM)

    in_specs = [
        # halo row before the band (clamped at row 0)
        pl.BlockSpec((1, Bq, W, bsub, cin),
                     lambda ib, ih: (jnp.maximum(ih * hin - 1, 0),
                                     ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        # main band
        pl.BlockSpec((hin, Bq, W, bsub, cin),
                     lambda ib, ih: (ih, ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        # halo row after the band (clamped; unused for stride 2 but kept
        # for a uniform signature)
        pl.BlockSpec((1, Bq, W, bsub, cin),
                     lambda ib, ih: (jnp.minimum(ih * hin + hin, H - 1),
                                     ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        wspec((cin, width)), wspec((1, width)), wspec((1, width)),
        wspec((9, nb, BS, BS)), wspec((1, width)), wspec((1, width)),
        wspec((width, cout)), wspec((1, cout)), wspec((1, cout)),
        wspec(wd.shape), wspec((1, ad.shape[0])), wspec((1, bd.shape[0])),
        wspec((1, cout)),
    ]

    Wp = W + 2 if stride == 1 else W + 4
    kernel = functools.partial(
        _kernel, stride=stride, has_ds=has_ds, hh=hh, R=R, W=W, Bq=Bq,
        bsub=bsub, parts=parts, conv3_mode=conv3_mode)

    B = nBq * bsub
    # conv1 over hin+2 rows, conv2 at output resolution (rows already
    # strided; columns via pair-reshape), conv3/downsample at output res
    flops_per_img = (2 * (hin + 2) / hin * Ho * W * cin * width
                     + 2 * Ho * Wo * 9 * BS * width
                     + 2 * Ho * Wo * (width * cout
                                      + (cin * cout if has_ds else 0)))
    isz = x.dtype.itemsize
    bytes_img = (H * W * cin * (1 + 2 / hin) + Ho * Wo * cout) * isz

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((hh, Bq, Wo, bsub, cout),
                               lambda ib, ih: (ih, ib, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ho, nBq, Wo, bsub, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hin + 2, Bq, Wp, bsub, width), fw["w1"].dtype),
            pltpu.VMEM((R, Bq, Wo, bsub, width), fw["w1"].dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT()),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_img * B), transcendentals=0,
            bytes_accessed=int(bytes_img * B)),
        interpret=_interpret(),
    )(x, x, x, fw["w1"], fw["a1"].reshape(1, -1), fw["b1"].reshape(1, -1),
      fw["w2"], fw["a2"].reshape(1, -1), fw["b2"].reshape(1, -1),
      fw["w3"], fw["a3"].reshape(1, -1), fw["b3"].reshape(1, -1),
      wd, ad.reshape(1, -1), bd.reshape(1, -1), ai.reshape(1, -1))


# ---------------------------------------------------------------------------
# XLA-fed tile mode: the Pallas/Mosaic DMA engine path measures ~340 GB/s
# aggregate on this v5e while XLA's own data movement runs at ~813 GB/s
# (BENCH_NOTES.md). Here each band tile is sliced and VMEM-"colored" by
# XLA (pltpu.with_memory_space_constraint), so the bytes ride XLA's copy
# path (~700 GB/s measured, async copy-start/done overlapping the kernel)
# and the gridless kernel touches HBM only for its (small) weights.
# ---------------------------------------------------------------------------

def fused_bottleneck_tiles(
    x: jax.Array,
    fw: Dict[str, jax.Array],
    *,
    stride: int = 1,
    Bc: int = 16,
    hh: int | None = None,
    R: int | None = None,
) -> jax.Array:
    """Same math as fused_bottleneck_hwbc, but banded over an XLA scan
    with VMEM-constrained operands instead of a Pallas grid. Tile sizes
    must stay within XLA's alternate-memory coloring budget (~6-8 MB of
    operands+results per call on v5e)."""
    from multimodal_baby_tpu.ops.quant import with_unit_scales
    H, nBq, W, bsub, cin = x.shape
    assert bsub == BSUB and Bc % BSUB == 0
    Bq = Bc // BSUB
    fw = with_unit_scales(fw)
    width = fw["w1"].shape[1]
    cout = fw["w3"].shape[1]
    nb = fw["w2"].shape[1]
    has_ds = "wd" in fw
    Ho, Wo = H // stride, W // stride

    if hh is None:
        # bound main-tile bytes to ~3.2 MB for the coloring budget
        row_bytes = Bq * W * BSUB * cin * 2
        cap = max(1, (3_300_000 // row_bytes) // stride)
        hh = next((h for h in range(min(Ho, cap), 0, -1) if Ho % h == 0), 1)
    if R is None:
        R = next(r for r in (7, 5, 4, 3, 2, 1) if hh % r == 0)
    assert Ho % hh == 0 and hh % R == 0 and nBq % Bq == 0
    hin = stride * hh
    n_h = Ho // hh
    n_b = nBq // Bq

    wd = fw.get("wd", jnp.zeros((8, BS), fw["w1"].dtype))
    ad = fw.get("ad", jnp.ones((BS,), jnp.float32))
    bd = fw.get("bd", jnp.zeros((BS,), jnp.float32))
    ai = fw.get("ai", jnp.ones((cout,), jnp.float32))
    Wp = W + 2 if stride == 1 else W + 4

    kernel = functools.partial(
        _kernel, stride=stride, has_ds=has_ds, hh=hh, R=R, W=W, Bq=Bq,
        n_h_static=n_h)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    scoped = (((hin + 2) * Bq * Wp * BSUB * width
               + R * Bq * Wo * BSUB * width) * 2
              + R * Bq * Wo * BSUB * max(width, cout) * 12 + (1 << 21))

    def tile_call(ih, lo, main, hi):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [vspec] * 16,
            out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct((hh, Bq, Wo, BSUB, cout),
                                           x.dtype),
            scratch_shapes=[
                pltpu.VMEM((hin + 2, Bq, Wp, BSUB, width), x.dtype),
                pltpu.VMEM((R, Bq, Wo, BSUB, width), x.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(int(scoped), VMEM_LIMIT())),
            interpret=_interpret(),
        )(ih, lo, main, hi, fw["w1"], fw["a1"].reshape(1, -1),
          fw["b1"].reshape(1, -1), fw["w2"], fw["a2"].reshape(1, -1),
          fw["b2"].reshape(1, -1), fw["w3"], fw["a3"].reshape(1, -1),
          fw["b3"].reshape(1, -1), wd, ad.reshape(1, -1),
          bd.reshape(1, -1), ai.reshape(1, -1))

    def vmem(a):
        if _interpret():
            return a
        return pltpu.with_memory_space_constraint(a, pltpu.VMEM)

    def body(out, idx):
        ib = idx // n_h
        ih = idx % n_h
        start = ih * hin
        bq0 = ib * Bq

        def rows(r0, n):
            sl = jax.lax.dynamic_slice(
                x, (r0, bq0, 0, 0, 0), (n, Bq, W, BSUB, cin))
            return vmem(sl)

        lo = rows(jnp.maximum(start - 1, 0), 1)
        main = rows(start, hin)
        hi = rows(jnp.minimum(start + hin, H - 1), 1)
        yt = tile_call(jnp.asarray(ih, jnp.int32).reshape(1), lo, main, hi)
        out = jax.lax.dynamic_update_slice(out, yt, (ih * hh, bq0, 0, 0, 0))
        return out, None

    out0 = jnp.zeros((Ho, nBq, Wo, BSUB, cout), x.dtype)
    # unroll: XLA's async copy-start/copy-done for tile i+1 can then
    # overlap tile i's kernel (iterations only chain through the cheap
    # output-update slices)
    out, _ = jax.lax.scan(body, out0, jnp.arange(n_b * n_h), unroll=4)
    return out


# ---------------------------------------------------------------------------
# whole-stage kernel (full spatial extent resident in VMEM per batch tile)
# ---------------------------------------------------------------------------

def _stage_kernel(*refs, strides, has_dss, W0, Bq, n_blocks,
                  width, cout, bsub: int = BSUB):
    """refs: x, then 13 weight refs per block
    (w1,a1,b1,w2,a2,b2,w3,a3,b3,wd,ad,bd,ai), then out_ref, then
    scratches (h1pad, tA, tB, h2_scr). bf16 or int8 (see _requant).

    Every block keeps its input, h1 and output in VMEM; HBM sees one read
    of the stage input and one write of the stage output. The full spatial
    extent is resident, so conv zero-padding is plain zeroed h1pad rows —
    no banding, no halo streams, no boundary conditionals."""
    NW = 13
    x_ref = refs[0]
    w_refs = refs[1:1 + NW * n_blocks]
    out_ref = refs[1 + NW * n_blocks]
    h1pad, tA, tB, h2_scr = refs[2 + NW * n_blocks:]
    dt = out_ref.dtype
    # int8-TRANSPORT mode (int8 I/O, bf16 weights/dots): intermediates
    # follow the weight dtype (h1pad/h2_scr scratches are allocated in it
    # by the caller); only the block-output epilogue (keyed on dt)
    # round/clips back to int8
    dt_mid = h1pad.dtype
    BSUB = bsub
    pref = jnp.int32 if dt_mid == jnp.int8 else jnp.float32

    Hj, Wj = x_ref.shape[0], W0          # current block input dims
    cur = x_ref
    for j in range(n_blocks):
        (w1, a1, b1, w2, a2, b2, w3, a3, b3, wd, ad, bd, ai) = \
            w_refs[NW * j:NW * j + NW]
        stride = strides[j]
        has_ds = has_dss[j]
        cin = w1.shape[0]
        nb = w2.shape[1]
        Ho, Wo = Hj // stride, Wj // stride
        Wp = Wj + 2 if stride == 1 else Wj + 4
        tout = out_ref if j == n_blocks - 1 else (tA, tB)[j % 2]

        # zero-pad strips for THIS block's extents (previous blocks may
        # have left larger extents dirty; strips shrink monotonically)
        for c in range(Wp):
            if c == 0 or c > Wj:
                h1pad[0:Hj + 2, :, c] = jnp.zeros(
                    (Hj + 2, Bq, BSUB, width), dt_mid)
        h1pad[0] = jnp.zeros(h1pad.shape[1:], dt_mid)
        h1pad[Hj + 1] = jnp.zeros(h1pad.shape[1:], dt_mid)

        # conv1 in row chunks (bounds the f32 pre-cast temp)
        for r0 in range(0, Hj, 8):
            rc = min(8, Hj - r0)
            m1 = rc * Bq * Wj * BSUB
            # .astype is a no-op except in transport mode (int8 -> bf16)
            h1 = jnp.dot(cur[r0:r0 + rc, :, 0:Wj].reshape(
                m1, cin).astype(dt_mid), w1[:],
                         preferred_element_type=pref)
            h1 = _requant(h1, a1[0], b1[0], dt_mid)
            h1pad[1 + r0:1 + r0 + rc, :, 1:Wj + 1] = h1.reshape(
                rc, Bq, Wj, BSUB, width)

        R = next(r for r in (7, 4, 2, 1) if Ho % r == 0)

        def tap_slice(k0, b, t, R=R, stride=stride, Wj=Wj, Wo=Wo, Wp=Wp):
            dy, dx = divmod(t, 3)
            if stride == 1:
                tap = h1pad[k0 + dy:k0 + dy + R, :, dx:dx + Wj, :,
                            b * BS:(b + 1) * BS]
            else:
                v = h1pad[2 * k0 + dy:2 * k0 + dy + 2 * R, :, 0:Wp, :,
                          b * BS:(b + 1) * BS]
                v = v.reshape(R, 2, Bq, Wp, BSUB, BS)[:, 0]
                vp = v.reshape(R, Bq, Wp // 2, 2, BSUB, BS)
                tap = vp[:, :, 0:Wo, dx] if dx < 2 else vp[:, :, 1:Wo + 1, 0]
            return tap.reshape(R * Bq * Wo * BSUB, BS)

        for k0 in range(0, Ho, R):
            m = R * Bq * Wo * BSUB
            # channel blocks processed as independent twin chains: the
            # f32 accumulate (VPU) of one chain can overlap the next dot
            # (MXU) of the other — a single chain ping-pongs the units
            for b0 in range(0, nb, 2):
                pair = [b for b in (b0, b0 + 1) if b < nb]
                accs = [jnp.dot(tap_slice(k0, b, 0), w2[0, b],
                                preferred_element_type=pref)
                        for b in pair]
                for t in range(1, 9):
                    accs = [acc + jnp.dot(tap_slice(k0, b, t), w2[t, b],
                                          preferred_element_type=pref)
                            for acc, b in zip(accs, pair)]
                for acc, b in zip(accs, pair):
                    h2b = _requant(acc, a2[0, b * BS:(b + 1) * BS],
                                   b2[0, b * BS:(b + 1) * BS], dt_mid)
                    h2_scr[0:R, :, 0:Wo, :, b * BS:(b + 1) * BS] = \
                        h2b.reshape(R, Bq, Wo, BSUB, BS)

            y = jnp.dot(h2_scr[0:R, :, 0:Wo].reshape(m, width), w3[:],
                        preferred_element_type=pref
                        ).astype(jnp.float32) * a3[0] + b3[0]
            if stride == 1:
                xid = cur[k0:k0 + R, :, 0:Wj].reshape(m, cin)
            else:
                v = cur[2 * k0:2 * k0 + 2 * R, :, 0:Wj]
                v = v.reshape(R, 2, Bq, Wj, BSUB, cin)[:, 0]
                xid = v.reshape(R, Bq, Wo, 2, BSUB, cin)[:, :, :, 0].reshape(
                    m, cin)
            if has_ds:
                ident = jnp.dot(xid.astype(dt_mid), wd[:],
                                preferred_element_type=pref
                                ).astype(jnp.float32) * ad[0] + bd[0]
            else:
                ident = xid.astype(jnp.float32) * ai[0]
            v_out = y + ident
            if dt == jnp.int8:
                v_out = jnp.clip(jnp.round(v_out), 0, 127)
            else:
                v_out = jnp.maximum(v_out, 0.0)
            tout[k0:k0 + R, :, 0:Wo] = v_out.astype(dt).reshape(
                R, Bq, Wo, BSUB, cout)

        cur, Hj, Wj = tout, Ho, Wo


def fused_stage_hwbc(
    x: jax.Array,
    fws: list,
    strides: list,
    *,
    Bc: int | None = None,
) -> jax.Array:
    """Whole ResNeXt stage as one Pallas call: x [H, B/bsub, W, bsub,
    Cin] -> [H/s, B/bsub, W/s, bsub, Cout]. Requires the full spatial
    extent of every intermediate to fit VMEM per batch tile (true for
    layer3/layer4; layer1/2 need banding — use fused_bottleneck_hwbc per
    block)."""
    from multimodal_baby_tpu.ops.quant import with_unit_scales
    H, nBq, W, bsub, cin0 = x.shape
    assert bsub in (16, 32)
    if Bc is None:
        Bc = bsub
    assert Bc % bsub == 0
    Bq = Bc // bsub
    fws = [with_unit_scales(fw) for fw in fws]
    n_blocks = len(fws)
    width = fws[0]["w1"].shape[1]
    cout = fws[0]["w3"].shape[1]
    s0 = strides[0]
    Ho, Wo = H // s0, W // s0
    assert all(s == 1 for s in strides[1:]), "stride only in the first block"
    assert all(fw["w1"].shape[1] == width and fw["w3"].shape[1] == cout
               for fw in fws)

    operands = [x]
    in_specs = [pl.BlockSpec((H, Bq, W, bsub, cin0),
                             lambda ib: (0, ib, 0, 0, 0),
                             memory_space=pltpu.VMEM)]

    def wspec(shape):
        n = len(shape)
        return pl.BlockSpec(shape, lambda ib, n=n: (0,) * n,
                            memory_space=pltpu.VMEM)

    has_dss = []
    for fw in fws:
        cin = fw["w1"].shape[0]
        nb = fw["w2"].shape[1]
        has_ds = "wd" in fw
        has_dss.append(has_ds)
        # tiny placeholders when no downsample (never read; has_ds static)
        wd = fw.get("wd", jnp.zeros((8, BS), fw["w1"].dtype))
        ad = fw.get("ad", jnp.ones((BS,), jnp.float32))
        bd = fw.get("bd", jnp.zeros((BS,), jnp.float32))
        ai = fw.get("ai", jnp.ones((cout,), jnp.float32))
        arrs = [fw["w1"], fw["a1"].reshape(1, -1), fw["b1"].reshape(1, -1),
                fw["w2"], fw["a2"].reshape(1, -1), fw["b2"].reshape(1, -1),
                fw["w3"], fw["a3"].reshape(1, -1), fw["b3"].reshape(1, -1),
                wd, ad.reshape(1, -1), bd.reshape(1, -1),
                ai.reshape(1, -1)]
        operands.extend(arrs)
        in_specs.extend(wspec(a.shape) for a in arrs)

    kernel = functools.partial(
        _stage_kernel, strides=tuple(strides), has_dss=tuple(has_dss),
        W0=W, Bq=Bq, n_blocks=n_blocks, width=width, cout=cout,
        bsub=bsub)

    flops_img = 0
    hj, wj, cj = H, W, cin0
    for fw, s in zip(fws, strides):
        cin = fw["w1"].shape[0]
        flops_img += 2 * hj * wj * cin * width
        hj, wj = hj // s, wj // s
        flops_img += 2 * hj * wj * (9 * BS * width + width * cout
                                    + (cin * cout if "wd" in fw else 0))

    B = nBq * bsub
    return pl.pallas_call(
        kernel,
        grid=(nBq // Bq,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Ho, Bq, Wo, bsub, cout),
                               lambda ib: (0, ib, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ho, nBq, Wo, bsub, cout), x.dtype),
        scratch_shapes=[
            # h1pad/h2 follow the WEIGHT dtype (transport mode: int8 I/O
            # tensors, bf16 intermediates); block outputs (tA/tB) cross
            # blocks in the I/O dtype
            pltpu.VMEM((H + 2, Bq, W + 4, bsub, width), fws[0]["w1"].dtype),
            pltpu.VMEM((Ho, Bq, Wo, bsub, cout), x.dtype),
            pltpu.VMEM((Ho, Bq, Wo, bsub, cout), x.dtype),
            pltpu.VMEM((7, Bq, Wo, bsub, width), fws[0]["w1"].dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT()),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_img * B), transcendentals=0,
            bytes_accessed=int((H * W * cin0 + Ho * Wo * cout) * 2 * B)),
        interpret=_interpret(),
    )(*operands)


# ---------------------------------------------------------------------------
# banded whole-stage kernel (layer1/layer2: full spatial extent exceeds
# VMEM, so bands of hh output rows flow through all blocks with trapezoid
# extents — each block's intermediate carries the halo rows the next 3x3
# conv needs, recomputed per band instead of re-read from HBM)
# ---------------------------------------------------------------------------

def _stage_margins(strides):
    """Rows of x needed beyond the aligned band, walking the chain
    backwards: a stride-1 3x3 block adds one row each side; the stride-2
    head block doubles and shifts ((p, q) -> (2p+1, 2q))."""
    pre = post = 0
    for s in reversed(strides):
        if s == 1:
            pre, post = pre + 1, post + 1
        else:
            pre, post = 2 * pre + 1, 2 * post
    return pre, post


class _HaloRow:
    """View of one packed-halo row as a [1, ...]-shaped pseudo-ref.

    The banded kernel used to take each halo row as its own operand (the
    full x array with a 1-row BlockSpec, pre+post slots). XLA materializes
    a distinct HBM copy of x per custom-call operand slot, which at
    layer-2 scale (1.6 GB x ~7 slots at B=1024) blew past HBM. The halo
    rows now arrive packed per band in ONE small operand; this shim keeps
    the kernel body written as if each row were its own ref."""

    def __init__(self, xh, idx):
        self.xh, self.idx = xh, idx

    def __getitem__(self, key):
        assert key == slice(None), key
        return self.xh[self.idx:self.idx + 1]


def _banded_kernel(*refs, metas, hh, W0, Bq, n_blocks, width, cout, pre,
                   post, R, bsub: int = BSUB):
    """refs: packed halo rows (one ref, [pre+post, Bq, W, bsub, cin], the
    band's pre rows then post rows; absent when pre+post == 0), x_main,
    9 weight refs per block, out_ref, scratches (h1pad, tA, tB, h2_scr).

    metas[j] = (ext_in, ext_out, off_in, post_in, stride, has_ds).
    Tensor t_j carries ext_j rows: the hh aligned output rows plus the
    halo margins consumed by downstream 3x3 convs. Out-of-image halo rows
    at the first/last band are zeroed in each block's h1 (the only path
    through which they influence aligned rows).

    bf16 mode and int8-TRANSPORT mode share this body: in transport the
    I/O dtype (dt) is int8 while intermediates follow the weight dtype
    (dt_mid, from the h1pad scratch); the output-scale factors are folded
    into w3/wd by the caller and the identity rides the per-block ai
    coefficient, so the only transport-specific work is the int8->bf16
    input convert and the round/clip epilogue."""
    NW = 9
    nh = 1 if (pre + post) else 0
    xh = refs[0] if nh else None      # packed halo rows [pre+post, ...]
    x_main = refs[nh]
    w_refs = refs[nh + 1:nh + 1 + NW * n_blocks]
    out_ref = refs[nh + 1 + NW * n_blocks]
    h1pad, tA, tB, h2_scr = refs[nh + 2 + NW * n_blocks:]
    x_halo_pre = [_HaloRow(xh, d) for d in range(pre)]
    x_halo_post = [_HaloRow(xh, pre + d) for d in range(post)]
    dt = out_ref.dtype
    dt_mid = h1pad.dtype
    BSUB = bsub
    i_h = pl.program_id(1)
    n_h = pl.num_programs(1)

    cur = None  # block 0 reads the x pieces directly
    Wj = W0
    for j in range(n_blocks):
        (w1, b1, w2, b2, w3, b3, wd, bd, ai) = w_refs[NW * j:NW * j + NW]
        ext_in, ext_out, off_in, post_in, stride, has_ds = metas[j]
        cin = w1.shape[0]
        nb = w2.shape[1]
        Wo = Wj // stride
        Wp = Wj + 2 if stride == 1 else Wj + 4
        tout = out_ref if j == n_blocks - 1 else (tA, tB)[j % 2]

        # W-pad strips for this block's width
        for c in range(Wp):
            if c == 0 or c > Wj:
                h1pad[0:ext_in, :, c] = jnp.zeros(
                    (ext_in, Bq, BSUB, width), dt_mid)

        def conv1(v, rows, w1=w1, b1=b1, cin=cin, Wj=Wj):
            m = rows * Bq * Wj * BSUB
            # .astype is a no-op except in transport mode (int8 -> bf16)
            h = jnp.dot(v.reshape(m, cin).astype(dt_mid), w1[:],
                        preferred_element_type=jnp.float32)
            return jnp.maximum(h + b1[0], 0.0).astype(dt_mid).reshape(
                rows, Bq, Wj, BSUB, width)

        if j == 0:
            for d in range(pre):
                h1pad[d:d + 1, :, 1:Wj + 1] = conv1(x_halo_pre[d][:], 1)
            nmain = x_main.shape[0]
            for r0 in range(0, nmain, 8):
                rc = min(8, nmain - r0)
                h1pad[pre + r0:pre + r0 + rc, :, 1:Wj + 1] = conv1(
                    x_main[r0:r0 + rc], rc)
            for d in range(post):
                h1pad[pre + nmain + d:pre + nmain + d + 1, :, 1:Wj + 1] = \
                    conv1(x_halo_post[d][:], 1)
        else:
            for r0 in range(0, ext_in, 8):
                rc = min(8, ext_in - r0)
                h1pad[r0:r0 + rc, :, 1:Wj + 1] = conv1(
                    cur[r0:r0 + rc, :, 0:Wj], rc)

        # out-of-image halo rows are zero by conv semantics
        @pl.when(i_h == 0)
        def _():
            for r in range(off_in):
                h1pad[r] = jnp.zeros(h1pad.shape[1:], dt_mid)

        @pl.when(i_h == n_h - 1)
        def _():
            for r in range(ext_in - post_in, ext_in):
                h1pad[r] = jnp.zeros(h1pad.shape[1:], dt_mid)

        def tap_slice(k0, b, t, Rc, stride=stride, Wj=Wj, Wo=Wo, Wp=Wp):
            dy, dx = divmod(t, 3)
            if stride == 1:
                tap = h1pad[k0 + dy:k0 + dy + Rc, :, dx:dx + Wj, :,
                            b * BS:(b + 1) * BS]
            else:
                v = h1pad[2 * k0 + dy:2 * k0 + dy + 2 * Rc, :, 0:Wp, :,
                          b * BS:(b + 1) * BS]
                v = v.reshape(Rc, 2, Bq, Wp, BSUB, BS)[:, 0]
                vp = v.reshape(Rc, Bq, Wp // 2, 2, BSUB, BS)
                tap = vp[:, :, 0:Wo, dx] if dx < 2 else vp[:, :, 1:Wo + 1, 0]
            return tap.reshape(Rc * Bq * Wo * BSUB, BS)

        for k0 in range(0, ext_out, R):
            Rc = min(R, ext_out - k0)
            m = Rc * Bq * Wo * BSUB
            for b in range(nb):
                h2b = jnp.dot(tap_slice(k0, b, 0, Rc), w2[0, b],
                              preferred_element_type=jnp.float32)
                for t in range(1, 9):
                    h2b = h2b + jnp.dot(tap_slice(k0, b, t, Rc), w2[t, b],
                                        preferred_element_type=jnp.float32)
                h2b = jnp.maximum(h2b + b2[0, b * BS:(b + 1) * BS], 0.0)
                h2_scr[0:Rc, :, 0:Wo, :, b * BS:(b + 1) * BS] = \
                    h2b.astype(dt_mid).reshape(Rc, Bq, Wo, BSUB, BS)

            y = jnp.dot(h2_scr[0:Rc, :, 0:Wo].reshape(m, width), w3[:],
                        preferred_element_type=jnp.float32) + b3[0]
            # identity: input rows offset by (off_in - stride*off_out) = 1
            if stride == 1:
                if j == 0:
                    xid = _gather_rows_s1(x_halo_pre, x_main, x_halo_post,
                                          pre, k0 + 1, Rc, Bq, Wj, cin)
                else:
                    xid = cur[k0 + 1:k0 + 1 + Rc, :, 0:Wj]
                xid = xid.reshape(m, cin)
            else:
                v = _gather_rows_s2(x_halo_pre, x_main, x_halo_post,
                                    pre, 2 * k0 + 1, Rc, Bq, Wj, cin)
                xid = v.reshape(Rc, Bq, Wo, 2, BSUB, cin)[:, :, :, 0].reshape(
                    m, cin)
            if has_ds:
                ident = jnp.dot(xid.astype(dt_mid), wd[:],
                                preferred_element_type=jnp.float32) + bd[0]
            else:
                ident = xid.astype(jnp.float32) * ai[0]
            v_out = y + ident
            if dt == jnp.int8:
                v_out = jnp.clip(jnp.round(v_out), 0, 127)
            else:
                v_out = jnp.maximum(v_out, 0.0)
            tout[k0:k0 + Rc, :, 0:Wo] = v_out.astype(dt).reshape(
                Rc, Bq, Wo, BSUB, cout)

        cur, Wj = tout, Wo


def _gather_rows_s1(halo_pre, main, halo_post, pre, r0, Rc, Bq, Wj, cin):
    """Rows [r0, r0+Rc) of the banded block-0 input, stitched from the
    halo/main pieces (static indices)."""
    nmain = main.shape[0]
    rows = []
    for r in range(r0, r0 + Rc):
        if r < pre:
            rows.append(halo_pre[r][:])
        elif r < pre + nmain:
            rows.append(main[r - pre:r - pre + 1])
        else:
            rows.append(halo_post[r - pre - nmain][:])
    if len(rows) == 1:
        return rows[0]
    # contiguous main fast path
    if pre <= r0 and r0 + Rc <= pre + nmain:
        return main[r0 - pre:r0 - pre + Rc]
    return jnp.concatenate(rows, axis=0)


def _gather_rows_s2(halo_pre, main, halo_post, pre, r0, Rc, Bq, Wj, cin):
    """Even-position identity rows for a stride-2 head block: rows
    r0, r0+2, ..., r0+2(Rc-1), each split into (even W) pairs."""
    nmain = main.shape[0]
    if pre <= r0 and r0 + 2 * Rc - 1 <= pre + nmain:
        v = main[r0 - pre:r0 - pre + 2 * Rc]
        return v.reshape(Rc, 2, *v.shape[1:])[:, 0].reshape(
            Rc, v.shape[1], Wj // 2, 2, v.shape[3], cin)
    rows = []
    for i in range(Rc):
        r = r0 + 2 * i
        if r < pre:
            rows.append(halo_pre[r][:])
        elif r < pre + nmain:
            rows.append(main[r - pre:r - pre + 1])
        else:
            rows.append(halo_post[r - pre - nmain][:])
    v = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
    return v.reshape(Rc, v.shape[1], Wj // 2, 2, v.shape[3], cin)


def fused_stage_banded(
    x: jax.Array,
    fws: list,
    strides: list,
    *,
    Bc: int = 16,
    hh: int = 14,
    R: int = 7,
    halo_source: jax.Array | None = None,
) -> jax.Array:
    """Banded whole-stage: x [H, B/bsub, W, bsub, Cin] -> out in 5D
    layout (bsub 16 for bf16, 32 for int8-transport fws). Bands of hh
    output rows flow through every block in VMEM; HBM sees the stage
    input once (+ halo margins) and the stage output once.

    Transport fws (ops/quant.fold_block_params_t) are accepted directly:
    the per-channel output scales a3/ad fold into w3/wd here (pure scalar
    rescale of bf16 weights), and the identity coefficient rides the ai
    operand.

    halo_source: optional physically-distinct copy of x to feed the halo
    row streams from (perf experiment: Mosaic may serialize DMAs that
    alias one buffer)."""
    H, nBq, W, bsub, cin0 = x.shape
    assert bsub in (16, 32)
    if Bc < bsub:
        Bc = bsub  # the default Bc=16 under an int8 (bsub=32) input
    assert Bc % bsub == 0, \
        f"Bc={Bc} is not a multiple of the sublane batch {bsub}"
    Bq = Bc // bsub
    n_blocks = len(fws)
    width = fws[0]["w1"].shape[1]
    cout = fws[0]["w3"].shape[1]
    s0 = strides[0]
    assert all(s == 1 for s in strides[1:])
    Ho, Wo = H // s0, W // s0
    assert Ho % hh == 0
    pre, post = _stage_margins(strides)
    hin = s0 * hh

    # per-block extents/offsets
    metas = []
    ext, off, pst = hin + pre + post, pre, post
    for fw, s in zip(fws, strides):
        ext_out = ext - 2 if s == 1 else (ext - 1) // 2
        off_out = off - 1 if s == 1 else (off - 1) // 2
        pst_out = pst - 1 if s == 1 else pst // 2
        metas.append((ext, ext_out, off, pst, s, "wd" in fw))
        ext, off, pst = ext_out, off_out, pst_out
    assert ext == hh and off == 0 and pst == 0, (ext, off, pst)
    max_t_ext = max(m[1] for m in metas[:-1]) if n_blocks > 1 else 1

    # Halo rows arrive packed in ONE small operand ([n_h*(pre+post), ...],
    # the band's pre rows then post rows): separate per-row operands each
    # carrying the full x cost a distinct HBM copy of x per slot (XLA
    # materializes custom-call operands individually — at layer-2 scale
    # that was a 5.7 GB HBM OOM at B=1024). The gather is n_h*(pre+post)
    # rows once per call, at XLA's copy rate.
    n_h = Ho // hh
    in_specs = []
    operands = []
    if pre + post:
        hs = x if halo_source is None else halo_source
        idx = []
        for ih in range(n_h):
            idx.extend(min(max(ih * hin + d, 0), H - 1)
                       for d in range(-pre, 0))
            idx.extend(min(max(ih * hin + hin + d, 0), H - 1)
                       for d in range(post))
        xh = jnp.take(hs, jnp.asarray(idx, jnp.int32), axis=0)
        in_specs.append(pl.BlockSpec(
            (pre + post, Bq, W, bsub, cin0),
            lambda ib, ih: (ih, ib, 0, 0, 0),
            memory_space=pltpu.VMEM))
        operands.append(xh)
    in_specs.append(pl.BlockSpec((hin, Bq, W, bsub, cin0),
                                 lambda ib, ih: (ih, ib, 0, 0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(x)

    def wspec(shape):
        n = len(shape)
        return pl.BlockSpec(shape, lambda ib, ih, n=n: (0,) * n,
                            memory_space=pltpu.VMEM)

    for fw in fws:
        wdt = fw["w1"].dtype
        # transport folds: a3/ad are per-channel output scales — fold
        # them into the (bf16/f32) weights so the kernel epilogue stays
        # a plain bias add; ai (identity scale) rides its own operand
        w3 = fw["w3"]
        if "a3" in fw:
            w3 = (w3.astype(jnp.float32) * fw["a3"]).astype(wdt)
        wd = fw.get("wd", jnp.zeros((8, BS), wdt))
        if "wd" in fw and "ad" in fw:
            wd = (wd.astype(jnp.float32) * fw["ad"]).astype(wdt)
        bd = fw.get("bd", jnp.zeros((BS,), jnp.float32))
        ai = fw.get("ai", jnp.ones((cout,), jnp.float32))
        arrs = [fw["w1"], fw["b1"].reshape(1, -1), fw["w2"],
                fw["b2"].reshape(1, -1), w3, fw["b3"].reshape(1, -1),
                wd, bd.reshape(1, -1), ai.reshape(1, -1)]
        operands.extend(arrs)
        in_specs.extend(wspec(a.shape) for a in arrs)

    kernel = functools.partial(
        _banded_kernel, metas=tuple(metas), hh=hh, W0=W, Bq=Bq,
        n_blocks=n_blocks, width=width, cout=cout, pre=pre, post=post, R=R,
        bsub=bsub)

    ext_x = hin + pre + post
    B = nBq * bsub
    flops_img = 0
    wj, cj = W, cin0
    for fw, s, m in zip(fws, strides, metas):
        cin = fw["w1"].shape[0]
        scale = (m[0] / (s * hh), m[1] / hh)  # recompute factors
        flops_img += 2 * Ho * s * wj * cin * width * scale[0]
        wj = wj // s
        flops_img += 2 * Ho * wj * (9 * BS * width + width * cout
                                    + (cin * cout if "wd" in fw else 0)
                                    ) * scale[1]

    return pl.pallas_call(
        kernel,
        grid=(nBq // Bq, Ho // hh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((hh, Bq, Wo, bsub, cout),
                               lambda ib, ih: (ih, ib, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ho, nBq, Wo, bsub, cout), x.dtype),
        scratch_shapes=[
            # h1pad/h2 follow the WEIGHT dtype (transport: int8 I/O,
            # bf16 intermediates); tA/tB cross blocks in the I/O dtype
            pltpu.VMEM((ext_x + 1, Bq, W + 4, bsub, width),
                       fws[0]["w1"].dtype),
            pltpu.VMEM((max_t_ext, Bq, Wo, bsub, cout), x.dtype),
            pltpu.VMEM((max_t_ext, Bq, Wo, bsub, cout), x.dtype),
            pltpu.VMEM((R, Bq, Wo, bsub, width), fws[0]["w1"].dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT()),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_img * B), transcendentals=0,
            bytes_accessed=int(
                (H * W * cin0 * ext_x / hin + Ho * Wo * cout) * 2 * B)),
        interpret=_interpret(),
    )(*operands)


def _pick_reference(x: jax.Array, fw: Dict[str, jax.Array]):
    """Oracle dispatch: bf16/f32 activations -> the plain fold oracle;
    int8 activations with int8 weights -> the quantized oracle; int8
    activations with bf16/f32 weights -> the int8-TRANSPORT oracle."""
    from multimodal_baby_tpu.ops.quant import (
        bottleneck_reference_q, bottleneck_reference_t)
    if x.dtype != jnp.int8:
        return bottleneck_reference
    return (bottleneck_reference_q if fw["w1"].dtype == jnp.int8
            else bottleneck_reference_t)


def stage_reference(x: jax.Array, fws: list, strides: list) -> jax.Array:
    """Oracle: chain of XLA reference blocks in [B, H, W, C] layout."""
    bsub = x.shape[3]
    y = from_hwbc(x)
    for fw, s in zip(fws, strides):
        y = _pick_reference(x, fw)(y, fw, stride=s)
    return to_hwbc(y, bsub)


def hwbc_reference(x: jax.Array, fw: Dict[str, jax.Array],
                   *, stride: int = 1) -> jax.Array:
    """Oracle: same math via the XLA reference in [B, H, W, C] layout
    (int8 inputs dispatch to the quantized/transport oracle)."""
    ref = _pick_reference(x, fw)
    return to_hwbc(ref(from_hwbc(x), fw, stride=stride), x.shape[3])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_bottleneck_hwbc_diff(x, fw, stride: int = 1):
    """Differentiable wrapper: Pallas forward, XLA-reference backward
    (the trunk is frozen on the hot path, so backward never runs there)."""
    return fused_bottleneck_hwbc(x, fw, stride=stride)


def _fb_fwd(x, fw, stride):
    return fused_bottleneck_hwbc(x, fw, stride=stride), (x, fw)


def _fb_bwd(stride, res, g):
    x, fw = res
    _, vjp = jax.vjp(
        lambda x_, fw_: hwbc_reference(x_, fw_, stride=stride), x, fw)
    return vjp(g)


fused_bottleneck_hwbc_diff.defvjp(_fb_fwd, _fb_bwd)
