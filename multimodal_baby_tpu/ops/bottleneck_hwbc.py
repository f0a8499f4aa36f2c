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
the kernel (ops/bottleneck.fold_block_params). The trunk is frozen on the
hot path (stop_gradient in models/vision.py); the custom VJP backward
differentiates the XLA reference for completeness.

Reference workload anchor: the frozen CNN forward of
multimodal/multimodal.py:88-104 — all the FLOPs of the published CVCL
recipe live here.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_baby_tpu.ops.bottleneck import (
    BS, bottleneck_reference, fold_block_params)

__all__ = [
    "fused_bottleneck_hwbc", "hwbc_reference", "fold_block_params",
    "to_hwbc", "from_hwbc",
]

BSUB = 16  # batch lanes in the sublane dimension (bf16 min tile is 16)
VMEM_LIMIT = 100 * 1024 * 1024  # v5e VMEM is 128 MiB; leave headroom


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def to_hwbc(x: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [H, B/16, W, 16, C]."""
    b, h, w, c = x.shape
    return jnp.transpose(
        x.reshape(b // BSUB, BSUB, h, w, c), (2, 0, 3, 1, 4))


def from_hwbc(x: jax.Array) -> jax.Array:
    """[H, B/16, W, 16, C] -> [B, H, W, C]."""
    h, bq, w, bs, c = x.shape
    return jnp.transpose(x, (1, 3, 0, 2, 4)).reshape(bq * bs, h, w, c)


def _kernel(x_lo_ref, x_main_ref, x_hi_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            w3_ref, b3_ref, wd_ref, bd_ref, out_ref,
            h1pad, h2_scr,
            *, stride: int, has_ds: bool, hh: int, R: int, W: int, Bq: int,
            parts: str = "all"):
    cin = w1_ref.shape[0]
    width = w1_ref.shape[1]
    cout = w3_ref.shape[1]
    nb = w2_ref.shape[1]
    dt = out_ref.dtype
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
            h1pad[:, :, c] = jnp.zeros((hin + 2, Bq, BSUB, width), dt)

    def conv1(v, rows):
        m = rows * Bq * W * BSUB
        h = jnp.dot(v.reshape(m, cin), w1_ref[:],
                    preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b1_ref[0], 0.0)
        return h.astype(dt).reshape(rows, Bq, W, BSUB, width)

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
        h1pad[0] = jnp.zeros((Bq, Wp, BSUB, width), dt)

    if stride == 1:
        @pl.when(i_h == n_h - 1)
        def _():
            h1pad[hin + 1] = jnp.zeros((Bq, Wp, BSUB, width), dt)

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
                [chunk] * reps, axis=-1)[..., :cout]
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
        for b in range(nb if parts != "noc2" else 0):
            h2b = jnp.dot(tap_slice(k0, b, 0), w2_ref[0, b],
                          preferred_element_type=jnp.float32)
            for t in range(1, 9):
                h2b = h2b + jnp.dot(tap_slice(k0, b, t), w2_ref[t, b],
                                    preferred_element_type=jnp.float32)
            h2b = jnp.maximum(h2b + b2_ref[0, b * BS:(b + 1) * BS], 0.0)
            h2_scr[..., b * BS:(b + 1) * BS] = h2b.astype(dt).reshape(
                R, Bq, Wo, BSUB, BS)

        # conv3 + bn3 + residual + relu
        y = jnp.dot(h2_scr[:].reshape(m, width), w3_ref[:],
                    preferred_element_type=jnp.float32) + b3_ref[0]
        if stride == 1:
            xid = x_main_ref[k0:k0 + R].reshape(m, cin)
        else:
            v = x_main_ref[2 * k0:2 * k0 + 2 * R]
            v = v.reshape(R, 2, Bq, W, BSUB, cin)[:, 0]
            xid = v.reshape(R, Bq, Wo, 2, BSUB, cin)[:, :, :, 0].reshape(
                m, cin)
        if has_ds:
            ident = jnp.dot(xid, wd_ref[:],
                            preferred_element_type=jnp.float32) + bd_ref[0]
        else:
            ident = xid.astype(jnp.float32)
        if parts == "nores":  # perf dissection: skip the residual path
            ident = 0.0
        out_ref[k0:k0 + R] = jnp.maximum(y + ident, 0.0).astype(dt).reshape(
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
    Bc: int = 16,
    hh: int | None = None,
    R: int | None = None,
    parts: str = "all",
) -> jax.Array:
    """x: [H, B/16, W, 16, Cin] (batch-in-sublanes, see to_hwbc);
    fw: fold_block_params output. Bc = batch per grid cell (multiple of 16).
    Returns [H/stride, B/16, W/stride, 16, Cout] in the same layout."""
    H, nBq, W, bsub, cin = x.shape
    assert bsub == BSUB and Bc % BSUB == 0
    Bq = Bc // BSUB
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

    wd = fw.get("wd", jnp.zeros((cin, cout), fw["w1"].dtype))
    bd = fw.get("bd", jnp.zeros((cout,), jnp.float32))

    def const_map(n):
        return lambda ib, ih: (0,) * n

    in_specs = [
        # halo row before the band (clamped at row 0)
        pl.BlockSpec((1, Bq, W, BSUB, cin),
                     lambda ib, ih: (jnp.maximum(ih * hin - 1, 0),
                                     ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        # main band
        pl.BlockSpec((hin, Bq, W, BSUB, cin),
                     lambda ib, ih: (ih, ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        # halo row after the band (clamped; unused for stride 2 but kept
        # for a uniform signature)
        pl.BlockSpec((1, Bq, W, BSUB, cin),
                     lambda ib, ih: (jnp.minimum(ih * hin + hin, H - 1),
                                     ib, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cin, width), const_map(2), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, width), const_map(2), memory_space=pltpu.VMEM),
        pl.BlockSpec((9, nb, BS, BS), const_map(4), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, width), const_map(2), memory_space=pltpu.VMEM),
        pl.BlockSpec((width, cout), const_map(2), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), const_map(2), memory_space=pltpu.VMEM),
        pl.BlockSpec((cin, cout), const_map(2), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), const_map(2), memory_space=pltpu.VMEM),
    ]

    Wp = W + 2 if stride == 1 else W + 4
    kernel = functools.partial(
        _kernel, stride=stride, has_ds=has_ds, hh=hh, R=R, W=W, Bq=Bq,
        parts=parts)

    B = nBq * BSUB
    # conv1 over hin+2 rows, conv2 at output resolution (rows already
    # strided; columns via pair-reshape), conv3/downsample at output res
    flops_per_img = (2 * (hin + 2) / hin * Ho * W * cin * width
                     + 2 * Ho * Wo * 9 * BS * width
                     + 2 * Ho * Wo * (width * cout
                                      + (cin * cout if has_ds else 0)))
    bytes_img = (H * W * cin * (1 + 2 / hin) + Ho * Wo * cout) * 2

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((hh, Bq, Wo, BSUB, cout),
                               lambda ib, ih: (ih, ib, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ho, nBq, Wo, BSUB, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hin + 2, Bq, Wp, BSUB, width), x.dtype),
            pltpu.VMEM((R, Bq, Wo, BSUB, width), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_img * B), transcendentals=0,
            bytes_accessed=int(bytes_img * B)),
        interpret=_interpret(),
    )(x, x, x, fw["w1"], fw["b1"].reshape(1, -1), fw["w2"],
      fw["b2"].reshape(1, -1), fw["w3"], fw["b3"].reshape(1, -1),
      wd, bd.reshape(1, -1))


def hwbc_reference(x: jax.Array, fw: Dict[str, jax.Array],
                   *, stride: int = 1) -> jax.Array:
    """Oracle: same math via the XLA reference in [B, H, W, C] layout."""
    return to_hwbc(bottleneck_reference(from_hwbc(x), fw, stride=stride))


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
