"""Whole ViT block (Pallas TPU kernel): both halves of a pre-norm
transformer block in ONE program per batch element.

    out = mlp_half(attn_half(x))
        = y + fc2(gelu(fc1(LN2(y)))),   y = x + proj(attn(qkv(LN1(x))))

Why: with the attention half (`ops/attention.fused_block_attention`) and
the MLP half (`ops/vit_mlp.fused_mlp`) as separate kernels — the round-5
committed default, 2,820.5 pairs/s at ViT-B/14 B=128 — each block still
pays one [B, N, C] HBM round trip between the halves: the attention
kernel writes y (53 MB bf16 at B=128, N=272, C=768) and the MLP kernel
reads it back at the Mosaic DMA rate. Fusing the halves keeps y in
VMEM: per block the only HBM traffic is reading x and writing the block
output, removing ~107 MB x 12 blocks ~ 1.3 GB/step (~4 ms at the
measured ~305 GB/s Mosaic rate).

The kernel body is exactly the two halves' shared body functions
(`attention._attn_half_f32`, `vit_mlp._mlp_half_f32`) composed with the
same bf16 rounding the two-kernel path applies between them (the
attention kernel's bf16 output write), so the fused output is
bit-identical to the composition. Weights for BOTH halves ride as
grid-constant VMEM operands (~14 MB bf16 at ViT-B) and stay resident
across the batch grid.

Backward uses an XLA-reference VJP (the ViT trunk is frozen in the CVCL
recipes — forward is the hot path). Reference block:
multimodal/vision_transformer_dino_mugs.py:231-250.

Opt-in: ``MMB_VIT_BLOCK=1`` (models/vision_vit.ViTBlock dispatch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_baby_tpu.ops.attention import (_attn_half_f32,
                                               _xla_block_attention,
                                               should_fuse_block_attention)
from multimodal_baby_tpu.ops.vit_mlp import (_mlp_half_f32, _xla_mlp,
                                             should_fuse_mlp)


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _vit_block_kernel(x_ref, g1_ref, gb1_ref, wq_ref, bq_ref, wp_ref,
                      bp_ref, g2_ref, gb2_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, o_ref, *, scale: float, n_pairs: int,
                      kv_valid: int, eps: float, f_chunk: int,
                      n_chunks: int, gelu_mode: str):
    y32 = _attn_half_f32(x_ref[0], g1_ref[0], gb1_ref[0], wq_ref,
                         bq_ref[0], wp_ref, bp_ref[0], scale=scale,
                         n_pairs=n_pairs, kv_valid=kv_valid, eps=eps)
    # round through bf16 exactly like the two-kernel path's intermediate
    # HBM write, so fused == composed bitwise
    yb = y32.astype(x_ref.dtype)
    out = _mlp_half_f32(yb, g2_ref[0], gb2_ref[0], w1_ref, b1_ref[0],
                        w2_ref, b2_ref[0], eps=eps, f_chunk=f_chunk,
                        n_chunks=n_chunks, gelu_mode=gelu_mode)
    o_ref[0] = out.astype(o_ref.dtype)


def _xla_vit_block(x, g1, gb1, wq, bq, wp, bp, g2, gb2, w1, b1, w2, b2,
                   num_heads: int, scale: float, kv_valid=None,
                   eps: float = 1e-6, gelu_mode: str = "erf"):
    """Oracle/VJP reference: the two halves' own XLA references composed
    (same math, same intermediate dtype rounding)."""
    y = _xla_block_attention(x, g1, gb1, wq, bq, wp, bp,
                             num_heads=num_heads, scale=scale,
                             kv_valid=kv_valid, eps=eps)
    return _xla_mlp(y, g2, gb2, w1, b1, w2, b2, eps=eps,
                    gelu_mode=gelu_mode)


def _pallas_vit_block(x, g1, gb1, wq, bq, wp, bp, g2, gb2, w1, b1, w2,
                      b2, num_heads, scale, kv_valid=None, eps=1e-6,
                      gelu_mode="erf", f_chunk=512):
    B, N, C = x.shape
    F = w1.shape[1]
    n_pairs = C // 128
    assert F % f_chunk == 0, (F, f_chunk)
    dt = x.dtype
    if bq is None:
        bq = jnp.zeros((3 * C,), dt)
    kern = functools.partial(
        _vit_block_kernel, scale=scale, n_pairs=n_pairs,
        kv_valid=N if kv_valid is None else min(kv_valid, N), eps=eps,
        f_chunk=f_chunk, n_chunks=F // f_chunk, gelu_mode=gelu_mode)
    flops = (2 * B * N * C * 3 * C + 2 * B * N * C * C
             + 4 * B * n_pairs * N * N * 128 * 2 + 4 * B * N * C * F)
    vec = lambda n: pl.BlockSpec((1, n), lambda b: (0, 0),
                                 memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda b: (0, 0),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(C), vec(C), mat(C, 3 * C), vec(3 * C), mat(C, C), vec(C),
            vec(C), vec(C), mat(C, F), vec(F), mat(F, C), vec(C),
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            transcendentals=2 * B * n_pairs * N * N + B * N * F,
            bytes_accessed=(2 * B * N * C + 4 * C * C + 2 * C * F)
            * dt.itemsize),
        interpret=_interpret(),
    )(x, g1.astype(dt).reshape(1, -1), gb1.astype(dt).reshape(1, -1),
      wq.astype(dt), bq.astype(dt).reshape(1, -1), wp.astype(dt),
      bp.astype(dt).reshape(1, -1), g2.astype(dt).reshape(1, -1),
      gb2.astype(dt).reshape(1, -1), w1.astype(dt),
      b1.astype(dt).reshape(1, -1), w2.astype(dt),
      b2.astype(dt).reshape(1, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17))
def fused_vit_block(x, g1, gb1, wq, bq, wp, bp, g2, gb2, w1, b1, w2, b2,
                    num_heads: int, scale: float,
                    kv_valid: int | None = None, eps: float = 1e-6,
                    gelu_mode: str = "erf"):
    """One whole pre-norm ViT block per program: x [B, N, C] in, block
    output out. The inter-half y tensor and the [B, N, F] hidden tensor
    never exist in HBM. Requires head_dim 64, even head count, and the
    GELU forms of vit_mlp (erf = rational erfc, Mosaic-lowerable)."""
    return _pallas_vit_block(x, g1, gb1, wq, bq, wp, bp, g2, gb2, w1,
                             b1, w2, b2, num_heads, scale, kv_valid,
                             eps, gelu_mode)


def _fwd(x, g1, gb1, wq, bq, wp, bp, g2, gb2, w1, b1, w2, b2, num_heads,
         scale, kv_valid, eps, gelu_mode):
    out = _pallas_vit_block(x, g1, gb1, wq, bq, wp, bp, g2, gb2, w1, b1,
                            w2, b2, num_heads, scale, kv_valid, eps,
                            gelu_mode)
    return out, (x, g1, gb1, wq, bq, wp, bp, g2, gb2, w1, b1, w2, b2)


def _bwd(num_heads, scale, kv_valid, eps, gelu_mode, res, g):
    _, vjp = jax.vjp(
        lambda *a: _xla_vit_block(*a, num_heads=num_heads, scale=scale,
                                  kv_valid=kv_valid, eps=eps,
                                  gelu_mode=gelu_mode),
        *res)
    return vjp(g)


fused_vit_block.defvjp(_fwd, _bwd)


def should_fuse_vit_block(n_tokens: int, num_heads: int, head_dim: int,
                          hidden: int, f_chunk: int = 512) -> bool:
    """Both halves' gates plus their co-resident weight sets."""
    C = num_heads * head_dim
    if not should_fuse_block_attention(n_tokens, num_heads, head_dim):
        return False
    if not should_fuse_mlp(n_tokens, C, hidden, f_chunk):
        return False
    weights = (3 * C * C + C * C + 2 * C * hidden) * 2
    return weights < 24 * 1024 * 1024
