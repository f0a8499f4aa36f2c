"""Fused multi-head self-attention (Pallas TPU kernel).

For ViT-B/14 at 224px the sequence is short (257 tokens) but the batch is
large: XLA materializes the [B, H, N, N] score tensor in HBM between the
two matmuls (~810 MB at B=256), making attention bandwidth-bound. This
kernel computes softmax(q k^T * scale) v entirely in VMEM per (batch, head)
program — scores never touch HBM.

Backward uses a rematerialized XLA attention VJP (the backbone is frozen in
the CVCL recipes, so the forward is the hot path).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _smax_mode() -> str:
    """MMB_ATTN_SMAX: 'defer' (default — divide after the value
    contraction: one [N,128] row-scale instead of two [N,N] divides per
    pair; p is bf16-quantized pre- instead of post-division, a
    reassociation measured +3.2% end-to-end with every trained-weight
    fidelity gate unchanged — BENCH_NOTES queue 19), '' (divide before
    the contraction, the textbook order), or 'ablate' (softmax REPLACED
    by a cast — numerically WRONG, bench-only MXU/VPU decomposition
    knob)."""
    return os.environ.get("MMB_ATTN_SMAX", "defer")


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 kv_valid: int | None = None):
    q = q_ref[0].astype(jnp.float32)  # [N, d]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [N, N]
    if kv_valid is not None and kv_valid < s.shape[-1]:
        # tile-padded token stream (MMB_VIT_PADSEQ): key columns >=
        # kv_valid are pad tokens; -1e9 underflows exp() to 0 exactly,
        # mirroring the XLA path's mask (models/vision_vit.py)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = s + jnp.where(col < kv_valid, 0.0, -1e9)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p, v,
                       preferred_element_type=jnp.float32
                       ).astype(o_ref.dtype)


def _xla_attention(q, k, v, scale):
    s = jnp.einsum("bnd,bmd->bnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", p, v.astype(jnp.float32)
                      ).astype(q.dtype)


def _pallas_attention(q, k, v, scale, kv_valid=None):
    BH, N, d = q.shape
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, kv_valid=kv_valid),
        grid=(BH,),
        in_specs=[
            pl.BlockSpec((1, N, d), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(3)],
        out_specs=pl.BlockSpec((1, N, d), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, N, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * N * N * d, transcendentals=BH * N * N,
            bytes_accessed=4 * BH * N * d * 4),
        interpret=_interpret(),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q, k, v, scale: float, kv_valid: int | None = None):
    """q, k, v: [B*H, N, d] -> [B*H, N, d]; VMEM-resident scores.

    kv_valid (static): mask key columns >= kv_valid (tile-padded token
    streams, MMB_VIT_PADSEQ) — real-row outputs equal the unpadded
    computation."""
    return _pallas_attention(q, k, v, scale, kv_valid)


def _fwd(q, k, v, scale, kv_valid):
    return _pallas_attention(q, k, v, scale, kv_valid), (q, k, v)


def _bwd(scale, kv_valid, res, g):
    q, k, v = res

    def ref(q, k, v):
        s = jnp.einsum("bnd,bmd->bnm", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        if kv_valid is not None and kv_valid < s.shape[-1]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = s + jnp.where(col < kv_valid, 0.0, -1e9)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bnm,bmd->bnd", p, v.astype(jnp.float32)
                          ).astype(q.dtype)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)


def should_fuse_attention(n_tokens: int, head_dim: int) -> bool:
    """VMEM budget: scores + q/k/v/out blocks, f32."""
    working = (n_tokens * n_tokens + 4 * n_tokens * head_dim) * 4
    return working < 12 * 1024 * 1024


# ---------------------------------------------------------------------------
# Layout-native pair-packed attention.
#
# The per-(batch, head) kernel above loses end-to-end because its operands
# need a heads-first [B*H, N, d] layout: XLA pays a transpose on both sides
# of every block, and the d=64 minor dim wastes half of every 128-lane VMEM
# tile/DMA. This kernel takes q/k/v exactly as the qkv projection produces
# them — [B, N, C] with lanes ordered (head, feature) — so adjacent HEAD
# PAIRS occupy one 128-lane block and every slice is tile-aligned. No
# transposes, no lane padding.
#
# Per-head scores from pair-packed dots (the +/- trick): with
# Qp = [q_a | q_b] and Kp = [k_a | k_b] ([N, 128], heads a,b side by side),
#     Qp Kp^T            = q_a k_a^T + q_b k_b^T   (sum of both heads)
#     Qp (Kp * sign)^T   = q_a k_a^T - q_b k_b^T   (sign = +1 lo / -1 hi)
# so s_a = (sum + diff)/2 and s_b = (sum - diff)/2 — two full-K=128 MXU
# dots per pair, the same MAC count as one padded K=64 dot per head, with
# zero relayouts (the sign flip is one VPU multiply on k).
#
# The value contraction recombines for free: with lane masks instead of
# sign flips, p_a (V * lo) leaves head a's output in lanes 0:64 and zeros
# elsewhere, p_b (V * hi) fills lanes 64:128, and their SUM is the packed
# [N, 128] output pair — no concat copies.
# ---------------------------------------------------------------------------


def _attn_pairs_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                       n_pairs: int, kv_valid: int):
    N = q_ref.shape[1]
    f32 = jnp.float32
    for j in range(n_pairs):
        lo, hi = 128 * j, 128 * (j + 1)
        Q = q_ref[0, :, lo:hi]          # [N, 128] bf16, tile-aligned
        K = k_ref[0, :, lo:hi]
        V = v_ref[0, :, lo:hi]
        lane = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
        sign = jnp.where(lane < 64, 1.0, -1.0).astype(K.dtype)
        dn = (((1,), (1,)), ((), ()))
        ssum = jax.lax.dot_general(Q, K, dn, preferred_element_type=f32)
        sdiff = jax.lax.dot_general(Q, (K * sign), dn,
                                    preferred_element_type=f32)
        half_scale = 0.5 * scale
        sa = (ssum + sdiff) * half_scale
        sb = (ssum - sdiff) * half_scale

        # mask pad key columns (tile padding and/or kv_valid): exp -> 0
        col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        cmask = jnp.where(col < kv_valid, 0.0, -1e9).astype(f32)

        def smax(s):
            s = s + cmask
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            return (p / jnp.sum(p, axis=-1, keepdims=True)).astype(Q.dtype)

        pa, pb = smax(sa), smax(sb)
        lomask = jnp.where(lane < 64, 1.0, 0.0).astype(V.dtype)
        dnv = (((1,), (0,)), ((), ()))
        ya = jax.lax.dot_general(pa, V * lomask, dnv,
                                 preferred_element_type=f32)
        yb = jax.lax.dot_general(pb, V * (1.0 - lomask), dnv,
                                 preferred_element_type=f32)
        o_ref[0, :, lo:hi] = (ya + yb).astype(o_ref.dtype)


def _xla_attention_pairs(q, k, v, num_heads: int, scale: float,
                         kv_valid=None):
    """Oracle/VJP reference: q/k/v [B, N, C] lanes ordered (head, d)."""
    B, N, C = q.shape
    d = C // num_heads

    def split(t):
        return t.reshape(B, N, num_heads, d)

    s = jnp.einsum("bqhd,bkhd->bhqk", split(q).astype(jnp.float32),
                   split(k).astype(jnp.float32)) * scale
    n_keys = N if kv_valid is None else kv_valid
    if n_keys < N:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
        s = s + jnp.where(col < n_keys, 0.0, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    y = jnp.einsum("bhqk,bkhd->bqhd", p, split(v).astype(jnp.float32))
    return y.reshape(B, N, C).astype(q.dtype)


def _pallas_attention_pairs(q, k, v, num_heads, scale, kv_valid=None):
    B, N, C = q.shape
    n_pairs = C // 128
    spec = pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(
        _attn_pairs_kernel, scale=scale, n_pairs=n_pairs,
        kv_valid=N if kv_valid is None else min(kv_valid, N))
    flops = 4 * B * n_pairs * N * N * 128 * 2  # 2x ideal: the +/- packing
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=2 * B * n_pairs * N * N,
            bytes_accessed=4 * B * N * C * q.dtype.itemsize),
        interpret=_interpret(),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_attention_pairs(q, k, v, num_heads: int, scale: float,
                          kv_valid: int | None = None):
    """Multi-head attention on the qkv projection's NATIVE [B, N, C]
    layout (lanes = (head, feature), head_dim 64): scores stay in VMEM,
    zero operand transposes. Requires head_dim == 64 and an even head
    count (see should_fuse_attention_pairs)."""
    return _pallas_attention_pairs(q, k, v, num_heads, scale, kv_valid)


def _pairs_fwd(q, k, v, num_heads, scale, kv_valid):
    return _pallas_attention_pairs(q, k, v, num_heads, scale,
                                   kv_valid), (q, k, v)


def _pairs_bwd(num_heads, scale, kv_valid, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_attention_pairs(q, k, v, num_heads, scale,
                                             kv_valid), q, k, v)
    return vjp(g)


fused_attention_pairs.defvjp(_pairs_fwd, _pairs_bwd)


def should_fuse_attention_pairs(n_tokens: int, num_heads: int,
                                head_dim: int) -> bool:
    """Pair-packing needs head_dim 64 (two heads fill one 128-lane block)
    and an even head count; VMEM: the q/k/v/out blocks plus a handful of
    [N, N] f32 score/prob tensors per unrolled pair."""
    if head_dim != 64 or num_heads % 2:
        return False
    working = (4 * n_tokens * num_heads * head_dim * 2
               + 6 * n_tokens * n_tokens * 4)
    return working < 48 * 1024 * 1024


# ---------------------------------------------------------------------------
# qkv-folded pair-packed attention.
#
# The pairs kernel above still pays the qkv HBM round-trip: the projection
# fusion writes [B, N, 3C] to HBM (80 MB/block at ViT-B B=64) and the
# kernel reads it back at the Mosaic DMA rate (~305 GB/s measured — the
# B=64 device trace bills the kernel 4.2 ms/step, within 2% of its
# bytes/305 GB/s line, i.e. purely traffic-bound). Folding the projection
# INTO the kernel removes that tensor from HBM entirely: the kernel reads
# the LayerNormed x [B, N, C] once plus the (grid-constant) [C, 3C]
# weights, computes each pair's q/k/v lanes as three K=C MXU dots, and
# proceeds exactly as the pairs kernel. Traffic per block drops from
# in 3C + out C to in C + out C (~2x), and the projection's own HBM
# write/read disappears from the XLA side as well.
# ---------------------------------------------------------------------------


def _qkv_attn_pairs_kernel(x_ref, w_ref, b_ref, o_ref, *, scale: float,
                           n_pairs: int, kv_valid: int):
    N = x_ref.shape[1]
    C = n_pairs * 128
    f32 = jnp.float32
    xb = x_ref[0]                       # [N, C] bf16, tile-aligned
    dn = (((1,), (1,)), ((), ()))       # q [N,128] x k [N,128] -> [N,N]
    dn_p = (((1,), (0,)), ((), ()))     # x [N,C] x w [C,128] -> [N,128]

    def project(lane0):
        # mirror nn.Dense's bf16 arithmetic: bf16 dot (f32 accumulate,
        # one rounding) then a bf16 bias add
        y = jax.lax.dot_general(xb, w_ref[:, lane0:lane0 + 128], dn_p,
                                preferred_element_type=f32)
        return y.astype(xb.dtype) + b_ref[0, lane0:lane0 + 128]

    for j in range(n_pairs):
        lo, hi = 128 * j, 128 * (j + 1)
        Q = project(lo)
        K = project(C + lo)
        V = project(2 * C + lo)
        lane = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
        sign = jnp.where(lane < 64, 1.0, -1.0).astype(K.dtype)
        ssum = jax.lax.dot_general(Q, K, dn, preferred_element_type=f32)
        sdiff = jax.lax.dot_general(Q, (K * sign), dn,
                                    preferred_element_type=f32)
        half_scale = 0.5 * scale
        sa = (ssum + sdiff) * half_scale
        sb = (ssum - sdiff) * half_scale

        col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        cmask = jnp.where(col < kv_valid, 0.0, -1e9).astype(f32)

        def smax(s):
            s = s + cmask
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            return (p / jnp.sum(p, axis=-1, keepdims=True)).astype(Q.dtype)

        pa, pb = smax(sa), smax(sb)
        lomask = jnp.where(lane < 64, 1.0, 0.0).astype(V.dtype)
        ya = jax.lax.dot_general(pa, V * lomask, dn_p,
                                 preferred_element_type=f32)
        yb = jax.lax.dot_general(pb, V * (1.0 - lomask), dn_p,
                                 preferred_element_type=f32)
        o_ref[0, :, lo:hi] = (ya + yb).astype(o_ref.dtype)


def _xla_qkv_attention_pairs(x, wqkv, bqkv, num_heads: int, scale: float,
                             kv_valid=None):
    """Oracle/VJP reference: project then attend (same math, XLA ops)."""
    qkv = x @ wqkv.astype(x.dtype)
    if bqkv is not None:
        qkv = qkv + bqkv.astype(x.dtype)
    C = x.shape[-1]
    return _xla_attention_pairs(qkv[..., :C], qkv[..., C:2 * C],
                                qkv[..., 2 * C:], num_heads, scale,
                                kv_valid)


def _pallas_qkv_attention_pairs(x, wqkv, bqkv, num_heads, scale,
                                kv_valid=None):
    B, N, C = x.shape
    n_pairs = C // 128
    if bqkv is None:
        bqkv = jnp.zeros((3 * C,), x.dtype)
    kern = functools.partial(
        _qkv_attn_pairs_kernel, scale=scale, n_pairs=n_pairs,
        kv_valid=N if kv_valid is None else min(kv_valid, N))
    flops = (2 * B * N * C * 3 * C            # in-kernel qkv projection
             + 4 * B * n_pairs * N * N * 128 * 2)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # grid-constant operands: Mosaic elides the re-DMA between
            # consecutive grid steps
            pl.BlockSpec((C, 3 * C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            # vectors ride as [1, D] (the TPU-safe pattern, cf.
            # bottleneck_hwbc's reshape(1, -1) params)
            pl.BlockSpec((1, 3 * C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=2 * B * n_pairs * N * N,
            bytes_accessed=(2 * B * N * C + 3 * C * C) * x.dtype.itemsize),
        interpret=_interpret(),
    )(x, wqkv.astype(x.dtype), bqkv.astype(x.dtype).reshape(1, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_qkv_attention_pairs(x, wqkv, bqkv, num_heads: int, scale: float,
                              kv_valid: int | None = None):
    """qkv projection + multi-head attention in ONE kernel on the native
    [B, N, C] layout: x is the (LayerNormed) block input, wqkv [C, 3C] /
    bqkv [3C] the projection parameters (lane order (q|k|v) x (head,
    feature), head_dim 64). The [B, N, 3C] qkv tensor never exists in
    HBM. Requires head_dim == 64 and an even head count."""
    return _pallas_qkv_attention_pairs(x, wqkv, bqkv, num_heads, scale,
                                       kv_valid)


def _qkv_pairs_fwd(x, wqkv, bqkv, num_heads, scale, kv_valid):
    return _pallas_qkv_attention_pairs(x, wqkv, bqkv, num_heads, scale,
                                       kv_valid), (x, wqkv, bqkv)


def _qkv_pairs_bwd(num_heads, scale, kv_valid, res, g):
    x, wqkv, bqkv = res
    _, vjp = jax.vjp(
        lambda x, w, b: _xla_qkv_attention_pairs(x, w, b, num_heads,
                                                 scale, kv_valid),
        x, wqkv, bqkv)
    return vjp(g)


fused_qkv_attention_pairs.defvjp(_qkv_pairs_fwd, _qkv_pairs_bwd)


def should_fuse_qkv_attention_pairs(n_tokens: int, num_heads: int,
                                    head_dim: int) -> bool:
    """Pairs constraints plus the resident [C, 3C] weight block."""
    if not should_fuse_attention_pairs(n_tokens, num_heads, head_dim):
        return False
    C = num_heads * head_dim
    return 3 * C * C * 2 < 16 * 1024 * 1024


# ---------------------------------------------------------------------------
# Whole attention half of a pre-norm ViT block in one kernel:
#     x + proj(attention(qkv(LayerNorm(x))))
# HBM traffic per block drops to read-x + write-out (the LN output, the
# [B, N, 3C] qkv tensor, the attention output, and the pre-residual proj
# output never exist in HBM). The out-projection needs no concat of the
# per-pair attention outputs: y @ Wp = sum_j y[:, lo_j:hi_j] @ Wp[lo_j:hi_j]
# — each pair's output contracts against its OWN row block of Wp and
# accumulates, the same pattern as the fused MLP's fc2 (ops/vit_mlp.py).
# ---------------------------------------------------------------------------


def _attn_half_f32(xb, g, gb, w_ref, b, wp_ref, bp, *, scale: float,
                   n_pairs: int, kv_valid: int, eps: float):
    """The attention half's math on VMEM-resident values/refs: bf16
    block input [N, C] -> f32 ``x + proj(attn(qkv(LN(x))))``. Shared by
    ``_blk_attn_kernel`` and the whole-ViT-block kernel
    (ops/vit_block.py); weight matrices arrive as REFS so only the
    active lane slices load per dot."""
    N = xb.shape[0]
    C = n_pairs * 128
    f32 = jnp.float32
    x32 = xb.astype(f32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - jnp.square(mu)
    xn = ((x32 - mu) * jax.lax.rsqrt(var + eps) * g.astype(f32)
          + gb.astype(f32)).astype(xb.dtype)   # [N, C]

    dn = (((1,), (1,)), ((), ()))
    dn_p = (((1,), (0,)), ((), ()))

    def project(lane0):
        y = jax.lax.dot_general(xn, w_ref[:, lane0:lane0 + 128], dn_p,
                                preferred_element_type=f32)
        return y.astype(xb.dtype) + b[lane0:lane0 + 128]

    acc = jnp.zeros((N, C), f32)
    for j in range(n_pairs):
        lo, hi = 128 * j, 128 * (j + 1)
        Q = project(lo)
        K = project(C + lo)
        V = project(2 * C + lo)
        lane = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
        sign = jnp.where(lane < 64, 1.0, -1.0).astype(K.dtype)
        ssum = jax.lax.dot_general(Q, K, dn, preferred_element_type=f32)
        sdiff = jax.lax.dot_general(Q, (K * sign), dn,
                                    preferred_element_type=f32)
        half_scale = 0.5 * scale
        sa = (ssum + sdiff) * half_scale
        sb = (ssum - sdiff) * half_scale

        col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        cmask = jnp.where(col < kv_valid, 0.0, -1e9).astype(f32)
        mode = _smax_mode()

        if mode == "ablate":
            # bench-only: no mask/max/exp/div — isolates the MXU chain
            pa, pb = sa.astype(Q.dtype), sb.astype(Q.dtype)
            za = zb = None
        elif mode == "defer":
            def smax_u(s):
                s = s + cmask
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                return p.astype(Q.dtype), jnp.sum(p, axis=-1,
                                                  keepdims=True)
            pa, za = smax_u(sa)
            pb, zb = smax_u(sb)
        else:
            def smax(s):
                s = s + cmask
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                return (p / jnp.sum(p, axis=-1,
                                    keepdims=True)).astype(Q.dtype)
            pa, pb = smax(sa), smax(sb)
            za = zb = None
        lomask = jnp.where(lane < 64, 1.0, 0.0).astype(V.dtype)
        ya = jax.lax.dot_general(pa, V * lomask, dn_p,
                                 preferred_element_type=f32)
        yb = jax.lax.dot_general(pb, V * (1.0 - lomask), dn_p,
                                 preferred_element_type=f32)
        if za is not None:
            # deferred normalization: row-scale the packed output pair
            # (lanes 0:64 came from head a / p_a, 64:128 from head b)
            rscale = jnp.where(lane < 64, 1.0 / za, 1.0 / zb)
            yj = ((ya + yb) * rscale).astype(xb.dtype)
        else:
            yj = (ya + yb).astype(xb.dtype)          # [N, 128]
        acc = acc + jax.lax.dot_general(yj, wp_ref[lo:hi, :], dn_p,
                                        preferred_element_type=f32)
    return x32 + acc + bp.astype(f32)


def _blk_attn_kernel(x_ref, g_ref, gb_ref, w_ref, b_ref, wp_ref, bp_ref,
                     o_ref, *, scale: float, n_pairs: int, kv_valid: int,
                     eps: float, bm: int = 1):
    # bm > 1 (MMB_VIT_BLOCK_BM): several images per program — their
    # MXU/VPU chains are independent, giving the scheduler cross-image
    # work to overlap the serial softmax stretches with
    for i in range(bm):
        out = _attn_half_f32(x_ref[i], g_ref[0], gb_ref[0], w_ref,
                             b_ref[0], wp_ref, bp_ref[0], scale=scale,
                             n_pairs=n_pairs, kv_valid=kv_valid, eps=eps)
        o_ref[i] = out.astype(o_ref.dtype)


def _xla_block_attention(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                         num_heads: int, scale: float, kv_valid=None,
                         eps: float = 1e-6):
    """Oracle/VJP reference: LN + project + attend + proj + residual."""
    f32 = jnp.float32
    x32 = x.astype(f32)
    mu = x32.mean(-1, keepdims=True)
    var = jnp.square(x32).mean(-1, keepdims=True) - jnp.square(mu)
    xn = ((x32 - mu) * jax.lax.rsqrt(var + eps) * ln_scale.astype(f32)
          + ln_bias.astype(f32)).astype(x.dtype)
    y = _xla_qkv_attention_pairs(xn, wqkv, bqkv, num_heads, scale,
                                 kv_valid)
    out = (y @ wproj.astype(x.dtype) + bproj.astype(x.dtype)).astype(f32)
    return (x32 + out).astype(x.dtype)


def _pallas_block_attention(x, ln_scale, ln_bias, wqkv, bqkv, wproj,
                            bproj, num_heads, scale, kv_valid=None,
                            eps=1e-6):
    B, N, C = x.shape
    n_pairs = C // 128
    dt = x.dtype
    if bqkv is None:
        bqkv = jnp.zeros((3 * C,), dt)
    bm = int(os.environ.get("MMB_VIT_BLOCK_BM", "1"))
    if bm < 1 or B % bm != 0:
        bm = 1
    kern = functools.partial(
        _blk_attn_kernel, scale=scale, n_pairs=n_pairs,
        kv_valid=N if kv_valid is None else min(kv_valid, N), eps=eps,
        bm=bm)
    flops = (2 * B * N * C * 3 * C + 2 * B * N * C * C
             + 4 * B * n_pairs * N * N * 128 * 2)
    vec = lambda n: pl.BlockSpec((1, n), lambda b: (0, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B // bm,),
        in_specs=[
            pl.BlockSpec((bm, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(C), vec(C),
            pl.BlockSpec((C, 3 * C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(3 * C),
            pl.BlockSpec((C, C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(C),
        ],
        out_specs=pl.BlockSpec((bm, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=2 * B * n_pairs * N * N,
            bytes_accessed=(2 * B * N * C + 4 * C * C) * dt.itemsize),
        interpret=_interpret(),
    )(x, ln_scale.astype(dt).reshape(1, -1),
      ln_bias.astype(dt).reshape(1, -1), wqkv.astype(dt),
      bqkv.astype(dt).reshape(1, -1), wproj.astype(dt),
      bproj.astype(dt).reshape(1, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_block_attention(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                          num_heads: int, scale: float,
                          kv_valid: int | None = None, eps: float = 1e-6):
    """The whole attention half of a pre-norm ViT block in one kernel:
    ``x + proj(attention(qkv(LN(x))))``. x: [B, N, C]; per block the
    only HBM traffic is reading x and writing the result."""
    return _pallas_block_attention(x, ln_scale, ln_bias, wqkv, bqkv,
                                   wproj, bproj, num_heads, scale,
                                   kv_valid, eps)


def _blk_fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, num_heads,
             scale, kv_valid, eps):
    out = _pallas_block_attention(x, ln_scale, ln_bias, wqkv, bqkv,
                                  wproj, bproj, num_heads, scale,
                                  kv_valid, eps)
    return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj)


def _blk_bwd(num_heads, scale, kv_valid, eps, res, g):
    x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj = res
    _, vjp = jax.vjp(
        lambda *a: _xla_block_attention(*a, num_heads=num_heads,
                                        scale=scale, kv_valid=kv_valid,
                                        eps=eps),
        x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj)
    return vjp(g)


fused_block_attention.defvjp(_blk_fwd, _blk_bwd)


def should_fuse_block_attention(n_tokens: int, num_heads: int,
                                head_dim: int) -> bool:
    """qkv-fold constraints plus the resident [C, C] proj block."""
    if not should_fuse_qkv_attention_pairs(n_tokens, num_heads, head_dim):
        return False
    C = num_heads * head_dim
    return (3 * C * C + C * C) * 2 < 20 * 1024 * 1024
