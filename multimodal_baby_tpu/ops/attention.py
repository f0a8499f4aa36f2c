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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


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
