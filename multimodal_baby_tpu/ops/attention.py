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


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # [N, d]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [N, N]
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


def _pallas_attention(q, k, v, scale):
    BH, N, d = q.shape
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, scale: float):
    """q, k, v: [B*H, N, d] -> [B*H, N, d]; VMEM-resident scores."""
    return _pallas_attention(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _pallas_attention(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, scale),
                     q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)


def should_fuse_attention(n_tokens: int, head_dim: int) -> bool:
    """VMEM budget: scores + q/k/v/out blocks, f32."""
    working = (n_tokens * n_tokens + 4 * n_tokens * head_dim) * 4
    return working < 12 * 1024 * 1024
