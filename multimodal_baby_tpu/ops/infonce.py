"""Fused InfoNCE: similarity matmul x temperature + symmetric softmax
cross-entropy in one Pallas kernel, with a custom VJP.

The reference computes this as separate torch ops (matmul, transpose, two
cross-entropies; multimodal.py:755-810), materializing the B x B logit
matrix several times. Here the forward is ONE kernel pass producing the
loss and the row/col log-sum-exps (the only residuals backward needs); the
backward is a second kernel that rebuilds softmax tiles on the fly:

    dL/dlogits = (P_row - I) / 2B + (P_col - I) / 2B   (P_col col-softmax)
    d_img = scale * dL/dlogits @ txt
    d_txt = scale * dL/dlogits.T @ img
    d_neg_log_temp = sum(dL/dlogits * logits)  (chain through scale=exp(t))

Everything stays in VMEM for B <= 1024 (B x B f32 = 4 MB); larger batches
fall back to the XLA implementation (which is fine there — the matmul
dominates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_FUSED_BATCH = 1024


def _interpret() -> bool:
    # run the kernel in interpreter mode off-TPU (CPU tests)
    return jax.devices()[0].platform != "tpu"


def _fwd_kernel(img_ref, txt_ref, scale_ref, loss_ref, lse_i_ref,
                lse_t_ref, metrics_ref):
    scale = scale_ref[0, 0]
    logits = jax.lax.dot_general(
        img_ref[:], txt_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [B, B]
    B = logits.shape[0]

    # row (image->text) and column (text->image) log-sum-exp
    m_i = jnp.max(logits, axis=1, keepdims=True)
    lse_i = (jnp.log(jnp.sum(jnp.exp(logits - m_i), axis=1, keepdims=True))
             + m_i)                                   # [B, 1]
    m_t = jnp.max(logits, axis=0, keepdims=True)
    lse_t = (jnp.log(jnp.sum(jnp.exp(logits - m_t), axis=0, keepdims=True))
             + m_t)                                   # [1, B]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    eye = row_ids == col_ids
    diag_sum = jnp.sum(jnp.where(eye, logits, 0.0))

    loss_ref[0, 0] = ((jnp.sum(lse_i) + jnp.sum(lse_t)) / 2.0
                      - diag_sum) / B
    lse_i_ref[:] = lse_i
    lse_t_ref[:] = lse_t.T

    # the reference's diagnostics (multimodal.py:796-822), computed from
    # the resident tile — no extra HBM pass:
    #   accuracy: argmax == diagonal; entropy: softmax entropy per row/col
    acc_i = jnp.sum(jnp.where(
        eye, (logits >= m_i).astype(jnp.float32), 0.0))
    acc_t = jnp.sum(jnp.where(
        eye, (logits >= m_t).astype(jnp.float32), 0.0))
    p_row = jnp.exp(logits - lse_i)
    p_col = jnp.exp(logits - lse_t)
    ent_i = jnp.sum(p_row * (lse_i - logits))
    ent_t = jnp.sum(p_col * (lse_t - logits))
    metrics_ref[0, 0] = acc_i / B
    metrics_ref[0, 1] = acc_t / B
    metrics_ref[0, 2] = ent_i / B
    metrics_ref[0, 3] = ent_t / B


def _bwd_kernel(img_ref, txt_ref, scale_ref, lse_i_ref, lse_t_ref, g_ref,
                dimg_ref, dtxt_ref, dlogit_scale_ref):
    scale = scale_ref[0, 0]
    g = g_ref[0, 0]
    logits = jax.lax.dot_general(
        img_ref[:], txt_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    B = logits.shape[0]

    p_row = jnp.exp(logits - lse_i_ref[:])      # [B, B] row softmax
    p_col = jnp.exp(logits - lse_t_ref[:].T)    # [B, B] col softmax
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    eye = (row_ids == col_ids).astype(jnp.float32)

    dlogits = g * ((p_row - eye) + (p_col - eye)) / (2.0 * B)

    dimg_ref[:] = (scale * jnp.dot(
        dlogits, txt_ref[:].astype(jnp.float32),
        preferred_element_type=jnp.float32)).astype(dimg_ref.dtype)
    dtxt_ref[:] = (scale * jax.lax.dot_general(
        dlogits, img_ref[:].astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)).astype(dtxt_ref.dtype)
    # d(neg_log_temperature): scale = exp(t) => dL/dt = sum(dlogits * logits)
    dlogit_scale_ref[0, 0] = jnp.sum(dlogits * logits)


def _fused_forward(img, txt, neg_log_temp):
    B, E = img.shape
    scale = jnp.exp(neg_log_temp).reshape(1, 1).astype(jnp.float32)
    loss, lse_i, lse_t, metrics = pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 4), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * B * E, transcendentals=2 * B * B,
            bytes_accessed=2 * B * E * 4 + B * B * 4),
        interpret=_interpret(),
    )(img, txt, scale)
    return loss[0, 0], (lse_i, lse_t, metrics)


def _metrics_dict(metrics: jax.Array):
    m = jax.lax.stop_gradient(metrics)
    return {"image_accuracy": m[0, 0], "text_accuracy": m[0, 1],
            "image_entropy": m[0, 2], "text_entropy": m[0, 3]}


@jax.custom_vjp
def fused_infonce_with_metrics(img: jax.Array, txt: jax.Array,
                               neg_log_temp: jax.Array):
    """Symmetric InfoNCE over the in-batch similarity matrix, plus the
    reference diagnostics (accuracy/entropy) computed inside the same
    kernel pass. Returns (loss, metrics dict).

    img, txt: [B, E]; neg_log_temp: scalar (-log temperature).
    Equals models.losses.contrastive_loss_from_logits(...) on
    logits = exp(neg_log_temp) * img @ txt.T.
    """
    loss, (_, _, metrics) = _fused_forward(img, txt, neg_log_temp)
    return loss, _metrics_dict(metrics)


def fused_infonce(img: jax.Array, txt: jax.Array,
                  neg_log_temp: jax.Array) -> jax.Array:
    """Loss-only variant."""
    return fused_infonce_with_metrics(img, txt, neg_log_temp)[0]


def _vjp_fwd(img, txt, neg_log_temp):
    loss, (lse_i, lse_t, metrics) = _fused_forward(img, txt, neg_log_temp)
    return (loss, _metrics_dict(metrics)), (img, txt, neg_log_temp,
                                            lse_i, lse_t)


def _vjp_bwd(residuals, cotangents):
    g, _ = cotangents  # metrics are diagnostics: their cotangent is dead
    img, txt, neg_log_temp, lse_i, lse_t = residuals
    B, E = img.shape
    scale = jnp.exp(neg_log_temp).reshape(1, 1).astype(jnp.float32)
    g_arr = jnp.asarray(g, jnp.float32).reshape(1, 1)
    dimg, dtxt, dnlt = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, E), img.dtype),
            jax.ShapeDtypeStruct((B, E), txt.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * B * E, transcendentals=2 * B * B,
            bytes_accessed=4 * B * E * 4 + B * B * 4),
        interpret=_interpret(),
    )(img, txt, scale, lse_i, lse_t, g_arr)
    return dimg, dtxt, jnp.reshape(dnlt[0, 0], jnp.shape(neg_log_temp))


fused_infonce_with_metrics.defvjp(_vjp_fwd, _vjp_bwd)


def infonce_loss(img: jax.Array, txt: jax.Array, neg_log_temp: jax.Array
                 ) -> jax.Array:
    """Dispatch: Pallas-fused when the B x B block fits VMEM, XLA fallback
    otherwise (or on non-TPU backends)."""
    B = img.shape[0]
    if B <= MAX_FUSED_BATCH and B % 8 == 0:
        return fused_infonce(img, txt, neg_log_temp)
    from multimodal_baby_tpu.models.losses import (
        contrastive_loss_from_logits)
    logits = jnp.exp(neg_log_temp) * (img @ txt.T)
    loss, _ = contrastive_loss_from_logits(logits, logits.T)
    return loss
