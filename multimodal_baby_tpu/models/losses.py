"""Pure loss functions (InfoNCE, LM cross-entropy, attention regularizer).

These are jit-transparent pure functions over arrays; the Pallas-fused
variants live in ``multimodal_baby_tpu.ops`` and are drop-in replacements on
the train hot path.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.core.constants import (
    EOS_TOKEN_ID, PAD_TOKEN_ID, SOS_TOKEN_ID)


def get_entropy(logits: jax.Array, axis: int = -1) -> jax.Array:
    """Entropy of softmax(logits) (reference: multimodal/utils.py:106-108)."""
    logp = jax.nn.log_softmax(logits, axis=axis)
    return -jnp.sum(jnp.exp(logp) * logp, axis=axis)


def cross_entropy_with_int_labels(logits: jax.Array, labels: jax.Array
                                  ) -> jax.Array:
    """Per-example CE, numerically stable (logsumexp - true logit)."""
    lse = jax.nn.logsumexp(logits, axis=-1)
    true = jnp.take_along_axis(
        logits, labels[..., None], axis=-1).squeeze(-1)
    return lse - true


def contrastive_loss_from_logits(
    logits_per_image: jax.Array, logits_per_text: jax.Array,
    valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Symmetric InfoNCE over the B x B similarity matrix with diagnostics
    (reference: multimodal/multimodal.py:796-822).

    ``valid`` (bool [B], optional) marks real rows in a tail batch that was
    padded up to the sharding-friendly shape (parallel.shard_batch): padded
    rows are excluded from the row means AND masked out of the negative
    pool, so the padded step computes exactly the unpadded loss.
    """
    n = logits_per_image.shape[0]
    labels = jnp.arange(n)
    if valid is None:
        w = jnp.ones((n,), logits_per_image.dtype)
    else:
        w = valid.astype(logits_per_image.dtype)
        col_mask = jnp.where(valid, 0.0, -1e9).astype(
            logits_per_image.dtype)
        logits_per_image = logits_per_image + col_mask[None, :]
        logits_per_text = logits_per_text + col_mask[None, :]
    # max(.,1): an all-padding shard contributes weight 0, not NaN
    denom = jnp.maximum(w.sum(), 1.0)

    def wmean(x):
        return (x * w).sum() / denom

    loss_i = wmean(cross_entropy_with_int_labels(logits_per_image, labels))
    loss_t = wmean(cross_entropy_with_int_labels(logits_per_text, labels))
    infonce = (loss_i + loss_t) / 2.0

    metrics = {
        "image_accuracy": wmean(
            jnp.argmax(logits_per_image, axis=-1) == labels),
        "text_accuracy": wmean(
            jnp.argmax(logits_per_text, axis=-1) == labels),
        "image_entropy": wmean(get_entropy(logits_per_image)),
        "text_entropy": wmean(get_entropy(logits_per_text)),
    }
    return infonce, metrics


def lm_cross_entropy(
    logits: jax.Array,       # [B, L', V]
    labels: jax.Array,       # [B, L'] int
    weight: Optional[jax.Array] = None,  # [V] per-class weights
) -> Tuple[jax.Array, jax.Array]:
    """Tokenwise CE with ignore_index=PAD (reference:
    multimodal/multimodal.py:884-890). Returns (ce [B, L'], mask [B, L'])."""
    ce = cross_entropy_with_int_labels(logits, labels)
    if weight is not None:
        ce = ce * weight[labels]
    mask = labels != PAD_TOKEN_ID
    return jnp.where(mask, ce, 0.0), mask


def lm_loss_breakdown(ce: jax.Array, labels: jax.Array
                      ) -> Dict[str, jax.Array]:
    """Means over tokens with/without special tokens
    (reference: multimodal_lit.py:284-309)."""
    mask = labels != PAD_TOKEN_ID
    n = mask.sum()
    out = {"ce_loss": ce.sum() / n, "n_tokens": n}
    mask = mask & (labels != SOS_TOKEN_ID)
    n = mask.sum()
    out.update({"ce_loss_wo_sos": (ce * mask).sum() / n,
                "n_tokens_wo_sos": n})
    mask = mask & (labels != EOS_TOKEN_ID)
    n = mask.sum()
    out.update({"ce_loss_wo_sos_eos": (ce * mask).sum() / n,
                "n_tokens_wo_sos_eos": n})
    return out


def attn_reg_loss(attns: jax.Array) -> jax.Array:
    """((sum_t attn - 1)^2).mean() — encourages total attention mass per
    spatial position ~= 1 over the utterance
    (reference: multimodal/multimodal.py:963-964)."""
    return jnp.mean((attns.sum(axis=1) - 1.0) ** 2)
