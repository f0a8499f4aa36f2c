"""LM cross-entropy semantics vs torch (shift-by-one for regressional
encoders, ignore_index=PAD, special-token breakdowns) — reference:
multimodal.py:864-891 + multimodal_lit.py:284-309."""

import numpy as np
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from multimodal_baby_tpu.models.losses import (
    lm_cross_entropy, lm_loss_breakdown)


def test_tokenwise_ce_matches_torch():
    rng = np.random.RandomState(0)
    B, L, V = 4, 7, 12
    logits = rng.randn(B, L, V).astype(np.float32)
    labels = np.zeros((B, L), np.int64)
    lens = [7, 5, 3, 2]
    for i, n in enumerate(lens):
        labels[i, 0] = 2
        labels[i, 1:n - 1] = rng.randint(4, V, n - 2)
        labels[i, n - 1] = 3

    t_ce = tF.cross_entropy(
        torch.tensor(logits).transpose(-2, -1), torch.tensor(labels),
        ignore_index=0, reduction="none").numpy()

    j_ce, mask = lm_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(j_ce), t_ce, atol=1e-5)

    # token-mean equals torch "mean" reduction
    t_mean = tF.cross_entropy(
        torch.tensor(logits).transpose(-2, -1), torch.tensor(labels),
        ignore_index=0, reduction="mean").numpy()
    bd = lm_loss_breakdown(np.asarray(j_ce), jnp.asarray(labels))
    np.testing.assert_allclose(float(bd["ce_loss"]), float(t_mean),
                               rtol=1e-6)
    # breakdowns exclude the right tokens
    n_non_pad = int((labels != 0).sum())
    n_wo_sos = n_non_pad - B  # one <sos> per row
    assert int(bd["n_tokens"]) == n_non_pad
    assert int(bd["n_tokens_wo_sos"]) == n_wo_sos
    assert int(bd["n_tokens_wo_sos_eos"]) == n_wo_sos - B


def test_regressional_shift():
    """lm_labels_and_logits drops the last logit step and the first label
    (multimodal.py:879-883)."""
    import jax
    from multimodal_baby_tpu.core.config import (
        ModelConfig, TextConfig, VisionConfig)
    from multimodal_baby_tpu.models import CVCL

    cfg = ModelConfig(embedding_dim=8, vocab_size=10,
                      vision=VisionConfig(cnn_model="toy"),
                      text=TextConfig(text_encoder="lstm"))
    model = CVCL(cfg)
    y = jnp.asarray(np.arange(12).reshape(2, 6) % 10)
    logits = jnp.asarray(np.random.randn(2, 6, 10).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                   y, jnp.array([6, 6]))
    labels, out_logits = model.apply(v, y, logits,
                                     method="lm_labels_and_logits")
    assert labels.shape == (2, 5) and out_logits.shape == (2, 5, 10)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(y)[:, 1:])

    # non-regressional: unshifted
    cfg2 = ModelConfig(embedding_dim=8, vocab_size=10,
                       vision=VisionConfig(cnn_model="toy"),
                       text=TextConfig(text_encoder="cbow"),
                       embedding_type="spatial")
    model2 = CVCL(cfg2)
    v2 = model2.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                     y, jnp.array([6, 6]))
    labels2, logits2 = model2.apply(v2, y, logits,
                                    method="lm_labels_and_logits")
    assert labels2.shape == (2, 6)
