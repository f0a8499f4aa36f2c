"""Bahdanau-style additive attention over a spatial image feature map.

Functional parity with the reference Attention module
(multimodal/multimodal.py:197-275) with one layout change: feature maps are
channels-last ([B, H, W, D]) — the native TPU conv layout — instead of
channels-first, so no permutes are needed on the hot path.

Parameters live in :class:`TorchLinear` children whose raw arrays are
readable by parents — required because the teacher-forcing pass runs this
computation inside a ``lax.scan`` body (see
``multimodal_baby_tpu.models.text``) where lazily-built modules can't be
called.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_baby_tpu.models.layers import TorchLinear


def additive_attention(
    enc_flat: jax.Array,        # [B, S, D_enc]
    proj_enc_flat: jax.Array,   # [B, S, A]
    decoder_features: jax.Array,  # [B, D_dec]
    dec_kernel: jax.Array, dec_bias: jax.Array,     # decoder projection
    attn_kernel: jax.Array, attn_bias: jax.Array,   # scoring layer [A, 1]
    activation: str,
) -> Tuple[jax.Array, jax.Array]:
    """Pure-function core: returns (features [B, D_enc], attns [B, S])."""
    proj_dec = decoder_features @ dec_kernel + dec_bias   # [B, A]
    act = {"relu": jax.nn.relu, "tanh": jnp.tanh}[activation]
    scores = (act(proj_enc_flat + proj_dec[:, None, :])
              @ attn_kernel).squeeze(-1) + attn_bias      # [B, S]
    attns = jax.nn.softmax(scores, axis=-1)
    features = jnp.einsum("bsd,bs->bd", enc_flat, attns)
    return features, attns


class AdditiveAttention(nn.Module):
    encoder_dim: int
    decoder_dim: int
    attn_dim: int
    activation: str = "relu"  # relu|tanh

    def setup(self):
        self.encoder_projection = TorchLinear(self.encoder_dim, self.attn_dim)
        self.decoder_projection = TorchLinear(self.decoder_dim, self.attn_dim)
        self.attn_layer = TorchLinear(self.attn_dim, 1)

    def project_encoder_features(self, encoder_features: jax.Array) -> jax.Array:
        """[B, ..., D_enc] -> [B, ..., attn_dim]; hoisted out of the decode
        loop (reference: multimodal/multimodal.py:229-238)."""
        return self.encoder_projection(encoder_features)

    def __call__(
        self,
        encoder_features: jax.Array,            # [B, ..., D_enc]
        projected_encoder_features: jax.Array,  # [B, ..., attn_dim]
        decoder_features: jax.Array,            # [B, D_dec]
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (attended features [B, D_enc], attns [B, ...])."""
        B = encoder_features.shape[0]
        spatial = encoder_features.shape[1:-1]
        d_enc = encoder_features.shape[-1]
        features, attns = additive_attention(
            encoder_features.reshape(B, -1, d_enc),
            projected_encoder_features.reshape(B, -1, self.attn_dim),
            decoder_features,
            self.decoder_projection.kernel, self.decoder_projection.bias,
            self.attn_layer.kernel, self.attn_layer.bias,
            self.activation,
        )
        return features, attns.reshape((B,) + spatial)
