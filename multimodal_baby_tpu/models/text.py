"""Text encoders: embedding-mean, CBOW, LSTM, biLSTM, 1-layer transformer.

Feature-for-feature with the reference TextEncoder
(multimodal/multimodal.py:278-688), rebuilt TPU-first:

- All paths are fixed-shape jits over the statically padded [B, 25] window.
- LSTM/biLSTM are masked ``lax.scan``s (packed sequences don't exist in XLA);
  the per-timestep input projection is hoisted into one batched matmul.
- The captioning-with-attention teacher-forcing loop — a per-timestep Python
  loop in the reference (multimodal.py:437-491) — becomes a single scan whose
  carry holds the LSTM state, with the encoder-feature projection hoisted.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_baby_tpu.core.config import ModelConfig
from multimodal_baby_tpu.core.constants import MAX_LEN_UTTERANCE, PAD_TOKEN_ID
from multimodal_baby_tpu.models.attention import (
    AdditiveAttention, additive_attention)
from multimodal_baby_tpu.models.layers import (
    LSTMCellParams, LockedDropout, TorchLinear,
    TorchTransformerEncoderLayer, length_mask, lstm_scan, lstm_step,
    padding_safe_embed, reverse_padded, sinusoidal_pos_embed,
)


def _embedding_init(key, shape, dtype=jnp.float32):
    """torch nn.Embedding default init N(0, 1), PAD row zeroed
    (padding_idx=0 semantics)."""
    table = jax.random.normal(key, shape, dtype)
    return table.at[PAD_TOKEN_ID].set(0.0)


class TextEncoder(nn.Module):
    cfg: ModelConfig
    image_feature_map_dim: int = 2048

    @property
    def hidden_dim(self) -> int:
        # embedding and hidden dims always match (multimodal.py:293-295)
        return self.cfg.embedding_dim

    @property
    def regressional(self) -> bool:
        return self.cfg.text.regressional

    def setup(self):
        t = self.cfg.text
        E = self.cfg.embedding_dim
        self.token_embedding = self.param(
            "token_embedding", _embedding_init, (self.cfg.vocab_size, E))
        self.lockdrop = LockedDropout()

        arch = t.text_encoder
        if arch in ("lstm", "bilstm"):
            input_dim = E + (self.image_feature_map_dim if t.attention else 0)
            self.lstm_fwd = LSTMCellParams(input_dim, self.hidden_dim)
            if arch == "bilstm":
                self.lstm_bwd = LSTMCellParams(input_dim, self.hidden_dim)
        elif arch == "transformer":
            self.transformer_layer = TorchTransformerEncoderLayer(
                d_model=E, nhead=8)
            if t.pos_embed_type == "learned":
                self.pos_embed = self.param(
                    "pos_embed", nn.initializers.zeros,
                    (MAX_LEN_UTTERANCE, E))
            elif t.pos_embed_type == "sinusoidal":
                self.pos_embed = sinusoidal_pos_embed(MAX_LEN_UTTERANCE, E)

        if t.captioning:
            assert t.regressional, \
                "only regressional text encoder supports captioning"
            # maps image features to (h0, c0) (multimodal.py:350-353)
            self.connector = TorchLinear(
                E, 2 * self.num_directions * self.hidden_dim)

        if t.attention:
            assert arch == "lstm", "attention requires the lstm text encoder"
            self.attention = AdditiveAttention(
                encoder_dim=self.image_feature_map_dim,
                decoder_dim=self.hidden_dim,
                attn_dim=self.hidden_dim,
                activation=t.attention_activation)
            if t.attention_gate:
                self.attention_gate_projection = TorchLinear(
                    self.hidden_dim, self.image_feature_map_dim)

    @property
    def num_directions(self) -> int:
        return 2 if self.cfg.text.text_encoder == "bilstm" else 1

    # ------------------------------------------------------------------
    # hidden-state init (multimodal.py:671-688)
    # ------------------------------------------------------------------

    def init_hidden(self, batch_size: int,
                    image_features: Optional[jax.Array] = None):
        """Returns (h0, c0), each [num_directions, B, H]."""
        d, H = self.num_directions, self.hidden_dim
        if self.cfg.text.captioning and image_features is None:
            # touch the connector so its params are registered even on the
            # unconditioned path (torch creates params eagerly; flax lazily).
            # The zeros call is dead code XLA eliminates.
            _ = self.connector(jnp.zeros((1, self.cfg.embedding_dim)))
        if image_features is not None:
            if image_features.ndim > 2:  # spatial map [B, h, w, E]
                image_features = image_features.mean(axis=(1, 2))
            out = self.connector(image_features)  # [B, 2*d*H]
            out = out.reshape(batch_size, 2, d, H)
            h0 = jnp.moveaxis(out[:, 0], 0, 1)  # [d, B, H]
            c0 = jnp.moveaxis(out[:, 1], 0, 1)
            return h0, c0
        z = jnp.zeros((d, batch_size, H))
        return z, z

    # ------------------------------------------------------------------
    # single decode step (beam search / generation)
    # ------------------------------------------------------------------

    def ids_to_outputs(self, ids, states, image_feature_map=None,
                       projected_image_feature_map=None):
        """One decoding step from token ids.

        states: (h, c), each [B, H] (single layer, unidirectional).
        Returns (outputs [B, H], states, attns).
        (reference: multimodal/multimodal.py:391-435)
        """
        inputs = padding_safe_embed(self.token_embedding, ids)
        return self.inputs_to_outputs(
            inputs, states, image_feature_map, projected_image_feature_map)

    def inputs_to_outputs(self, inputs, states, image_feature_map=None,
                          projected_image_feature_map=None):
        h, c = states
        attns = None
        if image_feature_map is not None:
            attn_feature, attns = self.attention(
                image_feature_map, projected_image_feature_map, h)
            if self.cfg.text.attention_gate:
                gate = jax.nn.sigmoid(self.attention_gate_projection(h))
                attn_feature = gate * attn_feature
            inputs = jnp.concatenate([inputs, attn_feature], axis=-1)
        p = self.lstm_fwd
        h_new, c_new = lstm_step(
            p.weight_ih, p.weight_hh, p.bias_ih, p.bias_hh, inputs, h, c)
        return h_new, (h_new, c_new), attns

    # ------------------------------------------------------------------
    # full forward
    # ------------------------------------------------------------------

    def __call__(
        self,
        x: jax.Array,       # [B, L] int32 token ids
        x_len: jax.Array,   # [B] int32 valid lengths
        image_features: Optional[jax.Array] = None,
        image_feature_map: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        """Returns (ret, output, attns) with the reference's contract
        (multimodal.py:493-584): ret is the [B, E] flat embedding (or the
        spatial per-token outputs), output is the [B, L, H] sequence outputs
        feeding the LM head."""
        t = self.cfg.text
        B, L = x.shape
        x_len_f = x_len.astype(jnp.float32)
        mask = length_mask(x_len, L)
        attns = None
        ret = None

        embedding = padding_safe_embed(self.token_embedding, x)  # [B, L, E]

        if t.text_encoder == "embedding":
            raw_output = embedding
            if self.cfg.embedding_type == "flat":
                ret = raw_output.sum(axis=1) / x_len_f[:, None]

        elif t.text_encoder == "cbow":
            assert self.cfg.embedding_type != "flat", \
                "cbow with flat embedding is nonsense"
            c = t.crange
            # prefix-sum context window (multimodal.py:505-511)
            padded = jnp.pad(embedding, ((0, 0), (c + 1, c), (0, 0)))
            presum = jnp.cumsum(padded, axis=1)
            raw_output = (
                presum[:, 2 * c + 1:] - presum[:, :-(2 * c + 1)] - embedding
            ) / (2 * c)

        elif t.text_encoder in ("lstm", "bilstm"):
            h0, c0 = self.init_hidden(B, image_features=image_features)
            emb = self.lockdrop(embedding, t.dropout_i, deterministic)

            if t.attention:
                raw_output, h_last, attns = self._attention_teacher_forcing(
                    emb, mask, (h0[0], c0[0]), image_feature_map)
                hidden = h_last[None]  # [1, B, H]
            else:
                p = self.lstm_fwd
                out_f, hf, _ = lstm_scan(
                    p.weight_ih, p.weight_hh, p.bias_ih, p.bias_hh,
                    emb, mask, h0[0], c0[0])
                if t.text_encoder == "bilstm":
                    pb = self.lstm_bwd
                    emb_rev = reverse_padded(emb, x_len)
                    out_b_rev, hb, _ = lstm_scan(
                        pb.weight_ih, pb.weight_hh, pb.bias_ih, pb.bias_hh,
                        emb_rev, mask, h0[1], c0[1])
                    out_b = reverse_padded(out_b_rev, x_len)
                    out_b = jnp.where(mask[:, :, None], out_b, 0.0)
                    # average fwd/bwd per-step outputs (multimodal.py:541-547)
                    raw_output = (out_f + out_b) / 2.0
                    hidden = jnp.stack([hf, hb])  # [2, B, H]
                else:
                    raw_output = out_f
                    hidden = hf[None]  # [1, B, H]

            if self.cfg.embedding_type == "flat":
                # final valid hidden state, averaged over directions
                # (multimodal.py:549-552)
                ret = hidden.mean(axis=0)

        elif t.text_encoder == "transformer":
            key_padding_mask = x == PAD_TOKEN_ID
            emb = embedding
            if t.pos_embed_type in ("sinusoidal", "learned"):
                emb = emb + self.pos_embed[None, :L]
            raw_output = self.transformer_layer(
                emb, key_padding_mask, deterministic=deterministic)
            if self.cfg.embedding_type == "flat":
                # mean-pool over the full padded window / true length —
                # reference semantics exactly (multimodal.py:571-573): padded
                # *query* positions do contribute to the sum.
                ret = raw_output.sum(axis=1) / x_len_f[:, None]
        else:
            raise ValueError(f"unknown text_encoder {t.text_encoder}")

        output = self.lockdrop(raw_output, t.dropout_o, deterministic)

        if self.cfg.embedding_type == "flat":
            if not deterministic and t.dropout_o > 0:
                rng = self.make_rng("dropout")
                keep = jax.random.bernoulli(rng, 1 - t.dropout_o, ret.shape)
                ret = jnp.where(keep, ret / (1 - t.dropout_o), 0.0)
        else:
            ret = output

        return ret, output, attns

    def _attention_teacher_forcing(self, emb, mask, state0, image_feature_map):
        """Teacher-forcing pass for attention models as one masked scan
        (replaces the reference's per-timestep Python loop,
        multimodal.py:437-491)."""
        p = self.lstm_fwd
        E = self.cfg.embedding_dim
        H = self.hidden_dim
        # split W_ih into the (hoistable) token part and the attention part
        w_x, w_a = p.weight_ih[:E], p.weight_ih[E:]
        x_proj = jnp.einsum("ble,eh->blh", emb, w_x) + p.bias_ih + p.bias_hh
        # hoist the encoder-feature projection out of the loop
        proj_map = self.attention.project_encoder_features(image_feature_map)
        B = emb.shape[0]
        spatial = image_feature_map.shape[1:-1]
        d_enc = image_feature_map.shape[-1]
        enc_flat = image_feature_map.reshape(B, -1, d_enc)
        proj_flat = proj_map.reshape(B, -1, self.attention.attn_dim)

        # read param arrays up front; the scan body is a pure function
        dec_k = self.attention.decoder_projection.kernel
        dec_b = self.attention.decoder_projection.bias
        attn_k = self.attention.attn_layer.kernel
        attn_b = self.attention.attn_layer.bias
        activation = self.cfg.text.attention_activation
        use_gate = self.cfg.text.attention_gate
        if use_gate:
            gate_k = self.attention_gate_projection.kernel
            gate_b = self.attention_gate_projection.bias
        w_hh, = (p.weight_hh,)

        def step(carry, inp):
            h, c = carry
            xp_t, m_t = inp
            attn_feature, attn = additive_attention(
                enc_flat, proj_flat, h, dec_k, dec_b, attn_k, attn_b,
                activation)
            if use_gate:
                gate = jax.nn.sigmoid(h @ gate_k + gate_b)
                attn_feature = gate * attn_feature
            pre = xp_t + attn_feature @ w_a + h @ w_hh
            i = jax.nn.sigmoid(pre[..., :H])
            f = jax.nn.sigmoid(pre[..., H:2 * H])
            g = jnp.tanh(pre[..., 2 * H:3 * H])
            o = jax.nn.sigmoid(pre[..., 3 * H:])
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            m = m_t[:, None]
            h = jnp.where(m, h_new, h)
            c = jnp.where(m, c_new, c)
            out = jnp.where(m, h_new, 0.0)
            attn = jnp.where(m, attn, 0.0)
            return (h, c), (out, attn)

        (h_last, _), (outputs, attns) = jax.lax.scan(
            step, state0,
            (jnp.swapaxes(x_proj, 0, 1), jnp.swapaxes(mask, 0, 1)))
        outputs = jnp.swapaxes(outputs, 0, 1)
        attns = jnp.swapaxes(attns, 0, 1).reshape(
            (B, emb.shape[1]) + spatial)
        return outputs, h_last, attns
