"""CVCL: the flagship dual-encoder + language-model module.

One flax module owns the vision encoder, the (shared) text encoder, the
learned contrastive temperature, and the LM output head — the union of the
reference's MultiModalModel (multimodal/multimodal.py:691-822) and
LanguageModel (:825-960), which share a single TextEncoder instance. Sharing
falls out naturally from module nesting here.

Similarity modes (multimodal.py:751-780), translated to NHWC layout:
  flat:          image [B, E]       @ text [B, E].T
  spatial mean:  einsum('ihwe,tle->it') / (h * w * len)
  spatial max:   einsum('ihwe,tle->itlhw') -> amax(h,w) -> sum_l / len
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_baby_tpu.core.config import ModelConfig
from multimodal_baby_tpu.models.text import TextEncoder
from multimodal_baby_tpu.models.vision import VisionEncoder


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch F.normalize semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def spatial_similarity(
    image_features: jax.Array,  # [I, h, w, E]
    text_features: jax.Array,   # [T, L, E]
    text_length: jax.Array,     # [T]
    sim: str,
) -> jax.Array:
    """[I, T] similarity matrix for spatial embeddings."""
    h, w = image_features.shape[1:3]
    len_f = text_length.astype(image_features.dtype)
    if sim == "mean":
        s = jnp.einsum("ihwe,tle->it", image_features, text_features)
        return s / (h * w * len_f[None, :])
    if sim == "max":
        m = jnp.einsum("ihwe,tle->itlhw", image_features, text_features)
        m = m.max(axis=(3, 4))            # [I, T, L]
        return m.sum(axis=2) / len_f[None, :]
    raise ValueError(f"unknown sim {sim}")


class CVCL(nn.Module):
    cfg: ModelConfig
    # compute dtype for the vision trunk (where ~all FLOPs are); params stay
    # f32, logits/losses are f32. None = full f32 (embedding-parity mode).
    dtype: Any = None

    def setup(self):
        self.vision_encoder = VisionEncoder(self.cfg, dtype=self.dtype)
        self.text_encoder = TextEncoder(
            self.cfg, image_feature_map_dim=self.cfg.vision.last_out_dim)

        # contrastive temperature, stored as -log(T) like the reference
        # (multimodal.py:712-715); a constant when fix_temperature
        init_val = -math.log(self.cfg.temperature)
        if self.cfg.fix_temperature:
            self.logit_neg_log_temperature = jnp.asarray(init_val)
        else:
            self.logit_neg_log_temperature = self.param(
                "logit_neg_log_temperature",
                lambda key: jnp.asarray(init_val, jnp.float32))

        # LM output head (reference LanguageModel :833-836). When tied, the
        # kernel IS the token embedding (full gradient, incl. the PAD row).
        if not self.cfg.tie:
            self.lm_kernel = self.param(
                "lm_kernel",
                nn.initializers.uniform(scale=2 / math.sqrt(
                    self.cfg.embedding_dim)),
                (self.cfg.embedding_dim, self.cfg.vocab_size))
        if self.cfg.bias:
            self.lm_bias = self.param(
                "lm_bias", nn.initializers.zeros, (self.cfg.vocab_size,))

    # ------------------------------------------------------------------
    # encoders (reference: multimodal.py:732-744)
    # ------------------------------------------------------------------

    def encode_image(self, image: jax.Array, train: bool = False):
        features, feature_map = self.vision_encoder(image, train=train)
        if self.cfg.normalize_features:
            features = l2_normalize(
                features, axis=-1 if self.cfg.embedding_type == "spatial"
                else 1)
        return features, feature_map

    def encode_text(self, text: jax.Array, text_length: jax.Array,
                    deterministic: bool = True):
        features, outputs, attns = self.text_encoder(
            text, text_length, deterministic=deterministic)
        if self.cfg.normalize_features:
            features = l2_normalize(features, axis=-1)
        return features, outputs

    # ------------------------------------------------------------------
    # contrastive forward (reference: multimodal.py:746-794)
    # ------------------------------------------------------------------

    def similarity(self, image_features, text_features, text_length):
        if self.cfg.embedding_type == "flat":
            return image_features @ text_features.T
        return spatial_similarity(
            image_features, text_features, text_length, self.cfg.sim)

    def logit_scale(self) -> jax.Array:
        return jnp.exp(self.logit_neg_log_temperature)

    def __call__(
        self,
        image: jax.Array,
        text: jax.Array,
        text_length: jax.Array,
        train: bool = False,
        return_image_features: bool = False,
        return_text_outputs: bool = False,
    ):
        image_features, image_feature_map = self.encode_image(
            image, train=train)
        text_features, text_outputs = self.encode_text(
            text, text_length, deterministic=not train)

        match = self.similarity(image_features, text_features, text_length)
        scale = self.logit_scale()
        logits_per_image = match * scale
        logits_per_text = match.T * scale

        ret = (logits_per_image, logits_per_text)
        if return_image_features:
            ret = ret + (image_features, image_feature_map)
        if return_text_outputs:
            ret = ret + (text_outputs,)
        return ret

    # ------------------------------------------------------------------
    # language model head (reference LanguageModel :845-891)
    # ------------------------------------------------------------------

    def lm_output_layer(self, outputs: jax.Array) -> jax.Array:
        kernel = (self.text_encoder.token_embedding.T if self.cfg.tie
                  else self.lm_kernel)
        logits = outputs @ kernel
        if self.cfg.bias:
            logits = logits + self.lm_bias
        return logits

    def lm_forward(
        self,
        y: jax.Array,
        y_len: jax.Array,
        outputs: Optional[jax.Array] = None,
        image_features: Optional[jax.Array] = None,
        image_feature_map: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        """Returns (outputs [B, L, H], logits [B, L, V], attns)."""
        attns = None
        if outputs is None:
            _, outputs, attns = self.text_encoder(
                y, y_len,
                image_features=image_features,
                image_feature_map=image_feature_map,
                deterministic=deterministic)
        return outputs, self.lm_output_layer(outputs), attns

    def lm_labels_and_logits(self, y: jax.Array, logits: jax.Array):
        """Shift-by-one for regressional (LSTM) encoders
        (reference: multimodal.py:879-883)."""
        if self.cfg.text.regressional:
            return y[:, 1:], logits[:, :-1]
        return y, logits

    # ------------------------------------------------------------------
    # joint forward: everything the train/eval step needs in ONE apply
    # (keeps batch-stat mutation single-pass; mirrors the reuse rules of
    # MultiModalLitModel.calculate_joint_loss, multimodal_lit.py:227-375)
    # ------------------------------------------------------------------

    def joint_forward(
        self,
        image: jax.Array,
        text: jax.Array,
        text_length: jax.Array,
        train: bool = False,
        use_mm: bool = True,
        use_lm: bool = False,
    ) -> dict:
        out = {}
        image_features = image_feature_map = text_outputs = None
        t = self.cfg.text

        if use_mm:
            image_features, image_feature_map = self.encode_image(
                image, train=train)
            text_features, text_outputs = self.encode_text(
                text, text_length, deterministic=not train)
            match = self.similarity(image_features, text_features,
                                    text_length)
            scale = self.logit_scale()
            out["logits_per_image"] = match * scale
            out["logits_per_text"] = match.T * scale
            out["image_features"] = image_features
            out["text_outputs"] = text_outputs

        if use_lm:
            conditioned = t.captioning or t.attention
            if conditioned:
                if image_features is None:
                    image_features, image_feature_map = self.encode_image(
                        image, train=train)
                # conditioned outputs can't reuse the contrastive encoding
                # (multimodal_lit.py:202-211)
                outputs = None
            else:
                outputs = text_outputs
            lm_outputs, lm_logits, attns = self.lm_forward(
                text, text_length,
                outputs=outputs,
                image_features=image_features if t.captioning else None,
                image_feature_map=image_feature_map if t.attention else None,
                deterministic=not train)
            labels, logits = self.lm_labels_and_logits(text, lm_logits)
            out["lm_logits"] = logits
            out["lm_labels"] = labels
            out["attns"] = attns
            if image_features is not None:
                out["image_features"] = image_features
            if image_feature_map is not None:
                out["image_feature_map"] = image_feature_map

        out["logit_neg_log_temperature"] = self.logit_neg_log_temperature
        return out

    # ------------------------------------------------------------------
    # decode-step plumbing (beam search)
    # ------------------------------------------------------------------

    def decode_step(self, ids, states, image_feature_map=None,
                    projected_image_feature_map=None):
        """One decode step: ids [B] -> (logits [B, V], new states)."""
        outputs, states, attns = self.text_encoder.ids_to_outputs(
            ids, states,
            image_feature_map=image_feature_map,
            projected_image_feature_map=projected_image_feature_map)
        return self.lm_output_layer(outputs), states

    def init_decode_states(self, batch_size: int, image_features=None):
        h0, c0 = self.text_encoder.init_hidden(
            batch_size, image_features=image_features)
        return h0[0], c0[0]  # single layer, unidirectional

    def project_feature_map(self, image_feature_map):
        return self.text_encoder.attention.project_encoder_features(
            image_feature_map)

    def beam_search_decode(
        self,
        batch_size: int,
        beam_width: int = 3,
        decode_length: int = 25,
        length_penalty_alpha: float = 0.0,
        image_features: Optional[jax.Array] = None,
        image_feature_map: Optional[jax.Array] = None,
    ):
        """Beam-search text generation (reference LanguageModel
        .beam_search_decode, multimodal.py:893-960), as one jittable
        while_loop. Param arrays are read up front so the step closure is a
        pure function (module calls can't run inside lax loops)."""
        from multimodal_baby_tpu.core.constants import (
            EOS_TOKEN_ID, SOS_TOKEN_ID)
        from multimodal_baby_tpu.models.attention import additive_attention
        from multimodal_baby_tpu.models.beam_search import beam_search
        from multimodal_baby_tpu.models.layers import (
            lstm_step, padding_safe_embed)

        t = self.cfg.text
        assert t.regressional, \
            "only regressional text encoder supports beam search decoding"

        h0, c0 = self.init_decode_states(batch_size, image_features)
        p = self.text_encoder.lstm_fwd
        wih, whh, bih, bhh = p.weight_ih, p.weight_hh, p.bias_ih, p.bias_hh
        table = self.text_encoder.token_embedding
        lm_kernel = table.T if self.cfg.tie else self.lm_kernel
        lm_bias = self.lm_bias if self.cfg.bias else None
        E = self.cfg.embedding_dim

        use_attention = t.attention and image_feature_map is not None
        if use_attention:
            proj_map = self.project_feature_map(image_feature_map)
            d_enc = image_feature_map.shape[-1]
            enc_flat = image_feature_map.reshape(batch_size, -1, d_enc)
            proj_flat = proj_map.reshape(batch_size, -1, E)
            dec_k = self.text_encoder.attention.decoder_projection.kernel
            dec_b = self.text_encoder.attention.decoder_projection.bias
            attn_k = self.text_encoder.attention.attn_layer.kernel
            attn_b = self.text_encoder.attention.attn_layer.bias
            activation = t.attention_activation
            if t.attention_gate:
                gate_k = self.text_encoder.attention_gate_projection.kernel
                gate_b = self.text_encoder.attention_gate_projection.bias
            states = (h0, c0, enc_flat, proj_flat)
        else:
            states = (h0, c0)

        def step(ids, states):
            if use_attention:
                h, c, enc, proj = states
            else:
                h, c = states
            inp = padding_safe_embed(table, ids)
            if use_attention:
                attn_feature, _ = additive_attention(
                    enc, proj, h, dec_k, dec_b, attn_k, attn_b, activation)
                if t.attention_gate:
                    gate = jax.nn.sigmoid(h @ gate_k + gate_b)
                    attn_feature = gate * attn_feature
                inp = jnp.concatenate([inp, attn_feature], axis=-1)
            h, c = lstm_step(wih, whh, bih, bhh, inp, h, c)
            logits = h @ lm_kernel
            if lm_bias is not None:
                logits = logits + lm_bias
            new_states = (h, c, enc, proj) if use_attention else (h, c)
            return logits, new_states

        start = jnp.full((batch_size,), SOS_TOKEN_ID, jnp.int32)
        return beam_search(
            step, start, beam_width, decode_length,
            self.cfg.vocab_size, length_penalty_alpha,
            states=states, eos_id=EOS_TOKEN_ID)
