"""Captioning + attention paths vs the reference TextEncoder/LanguageModel
(imported as black-box torch oracles with converted random weights)."""

import argparse
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.api.convert import convert_text_encoder
from multimodal_baby_tpu.core.config import ModelConfig, TextConfig
from multimodal_baby_tpu.models.text import TextEncoder

REFERENCE_DIR = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference not available")

from tests.reference_stubs import install_reference_stubs  # noqa: E402

install_reference_stubs()

V, E, B, L, D, HW = 30, 16, 4, 7, 12, 3


def ref_args(**kw):
    base = dict(text_encoder="lstm", captioning=True, attention=True,
                attention_activation="relu", attention_gate=True,
                embedding_type="flat", embedding_dim=E, crange=1,
                dropout_i=0.0, dropout_o=0.0,
                pos_embed_type="no_pos_embed")
    base.update(kw)
    return argparse.Namespace(**base)


def make_pair(**kw):
    sys.path.insert(0, REFERENCE_DIR)
    from multimodal.multimodal import TextEncoder as RefTextEncoder

    torch.manual_seed(0)
    vocab = {f"w{i}": i for i in range(V)}
    ref = RefTextEncoder(vocab, D, ref_args(**kw)).eval()

    cfg = ModelConfig(
        embedding_dim=E, vocab_size=V, embedding_type="flat",
        text=TextConfig(
            text_encoder="lstm", captioning=kw.get("captioning", True),
            attention=kw.get("attention", True),
            attention_gate=kw.get("attention_gate", True)))
    enc = TextEncoder(cfg, image_feature_map_dim=D)
    params = convert_text_encoder(
        {k: v for k, v in ref.state_dict().items()}, "lstm")
    return ref, enc, params


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    x = np.zeros((B, L), np.int64)
    x_len = np.array([7, 5, 3, 2])
    for i, n in enumerate(x_len):
        x[i, 0] = 2
        x[i, 1:n] = rng.randint(4, V, n - 1)
    imgf = rng.randn(B, E).astype(np.float32)
    fmap = rng.randn(B, D, HW, HW).astype(np.float32)  # torch layout
    return x, x_len, imgf, fmap


def test_captioning_attention_forward_parity():
    ref, enc, params = make_pair()
    x, x_len, imgf, fmap = make_inputs()

    with torch.no_grad():
        t_ret, t_out, t_attns = ref(
            torch.tensor(x), torch.tensor(x_len),
            image_features=torch.tensor(imgf),
            image_feature_map=torch.tensor(fmap))

    j_ret, j_out, j_attns = enc.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(x_len),
        image_features=jnp.asarray(imgf),
        image_feature_map=jnp.asarray(fmap.transpose(0, 2, 3, 1)),
        deterministic=True)

    np.testing.assert_allclose(np.asarray(j_ret), t_ret.numpy(),
                               atol=2e-5, rtol=1e-4)
    for i, n in enumerate(x_len):
        np.testing.assert_allclose(
            np.asarray(j_out)[i, :n], t_out[i, :n].numpy(),
            atol=2e-5, rtol=1e-4, err_msg=f"outputs row {i}")
        np.testing.assert_allclose(
            np.asarray(j_attns)[i, :n], t_attns[i, :n].numpy(),
            atol=2e-5, rtol=1e-4, err_msg=f"attns row {i}")


def test_captioning_no_attention_forward_parity():
    ref, enc, params = make_pair(attention=False, attention_gate=False)
    x, x_len, imgf, _ = make_inputs(1)
    with torch.no_grad():
        t_ret, t_out, _ = ref(torch.tensor(x), torch.tensor(x_len),
                              image_features=torch.tensor(imgf))
    j_ret, j_out, _ = enc.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(x_len),
        image_features=jnp.asarray(imgf), deterministic=True)
    np.testing.assert_allclose(np.asarray(j_ret), t_ret.numpy(),
                               atol=2e-5, rtol=1e-4)
    for i, n in enumerate(x_len):
        np.testing.assert_allclose(
            np.asarray(j_out)[i, :n], t_out[i, :n].numpy(),
            atol=2e-5, rtol=1e-4)


def test_captioning_beam_search_parity():
    """Full generative stack: our CVCL beam decode == the reference
    LanguageModel.beam_search_decode with identical weights."""
    sys.path.insert(0, REFERENCE_DIR)
    from multimodal.multimodal import (
        LanguageModel as RefLM, TextEncoder as RefTextEncoder)

    torch.manual_seed(1)
    vocab = {f"w{i}": i for i in range(V)}
    args = ref_args(attention=False, attention_gate=False, tie=True,
                    bias=True)
    ref_enc = RefTextEncoder(vocab, D, args).eval()
    ref_lm = RefLM(ref_enc, args).eval()

    x, x_len, imgf, _ = make_inputs(2)
    with torch.no_grad():
        ref_seq, ref_scores = ref_lm.beam_search_decode(
            B, 3, 10, 0.0, image_features=torch.tensor(imgf))

    from multimodal_baby_tpu.models import CVCL
    from multimodal_baby_tpu.core.config import VisionConfig
    cfg = ModelConfig(
        embedding_dim=E, vocab_size=V, embedding_type="flat",
        tie=True, bias=True,
        vision=VisionConfig(cnn_model="toy"),
        text=TextConfig(text_encoder="lstm", captioning=True))
    model = CVCL(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, 32, 32, 3)),
        jnp.asarray(x), jnp.asarray(x_len))
    params = dict(variables["params"])
    params["text_encoder"] = convert_text_encoder(
        {k: v for k, v in ref_enc.state_dict().items()}, "lstm")
    lm_bias = ref_lm.state_dict()["output_layer.bias"]
    params["lm_bias"] = np.asarray(lm_bias)

    seq, scores = model.apply(
        {"params": params, "batch_stats": variables.get("batch_stats", {})},
        B, 3, 10, 0.0, jnp.asarray(imgf), method="beam_search_decode")

    seq = np.asarray(seq)
    scores = np.asarray(scores)
    ref_seq = ref_seq.numpy()
    ref_scores = ref_scores.numpy()
    np.testing.assert_allclose(scores[:, 0], ref_scores[:, 0],
                               atol=1e-4, rtol=1e-4)
    Lr = ref_seq.shape[-1]
    for b in range(B):
        r = ref_seq[b, 0]
        eos = np.where(r == 3)[0]
        n = (eos[0] + 1) if len(eos) else len(r)
        np.testing.assert_array_equal(seq[b, 0][:n], r[:n])
