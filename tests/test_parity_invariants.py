"""The SURVEY.md section 7.4 parity contract, pinned in one place."""

import math

import numpy as np

from multimodal_baby_tpu.core import constants as C
from multimodal_baby_tpu.core.config import ModelConfig, TrainConfig


def test_token_id_contract():
    assert (C.PAD_TOKEN_ID, C.UNK_TOKEN_ID, C.SOS_TOKEN_ID,
            C.EOS_TOKEN_ID) == (0, 1, 2, 3)
    assert C.SPECIAL_TOKENS == ["<pad>", "<unk>", "<sos>", "<eos>"]
    assert C.MAX_LEN_UTTERANCE == 25
    assert (C.IMAGE_H, C.IMAGE_W) == (224, 224)
    np.testing.assert_allclose(C.IMAGENET_MEAN, (0.485, 0.456, 0.406))
    np.testing.assert_allclose(C.IMAGENET_STD, (0.229, 0.224, 0.225))
    assert C.N_VAL_DATALOADERS_PER_SPLIT == 2


def test_config_defaults_match_reference():
    m = ModelConfig()
    assert m.embedding_dim == 128          # multimodal.py:20
    assert m.temperature == 0.07           # multimodal.py:28
    assert m.sim == "max"                  # multimodal.py:27
    assert m.embedding_type == "flat"      # multimodal.py:19
    assert m.tie is True and m.bias is True
    assert m.text.text_encoder == "embedding"
    assert m.text.crange == 1
    assert m.text.pos_embed_type == "no_pos_embed"
    t = TrainConfig()
    assert t.lr == 3e-4                    # multimodal_lit.py:23
    assert t.weight_decay == 0.01
    assert t.factor == 0.1 and t.patience == 20
    assert t.lambda_mm == 1.0 and t.lambda_lm == 0.0
    assert t.beam_width == 3 and t.decode_length == 25


def test_temperature_parameterization():
    """Stored as -log(T), scale = exp(-log T) = 1/T."""
    import jax, jax.numpy as jnp
    from multimodal_baby_tpu.core.config import TextConfig, VisionConfig
    from multimodal_baby_tpu.models import CVCL

    cfg = ModelConfig(embedding_dim=8, vocab_size=10,
                      fix_temperature=True, temperature=0.07,
                      vision=VisionConfig(cnn_model="toy"))
    model = CVCL(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   jnp.zeros((1, 3), jnp.int32), jnp.ones((1,), jnp.int32))
    scale = model.apply(v, method="logit_scale")
    np.testing.assert_allclose(float(scale), 1 / 0.07, rtol=1e-6)
    # fixed temperature is NOT a parameter
    assert "logit_neg_log_temperature" not in v["params"]


def test_packaged_vocab_contract():
    """2350 entries, specials at 0-3 (the published SAYCam vocabulary)."""
    from multimodal_baby_tpu.api.model import PACKAGED_VOCAB
    from multimodal_baby_tpu.data.vocab import Vocab
    vocab = Vocab.load(PACKAGED_VOCAB)
    assert len(vocab) == 2350
    assert vocab["<pad>"] == 0 and vocab["<eos>"] == 3
    assert "ball" in vocab and "kitty" in vocab and "cat" in vocab
