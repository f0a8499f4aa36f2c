"""Public-API parity: loading a reference-format torch .ckpt and producing
embeddings that match the torch pipeline elementwise (f32 eval mode) — the
BASELINE.md "bitwise-comparable embeddings" contract."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax.numpy as jnp

from multimodal_baby_tpu.api.model import CVCLModel, load_model, preprocess
from tests.test_vision import _TorchResNeXt50


def make_reference_ckpt(tmp_path, vocab_size=2350, E=512):
    """A random reference-shaped Lightning checkpoint: frozen ResNeXt +
    Linear head vision encoder, embedding text encoder, tied LM head."""
    torch.manual_seed(0)
    trunk = _TorchResNeXt50()
    fc = tnn.Linear(2048, E)
    embedding = tnn.Embedding(vocab_size, E, padding_idx=0)
    lm_bias = torch.zeros(vocab_size)

    sd = {}
    for k, v in trunk.state_dict().items():
        sd[f"vision_encoder.model.{k}"] = v
    sd["vision_encoder.model.fc.weight"] = fc.weight
    sd["vision_encoder.model.fc.bias"] = fc.bias
    sd["text_encoder.embedding.weight"] = embedding.weight
    sd["language_model.output_layer.weight"] = embedding.weight
    sd["language_model.output_layer.bias"] = lm_bias

    ckpt = {
        "state_dict": sd,
        "hyper_parameters": {
            "text_encoder": "embedding", "embedding_dim": E,
            "embedding_type": "flat", "normalize_features": True,
            "fix_temperature": True, "temperature": 0.07,
            "cnn_dino": True, "vit_dino": False,
            "tie": True, "bias": True,
        },
    }
    path = tmp_path / "ref.ckpt"
    torch.save(ckpt, path)
    return path, trunk, fc, embedding


def test_torch_checkpoint_embedding_parity(tmp_path):
    path, trunk, fc, embedding = make_reference_ckpt(tmp_path)
    model = CVCLModel.from_torch_checkpoint(path)

    rng = np.random.RandomState(0)
    imgs = rng.randn(2, 224, 224, 3).astype(np.float32)

    # torch reference pipeline: eval-mode trunk -> fc -> l2 normalize
    trunk.eval()
    with torch.no_grad():
        pooled, _ = trunk(torch.tensor(imgs.transpose(0, 3, 1, 2)))
        t_img = tF.normalize(fc(pooled), p=2, dim=1).numpy()

    j_img = np.asarray(model.encode_image(imgs))
    np.testing.assert_allclose(j_img, t_img, atol=2e-4, rtol=1e-3)

    # text: mean embedding / len, normalized
    tokens, tok_len = model.tokenize(["ball", "the cat"])
    with torch.no_grad():
        emb = embedding(torch.tensor(np.asarray(tokens), dtype=torch.long))
        t_txt = emb.sum(dim=1) / torch.tensor(
            np.asarray(tok_len, np.float32)).unsqueeze(1)
        t_txt = tF.normalize(t_txt, p=2, dim=-1).numpy()
    j_txt = np.asarray(model.encode_text(tokens, tok_len))
    np.testing.assert_allclose(j_txt, t_txt, atol=1e-5, rtol=1e-4)

    # forward: logits = scale * img @ txt.T, scale = 1/0.07
    lpi, lpt = model(imgs, tokens, tok_len)
    expected = (t_img @ t_txt.T) / 0.07
    np.testing.assert_allclose(np.asarray(lpi), expected,
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(lpt), expected.T,
                               atol=2e-3, rtol=1e-3)


def test_load_model_local_path(tmp_path):
    path, *_ = make_reference_ckpt(tmp_path)
    model, prep = load_model(str(path))
    from PIL import Image
    img = Image.fromarray(
        np.random.RandomState(1).randint(0, 255, (300, 400, 3), np.uint8))
    x = prep(img)
    assert x.shape == (224, 224, 3)
    feats = model.encode_image(x[None])
    assert feats.shape == (1, 512)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(feats[0])), 1.0, atol=1e-5)


def test_tokenize_matches_reference_contract():
    from multimodal_baby_tpu.data.vocab import Vocab
    from multimodal_baby_tpu.api.model import PACKAGED_VOCAB
    from multimodal_baby_tpu.data.tokenizer import Tokenizer
    vocab = Vocab.load(PACKAGED_VOCAB)
    tok = Tokenizer(vocab)
    ids, lens = tok(["ball", "zzzzunknownzzzz word"])
    assert ids.shape == (2, 25)
    assert ids[0][0] == 2 and ids[0][2] == 3  # <sos> ball <eos>
    assert ids[0][1] == vocab["ball"]
    assert ids[1][1] == 1  # <unk>
    assert lens[0] == 3
    assert (ids[0][3:] == 0).all()


def test_spatial_torch_checkpoint_parity(tmp_path):
    """Spatial-variant checkpoints (Sequential-wrapped trunk + 1x1 conv
    head, multimodal.py:182-185) convert and match the torch pipeline."""
    torch.manual_seed(2)
    E = 32
    trunk = _TorchResNeXt50()
    head = tnn.Conv2d(2048, E, 1)
    embedding = tnn.Embedding(100, E, padding_idx=0)

    sd = {}
    idx_map = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
               "layer3": "6", "layer4": "7"}
    for k, v in trunk.state_dict().items():
        top, _, rest = k.partition(".")
        sd[f"vision_encoder.model.{idx_map[top]}.{rest}"] = v
    sd["vision_encoder.model.8.weight"] = head.weight
    sd["vision_encoder.model.8.bias"] = head.bias
    sd["text_encoder.embedding.weight"] = embedding.weight
    ckpt = {"state_dict": sd, "hyper_parameters": {
        "text_encoder": "embedding", "embedding_dim": E,
        "embedding_type": "spatial", "normalize_features": False,
        "fix_temperature": True, "cnn_dino": True, "sim": "mean",
        "tie": True, "bias": False}}
    path = tmp_path / "spatial.ckpt"
    torch.save(ckpt, path)

    from multimodal_baby_tpu.api.model import CVCLModel
    model = CVCLModel.from_torch_checkpoint(path)

    rng = np.random.RandomState(3)
    imgs = rng.randn(2, 64, 64, 3).astype(np.float32)
    trunk.eval()
    with torch.no_grad():
        _, fmap = trunk(torch.tensor(imgs.transpose(0, 3, 1, 2)))
        t_spatial = head(fmap).permute(0, 2, 3, 1).numpy()

    feats = np.asarray(model.encode_image(imgs))
    assert feats.shape == t_spatial.shape  # [B, h, w, E]
    np.testing.assert_allclose(feats, t_spatial, atol=2e-3, rtol=1e-2)
