"""CLIP baseline adapter with an offline random-config CLIP."""

import numpy as np
import pytest


def make_tiny_clip():
    transformers = pytest.importorskip("transformers")
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig.from_text_vision_configs(
        transformers.CLIPTextConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=16,
            vocab_size=100),
        transformers.CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=8),
        projection_dim=16)
    return CLIPModel(cfg)


def test_clip_image_scoring_offline():
    from multimodal_baby_tpu.evaluation.clip_baseline import CLIPBaseline

    model = make_tiny_clip()
    baseline = CLIPBaseline(model=model, load_tokenizer=False)

    imgs = np.random.RandomState(0).randint(
        0, 255, (3, 4, 32, 32, 3), np.uint8)
    feats = baseline.encode_image(imgs.reshape(-1, 32, 32, 3))
    assert feats.shape == (12, 16)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0,
                               atol=1e-5)

    # scoring path with a stub text encoder
    txt = np.random.RandomState(1).randn(3, 16).astype(np.float32)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    baseline.encode_text = lambda labels: txt
    logits = baseline.score_image_trials(imgs, ["a", "b", "c"])
    assert logits.shape == (3, 4)
