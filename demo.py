"""README usage sample (reference: demo.py): load the pretrained CVCL model,
encode images + tokenized texts, print logits shapes.

With no network/pretrained checkpoint, pass a local checkpoint path
(native dir or reference .ckpt); with none at all, build a randomly
initialized model to exercise the API end to end.
"""

import sys

import numpy as np

from multimodal_baby_tpu.api.model import CVCLModel, load_model, preprocess


def main(checkpoint: str = "cvcl"):
    try:
        model, prep = load_model(checkpoint)
        print(f"loaded {checkpoint}")
    except Exception as e:  # zero-egress env: build a random model
        print(f"could not load '{checkpoint}' ({e}); using random init")
        import jax
        import jax.numpy as jnp
        from multimodal_baby_tpu.core.config import (
            ModelConfig, TextConfig, VisionConfig)
        from multimodal_baby_tpu.data.vocab import Vocab
        from multimodal_baby_tpu.api.model import PACKAGED_VOCAB
        from multimodal_baby_tpu.models import CVCL

        vocab = Vocab.load(PACKAGED_VOCAB)
        cfg = ModelConfig(embedding_dim=512, vocab_size=len(vocab),
                          embedding_type="flat", normalize_features=True,
                          fix_temperature=True,
                          vision=VisionConfig(cnn_dino=True),
                          text=TextConfig(text_encoder="embedding"))
        m = CVCL(cfg)
        variables = m.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 224, 224, 3)),
                           jnp.zeros((1, 25), jnp.int32),
                           jnp.ones((1,), jnp.int32))
        model = CVCLModel(m, variables, vocab)

    images = np.random.rand(4, 224, 224, 3).astype(np.float32)
    texts = ["ball", "puzzle", "car"]

    image_features = model.encode_image(images)
    tokens, token_len = model.tokenize(texts)
    text_features = model.encode_text(tokens, token_len)
    logits_per_image, logits_per_text = model(images, tokens, token_len)

    print("image_features:", image_features.shape)
    print("text_features:", text_features.shape)
    print("logits_per_image:", logits_per_image.shape)
    print("logits_per_text:", logits_per_text.shape)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "cvcl")
