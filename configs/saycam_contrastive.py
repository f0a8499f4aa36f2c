"""Main CVCL recipe: frozen DINO ResNeXt-50 + embedding/LSTM text encoder
(reference: runner_config/saycam_contrastive.py:1-36)."""

from configs._base import CONTRASTIVE_BASE, CONTRASTIVE_FLAGS, derive

grids = [
    derive(CONTRASTIVE_BASE,
           cnn_dino=True,
           text_encoder=["embedding", "lstm"]),
]
flags = CONTRASTIVE_FLAGS
