"""CVCL random frozen CNN ablation (reference: runner_config/saycam_contrastive_random_frozen_cnn.py)."""

from configs._base import CONTRASTIVE_BASE, CONTRASTIVE_FLAGS, derive

grids = [
    derive(CONTRASTIVE_BASE,
           text_encoder=["embedding",
           "lstm"],
           pretrained_cnn=False),
]
flags = CONTRASTIVE_FLAGS + ["pretrained_cnn"]
