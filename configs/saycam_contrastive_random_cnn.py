"""CVCL random (untrained) finetuned CNN ablation (reference: runner_config/saycam_contrastive_random_cnn.py)."""

from configs._base import CONTRASTIVE_BASE, CONTRASTIVE_FLAGS, derive

grids = [
    derive(CONTRASTIVE_BASE,
           text_encoder=["embedding",
           "lstm"],
           pretrained_cnn=False,
           finetune_cnn=True),
]
flags = CONTRASTIVE_FLAGS + ["pretrained_cnn", "finetune_cnn"]
