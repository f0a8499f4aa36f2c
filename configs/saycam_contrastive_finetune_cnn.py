"""CVCL finetune-CNN ablation (reference: runner_config/saycam_contrastive_finetune_cnn.py)."""

from configs._base import CONTRASTIVE_BASE, CONTRASTIVE_FLAGS, derive

grids = [
    derive(CONTRASTIVE_BASE,
           cnn_dino=True,
           text_encoder=["embedding",
           "lstm"],
           finetune_cnn=True),
]
flags = CONTRASTIVE_FLAGS + ["finetune_cnn"]
