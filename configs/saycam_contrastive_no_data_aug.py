"""CVCL no-augmentation ablation (reference: runner_config/saycam_contrastive_no_data_aug.py)."""

from configs._base import CONTRASTIVE_BASE, CONTRASTIVE_FLAGS, derive

grids = [
    derive(CONTRASTIVE_BASE,
           cnn_dino=True,
           text_encoder=["embedding",
           "lstm"],
           augment_frames=False),
]
flags = CONTRASTIVE_FLAGS + ["augment_frames"]
