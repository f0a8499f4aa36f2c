"""CVCL single-frame ablation (reference: runner_config/saycam_contrastive_single_frame.py)."""

from configs._base import CONTRASTIVE_BASE, CONTRASTIVE_FLAGS, derive

grids = [
    derive(CONTRASTIVE_BASE,
           cnn_dino=True,
           text_encoder=["embedding",
           "lstm"],
           multiple_frames=False),
]
flags = CONTRASTIVE_FLAGS + ["multiple_frames"]
