"""CVCL shuffled-utterances ablation (reference: runner_config/saycam_contrastive_shuffled_utterances.py)."""

from configs._base import CONTRASTIVE_BASE, CONTRASTIVE_FLAGS, derive

grids = [
    derive(CONTRASTIVE_BASE,
           cnn_dino=True,
           text_encoder=["embedding",
           "lstm"],
           shuffle_utterances=True),
]
flags = CONTRASTIVE_FLAGS + ["shuffle_utterances"]
