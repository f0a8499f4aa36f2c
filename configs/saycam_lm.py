"""Language-model-only recipe (reference: runner_config/saycam_lm.py):
lambda_mm=0, lambda_lm=1, LSTM text encoder."""

from configs._base import CONTRASTIVE_BASE, CONTRASTIVE_FLAGS, derive

grids = [
    derive(CONTRASTIVE_BASE,
           cnn_dino=True,
           text_encoder="lstm",
           lambda_mm=0.0,
           lambda_lm=1.0,
           tie=[True],
           bias=[True]),
]
flags = CONTRASTIVE_FLAGS + ["lambda_mm", "lambda_lm"]
