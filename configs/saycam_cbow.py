"""CBOW text-encoder LM recipe (reference: runner_config/saycam_cbow.py)."""

from configs._base import CONTRASTIVE_BASE, CONTRASTIVE_FLAGS, derive

grids = [
    derive(CONTRASTIVE_BASE,
           cnn_dino=True,
           text_encoder="cbow",
           embedding_type="spatial",
           crange=[1],
           lambda_mm=0.0,
           lambda_lm=1.0),
]
flags = CONTRASTIVE_FLAGS + ["lambda_mm", "lambda_lm", "crange"]
