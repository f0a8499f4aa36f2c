"""Joint contrastive + captioning recipe
(reference: runner_config/saycam_joint.py:5-6): lambda_mm=lambda_lm=0.5."""

from configs._base import CONTRASTIVE_BASE, CONTRASTIVE_FLAGS, derive

grids = [
    derive(CONTRASTIVE_BASE,
           cnn_dino=True,
           text_encoder="lstm",
           sim="mean",
           lambda_mm=0.5,
           lambda_lm=0.5,
           eval_textgen=True),
]
flags = CONTRASTIVE_FLAGS + ["lambda_mm", "lambda_lm"]
