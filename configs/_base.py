"""Shared pieces of the canonical experiment grids.

The recipes mirror the reference's runner_config grids (hyperparameters per
SURVEY.md section 2.2), minus torch/SLURM-specific flags; jobs launch
through multimodal_baby_tpu.cli.runner -> cli.train.
"""

# the main CVCL contrastive recipe (runner_config/saycam_contrastive.py)
CONTRASTIVE_BASE = {
    "dataset": ["saycam"],
    "lambda_mm": [1.0],
    "lambda_lm": [0.0],
    "embedding_type": ["flat"],
    "embedding_dim": [512],
    "dropout_i": [0.5],
    "dropout_o": [0.0],
    "pretrained_cnn": [True],
    "multiple_frames": [True],
    "augment_frames": [True],
    "normalize_features": [True],
    "fix_temperature": [True],
    "temperature": [0.07],
    "num_workers": [8],
    "batch_size": [8],
    "drop_last": [True],
    "optimizer": ["AdamW"],
    "lr": [1e-4],
    "lr_scheduler": [True],
    "weight_decay": [0.1],
    "val_batch_size": [16],
    "eval_include_sos_eos": [True],
    "seed": [0, 1, 2],
    "optimize_unused": [True],
    "max_epochs": [400],
}

CONTRASTIVE_FLAGS = [
    "cnn_dino", "text_encoder", "embedding_dim", "batch_size", "dropout_i",
    "fix_temperature", "lr", "lr_scheduler", "weight_decay", "max_epochs",
    "seed",
]


def derive(base: dict, **overrides) -> dict:
    g = dict(base)
    for k, v in overrides.items():
        if v is None:
            g.pop(k, None)
        else:
            g[k] = v if isinstance(v, list) else [v]
    return g
