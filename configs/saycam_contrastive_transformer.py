"""CVCL-transformer: DINO ViT-B/14 + 1-layer transformer text encoder with
learned positional embeddings
(reference: runner_config/saycam_contrastive_transformer.py:10-22)."""

from configs._base import CONTRASTIVE_BASE, CONTRASTIVE_FLAGS, derive

grids = [
    derive(CONTRASTIVE_BASE,
           vit_dino=True,
           text_encoder="transformer",
           pos_embed_type="learned"),
]
flags = CONTRASTIVE_FLAGS + ["pos_embed_type"]
