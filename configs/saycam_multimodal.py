"""Contrastive batch-size sweep
(reference: runner_config/saycam_multimodal.py): bs up to 512; on TPU the
large-batch points use global-batch negatives across the mesh."""

from configs._base import CONTRASTIVE_BASE, CONTRASTIVE_FLAGS, derive

grids = [
    derive(CONTRASTIVE_BASE,
           cnn_dino=True,
           text_encoder=["embedding", "lstm"],
           batch_size=[8, 64, 512]),
]
flags = CONTRASTIVE_FLAGS
