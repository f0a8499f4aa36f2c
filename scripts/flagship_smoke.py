"""Flagship learning smoke on real TPU: full CVCL (512-d, frozen ResNeXt-50
trunk, bf16, on-device augmentation) on structured synthetic data; the
in-training forced-choice eval must climb well above the 25% chance level.

Validated 2026-08-16 (v5e): 72.5% after 6 epochs.

    PYTHONPATH=. python scripts/flagship_smoke.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))
import test_end_to_end_learning as e2e  # noqa: E402

e2e.IMG = 224  # full-size frames for the real trunk

from multimodal_baby_tpu.core.config import (  # noqa: E402
    DataConfig, ExperimentConfig, ModelConfig, ParallelConfig, TextConfig,
    TrainConfig, VisionConfig)
from multimodal_baby_tpu.train.trainer import Trainer  # noqa: E402


def main():
    cfg = ExperimentConfig(
        exp_name="flagship_smoke",
        model=ModelConfig(
            embedding_dim=512, embedding_type="flat",
            normalize_features=True, fix_temperature=True,
            temperature=0.07,
            vision=VisionConfig(cnn_dino=True, frozen_bn="running"),
            text=TextConfig(text_encoder="embedding")),
        data=DataConfig(dataset="synthetic", batch_size=32,
                        val_batch_size=32, num_workers=2,
                        augment_frames=True),
        train=TrainConfig(max_epochs=6, lr=3e-3,
                          checkpoint_dir="/tmp/ck_flagship",
                          val_every_n_epochs=3),
        parallel=ParallelConfig(compute_dtype="bfloat16"))

    trainer = Trainer(cfg, data=e2e.StructuredModule())
    out = trainer.fit()
    print("final:", {k: round(v, 3) for k, v in out.items()})
    assert out["accuracy"] > 0.5, out
    print("FLAGSHIP LEARNING OK")


if __name__ == "__main__":
    main()
