"""Full-system learning test: the Trainer must actually learn a
grounded word-referent mapping — train CVCL on structured synthetic data
(class-colored images paired with class tokens) and verify the in-training
forced-choice eval climbs well above chance. Exercises data module ->
loader -> augmented train step -> checkpointing -> batched eval, end to
end."""

import numpy as np
import pytest

from multimodal_baby_tpu.core.config import (
    DataConfig, ExperimentConfig, ModelConfig, ParallelConfig, TextConfig,
    TrainConfig, VisionConfig)
from multimodal_baby_tpu.core.constants import (
    EOS_TOKEN_ID, PAD_TOKEN_ID, SOS_TOKEN_ID)
from multimodal_baby_tpu.data.vocab import Vocab
from multimodal_baby_tpu.train.trainer import Trainer

N_CLASSES = 6
IMG = 64


def class_image(rng, cls, img=IMG):
    """A class-keyed color-block image + noise."""
    base = np.zeros((img, img, 3), np.float32)
    base[..., cls % 3] = 150 + 15 * cls
    half = img // 2
    if cls % 2:
        base[:half] *= 0.5
    noise = rng.randint(0, 40, (img, img, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


class StructuredDataset:
    def __init__(self, n, seed=0):
        self.rng = np.random.RandomState(seed)
        self.classes = self.rng.randint(0, N_CLASSES, n)

    def __len__(self):
        return len(self.classes)

    def __getitem__(self, i):
        cls = self.classes[i]
        ids = np.full((8,), PAD_TOKEN_ID, np.int32)
        ids[:3] = [SOS_TOKEN_ID, 4 + cls, EOS_TOKEN_ID]
        return (class_image(self.rng, cls), ids, 3, f"w{cls}")


class StructuredEvalDataset:
    def __init__(self, n, seed=100):
        self.rng = np.random.RandomState(seed)
        self.data = []
        for i in range(n):
            target = self.rng.randint(0, N_CLASSES)
            foils = self.rng.choice(
                [c for c in range(N_CLASSES) if c != target], 3,
                replace=False)
            self.data.append((target, list(foils)))

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        target, foils = self.data[i]
        imgs = np.stack([class_image(self.rng, c)
                         for c in [target] + foils])
        ids = np.full((8,), PAD_TOKEN_ID, np.int32)
        ids[0] = 4 + target
        return imgs, ids, 1, f"w{target}"


class StructuredModule:
    """Duck-typed DataModule."""

    def __init__(self):
        self.vocab = Vocab({w: i for i, w in enumerate(
            ["<pad>", "<unk>", "<sos>", "<eos>"]
            + [f"w{c}" for c in range(N_CLASSES)])})
        self.datasets = {"train": StructuredDataset(96, 0),
                         "val": StructuredDataset(32, 1)}
        self.eval_datasets = {"val": StructuredEvalDataset(40)}

    @property
    def vocab_size(self):
        return len(self.vocab)


def test_learns_word_referent_mapping(tmp_path):
    cfg = ExperimentConfig(
        exp_name="e2e",
        model=ModelConfig(
            embedding_dim=32, vocab_size=4 + N_CLASSES,
            embedding_type="flat", normalize_features=True,
            fix_temperature=True, temperature=0.07,
            vision=VisionConfig(cnn_model="toy"),
            text=TextConfig(text_encoder="embedding")),
        data=DataConfig(dataset="synthetic", batch_size=32,
                        val_batch_size=32, num_workers=2,
                        augment_frames=True),
        train=TrainConfig(max_epochs=12, lr=3e-3,
                          checkpoint_dir=str(tmp_path),
                          val_every_n_epochs=4),
        parallel=ParallelConfig(compute_dtype="float32"))

    trainer = Trainer(cfg, data=StructuredModule())
    out = trainer.fit()
    # 4-way chance = 25%; a working pipeline separates 6 color classes
    assert out["accuracy"] > 0.6, out
    # the category-level metrics exist (reference logging contract)
    assert any(k.startswith("accuracy_w") for k in out)
