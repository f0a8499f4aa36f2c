"""Dataset assembly from config (the data-module layer).

Mirrors the reference's LightningDataModule filename contract relative to
``data_dir`` (multimodal_saycam_data_module.py:40-62): train.json /
train_shuffled.json / val.json / test.json, eval_*_{dev,test}.json,
vocab.json. A "synthetic" dataset serves benchmarks and smoke tests.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

from multimodal_baby_tpu.core.config import DataConfig
from multimodal_baby_tpu.data.datasets import (
    EvalTrialDataset, PairedImageTextDataset, SyntheticPairedDataset,
    TextEvalTrialDataset, load_metadata)
from multimodal_baby_tpu.data.vocab import Vocab


class DataModule:
    """Holds vocab + train/val/test paired datasets + eval-trial datasets.

    The val/test *dataloaders* are pairs [split loader, eval-trial loader],
    matching N_VAL_DATALOADERS_PER_SPLIT=2 (multimodal_data_module.py:32).
    """

    def __init__(self, cfg: DataConfig, vocab_size_hint: int = 2350,
                 seed: int = 0):
        self.cfg = cfg
        self.seed = seed
        self.data_dir = Path(cfg.data_dir)
        self.vocab: Optional[Vocab] = None
        self.datasets: Dict[str, object] = {}
        self.eval_datasets: Dict[str, object] = {}
        self._vocab_size_hint = vocab_size_hint

    def prepare_data(self) -> "DataModule":
        """Run the offline ETL when raw inputs are configured (the L1
        interface, reference multimodal_saycam_data_module.py:159-176).
        Idempotent skip-if-exists: a fully prepared data_dir is a no-op,
        so callers can invoke it unconditionally before setup()."""
        if self.cfg.dataset == "saycam":
            from multimodal_baby_tpu.data.etl import prepare_data
            prepare_data(
                self.data_dir,
                transcript_dir=self.cfg.transcript_dir,
                video_dir=self.cfg.video_dir,
                labeled_s_dir=self.cfg.labeled_s_dir,
                transcript_links_csv=self.cfg.transcript_links_csv,
                seed=self.seed)
        elif self.cfg.dataset == "coco":
            karpathy = self.data_dir / "dataset_coco.json"
            if karpathy.exists():
                from multimodal_baby_tpu.data.coco import prepare_coco
                prepare_coco(self.data_dir, karpathy)
        return self

    def setup(self) -> "DataModule":
        c = self.cfg
        if c.dataset == "synthetic":
            self.vocab = Vocab({f"w{i}": i for i in range(
                self._vocab_size_hint)})
            for split, n in (("train", c.synthetic_size),
                             ("val", max(8, c.synthetic_size // 8)),
                             ("test", max(8, c.synthetic_size // 8))):
                self.datasets[split] = SyntheticPairedDataset(
                    n, len(self.vocab), seed=self.seed)
            return self

        self.vocab = Vocab.load(self.data_dir / "vocab.json")

        train_file = ("train_shuffled.json" if c.shuffle_utterances
                      else "train.json")
        for split, fname in (("train", train_file), ("val", "val.json"),
                             ("test", "test.json")):
            path = self.data_dir / fname
            if path.exists():
                self.datasets[split] = PairedImageTextDataset(
                    load_metadata(path), self.vocab,
                    multiple_frames=c.multiple_frames and split == "train",
                    shuffle_utterances=False,  # pairing handled by file
                    seed=self.seed)

        dev_name = c.eval_metadata_filename
        test_name = dev_name.replace("dev", "test")
        cls = (EvalTrialDataset if c.eval_type == "image"
               else TextEvalTrialDataset)
        for split, fname in (("val", dev_name), ("test", test_name)):
            path = self.data_dir / fname
            if path.exists():
                self.eval_datasets[split] = cls(
                    load_metadata(path), self.vocab,
                    eval_include_sos_eos=c.eval_include_sos_eos)
        return self

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)
