"""Checkpointing: best-on-val-loss + last + resume, orbax-backed.

Mirrors the reference's ModelCheckpoint(monitor="val_loss", save_last=True,
save_top_k=k, filename="{epoch}") + Lightning resume (train.py:84-89,
:107) and `save_hyperparameters` (the full ExperimentConfig is embedded next
to every checkpoint so restore needs no external config —
multimodal_lit.py:74).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional

import orbax.checkpoint as ocp

from multimodal_baby_tpu.core.config import ExperimentConfig


class CheckpointManager:
    def __init__(self, directory, save_top_k: int = 1):
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.save_top_k = save_top_k
        self.checkpointer = ocp.StandardCheckpointer()
        self._index_path = self.dir / "index.json"
        self.index: Dict[str, Any] = {"best": [], "last": None}
        if self._index_path.exists():
            self.index = json.loads(self._index_path.read_text())

    # ------------------------------------------------------------------

    def _write_index(self):
        self._index_path.write_text(json.dumps(self.index, indent=2))

    def _save_tree(self, name: str, state_tree) -> Path:
        path = self.dir / name
        # force=True overwrites; wait first — saves are async and a pending
        # write to the same path would race the overwrite
        self.checkpointer.wait_until_finished()
        self.checkpointer.save(path, state_tree, force=True)
        return path

    def save(self, state_tree, epoch: int, val_loss: float,
             cfg: Optional[ExperimentConfig] = None,
             extra: Optional[dict] = None) -> None:
        """Save `last` every call and `epoch_N` when it enters the top-k
        best by val_loss (lower is better)."""
        if cfg is not None and not (self.dir / "config.json").exists():
            (self.dir / "config.json").write_text(cfg.to_json())

        self._save_tree("last", state_tree)
        self.index["last"] = {"epoch": epoch, "val_loss": val_loss,
                              "extra": extra or {}}

        best: List[dict] = self.index["best"]
        if len(best) < self.save_top_k or \
                val_loss < max(b["val_loss"] for b in best):
            name = f"epoch_{epoch}"
            self._save_tree(name, state_tree)
            best.append({"name": name, "epoch": epoch,
                         "val_loss": val_loss})
            best.sort(key=lambda b: b["val_loss"])
            while len(best) > self.save_top_k:
                drop = best.pop()
                p = self.dir / drop["name"]
                if p.exists():
                    shutil.rmtree(p)
        self._write_index()

    # ------------------------------------------------------------------

    def best_path(self) -> Optional[Path]:
        if self.index["best"]:
            return self.dir / self.index["best"][0]["name"]
        return None

    def last_path(self) -> Optional[Path]:
        p = self.dir / "last"
        return p if p.exists() else None

    def wait(self):
        self.checkpointer.wait_until_finished()

    def restore(self, path, target_tree):
        """Restore into the structure of target_tree."""
        self.checkpointer.wait_until_finished()
        return self.checkpointer.restore(Path(path).absolute(), target_tree)

    def restore_last(self, target_tree):
        p = self.last_path()
        if p is None:
            return None, None
        return self.restore(p, target_tree), self.index.get("last")

    @staticmethod
    def load_config(ckpt_dir) -> ExperimentConfig:
        return ExperimentConfig.from_json(
            (Path(ckpt_dir) / "config.json").read_text())
