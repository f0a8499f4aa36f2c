"""The training loop: epochs, validation (joint loss + forced-choice
trials), plateau LR, checkpointing, resume, logging.

Orchestration parity with the reference's Lightning setup (train.py:58-107 +
MultiModalLitModel hooks), TPU-native execution: one jitted train step over
the device mesh, host loop only moves uint8 batches and aggregates metrics.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.core.config import ExperimentConfig
from multimodal_baby_tpu.data.loader import DataLoader
from multimodal_baby_tpu.data.modules import DataModule
from multimodal_baby_tpu.evaluation.forced_choice import run_forced_choice
from multimodal_baby_tpu.models import CVCL
from multimodal_baby_tpu.parallel import create_mesh, shard_batch
from multimodal_baby_tpu.train.checkpoint import CheckpointManager
from multimodal_baby_tpu.train.metrics import (
    MetricsLogger, aggregate_epoch, to_host)
from multimodal_baby_tpu.train.optimizer import (
    ReduceLROnPlateau, build_optimizer, get_learning_rate,
    set_learning_rate)
from multimodal_baby_tpu.train.step import (
    TrainState, make_eval_step, make_train_step)


class Trainer:
    def __init__(self, cfg: ExperimentConfig,
                 data: Optional[DataModule] = None):
        self.cfg = cfg
        self.data = data or DataModule(
            cfg.data, vocab_size_hint=cfg.model.vocab_size,
            seed=cfg.train.seed).setup()
        cfg.model.vocab_size = self.data.vocab_size

        dtype = {"bfloat16": jnp.bfloat16, "float32": None}[
            cfg.parallel.compute_dtype]
        self.model = CVCL(cfg.model, dtype=dtype)
        self.mesh = create_mesh(cfg.parallel.mesh_shape)

        self.ckpt = CheckpointManager(
            Path(cfg.train.checkpoint_dir) / cfg.exp_name,
            save_top_k=cfg.train.save_top_k)
        # make the checkpoint dir self-contained: persist the training
        # vocab next to the weights so from_checkpoint_dir never has to
        # guess a word table (reference embeds the vocab via hparams,
        # multimodal_lit.py:74)
        if self.data.vocab is not None:
            vocab_path = self.ckpt.dir / "vocab.json"
            if not vocab_path.exists():
                self.data.vocab.save(vocab_path)
        self.logger = MetricsLogger(
            Path(cfg.train.checkpoint_dir) / cfg.exp_name,
            use_wandb=cfg.train.logger == "wandb",
            wandb_kwargs={"project": "multimodal-saycam-tpu",
                          "config": cfg.to_json()})
        self.plateau = ReduceLROnPlateau(cfg.train.factor,
                                         cfg.train.patience)
        self.start_epoch = 0
        self._build()

    # ------------------------------------------------------------------

    def _sample_batch(self):
        loader = DataLoader(self.data.datasets["train"],
                            self.cfg.data.batch_size, shuffle=False,
                            num_workers=1)
        batch = next(iter(loader))
        return self._device_batch(batch)

    def _device_batch(self, batch, pad_to=None):
        arrays = {k: v for k, v in batch.items() if k != "raw"}
        return shard_batch(self.mesh, arrays, pad_to=pad_to)

    def _build(self):
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.train.seed)
        sample = self._sample_batch()
        # init wants a float image for tracing
        init_batch = dict(sample)
        if "image_u8" in init_batch:
            init_batch["image"] = init_batch.pop("image_u8").astype(
                jnp.float32)
        self.optimizer = None
        variables = self.model.init(
            rng, init_batch["image"], init_batch["text"],
            init_batch["text_len"])
        self.optimizer = build_optimizer(cfg, variables["params"])
        self.extra_cols = {}
        if "quant_scales" in variables:
            # int8 trunk: calibrate activation ranges on the sample batch
            # (models/quant_calib.py); the scales ride along as a
            # read-only collection closed over the step
            from multimodal_baby_tpu.data.augment import augment_batch
            from multimodal_baby_tpu.models.quant_calib import (
                calibrate_cvcl)
            if "image_u8" in sample:
                calib = augment_batch(rng, sample["image_u8"][:32],
                                      augment=False)
            else:
                calib = init_batch["image"][:32]
            variables = calibrate_cvcl(variables, calib)
            self.extra_cols = {"quant_scales": variables["quant_scales"]}
            self._calib_images = calib
        self.state = TrainState(
            variables["params"], variables.get("batch_stats", {}),
            self.optimizer.init(variables["params"]),
            jax.random.fold_in(rng, 1), jnp.zeros((), jnp.int32))
        self.train_step = make_train_step(
            self.model, cfg, self.optimizer, self.mesh, donate=True,
            extra_cols=self.extra_cols)
        self.eval_step = make_eval_step(self.model, cfg, self.mesh,
                                        extra_cols=self.extra_cols)

        if cfg.train.resume_ckpt:
            self._resume(cfg.train.resume_ckpt)

    def _resume(self, which: str):
        target = {"state": tuple(self.state),
                  "plateau": self.plateau.state_dict(),
                  "epoch": 0, "lr": self.cfg.train.lr}
        if which == "last":
            restored, _ = self.ckpt.restore_last(target)
        else:
            restored = self.ckpt.restore(which, target)
        if restored is None:
            print("no checkpoint to resume from; starting fresh")
            return
        # restored arrays land on one device; re-place replicated over the
        # mesh so they compose with sharded batches
        from multimodal_baby_tpu.parallel import replicated
        rep = replicated(self.mesh)
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), restored["state"])
        self.state = TrainState(*state)
        self.plateau.load_state_dict(restored["plateau"])
        self.start_epoch = int(restored["epoch"]) + 1
        self.state = self.state._replace(
            opt_state=set_learning_rate(self.state.opt_state,
                                        float(restored["lr"])))
        if "quant_scales" in self.extra_cols:
            self._recalibrate()
        print(f"resumed from epoch {self.start_epoch - 1}")

    def _recalibrate(self):
        """Re-measure int8 activation scales against the CURRENT params.

        _build calibrates on the fresh random-init weights; after a
        checkpoint resume those ranges belong to a different network and
        would systematically mis-scale the restored trunk's int8 codes,
        so resume re-runs calibration on the restored weights and
        rebuilds the steps that close over the scales."""
        from multimodal_baby_tpu.models.quant_calib import calibrate_cvcl
        variables = calibrate_cvcl(
            {"params": self.state.params,
             "batch_stats": self.state.batch_stats},
            self._calib_images)
        self.extra_cols = {"quant_scales": variables["quant_scales"]}
        cfg = self.cfg
        self.train_step = make_train_step(
            self.model, cfg, self.optimizer, self.mesh, donate=True,
            extra_cols=self.extra_cols)
        self.eval_step = make_eval_step(self.model, cfg, self.mesh,
                                        extra_cols=self.extra_cols)

    def _checkpoint_tree(self, epoch: int):
        return {"state": tuple(self.state),
                "plateau": self.plateau.state_dict(),
                "epoch": epoch,
                "lr": get_learning_rate(self.state.opt_state)}

    # ------------------------------------------------------------------

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        loader = DataLoader(
            self.data.datasets["train"], cfg.data.batch_size,
            shuffle=True, drop_last=cfg.data.drop_last,
            num_workers=cfg.data.num_workers,
            seed=cfg.train.seed * 10000 + epoch)
        device_outputs: List[Dict] = []
        with self.mesh:
            pending = None
            for step_idx, batch in enumerate(loader):
                # one-batch transfer lookahead; metrics stay on device so
                # the host never blocks inside the epoch (steps dispatch
                # asynchronously and pipeline with the H2D copies)
                device_batch = self._device_batch(
                    batch, pad_to=cfg.data.batch_size)
                if pending is not None:
                    self.state, metrics = self.train_step(
                        self.state, pending)
                    device_outputs.append(metrics)
                pending = device_batch
            if pending is not None:
                self.state, metrics = self.train_step(self.state, pending)
                device_outputs.append(metrics)
        outputs = [to_host(m) for m in device_outputs]
        for step_idx, host in enumerate(outputs):
            if step_idx % cfg.train.log_every_n_steps == 0:
                self.logger.log(
                    host,
                    int(self.state.step) - len(outputs) + step_idx + 1,
                    prefix="train_")
        agg = aggregate_epoch(outputs)
        self.logger.log(agg, int(self.state.step), prefix="train_epoch_")
        return agg

    def validate(self, split: str = "val") -> Dict[str, float]:
        cfg = self.cfg
        out: Dict[str, float] = {}
        dataset = self.data.datasets.get(split)
        outputs: List[Dict[str, float]] = []
        if dataset is not None:
            loader = DataLoader(dataset, cfg.data.val_batch_size,
                                shuffle=False,
                                num_workers=cfg.data.num_workers)
            with self.mesh:
                for batch in loader:
                    device_batch = self._device_batch(
                        batch, pad_to=cfg.data.val_batch_size)
                    metrics = self.eval_step(
                        self.state.params, self.state.batch_stats,
                        device_batch)
                    outputs.append(to_host(metrics))
            out.update(aggregate_epoch(outputs))

        if cfg.train.eval_textgen and cfg.train.lambda_lm \
                and dataset is not None:
            from multimodal_baby_tpu.evaluation.textgen import (
                run_textgen_eval)
            loader = DataLoader(dataset, cfg.data.val_batch_size,
                                shuffle=False,
                                num_workers=cfg.data.num_workers)
            variables = {"params": self.state.params,
                         "batch_stats": self.state.batch_stats,
                         **self.extra_cols}
            scores, _, _ = run_textgen_eval(
                self.model, variables, loader, self.data.vocab,
                beam_width=cfg.train.beam_width,
                decode_length=cfg.train.decode_length,
                length_penalty_alpha=cfg.train.length_penalty_alpha,
                captioning=self.cfg.model.text.captioning)
            out.update(scores)

        eval_ds = self.data.eval_datasets.get(split)
        if eval_ds is not None:
            variables = {"params": self.state.params,
                         "batch_stats": self.state.batch_stats,
                         **self.extra_cols}
            accs, _ = run_forced_choice(
                self.model, variables, eval_ds, cfg.data.eval_type)
            out["accuracy"] = accs["total"]
            for cat, acc in accs.items():
                if cat != "total":
                    out[f"accuracy_{cat}"] = acc
        self.logger.log(out, int(self.state.step), prefix=f"{split}_")
        return out

    # ------------------------------------------------------------------

    def fit(self) -> Dict[str, float]:
        cfg = self.cfg
        last_val: Dict[str, float] = {}
        for epoch in range(self.start_epoch, cfg.train.max_epochs):
            t0 = time.time()
            train_metrics = self.train_epoch(epoch)
            if (epoch + 1) % cfg.train.val_every_n_epochs == 0:
                last_val = self.validate("val")
                val_loss = last_val.get("loss", float("inf"))
                if cfg.train.lr_scheduler:
                    lr = get_learning_rate(self.state.opt_state)
                    new_lr = self.plateau.step(val_loss, lr)
                    if new_lr != lr:
                        self.state = self.state._replace(
                            opt_state=set_learning_rate(
                                self.state.opt_state, new_lr))
                        print(f"plateau: lr {lr:.2e} -> {new_lr:.2e}")
                self.ckpt.save(self._checkpoint_tree(epoch), epoch,
                               val_loss, cfg)
            if cfg.data.test_while_val and \
                    (epoch + 1) % cfg.train.val_every_n_epochs == 0:
                self.validate("test")
            dt = time.time() - t0
            print(f"epoch {epoch}: train_loss="
                  f"{train_metrics.get('loss', float('nan')):.4f} "
                  f"val_loss={last_val.get('loss', float('nan')):.4f} "
                  f"val_acc={last_val.get('accuracy', float('nan')):.3f} "
                  f"({dt:.1f}s)")
        self.ckpt.wait()  # flush pending async checkpoint writes
        return last_val
