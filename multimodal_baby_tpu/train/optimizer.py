"""Optimizer construction: AdamW/Adam/SGD + frozen-backbone masking +
ReduceLROnPlateau-equivalent scheduling.

Reference recipe (multimodal_lit.py:112-128): torch.optim.AdamW over *all*
parameters with weight_decay on everything (torch semantics — including
biases and norm scales), with frozen params excluded implicitly via
``requires_grad=False``. Here freezing is explicit: an optax mask zeroes
updates (and allocates no moment state) for the vision trunk when
``finetune_cnn`` is off.

The LR schedule is a functional ReduceLROnPlateau: a plateau counter lives in
host-side trainer state (see train.plateau) and multiplies the base LR
through ``optax.inject_hyperparams``.
"""

from __future__ import annotations

import jax
import optax

from multimodal_baby_tpu.core.config import ExperimentConfig


def frozen_mask(params, finetune_cnn: bool):
    """True = trainable. The vision *backbone* is frozen unless finetune_cnn;
    the projection head stays trainable (reference: multimodal.py:175-193)."""

    def decide(path, _leaf) -> bool:
        names = [getattr(k, "key", str(k)) for k in path]
        if not finetune_cnn and "vision_encoder" in names \
                and "backbone" in names:
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


_OPTIMIZERS: dict = {
    "AdamW": lambda lr, wd: optax.adamw(
        lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd),
    "Adam": lambda lr, wd: optax.chain(
        optax.add_decayed_weights(wd), optax.adam(lr)),
    "SGD": lambda lr, wd: optax.chain(
        optax.add_decayed_weights(wd), optax.sgd(lr)),
}


def build_optimizer(cfg: ExperimentConfig, params) -> optax.GradientTransformation:
    t = cfg.train

    def make(learning_rate):
        return _OPTIMIZERS[t.optimizer](learning_rate, t.weight_decay)

    # inject_hyperparams lets the trainer scale the LR on plateau without
    # rebuilding optimizer state
    opt = optax.inject_hyperparams(make)(learning_rate=t.lr)
    mask = frozen_mask(params, cfg.model.vision.finetune_cnn)
    return optax.masked(opt, mask)


def set_learning_rate(opt_state, lr: float):
    """Update the injected LR inside a masked+injected optimizer state."""
    inner = opt_state.inner_state
    inner.hyperparams["learning_rate"] = jax.numpy.asarray(lr)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.inner_state.hyperparams["learning_rate"])


class ReduceLROnPlateau:
    """Host-side plateau tracker with torch semantics
    (factor, patience, mode=min on val_loss; multimodal_lit.py:117-121)."""

    def __init__(self, factor: float = 0.1, patience: int = 20,
                 min_lr: float = 0.0):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad_epochs = 0

    def step(self, metric: float, lr: float) -> float:
        """Returns the (possibly reduced) learning rate."""
        if metric < self.best:
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.num_bad_epochs = 0
            return max(lr * self.factor, self.min_lr)
        return lr

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad_epochs": self.num_bad_epochs}

    def load_state_dict(self, d: dict) -> None:
        self.best = d["best"]
        self.num_bad_epochs = d["num_bad_epochs"]
