"""End-to-end trainer: fit on synthetic data over the 8-device mesh,
checkpoint/resume, plateau LR scheduling, metric aggregation semantics."""

import math

import numpy as np
import pytest

import jax

from multimodal_baby_tpu.core.config import (
    DataConfig, ExperimentConfig, ModelConfig, ParallelConfig, TextConfig,
    TrainConfig, VisionConfig)
from multimodal_baby_tpu.train.metrics import aggregate_epoch
from multimodal_baby_tpu.train.trainer import Trainer


def make_cfg(tmp_path, **train_kw):
    train_kw.setdefault("max_epochs", 2)
    return ExperimentConfig(
        exp_name="t",
        model=ModelConfig(
            embedding_dim=16, vocab_size=64, embedding_type="flat",
            normalize_features=True,
            vision=VisionConfig(cnn_model="toy"),
            text=TextConfig(text_encoder="embedding")),
        data=DataConfig(dataset="synthetic", synthetic_size=32,
                        batch_size=16, val_batch_size=16, num_workers=2),
        train=TrainConfig(lr=1e-3,
                          checkpoint_dir=str(tmp_path), **train_kw),
        parallel=ParallelConfig(compute_dtype="float32"))


def test_fit_and_resume(tmp_path):
    cfg = make_cfg(tmp_path)
    # synthetic images are 224x224; shrink via model-agnostic path is not
    # needed — toy backbone handles any size
    trainer = Trainer(cfg)
    trainer.data.vocab_size
    out = trainer.fit()
    assert "loss" in out and math.isfinite(out["loss"])
    assert int(trainer.state.step) == 2 * 2  # 2 epochs x 2 batches

    # checkpoint exists: last + best epoch dir + config
    ckdir = tmp_path / "t"
    assert (ckdir / "last").exists()
    assert (ckdir / "config.json").exists()
    assert (ckdir / "index.json").exists()

    # resume continues from epoch 2
    cfg2 = make_cfg(tmp_path, resume_ckpt="last", max_epochs=3)
    trainer2 = Trainer(cfg2)
    assert trainer2.start_epoch == 2
    assert int(trainer2.state.step) == 4
    trainer2.fit()
    assert int(trainer2.state.step) == 6


def test_plateau_reduces_lr(tmp_path):
    cfg = make_cfg(tmp_path, lr_scheduler=True, patience=0, factor=0.5,
                   max_epochs=4)
    trainer = Trainer(cfg)
    from multimodal_baby_tpu.train.optimizer import get_learning_rate
    lr0 = get_learning_rate(trainer.state.opt_state)
    # force plateau: monkeypatch validate to constant loss
    trainer.validate = lambda split="val": {"loss": 1.0}
    trainer.fit()
    lr1 = get_learning_rate(trainer.state.opt_state)
    assert lr1 < lr0


def test_aggregate_epoch_weighting():
    outputs = [
        {"batch_size": 2, "loss": 1.0, "infonce_loss": 1.0,
         "image_accuracy": 1.0, "text_accuracy": 1.0,
         "image_entropy": 0.0, "text_entropy": 0.0,
         "ce_loss": 2.0, "n_tokens": 10,
         "ce_loss_wo_sos": 2.0, "n_tokens_wo_sos": 8,
         "ce_loss_wo_sos_eos": 2.0, "n_tokens_wo_sos_eos": 6},
        {"batch_size": 6, "loss": 2.0, "infonce_loss": 2.0,
         "image_accuracy": 0.0, "text_accuracy": 0.5,
         "image_entropy": 1.0, "text_entropy": 1.0,
         "ce_loss": 4.0, "n_tokens": 30,
         "ce_loss_wo_sos": 4.0, "n_tokens_wo_sos": 24,
         "ce_loss_wo_sos_eos": 4.0, "n_tokens_wo_sos_eos": 18},
    ]
    agg = aggregate_epoch(outputs)
    # example-weighted: (1*2 + 2*6) / 8
    assert abs(agg["loss"] - 14 / 8) < 1e-9
    assert abs(agg["image_accuracy"] - 2 / 8) < 1e-9
    # token-weighted: (2*10 + 4*30) / 40
    assert abs(agg["ce_loss"] - 140 / 40) < 1e-9
    assert abs(agg["perplexity"] - math.exp(3.5)) < 1e-6


def test_load_trained_checkpoint_via_public_api(tmp_path):
    """The user path: train -> CVCLModel.from_checkpoint_dir -> encode."""
    import jax.numpy as jnp
    from multimodal_baby_tpu.api.model import CVCLModel

    cfg = make_cfg(tmp_path, max_epochs=1)
    trainer = Trainer(cfg)
    trainer.fit()

    model = CVCLModel.from_checkpoint_dir(tmp_path / "t", which="best")
    imgs = np.random.RandomState(0).randn(2, 224, 224, 3).astype(np.float32)
    feats = model.encode_image(imgs)
    assert feats.shape == (2, 16)
    # params actually came from the trained state, not a fresh init
    trained = np.asarray(trainer.state.params["vision_encoder"]["head"]
                         ["kernel"])
    loaded = np.asarray(
        model.variables["params"]["vision_encoder"]["head"]["kernel"])
    np.testing.assert_array_equal(trained, loaded)


def test_config_json_roundtrip():
    from multimodal_baby_tpu.core.config import ExperimentConfig
    cfg = ExperimentConfig()
    cfg.model.embedding_dim = 512
    cfg.model.text.text_encoder = "lstm"
    cfg.parallel.mesh_shape = (4, 2)
    cfg2 = ExperimentConfig.from_json(cfg.to_json())
    assert cfg2.model.embedding_dim == 512
    assert cfg2.model.text.text_encoder == "lstm"
    assert cfg2.parallel.mesh_shape == (4, 2)
    assert cfg2.to_json() == cfg.to_json()


def test_vocab_mismatch_is_hard_error(tmp_path):
    """A checkpoint whose vocab_size no word table matches must refuse to
    load (silent placeholder vocab would make tokenize garbage) unless
    explicitly opted into."""
    import pytest
    from multimodal_baby_tpu.api.model import CVCLModel

    cfg = make_cfg(tmp_path, max_epochs=1)
    trainer = Trainer(cfg)
    trainer.fit()

    # corrupt the embedded config's vocab_size so no table can match
    import json
    cfg_path = tmp_path / "t" / "config.json"
    blob = json.loads(cfg_path.read_text())
    blob["model"]["vocab_size"] = 999
    cfg_path.write_text(json.dumps(blob))

    with pytest.raises(ValueError, match="vocab_size"):
        CVCLModel.from_checkpoint_dir(tmp_path / "t", which="best")


def test_resume_recalibrates_int8_scales(tmp_path, monkeypatch):
    """int8 activation scales measured on random-init weights are wrong
    for a restored checkpoint: _resume must re-run calibration against
    the restored params (train/trainer.py:_recalibrate)."""
    import jax.numpy as jnp

    from multimodal_baby_tpu.models import quant_calib

    cfg = make_cfg(tmp_path)
    trainer = Trainer(cfg)
    trainer.fit()

    calls = []

    def fake_calibrate(variables, images):
        calls.append(jax.tree_util.tree_map(np.asarray, variables["params"]))
        out = dict(variables)
        out["quant_scales"] = {"calibrated": jnp.float32(len(calls))}
        return out

    monkeypatch.setattr(quant_calib, "calibrate_cvcl", fake_calibrate)

    cfg2 = make_cfg(tmp_path, resume_ckpt="last", max_epochs=3)
    trainer2 = Trainer(cfg2)
    # simulate an int8 run: quant scales active from _build's calibration
    trainer2.extra_cols = {"quant_scales": {"calibrated": jnp.float32(0)}}
    trainer2._calib_images = jnp.zeros((2, 32, 32, 3), jnp.float32)
    trainer2._resume("last")

    assert len(calls) == 1, "resume must re-run calibration"
    # calibration saw the RESTORED params, not fresh random-init ones
    restored = jax.tree_util.tree_map(np.asarray, trainer2.state.params)
    flat_seen = jax.tree_util.tree_leaves(calls[0])
    flat_restored = jax.tree_util.tree_leaves(restored)
    assert all(np.allclose(a, b) for a, b in zip(flat_seen, flat_restored))
    # and the steps now close over the new scales
    assert float(trainer2.extra_cols["quant_scales"]["calibrated"]) == 1.0
