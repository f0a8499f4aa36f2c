"""Train-step correctness on the 8-device virtual CPU mesh: sharding
equivalence, frozen-backbone masking, loss descent, recipe-parity mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.core.config import (
    DataConfig, ExperimentConfig, ModelConfig, ParallelConfig, TextConfig,
    TrainConfig, VisionConfig)
from multimodal_baby_tpu.models import CVCL
from multimodal_baby_tpu.parallel import create_mesh, shard_batch
from multimodal_baby_tpu.train import (
    build_optimizer, init_train_state, make_loss_fn, make_train_step)

B, E, V = 16, 32, 64


def make_cfg(**train_kw):
    return ExperimentConfig(
        model=ModelConfig(
            embedding_dim=E, vocab_size=V, embedding_type="flat",
            fix_temperature=False, normalize_features=True,
            vision=VisionConfig(cnn_model="toy"),
            text=TextConfig(text_encoder="lstm")),
        train=TrainConfig(lr=1e-3, **train_kw),
        parallel=ParallelConfig())


def make_batch(seed=0, b=B, img=64):
    rng = np.random.RandomState(seed)
    text = np.zeros((b, 10), np.int32)
    text_len = rng.randint(2, 10, b).astype(np.int32)
    for i, n in enumerate(text_len):
        text[i, :n] = rng.randint(4, V, n)
    return {
        "image": rng.randn(b, img, img, 3).astype(np.float32),
        "text": text,
        "text_len": text_len,
    }


def setup(cfg, batch):
    model = CVCL(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["image"]),
        jnp.asarray(batch["text"]), jnp.asarray(batch["text_len"]))
    return model, variables


def test_loss_matches_across_mesh():
    """Global-batch InfoNCE on the 8-device mesh == single-device value."""
    cfg = make_cfg()
    batch = make_batch()
    model, variables = setup(cfg, batch)
    params, bs = variables["params"], variables.get("batch_stats", {})
    rng = jax.random.PRNGKey(1)

    loss_fn = make_loss_fn(model, cfg)
    loss_single, (metrics_single, _) = loss_fn(
        params, bs, jax.tree_util.tree_map(jnp.asarray, batch), rng, False)

    mesh = create_mesh((-1, 1))
    sharded = shard_batch(mesh, batch)
    with mesh:
        loss_mesh, (metrics_mesh, _) = jax.jit(
            lambda p, s, b: loss_fn(p, s, b, rng, False))(params, bs, sharded)

    np.testing.assert_allclose(
        float(loss_single), float(loss_mesh), rtol=1e-5)
    np.testing.assert_allclose(
        float(metrics_single["image_accuracy"]),
        float(metrics_mesh["image_accuracy"]), atol=1e-6)


def test_per_shard_negatives_recipe_parity():
    """global_batch_negatives=False: the loss equals the mean of independent
    per-shard InfoNCE over the 8 diagonal blocks."""
    cfg = make_cfg()
    cfg.parallel.global_batch_negatives = False
    batch = make_batch(1)
    model, variables = setup(cfg, batch)
    params, bs = variables["params"], variables.get("batch_stats", {})
    rng = jax.random.PRNGKey(2)

    mesh = create_mesh((-1, 1))
    loss_fn = make_loss_fn(model, cfg, mesh)
    sharded = shard_batch(mesh, batch)
    with mesh:
        loss_mesh, (metrics, _) = jax.jit(
            lambda p, s, b: loss_fn(p, s, b, rng, False))(params, bs, sharded)

    # manual per-block computation
    from multimodal_baby_tpu.models.losses import contrastive_loss_from_logits
    global_fn = make_loss_fn(model, cfg)  # mesh=None -> global logits
    out = model.apply(
        {"params": params, "batch_stats": bs},
        jnp.asarray(batch["image"]), jnp.asarray(batch["text"]),
        jnp.asarray(batch["text_len"]), method="joint_forward")
    lpi = np.asarray(out["logits_per_image"])
    bl = B // 8
    expected = np.mean([
        float(contrastive_loss_from_logits(
            jnp.asarray(lpi[i * bl:(i + 1) * bl, i * bl:(i + 1) * bl]),
            jnp.asarray(lpi[i * bl:(i + 1) * bl, i * bl:(i + 1) * bl].T))[0])
        for i in range(8)])
    np.testing.assert_allclose(float(loss_mesh), expected, rtol=1e-5)


def test_frozen_backbone_and_descent():
    """One train step: backbone params unchanged, heads move, and 30 steps
    reduce the loss."""
    cfg = make_cfg()
    batch = make_batch(3, b=8)
    model, _ = setup(cfg, batch)

    mesh = create_mesh((-1, 1))
    optimizer = None
    batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
    from multimodal_baby_tpu.train import build_optimizer
    variables = model.init(
        jax.random.PRNGKey(0), batch_j["image"], batch_j["text"],
        batch_j["text_len"])
    optimizer = build_optimizer(cfg, variables["params"])
    state = init_train_state(
        model, cfg, optimizer, jax.random.PRNGKey(0), batch_j)
    train_step = make_train_step(model, cfg, optimizer, mesh, donate=False)

    sharded = shard_batch(mesh, batch)
    with mesh:
        state1, metrics0 = train_step(state, sharded)
    # backbone frozen
    b0 = state.params["vision_encoder"]["backbone"]
    b1 = state1.params["vision_encoder"]["backbone"]
    for l0, l1 in zip(jax.tree_util.tree_leaves(b0),
                      jax.tree_util.tree_leaves(b1)):
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    # head moved
    h0 = state.params["vision_encoder"]["head"]["kernel"]
    h1 = state1.params["vision_encoder"]["head"]["kernel"]
    assert np.abs(np.asarray(h0) - np.asarray(h1)).max() > 0

    with mesh:
        st = state1
        for _ in range(30):
            st, metrics = train_step(st, sharded)
    assert float(metrics["loss"]) < float(metrics0["loss"]), \
        (float(metrics["loss"]), float(metrics0["loss"]))


def test_temperature_is_trained_and_logged():
    cfg = make_cfg()
    batch = make_batch(4, b=8)
    model, variables = setup(cfg, batch)
    optimizer = build_optimizer(cfg, variables["params"])
    batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
    state = init_train_state(
        model, cfg, optimizer, jax.random.PRNGKey(0), batch_j)
    train_step = make_train_step(model, cfg, optimizer, donate=False)
    t0 = float(state.params["logit_neg_log_temperature"])
    state1, metrics = train_step(state, batch_j)
    assert abs(float(metrics["temperature"]) - np.exp(-t0)) < 1e-5
    assert float(state1.params["logit_neg_log_temperature"]) != t0


def test_ragged_tail_pads_and_masks_exactly():
    """A ragged tail batch (13 on an 8-device mesh) is padded with
    wrap-around rows + a valid mask, shards cleanly, and the loss/metrics
    equal the unpadded single-device computation exactly."""
    cfg = make_cfg()
    batch = make_batch(7, b=13)
    model, variables = setup(cfg, batch)
    params, bs = variables["params"], variables.get("batch_stats", {})
    rng = jax.random.PRNGKey(5)

    loss_fn = make_loss_fn(model, cfg)
    loss_raw, (m_raw, _) = loss_fn(
        params, bs, jax.tree_util.tree_map(jnp.asarray, batch), rng, False)

    mesh = create_mesh((-1, 1))
    sharded = shard_batch(mesh, batch, pad_to=16)
    assert "valid" in sharded and sharded["image"].shape[0] == 16
    # every leaf sharded over all 8 devices (not replicated)
    assert len(sharded["image"].sharding.device_set) == 8
    with mesh:
        loss_pad, (m_pad, _) = jax.jit(
            lambda p, s, b: loss_fn(p, s, b, rng, False))(params, bs, sharded)

    np.testing.assert_allclose(float(loss_raw), float(loss_pad), rtol=1e-5)
    for k in ("image_accuracy", "text_accuracy", "image_entropy",
              "text_entropy"):
        np.testing.assert_allclose(
            float(m_raw[k]), float(m_pad[k]), rtol=1e-4, err_msg=k)
    assert float(m_pad["batch_size"]) == 13.0


def test_per_shard_mode_logs_entropy():
    """Recipe-parity mode must report the reference's entropy diagnostics
    (multimodal_lit.py:377-443), not zeros."""
    cfg = make_cfg()
    cfg.parallel.global_batch_negatives = False
    batch = make_batch(8)
    model, variables = setup(cfg, batch)
    params, bs = variables["params"], variables.get("batch_stats", {})
    mesh = create_mesh((-1, 1))
    loss_fn = make_loss_fn(model, cfg, mesh)
    sharded = shard_batch(mesh, batch)
    with mesh:
        _, (metrics, _) = jax.jit(
            lambda p, s, b: loss_fn(p, s, b, jax.random.PRNGKey(0), False)
        )(params, bs, sharded)
    assert float(metrics["image_entropy"]) > 0.0
    assert float(metrics["text_entropy"]) > 0.0
