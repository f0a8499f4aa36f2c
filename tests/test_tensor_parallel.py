"""Tensor-parallel correctness: vocab-sharded params on a (4, 2) mesh give
the same loss/gradients as the replicated single-device computation."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.core.config import (
    DataConfig, ExperimentConfig, ModelConfig, ParallelConfig, TextConfig,
    TrainConfig, VisionConfig)
from multimodal_baby_tpu.models import CVCL
from multimodal_baby_tpu.parallel import (
    create_mesh, make_param_shardings, shard_batch)
from multimodal_baby_tpu.train import (
    build_optimizer, init_train_state, make_loss_fn, make_train_step)
from tests.test_train_step import make_batch, make_cfg


def test_tp_matches_replicated():
    cfg = make_cfg(lambda_lm=0.5)  # LM head exercises the vocab sharding
    batch = make_batch(7, b=16)
    model = CVCL(cfg.model)
    batch_j = jax.tree_util.tree_map(jnp.asarray, batch)
    variables = model.init(
        jax.random.PRNGKey(0), batch_j["image"].astype(jnp.float32),
        batch_j["text"], batch_j["text_len"])
    params, bs = variables["params"], variables.get("batch_stats", {})
    rng = jax.random.PRNGKey(3)

    # single-device reference
    loss_fn = make_loss_fn(model, cfg)
    loss_ref, (metrics_ref, _) = loss_fn(params, bs, batch_j, rng, False)
    grads_ref = jax.grad(
        lambda p: loss_fn(p, bs, batch_j, rng, False)[0])(params)

    # (4 data, 2 model) mesh with vocab-sharded token embedding
    mesh = create_mesh((4, 2))
    shardings = make_param_shardings(mesh, params)
    params_tp = jax.tree_util.tree_map(jax.device_put, params, shardings)
    sharded_batch = shard_batch(mesh, batch)
    with mesh:
        loss_tp, (metrics_tp, _) = jax.jit(
            lambda p, b: loss_fn(p, bs, b, rng, False))(
                params_tp, sharded_batch)
        grads_tp = jax.jit(jax.grad(
            lambda p: loss_fn(p, bs, sharded_batch, rng, False)[0]))(
                params_tp)

    np.testing.assert_allclose(float(loss_ref), float(loss_tp), rtol=1e-5)
    # gradient of the (vocab-sharded) embedding matches
    g_ref = np.asarray(grads_ref["text_encoder"]["token_embedding"])
    g_tp = np.asarray(grads_tp["text_encoder"]["token_embedding"])
    np.testing.assert_allclose(g_tp, g_ref, atol=1e-5, rtol=1e-4)
    # the sharded param really is split over the model axis
    emb_sharding = params_tp["text_encoder"]["token_embedding"].sharding
    assert "model" in str(emb_sharding.spec)
