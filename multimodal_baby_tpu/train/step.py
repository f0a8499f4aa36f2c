"""Jitted train / eval steps over the device mesh.

TPU-native scaling design (SURVEY.md section 2.4 / 5.8 — new capability, the
reference is single-GPU):

- The batch is sharded over the ``data`` mesh axis; parameters are replicated
  (vocab-sharded over ``model`` when TP is on). Everything below is ONE jit:
  XLA inserts the all-gather for the global B x B InfoNCE matrix and the
  gradient psum over ICI automatically from the shardings.
- **Global-batch negatives** (default): the InfoNCE negative pool is the
  global batch — the BASELINE.json north star.
- **Per-shard negatives** (``global_batch_negatives=False``): a ``shard_map``
  computes an independent InfoNCE per data shard and averages the losses.
  This preserves the reference's small-batch learning recipe (bs 8 per
  "virtual GPU") exactly while still filling the chip — recipe-parity mode.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from multimodal_baby_tpu.core.config import ExperimentConfig
from multimodal_baby_tpu.core.constants import DATA_AXIS
from multimodal_baby_tpu.models import losses as L


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    step: jax.Array


def init_train_state(model, cfg: ExperimentConfig, optimizer, rng,
                     sample_batch) -> TrainState:
    variables = model.init(
        rng, sample_batch["image"], sample_batch["text"],
        sample_batch["text_len"])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(params, batch_stats, opt_state,
                      jax.random.fold_in(rng, 1), jnp.zeros((), jnp.int32))


def _infonce(logits_per_image, logits_per_text, metrics_out, valid=None):
    infonce, m = L.contrastive_loss_from_logits(
        logits_per_image, logits_per_text, valid=valid)
    metrics_out.update(m)
    return infonce


def make_loss_fn(model, cfg: ExperimentConfig,
                 mesh: Optional[Mesh] = None,
                 extra_cols: Optional[Dict] = None) -> Callable:
    """Builds loss_fn(params, batch_stats, batch, rng, train) ->
    (loss, (metrics, new_batch_stats)).

    extra_cols: additional read-only variable collections closed over the
    step (e.g. "quant_scales" for the calibrated int8 trunk)."""
    extra_cols = extra_cols or {}
    t = cfg.train
    use_mm = bool(t.lambda_mm) or not t.optimize_unused
    use_lm = bool(t.lambda_lm) or not t.optimize_unused
    has_attention = cfg.model.text.attention
    per_shard = (not cfg.parallel.global_batch_negatives and mesh is not None
                 and mesh.shape[DATA_AXIS] > 1)

    augment_frames = cfg.data.augment_frames

    def loss_fn(params, batch_stats, batch, rng, train: bool):
        rng_aug, rng_drop = jax.random.split(rng)
        if "image" in batch:
            image = batch["image"]
        else:
            # raw uint8 from the host loader: augmentation + normalization
            # run on-device inside this jit (data/augment.py); emit the
            # trunk's compute dtype directly (bf16 hot path)
            from multimodal_baby_tpu.data.augment import augment_batch
            aug_dtype = (jnp.bfloat16
                         if cfg.parallel.compute_dtype == "bfloat16"
                         else jnp.float32)
            # MMB_SPLIT_STEM=1: emit the space-to-depth layout straight
            # from the resample einsums (free) and run the 4x4 stem —
            # ResNeXt trunks only (the ViT consumes 224x3 patches)
            s2d = (os.environ.get("MMB_SPLIT_STEM", "0") == "1"
                   and cfg.model.vision.backbone == "resnext50")
            image = augment_batch(
                rng_aug, batch["image_u8"],
                augment=augment_frames and train, dtype=aug_dtype, s2d=s2d)

        variables = {"params": params, "batch_stats": batch_stats,
                     **extra_cols}
        kwargs = dict(train=train, use_mm=use_mm, use_lm=use_lm)
        if train:
            out, updated = model.apply(
                variables, image, batch["text"], batch["text_len"],
                method="joint_forward", mutable=["batch_stats"],
                rngs={"dropout": rng_drop}, **kwargs)
            new_batch_stats = updated.get("batch_stats", batch_stats)
        else:
            out = model.apply(
                variables, image, batch["text"], batch["text_len"],
                method="joint_forward", **kwargs)
            new_batch_stats = batch_stats

        # tail batches arrive padded to the sharding-friendly shape with a
        # boolean row mask (parallel.shard_batch); losses/metrics below
        # exclude the padded rows exactly
        valid = batch.get("valid")
        metrics: Dict[str, jax.Array] = {
            "batch_size": (valid.sum().astype(jnp.float32)
                           if valid is not None
                           else jnp.asarray(image.shape[0], jnp.float32)),
            "temperature": jnp.exp(-out["logit_neg_log_temperature"]),
        }

        infonce = 0.0
        if use_mm:
            if per_shard:
                # independent InfoNCE per data shard (recipe-parity mode)
                infonce = _per_shard_infonce(mesh, out, metrics, valid)
            else:
                infonce = _infonce(out["logits_per_image"],
                                   out["logits_per_text"], metrics,
                                   valid=valid)
            metrics["infonce_loss"] = infonce

        lm_ce = 0.0
        attn_reg = 0.0
        if use_lm:
            lm_labels = out["lm_labels"]
            if valid is not None:
                # padded rows contribute no tokens (PAD == ignore_index)
                from multimodal_baby_tpu.core.constants import PAD_TOKEN_ID
                lm_labels = jnp.where(valid[:, None], lm_labels,
                                      PAD_TOKEN_ID)
            ce, _ = L.lm_cross_entropy(out["lm_logits"], lm_labels)
            breakdown = L.lm_loss_breakdown(ce, lm_labels)
            metrics.update(breakdown)
            lm_ce = breakdown["ce_loss"]
            if has_attention and out.get("attns") is not None:
                attn_reg = L.attn_reg_loss(out["attns"])
                metrics["attn_reg_loss"] = attn_reg

        loss = (t.lambda_mm * infonce + t.lambda_lm * lm_ce
                + t.lambda_ar * attn_reg)
        metrics["loss"] = loss
        return loss, (metrics, new_batch_stats)

    return loss_fn


def _per_shard_infonce(mesh, out, metrics, valid=None):
    """Per-data-shard InfoNCE via shard_map: each shard's B_local x B_local
    block is an independent contrastive problem (reference bs-8 recipe at
    full-chip throughput). All reference diagnostics (accuracy + entropy,
    multimodal_lit.py:377-443) are pmean-reduced across shards."""
    from jax import shard_map

    lpi = out["logits_per_image"]
    if valid is None:
        valid = jnp.ones((lpi.shape[0],), jnp.bool_)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS)),
        out_specs=tuple(P() for _ in range(5)),
    )
    def local_infonce(lpi_rows, valid_rows):
        # lpi_rows: [B_local, B_global]; take the diagonal block
        idx = jax.lax.axis_index(DATA_AXIS)
        b_local = lpi_rows.shape[0]
        block = jax.lax.dynamic_slice_in_dim(
            lpi_rows, idx * b_local, b_local, axis=1)
        m: Dict[str, jax.Array] = {}
        loss = _infonce(block, block.T, m, valid=valid_rows)
        # weight each shard's stats by its valid count so the pooled
        # numbers equal the unsharded computation
        w = valid_rows.sum().astype(loss.dtype)
        w_total = jax.lax.psum(w, DATA_AXIS)

        def pooled(x):
            return jax.lax.psum(x * w, DATA_AXIS) / w_total

        return (pooled(loss), pooled(m["image_accuracy"]),
                pooled(m["text_accuracy"]), pooled(m["image_entropy"]),
                pooled(m["text_entropy"]))

    loss, acc_i, acc_t, ent_i, ent_t = local_infonce(lpi, valid)
    metrics["image_accuracy"] = acc_i
    metrics["text_accuracy"] = acc_t
    metrics["image_entropy"] = ent_i
    metrics["text_entropy"] = ent_t
    return loss


def make_train_step(model, cfg: ExperimentConfig, optimizer,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True,
                    extra_cols: Optional[Dict] = None) -> Callable:
    """Returns jitted (state, batch) -> (state, metrics)."""
    loss_fn = make_loss_fn(model, cfg, mesh, extra_cols)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng, step_rng = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, batch, step_rng, True)
        updates, new_opt = optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_bs, new_opt, rng,
                               state.step + 1)
        return new_state, metrics

    # batch placement/sharding is the caller's job (parallel.shard_batch);
    # the jit partitions the computation from the argument shardings
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, cfg: ExperimentConfig,
                   mesh: Optional[Mesh] = None,
                   extra_cols: Optional[Dict] = None) -> Callable:
    """Validation-split step: joint loss + metrics, no grads, f32-stable."""
    loss_fn = make_loss_fn(model, cfg, mesh, extra_cols)

    def eval_step(params, batch_stats, batch) -> Dict:
        _, (metrics, _) = loss_fn(
            params, batch_stats, batch, jax.random.PRNGKey(0), False)
        return metrics

    return jax.jit(eval_step)
