"""Capture + summarize a device trace of the ViT-flagship train step.

Same step as scripts/perf_vit_flagship.py (DINO ViT-B/14 + 1-layer
transformer text encoder at B=256 bf16); same per-HLO-category summary
as scripts/profile_step.py. Ground truth for the round-3 ViT levers
(the old "12 x 5.4 ms LN fusions" trace predates the f32-promotion fix
in models/vision_vit.prepare_tokens and needs re-measuring).

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_vit.py \
        [trace_dir]   # default /tmp/trace_vit

Honors MMB_VIT_INT8 / MMB_FUSED_ATTN like the bench script.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import traverse_util


def capture(trace_dir: str) -> None:
    from multimodal_baby_tpu.core.config import (
        ExperimentConfig, ModelConfig, ParallelConfig, TextConfig,
        TrainConfig, VisionConfig)
    from multimodal_baby_tpu.core.constants import MAX_LEN_UTTERANCE
    from multimodal_baby_tpu.data.augment import augment_batch
    from multimodal_baby_tpu.models import CVCL
    from multimodal_baby_tpu.models.losses import (
        contrastive_loss_from_logits)
    from multimodal_baby_tpu.train import build_optimizer
    from multimodal_baby_tpu.train.optimizer import frozen_mask

    # MMB_VIT_BENCH_BATCH: small batches keep the trace payload under
    # the tunnel's HTTP 413 request-size limit (B=256 traces exceed it)
    BATCH = int(os.environ.get("MMB_VIT_BENCH_BATCH", "256"))
    VOCAB = 2350
    cfg = ExperimentConfig(
        model=ModelConfig(
            embedding_dim=512, vocab_size=VOCAB, embedding_type="flat",
            normalize_features=True, fix_temperature=True, temperature=0.07,
            vision=VisionConfig(vit_dino=True),
            text=TextConfig(text_encoder="transformer",
                            pos_embed_type="learned")),
        train=TrainConfig(optimizer="AdamW", lr=1e-4, weight_decay=0.1),
        parallel=ParallelConfig())
    model = CVCL(cfg.model, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (BATCH, 224, 224, 3), np.uint8)
    text = np.zeros((BATCH, MAX_LEN_UTTERANCE), np.int32)
    lens = rng.randint(1, MAX_LEN_UTTERANCE - 1, BATCH)
    text[:, 0] = 2
    for i, n in enumerate(lens):
        text[i, 1:1 + n] = rng.randint(4, VOCAB, n)
        text[i, 1 + n] = 3
    batch = {"image_u8": jnp.asarray(images), "text": jnp.asarray(text),
             "text_len": jnp.asarray((lens + 2).astype(np.int32))}

    init_img = augment_batch(jax.random.PRNGKey(0), batch["image_u8"],
                             augment=False)
    variables = model.init(jax.random.PRNGKey(0), init_img, batch["text"],
                           batch["text_len"])
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    flat_p = traverse_util.flatten_dict(params)
    flat_m = traverse_util.flatten_dict(frozen_mask(params, False))
    frozen_flat = {k: v for k, v in flat_p.items() if not flat_m[k]}
    tp = traverse_util.unflatten_dict(
        {k: v for k, v in flat_p.items() if flat_m[k]})
    optimizer = build_optimizer(cfg, tp)
    opt_state = optimizer.init(tp)

    # frozen params must be a jit ARGUMENT, not a closure: closed-over
    # arrays are serialized into the compile payload, and ~330 MB of
    # frozen ViT params blows the tunnel's remote_compile request limit
    # (HTTP 413) — same frozen-params-out-of-carry rule as the ResNeXt
    # profiler.
    def one_step(frozen_flat, carry, key):
        tp, opt_state = carry
        imgs = augment_batch(key, batch["image_u8"], augment=True,
                             dtype=jnp.bfloat16)

        def loss_fn(tp):
            p = traverse_util.unflatten_dict(
                {**frozen_flat, **traverse_util.flatten_dict(tp)})
            (lpi, lpt), _ = model.apply(
                {"params": p, "batch_stats": bstats}, imgs,
                batch["text"], batch["text_len"], train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(key, 7)})
            loss, _m = contrastive_loss_from_logits(lpi, lpt)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(tp)
        updates, new_opt = optimizer.update(grads, opt_state, tp)
        return (optax.apply_updates(tp, updates), new_opt), loss

    @jax.jit
    def run10(tp, frozen_flat, opt_state, key):
        keys = jax.random.split(key, 10)
        (tp, opt_state), losses = jax.lax.scan(
            lambda c, k: one_step(frozen_flat, c, k), (tp, opt_state), keys)
        return tp, opt_state, losses[-1]

    key = jax.random.PRNGKey(42)
    tp2, opt2, loss = run10(tp, frozen_flat, opt_state, key)  # compile+warm
    _ = float(loss)
    with jax.profiler.trace(trace_dir):
        _, _, loss = run10(tp, frozen_flat, opt_state, key)
        _ = float(loss)


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_vit"
    capture(trace_dir)
    from profile_step import summarize
    summarize(trace_dir)
