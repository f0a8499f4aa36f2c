"""Perf probe: batch-size sweep of the full train step + trunk stage breakdown."""
import time, sys
import numpy as np, jax, jax.numpy as jnp, optax

from multimodal_baby_tpu.core.config import (
    ExperimentConfig, ModelConfig, ParallelConfig, TextConfig, TrainConfig,
    VisionConfig)
from multimodal_baby_tpu.data.augment import augment_batch
from multimodal_baby_tpu.models import CVCL
from multimodal_baby_tpu.models.losses import contrastive_loss_from_logits
from multimodal_baby_tpu.train import build_optimizer

VOCAB = 2350

def make_batch(rng, b):
    images = rng.randint(0, 256, (b, 224, 224, 3), np.uint8)
    text = np.zeros((b, 25), np.int32)
    lens = rng.randint(1, 23, b)
    text[:, 0] = 2
    for i, n in enumerate(lens):
        text[i, 1:1+n] = rng.randint(4, VOCAB, n)
        text[i, 1+n] = 3
    return {"image_u8": jnp.asarray(images), "text": jnp.asarray(text),
            "text_len": jnp.asarray((lens+2).astype(np.int32))}

def time_fn(fn, *args, iters=3, inner=10):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / (iters * inner)

def full_step_time(B):
    cfg = ExperimentConfig(
        model=ModelConfig(embedding_dim=512, vocab_size=VOCAB,
                          embedding_type="flat", normalize_features=True,
                          fix_temperature=True, temperature=0.07,
                          vision=VisionConfig(cnn_dino=True, frozen_bn="running"),
                          text=TextConfig(text_encoder="embedding")),
        train=TrainConfig(optimizer="AdamW", lr=1e-4, weight_decay=0.1),
        parallel=ParallelConfig())
    model = CVCL(cfg.model, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    batch = make_batch(rng, B)
    init_img = augment_batch(jax.random.PRNGKey(0), batch["image_u8"], augment=False)
    variables = model.init(jax.random.PRNGKey(0), init_img, batch["text"], batch["text_len"])
    params = variables["params"]; bs = variables.get("batch_stats", {})
    optimizer = build_optimizer(cfg, params)
    opt_state = optimizer.init(params)

    def one_step(carry, key):
        params, bs, opt_state = carry
        imgs = augment_batch(key, batch["image_u8"], augment=True)
        def loss_fn(p):
            (lpi, lpt), upd = model.apply(
                {"params": p, "batch_stats": bs}, imgs, batch["text"],
                batch["text_len"], train=True, mutable=["batch_stats"])
            loss, _ = contrastive_loss_from_logits(lpi, lpt)
            return loss, upd["batch_stats"]
        (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, nopt = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), nbs, nopt), loss

    @jax.jit
    def run(params, bs, opt_state, key):
        keys = jax.random.split(key, 10)
        (params, bs, opt_state), losses = jax.lax.scan(one_step, (params, bs, opt_state), keys)
        return losses[-1]

    dt = time_fn(run, params, bs, opt_state, jax.random.PRNGKey(1))
    print(f"B={B}: step {dt*1e3:.2f} ms -> {B/dt:.0f} pairs/s", flush=True)
    return B/dt

if __name__ == "__main__":
    for B in (512, 1024):
        try:
            full_step_time(B)
        except Exception as e:
            print(f"B={B}: {type(e).__name__}: {e}", flush=True)
