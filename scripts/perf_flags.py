"""Does raising the scoped-VMEM limit (bigger XLA fusions) help the step?"""
import json, time, sys
import numpy as np, jax, jax.numpy as jnp, optax
sys.path.insert(0, "/root/repo")
import bench as B

cfgs = {
    "default": None,
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
}

from multimodal_baby_tpu.core.config import (
    ExperimentConfig, ModelConfig, ParallelConfig, TextConfig, TrainConfig,
    VisionConfig)
from multimodal_baby_tpu.data.augment import augment_batch
from multimodal_baby_tpu.models import CVCL
from multimodal_baby_tpu.models.losses import contrastive_loss_from_logits
from multimodal_baby_tpu.train import build_optimizer

cfg = ExperimentConfig(
    model=ModelConfig(embedding_dim=512, vocab_size=2350,
                      embedding_type="flat", normalize_features=True,
                      fix_temperature=True, temperature=0.07,
                      vision=VisionConfig(cnn_dino=True, frozen_bn="running"),
                      text=TextConfig(text_encoder="embedding")),
    train=TrainConfig(optimizer="AdamW", lr=1e-4, weight_decay=0.1),
    parallel=ParallelConfig())
model = CVCL(cfg.model, dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
batch = B.make_batch(rng, 256)
init_img = augment_batch(jax.random.PRNGKey(0), batch["image_u8"], augment=False)
variables = model.init(jax.random.PRNGKey(0), init_img, batch["text"], batch["text_len"])
params = variables["params"]; bstats = variables.get("batch_stats", {})
optimizer = build_optimizer(cfg, params)
opt_state = optimizer.init(params)

def one_step(carry, key):
    params, bstats, opt_state = carry
    imgs = augment_batch(key, batch["image_u8"], augment=True, dtype=jnp.bfloat16)
    def loss_fn(p):
        (lpi, lpt), upd = model.apply({"params": p, "batch_stats": bstats},
                                      imgs, batch["text"], batch["text_len"],
                                      train=True, mutable=["batch_stats"])
        loss, _ = contrastive_loss_from_logits(lpi, lpt)
        return loss, upd["batch_stats"]
    (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, nopt = optimizer.update(grads, opt_state, params)
    return (optax.apply_updates(params, updates), nbs, nopt), loss

def run_k(params, bstats, opt_state, key):
    keys = jax.random.split(key, 10)
    (_, _, _), losses = jax.lax.scan(one_step, (params, bstats, opt_state), keys)
    return losses[-1]

for name, opts in cfgs.items():
    f = jax.jit(run_k, compiler_options=opts) if opts else jax.jit(run_k)
    try:
        out = f(params, bstats, opt_state, jax.random.PRNGKey(1)); _ = float(out)
        t0 = time.perf_counter()
        for i in range(3):
            out = f(params, bstats, opt_state, jax.random.PRNGKey(2 + i))
        _ = float(out)
        dt = (time.perf_counter() - t0) / 30
        print(f"{name}: {dt*1e3:.2f} ms/step -> {256/dt:.0f} pairs/s", flush=True)
    except Exception as e:
        print(f"{name}: {type(e).__name__} {str(e)[:200]}", flush=True)
