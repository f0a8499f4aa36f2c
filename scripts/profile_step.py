"""Capture + summarize a device trace of the flagship train step.

Produces the per-HLO-category time/bytes table (and top ops) that guided
the round-2 perf campaign. Usage:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_step.py \
        [trace_dir]
"""
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax


def capture(trace_dir: str) -> None:
    from multimodal_baby_tpu.core.config import (
        ExperimentConfig, ModelConfig, ParallelConfig, TextConfig,
        TrainConfig, VisionConfig)
    from multimodal_baby_tpu.data.augment import augment_batch
    from multimodal_baby_tpu.models import CVCL
    from multimodal_baby_tpu.models.losses import (
        contrastive_loss_from_logits)
    from multimodal_baby_tpu.train import build_optimizer

    # B=256 keeps traces comparable with the round-2/3 accounting;
    # MMB_PROFILE_BATCH=1024 traces the committed bench operating point.
    B = int(os.environ.get("MMB_PROFILE_BATCH", "256"))
    VOCAB = 2350
    cfg = ExperimentConfig(
        model=ModelConfig(embedding_dim=512, vocab_size=VOCAB,
                          embedding_type="flat", normalize_features=True,
                          fix_temperature=True, temperature=0.07,
                          vision=VisionConfig(cnn_dino=True,
                                              frozen_bn="running"),
                          text=TextConfig(text_encoder="embedding")),
        train=TrainConfig(optimizer="AdamW", lr=1e-4, weight_decay=0.1),
        parallel=ParallelConfig())
    model = CVCL(cfg.model, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (B, 224, 224, 3), np.uint8)
    text = np.zeros((B, 25), np.int32)
    text[:, 0] = 2
    text[:, 1] = 5
    text[:, 2] = 3
    batch = {"image_u8": jnp.asarray(images), "text": jnp.asarray(text),
             "text_len": jnp.full((B,), 3, jnp.int32)}
    init_img = augment_batch(jax.random.PRNGKey(0), batch["image_u8"],
                             augment=False)
    variables = model.init(jax.random.PRNGKey(0), init_img,
                           batch["text"], batch["text_len"])
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    optimizer = build_optimizer(cfg, params)
    opt_state = optimizer.init(params)

    def one(carry, key):
        params, bstats, opt_state = carry
        imgs = augment_batch(key, batch["image_u8"], augment=True,
                             dtype=jnp.bfloat16)

        def loss_fn(p):
            (lpi, lpt), upd = model.apply(
                {"params": p, "batch_stats": bstats}, imgs,
                batch["text"], batch["text_len"], train=True,
                mutable=["batch_stats"])
            loss, _ = contrastive_loss_from_logits(lpi, lpt)
            return loss, upd["batch_stats"]

        (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, nopt = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), nbs, nopt), loss

    @jax.jit
    def run(params, bstats, opt_state, key):
        keys = jax.random.split(key, 10)
        _, losses = jax.lax.scan(one, (params, bstats, opt_state), keys)
        return losses[-1]

    out = run(params, bstats, opt_state, jax.random.PRNGKey(1))
    _ = float(out)  # compile + settle
    with jax.profiler.trace(trace_dir):
        out = run(params, bstats, opt_state, jax.random.PRNGKey(2))
        _ = float(out)


def summarize(trace_dir: str, steps: int = 10, top: int = 20) -> None:
    paths = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/") , reverse=True)
    trace = glob.glob(paths[0] + "*.trace.json.gz")[0]
    with gzip.open(trace) as f:
        data = json.load(f)
    dev_pid = None
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name" \
                and "TPU" in str(e.get("args", {}).get("name")):
            dev_pid = e["pid"]
    events = [e for e in data["traceEvents"]
              if e.get("ph") == "X" and e.get("pid") == dev_pid
              and e.get("tid") == 3]  # "XLA Ops" lane

    bycat = collections.Counter()
    bytes_cat = collections.Counter()
    byname = collections.Counter()
    meta = {}
    for e in events:
        a = e.get("args", {})
        cat = a.get("hlo_category", "?")
        if cat == "while":
            continue  # container op double-counts its body
        bycat[cat] += e["dur"]
        bytes_cat[cat] += int(a.get("bytes_accessed", 0) or 0)
        byname[e["name"]] += e["dur"]
        meta[e["name"]] = a.get("long_name", "")[:110]

    scale = 1e3 * steps  # us -> ms, per step
    print(f"{'ms/step':>8s}  {'GB/step':>8s}  {'eff GB/s':>8s}  category")
    for c, d in bycat.most_common():
        bw = bytes_cat[c] / (d / 1e6) / 1e9 if d else 0
        print(f"{d/scale:8.2f}  {bytes_cat[c]/steps/1e9:8.2f}  "
              f"{bw:8.0f}  {c}")
    print(f"\ntop {top} ops:")
    for n, d in byname.most_common(top):
        print(f"{d/scale:8.2f} ms/step  {n:28s} {meta[n]}")


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_trace"
    capture(trace_dir)
    summarize(trace_dir)
