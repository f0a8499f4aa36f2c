"""Re-run the fidelity gates at a TRAINED operating point (VERDICT r4
task 3).

Round 4's gates (GELU forms, int8 trunk/ViT, DCT-scaled decode) all used
random-init backbones — necessary but not sufficient: trained weights
concentrate variance in directions random init does not probe. This
script trains a real checkpoint through the full stack (the
tests/test_end_to_end_learning.py path at flagship shapes: CVCL
contrastive, finetune_cnn=True so the BACKBONE moves, textured
category stimuli at 224px), then re-measures every gate on the trained
weights:

  --arch vit      GELU envelope (tanh / sigmoid / fused-MLP rational
                  erf) + int8 ViT Denses: embedding cosine, rel-L2,
                  4-way forced-choice agreement vs the erf/XLA control
  --arch resnext  int8 trunk (committed (0,0,1,1) plan and full int8)
                  vs the bf16 path, same metrics; plus the DCT-scaled
                  decode gate: native decode fast vs exact on JPEGs of
                  the training frames, u8 LSB delta + embedding
                  cosine + forced-choice through the trained trunk

Results print as one JSON per gate; TEXTGEN_FIDELITY-style tables go in
BENCH_NOTES. Checkpoints save/load as flat npz (--save/--load) so gates
can re-run without retraining.

TPU:  PYTHONPATH=. python scripts/fidelity_trained.py --arch vit
CPU smoke:  MMB_FID_SMOKE=1 JAX_PLATFORMS=cpu python scripts/fidelity_trained.py --arch resnext --steps 4
"""
import argparse
import json
import os
import tempfile

import numpy as np

import jax

if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax
from flax import traverse_util

from multimodal_baby_tpu.core.config import (
    ExperimentConfig, ModelConfig, ParallelConfig, TextConfig, TrainConfig,
    VisionConfig)
from multimodal_baby_tpu.core.constants import (
    EOS_TOKEN_ID, MAX_LEN_UTTERANCE, PAD_TOKEN_ID, SOS_TOKEN_ID)
from multimodal_baby_tpu.data.augment import augment_batch
from multimodal_baby_tpu.models import CVCL
from multimodal_baby_tpu.models.losses import contrastive_loss_from_logits

SMOKE = os.environ.get("MMB_FID_SMOKE", "0") == "1"
IMG = 56 if SMOKE else 224
N_CAT = 4 if SMOKE else 32
VIEWS = 2 if SMOKE else 4          # pool views per category
BATCH = 8 if SMOKE else 64
VOCAB = 4 + 32
SEED = 7


def make_pool():
    """[N_CAT*VIEWS, IMG, IMG, 3] u8 textured category stimuli (the
    parity-matrix recipe: NEAREST-upsampled per-category noise, rolled
    views) + aligned text ids/lens ("<sos> w<cls> <eos>")."""
    from PIL import Image
    imgs, cls = [], []
    for ci in range(N_CAT):
        crng = np.random.RandomState(1000 + ci)
        base = crng.randint(0, 256, (28, 28, 3), np.uint8)
        up = np.asarray(Image.fromarray(base).resize((IMG, IMG),
                                                     Image.NEAREST))
        for v in range(VIEWS):
            imgs.append(np.roll(up, v * 8, axis=1))
            cls.append(ci)
    imgs = np.stack(imgs)
    cls = np.asarray(cls, np.int32)
    text = np.full((len(cls), MAX_LEN_UTTERANCE), PAD_TOKEN_ID, np.int32)
    text[:, 0] = SOS_TOKEN_ID
    text[:, 1] = 4 + cls
    text[:, 2] = EOS_TOKEN_ID
    lens = np.full((len(cls),), 3, np.int32)
    return imgs, text, lens, cls


def build_cfg(arch, finetune):
    if arch == "vit":
        vis = VisionConfig(vit_dino=True, finetune_cnn=finetune)
        if SMOKE:
            vis = VisionConfig(vit_dino=True, finetune_cnn=finetune)
    else:
        vis = VisionConfig(cnn_dino=True, finetune_cnn=finetune,
                           frozen_bn="running")
    return ExperimentConfig(
        model=ModelConfig(embedding_dim=512, vocab_size=VOCAB,
                          embedding_type="flat", normalize_features=True,
                          fix_temperature=True, temperature=0.07,
                          vision=vis, text=TextConfig()),
        train=TrainConfig(optimizer="AdamW", lr=1e-4, weight_decay=0.01),
        parallel=ParallelConfig())


def train(arch, steps):
    imgs, text, lens, cls = make_pool()
    cfg = build_cfg(arch, finetune=True)
    model = CVCL(cfg.model, dtype=jnp.bfloat16)

    pool_u8 = jnp.asarray(imgs)              # one H2D upload
    pool_txt = jnp.asarray(text)
    pool_len = jnp.asarray(lens)

    init_img = augment_batch(jax.random.PRNGKey(0), pool_u8[:BATCH],
                             augment=False)
    variables = model.init(jax.random.PRNGKey(SEED), init_img,
                           pool_txt[:BATCH], pool_len[:BATCH])
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    opt = optax.adamw(cfg.train.lr, weight_decay=cfg.train.weight_decay)
    opt_state = opt.init(params)

    def one_step(carry, key):
        params, bstats, opt_state = carry
        ki, ka = jax.random.split(key)
        idx = jax.random.randint(ki, (BATCH,), 0, pool_u8.shape[0])
        x = augment_batch(ka, pool_u8[idx], augment=True,
                          dtype=jnp.bfloat16)

        def loss_fn(p):
            (lpi, lpt), upd = model.apply(
                {"params": p, "batch_stats": bstats}, x, pool_txt[idx],
                pool_len[idx], train=True, mutable=["batch_stats"])
            loss, _ = contrastive_loss_from_logits(lpi, lpt)
            return loss, upd.get("batch_stats", {})

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_bs,
                opt_state), loss

    K = 2 if SMOKE else 10

    @jax.jit
    def run_k(params, bstats, opt_state, key):
        keys = jax.random.split(key, K)
        (params, bstats, opt_state), losses = jax.lax.scan(
            one_step, (params, bstats, opt_state), keys)
        return params, bstats, opt_state, losses

    key = jax.random.PRNGKey(42)
    first = last = None
    for i in range(max(1, steps // K)):
        key, k = jax.random.split(key)
        params, bstats, opt_state, losses = run_k(params, bstats,
                                                  opt_state, k)
        if first is None:
            first = float(losses[0])
        last = float(losses[-1])
    print(json.dumps({"gate": "training", "arch": arch,
                      "steps": max(1, steps // K) * K,
                      "loss_first": round(first, 4),
                      "loss_last": round(last, 4)}), flush=True)
    return params, bstats, (imgs, text, lens, cls)


def save_ckpt(path, params, bstats):
    flat = {"p/" + "/".join(k): np.asarray(v) for k, v in
            traverse_util.flatten_dict(params).items()}
    flat.update({"s/" + "/".join(k): np.asarray(v) for k, v in
                 traverse_util.flatten_dict(bstats).items()})
    np.savez(path, **flat)


def load_ckpt(path):
    z = np.load(path)
    p = {tuple(k[2:].split("/")): jnp.asarray(z[k])
         for k in z.files if k.startswith("p/")}
    s = {tuple(k[2:].split("/")): jnp.asarray(z[k])
         for k in z.files if k.startswith("s/")}
    return (traverse_util.unflatten_dict(p),
            traverse_util.unflatten_dict(s))


def _unit(e):
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def embed(arch, params, bstats, imgs_u8, env=None, int8_plan=None):
    """Embed u8 images through the trained CVCL at eval semantics under
    the given env knobs / trunk int8 plan; returns [N, E] f32."""
    env = env or {}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        cfg = build_cfg(arch, finetune=False)
        if int8_plan is not None:
            cfg.model.vision.trunk_int8 = int8_plan
        model = CVCL(cfg.model, dtype=jnp.bfloat16)
        x = augment_batch(jax.random.PRNGKey(0), jnp.asarray(imgs_u8),
                          augment=False, dtype=jnp.bfloat16)
        cols = {"params": params}
        if bstats:
            cols["batch_stats"] = bstats
        if int8_plan is not None:
            from multimodal_baby_tpu.models.quant_calib import calibrate_cvcl
            # init batch must satisfy the fused-trunk layout gate
            # (b_local % 32 == 0 for int8) or the fallback path runs and
            # never creates the quant_scales collection
            nb = min(32, x.shape[0])
            init_v = model.init(jax.random.PRNGKey(0), x[:nb],
                                jnp.zeros((nb, MAX_LEN_UTTERANCE), jnp.int32),
                                jnp.full((nb,), 3, jnp.int32))
            if "quant_scales" in init_v:
                cal = calibrate_cvcl({**cols,
                                      "quant_scales": init_v["quant_scales"]},
                                     x[:min(32, x.shape[0])])
                cols["quant_scales"] = cal["quant_scales"]
        fn = jax.jit(lambda p, xb: model.apply(
            p, xb, method=CVCL.encode_image)[0])
        return np.asarray(fn(cols, x)).astype(np.float32)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def forced_choice_picks(emb, cls, n_trials=256, seed=SEED):
    """4-way forced choice: query = view-0 embedding of the target
    category, candidates = view-1 embeddings of target + 3 foils."""
    u = _unit(emb)
    view0 = u[0::VIEWS]
    view1 = u[1::VIEWS]
    rng = np.random.RandomState(seed)
    picks = []
    for t in range(n_trials):
        tgt = t % N_CAT
        foils = rng.choice([c for c in range(N_CAT) if c != tgt],
                           min(3, N_CAT - 1), replace=False)
        cands = np.stack([view1[tgt]] + [view1[f] for f in foils])
        picks.append(int(np.argmax(cands @ view0[tgt])))
    return np.asarray(picks)


def report_gate(name, emb, base_emb, cls, extra=None):
    cos = np.sum(_unit(emb) * _unit(base_emb), axis=-1)
    agree = float(np.mean(forced_choice_picks(emb, cls)
                          == forced_choice_picks(base_emb, cls)))
    out = {"gate": name,
           "cos_mean": round(float(cos.mean()), 6),
           "cos_min": round(float(cos.min()), 6),
           "rel_l2": round(float(np.linalg.norm(emb - base_emb)
                                 / np.linalg.norm(base_emb)), 6),
           "forced_choice_agreement": round(agree, 4)}
    out.update(extra or {})
    print(json.dumps(out), flush=True)
    return out


def gates_vit(params, bstats, pool):
    imgs, _, _, cls = pool
    # base = the exact path (XLA softmax attention, XLA erf MLP); the
    # round-5 committed default (block attention + fused MLP w/ rational
    # erfc GELU) is itself a gated row against it
    exact = {"MMB_FUSED_ATTN": "0", "MMB_VIT_MLP": ""}
    print("# base embed (exact XLA path)...", flush=True)
    base = embed("vit", params, bstats, imgs, env=exact)
    for name, env in (
            ("vit_committed_default@trained", {}),
            ("vit_wholeblock_kernel@trained", {"MMB_VIT_BLOCK": "1"}),
            ("vit_attn_qkv@trained",
             {"MMB_FUSED_ATTN": "qkv", "MMB_VIT_MLP": ""}),
            ("vit_attn_block@trained",
             {"MMB_FUSED_ATTN": "block", "MMB_VIT_MLP": ""}),
            ("vit_gelu_tanh@trained", {"MMB_VIT_GELU": "tanh"}),
            ("vit_gelu_sigmoid@trained", {"MMB_VIT_GELU": "sigmoid"}),
            ("vit_int8@trained", {"MMB_VIT_INT8": "1"}),
    ):
        print(f"# {name} embed...", flush=True)
        emb = embed("vit", params, bstats, imgs, env=env)
        report_gate(name, emb, base, cls)


def gates_resnext(params, bstats, pool):
    imgs, _, _, cls = pool
    print("# base embed (compiles on first run; tunnel-side compiles "
          "run minutes with no output)", flush=True)
    base = embed("resnext", params, bstats, imgs)
    for name, plan in (
            ("trunk_int8_committed(0,0,1,1)@trained",
             (False, False, True, True)),
            ("trunk_int8_full@trained", (True, True, True, True)),
    ):
        print(f"# {name} embed...", flush=True)
        emb = embed("resnext", params, bstats, imgs, int8_plan=plan)
        report_gate(name, emb, base, cls)

    # DCT-scaled decode gate on the training frames
    from PIL import Image
    from multimodal_baby_tpu.data import native
    if native._load() is None:
        print(json.dumps({"gate": "dct_decode@trained",
                          "skipped": "native pipeline unavailable"}))
        return
    with tempfile.TemporaryDirectory() as td:
        exact, fast = [], []
        for i in range(imgs.shape[0]):
            p = os.path.join(td, f"f{i}.jpg")
            Image.fromarray(imgs[i]).save(p, quality=90)
            exact.append(native.decode_image(p, IMG, fast=False))
            fast.append(native.decode_image(p, IMG, fast=True))
        exact = np.stack(exact)
        fast = np.stack(fast)
    lsb = np.abs(exact.astype(np.int16) - fast.astype(np.int16))
    e_exact = embed("resnext", params, bstats, exact)
    e_fast = embed("resnext", params, bstats, fast)
    report_gate("dct_decode@trained", e_fast, e_exact, cls,
                extra={"u8_lsb_mean": round(float(lsb.mean()), 4),
                       "u8_lsb_max": int(lsb.max())})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", choices=("vit", "resnext"), required=True)
    ap.add_argument("--steps", type=int, default=4 if SMOKE else 300)
    ap.add_argument("--save", default=None)
    ap.add_argument("--load", default=None)
    args = ap.parse_args()

    if args.load:
        params, bstats = load_ckpt(args.load)
        pool = make_pool()
    else:
        params, bstats, pool = train(args.arch, args.steps)
        if args.save:
            save_ckpt(args.save, params, bstats)

    if args.arch == "vit":
        gates_vit(params, bstats, pool)
    else:
        gates_resnext(params, bstats, pool)


if __name__ == "__main__":
    main()
