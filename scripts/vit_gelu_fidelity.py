"""Fidelity envelope of the cheap GELU forms (MMB_VIT_GELU=tanh|sigmoid).

The round-4 phase-9 A/B measured tanh/sigmoid GELU at +24% end-to-end on
the ViT flagship (2,497/2,512 vs 2,016.8 pairs/s at B=128) — the erf
epilogue runs the fc1 fusion at 2.3x its matmul floor (B=64 trace,
BENCH_NOTES). Before any default flip, this script prices what the
approximation costs the MODEL, the same way the int8 trunk was gated in
round 3: embed textured category images (the parity-matrix stimulus
design, tests/test_parity_matrix.py) through a full random-init ViT-B/14
in bf16 under each form and report

  - per-image embedding fidelity vs erf (cosine, rel-L2, max |delta|),
  - 4-way forced-choice agreement vs erf: query = view-0 CLS embedding,
    candidates = view-1 embeddings of target + 3 foils, argmax by cosine
    (the eval.py:196-213 decision rule with the text side held fixed).

Random weights + high-contrast textures are the same
necessary-not-sufficient evidence standard the parity matrix itself uses
(published weights need network). Run on CPU or TPU; B small enough for
the 1-core box. Reference activation: torch nn.GELU default (erf),
vision_transformer_dino_mugs.py:16-38.
"""
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.models.vision_vit import vit_base

N_CAT = 22          # matches the parity harness's category count
N_TRIALS = 256
SEED = 0


def _textured_images() -> np.ndarray:
    """[N_CAT * 2, 224, 224, 3] u8: per-category noise texture, 2 views
    (NEAREST upsample of a 28x28 base + a horizontal roll), exactly the
    parity-matrix stimulus recipe."""
    from PIL import Image

    imgs = []
    for ci in range(N_CAT):
        crng = np.random.RandomState(1000 + ci)
        base = crng.randint(0, 256, (28, 28, 3), np.uint8)
        up = np.asarray(Image.fromarray(base).resize((224, 224),
                                                     Image.NEAREST))
        for v in range(2):
            imgs.append(np.roll(up, v * 8, axis=1))
    return np.stack(imgs)


def _embed(mode: str, params, model, x: jnp.ndarray) -> np.ndarray:
    os.environ["MMB_VIT_GELU"] = mode
    # env is read at trace time: a fresh jit per mode, no cache reuse
    fn = jax.jit(lambda p, xb: model.apply({"params": p}, xb))
    return np.asarray(fn(params, x))


def main() -> None:
    model = vit_base(patch_size=14, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(SEED)
    imgs = _textured_images().astype(np.float32) / 255.0
    x = jnp.asarray((imgs - 0.5) / 0.25, jnp.bfloat16)
    params = model.init(rng, x[:1])["params"]

    emb = {m: _embed(m, params, model, x)
           for m in ("erf", "tanh", "sigmoid")}
    os.environ.pop("MMB_VIT_GELU", None)

    def _unit(e):
        return e / np.linalg.norm(e, axis=-1, keepdims=True)

    # forced-choice picks under each mode (erf included as its own
    # control: with B fixed the argmax is deterministic, so erf-vs-erf
    # agreement is 1.0 by construction and omitted)
    trng = np.random.RandomState(SEED)
    trials = []
    for t in range(N_TRIALS):
        tgt = t % N_CAT
        foils = trng.choice([c for c in range(N_CAT) if c != tgt], 3,
                            replace=False)
        trials.append((tgt, foils))

    picks = {}
    for m, e in emb.items():
        u = _unit(e)
        view0, view1 = u[0::2], u[1::2]       # [N_CAT, E] each
        sel = []
        for tgt, foils in trials:
            cands = np.stack([view1[tgt]] + [view1[f] for f in foils])
            sel.append(int(np.argmax(cands @ view0[tgt])))
        picks[m] = np.asarray(sel)

    report = {}
    base = emb["erf"]
    for m in ("tanh", "sigmoid"):
        d = emb[m] - base
        cos = np.sum(_unit(emb[m]) * _unit(base), axis=-1)
        report[m] = {
            "cos_mean": float(cos.mean()),
            "cos_min": float(cos.min()),
            "rel_l2": float(np.linalg.norm(d) / np.linalg.norm(base)),
            "max_abs": float(np.abs(d).max()),
            "emb_abs_scale": float(np.abs(base).mean()),
            "forced_choice_agreement": float(
                (picks[m] == picks["erf"]).mean()),
            "n_trials": N_TRIALS,
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
