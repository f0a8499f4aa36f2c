"""Zero-shot forced-choice evaluation (Labeled-S / object-categories).

Capability parity with the reference harness (eval.py:160-305 and the
in-training path multimodal_lit.py:466-513), rebuilt TPU-first: instead of a
Python loop over single trials, ALL trials are stacked and scored by ONE
vmapped, jitted forward — images [N, K, H, W, 3] against labels [N, L] —
so the whole eval is a handful of device launches regardless of trial count.

Outputs the reference's predictions-JSON schema (eval.py:248-266) so the
analysis layer (analysis_cvcl/clean.py) consumes results unchanged.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.core.constants import SOS_TOKEN_ID
from multimodal_baby_tpu.data.augment import normalize_image
from multimodal_baby_tpu.data.vocab import Vocab


def _score_trials_fn(model, variables, eval_type: str):
    """Builds a jitted chunk scorer.

    image mode:  images [n, K, H, W, 3] f32 (normalized), one label per
                 trial -> logits [n, K] = logits_per_text row
                 (multimodal_lit.py:474-476)
    text mode:   one image per trial, labels [n, K, L] -> logits [n, K] =
                 logits_per_image row.
    """

    if eval_type == "image":
        def score_one(images, label, label_len):
            # images [K, H, W, 3]; label [1, L]
            _, logits_per_text = model.apply(
                variables, images, label, label_len)
            return logits_per_text[0]
    else:
        def score_one(image, labels, labels_len):
            # image [1, H, W, 3]; labels [K, L]
            logits_per_image, _ = model.apply(
                variables, image, labels, labels_len)
            return logits_per_image[0]

    return jax.jit(jax.vmap(score_one))


def run_forced_choice(
    model,
    variables,
    dataset,
    eval_type: str = "image",
    batch_size: int = 64,
    use_kitty_label: bool = False,
    vocab: Optional[Vocab] = None,
) -> Tuple[Dict[str, float], List[dict]]:
    """Returns (per-class + total accuracies, trial records).

    ``use_kitty_label`` swaps the 'cat' label for 'kitty' at eval time
    (reference: eval.py:163-194).
    """
    n = len(dataset)
    score_fn = _score_trials_fn(model, variables, eval_type)

    correct_pred: Dict[str, int] = {}
    total_pred: Dict[str, int] = {}
    records: List[dict] = []

    for start in range(0, n, batch_size):
        idxs = range(start, min(start + batch_size, n))
        items = [dataset[i] for i in idxs]
        cats = [it[3] for it in items]

        if eval_type == "image":
            imgs = normalize_image(jnp.asarray(
                np.stack([it[0] for it in items])))          # [n, K, H, W, 3]
            labels = np.stack([it[1] for it in items])[:, None, :]  # [n,1,L]
            lens = np.asarray([it[2] for it in items])[:, None]
            # score at the true label length, not the padded window: the
            # reference eval feeds exact-length labels (LabeledSEvalDataset
            # returns len 1 or 3, multimodal_data_module.py:145-150), and
            # the transformer encoder is NOT padding-invariant (padded
            # query positions contribute to its mean-pool,
            # multimodal.py:571-573) — scoring padded-to-25 labels would
            # silently change transformer-model results
            labels = labels[..., :max(1, int(lens.max()))]
            if use_kitty_label and vocab is not None:
                labels = labels.copy()
                for j, c in enumerate(cats):
                    if c == "cat":
                        pos = 1 if labels[j, 0, 0] == SOS_TOKEN_ID else 0
                        labels[j, 0, pos] = vocab["kitty"]
            logits = score_fn(imgs, jnp.asarray(labels), jnp.asarray(lens))
        else:
            imgs = normalize_image(jnp.asarray(
                np.stack([it[0] for it in items])))[:, None]  # [n,1,H,W,3]
            labels = np.stack([it[1] for it in items])        # [n, K, L]
            lens = np.stack([it[2] for it in items])          # [n, K]
            labels = labels[..., :max(1, int(lens.max()))]  # see image mode
            if use_kitty_label and vocab is not None:
                labels = labels.copy()
                for j, c in enumerate(cats):
                    if c == "cat":
                        labels[j, 0, 0] = vocab["kitty"]
            logits = score_fn(imgs, jnp.asarray(labels), jnp.asarray(lens))

        logits = np.asarray(logits, np.float64)
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        preds = logits.argmax(-1)

        for j, (i, cat) in enumerate(zip(idxs, cats)):
            label_name = "kitty" if (use_kitty_label and cat == "cat") \
                else cat
            correct = bool(preds[j] == 0)  # target is always index 0
            correct_pred[label_name] = correct_pred.get(label_name, 0) \
                + int(correct)
            total_pred[label_name] = total_pred.get(label_name, 0) + 1
            trial = getattr(dataset, "data", [None] * (i + 1))[i]
            categories = ([trial["target_category"]]
                          + list(trial.get("foil_categories", []))
                          if isinstance(trial, dict) else [cat])
            records.append({
                "trial_idx": i,
                "categories": categories,
                "logits": probs[j].tolist(),
                "pred": int(preds[j]),
                "correct": correct,
                "eval_type": eval_type,
            })

    accuracies = {
        c: correct_pred[c] / total_pred[c] for c in sorted(total_pred)}
    accuracies["total"] = (
        sum(correct_pred.values()) / max(1, sum(total_pred.values())))
    return accuracies, records


def save_predictions(records: List[dict], path, extra_fields: dict = None):
    """Write the predictions JSON with run provenance merged into every
    record (schema of eval.py:248-266)."""
    extra_fields = extra_fields or {}
    out = [dict(extra_fields, **r) for r in records]
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump({"data": out}, f)


def print_accuracy_table(accuracies: Dict[str, float]) -> None:
    for name, acc in accuracies.items():
        if name != "total":
            print(f"Accuracy for class {name:12s}: {acc:.1%}")
    print(f"Total accuracy: {accuracies['total']:.1%}")
