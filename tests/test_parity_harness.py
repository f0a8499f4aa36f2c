"""End-to-end accuracy-parity harness (cli.parity) on a real-image trial
fixture, with the reference eval.py scoring loop as the torch-side oracle.

The fixture is a dozen Labeled-S-style trials over PIL-drawn photographs
(distinct shapes/colors per category) written to disk in the reference's
eval-metadata schema. The "reference predictions" JSON is produced by
scoring the SAME converted checkpoint through the torch pipeline with the
reference's trial semantics (eval.py:196-232: softmax over logits_per_text
across the 4 images, pred==0 correct) — a true cross-implementation
oracle. cli.parity must then report PARITY OK with a 0.5% gate.
"""

import json

import numpy as np
import pytest
import torch
import torch.nn.functional as tF
from PIL import Image, ImageDraw

from tests.test_api import make_reference_ckpt

CATEGORIES = ["ball", "cat", "car", "chair", "cup", "book",
              "door", "hand", "window", "basket", "table", "bed"]


def _draw_category_image(cat: str, variant: int) -> Image.Image:
    """Deterministic 'photo' per category: unique shape+color."""
    i = CATEGORIES.index(cat)
    rng = np.random.RandomState(1000 * i + variant)
    bg = tuple(rng.randint(100, 200, 3).tolist())
    img = Image.new("RGB", (224, 224), bg)
    d = ImageDraw.Draw(img)
    color = tuple(int(c) for c in np.array([
        (i * 37) % 255, (i * 91) % 255, (i * 53) % 255]))
    x0, y0 = 40 + variant * 5, 40 + variant * 3
    if i % 3 == 0:
        d.ellipse([x0, y0, x0 + 120, y0 + 120], fill=color)
    elif i % 3 == 1:
        d.rectangle([x0, y0, x0 + 130, y0 + 100], fill=color)
    else:
        d.polygon([(x0, y0 + 110), (x0 + 60, y0), (x0 + 120, y0 + 110)],
                  fill=color)
    return img


def _make_trials(tmp_path, n_trials=12, seed=0):
    rng = np.random.RandomState(seed)
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    paths = {}
    for cat in CATEGORIES:
        for v in range(2):
            p = frames_dir / f"{cat}_{v}.png"
            _draw_category_image(cat, v).save(p)
            paths.setdefault(cat, []).append(str(p))

    trials = []
    for t in range(n_trials):
        target = CATEGORIES[t % len(CATEGORIES)]
        foils = list(rng.choice([c for c in CATEGORIES if c != target],
                                size=3, replace=False))
        trials.append({
            "trial_num": t,
            "target_category": target,
            "target_img_filename": paths[target][t % 2],
            "foil_categories": foils,
            "foil_img_filenames": [paths[c][(t + 1) % 2] for c in foils],
        })
    meta = tmp_path / "eval_filtered_test.json"
    meta.write_text(json.dumps({"data": trials}))
    return meta, trials


def _torch_reference_predictions(ckpt_parts, trials, vocab, out_path):
    """Score the trials with the torch pipeline using the reference
    eval.py loop semantics, writing the reference predictions JSON."""
    trunk, fc, embedding = ckpt_parts
    trunk.eval()
    rows = []
    for i, trial in enumerate(trials):
        files = [trial["target_img_filename"]] + \
            list(trial["foil_img_filenames"])
        imgs = np.stack([
            np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
            for f in files])
        # the eval path normalizes with ImageNet stats (our harness's
        # normalize_image); mirror it here
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        imgs = (imgs - mean) / std
        with torch.no_grad():
            pooled, _ = trunk(torch.tensor(imgs.transpose(0, 3, 1, 2)))
            img_feat = tF.normalize(fc(pooled), p=2, dim=1)        # [4, E]
            txt = embedding(torch.tensor(
                [[vocab[trial["target_category"]]]]))
            txt_feat = tF.normalize(txt.mean(dim=1), p=2, dim=-1)  # [1, E]
            logits_per_text = (txt_feat @ img_feat.T) / 0.07       # [1, 4]
            probs = torch.softmax(logits_per_text, dim=-1)[0]
            pred = int(torch.argmax(probs).item())
        rows.append({
            "checkpoint": "oracle", "eval_type": "image", "stage": "test",
            "trial_idx": i,
            "categories": [trial["target_category"]]
            + list(trial["foil_categories"]),
            "logits": probs.numpy().tolist(),
            "pred": pred,
            "correct": pred == 0,
        })
    out_path.write_text(json.dumps({"data": rows}))
    return rows


def test_parity_harness_end_to_end(tmp_path):
    from multimodal_baby_tpu.api.model import PACKAGED_VOCAB
    from multimodal_baby_tpu.cli.parity import (
        accuracy_from_predictions, main)
    from multimodal_baby_tpu.data.vocab import Vocab

    ckpt_path, trunk, fc, embedding = make_reference_ckpt(
        tmp_path, vocab_size=2350, E=64)
    meta, trials = _make_trials(tmp_path)
    vocab = Vocab.load(PACKAGED_VOCAB)

    ref_preds = tmp_path / "ref_predictions.json"
    ref_rows = _torch_reference_predictions(
        (trunk, fc, embedding), trials, vocab, ref_preds)

    out = tmp_path / "ours.json"
    rc = main([
        "--checkpoint", str(ckpt_path),
        "--data_dir", str(tmp_path),
        "--eval_metadata", "eval_filtered_test.json",
        "--reference_predictions", str(ref_preds),
        "--gate", "0.005",
        "--output", str(out),
    ])
    assert rc == 0, "parity gate failed"

    # trial-level agreement, not just aggregate: same preds everywhere
    ours = json.loads(out.read_text())["data"]
    assert [r["pred"] for r in ours] == [r["pred"] for r in ref_rows]
    # and the probabilities match the torch oracle closely
    ours_p = np.array([r["logits"] for r in ours])
    ref_p = np.array([r["logits"] for r in ref_rows])
    np.testing.assert_allclose(ours_p, ref_p, atol=1e-3)

    # the gate actually gates: a corrupted reference file must fail
    bad = [dict(r, correct=not r["correct"]) for r in ref_rows]
    bad_path = tmp_path / "bad_ref.json"
    bad_path.write_text(json.dumps({"data": bad}))
    rc = main([
        "--checkpoint", str(ckpt_path),
        "--data_dir", str(tmp_path),
        "--eval_metadata", "eval_filtered_test.json",
        "--reference_predictions", str(bad_path),
        "--gate", "0.005",
        "--output", str(tmp_path / "ours2.json"),
    ])
    assert rc == 1


def test_accuracy_from_predictions_roundtrip(tmp_path):
    from multimodal_baby_tpu.cli.parity import (
        accuracy_from_predictions, compare)
    rows = [
        {"categories": ["ball", "x", "y", "z"], "correct": True},
        {"categories": ["ball", "x", "y", "z"], "correct": False},
        {"categories": ["cat", "x", "y", "z"], "correct": True},
    ]
    p = tmp_path / "p.json"
    p.write_text(json.dumps({"data": rows}))
    cats, total = accuracy_from_predictions(p)
    assert cats == {"ball": 0.5, "cat": 1.0}
    assert abs(total - 2 / 3) < 1e-9
    ok, report = compare(cats, total, cats, total, gate=0.005)
    assert ok and "PARITY OK" in report
