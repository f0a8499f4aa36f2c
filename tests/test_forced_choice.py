"""Forced-choice eval harness: batched scoring == per-trial reference
semantics; accounting, kitty swap, predictions schema."""

import json

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.core.config import (
    ModelConfig, TextConfig, VisionConfig)
from multimodal_baby_tpu.data.augment import normalize_image
from multimodal_baby_tpu.data.datasets import (
    EvalTrialDataset, TextEvalTrialDataset)
from multimodal_baby_tpu.data.vocab import Vocab
from multimodal_baby_tpu.evaluation.forced_choice import (
    run_forced_choice, save_predictions)
from multimodal_baby_tpu.models import CVCL

CATS = ["ball", "cat", "kitty", "dog", "car"]


@pytest.fixture
def setup(tmp_path):
    rng = np.random.RandomState(0)
    vocab = Vocab({w: i for i, w in enumerate(
        ["<pad>", "<unk>", "<sos>", "<eos>"] + CATS)})

    def save_img(name):
        arr = rng.randint(0, 255, (32, 32, 3), np.uint8)
        p = tmp_path / f"{name}.png"
        Image.fromarray(arr).save(p)
        return str(p)

    trials = []
    for i in range(6):
        target = CATS[i % len(CATS)]
        foils = [c for c in CATS if c != target][:3]
        trials.append({
            "target_img_filename": save_img(f"t{i}"),
            "foil_img_filenames": [save_img(f"f{i}_{j}") for j in range(3)],
            "target_category": target,
            "foil_categories": foils,
        })

    cfg = ModelConfig(
        embedding_dim=16, vocab_size=len(vocab), embedding_type="flat",
        normalize_features=True,
        vision=VisionConfig(cnn_model="toy"),
        text=TextConfig(text_encoder="embedding"))
    model = CVCL(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 5), jnp.int32), jnp.ones((1,), jnp.int32))
    return model, variables, vocab, trials


def test_image_mode_matches_per_trial_forward(setup):
    model, variables, vocab, trials = setup
    ds = EvalTrialDataset(trials, vocab)
    accs, records = run_forced_choice(model, variables, ds, "image",
                                      batch_size=4)
    assert len(records) == len(trials)
    assert 0.0 <= accs["total"] <= 1.0
    assert sum(1 for r in records if r["correct"]) == round(
        accs["total"] * len(trials))

    # per-trial reference computation (multimodal_lit.py:472-499)
    for i in (0, 3):
        imgs, label, label_len, _ = ds[i]
        _, lpt = model.apply(
            variables, normalize_image(jnp.asarray(imgs)),
            jnp.asarray(label)[None], jnp.asarray([label_len]))
        expected_pred = int(np.argmax(np.asarray(lpt)[0]))
        assert records[i]["pred"] == expected_pred
        assert records[i]["categories"][0] == trials[i]["target_category"]


def test_text_mode_runs(setup):
    model, variables, vocab, trials = setup
    ds = TextEvalTrialDataset(trials, vocab)
    accs, records = run_forced_choice(model, variables, ds, "text",
                                      batch_size=3)
    assert len(records) == len(trials)
    assert all(len(r["logits"]) == 4 for r in records)


def test_kitty_swap(setup):
    model, variables, vocab, trials = setup
    ds = EvalTrialDataset(trials, vocab)
    accs, records = run_forced_choice(
        model, variables, ds, "image", use_kitty_label=True, vocab=vocab)
    assert "kitty" in accs and "cat" not in accs


def test_predictions_schema(setup, tmp_path):
    model, variables, vocab, trials = setup
    ds = EvalTrialDataset(trials, vocab)
    _, records = run_forced_choice(model, variables, ds, "image")
    out = tmp_path / "preds.json"
    save_predictions(records, out, {"checkpoint": "x", "seed": 0,
                                    "stage": "dev"})
    data = json.load(open(out))["data"]
    for key in ("checkpoint", "seed", "trial_idx", "categories", "logits",
                "pred", "correct"):
        assert key in data[0], key
    np.testing.assert_allclose(sum(data[0]["logits"]), 1.0, atol=1e-6)


def test_multi_foil_trials(setup, tmp_path):
    """n_foils variants (9 foils -> 10-way trials) work unchanged
    (reference 'extra' eval metadata, SURVEY.md 2.1)."""
    import numpy as np
    from PIL import Image
    model, variables, vocab, _ = setup
    rng = np.random.RandomState(7)

    def save(name):
        p = tmp_path / f"{name}.png"
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(p)
        return str(p)

    trials = []
    for i in range(3):
        target = CATS[i % len(CATS)]
        foils = [c for c in CATS if c != target] * 3
        foils = foils[:9]
        trials.append({
            "target_img_filename": save(f"m{i}"),
            "foil_img_filenames": [save(f"m{i}_{j}") for j in range(9)],
            "target_category": target,
            "foil_categories": foils,
        })
    ds = EvalTrialDataset(trials, vocab)
    accs, records = run_forced_choice(model, variables, ds, "image",
                                      batch_size=2)
    assert len(records) == 3
    assert all(len(r["logits"]) == 10 for r in records)
