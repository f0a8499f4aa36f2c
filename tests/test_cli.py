"""CLI entry points end to end: train fast_dev_run, eval with a converted
torch checkpoint (+ attention-map dump), runner expansion, registry."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from tests.test_api import make_reference_ckpt


def test_train_cli_fast_dev_run(tmp_path):
    from multimodal_baby_tpu.cli.train import main
    result = main([
        "--dataset", "synthetic", "--cnn_model", "toy",
        "--embedding_dim", "16", "--text_encoder", "embedding",
        "--batch_size", "8", "--fast_dev_run", "--normalize_features",
        "--checkpoint_dir", str(tmp_path), "--compute_dtype", "float32",
        "--exp_name", "smoke", "--num_workers", "1",
    ])
    assert "loss" in result
    assert (tmp_path / "smoke" / "last").exists()


def _make_trials(tmp_path, n=4):
    rng = np.random.RandomState(0)
    cats = ["ball", "cat", "dog", "car", "shoe"]
    trials = []
    for i in range(n):
        target = cats[i % len(cats)]
        files = []
        for j in range(4):
            p = tmp_path / f"t{i}_{j}.png"
            Image.fromarray(rng.randint(
                0, 255, (224, 224, 3), np.uint8)).save(p)
            files.append(str(p))
        foils = [c for c in cats if c != target][:3]
        trials.append({
            "target_category": target,
            "target_img_filename": files[0],
            "foil_categories": foils,
            "foil_img_filenames": files[1:],
        })
    (tmp_path / "eval_filtered_dev.json").write_text(
        json.dumps({"data": trials}))
    (tmp_path / "eval_filtered_test.json").write_text(
        json.dumps({"data": trials}))


def test_eval_cli_with_torch_checkpoint(tmp_path):
    from multimodal_baby_tpu.cli.eval import main
    ckpt, *_ = make_reference_ckpt(tmp_path)
    _make_trials(tmp_path)
    accs = main([
        "--checkpoint", str(ckpt), "--data_dir", str(tmp_path),
        "--eval_type", "image", "--stage", "dev",
        "--output_dir", str(tmp_path / "results"),
        "--batch_size", "2", "--dump_attention_maps", "1",
    ])
    assert 0.0 <= accs["total"] <= 1.0
    preds = list((tmp_path / "results").glob("*_predictions.json"))
    assert preds
    data = json.load(open(preds[0]))["data"]
    assert data[0]["checkpoint"] == "ref"
    maps = list((tmp_path / "results").glob("attention_maps_*/*.png"))
    assert len(maps) == 4  # 1 trial x 4 images


def test_runner_expansion_and_registry(tmp_path):
    from multimodal_baby_tpu.cli.runner import (
        expand_grids, job_command, job_name)
    grids = [{"text_encoder": ["embedding", "lstm"], "seed": [0, 1],
              "lr": [1e-4], "augment_frames": [True]}]
    jobs = expand_grids(grids)
    assert len(jobs) == 4
    cmd = job_command(jobs[0], "exp_a", [])
    assert "--augment_frames" in cmd and "--lr" in cmd
    assert job_name("b", jobs[0], ["text_encoder", "seed"]) == \
        "b_text_encoder_embedding_seed_0"

    # registry discovers trained checkpoints
    from multimodal_baby_tpu.analysis.checkpoints import CheckpointRegistry
    from tests.test_trainer import make_cfg
    from multimodal_baby_tpu.train.trainer import Trainer
    cfg = make_cfg(tmp_path, max_epochs=1)
    Trainer(cfg).fit()
    reg = CheckpointRegistry(tmp_path)
    entries = reg.scan()
    assert "t" in entries
    assert entries["t"]["text_encoder"] == "embedding"


def test_animate_utterance(tmp_path):
    from multimodal_baby_tpu.data.etl import animate_utterance
    rng = np.random.RandomState(0)
    names = []
    for i in range(3):
        p = tmp_path / f"f{i}.png"
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(p)
        names.append(f"f{i}.png")
    entry = {"utterance": "look at the ball", "frame_filenames": names}
    out = animate_utterance(entry, tmp_path / "anim.gif",
                            frames_dir=tmp_path)
    assert out is not None and out.exists()


def test_analyze_cli_summaries_and_descriptives(tmp_path):
    """cli.analyze end-to-end on fixtures (the runnable counterpart of
    the reference's analysis_cvcl scripts)."""
    import json

    from multimodal_baby_tpu.cli.analyze import main

    # summaries on a minimal predictions tree
    rows = [{"checkpoint": "c", "model": "embedding", "seed": 0,
             "shuffle_utterances": False, "augment_frames": True,
             "multiple_frames": True, "cnn": "frozen_pretrained",
             "eval_type": "image", "eval_dataset": "saycam",
             "stage": "test", "trial_idx": 0,
             "categories": ["ball", "dog", "cat", "cup"],
             "logits": [0.7, 0.1, 0.1, 0.1], "pred": 0, "correct": True}]
    p = (tmp_path / "saycam" /
         "embedding_frozen_pretrained_seed_0_image_saycam_test_eval_"
         "predictions.json")
    p.parent.mkdir(parents=True)
    p.write_text(json.dumps({"data": rows}))
    main(["summaries", "--results_dir", str(tmp_path)])
    assert (tmp_path / "summary/saycam-bounds-summary.csv").exists()

    # descriptives
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    (data_dir / "train.json").write_text(json.dumps({"data": [
        {"utterance": "a ball", "frame_filenames": ["S_20130601_0.jpg"]}]}))
    out_csv = tmp_path / "descriptives.csv"
    main(["descriptives", "--data_dir", str(data_dir),
          "--out_csv", str(out_csv)])
    assert out_csv.exists()
