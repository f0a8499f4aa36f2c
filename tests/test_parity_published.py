"""Offline exercise of the published-weights parity bundle (VERDICT r4
task 6): ``cli.parity --published`` had never executed because the HF
download needs network. Here the download is shimmed to a locally-built
reference-format Lightning checkpoint of the exact published variant
(cvcl_s_dino_resnext50_embedding: embedding text encoder + ResNeXt-50,
flat/max — multimodal_lit.py:133-149), so the full bundle path runs end
to end: download-shim -> api.convert -> forced-choice trials ->
predictions JSON -> summary-CSV diff (the analysis_cvcl/clean.py schema
that scripts/parity_published.sh passes), with the torch reference
modules as the oracle on the CSV side.
"""

import csv
import json

import numpy as np

from tests.test_parity_harness import _make_trials
from tests.test_parity_matrix import (
    VARIANTS, _build_variant, _torch_predictions)

# the published checkpoint's recipe: embedding text encoder, ResNeXt-50
# vision, flat embeddings (runner_config/saycam_contrastive.py via
# multimodal_lit.py:137). Registered at test run time (after collection)
# so test_parity_matrix's parametrization is untouched.
_FLAGSHIP = ("embedding", "flat", "max", False, {})


def _oracle_summary_csv(oracle, trials, vocab, tmp_path):
    """Reference-side accuracy as an analysis_cvcl/clean.py-schema
    summary CSV (one row per trial: target_category/correct/seed/stage)
    — the format scripts/parity_published.sh feeds --reference_summary."""
    ref_json = tmp_path / "oracle_predictions.json"
    rows = _torch_predictions(oracle, trials, vocab, ref_json)
    path = tmp_path / "reference-summary.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["seed", "stage", "target_category", "correct"])
        w.writeheader()
        for r in rows:
            w.writerow({"seed": "0", "stage": "test",
                        "target_category": r["categories"][0],
                        "correct": str(bool(r["correct"]))})
    return path, rows


def test_published_bundle_offline(tmp_path, monkeypatch):
    from multimodal_baby_tpu.api.model import PACKAGED_VOCAB
    from multimodal_baby_tpu.cli.parity import main
    from multimodal_baby_tpu.data.vocab import Vocab

    vocab = Vocab.load(PACKAGED_VOCAB)
    VARIANTS["published_flagship"] = _FLAGSHIP
    try:
        ckpt_path, oracle = _build_variant(
            tmp_path, "published_flagship", len(vocab))
    finally:
        del VARIANTS["published_flagship"]
    meta, trials = _make_trials(tmp_path, n_trials=8)
    ref_csv, ref_rows = _oracle_summary_csv(oracle, trials, vocab, tmp_path)

    calls = {}

    def fake_download(repo_id, filename):
        calls["repo_id"], calls["filename"] = repo_id, filename
        return str(ckpt_path)

    import huggingface_hub
    monkeypatch.setattr(huggingface_hub, "hf_hub_download", fake_download)

    out = tmp_path / "parity_published_predictions.json"
    # the exact argument path scripts/parity_published.sh assembles
    rc = main([
        "--published",
        "--data_dir", str(tmp_path),
        "--eval_include_sos_eos",
        "--output", str(out),
        "--reference_summary", str(ref_csv),
        "--gate", "0.005",
    ])
    assert rc == 0, "published-bundle parity gate failed"
    assert calls == {
        "repo_id": "wkvong/cvcl_s_dino_resnext50_embedding",
        "filename": "cvcl_s_dino_resnext50_embedding.ckpt",
    }, "--published did not hit the published checkpoint identifier"

    ours = json.loads(out.read_text())["data"]
    assert len(ours) == len(trials)
    assert ours[0]["checkpoint"] == "cvcl"
    # converted model must reproduce the oracle's trial-level decisions,
    # not just aggregate accuracy
    assert [r["pred"] for r in ours] == [r["pred"] for r in ref_rows]
    np.testing.assert_allclose(
        np.array([r["logits"] for r in ours]),
        np.array([r["logits"] for r in ref_rows]), atol=2e-3)


def test_published_requires_checkpoint_or_flag(capsys):
    """Without --published or --checkpoint, parity must refuse with a
    parser error (the bundle script's contract: no silent default)."""
    import pytest

    from multimodal_baby_tpu.cli.parity import main
    with pytest.raises(SystemExit) as e:
        main(["--data_dir", "/nonexistent"])
    assert e.value.code == 2
