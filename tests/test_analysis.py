"""Analysis layer: summaries, RSA, grad-CAM, duplicates, processing."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.analysis.descriptives import corpus_stats
from multimodal_baby_tpu.analysis.duplicates import (
    average_hash, find_feature_duplicates, find_hash_duplicates)
from multimodal_baby_tpu.analysis.representation_similarity import rsa
from multimodal_baby_tpu.analysis.summaries import (
    load_predictions, summarize)
from multimodal_baby_tpu.core.config import (
    ModelConfig, TextConfig, VisionConfig)
from multimodal_baby_tpu.models import CVCL


def test_summaries(tmp_path):
    preds = {"data": [
        {"checkpoint": "c", "seed": 0, "stage": "dev",
         "categories": ["ball", "dog"], "logits": [0.7, 0.3],
         "pred": 0, "correct": True, "trial_idx": 0},
        {"checkpoint": "c", "seed": 0, "stage": "dev",
         "categories": ["dog", "ball"], "logits": [0.2, 0.8],
         "pred": 1, "correct": False, "trial_idx": 1},
    ]}
    p = tmp_path / "preds.json"
    p.write_text(json.dumps(preds))
    df = load_predictions([p])
    s = summarize(df)
    total = s[s.target_category == "TOTAL"]
    assert float(total.accuracy.iloc[0]) == 0.5
    ball = s[s.target_category == "ball"]
    assert float(ball.accuracy.iloc[0]) == 1.0


def test_rsa_identity_and_invariance():
    rng = np.random.RandomState(0)
    x = rng.randn(20, 16)
    assert abs(rsa(x, x) - 1.0) < 1e-9
    # orthogonal rotation preserves cosine structure
    q, _ = np.linalg.qr(rng.randn(16, 16))
    assert abs(rsa(x, x @ q) - 1.0) < 1e-6
    y = rng.randn(20, 16)
    assert rsa(x, y) < 0.5
    assert -1.0 <= rsa(x, y, method="spearman") <= 1.0


def test_grad_cam_shapes():
    from multimodal_baby_tpu.analysis.attention_maps import grad_cam
    cfg = ModelConfig(embedding_dim=16, vocab_size=32,
                      embedding_type="flat", normalize_features=True,
                      vision=VisionConfig(cnn_model="toy"),
                      text=TextConfig(text_encoder="embedding"))
    model = CVCL(cfg)
    imgs = jnp.asarray(np.random.RandomState(0).randn(
        2, 64, 64, 3).astype(np.float32))
    txt = jnp.array([[4, 0, 0], [5, 0, 0]], jnp.int32)
    tlen = jnp.array([1, 1])
    variables = model.init(jax.random.PRNGKey(0), imgs, txt, tlen)
    cam = grad_cam(model, variables, imgs, txt, tlen)
    assert cam.shape == (2, 64, 64)
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6


def test_duplicates():
    rng = np.random.RandomState(0)
    img1 = rng.randint(0, 255, (64, 64, 3), np.uint8)
    img2 = img1.copy()
    img2[0, 0] ^= 1  # near-identical
    img3 = rng.randint(0, 255, (64, 64, 3), np.uint8)
    h = [average_hash(i) for i in (img1, img2, img3)]
    dups = find_hash_duplicates(np.stack(h[:1]), np.stack(h[1:]),
                                max_distance=3)
    assert (0, 0, 0) in dups or any(d[1] == 0 for d in dups)
    assert not any(d[1] == 1 for d in dups)

    f = rng.randn(4, 8)
    f2 = np.vstack([f[0] * 2.0, rng.randn(8)])  # scaled copy has cos=1
    found = find_feature_duplicates(f, f2, threshold=0.99)
    assert (0, 0, 1.0) in [(i, j, round(s, 2)) for i, j, s in found]


def test_corpus_stats():
    stats = corpus_stats(["the ball", "the dog ran", ""])
    assert stats["n_utterances"] == 3
    assert stats["n_tokens"] == 5
    assert stats["n_types"] == 4
    assert stats["max_utterance_length"] == 3


def test_processing_token_data():
    from multimodal_baby_tpu.analysis.processing import (
        collect_token_data, mean_hidden_per_word, per_word_summary)
    from multimodal_baby_tpu.data.vocab import Vocab

    vocab = Vocab({w: i for i, w in enumerate(
        ["<pad>", "<unk>", "<sos>", "<eos>", "ball", "dog"])})
    cfg = ModelConfig(embedding_dim=16, vocab_size=len(vocab),
                      embedding_type="flat",
                      vision=VisionConfig(cnn_model="toy"),
                      text=TextConfig(text_encoder="lstm"))
    model = CVCL(cfg)
    text = np.array([[2, 4, 5, 3, 0], [2, 5, 3, 0, 0]], np.int32)
    tlen = np.array([4, 3], np.int32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
        jnp.asarray(text), jnp.asarray(tlen))

    data = collect_token_data(
        model, variables, [{"text": text, "text_len": tlen}], vocab,
        collect_hidden=True)
    # regressional labels: positions 1.. -> [ball, dog, eos] + [dog, eos]
    assert len(data["token_id"]) == 5
    assert set(data["token"]) == {"ball", "dog", "<eos>"}
    summary = per_word_summary(data)
    assert set(summary.token) == {"ball", "dog", "<eos>"}
    hidden = mean_hidden_per_word(data)
    assert hidden["mean_hidden"].shape[1] == 16


def _write_pred(path, seed=0, stage="test", eval_dataset="saycam",
                cats=("ball", "dog", "cat", "cup")):
    path.parent.mkdir(parents=True, exist_ok=True)
    rows = []
    for t in range(3):
        rows.append({
            "checkpoint": f"ckpt_seed_{seed}", "model": "embedding",
            "seed": seed, "shuffle_utterances": False,
            "augment_frames": True, "multiple_frames": True,
            "cnn": "frozen_pretrained", "eval_type": "image",
            "eval_dataset": eval_dataset, "stage": stage, "trial_idx": t,
            "categories": list(cats), "logits": [0.7, 0.1, 0.1, 0.1],
            "pred": 0, "correct": True,
        })
    path.write_text(json.dumps({"data": rows}))


def test_clean_py_summary_contract(tmp_path):
    """The summary writers produce clean.py's row-level CSV schema:
    the shipped saycam-transformer-summary.csv column order, with
    target_category/config/filtered annotations per group."""
    import pandas as pd
    from multimodal_baby_tpu.analysis.summaries import (
        SUMMARY_COLUMNS, write_bounds_summary,
        write_object_categories_summary)

    d = tmp_path / "results"
    for seed in (0, 1, 2):
        _write_pred(d / "saycam" /
                    f"embedding_frozen_pretrained_seed_{seed}_image_"
                    "saycam_test_eval_predictions.json", seed=seed)
    _write_pred(d / "saycam" /
                "shuffle_embedding_frozen_pretrained_seed_0_image_"
                "saycam_test_eval_predictions.json")
    _write_pred(d / "object_categories" /
                "embedding_frozen_pretrained_seed_0_image_"
                "object_categories_test_eval_predictions.json",
                eval_dataset="object_categories")

    out = tmp_path / "bounds.csv"
    df = write_bounds_summary(d, out)
    assert out.exists()
    # column order: the reference schema prefix, then annotations
    assert list(df.columns[:len(SUMMARY_COLUMNS)]) == SUMMARY_COLUMNS
    assert "filtered" in df.columns
    assert set(df["config"]) == {"contrastive_embedding",
                                 "contrastive_shuffled"}
    assert (df["target_category"] == "ball").all()
    assert len(df) == 4 * 3  # 4 files x 3 trials

    # round-trips through CSV with the reference's stringified lists
    back = pd.read_csv(out, index_col=0)
    assert back["categories"].iloc[0] == "['ball', 'dog', 'cat', 'cup']"

    df2 = write_object_categories_summary(d, tmp_path / "oc.csv")
    assert set(df2["config"]) == {"contrastive"}
    assert "split" in df2.columns


def test_alignment_csv_contract(tmp_path):
    """alignment.py artifact parity: long-form pair CSVs + Pearson
    alignment statistic."""
    import pandas as pd
    from multimodal_baby_tpu.analysis.embeddings import (
        write_alignment_csvs)

    rng = np.random.RandomState(0)
    C, E = 5, 16
    mean_img = rng.randn(C, E)
    txt = mean_img + 0.1 * rng.randn(C, E)  # correlated structure
    cats = [f"cat{i}" for i in range(C)]
    joint_df, cross_df, (r, p) = write_alignment_csvs(
        mean_img, txt, cats, tmp_path, model="cvc", seed=0)

    f1 = tmp_path / "cvc_joint_embeddings_sims_seed_0.csv"
    f2 = tmp_path / "cvc_image_text_embeddings_sims_seed_0.csv"
    assert f1.exists() and f2.exists()
    back = pd.read_csv(f1)
    assert list(back.columns) == ["image_sims", "text_sims",
                                  "eval_category_x", "eval_category_y"]
    assert len(back) == C * C
    # diagonal pairs are self-similarity 1
    diag = back[back.eval_category_x == back.eval_category_y]
    np.testing.assert_allclose(diag.image_sims, 1.0, atol=1e-9)
    assert list(pd.read_csv(f2).columns) == [
        "image_text_sims", "eval_category_x", "eval_category_y"]
    assert r > 0.5  # structure is correlated by construction


def test_joint_embeddings_with_eval_sims_csv(tmp_path):
    import pandas as pd
    from multimodal_baby_tpu.analysis.embeddings import (
        write_joint_embeddings_with_eval_sims)

    rng = np.random.RandomState(1)
    C, N, E = 3, 12, 8
    cats = ["ball", "cat", "cup"]
    img = rng.randn(N, E)
    mean_img = rng.randn(C, E)
    txt = rng.randn(C, E)
    img_cats = [cats[i % C] for i in range(N)]
    files = [f"f{i}.jpeg" for i in range(N)]
    out = tmp_path / "cvcl_joint_embeddings_with_eval_sims_seed_0.csv"
    df = write_joint_embeddings_with_eval_sims(
        img, mean_img, txt, img_cats, files, cats, out, seed=0)
    assert out.exists()
    assert list(df.columns[:5]) == ["x", "y", "eval_category",
                                    "image_filename", "embedding_type"]
    assert list(df.columns[5:]) == cats
    assert (df.embedding_type.value_counts()["image"] == N
            and df.embedding_type.value_counts()["text"] == C)
    # per-category sim columns: zeros on mean/text rows, dot products on
    # image rows
    assert (df.loc[df.embedding_type != "image", "ball"] == 0).all()
    np.testing.assert_allclose(
        df.loc[df.embedding_type == "image", "ball"], img @ txt[0],
        rtol=1e-6)


def test_leak_audit_workflow(tmp_path):
    """duplicates.py audit parity: matched_results.csv + report with
    per-category counts and threshold proportions."""
    import json as _json
    import pandas as pd
    from multimodal_baby_tpu.analysis.duplicates import run_leak_audit

    train_md = [
        {"utterance": "look at the ball",
         "frame_filenames": ["t0.jpg", "t1.jpg"]},
        {"utterance": "a cat", "frame_filenames": ["t2.jpg"]},
    ]
    eval_md = [
        {"target_category": "ball", "target_img_filename": "e0.jpg"},
        {"target_category": "cat", "target_img_filename": "e1.jpg"},
    ]
    feats = {"t0.jpg": [1.0, 0.0], "t1.jpg": [0.0, 1.0],
             "t2.jpg": [1.0, 1.0], "e0.jpg": [1.0, 0.01],
             "e1.jpg": [-1.0, 0.0]}

    def embed(paths):
        return np.array([feats[p] for p in paths], np.float64)

    report = run_leak_audit(train_md, eval_md, embed, tmp_path,
                            load_image=lambda p: np.zeros((4, 4, 3),
                                                          np.uint8))
    df = pd.read_csv(tmp_path / "matched_results.csv")
    assert list(df.columns) == ["eval_filename", "train_filename",
                                "cosine_sim", "matched", "category"]
    ball = df[df.category == "ball"].iloc[0]
    assert ball.train_filename == "t0.jpg"  # nearest by cosine
    assert ball.cosine_sim > 0.99
    assert report["per_category"]["ball"]["n_over"]["0.99"] == 1
    assert report["per_category"]["cat"]["n_over"]["0.9"] == 0
    assert (tmp_path / "duplicates_report.json").exists()
    assert (tmp_path / "nn_pairs.png").exists()


def test_descriptives_tables(tmp_path):
    import json as _json
    import pandas as pd
    from multimodal_baby_tpu.analysis.descriptives import (
        category_word_freq_subsets, dataset_descriptives,
        date_descriptives, load_split_frame)

    data = {
        "train": [{"utterance": "look at the ball",
                   "frame_filenames": ["S_20130601_0_0.jpg"] * 3},
                  {"utterance": "a cat",
                   "frame_filenames": ["S_20140301_1_0.jpg"]}],
        "val": [{"utterance": "the ball",
                 "frame_filenames": ["S_20130801_2_0.jpg"]}],
        "test": [{"utterance": "a dog dog",
                  "frame_filenames": ["S_20130901_3_0.jpg"]}],
    }
    for split, rows in data.items():
        (tmp_path / f"{split}.json").write_text(_json.dumps({"data": rows}))
    df = load_split_frame(tmp_path)
    table = dataset_descriptives(df, vocab_size=10)
    train_row = table[table.split == "train"].iloc[0]
    assert train_row.n_utterances == 2
    assert train_row.n_tokens == 6
    assert train_row.n_frames == 4
    total = table[table.split == "TOTAL"].iloc[0]
    assert total.n_utterances == 4 and total.n_tokens == 11

    dd = date_descriptives(df)
    assert dd["first_date"] == "2013-06-01"
    assert dd["last_date"] == "2014-03-01"

    freq = category_word_freq_subsets(
        ["look at the ball", "a cat", "the ball"], ["ball", "cat"],
        subset_proportions=(1.0, 0.5))
    full_ball = freq[(freq.category == "ball")
                     & (freq.subset_proportion == "1.0")].word_freq.iloc[0]
    assert full_ball == 2


def test_token_items_table():
    """token_items_data.py contract: per-type counts, per-model loss/prob/
    ppl columns, diffs vs baseline, POS + syntactic category + word
    category columns, embedding coordinates."""
    from multimodal_baby_tpu.analysis.token_items import build_token_items

    rng = np.random.RandomState(0)

    def run(losses):
        tokens, ls, hid = [], [], []
        for w, word_losses in losses.items():
            for value in word_losses:
                tokens.append(w)
                ls.append(value)
                hid.append(rng.randn(8))
        return {"token": np.asarray(tokens),
                "ce_loss": np.asarray(ls, np.float64),
                "position": np.zeros(len(ls)),
                "hidden": np.asarray(hid)}

    runs = {
        "lstm": run({"ball": [1.0, 3.0], "the": [0.5], "kitty": [2.0],
                     "running": [4.0]}),
        "ngram": run({"ball": [2.0, 2.0], "the": [1.5], "kitty": [1.0],
                      "running": [4.0]}),
    }
    items = build_token_items(runs, embed_methods=("pca",))
    items = items.set_index("token")
    assert items.loc["ball", "cnt"] == 2
    assert abs(items.loc["ball", "lstm loss"] - 2.0) < 1e-9
    assert abs(items.loc["ball", "ngram loss - lstm loss"] - 0.0) < 1e-9
    assert abs(items.loc["kitty", "ngram loss - lstm loss"] + 1.0) < 1e-9
    assert abs(items.loc["the", "lstm prob"] - np.exp(-0.5)) < 1e-9
    assert items.loc["kitty", "word category"] == "animals"
    assert items.loc["the", "syntactic category"] == "function word"
    assert items.loc["running", "pos"] == "VERB"
    assert "lstm pca 0" in items.columns and "lstm pca 1" in items.columns
    assert np.isfinite(items["lstm pca 0"]).all()


def test_grad_cam_captioning_per_step():
    """Per-token-step grad-CAM (multimodal_visualization.py contract):
    one map per step, step 0 empty, maps normalized to [0, 1]."""
    from multimodal_baby_tpu.analysis.attention_maps import (
        grad_cam_captioning)
    from multimodal_baby_tpu.core.config import (
        ModelConfig, TextConfig, VisionConfig)
    from multimodal_baby_tpu.models import CVCL

    cfg = ModelConfig(
        embedding_dim=16, vocab_size=32,
        vision=VisionConfig(cnn_model="toy"),
        text=TextConfig(text_encoder="lstm", captioning=True))
    model = CVCL(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(64, 64, 3).astype(np.float32))
    text = np.zeros((10,), np.int32)
    text[:5] = [2, 5, 6, 7, 3]
    variables = model.init(jax.random.PRNGKey(0), img[None],
                           jnp.asarray(text)[None],
                           jnp.asarray([5], jnp.int32))
    maps = grad_cam_captioning(model, variables, img, text, 5,
                               out_size=32)
    assert maps.shape == (5, 32, 32)
    assert np.allclose(maps[0], 0.0)
    assert np.isfinite(maps).all()
    assert maps.max() <= 1.0 + 1e-6 and maps.min() >= 0.0


def test_sentence_batches_and_transformer_summary(tmp_path):
    import json as _json
    from multimodal_baby_tpu.analysis.processing import sentence_batches
    from multimodal_baby_tpu.analysis.summaries import (
        write_transformer_summary)
    from multimodal_baby_tpu.data.vocab import Vocab

    vocab = Vocab.build(["the ball", "a cat"] * 3, min_freq=1)
    batches = list(sentence_batches(
        ["the ball", "a zzz cat"], vocab, batch_size=8))
    assert len(batches) == 1
    b = batches[0]
    assert b["text"].shape == (2, 25)
    assert b["text"][0, 0] == 2           # <sos>
    assert b["text"][0, 3] == 3           # <eos>
    assert b["text_len"][0] == 4
    assert b["text"][1, 2] == 1           # zzz -> <unk>

    _write_pred(tmp_path / "saycam" /
                "transformer_frozen_pretrained_seed_0_image_saycam_test_"
                "eval_predictions.json")
    df = write_transformer_summary(tmp_path)
    assert (tmp_path / "summary/saycam-transformer-summary.csv").exists()
    assert set(df["config"]) == {"contrastive_transformer_embedding"}
    assert (df["filtered"] == False).all()  # noqa: E712


def test_paper_figures(tmp_path):
    """figures.R-equivalent renderer: every panel from a synthetic summary
    CSV (same schema as analysis/summaries.py output)."""
    import numpy as np
    import pandas as pd
    from multimodal_baby_tpu.analysis.figures import render_all

    rng = np.random.RandomState(0)
    rows = []
    for config in ("contrastive", "shuffled"):
        for seed in (0, 1):
            for cat in ("ball", "cat", "car"):
                for t in range(20):
                    rows.append({
                        "config": config, "seed": seed,
                        "target_category": cat,
                        "correct": int(rng.rand() < (0.6 if config ==
                                                     "contrastive" else .25)),
                        "filtered": t % 2 == 0,
                    })
    df = pd.DataFrame(rows)
    csv = tmp_path / "summary.csv"
    df.to_csv(csv, index=False)
    written = render_all(csv, tmp_path / "figs",
                         utterances=["the red ball", "a cat", "look a car"])
    names = {p.name for p in written}
    assert {"eval_accuracy.png", "config_comparison.png",
            "seed_consistency.png", "corpus_descriptives.png"} <= names
    for p in written:
        assert p.exists() and p.stat().st_size > 1000
