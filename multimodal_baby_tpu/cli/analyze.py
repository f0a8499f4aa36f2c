"""Analysis-artifact builders as a CLI — the runnable counterpart of the
reference's analysis_cvcl/ scripts (clean.py, alignment.py, duplicates.py,
descriptives.py), producing the same file contracts:

    python -m multimodal_baby_tpu.cli.analyze summaries \
        --results_dir results                 # the three clean.py CSVs
    python -m multimodal_baby_tpu.cli.analyze alignment \
        --checkpoint <ckpt> --eval_frames_dir data/eval_filtered/test \
        --out_dir results/alignment --seed 0
    python -m multimodal_baby_tpu.cli.analyze duplicates \
        --checkpoint <ckpt> --data_dir data --out_dir results/duplicates
    python -m multimodal_baby_tpu.cli.analyze descriptives \
        --data_dir data --out_csv results/descriptives.csv
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def _summaries(args):
    from multimodal_baby_tpu.analysis.summaries import (
        write_ablations_summary, write_bounds_summary,
        write_object_categories_summary)

    d = Path(args.results_dir)
    for name, fn in (("saycam-bounds-summary", write_bounds_summary),
                     ("saycam-ablations", write_ablations_summary),
                     ("object-categories",
                      write_object_categories_summary)):
        df = fn(d)
        print(f"{name}.csv: {len(df)} rows")


def _alignment(args):
    from multimodal_baby_tpu.analysis.embeddings import (
        category_feature_sets, write_alignment_csvs,
        write_joint_embeddings_with_eval_sims)
    from multimodal_baby_tpu.api.model import load_model

    model, _ = load_model(args.checkpoint)
    feats = category_feature_sets(
        model.model, model.variables, args.eval_frames_dir, model.vocab,
        seed=args.seed)
    out = Path(args.out_dir)
    _, _, (r, p) = write_alignment_csvs(
        feats["mean_image_features"], feats["text_features"],
        feats["categories"], out, model=args.model_name, seed=args.seed)
    print(f"alignment pearson r={r:.4f} (p={p:.2e})")
    write_joint_embeddings_with_eval_sims(
        feats["all_image_features"], feats["mean_image_features"],
        feats["text_features"], feats["image_categories"],
        feats["image_filenames"], feats["categories"],
        out / (f"{args.model_name}_joint_embeddings_with_eval_sims_"
               f"seed_{args.seed}.csv"),
        seed=args.seed)
    print(f"wrote alignment CSVs to {out}")


def _duplicates(args):
    from PIL import Image

    from multimodal_baby_tpu.analysis.duplicates import run_leak_audit
    from multimodal_baby_tpu.api.model import load_model
    from multimodal_baby_tpu.data.augment import normalize_image

    import jax.numpy as jnp

    model, _ = load_model(args.checkpoint)
    data_dir = Path(args.data_dir)
    train_md = []
    for split in ("train", "val", "test"):
        p = data_dir / f"{split}.json"
        if p.exists():
            train_md += json.loads(p.read_text())["data"]
    eval_md = json.loads(
        (data_dir / args.eval_metadata).read_text())["data"]

    frames_dir = data_dir / "train_5fps"

    def load(path):
        p = Path(path)
        if not p.is_absolute() and not p.exists():
            p = frames_dir / p
        return np.asarray(Image.open(p).convert("RGB").resize((224, 224)))

    def embed(paths, batch=64):
        feats = []
        for s in range(0, len(paths), batch):
            imgs = np.stack([load(p) for p in paths[s:s + batch]])
            f, _ = model.model.apply(
                model.variables, normalize_image(jnp.asarray(imgs)),
                method="encode_image")
            feats.append(np.asarray(f))
        return np.concatenate(feats)

    report = run_leak_audit(train_md, eval_md, embed, args.out_dir,
                            load_image=load)
    print(json.dumps(report["proportions_over"], indent=2))


def _descriptives(args):
    from multimodal_baby_tpu.analysis.descriptives import (
        dataset_descriptives, date_descriptives, load_split_frame)

    df = load_split_frame(args.data_dir)
    vocab_path = Path(args.data_dir) / "vocab.json"
    vocab_size = len(json.loads(vocab_path.read_text())) \
        if vocab_path.exists() else None
    table = dataset_descriptives(df, vocab_size=vocab_size)
    print(table.to_string(index=False))
    if args.out_csv:
        Path(args.out_csv).parent.mkdir(parents=True, exist_ok=True)
        table.to_csv(args.out_csv, index=False)
    try:
        print(json.dumps(date_descriptives(df), indent=2))
    except Exception:
        pass  # frame filenames without embedded dates


def _figures(args):
    from multimodal_baby_tpu.analysis.figures import render_all
    utterances = None
    if args.metadata:
        with open(args.metadata) as f:
            payload = json.load(f)
        data = payload.get("data", payload)
        utterances = [r.get("utterance", "") for r in data]
    written = render_all(args.summary_csv, args.out_dir,
                         utterances=utterances)
    for p in written:
        print(p)
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("summaries")
    p.add_argument("--results_dir", default="results")
    p.set_defaults(fn=_summaries)

    p = sub.add_parser("alignment")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--eval_frames_dir", required=True)
    p.add_argument("--out_dir", default="results/alignment")
    p.add_argument("--model_name", default="cvc")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=_alignment)

    p = sub.add_parser("duplicates")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data_dir", default="data")
    p.add_argument("--eval_metadata", default="eval_filtered_test.json")
    p.add_argument("--out_dir", default="results/duplicates")
    p.set_defaults(fn=_duplicates)

    p = sub.add_parser("descriptives")
    p.add_argument("--data_dir", default="data")
    p.add_argument("--out_csv", default=None)
    p.set_defaults(fn=_descriptives)

    p = sub.add_parser(
        "figures",
        help="paper figures from a summary CSV (figures.R equivalent)")
    p.add_argument("--summary_csv", required=True)
    p.add_argument("--out_dir", default="results/figures")
    p.add_argument("--metadata", default=None,
                   help="train metadata JSON for the corpus panel")
    p.set_defaults(fn=_figures)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
