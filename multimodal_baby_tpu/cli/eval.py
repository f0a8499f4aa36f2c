"""Zero-shot forced-choice evaluation entry point (reference: eval.py).

    python -m multimodal_baby_tpu.cli.eval --checkpoint <dir-or-.ckpt> \
        --data_dir data --eval_type image --stage dev [--use_kitty_label]

Loads a checkpoint (native dir / reference torch .ckpt / "cvcl"), runs the
batched forced-choice harness over the eval-trial metadata, prints the
per-class accuracy table and writes the predictions JSON to results/
(schema of eval.py:248-266).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from multimodal_baby_tpu.data.datasets import (
    EvalTrialDataset, TextEvalTrialDataset, load_metadata)
from multimodal_baby_tpu.evaluation.forced_choice import (
    print_accuracy_table, run_forced_choice, save_predictions)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--data_dir", type=str, default="data")
    parser.add_argument("--eval_type", type=str, default="image",
                        choices=["image", "text"])
    parser.add_argument("--eval_dataset", type=str, default="saycam",
                        choices=["saycam", "object_categories"])
    parser.add_argument("--stage", type=str, default="dev",
                        choices=["dev", "test"])
    parser.add_argument("--eval_metadata_filename", type=str,
                        default="eval_filtered_dev.json")
    parser.add_argument("--eval_include_sos_eos", action="store_true")
    parser.add_argument("--use_kitty_label", action="store_true")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--output_dir", type=str, default="results")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--dump_attention_maps", type=int, default=0,
                        help="save grad-CAM overlays for the first N "
                             "trials (reference: eval_shuffled.py:196-228)")
    parser.add_argument("--clip_eval", action="store_true",
                        help="evaluate the CLIP baseline instead of a CVCL "
                             "checkpoint (reference: eval.py:29-47; needs "
                             "CLIP weights locally or network)")
    parser.add_argument("--clip_model", type=str,
                        default="openai/clip-vit-large-patch14")
    args = parser.parse_args(argv)

    if args.clip_eval:
        from multimodal_baby_tpu.data.vocab import Vocab
        from multimodal_baby_tpu.evaluation.clip_baseline import (
            CLIPBaseline, run_clip_forced_choice)

        fname = args.eval_metadata_filename
        if args.stage == "test":
            fname = fname.replace("dev", "test")
        data = load_metadata(Path(args.data_dir) / fname)
        # labels come from trial categories; vocab only keys the dataset
        vocab = Vocab({t["target_category"]: i
                       for i, t in enumerate(data)})
        dataset = EvalTrialDataset(data, vocab)
        baseline = CLIPBaseline(model_name=args.clip_model)
        acc, records = run_clip_forced_choice(baseline, dataset,
                                              batch_size=args.batch_size)
        print(f"CLIP baseline total accuracy: {acc:.1%}")
        return {"total": acc}

    from multimodal_baby_tpu.api.model import load_model
    model, _ = load_model(args.checkpoint)

    data_dir = Path(args.data_dir)
    fname = args.eval_metadata_filename
    if args.stage == "test":
        fname = fname.replace("dev", "test")
    data = load_metadata(data_dir / fname)
    vocab = model.vocab

    cls = (EvalTrialDataset if args.eval_type == "image"
           else TextEvalTrialDataset)
    dataset = cls(data, vocab,
                  eval_include_sos_eos=args.eval_include_sos_eos)

    variables = model.variables
    accs, records = run_forced_choice(
        model.model, variables, dataset, args.eval_type,
        batch_size=args.batch_size,
        use_kitty_label=args.use_kitty_label, vocab=vocab)

    print_accuracy_table(accs)

    ckpt_name = Path(args.checkpoint).stem
    out = Path(args.output_dir) / (
        f"{args.eval_dataset}_{args.eval_type}_{args.stage}_"
        f"{ckpt_name}_predictions.json")
    save_predictions(records, out, {
        "checkpoint": ckpt_name,
        "seed": args.seed,
        "eval_type": args.eval_type,
        "eval_dataset": args.eval_dataset,
        "stage": args.stage,
        "use_kitty_label": args.use_kitty_label,
    })
    print(f"saved predictions to {out}")

    if args.dump_attention_maps > 0 and args.eval_type == "image":
        import numpy as np
        import jax.numpy as jnp
        from PIL import Image
        from multimodal_baby_tpu.analysis.attention_maps import (
            get_attention_overlay, grad_cam)
        from multimodal_baby_tpu.data.augment import normalize_image

        map_dir = Path(args.output_dir) / f"attention_maps_{ckpt_name}"
        map_dir.mkdir(parents=True, exist_ok=True)
        for i in range(min(args.dump_attention_maps, len(dataset))):
            imgs, ids, ln, cat = dataset[i]
            cams = grad_cam(
                model.model, variables,
                normalize_image(jnp.asarray(imgs)),
                jnp.tile(jnp.asarray(ids)[None], (imgs.shape[0], 1)),
                jnp.full((imgs.shape[0],), ln))
            for j in range(imgs.shape[0]):
                overlay = get_attention_overlay(
                    imgs[j].astype(np.float32) / 255.0, cams[j])
                Image.fromarray(
                    (np.clip(overlay, 0, 1) * 255).astype(np.uint8)
                ).save(map_dir / f"trial{i}_{cat}_img{j}.png")
        print(f"saved attention maps to {map_dir}")
    return accs


if __name__ == "__main__":
    main()
