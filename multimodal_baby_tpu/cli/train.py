"""Training entry point (reference: train.py).

    python -m multimodal_baby_tpu.cli.train --dataset saycam \
        --text_encoder lstm --embedding_dim 512 --cnn_dino ...

Supports the full reference flag set plus mesh/precision flags, seeding,
fast_dev_run smoke mode and "last" resume (train.py:51-53,64-66,107).
"""

from __future__ import annotations

import argparse

from multimodal_baby_tpu.cli.args import add_all_args, args_to_config


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_all_args(parser)
    parser.add_argument("--fast_dev_run", action="store_true",
                        help="one tiny epoch as a smoke test "
                             "(reference: run.sh:13)")
    parser.add_argument("--prepare_data_only", action="store_true",
                        help="run the offline ETL (idempotent, resumable)"
                             " and exit without training")
    args = parser.parse_args(argv)
    cfg = args_to_config(args)

    if args.fast_dev_run:
        cfg.train.max_epochs = 1
        cfg.data.synthetic_size = max(2 * cfg.data.batch_size, 8)

    if args.dataset in ("saycam", "coco"):
        from multimodal_baby_tpu.data.modules import DataModule
        DataModule(cfg.data, seed=cfg.train.seed).prepare_data()
    if args.prepare_data_only:
        print(f"prepare_data complete under {cfg.data.data_dir}")
        return None

    from multimodal_baby_tpu.train.trainer import Trainer
    trainer = Trainer(cfg)
    print(f"experiment {cfg.exp_name}: "
          f"{len(trainer.data.datasets['train'])} train examples, "
          f"vocab {trainer.data.vocab_size}, mesh "
          f"{dict(trainer.mesh.shape)}")
    result = trainer.fit()
    print("final:", result)
    return result


if __name__ == "__main__":
    main()
