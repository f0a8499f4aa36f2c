"""Textgen eval loop: ids_to_sentence semantics + trainer integration."""

import math

import numpy as np

from multimodal_baby_tpu.data.vocab import Vocab
from multimodal_baby_tpu.evaluation.textgen import ids_to_sentence


def test_ids_to_sentence():
    vocab = Vocab({w: i for i, w in enumerate(
        ["<pad>", "<unk>", "<sos>", "<eos>", "ball", "dog"])})
    assert ids_to_sentence([2, 4, 5, 3, 0, 0], vocab) == "ball dog"
    assert ids_to_sentence([2, 4, 3], vocab) == "ball"
    assert ids_to_sentence([4, 5], vocab) == "ball dog"  # no specials
    assert ids_to_sentence([2, 3], vocab) == ""
    assert ids_to_sentence([0, 0], vocab) == ""


def test_trainer_textgen_metrics(tmp_path):
    from tests.test_trainer import make_cfg
    from multimodal_baby_tpu.train.trainer import Trainer

    cfg = make_cfg(tmp_path, max_epochs=1, lambda_mm=0.5, lambda_lm=0.5,
                   eval_textgen=True, beam_width=2, decode_length=6)
    cfg.model.text.text_encoder = "lstm"
    trainer = Trainer(cfg)
    out = trainer.validate("val")
    for k in ("Bleu_1", "ROUGE_L", "CIDEr"):
        assert k in out and math.isfinite(out[k])
