"""Text-generation evaluation loop: beam-decode a split, score with
BLEU/ROUGE/CIDEr.

Reference flow: calculate_joint_loss(eval_textgen=True) decodes each val
batch (multimodal_lit.py:325-358) and the epoch end runs pycocoevalcap
(:422-440). Here decoding is a jitted while_loop per batch and scoring uses
the pure-Python metrics.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

import jax.numpy as jnp

from multimodal_baby_tpu.core.constants import (
    EOS_TOKEN_ID, PAD_TOKEN_ID, SOS_TOKEN_ID)
from multimodal_baby_tpu.data.vocab import Vocab
from multimodal_baby_tpu.evaluation.textgen_metrics import evaluate


def ids_to_sentence(ids, vocab: Vocab) -> str:
    """Strip PAD tail, trailing EOS, leading SOS; join words
    (reference: multimodal_lit.py:339-353)."""
    ids = [int(i) for i in ids]
    n = 0
    while n < len(ids) and ids[n] != PAD_TOKEN_ID:
        n += 1
    ids = ids[:n]
    if ids and ids[-1] == EOS_TOKEN_ID:
        ids = ids[:-1]
    if ids and ids[0] == SOS_TOKEN_ID:
        ids = ids[1:]
    return " ".join(vocab.idx2word[i] for i in ids)


def run_textgen_eval(
    model, variables, batches, vocab: Vocab,
    beam_width: int = 3, decode_length: int = 25,
    length_penalty_alpha: float = 0.0,
    captioning: bool = False,
    print_examples: int = 0,
) -> Tuple[Dict[str, float], List[List[str]], List[str]]:
    """batches: dicts with text/text_len/raw (+ image_u8 when captioning).
    Returns (scores, references, hypotheses)."""
    import functools

    import jax

    from multimodal_baby_tpu.data.augment import normalize_image

    @functools.partial(jax.jit, static_argnums=(1,))
    def decode(variables, b, image_features):
        seq, scores = model.apply(
            variables, b, beam_width, decode_length,
            length_penalty_alpha, image_features,
            method="beam_search_decode")
        return seq

    encode = jax.jit(lambda v, x: model.apply(v, x, method="encode_image"))

    references: List[List[str]] = []
    hypotheses: List[str] = []
    for batch in batches:
        b = len(batch["text"])
        image_features = None
        if captioning:
            imgs = normalize_image(jnp.asarray(batch["image_u8"]))
            image_features, _ = encode(variables, imgs)
        seq = decode(variables, b, image_features)
        seq = np.asarray(seq)
        hypotheses += [ids_to_sentence(seq[i, 0], vocab)
                       for i in range(b)]
        raw = batch.get("raw", [""] * b)
        references += [[r] if isinstance(r, str) else list(r)
                       for r in raw]

    for i in range(min(print_examples, len(hypotheses))):
        print(f"example #{i}:")
        print("references:")
        print("\n".join(references[i]))
        print("hypothesis:")
        print(hypotheses[i])

    scores = evaluate(references, hypotheses)
    return scores, references, hypotheses
