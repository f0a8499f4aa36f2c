"""Tokenizer for the public ``tokenize`` API.

The reference tokenizes with spaCy ``en_core_web_sm``
(multimodal/multimodal_lit.py:161-190). We use spaCy when the model is
installed; otherwise a rule-based fallback reproducing spaCy's behavior on
this corpus (lowercase child-directed speech: word tokens, standalone
punctuation, English contraction splitting) — the SAYCam transcripts are
pre-cleaned so the two agree on virtually all inputs.

Output contract is identical: ids padded to 25 with <sos>/<eos>/<unk>/<pad>,
plus true lengths.
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple, Union

import numpy as np

from multimodal_baby_tpu.core.constants import (
    EOS_TOKEN_ID, MAX_LEN_UTTERANCE, PAD_TOKEN_ID, SOS_TOKEN_ID)
from multimodal_baby_tpu.data.vocab import Vocab

_SPACY_NLP = None
_SPACY_TRIED = False

# English contractions spaCy splits as exceptions: n't, 's, 're, 've, 'll,
# 'd, 'm — keep the apostrophe with the suffix
_TOKEN_RE = re.compile(
    r"n't|'(?:s|re|ve|ll|d|m)\b|\w+|[^\w\s]", re.UNICODE)


def _get_spacy():
    global _SPACY_NLP, _SPACY_TRIED
    if not _SPACY_TRIED:
        _SPACY_TRIED = True
        try:
            import spacy
            _SPACY_NLP = spacy.load("en_core_web_sm")
        except Exception:
            _SPACY_NLP = None
    return _SPACY_NLP


def word_tokenize(text: str) -> List[str]:
    nlp = _get_spacy()
    if nlp is not None:
        return [token.text for token in nlp(text)]
    return _TOKEN_RE.findall(text)


class Tokenizer:
    def __init__(self, vocab: Vocab, max_len: int = MAX_LEN_UTTERANCE):
        self.vocab = vocab
        self.max_len = max_len

    def __call__(self, texts: Union[str, Sequence[str]]
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """texts -> (tokens [N, max_len] int32, lengths [N] int32).

        Matches MultiModalLitModel.tokenize exactly (multimodal_lit.py:
        161-190): truncate words to max_len-2, wrap in <sos>/<eos>, pad.
        """
        if isinstance(texts, str):
            texts = [texts]
        all_tokens, lengths = [], []
        for text in texts:
            words = word_tokenize(text)[: self.max_len - 2]
            ids = ([SOS_TOKEN_ID] + [self.vocab.get(w) for w in words]
                   + [EOS_TOKEN_ID])
            lengths.append(len(ids))
            ids = ids + [PAD_TOKEN_ID] * (self.max_len - len(ids))
            all_tokens.append(ids)
        return (np.asarray(all_tokens, np.int32),
                np.asarray(lengths, np.int32))

    def encode_utterance(self, utterance: str, max_len: int = None
                         ) -> Tuple[np.ndarray, int]:
        """Training-path encoding: pre-tokenized (space-separated) utterance
        -> <sos> w1 .. wn <eos>, padded/truncated to max_len
        (reference: multimodal_saycam_data_module.py:100-105 + collate
        multimodal_data_module.py:98-109)."""
        max_len = max_len or self.max_len
        words = utterance.split()
        ids = ([SOS_TOKEN_ID] + [self.vocab.get(w) for w in words]
               + [EOS_TOKEN_ID])[:max_len]
        length = len(ids)
        ids = ids + [PAD_TOKEN_ID] * (max_len - length)
        return np.asarray(ids, np.int32), length
