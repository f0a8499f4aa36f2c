"""Tokenizer agreement measurement (VERDICT r3 task 7).

The reference tokenizes with spaCy ``en_core_web_sm``
(multimodal/multimodal_lit.py:161-190); spaCy is not installable in this
environment, so agreement is grounded two ways instead of asserted:

1. **Corpus round-trip** — the packaged ``vocab.json`` (2350 entries) IS
   spaCy tokenizer output by construction (the ETL space-joins spaCy
   tokens, multimodal_saycam_data_module.py:409-413; the vocab counts
   them, :1233-1259). Every vocab entry must pass through the fallback
   unchanged. Measured agreement: 99.6%; the only failures are the nine
   whole-form contractions below, which entered the vocab through a
   non-spaCy transcript path — and for those our fallback produces the
   SPLIT form, i.e. exactly what spaCy itself emits on that string, so
   they are vocab artifacts, not tokenizer divergences.

2. **Recorded-output fixture** — representative child-directed
   utterances with their spaCy tokenizations (contractions, exceptions,
   punctuation runs, infix hyphens), hand-verified against spaCy's
   en tokenizer_exceptions/prefix/suffix tables and the corpus vocab.

When spaCy IS installed (production), ``word_tokenize`` uses it directly
and a live comparison test takes over.
"""
import json
from pathlib import Path

import pytest

from multimodal_baby_tpu.data.tokenizer import (
    Tokenizer, _get_spacy, _tokenize_chunk, word_tokenize)
from multimodal_baby_tpu.data.vocab import Vocab

VOCAB_PATH = (Path(__file__).parent.parent / "multimodal_baby_tpu"
              / "data" / "vocab.json")

# vocab entries that are UNSPLIT contraction forms (non-spaCy transcript
# path): the fallback splits them the way spaCy would, so the round-trip
# "failure" is the vocab artifact, not the tokenizer
KNOWN_UNSPLIT_VOCAB_FORMS = {
    "you're": ["you", "'re"], "let's": ["let", "'s"],
    "don't": ["do", "n't"], "it's": ["it", "'s"],
    "gonna": ["gon", "na"], "i'm": ["i", "'m"],
    "they're": ["they", "'re"], "we're": ["we", "'re"],
    "that's": ["that", "'s"],
}

# (utterance, spaCy en_core_web_sm tokenization)
FIXTURE = [
    ("look at the ball", ["look", "at", "the", "ball"]),
    ("don't touch that!", ["do", "n't", "touch", "that", "!"]),
    ("it's a ball...", ["it", "'s", "a", "ball", "..."]),
    ("you're gonna love it", ["you", "'re", "gon", "na", "love", "it"]),
    ("that's mommy's cup, okay?",
     ["that", "'s", "mommy", "'s", "cup", ",", "okay", "?"]),
    ("c'mon let's go", ["c'm", "on", "let", "'s", "go"]),
    ("i cannot see", ["i", "can", "not", "see"]),
    ("we've got ta go", ["we", "'ve", "got", "ta", "go"]),
    ("gotta find the kitty", ["got", "ta", "find", "the", "kitty"]),
    ("lemme see it", ["lem", "me", "see", "it"]),
    ("peek-a-boo", ["peek", "-", "a", "-", "boo"]),
    ("the teddy-bear fell", ["the", "teddy", "-", "bear", "fell"]),
    ("wait -- what was that", ["wait", "--", "what", "was", "that"]),
    ("you- you did it", ["you-", "you", "did", "it"]),
    ("i'll do it, i'd say so",
     ["i", "'ll", "do", "it", ",", "i", "'d", "say", "so"]),
    ("she'll be back; he'd know",
     ["she", "'ll", "be", "back", ";", "he", "'d", "know"]),
    ("'cause it fell down", ["'cause", "it", "fell", "down"]),
    ("what 'bout the duck", ["what", "'bout", "the", "duck"]),
    ("one, two, three!", ["one", ",", "two", ",", "three", "!"]),
    ("is that daddy's?", ["is", "that", "daddy", "'s", "?"]),
    ("hm?!", ["hm", "?", "!"]),
    ("uh oh....", ["uh", "oh", "...."]),
    ("they’re here", ["they", "’re", "here"]),  # curly apostrophe
    ("don’t do that", ["do", "n’t", "do", "that"]),
    ("we're home", ["we", "'re", "home"]),
    ("(laughs) so big", ["(", "laughs", ")", "so", "big"]),
    ("\"hi\" said the dog", ["\"", "hi", "\"", "said", "the", "dog"]),
    ("gimme the spoon", ["gim", "me", "the", "spoon"]),
    ("it's 3.5 inches", ["it", "'s", "3.5", "inches"]),
    ("see you at o'clock", ["see", "you", "at", "o'clock"]),
]


def test_vocab_round_trip_agreement():
    """Every spaCy-produced vocab entry re-tokenizes to itself; the only
    exceptions are the documented unsplit-contraction artifacts, and for
    those our output must be their spaCy split."""
    vocab = json.load(open(VOCAB_PATH))
    failures = {}
    n = 0
    for w in vocab:
        if w.startswith("<") and w.endswith(">"):
            continue
        n += 1
        got = word_tokenize(w)
        if got != [w]:
            failures[w] = got
    agreement = 1 - len(failures) / n
    assert agreement >= 0.995, (agreement, failures)
    assert failures == KNOWN_UNSPLIT_VOCAB_FORMS
    # the split halves are themselves vocab entries (lookups stay in-vocab)
    for parts in KNOWN_UNSPLIT_VOCAB_FORMS.values():
        for p in parts:
            assert p in vocab, p


def test_recorded_spacy_fixture():
    for text, expected in FIXTURE:
        assert word_tokenize(text) == expected, text


def test_tokenize_ids_contract():
    """tokenize() output contract (multimodal_lit.py:161-190): sos/eos
    wrap, pad to 25, OOV -> <unk>=1."""
    vocab = Vocab.load(VOCAB_PATH)
    tok = Tokenizer(vocab)
    ids, lens = tok(["don't touch that!", "xylophone qqq"])
    assert ids.shape == (2, 25)
    assert ids[0, 0] == 2 and ids[0, lens[0] - 1] == 3
    assert ids[0, 1] == vocab.get("do") and ids[0, 2] == vocab.get("n't")
    assert ids[1, 2] == 1  # "qqq" -> <unk>
    assert (ids[0, lens[0]:] == 0).all()


@pytest.mark.skipif(_get_spacy() is None,
                    reason="spaCy en_core_web_sm not installed; the "
                    "recorded fixture above stands in")
def test_live_spacy_agreement():
    """With spaCy installed, the fallback must agree sequence-identically
    on >=99.9% of fixture + vocab-derived utterances."""
    nlp = _get_spacy()
    texts = [t for t, _ in FIXTURE]
    vocab = json.load(open(VOCAB_PATH))
    words = [w for w in vocab if not (w.startswith("<") and w.endswith(">"))]
    texts += [" ".join(words[i:i + 8]) for i in range(0, len(words), 8)]
    same = sum(
        [t.text for t in nlp(s)] == [x for c in s.split()
                                     for x in _tokenize_chunk(c)]
        for s in texts)
    assert same / len(texts) >= 0.999, same / len(texts)
