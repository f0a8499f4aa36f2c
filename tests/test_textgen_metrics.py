"""Textgen metrics against hand-computed values."""

import math

import numpy as np

from multimodal_baby_tpu.evaluation.textgen_metrics import (
    cider, corpus_bleu, evaluate, rouge_l)


def test_perfect_match():
    refs = [["the cat sat"], ["a dog ran fast"]]
    hyps = ["the cat sat", "a dog ran fast"]
    bleus = corpus_bleu(refs, hyps)
    assert all(abs(b - 1.0) < 1e-9 for b in bleus[:3])
    assert abs(rouge_l(refs, hyps) - 1.0) < 1e-9


def test_bleu_hand_computed():
    # hyp "the cat" vs ref "the cat sat": p1=1, bp=exp(1-3/2)
    refs = [["the cat sat"]]
    hyps = ["the cat"]
    bleus = corpus_bleu(refs, hyps)
    assert abs(bleus[0] - math.exp(-0.5)) < 1e-9
    # p2 = 1/1 -> BLEU2 = bp * sqrt(1*1) = bp
    assert abs(bleus[1] - math.exp(-0.5)) < 1e-9


def test_bleu_clipping():
    # "the the the" vs "the cat": clipped p1 = 1/3
    refs = [["the cat"]]
    hyps = ["the the the"]
    bleus = corpus_bleu(refs, hyps)
    assert abs(bleus[0] - 1 / 3) < 1e-9  # bp = 1 (hyp longer)


def test_rouge_hand_computed():
    # hyp "the cat", ref "the cat sat": lcs=2, P=1, R=2/3
    refs = [["the cat sat"]]
    hyps = ["the cat"]
    beta = 1.2
    p, r = 1.0, 2 / 3
    expected = (1 + beta ** 2) * p * r / (r + beta ** 2 * p)
    assert abs(rouge_l(refs, hyps) - expected) < 1e-9


def test_cider_identical_beats_different():
    refs = [["the cat sat on the mat"], ["a dog ran"],
            ["blue ball bounced high"]]
    hyps_good = ["the cat sat on the mat", "a dog ran",
                 "blue ball bounced high"]
    hyps_bad = ["a dog ran", "blue ball bounced", "the cat sat"]
    assert cider(refs, hyps_good) > cider(refs, hyps_bad)
    assert cider(refs, hyps_good) > 5.0  # identical -> near max (10)


def test_evaluate_keys():
    refs = [["the cat sat"], ["a dog"]]
    hyps = ["the cat", "a dog"]
    out = evaluate(refs, hyps)
    for k in ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "ROUGE_L", "CIDEr"):
        assert k in out
