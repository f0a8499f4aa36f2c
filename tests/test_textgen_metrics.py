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
    for k in ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR",
              "ROUGE_L", "CIDEr", "SPICE"):
        assert k in out


# ---------------------------------------------------------------------------
# METEOR (Meteor 1.5 scoring: alpha=.85, beta=.2, gamma=.6, delta=.75)
# ---------------------------------------------------------------------------

def test_meteor_identical_hand_computed():
    from multimodal_baby_tpu.evaluation.meteor import sentence_meteor
    # "big dog chases cat": all content words, all matched exactly.
    # P=R=1 -> Fmean=1; chunks=1, matches=4 -> Pen = .6*(1/4)^.2
    expected = 1.0 - 0.6 * 0.25 ** 0.2
    got = sentence_meteor(["big dog chases cat"], "big dog chases cat")
    assert abs(got - expected) < 1e-9


def test_meteor_partial_hand_computed():
    from multimodal_baby_tpu.evaluation.meteor import sentence_meteor
    # hyp "the dog" vs ref "the dog ran": matches = the(func,.25) +
    # dog(content,.75). P = 1.0; R = 1.0/(.25+.75+.75)
    p, r = 1.0, 1.0 / 1.75
    fmean = p * r / (0.85 * p + 0.15 * r)
    pen = 0.6 * (1 / 2) ** 0.2
    assert abs(sentence_meteor(["the dog ran"], "the dog")
               - fmean * (1 - pen)) < 1e-9


def test_meteor_stem_stage_weight():
    from multimodal_baby_tpu.evaluation.meteor import sentence_meteor
    # "dog runs" vs "dog running": exact dog (w=1) + stem run (w=.6),
    # both content words.
    m = (1.0 * 0.75 + 0.6 * 0.75)
    p = m / 1.5
    r = m / 1.5
    fmean = p * r / (0.85 * p + 0.15 * r)
    pen = 0.6 * (1 / 2) ** 0.2  # one contiguous chunk, two matches
    assert abs(sentence_meteor(["dog running"], "dog runs")
               - fmean * (1 - pen)) < 1e-9


def test_meteor_orderings():
    from multimodal_baby_tpu.evaluation.meteor import meteor, sentence_meteor
    assert sentence_meteor(["a dog ran"], "blue ball bounced") == 0.0
    # fragmentation: scrambled word order scores below identical order
    ident = sentence_meteor(["the cat sat on the mat"],
                            "the cat sat on the mat")
    scram = sentence_meteor(["the cat sat on the mat"],
                            "mat the on sat cat the")
    assert scram < ident
    # corpus aggregation is micro (stat-pooled), bounded by best/worst
    refs = [["big dog"], ["red ball"]]
    hyps = ["big dog", "green cup"]
    corpus = meteor(refs, hyps)
    assert 0.0 < corpus < sentence_meteor(["big dog"], "big dog")


def test_meteor_best_reference_selected():
    from multimodal_baby_tpu.evaluation.meteor import sentence_meteor
    both = sentence_meteor(["a red ball", "big dog chases cat"],
                           "big dog chases cat")
    one = sentence_meteor(["big dog chases cat"], "big dog chases cat")
    assert abs(both - one) < 1e-12


# ---------------------------------------------------------------------------
# SPICE (scene-graph tuple F1)
# ---------------------------------------------------------------------------

def test_spice_tuple_extraction():
    from multimodal_baby_tpu.evaluation.spice import parse_tuples
    assert parse_tuples("the big red ball") == {
        ("ball",), ("ball", "big"), ("ball", "red")}
    assert ("dog", "on", "grass") in parse_tuples("a dog on the grass")
    assert ("ball", "red") in parse_tuples("the ball is red")
    assert ("dog", "chase", "cat") in parse_tuples("the dog chases the cat")


def test_spice_f1_hand_computed():
    from multimodal_baby_tpu.evaluation.spice import sentence_spice
    # ref tuples: {(ball,), (ball,big), (ball,red)}; hyp "the red ball"
    # tuples: {(ball,), (ball,red)} -> P=1, R=2/3 -> F1=0.8
    got = sentence_spice(["the big red ball"], "the red ball")
    assert abs(got - 0.8) < 1e-9


def test_spice_identity_and_disjoint():
    from multimodal_baby_tpu.evaluation.spice import spice
    refs = [["a dog on the grass"], ["the big red ball"]]
    assert spice(refs, ["a dog on the grass", "the big red ball"]) == 1.0
    assert spice([["a dog"]], ["the cup"]) == 0.0
