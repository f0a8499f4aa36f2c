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
# METEOR paraphrase stage (table-driven, like the Java scorer's
# data/paraphrase-en; inactive without a loaded table)
# ---------------------------------------------------------------------------

def test_meteor_paraphrase_table_parsing(tmp_path):
    import gzip
    from multimodal_baby_tpu.evaluation.meteor import ParaphraseTable

    plain = tmp_path / "para.txt"
    plain.write_text("wuggled ||| glorped\n"
                     "# comment line\n"
                     "on top of\tatop\n"
                     "same ||| same\n")          # identity pairs dropped
    t = ParaphraseTable.from_file(str(plain))
    assert t.equivalents(("wuggled",)) == {("glorped",)}
    assert t.equivalents(("glorped",)) == {("wuggled",)}   # symmetric
    assert t.equivalents(("atop",)) == {("on", "top", "of")}
    assert t.equivalents(("same",)) == frozenset()
    assert t.max_len == 3

    gz = tmp_path / "para.gz"
    with gzip.open(gz, "wt", encoding="utf-8") as f:
        f.write("a b ||| c\n")
    tg = ParaphraseTable.from_file(str(gz))
    assert tg.equivalents(("c",)) == {("a", "b")}


def test_meteor_paraphrase_env_file_live(tmp_path, monkeypatch):
    """The MMB_METEOR_PARAPHRASE file hook end-to-end (the path the
    reconstructed-subset live run uses, scripts/meteor_paraphrase_live.py):
    a Meteor-1.5-format table on disk activates the stage, raises
    paraphrase-rich scores, and leaves paraphrase-free pairs unchanged."""
    from multimodal_baby_tpu.evaluation import meteor as M

    M.load_paraphrase_table(None)
    refs, hyp = ["the baby sits on the sofa"], "the infant sits on the couch"
    ctl_refs, ctl_hyp = ["the ball is red"], "the ball is red"
    base = M.sentence_meteor(refs, hyp)
    ctl = M.sentence_meteor(ctl_refs, ctl_hyp)

    table = tmp_path / "subset.txt"
    table.write_text("couch ||| sofa\ninfant ||| baby\n")
    monkeypatch.setenv("MMB_METEOR_PARAPHRASE", str(table))
    try:
        M._PARAPHRASES = None
        M._PARA_ENV_CHECKED = False
        assert len(M._paraphrases()) == 4      # 2 pairs, symmetric
        assert M.sentence_meteor(refs, hyp) > base
        assert abs(M.sentence_meteor(ctl_refs, ctl_hyp) - ctl) < 1e-12
    finally:
        M.load_paraphrase_table(None)


def test_meteor_paraphrase_stage_hand_computed():
    from multimodal_baby_tpu.evaluation import meteor as M

    # Made-up verbs: no exact/stem/synonym match possible, so the pair
    # can only align through the paraphrase stage.
    refs, hyp = ["the blicket glorped"], "the blicket wuggled"
    base = M.sentence_meteor(refs, hyp)
    try:
        M.load_paraphrase_table(
            M.ParaphraseTable([(["wuggled"], ["glorped"])]))
        para = M.sentence_meteor(refs, hyp)
    finally:
        M.load_paraphrase_table(None)

    # without table: the(func .25) + blicket(content .75) matched exactly
    p = r = 1.0 / 1.75
    fmean = p * r / (0.85 * p + 0.15 * r)
    assert abs(base - fmean * (1 - 0.6 * (1 / 2) ** 0.2)) < 1e-9
    # with table: + paraphrase match, stage weight .6, content word .75
    m = 1.45 / 1.75
    fmean = m  # P == R
    assert abs(para - fmean * (1 - 0.6 * (1 / 3) ** 0.2)) < 1e-9
    assert para > base
    # clearing the table restores the three-stage score exactly
    assert abs(M.sentence_meteor(refs, hyp) - base) < 1e-12


def test_meteor_paraphrase_multiword_span():
    from multimodal_baby_tpu.evaluation import meteor as M

    try:
        M.load_paraphrase_table(
            M.ParaphraseTable([(["on", "top", "of"], ["atop"])]))
        matches = M._align("the box sat on top of the shelf".split(),
                           "the box sat atop the shelf".split())
        # the 3-word hyp span aligns to the 1-word ref span on stage 3
        assert (3, 3, 3, 1, 3) in matches
        # span-aware chunk counting: the whole alignment is one
        # monotone contiguous run
        assert M._count_chunks([m[:4] for m in matches]) == 1
        with_table = M.sentence_meteor(["the box sat atop the shelf"],
                                       "the box sat on top of the shelf")
    finally:
        M.load_paraphrase_table(None)
    without = M.sentence_meteor(["the box sat atop the shelf"],
                                "the box sat on top of the shelf")
    assert with_table > without


def test_meteor_paraphrase_env_var(tmp_path, monkeypatch):
    from multimodal_baby_tpu.evaluation import meteor as M

    path = tmp_path / "para.txt"
    path.write_text("wuggled ||| glorped\n")
    monkeypatch.setenv("MMB_METEOR_PARAPHRASE", str(path))
    monkeypatch.setattr(M, "_PARAPHRASES", None)
    monkeypatch.setattr(M, "_PARA_ENV_CHECKED", False)
    para = M.sentence_meteor(["the blicket glorped"], "the blicket wuggled")
    monkeypatch.setattr(M, "_PARAPHRASES", None)
    monkeypatch.setattr(M, "_PARA_ENV_CHECKED", True)
    base = M.sentence_meteor(["the blicket glorped"], "the blicket wuggled")
    assert para > base


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
