"""Measure and print the textgen-metric fidelity table (TEXTGEN_FIDELITY.md).

Runs every caption-metric family against the best external
implementation this image carries, on the 50-caption oracle corpus from
tests/test_textgen_oracles.py extended to 60, plus the 55-caption
hand-verified SPICE fixture. CPU-only; JVM-based pycocoevalcap scorers
(Meteor-1.5 jar, Stanford SPICE) are unavailable offline — their
divergence envelope is what this table documents.

    PYTHONPATH=. python scripts/textgen_fidelity.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_baby_tpu.evaluation import meteor as meteor_mod  # noqa: E402
from multimodal_baby_tpu.evaluation.spice import parse_tuples  # noqa: E402
from multimodal_baby_tpu.evaluation.textgen_metrics import (  # noqa: E402
    corpus_bleu, rouge_l)


def main():
    from tests.test_spice_fixture import FIXTURE as SPICE_FIXTURE
    from tests.test_textgen_oracles import _NoWordnet, _make_corpus

    refs_list, hyps = _make_corpus(n=60, seed=7)
    rows = []

    import sacrebleu
    ours = corpus_bleu(refs_list, hyps)
    sb = sacrebleu.corpus_bleu(
        hyps, list(map(list, zip(*refs_list))),
        smooth_method="none", tokenize="none", force=True)
    # corpus_bleu returns BLEU-1..4 with brevity penalty folded in, as
    # pycocoevalcap does; sacrebleu's .score is BLEU-4 x 100
    rows.append(("BLEU-4", "sacrebleu 2.6", f"{ours[3] * 100:.6f}",
                 f"{sb.score:.6f}", f"{abs(ours[3] * 100 - sb.score):.2e}"))

    from rouge_score import rouge_scorer
    rs = rouge_scorer.RougeScorer(["rougeL"])
    single_refs = [[r[0]] for r in refs_list]
    ours_r = rouge_l(single_refs, hyps, beta=1.0)
    ext = sum(rs.score(r[0], h)["rougeL"].fmeasure
              for r, h in zip(refs_list, hyps)) / len(hyps)
    rows.append(("ROUGE-L (beta=1, 1st ref)", "rouge_score",
                 f"{ours_r:.6f}", f"{ext:.6f}", f"{abs(ours_r - ext):.2e}"))

    from nltk.translate import meteor_score as ms
    # like-for-like: our scorer at nltk's original-METEOR constants
    saved = (meteor_mod.ALPHA, meteor_mod.BETA, meteor_mod.GAMMA,
             meteor_mod.DELTA, meteor_mod.STAGE_WEIGHTS,
             meteor_mod._word_weight)
    meteor_mod.ALPHA, meteor_mod.BETA = 0.9, 3.0
    meteor_mod.GAMMA, meteor_mod.DELTA = 0.5, 0.5
    meteor_mod.STAGE_WEIGHTS = (1.0, 1.0, 1.0)
    meteor_mod._word_weight = lambda w: 1.0
    exact = 0
    max_d = 0.0
    deltas = []
    for refs, hyp in zip(refs_list, hyps):
        e = ms.single_meteor_score(refs[0].split(), hyp.split(),
                                   wordnet=_NoWordnet())
        o = meteor_mod.sentence_meteor([refs[0]], hyp)
        d = abs(o - e)
        deltas.append(d)
        exact += d < 1e-9
        max_d = max(max_d, d)
    (meteor_mod.ALPHA, meteor_mod.BETA, meteor_mod.GAMMA, meteor_mod.DELTA,
     meteor_mod.STAGE_WEIGHTS, meteor_mod._word_weight) = saved
    rows.append(("METEOR (nltk params)", "nltk 3.x",
                 f"{exact}/{len(hyps)} exact",
                 f"mean|d| {sum(deltas) / len(deltas):.4f}",
                 f"max|d| {max_d:.4f}"))

    spice_exact = sum(parse_tuples(c) == t for c, t in SPICE_FIXTURE)
    rows.append(("SPICE tuple extraction", "hand-derived (paper grammar)",
                 f"{spice_exact}/{len(SPICE_FIXTURE)} captions exact",
                 "-", "-"))

    print(f"| metric | oracle | ours | oracle value | delta |")
    print("|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(r) + " |")


if __name__ == "__main__":
    main()
