"""External-oracle fixtures for the caption metrics.

Round-2 verdict: the metric reimplementations (evaluation/textgen_metrics,
meteor) were tested only on hand-computed cases. Here each family is
pinned against an independent, widely-used implementation on a realistic
50-caption fixture:

- BLEU-1..4  vs sacrebleu (smoothing off, pre-tokenized) — the same
  corpus-BLEU definition pycocoevalcap's bleu_scorer implements
  (clipped precision, closest-reference brevity penalty);
- ROUGE-L    vs Google's rouge_score (LCS F-measure; beta=1 single-ref
  mode isolates the LCS/aggregation machinery — the reference's beta=1.2
  + max-over-refs variants stay covered by the hand-computed tests);
- METEOR     vs nltk.translate.meteor_score with our scorer re-
  parameterized to nltk's original-METEOR constants (alpha=.9, beta=3,
  gamma=.5, unweighted words, unit stage weights, no wordnet). This
  validates the alignment + fragmentation + fmean machinery; the
  Meteor-1.5 parameter set we ship (and its divergence from the Java
  scorer: no paraphrase tables) is documented in evaluation/meteor.py.

CIDEr has no pure-Python oracle in this image (pycocoevalcap is not
installed); it is double-entry checked against an independent in-test
implementation written directly from Vedantam et al. 2015.
"""

import math
import random
from collections import Counter, defaultdict

import pytest

from multimodal_baby_tpu.evaluation import meteor as meteor_mod
from multimodal_baby_tpu.evaluation.textgen_metrics import (
    cider, corpus_bleu, rouge_l)

WORDS = ("the a cat dog ball baby mommy daddy car door red big little "
         "look at this that is on in with goes see you it want eat play "
         "nice green truck book milk shoe hat bird water more go up down "
         "here there").split()


def _make_corpus(n=50, seed=7):
    rng = random.Random(seed)
    refs_list, hyps = [], []
    for _ in range(n):
        base = rng.sample(WORDS, rng.randint(4, 12))
        refs = []
        for _ in range(3):
            r = list(base)
            if rng.random() < 0.7 and len(r) > 4:
                r.pop(rng.randrange(len(r)))
            if rng.random() < 0.5:
                r[rng.randrange(len(r))] = rng.choice(WORDS)
            refs.append(" ".join(r))
        h = list(base)
        if rng.random() < 0.8 and len(h) > 4:
            h[rng.randrange(len(h))] = rng.choice(WORDS)
        if rng.random() < 0.3:
            h.insert(rng.randrange(len(h)), rng.choice(WORDS))
        refs_list.append(refs)
        hyps.append(" ".join(h))
    return refs_list, hyps


REFS, HYPS = _make_corpus()


def test_bleu_matches_sacrebleu():
    sacrebleu = pytest.importorskip("sacrebleu")
    ours = corpus_bleu(REFS, HYPS)

    # sacrebleu wants refs transposed: one stream per reference slot
    streams = [[refs[k] for refs in REFS] for k in range(3)]
    metric = sacrebleu.metrics.BLEU(
        smooth_method="none", tokenize="none", force=True,
        effective_order=False)
    res = metric.corpus_score(HYPS, streams)

    # res.precisions are percentages; reconstruct cumulative BLEU-k
    bp = res.bp
    for k in range(4):
        logs = [math.log(res.precisions[i] / 100.0)
                for i in range(k + 1)]
        expected = bp * math.exp(sum(logs) / (k + 1))
        assert ours[k] == pytest.approx(expected, abs=1e-9), (
            f"BLEU-{k + 1}: ours={ours[k]} sacrebleu={expected}")


def test_rouge_l_matches_google_rouge_score():
    rs = pytest.importorskip("rouge_score.rouge_scorer")
    scorer = rs.RougeScorer(["rougeL"], use_stemmer=False)
    # single-ref, beta=1 mode isolates LCS + mean aggregation
    single_refs = [[refs[0]] for refs in REFS]
    ours = rouge_l(single_refs, HYPS, beta=1.0)
    expected = sum(
        scorer.score(refs[0], h)["rougeL"].fmeasure
        for refs, h in zip(REFS, HYPS)) / len(HYPS)
    assert ours == pytest.approx(expected, abs=1e-9)


class _NoWordnet:
    """Stub wordnet: no synonym matches (stage 3 disabled on both sides)."""

    def synsets(self, word):
        return []


def test_meteor_alignment_matches_nltk(monkeypatch):
    ms = pytest.importorskip("nltk.translate.meteor_score")
    # re-parameterize our Meteor-1.5 scorer to nltk's original-METEOR
    # constants so the alignment/penalty machinery is compared like for
    # like (unit stage weights, unweighted words)
    monkeypatch.setattr(meteor_mod, "ALPHA", 0.9)
    monkeypatch.setattr(meteor_mod, "BETA", 3.0)
    monkeypatch.setattr(meteor_mod, "GAMMA", 0.5)
    monkeypatch.setattr(meteor_mod, "DELTA", 0.5)  # content == function
    monkeypatch.setattr(meteor_mod, "STAGE_WEIGHTS", (1.0, 1.0, 1.0))
    monkeypatch.setattr(meteor_mod, "_word_weight", lambda w: 1.0)

    agree = 0
    for refs, hyp in zip(REFS[:25], HYPS[:25]):
        ref = refs[0]
        expected = ms.single_meteor_score(
            ref.split(), hyp.split(), wordnet=_NoWordnet())
        ours = meteor_mod.sentence_meteor([ref], hyp)
        # nltk aligns greedily stage-by-stage; ours maximizes matches
        # globally. On these single-stage (exact+stem) fixtures both find
        # a maximum matching in almost all cases; require exact agreement
        # on the vast majority and never a LOWER match total (our
        # objective dominates greedy).
        if ours == pytest.approx(expected, abs=1e-9):
            agree += 1
        else:
            assert ours >= expected - 1e-9, (
                f"beam alignment scored below greedy nltk: {ours} < "
                f"{expected} for hyp={hyp!r} ref={ref!r}")
    assert agree >= 22, f"only {agree}/25 sentences matched nltk exactly"


def _cider_independent(list_of_refs, hyps, n_max=4, sigma=6.0):
    """Straight-from-the-paper CIDEr (Vedantam et al. 2015), written
    independently of evaluation/textgen_metrics.cider."""
    df = [defaultdict(int) for _ in range(n_max)]

    def ngrams(toks, n):
        return Counter(tuple(toks[i:i + n]) for i in range(len(toks) - n + 1))

    for refs in list_of_refs:
        for n in range(1, n_max + 1):
            union = set()
            for r in refs:
                union |= set(ngrams(r.split(), n))
            for g in union:
                df[n - 1][g] += 1
    log_m = math.log(max(1.0, float(len(list_of_refs))))

    def vec(toks, n):
        cnt = ngrams(toks, n)
        total = max(1e-9, float(sum(cnt.values())))
        v = {g: (c / total) * max(0.0, log_m - math.log(
            max(1.0, float(df[n - 1][g])))) for g, c in cnt.items()}
        return v

    out = []
    for refs, hyp in zip(list_of_refs, hyps):
        h = hyp.split()
        per_n = []
        for n in range(1, n_max + 1):
            hv = vec(h, n)
            hnorm = math.sqrt(sum(w * w for w in hv.values()))
            acc = 0.0
            for ref in refs:
                r = ref.split()
                rv = vec(r, n)
                rnorm = math.sqrt(sum(w * w for w in rv.values()))
                num = sum(min(hv[g], rv.get(g, 0.0)) * rv.get(g, 0.0)
                          for g in hv)
                if hnorm and rnorm:
                    acc += (num / (hnorm * rnorm)) * math.exp(
                        -((len(h) - len(r)) ** 2) / (2 * sigma ** 2))
            per_n.append(10.0 * acc / len(refs))
        out.append(sum(per_n) / n_max)
    return sum(out) / len(out)


def test_cider_double_entry():
    ours = cider(REFS, HYPS)
    indep = _cider_independent(REFS, HYPS)
    assert ours == pytest.approx(indep, abs=1e-9)
    assert 0.0 < ours < 10.0
