"""METEOR scorer, pure Python (no JVM).

Reimplements the Meteor 1.5 scoring algorithm (Denkowski & Lavie 2014) that
the reference reaches through pycocoevalcap's Java subprocess
(/root/reference/multimodal/textgen_eval.py:2,40).  Stages:

  1. exact    — surface-form identity                        (weight 1.0)
  2. stem     — Porter-stemmed identity                      (weight 0.6)
  3. synonym  — WordNet synset overlap, only if nltk wordnet
                data is installed locally                    (weight 0.8)

The Java paraphrase stage needs Meteor's paraphrase tables (not shipped
anywhere in this image) and is omitted; with child-directed SAYCam
utterances and COCO captions the exact+stem stages dominate alignments.

Scoring follows the Meteor 1.5 English task parameters:
  alpha=0.85 (P/R harmonic weight), beta=0.2 (frag exponent),
  gamma=0.6 (penalty weight), delta=0.75 (content vs function word weight)

  P     = weighted matched hyp words / weighted hyp length
  R     = weighted matched ref words / weighted ref length
  Fmean = P*R / (alpha*P + (1-alpha)*R)
  Pen   = gamma * (chunks / avg_matches) ** beta
  score = Fmean * (1 - Pen)

where word weights are delta for content words and (1-delta) for function
words, and module weights scale each matched pair.  The alignment is a
beam search over per-hypothesis-word candidates that maximizes weighted
match total, then minimizes the number of chunks (contiguous runs matched
monotonically in both sentences) — the same objective Meteor's Aligner
optimizes.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from nltk.stem.porter import PorterStemmer

ALPHA = 0.85
BETA = 0.2
GAMMA = 0.6
DELTA = 0.75

STAGE_WEIGHTS = (1.0, 0.6, 0.8)  # exact, stem, synonym

# Meteor ships a function-word list built from common-word frequency; this
# is the standard English closed-class inventory (articles, pronouns,
# prepositions, conjunctions, auxiliaries, particles).
FUNCTION_WORDS = frozenset("""
a an the this that these those some any each every no all both few many
most other such what which who whom whose i you he she it we they me him
her us them my your his its our their mine yours hers ours theirs myself
yourself himself herself itself ourselves yourselves themselves
and or but nor so yet for because although though while if unless until
when whenever where wherever after before since as than whether
in on at by with from to of about above across against along among around
behind below beneath beside between beyond down during except inside into
near off onto out outside over past through toward towards under
underneath up upon within without
am is are was were be been being do does did doing have has had having
will would shall should may might must can could
not n't 's 'm 're 've 'll 'd there here then now just only also very too
""".split())

_STEMMER = PorterStemmer()

try:  # synonym stage only when wordnet data is locally installed
    from nltk.corpus import wordnet as _wn
    _wn.synsets("dog")
    _HAVE_WORDNET = True
except Exception:  # pragma: no cover - image has no wordnet data
    _wn = None
    _HAVE_WORDNET = False


def _synsets(word: str) -> frozenset:
    if not _HAVE_WORDNET:
        return frozenset()
    return frozenset(s.name() for s in _wn.synsets(word))


def _match_stage(h: str, r: str, h_stem: str, r_stem: str,
                 h_syn: frozenset, r_syn: frozenset) -> int:
    """Lowest stage index on which h and r match, or -1."""
    if h == r:
        return 0
    if h_stem == r_stem:
        return 1
    if h_syn and (h_syn & r_syn):
        return 2
    return -1


def _count_chunks(pairs: Sequence[Tuple[int, int]]) -> int:
    """Chunks = maximal runs contiguous and monotone in both sentences."""
    if not pairs:
        return 0
    ordered = sorted(pairs)
    chunks = 1
    for (h0, r0), (h1, r1) in zip(ordered, ordered[1:]):
        if h1 != h0 + 1 or r1 != r0 + 1:
            chunks += 1
    return chunks


def _align(hyp: List[str], ref: List[str],
           beam: int = 40) -> List[Tuple[int, int, int]]:
    """Return matched (hyp_idx, ref_idx, stage) triples.

    Beam search over hypothesis words: each step either leaves the word
    unmatched or matches it to a free reference word on some stage.
    States are ranked by (weighted match total, -chunks-so-far), mirroring
    Meteor's max-matches / min-chunks objective.
    """
    h_stems = [_STEMMER.stem(w) for w in hyp]
    r_stems = [_STEMMER.stem(w) for w in ref]
    h_syns = [_synsets(w) for w in hyp] if _HAVE_WORDNET else [frozenset()] * len(hyp)
    r_syns = [_synsets(w) for w in ref] if _HAVE_WORDNET else [frozenset()] * len(ref)

    candidates: List[List[Tuple[int, int]]] = []
    for i, hw in enumerate(hyp):
        opts = []
        for j, rw in enumerate(ref):
            st = _match_stage(hw, rw, h_stems[i], r_stems[j],
                              h_syns[i], r_syns[j])
            if st >= 0:
                opts.append((j, st))
        candidates.append(opts)

    # state: (used_ref_frozenset, pairs_tuple) scored lazily
    states: List[Tuple[float, List[Tuple[int, int, int]]]] = [(0.0, [])]
    for i, opts in enumerate(candidates):
        if not opts:
            continue
        nxt: Dict[frozenset, Tuple[float, List[Tuple[int, int, int]]]] = {}

        def consider(score: float, pairs: List[Tuple[int, int, int]]):
            key = frozenset(j for _, j, _ in pairs)
            cur = nxt.get(key)
            if cur is None or score > cur[0]:
                nxt[key] = (score, pairs)

        for score, pairs in states:
            consider(score, pairs)  # leave word i unmatched
            used = {j for _, j, _ in pairs}
            for j, st in opts:
                if j in used:
                    continue
                new_pairs = pairs + [(i, j, st)]
                w = STAGE_WEIGHTS[st]
                # chunk economy as a small tie-break inside the score
                ch = _count_chunks([(a, b) for a, b, _ in new_pairs])
                consider(score + w - 1e-4 * ch + 1e-4, new_pairs)
        states = sorted(nxt.values(), key=lambda s: -s[0])[:beam]
        if not states:
            states = [(0.0, [])]

    # final selection: most (unweighted) matches, then max weighted,
    # then min chunks — Meteor resolves ties the same way.
    def rank(state):
        _, pairs = state
        wsum = sum(STAGE_WEIGHTS[st] for _, _, st in pairs)
        ch = _count_chunks([(a, b) for a, b, _ in pairs])
        return (len(pairs), wsum, -ch)

    return max(states, key=rank)[1] if states else []


def _word_weight(word: str) -> float:
    return (1.0 - DELTA) if word in FUNCTION_WORDS else DELTA


class _Stats:
    """Meteor sufficient statistics for one (hyp, ref) alignment."""

    __slots__ = ("m_h", "m_r", "len_h", "len_r", "chunks", "matches")

    def __init__(self, m_h=0.0, m_r=0.0, len_h=0.0, len_r=0.0,
                 chunks=0, matches=0):
        self.m_h, self.m_r = m_h, m_r
        self.len_h, self.len_r = len_h, len_r
        self.chunks, self.matches = chunks, matches

    def score(self) -> float:
        p = self.m_h / self.len_h if self.len_h else 0.0
        r = self.m_r / self.len_r if self.len_r else 0.0
        if p + r == 0:
            return 0.0
        fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
        frag = self.chunks / self.matches if self.matches else 0.0
        return fmean * (1.0 - GAMMA * frag ** BETA)

    def add(self, other: "_Stats") -> None:
        self.m_h += other.m_h
        self.m_r += other.m_r
        self.len_h += other.len_h
        self.len_r += other.len_r
        self.chunks += other.chunks
        self.matches += other.matches


def _sentence_stats(references: Sequence[str],
                    hypothesis: str) -> Optional[_Stats]:
    """Stats against the best-scoring reference (Meteor picks the ref
    maximizing the sentence score, then contributes its stats)."""
    hyp = hypothesis.lower().split()
    if not hyp:
        return None
    best: Optional[_Stats] = None
    for reference in references:
        ref = reference.lower().split()
        if not ref:
            continue
        pairs = _align(hyp, ref)
        st = _Stats(
            m_h=sum(STAGE_WEIGHTS[s] * _word_weight(hyp[i])
                    for i, _, s in pairs),
            m_r=sum(STAGE_WEIGHTS[s] * _word_weight(ref[j])
                    for _, j, s in pairs),
            len_h=sum(_word_weight(w) for w in hyp),
            len_r=sum(_word_weight(w) for w in ref),
            chunks=_count_chunks([(i, j) for i, j, _ in pairs]),
            matches=len(pairs))
        if best is None or st.score() > best.score():
            best = st
    return best


def sentence_meteor(references: Sequence[str], hypothesis: str) -> float:
    """Meteor 1.5 sentence score: best reference."""
    stats = _sentence_stats(references, hypothesis)
    return stats.score() if stats is not None else 0.0


def meteor(list_of_references: List[List[str]],
           hypotheses: List[str]) -> float:
    """Corpus METEOR: aggregate sufficient statistics over the test set,
    then score the aggregate — the Java scorer's micro-average, which is
    what pycocoevalcap reports as the corpus number."""
    total = _Stats()
    for refs, hyp in zip(list_of_references, hypotheses):
        st = _sentence_stats(refs, hyp)
        if st is not None:
            total.add(st)
    return total.score()
