"""SPICE scorer, pure Python (no JVM).

Reimplements the SPICE metric (Anderson et al. 2016) that the reference
reaches through pycocoevalcap's Java subprocess
(/root/reference/multimodal/textgen_eval.py:5,41): captions are parsed
into scene-graph tuples — objects, (object, attribute) pairs and
(subject, relation, object) triples — and the score is the F1 between the
candidate tuple set and the union of the reference tuple sets, averaged
over the corpus.

The Java pipeline uses the Stanford dependency parser; this image has no
JVM and no parser models, so parsing is a rule-based shallow parse driven
by a closed-class lexicon + suffix heuristics (open class defaults to
NOUN).  Child-directed SAYCam utterances and COCO captions are short,
determiner-rich declaratives ("look at the ball", "a dog on the grass"),
where this grammar recovers the same propositions a full parse would:

  objects:    every content noun (plural-stripped)
  attributes: ADJ immediately modifying a noun, and copular "N is ADJ"
  relations:  N (VERB|PREP) N within a clause, copulas excluded

Tuple matching is lemma-exact, extended with WordNet synonym sets when
the nltk wordnet data is installed locally (the Java SPICE does the same
synset matching).
"""

from __future__ import annotations

from typing import FrozenSet, List, Sequence, Set, Tuple

DETERMINERS = frozenset(
    "a an the this that these those some any no every each all both few "
    "many most much more other another such my your his her its our their "
    "what which whose".split())
PRONOUNS = frozenset(
    "i you he she it we they me him us them himself herself itself "
    "someone something anything nothing everyone everything who whom".split())
PREPOSITIONS = frozenset(
    "in on at by with of from to into onto under over above below behind "
    "beside between near around through across against along among inside "
    "outside within without upon beneath toward towards past off out up "
    "down".split())
CONJUNCTIONS = frozenset("and or but nor so yet because although while "
                         "if when where than whether".split())
COPULAS = frozenset("is are was were am be been being 's 're 'm".split())
AUXILIARIES = frozenset(
    "do does did will would shall should may might must can could have "
    "has had having not n't".split())
ADVERBS = frozenset("very really quite too also just only now then here "
                    "there always never often sometimes".split())
INTERJECTIONS = frozenset("oh wow hey yeah yes uh um hmm ooh aw look see "
                          "okay ok please thank thanks bye hi hello".split())
# High-frequency verbs that no suffix rule would catch.
COMMON_VERBS = frozenset(
    "go goes went going get gets got getting put puts putting take takes "
    "took taking make makes made making give gives gave giving want wants "
    "wanted like likes liked love loves loved eat eats ate eating play "
    "plays played playing hold holds held holding throw throws threw "
    "sit sits sat sitting stand stands stood run runs ran running come "
    "comes came coming say says said think thinks thought know knows knew "
    "find finds found read reads wear wears wore ride rides rode chase "
    "chases chased carry carries carried pull pulls push pushes drink "
    "drinks drank jump jumps jumped walk walks walked fly flies flew "
    "swim swims swam catch catches caught kick kicks kicked touch touches "
    "touched open opens opened close closes closed turn turns turned "
    "point points pointed show shows showed watch watches watched".split())
COMMON_ADJECTIVES = frozenset(
    "big little small large tiny huge red blue green yellow orange purple "
    "pink brown black white gray grey good bad nice pretty cute funny "
    "happy sad old new young hot cold warm wet dry soft hard clean dirty "
    "fast slow tall short long round empty full heavy light loud quiet "
    "hungry sleepy silly fuzzy furry shiny broken striped spotted wooden "
    "plastic".split())

try:  # synonym-aware tuple matching when wordnet data exists locally
    from nltk.corpus import wordnet as _wn
    _wn.synsets("dog")
    _HAVE_WORDNET = True
except Exception:  # pragma: no cover - image has no wordnet data
    _wn = None
    _HAVE_WORDNET = False


def _lemma(word: str) -> str:
    """Light noun/verb lemmatizer (WordNet morphy when available)."""
    if _HAVE_WORDNET:
        m = _wn.morphy(word)
        if m:
            return m
    for suf, rep in (("sses", "ss"), ("ies", "y"), ("shes", "sh"),
                     ("ches", "ch"), ("xes", "x"), ("zes", "z"),
                     ("ing", ""), ("ed", "")):
        if word.endswith(suf) and len(word) > len(suf) + 2:
            return word[:-len(suf)] + rep
    if word.endswith("s") and not word.endswith("ss") and len(word) > 3:
        return word[:-1]
    return word


def _tag(tokens: Sequence[str]) -> List[str]:
    """Shallow POS: DET/PRON/PREP/CONJ/COP/AUX/ADV/INTJ/VERB/ADJ/NOUN."""
    tags = []
    for i, w in enumerate(tokens):
        if w in DETERMINERS:
            t = "DET"
        elif w in PRONOUNS:
            t = "PRON"
        elif w in PREPOSITIONS:
            t = "PREP"
        elif w in CONJUNCTIONS:
            t = "CONJ"
        elif w in COPULAS:
            t = "COP"
        elif w in AUXILIARIES:
            t = "AUX"
        elif w in ADVERBS:
            t = "ADV"
        elif w in INTERJECTIONS and i == 0:
            t = "INTJ"
        elif w in COMMON_VERBS:
            t = "VERB"
        elif w in COMMON_ADJECTIVES:
            t = "ADJ"
        elif w.endswith("ly") and len(w) > 4:
            t = "ADV"
        elif w.endswith("ing") and len(w) > 5:
            t = "VERB"
        else:
            t = "NOUN"
        tags.append(t)
    return tags


Tuple_ = Tuple[str, ...]


def parse_tuples(sentence: str) -> Set[Tuple_]:
    """Extract scene-graph tuples from a space-tokenized caption."""
    tokens = [t for t in sentence.lower().split() if t.isalnum() or "'" in t]
    tags = _tag(tokens)
    tuples: Set[Tuple_] = set()

    nouns = [(i, _lemma(w)) for i, (w, t) in enumerate(zip(tokens, tags))
             if t == "NOUN"]
    for _, n in nouns:
        tuples.add((n,))

    # attributes: ADJ (ADJ)* NOUN, and "NOUN COP (ADV)* ADJ"
    for i, (w, t) in enumerate(zip(tokens, tags)):
        if t != "ADJ":
            continue
        j = i + 1
        while j < len(tokens) and tags[j] == "ADJ":
            j += 1
        if j < len(tokens) and tags[j] == "NOUN":
            tuples.add((_lemma(tokens[j]), w))
        k = i - 1
        while k >= 0 and tags[k] in ("ADV", "COP"):
            if tags[k] == "COP":
                k -= 1
                while k >= 0 and tags[k] == "DET":
                    k -= 1
                if k >= 0 and tags[k] == "NOUN":
                    tuples.add((_lemma(tokens[k]), w))
                break
            k -= 1

    # relations: nearest noun left / right of a VERB or PREP pivot
    for i, t in enumerate(tags):
        if t not in ("VERB", "PREP"):
            continue
        left = next((n for j, n in reversed(nouns) if j < i), None)
        right = next((n for j, n in nouns if j > i), None)
        pred = _lemma(tokens[i]) if t == "VERB" else tokens[i]
        if left and right:
            tuples.add((left, pred, right))
        elif t == "VERB" and right:
            # imperative: "throw the ball" -> (you, throw, ball)
            tuples.add(("you", pred, right))
    return tuples


def _synset_key(word: str) -> FrozenSet[str]:
    if _HAVE_WORDNET:
        syn = frozenset(s.name() for s in _wn.synsets(word))
        if syn:
            return syn
    return frozenset((word,))


def _tuples_match(a: Tuple_, b: Tuple_) -> bool:
    if len(a) != len(b):
        return False
    return all(x == y or (_synset_key(x) & _synset_key(y))
               for x, y in zip(a, b))


def _f1(cand: Set[Tuple_], ref: Set[Tuple_]) -> float:
    if not cand and not ref:
        return 1.0
    if not cand or not ref:
        return 0.0
    matched_c = sum(1 for c in cand
                    if any(_tuples_match(c, r) for r in ref))
    matched_r = sum(1 for r in ref
                    if any(_tuples_match(r, c) for c in cand))
    p = matched_c / len(cand)
    r = matched_r / len(ref)
    return 2 * p * r / (p + r) if p + r else 0.0


def sentence_spice(references: Sequence[str], hypothesis: str) -> float:
    ref_tuples: Set[Tuple_] = set()
    for ref in references:
        ref_tuples |= parse_tuples(ref)
    return _f1(parse_tuples(hypothesis), ref_tuples)


def spice(list_of_references: List[List[str]],
          hypotheses: List[str]) -> float:
    """Corpus SPICE = mean sentence F1 (pycocoevalcap contract)."""
    if not hypotheses:
        return 0.0
    return sum(sentence_spice(refs, hyp)
               for refs, hyp in zip(list_of_references, hypotheses)
               ) / len(hypotheses)
