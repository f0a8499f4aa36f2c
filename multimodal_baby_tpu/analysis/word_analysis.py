"""Word-level analyses: POS tagging, word-category grouping, rating joins.

Capability parity with the CogSci toolchain's pos_tags.py (spaCy/stanza
tagging with cache), word_categories.py (hand-curated category membership)
and word_ratings.py (external norm joins) — reimplemented around the
per-word tables produced by analysis.processing.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterable, List, Optional

# the CDI-style word categories used by the CogSci analyses
# (word_categories.py pattern: category -> member words; extend/replace via
# load_word_categories)
DEFAULT_WORD_CATEGORIES: Dict[str, List[str]] = {
    "animals": ["cat", "kitty", "dog", "doggy", "bird", "duck", "bear",
                "horse", "fish", "cow", "bunny"],
    "body_parts": ["hand", "hands", "foot", "feet", "eye", "eyes", "nose",
                   "mouth", "ear", "head", "hair", "tummy"],
    "food": ["milk", "juice", "water", "banana", "apple", "cookie",
             "bread", "cheese", "cereal", "egg"],
    "toys": ["ball", "puzzle", "block", "blocks", "book", "crayon",
             "doll", "toy", "toys"],
    "vehicles": ["car", "truck", "train", "bus", "bike", "stroller"],
    "household": ["cup", "spoon", "bowl", "chair", "table", "door",
                  "bed", "couch", "bath", "brush"],
    "people": ["mama", "mommy", "dada", "daddy", "baby", "grandma",
               "grandpa"],
    "function_words": ["the", "a", "an", "and", "of", "to", "in", "on",
                       "it", "is", "that", "this", "you", "i", "we"],
}


def load_word_categories(path=None) -> Dict[str, List[str]]:
    if path is None:
        return dict(DEFAULT_WORD_CATEGORIES)
    with open(path) as f:
        return json.load(f)


def word_to_category(categories: Dict[str, List[str]]) -> Dict[str, str]:
    return {w: c for c, words in categories.items() for w in words}


def pos_tag(words: Iterable[str], cache_path=None) -> Dict[str, str]:
    """Universal-POS tags per word via spaCy, with a JSON cache
    (pos_tags.py pattern). Falls back to a tiny closed-class lexicon when
    no spaCy model is installed."""
    words = list(dict.fromkeys(words))
    cache: Dict[str, str] = {}
    if cache_path and Path(cache_path).exists():
        cache = json.loads(Path(cache_path).read_text())
    missing = [w for w in words if w not in cache]

    if missing:
        from multimodal_baby_tpu.data.tokenizer import _get_spacy
        nlp = _get_spacy()
        if nlp is not None:
            for w in missing:
                doc = nlp(w)
                cache[w] = doc[0].pos_ if len(doc) else "X"
        else:
            closed = {
                "DET": {"the", "a", "an", "this", "that", "these"},
                "PRON": {"i", "you", "we", "it", "he", "she", "they"},
                "ADP": {"in", "on", "of", "to", "at", "with", "for"},
                "CCONJ": {"and", "or", "but"},
                "AUX": {"is", "are", "was", "were", "be", "do", "does"},
            }
            rev = {w: pos for pos, ws in closed.items() for w in ws}
            for w in missing:
                cache[w] = rev.get(w, "NOUN" if w.isalpha() else "X")

    if cache_path:
        Path(cache_path).parent.mkdir(parents=True, exist_ok=True)
        Path(cache_path).write_text(json.dumps(cache))
    return {w: cache[w] for w in words}


def per_category_summary(word_summary: "pandas.DataFrame",
                         categories: Optional[Dict[str, List[str]]] = None
                         ) -> "pandas.DataFrame":
    """Aggregate a per-word table (analysis.processing.per_word_summary) by
    word category, token-count weighted."""
    import pandas as pd

    mapping = word_to_category(categories or DEFAULT_WORD_CATEGORIES)
    df = word_summary.copy()
    df["category"] = df["token"].map(mapping).fillna("other")
    df["weighted_ce"] = df["mean_ce"] * df["count"]
    agg = (df.groupby("category")
           .agg(total_count=("count", "sum"),
                n_words=("token", "nunique"),
                weighted_ce=("weighted_ce", "sum"))
           .reset_index())
    agg["mean_ce"] = agg["weighted_ce"] / agg["total_count"]
    return agg.drop(columns=["weighted_ce"])


def join_ratings(word_summary: "pandas.DataFrame", ratings_csv,
                 word_column: str = "word") -> "pandas.DataFrame":
    """Join external word norms/ratings (word_ratings.py pattern)."""
    import pandas as pd

    ratings = pd.read_csv(ratings_csv)
    return word_summary.merge(
        ratings, left_on="token", right_on=word_column, how="left")
