"""Corpus descriptive statistics (analysis_cvcl/descriptives.py parity):
utterance/token counts, length distributions, vocabulary coverage."""

from __future__ import annotations

from collections import Counter
from typing import Dict, Iterable, List


def corpus_stats(utterances: Iterable[str]) -> Dict[str, float]:
    lengths: List[int] = []
    counter: Counter = Counter()
    for utt in utterances:
        toks = utt.split()
        lengths.append(len(toks))
        counter.update(toks)
    n_utts = len(lengths)
    n_tokens = sum(lengths)
    return {
        "n_utterances": n_utts,
        "n_tokens": n_tokens,
        "n_types": len(counter),
        "mean_utterance_length": n_tokens / max(1, n_utts),
        "max_utterance_length": max(lengths) if lengths else 0,
        "type_token_ratio": len(counter) / max(1, n_tokens),
        "top_tokens": counter.most_common(20),
    }


def length_distribution(utterances: Iterable[str]) -> Counter:
    c: Counter = Counter()
    for utt in utterances:
        c[len(utt.split())] += 1
    return c


def frequency_table(utterances: Iterable[str]) -> "pandas.DataFrame":
    import numpy as np
    import pandas as pd

    counter: Counter = Counter()
    for utt in utterances:
        counter.update(utt.split())
    df = pd.DataFrame(counter.most_common(), columns=["token", "count"])
    df["rank"] = np.arange(1, len(df) + 1)
    return df
