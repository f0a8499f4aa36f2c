"""CogSci-toolchain processing: run (neural or n-gram) LMs over a dataset
collecting per-token losses and hidden states, then aggregate per word.

Capability parity with analysis_tools/processing.py:158-249 (per-token
losses + hidden states), sumdata.py (per-word aggregates) and
token_items_data.py (token-level records) — rebuilt as batched, jitted
passes instead of per-example loops.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.models.losses import lm_cross_entropy


def collect_token_data(
    model, variables, batches, vocab,
    collect_hidden: bool = False,
) -> Dict[str, np.ndarray]:
    """Run the LM over batches of (text, text_len), returning flat arrays
    of (token_id, position, ce_loss[, hidden]) for every non-PAD token."""

    @jax.jit
    def step(text, text_len):
        outputs, logits, _ = model.apply(
            variables, text, text_len, method="lm_forward")
        labels, logits = model.apply(
            variables, text, logits, method="lm_labels_and_logits")
        ce, mask = lm_cross_entropy(logits, labels)
        return ce, mask, labels, outputs

    token_ids: List[np.ndarray] = []
    positions: List[np.ndarray] = []
    losses: List[np.ndarray] = []
    hiddens: List[np.ndarray] = []
    for batch in batches:
        text = jnp.asarray(batch["text"])
        text_len = jnp.asarray(batch["text_len"])
        ce, mask, labels, outputs = step(text, text_len)
        ce, mask, labels = map(np.asarray, (ce, mask, labels))
        idx = np.nonzero(mask)
        token_ids.append(labels[idx])
        positions.append(idx[1])
        losses.append(ce[idx])
        if collect_hidden:
            out = np.asarray(outputs)
            # hidden state at the step predicting this token
            hiddens.append(out[idx[0], idx[1]])

    result = {
        "token_id": np.concatenate(token_ids),
        "position": np.concatenate(positions),
        "ce_loss": np.concatenate(losses),
    }
    if collect_hidden:
        result["hidden"] = np.concatenate(hiddens)
    result["token"] = np.asarray(
        [vocab.idx2word[int(t)] for t in result["token_id"]])
    return result


def per_word_summary(token_data: Dict[str, np.ndarray]
                     ) -> "pandas.DataFrame":
    """Per-word mean loss / frequency table (sumdata.py contract)."""
    import pandas as pd

    df = pd.DataFrame({
        "token": token_data["token"],
        "ce_loss": token_data["ce_loss"],
        "position": token_data["position"],
    })
    return (df.groupby("token")
            .agg(mean_ce=("ce_loss", "mean"),
                 count=("ce_loss", "size"),
                 mean_position=("position", "mean"))
            .reset_index()
            .sort_values("count", ascending=False))


def mean_hidden_per_word(token_data: Dict[str, np.ndarray],
                         min_count: int = 1) -> Dict[str, np.ndarray]:
    """Mean hidden state per word — the representation fed to RSA /
    clustering analyses (analysis_tools/processing.py + plotting.py)."""
    assert "hidden" in token_data, "collect_hidden=True required"
    words, inv = np.unique(token_data["token"], return_inverse=True)
    dim = token_data["hidden"].shape[1]
    sums = np.zeros((len(words), dim), np.float64)
    counts = np.zeros(len(words), np.int64)
    np.add.at(sums, inv, token_data["hidden"])
    np.add.at(counts, inv, 1)
    keep = counts >= min_count
    return {"words": words[keep],
            "mean_hidden": (sums[keep] / counts[keep, None]).astype(
                np.float32),
            "counts": counts[keep]}


def sentence_batches(utterances, vocab, batch_size: int = 64,
                     max_len: int = 25):
    """Sentence-only batches for LM analyses
    (analysis_tools/sentences_data.py): <sos> tokens <eos>, padded to
    ``max_len``; yields {"text": [B, L] int32, "text_len": [B]} dicts
    consumable by collect_token_data."""
    from multimodal_baby_tpu.core.constants import (
        EOS_TOKEN_ID, PAD_TOKEN_ID, SOS_TOKEN_ID)

    utterances = list(utterances)
    for s in range(0, len(utterances), batch_size):
        chunk = utterances[s:s + batch_size]
        ids = np.full((len(chunk), max_len), PAD_TOKEN_ID, np.int32)
        lens = np.zeros((len(chunk),), np.int32)
        for i, utt in enumerate(chunk):
            toks = [SOS_TOKEN_ID] + [
                vocab.get(w) for w in utt.split()] + [EOS_TOKEN_ID]
            toks = toks[:max_len]
            ids[i, :len(toks)] = toks
            lens[i] = len(toks)
        yield {"text": ids, "text_len": lens}


def build_data(overrides: Optional[dict] = None, deterministic: bool = True):
    """Deterministic DataModule builder for analyses
    (analysis_tools/build_data.py): augmentation and random frame
    sampling off, sos/eos included in eval labels, so repeated passes see
    identical batches. ``overrides`` patch DataConfig fields."""
    from multimodal_baby_tpu.core.config import DataConfig
    from multimodal_baby_tpu.data.modules import DataModule

    cfg = DataConfig()
    for k, v in (overrides or {}).items():
        setattr(cfg, k, v)
    if deterministic:
        cfg.augment_frames = False
        cfg.multiple_frames = False
        cfg.eval_include_sos_eos = True
    return DataModule(cfg).setup()
