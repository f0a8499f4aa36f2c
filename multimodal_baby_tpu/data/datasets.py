"""Datasets over the reference's JSON-metadata format.

Data contract (interchangeable with the reference's prepared data):
- training metadata: ``{"data": [{"utterance": str, "frame_filenames"
  or "frame_filename": ..., ...}]}``
  (reference: multimodal_saycam_data_module.py:77-211)
- eval trials: ``{"data": [{"target_img_filename": str,
  "foil_img_filenames": [str], "target_category": str,
  "foil_categories": [str]}]}`` (multimodal_data_module.py:112-214)
- vocab.json: word -> id.

Image decode happens on the host (PIL / the native C pipeline in
``data.native``); normalization + augmentation run on-device as jitted ops
(``data.augment``) so the host only ships uint8 — 4x less PCIe/host traffic
than the reference's float pipeline.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from multimodal_baby_tpu.core.constants import (
    EOS_TOKEN_ID, IMAGE_H, IMAGE_W, MAX_LEN_UTTERANCE, PAD_TOKEN_ID,
    SOS_TOKEN_ID)
from multimodal_baby_tpu.data.tokenizer import Tokenizer
from multimodal_baby_tpu.data.vocab import Vocab


def load_metadata(path) -> List[dict]:
    with open(path) as f:
        return json.load(f)["data"]


def _load_image_uint8(path: str, size: int = IMAGE_H) -> np.ndarray:
    """Decode to [H, W, 3] uint8 (resized if needed). Uses the native C++
    pipeline (data.native) when built; PIL otherwise."""
    from multimodal_baby_tpu.data import native
    out = native.decode_image(path, size)
    if out is not None:
        return out
    from PIL import Image
    img = Image.open(path).convert("RGB")
    if img.size != (size, size):
        img = img.resize((size, size), Image.BICUBIC)
    return np.asarray(img, np.uint8)


class PairedImageTextDataset:
    """(image, utterance) pairs for contrastive / LM training.

    Mirrors MultiModalSAYCamDataset semantics
    (multimodal_saycam_data_module.py:77-124): per-utterance random frame
    sampling when ``multiple_frames``, <sos>/<eos> wrapping, UNK fallback,
    and the ``shuffle_utterances`` ablation (pairing broken with a fixed
    permutation).
    """

    def __init__(
        self,
        data: List[dict],
        vocab: Vocab,
        multiple_frames: bool = False,
        shuffle_utterances: bool = False,
        max_len: int = MAX_LEN_UTTERANCE,
        seed: int = 0,
    ):
        self.data = data
        self.tokenizer = Tokenizer(vocab, max_len)
        self.multiple_frames = multiple_frames
        self.max_len = max_len
        self.rng = np.random.RandomState(seed)
        self.utterance_order = np.arange(len(data))
        if shuffle_utterances:
            self.utterance_order = np.random.RandomState(
                seed).permutation(len(data))

    def __len__(self) -> int:
        return len(self.data)

    def frame_filename(self, entry: dict) -> str:
        if "frame_filenames" in entry:
            names = entry["frame_filenames"]
            if self.multiple_frames:
                return names[self.rng.randint(len(names))]
            return names[0]
        return entry["frame_filename"]

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray, int, str]:
        img_entry = self.data[idx]
        txt_entry = self.data[self.utterance_order[idx]]
        img = _load_image_uint8(self.frame_filename(img_entry))
        utterance = txt_entry["utterance"]
        ids, length = self.tokenizer.encode_utterance(utterance)
        return img, ids, length, utterance

    def batch_items(self, idxs) -> Dict[str, np.ndarray]:
        """Whole-batch fast path used by DataLoader: decodes every frame
        of the batch in ONE native decode_batch call (C++ thread pool, no
        GIL) and tokenizes in a tight loop. Returns the collated batch
        dict directly. Falls back to per-item loading when the native
        library isn't built."""
        from multimodal_baby_tpu.data import native
        paths = [self.frame_filename(self.data[int(j)]) for j in idxs]
        decoded = native.decode_batch_checked(paths, IMAGE_H)
        if decoded is None:
            from multimodal_baby_tpu.data.loader import collate
            return collate([self[int(j)] for j in idxs])
        imgs, ok = decoded
        if not ok.all():
            # slots the C++ decoder couldn't handle (corrupt file, or a
            # format outside its JPEG/PNG sniffing) go through the PIL
            # fallback instead of silently becoming black frames; a file
            # neither decoder reads still raises loudly there
            import warnings
            failed = np.flatnonzero(ok == 0)
            warnings.warn(
                f"native decode failed for {len(failed)} of "
                f"{len(paths)} frames (e.g. {paths[failed[0]]}); "
                "falling back to PIL for those slots")
            for i in failed:
                imgs[i] = _load_image_uint8(paths[int(i)], IMAGE_H)
        n = len(idxs)
        text = np.empty((n, self.max_len), np.int32)
        lens = np.empty((n,), np.int32)
        raws = []
        for i, j in enumerate(idxs):
            utterance = self.data[self.utterance_order[int(j)]]["utterance"]
            ids, length = self.tokenizer.encode_utterance(utterance)
            text[i] = ids
            lens[i] = length
            raws.append(utterance)
        return {"image_u8": imgs, "text": text, "text_len": lens,
                "raw": raws}


class SyntheticPairedDataset:
    """Deterministic synthetic pairs for benchmarks / smoke tests: no disk,
    no decode — isolates device throughput."""

    def __init__(self, size: int, vocab_size: int,
                 max_len: int = MAX_LEN_UTTERANCE, seed: int = 0,
                 image_size: int = IMAGE_H):
        rng = np.random.RandomState(seed)
        self.images = rng.randint(
            0, 256, (size, image_size, image_size, 3), np.uint8)
        lens = rng.randint(1, max_len - 1, size)
        self.text = np.zeros((size, max_len), np.int32)
        self.text[:, 0] = SOS_TOKEN_ID
        for i, n in enumerate(lens):
            self.text[i, 1:1 + n] = rng.randint(4, vocab_size, n)
            self.text[i, 1 + n] = EOS_TOKEN_ID
        self.text_len = (lens + 2).astype(np.int32)

    def __len__(self):
        return self.images.shape[0]

    def __getitem__(self, idx):
        return (self.images[idx], self.text[idx],
                int(self.text_len[idx]), "")


class EvalTrialDataset:
    """4-way forced-choice trials, image mode: one label, target + N foil
    images, target always index 0 (multimodal_data_module.py:112-161)."""

    def __init__(self, data: List[dict], vocab: Vocab,
                 eval_include_sos_eos: bool = False):
        self.data = data
        self.vocab = vocab
        self.eval_include_sos_eos = eval_include_sos_eos

    def __len__(self):
        return len(self.data)

    def n_imgs(self) -> int:
        return len(self.data[0]["foil_img_filenames"]) + 1

    def __getitem__(self, idx):
        trial = self.data[idx]
        filenames = [trial["target_img_filename"]] + \
            list(trial["foil_img_filenames"])
        imgs = np.stack([_load_image_uint8(f) for f in filenames])
        label = [self.vocab[trial["target_category"]]]
        if self.eval_include_sos_eos:
            label = [SOS_TOKEN_ID] + label + [EOS_TOKEN_ID]
        label_len = len(label)
        ids = np.full((MAX_LEN_UTTERANCE,), PAD_TOKEN_ID, np.int32)
        ids[:label_len] = label
        return imgs, ids, label_len, trial["target_category"]


class TextEvalTrialDataset:
    """Text mode: one image, target + foil labels
    (multimodal_data_module.py:163-214)."""

    def __init__(self, data: List[dict], vocab: Vocab,
                 eval_include_sos_eos: bool = False):
        self.data = data
        self.vocab = vocab
        self.eval_include_sos_eos = eval_include_sos_eos

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        trial = self.data[idx]
        img = _load_image_uint8(trial["target_img_filename"])
        raw_labels = [trial["target_category"]] + \
            list(trial["foil_categories"])
        ids = np.full((len(raw_labels), MAX_LEN_UTTERANCE),
                      PAD_TOKEN_ID, np.int32)
        lens = np.zeros((len(raw_labels),), np.int32)
        for i, lab in enumerate(raw_labels):
            label = [self.vocab[lab]]
            if self.eval_include_sos_eos:
                label = [SOS_TOKEN_ID] + label + [EOS_TOKEN_ID]
            ids[i, :len(label)] = label
            lens[i] = len(label)
        return img, ids, lens, trial["target_category"]
