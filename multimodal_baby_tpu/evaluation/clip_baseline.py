"""CLIP baseline for the forced-choice evals.

The reference compares CVCL against OpenAI CLIP (ViT-L/14 in eval.py:29-47,
ViT-B/16 for eval-frame filtering) through the ``clip`` package. Here the
baseline rides HuggingFace ``transformers`` CLIP (torch CPU — it's an eval
baseline, not a training path) wrapped in an adapter exposing the same
scoring interface as the jax harness.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from multimodal_baby_tpu.core.constants import CLIP_MEAN, CLIP_STD


class CLIPBaseline:
    """Adapter: score_image_trial / score_text_trial matching the
    forced-choice contract (target first, argmax over K)."""

    def __init__(self, model=None, processor_name: Optional[str] = None,
                 model_name: str = "openai/clip-vit-large-patch14",
                 load_tokenizer: bool = True):
        import torch

        self.torch = torch
        if model is None:
            from transformers import CLIPModel
            model = CLIPModel.from_pretrained(model_name)
        self.model = model.eval()
        self.tokenizer = None
        if load_tokenizer:
            # requires the tokenizer files locally or network access
            from transformers import CLIPTokenizerFast
            self.tokenizer = CLIPTokenizerFast.from_pretrained(
                processor_name or model_name)

    # ---- encoding ----

    def preprocess(self, images_u8: np.ndarray) -> "torch.Tensor":
        """uint8 NHWC -> CLIP-normalized NCHW float, resized to the model's
        input size (reference transforms: multimodal_data_module.py:256-267)."""
        torch = self.torch
        size = self.model.config.vision_config.image_size
        x = torch.tensor(images_u8).permute(0, 3, 1, 2).float() / 255.0
        if x.shape[-1] != size:
            x = torch.nn.functional.interpolate(
                x, (size, size), mode="bicubic", align_corners=False)
        mean = torch.tensor(CLIP_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(CLIP_STD).view(1, 3, 1, 1)
        return (x - mean) / std

    def encode_image(self, images_u8: np.ndarray) -> np.ndarray:
        with self.torch.no_grad():
            f = self.model.get_image_features(
                pixel_values=self.preprocess(images_u8))
            f = f / f.norm(dim=-1, keepdim=True)
        return f.numpy()

    def encode_text(self, texts: List[str]) -> np.ndarray:
        assert self.tokenizer is not None, "no tokenizer available"
        toks = self.tokenizer(texts, padding=True, return_tensors="pt")
        with self.torch.no_grad():
            f = self.model.get_text_features(**toks)
            f = f / f.norm(dim=-1, keepdim=True)
        return f.numpy()

    # ---- forced choice ----

    def score_image_trials(self, trial_images_u8: np.ndarray,
                           labels: List[str]) -> np.ndarray:
        """[N, K, H, W, 3] uint8 + N label strings -> logits [N, K]."""
        n, k = trial_images_u8.shape[:2]
        img = self.encode_image(
            trial_images_u8.reshape((-1,) + trial_images_u8.shape[2:]))
        txt = self.encode_text(labels)
        img = img.reshape(n, k, -1)
        return np.einsum("nkd,nd->nk", img, txt)


def run_clip_forced_choice(baseline: CLIPBaseline, dataset,
                           batch_size: int = 16):
    """Forced-choice accuracy for a CLIP baseline over an EvalTrialDataset
    (reference: eval.py clip_eval branch)."""
    correct = []
    records = []
    for start in range(0, len(dataset), batch_size):
        items = [dataset[i] for i in
                 range(start, min(start + batch_size, len(dataset)))]
        imgs = np.stack([it[0] for it in items])
        labels = [f"a photo of a {it[3]}" for it in items]
        logits = baseline.score_image_trials(imgs, labels)
        preds = logits.argmax(-1)
        for j, it in enumerate(items):
            ok = bool(preds[j] == 0)
            correct.append(ok)
            records.append({"pred": int(preds[j]), "correct": ok,
                            "category": it[3]})
    return float(np.mean(correct)), records
