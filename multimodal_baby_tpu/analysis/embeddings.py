"""Joint-embedding analyses: category embeddings, image-text alignment,
2-D visualization coordinates.

Capability parity with analysis_cvcl/embeddings.py (t-SNE of joint image/
text embeddings per eval category) and analysis_cvcl/alignment.py
(image-text cosine alignment table, the
joint_embeddings_with_eval_sims CSV contract).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.data.augment import normalize_image


def extract_joint_embeddings(
    model, variables, eval_dataset, batch_size: int = 64,
) -> Dict[str, np.ndarray]:
    """Image embeddings for every trial target + text embeddings for every
    category label. Returns dict with image_embeddings [N, E],
    text_embeddings [C, E], categories [N], category_names [C]."""
    imgs, cats = [], []
    for i in range(len(eval_dataset)):
        trial_imgs, ids, ln, cat = eval_dataset[i]
        imgs.append(trial_imgs[0])  # target image
        cats.append(cat)
    images = np.stack(imgs)

    feats = []
    for s in range(0, len(images), batch_size):
        f, _ = model.apply(
            variables, normalize_image(jnp.asarray(images[s:s + batch_size])),
            method="encode_image")
        feats.append(np.asarray(f))
    image_embeddings = np.concatenate(feats)

    category_names = sorted(set(cats))
    vocab = eval_dataset.vocab
    ids = np.zeros((len(category_names), 25), np.int32)
    lens = np.ones((len(category_names),), np.int32)
    for i, c in enumerate(category_names):
        ids[i, 0] = vocab[c]
    text_embeddings, _ = model.apply(
        variables, jnp.asarray(ids), jnp.asarray(lens),
        method="encode_text")

    return {
        "image_embeddings": image_embeddings,
        "text_embeddings": np.asarray(text_embeddings),
        "categories": np.asarray(cats),
        "category_names": np.asarray(category_names),
    }


def alignment_table(joint: Dict[str, np.ndarray]) -> "pandas.DataFrame":
    """Per-image cosine similarity to its own category label vs the mean of
    other labels (analysis_cvcl/alignment.py contract)."""
    import pandas as pd

    img = joint["image_embeddings"]
    txt = joint["text_embeddings"]
    img = img / np.linalg.norm(img, axis=1, keepdims=True)
    txt = txt / np.linalg.norm(txt, axis=1, keepdims=True)
    sims = img @ txt.T  # [N, C]
    names = list(joint["category_names"])
    rows = []
    for i, cat in enumerate(joint["categories"]):
        ci = names.index(cat)
        own = sims[i, ci]
        others = np.delete(sims[i], ci).mean()
        rows.append({"category": cat, "sim_to_own_label": own,
                     "sim_to_other_labels": others,
                     "alignment_margin": own - others})
    return pd.DataFrame(rows)


def tsne_coordinates(joint: Dict[str, np.ndarray], seed: int = 0,
                     perplexity: float = 30.0) -> np.ndarray:
    """2-D t-SNE of image + text embeddings stacked (images first)."""
    from sklearn.manifold import TSNE

    x = np.concatenate([joint["image_embeddings"],
                        joint["text_embeddings"]])
    perplexity = min(perplexity, max(2.0, (len(x) - 1) / 3))
    return TSNE(n_components=2, random_state=seed,
                perplexity=perplexity, init="pca").fit_transform(x)
