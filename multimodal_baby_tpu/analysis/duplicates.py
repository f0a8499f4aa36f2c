"""Train/eval frame-leak audit.

Capability parity with analysis_cvcl/duplicates.py: perceptual-hash
duplicate detection (:28-42) and feature-space nearest-neighbor cosine
duplicates (:439-621), numpy-based.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def average_hash(image_u8: np.ndarray, hash_size: int = 8) -> np.ndarray:
    """aHash: downscale to hash_size^2 grayscale, threshold at the mean.
    Returns a flat boolean array."""
    from PIL import Image

    img = Image.fromarray(image_u8).convert("L").resize(
        (hash_size, hash_size), Image.BILINEAR)
    a = np.asarray(img, np.float32)
    return (a > a.mean()).reshape(-1)


def hash_distance(h1: np.ndarray, h2: np.ndarray) -> int:
    return int(np.count_nonzero(h1 != h2))


def find_hash_duplicates(
    hashes_a: np.ndarray,   # [N, 64] bool
    hashes_b: np.ndarray,   # [M, 64] bool
    max_distance: int = 5,
) -> List[Tuple[int, int, int]]:
    """All (i, j, dist) pairs with Hamming distance <= max_distance."""
    # vectorized hamming via xor-popcount on packed uint64 would be faster;
    # at corpus scale (<1e5 frames) the [N, M] bool matmul is fine
    a = hashes_a.astype(np.int8)
    b = hashes_b.astype(np.int8)
    dists = (a[:, None, :] != b[None, :, :]).sum(-1) \
        if a.shape[0] * b.shape[0] <= 4_000_000 else None
    out = []
    if dists is not None:
        ii, jj = np.nonzero(dists <= max_distance)
        return [(int(i), int(j), int(dists[i, j])) for i, j in zip(ii, jj)]
    for i in range(a.shape[0]):
        d = (a[i][None, :] != b).sum(-1)
        for j in np.nonzero(d <= max_distance)[0]:
            out.append((i, int(j), int(d[j])))
    return out


def find_feature_duplicates(
    feats_a: np.ndarray, feats_b: np.ndarray,
    threshold: float = 0.98,
) -> List[Tuple[int, int, float]]:
    """Cosine-similarity near-duplicates between two feature sets
    (duplicates.py:439-621 pattern)."""
    a = feats_a / np.maximum(
        np.linalg.norm(feats_a, axis=1, keepdims=True), 1e-12)
    b = feats_b / np.maximum(
        np.linalg.norm(feats_b, axis=1, keepdims=True), 1e-12)
    sims = a @ b.T
    ii, jj = np.nonzero(sims >= threshold)
    return [(int(i), int(j), float(sims[i, j])) for i, j in zip(ii, jj)]
