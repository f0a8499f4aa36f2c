"""Linear probe: learns separable classes; forced-choice semantics."""

import numpy as np

from multimodal_baby_tpu.evaluation.linear_probe import (
    probe_accuracy, probe_forced_choice, train_linear_probe)


def make_separable(n=512, d=64, c=8, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(c, d) * 3
    labels = rng.randint(0, c, n)
    feats = centers[labels] + rng.randn(n, d) * 0.5
    return feats.astype(np.float32), labels.astype(np.int32), centers


def test_probe_learns():
    feats, labels, _ = make_separable()
    params, metrics = train_linear_probe(feats, labels, 8, epochs=50)
    assert metrics["train_acc"] > 0.95
    assert probe_accuracy(params, feats, labels) > 0.95


def test_subset_fraction():
    feats, labels, _ = make_separable()
    params, metrics = train_linear_probe(
        feats, labels, 8, epochs=50, subset_fraction=0.1)
    assert metrics["n_train"] == 51


def test_forced_choice_with_good_probe():
    feats, labels, centers = make_separable(seed=1)
    params, _ = train_linear_probe(feats, labels, 8, epochs=50, seed=1)
    # trials: target image from target class, 3 foils from other classes
    rng = np.random.RandomState(2)
    N = 100
    target_class = rng.randint(0, 8, N).astype(np.int64)
    trial_feats = np.zeros((N, 4, 64), np.float32)
    for i in range(N):
        trial_feats[i, 0] = centers[target_class[i]] + rng.randn(64) * 0.3
        foils = rng.choice([c for c in range(8) if c != target_class[i]],
                           3, replace=False)
        for j, f in enumerate(foils):
            trial_feats[i, j + 1] = centers[f] + rng.randn(64) * 0.3
    acc, preds = probe_forced_choice(params, trial_feats, target_class)
    assert acc > 0.95
    assert preds.shape == (N,)
