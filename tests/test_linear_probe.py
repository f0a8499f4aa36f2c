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


def test_half_split_reference_semantics():
    """Per-class first/last-half splits mirror the reference
    (object_categories_linear_decoding.py:58-77): dataset-order halves,
    disjoint, exhaustive, and 'last' is the complement of 'first'."""
    import numpy as np
    from multimodal_baby_tpu.evaluation.linear_probe import half_split

    labels = np.array([0, 0, 0, 0, 0, 1, 1, 1, 2, 2, 0, 1])
    tr_f, te_f = half_split(labels, "first")
    tr_l, te_l = half_split(labels, "last")
    # class 0 has 6 examples at positions [0,1,2,3,4,10] -> first half
    # [0,1,2], class 1 at [5,6,7,11] -> [5,6], class 2 at [8,9] -> [8]
    assert sorted(tr_f.tolist()) == [0, 1, 2, 5, 6, 8]
    # disjoint + exhaustive
    assert sorted(np.concatenate([tr_f, te_f]).tolist()) == list(range(12))
    assert set(tr_f) & set(te_f) == set()
    # last == complement
    assert sorted(tr_l.tolist()) == sorted(te_f.tolist())
    assert sorted(te_l.tolist()) == sorted(tr_f.tolist())

    import pytest
    with pytest.raises(ValueError):
        half_split(labels, "middle")
