"""N-gram LM parity against the reference implementation (black-box
oracle) on random sequences."""

import os
import sys

import numpy as np
import pytest

from multimodal_baby_tpu.analysis.ngram import NGramModel

REFERENCE_DIR = "/root/reference"


def make_data(seed=0, B=20, L=12, V=30):
    rng = np.random.RandomState(seed)
    y = np.zeros((B, L), np.int64)
    y[:, 0] = 2  # SOS
    y_len = rng.randint(3, L, B)
    for i, n in enumerate(y_len):
        y[i, 1:n] = rng.randint(4, V, n - 1)
    return y, y_len, V


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DIR),
                    reason="reference checkout not available")
@pytest.mark.parametrize("N", [1, 2, 3])
def test_matches_reference(N):
    sys.path.insert(0, REFERENCE_DIR)
    import torch
    from ngram import NGramModel as RefNGram

    y, y_len, V = make_data(N)
    ours = NGramModel(N, V)
    ref = RefNGram(N, V)
    ours.update(y, y_len)
    ref.update(torch.tensor(y), torch.tensor(y_len))

    y2, y2_len, _ = make_data(N + 10)
    ours_loss = ours.calculate_ce_loss(y2, y2_len)
    ref_loss = ref.calculate_ce_loss(
        torch.tensor(y2), torch.tensor(y2_len)).numpy()
    np.testing.assert_allclose(ours_loss, ref_loss, atol=1e-5)

    np.testing.assert_allclose(
        float(ours.calculate_ce_loss(y2, y2_len, tokenwise=False)),
        float(ref.calculate_ce_loss(
            torch.tensor(y2), torch.tensor(y2_len), tokenwise=False)),
        atol=1e-5)
