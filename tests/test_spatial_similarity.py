"""Spatial-embedding similarity (mean/max matchmap) vs the reference
MultiModalModel einsums (multimodal.py:757-780), plus temperature scaling
and contrastive-loss parity on the same logits."""

import argparse
import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from multimodal_baby_tpu.models.multimodal import spatial_similarity

REFERENCE_DIR = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_DIR), reason="reference not available")

from tests.reference_stubs import install_reference_stubs  # noqa: E402

install_reference_stubs()


class _Dummy(torch.nn.Module):
    def __init__(self, ret):
        super().__init__()
        self.ret = ret

    def forward(self, *a, **k):
        return self.ret


@pytest.mark.parametrize("sim", ["mean", "max"])
def test_spatial_similarity_parity(sim):
    sys.path.insert(0, REFERENCE_DIR)
    from multimodal.multimodal import MultiModalModel

    rng = np.random.RandomState(0)
    I, T, E, h, w, L = 5, 4, 8, 3, 3, 6
    img = rng.randn(I, E, h, w).astype(np.float32)   # torch layout
    txt = rng.randn(T, L, E).astype(np.float32)
    lens = np.array([6, 3, 1, 4], np.float32)

    args = argparse.Namespace(
        sim=sim, embedding_type="spatial", normalize_features=False,
        temperature=0.07, fix_temperature=True)

    class VE(torch.nn.Module):
        def forward(self, x):
            return torch.tensor(img), None

    class TE(torch.nn.Module):
        def forward(self, y, y_len):
            return torch.tensor(txt), None, None

    model = MultiModalModel(VE(), TE(), args)
    with torch.no_grad():
        lpi, lpt = model(torch.zeros(I), torch.zeros(T),
                         torch.tensor(lens))

    ours = spatial_similarity(
        jnp.asarray(img.transpose(0, 2, 3, 1)),  # NHWC
        jnp.asarray(txt), jnp.asarray(lens), sim) * (1 / 0.07)
    np.testing.assert_allclose(np.asarray(ours), lpi.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours).T, lpt.numpy(),
                               atol=1e-4, rtol=1e-4)


def test_contrastive_loss_parity_vs_reference_math():
    """Our loss on given logits == torch symmetric CE (multimodal.py:
    796-822)."""
    from multimodal_baby_tpu.models.losses import (
        contrastive_loss_from_logits)

    rng = np.random.RandomState(1)
    B = 8
    logits = rng.randn(B, B).astype(np.float32) * 3
    t_loss = (torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.arange(B))
        + torch.nn.functional.cross_entropy(
            torch.tensor(logits.T), torch.arange(B))) / 2
    j_loss, metrics = contrastive_loss_from_logits(
        jnp.asarray(logits), jnp.asarray(logits.T))
    np.testing.assert_allclose(float(j_loss), float(t_loss), rtol=1e-6)

    # accuracy/entropy diagnostics match manual computation
    preds = logits.argmax(1)
    np.testing.assert_allclose(
        float(metrics["image_accuracy"]),
        (preds == np.arange(B)).mean())
