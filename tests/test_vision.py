"""Numerical parity of the vision backbones against torch oracles."""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import flax.linen as nn

from multimodal_baby_tpu.api.convert import convert_resnext50, convert_vit
from multimodal_baby_tpu.models.vision_resnext import ResNeXt50
from multimodal_baby_tpu.models.vision_vit import VisionTransformerDino

REFERENCE_DIR = "/root/reference"


def _rand_image(b=2, size=224, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(b, size, size, 3).astype(np.float32)


# --- minimal torch ResNeXt-50 oracle (torchvision is not installed here).
# Produces torchvision-compatible state_dict keys, so this also validates the
# converter's key mapping against the real checkpoint layout.

class _TorchBottleneck(torch.nn.Module):
    def __init__(self, in_ch, planes, stride, groups=32, base_width=4):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        out_ch = planes * 4
        nn = torch.nn
        self.conv1 = nn.Conv2d(in_ch, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, groups=groups,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch)
        self.relu = nn.ReLU()
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                nn.BatchNorm2d(out_ch))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class _TorchResNeXt50(torch.nn.Module):
    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        in_ch = 64
        for i, (planes, blocks, stride) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]):
            layers = []
            for b in range(blocks):
                layers.append(_TorchBottleneck(
                    in_ch, planes, stride if b == 0 else 1))
                in_ch = planes * 4
            setattr(self, f"layer{i + 1}", nn.Sequential(*layers))

    def forward(self, x):
        y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        y = self.layer4(self.layer3(self.layer2(self.layer1(y))))
        return y.mean(dim=(2, 3)), y


@pytest.mark.parametrize("train_mode", [False, True])
def test_resnext50_parity(train_mode):
    """Our NHWC ResNeXt-50 == a torch oracle with converted random weights,
    in both BN modes. train=True (batch stats) reproduces the reference's
    frozen-CNN-in-train-mode quirk (SURVEY.md section 7.3)."""
    torch.manual_seed(int(train_mode))
    ref = _TorchResNeXt50()
    # make BN running stats non-trivial
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    ref.train(train_mode)

    x = _rand_image(b=4, size=64, seed=int(train_mode))  # small & fast
    with torch.no_grad():
        t_pooled, t_map = ref(torch.tensor(x.transpose(0, 3, 1, 2)))

    params, stats = convert_resnext50(ref.state_dict())
    model = ResNeXt50()
    out, _ = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), train=train_mode, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out["pooled"]), t_pooled.numpy(), atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(out["feature_map"]),
        t_map.permute(0, 2, 3, 1).numpy(), atol=5e-3, rtol=0)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DIR),
                    reason="reference checkout not available")
def test_vit_parity():
    """Our ViT == the reference DINO/Mugs ViT (imported as a black-box
    oracle) with converted random weights."""
    sys.path.insert(0, REFERENCE_DIR)
    from multimodal.vision_transformer_dino_mugs import vit_base as t_vit_base

    torch.manual_seed(0)
    ref = t_vit_base(patch_size=14, num_classes=0).eval()
    x = _rand_image(b=2, size=224, seed=2)
    with torch.no_grad():
        t_cls = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    params = convert_vit(ref.state_dict())
    model = VisionTransformerDino(patch_size=14)
    j_cls = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_cls), t_cls,
                               atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DIR),
                    reason="reference checkout not available")
def test_vit_intermediate_and_attention_probes():
    sys.path.insert(0, REFERENCE_DIR)
    from multimodal.vision_transformer_dino_mugs import vit_base as t_vit_base

    torch.manual_seed(3)
    ref = t_vit_base(patch_size=14, num_classes=0).eval()
    x = _rand_image(b=1, size=224, seed=3)
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        t_attn = ref.get_last_selfattention(xt).numpy()
        t_inter = [t.numpy() for t in ref.get_intermediate_layers(xt, n=2)]

    params = convert_vit(ref.state_dict())
    model = VisionTransformerDino(patch_size=14)
    j_attn = model.apply({"params": params}, jnp.asarray(x),
                         method="get_last_selfattention")
    j_inter = model.apply({"params": params}, jnp.asarray(x),
                          method="get_intermediate_layers", n=2)
    np.testing.assert_allclose(np.asarray(j_attn), t_attn,
                               atol=2e-4, rtol=1e-3)
    for j, t in zip(j_inter, t_inter):
        np.testing.assert_allclose(np.asarray(j), t, atol=2e-4, rtol=1e-3)


def test_vit_padseq_exact(monkeypatch):
    """Tile-padding the token axis (MMB_VIT_PADSEQ) must not change the
    CLS output: pad keys are masked to exp()==0 in every attention and
    nothing else reduces over the token axis."""
    import numpy as np
    model = VisionTransformerDino(patch_size=14, embed_dim=64, depth=2,
                                  num_heads=4, base_img_size=56)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 56, 56, 3),
                    jnp.float32)  # 4x4 grid + cls = 17 tokens (prime-ish)
    params = model.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("MMB_VIT_PADSEQ", "0")
    want = np.asarray(model.apply(params, x))
    monkeypatch.setenv("MMB_VIT_PADSEQ", "auto")
    got = np.asarray(model.apply(params, x))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    monkeypatch.setenv("MMB_VIT_PADSEQ", "64")
    got64 = np.asarray(model.apply(params, x))
    np.testing.assert_allclose(got64, want, atol=1e-5, rtol=1e-5)


def test_vit_padseq_with_lnfold_exact(monkeypatch):
    """padseq composes with the LN-fold frozen fast path."""
    import numpy as np
    model = VisionTransformerDino(patch_size=14, embed_dim=64, depth=2,
                                  num_heads=4, base_img_size=56,
                                  lnfold=True)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 56, 56, 3),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("MMB_VIT_PADSEQ", "0")
    want = np.asarray(model.apply(params, x))
    monkeypatch.setenv("MMB_VIT_PADSEQ", "auto")
    got = np.asarray(model.apply(params, x))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_vit_round4_defaults(monkeypatch):
    """Committed defaults: token-axis padseq is ON when MMB_VIT_PADSEQ is
    unset (257 -> 272), and the kernel defaults (round 5: block attention
    + fused MLP) are TPU-gated — on CPU the default path must equal the
    explicit XLA-softmax path exactly."""
    import numpy as np
    from multimodal_baby_tpu.models import vision_vit as vv
    monkeypatch.delenv("MMB_VIT_PADSEQ", raising=False)
    monkeypatch.delenv("MMB_FUSED_ATTN", raising=False)
    monkeypatch.delenv("MMB_VIT_MLP", raising=False)
    assert vv._attn_mode() == "block" and vv._mlp_mode() == "fused"
    model = VisionTransformerDino(patch_size=14, embed_dim=64, depth=2,
                                  num_heads=4, base_img_size=56)
    assert model._padded_len(257) == 272 and model._padded_len(17) == 32
    x = jnp.asarray(np.random.RandomState(2).randn(2, 56, 56, 3),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    got_default = np.asarray(model.apply(params, x))
    monkeypatch.setenv("MMB_FUSED_ATTN", "0")
    got_xla = np.asarray(model.apply(params, x))
    np.testing.assert_array_equal(got_default, got_xla)


def test_vit_gelu_variants(monkeypatch):
    """MMB_VIT_GELU opt-in forms track exact erf GELU within their
    documented envelopes on O(1) pre-activations (default stays erf —
    the torch-parity choice; variants exist to price the VPU epilogue
    the B=64 device trace bills at ~22% of the ViT step)."""
    import numpy as np
    from multimodal_baby_tpu.models.vision_vit import _gelu

    h = jnp.asarray(np.random.RandomState(0).randn(4096) * 3, jnp.float32)
    monkeypatch.delenv("MMB_VIT_GELU", raising=False)
    exact = np.asarray(_gelu(h))
    np.testing.assert_allclose(
        exact, np.asarray(nn.gelu(h, approximate=False)), rtol=0, atol=0)

    monkeypatch.setenv("MMB_VIT_GELU", "tanh")
    tanh = np.asarray(_gelu(h))
    assert np.abs(tanh - exact).max() < 5e-3
    assert not np.array_equal(tanh, exact)  # the env switch took effect

    monkeypatch.setenv("MMB_VIT_GELU", "sigmoid")
    sig = np.asarray(_gelu(h))
    assert np.abs(sig - exact).max() < 3e-2


def test_vit_gelu_embedding_fidelity(monkeypatch):
    """End-to-end envelope of the cheap GELU forms: CLS embeddings of a
    random-init ViT under tanh/sigmoid stay near-parallel to erf's (the
    full-size bf16 measurement is scripts/vit_gelu_fidelity.py — ViT-B/14
    cos >= 0.9998, forced-choice agreement 255/256 tanh / 250/256 sigmoid,
    BENCH_NOTES round-4; this pins the claim at CI scale in f32)."""
    import numpy as np
    monkeypatch.delenv("MMB_VIT_GELU", raising=False)
    model = VisionTransformerDino(patch_size=14, embed_dim=64, depth=2,
                                  num_heads=4, base_img_size=56)
    x = jnp.asarray(np.random.RandomState(5).randn(4, 56, 56, 3),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)

    def unit(e):
        return e / np.linalg.norm(e, axis=-1, keepdims=True)

    base = unit(np.asarray(model.apply(params, x)))
    for mode, floor in (("tanh", 0.9995), ("sigmoid", 0.999)):
        monkeypatch.setenv("MMB_VIT_GELU", mode)
        e = unit(np.asarray(model.apply(params, x)))
        cos = np.sum(e * base, axis=-1)
        assert cos.min() > floor, (mode, cos)
