"""int8 trunk: quantized fold + fused-kernel correctness (interpret mode)
and end-to-end feature quality vs the f32 conv path.

The int8 fused kernels share one code path with bf16
(ops/bottleneck_hwbc._requant); here each kernel mode is pinned EXACTLY
against the XLA quantized oracle (ops/quant.bottleneck_reference_q —
int8 dots are exact integer math, f32 epilogues deterministic), and the
whole quantized trunk is gated on cosine similarity to the f32 features.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from multimodal_baby_tpu.ops.bottleneck_hwbc import fold_block_params  # noqa: E402
from multimodal_baby_tpu.ops.bottleneck_hwbc import (  # noqa: E402
    from_hwbc, fused_bottleneck_hwbc, fused_stage_hwbc, hwbc_reference,
    stage_reference, to_hwbc)
from multimodal_baby_tpu.ops.quant import (  # noqa: E402
    bottleneck_reference_q, fold_block_params_q, quantize_activation,
    quantize_weight)

GROUPS = 32


def make_block(rng, cin, planes, has_ds, groups=GROUPS):
    """Random BottleneckX params/stats in the flax tree layout
    (resnext50 32x4d: width = planes * (4/64) * 32 = 2*planes,
    cout = 4*planes)."""
    width = 2 * planes
    cout = 4 * planes
    cg = width // groups

    def bn(c):
        return ({"scale": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
                 "bias": jnp.asarray(rng.randn(c) * 0.1, jnp.float32)},
                {"mean": jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
                 "var": jnp.asarray(rng.uniform(0.5, 2.0, c), jnp.float32)})

    params = {
        "conv1": {"kernel": jnp.asarray(
            rng.randn(1, 1, cin, width) / np.sqrt(cin), jnp.float32)},
        "conv2": {"kernel": jnp.asarray(
            rng.randn(3, 3, cg, width) / np.sqrt(9 * cg), jnp.float32)},
        "conv3": {"kernel": jnp.asarray(
            rng.randn(1, 1, width, cout) / np.sqrt(width), jnp.float32)},
    }
    stats = {}
    params["bn1"], stats["bn1"] = bn(width)
    params["bn2"], stats["bn2"] = bn(width)
    params["bn3"], stats["bn3"] = bn(cout)
    if has_ds:
        params["downsample_conv"] = {"kernel": jnp.asarray(
            rng.randn(1, 1, cin, cout) / np.sqrt(cin), jnp.float32)}
        params["downsample_bn"], stats["downsample_bn"] = bn(cout)
    return params, stats


def fold_q(params, stats, rng):
    """Quantized fold with plausible random amax values."""
    return fold_block_params_q(
        params, stats,
        in_amax=jnp.float32(2.0), h1_amax=jnp.float32(1.5),
        h2_amax=jnp.float32(1.5), out_amax=jnp.float32(2.5),
        groups=GROUPS)


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(16, 8), jnp.float32)
    w_q, s = quantize_weight(w)
    assert w_q.dtype == jnp.int8
    back = w_q.astype(jnp.float32) * s
    assert float(jnp.max(jnp.abs(back - w))) <= float(jnp.max(s)) * 0.5 + 1e-6


@pytest.mark.parametrize("stride,has_ds", [(1, False), (2, True)])
def test_fused_block_int8_matches_oracle(stride, has_ds):
    rng = np.random.RandomState(1)
    B, H, W, cin, planes = 32, 8, 8, 256, 64
    params, stats = make_block(rng, cin, planes, has_ds)
    fw = fold_q(params, stats, rng)

    x = jnp.asarray(rng.randint(0, 100, (B, H, W, cin)), jnp.int8)
    want = bottleneck_reference_q(x, fw, stride=stride)
    got = from_hwbc(fused_bottleneck_hwbc(
        to_hwbc(x, 32), fw, stride=stride))
    # int8 dots are exact; the only nondeterminism is f32 epilogue
    # association — allow off-by-one codes on round boundaries
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_fused_stage_int8_matches_oracle():
    rng = np.random.RandomState(2)
    B, H, W, cin, planes = 32, 8, 8, 256, 64
    fws, strides = [], []
    c = cin
    for j in range(3):
        params, stats = make_block(rng, c, planes, has_ds=(j == 0))
        fws.append(fold_q(params, stats, rng))
        strides.append(2 if j == 0 else 1)
        c = 4 * planes
    x = jnp.asarray(rng.randint(0, 100, (B, H, W, cin)), jnp.int8)
    want = stage_reference(to_hwbc(x, 32), fws, strides)
    got = fused_stage_hwbc(to_hwbc(x, 32), fws, strides)
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_quantized_block_close_to_f32():
    """The quantized block output must track the f32 block on realistic
    activations (calibrated amax): relative error of the dequantized
    output small, cosine ~1."""
    rng = np.random.RandomState(3)
    B, H, W, cin, planes = 32, 8, 8, 256, 64
    params, stats = make_block(rng, cin, planes, has_ds=False)

    x_f = jnp.asarray(np.abs(rng.randn(B, H, W, cin)) * 0.5, jnp.float32)

    from multimodal_baby_tpu.ops.bottleneck_hwbc import bottleneck_reference
    fw_f = fold_block_params(params, stats, jnp.float32, groups=GROUPS)
    y_f = bottleneck_reference(x_f, fw_f, stride=1)

    # calibrate amaxes from the actual tensors
    in_amax = jnp.max(x_f)
    h1 = jax.nn.relu(
        (x_f.reshape(-1, cin) @ fw_f["w1"]) + fw_f["b1"])
    # h2/out amax: use the f32 block intermediates via the reference path
    out_amax = jnp.max(y_f)
    fw_q = fold_block_params_q(
        params, stats, in_amax=in_amax, h1_amax=jnp.max(h1),
        h2_amax=jnp.float32(float(jnp.max(y_f)) * 2),  # loose but fixed
        out_amax=out_amax, groups=GROUPS)

    x_q = quantize_activation(x_f, in_amax)
    y_q = bottleneck_reference_q(x_q, fw_q, stride=1)
    y_deq = y_q.astype(jnp.float32) * (out_amax / 127.0)

    a = np.asarray(y_f).ravel()
    b = np.asarray(y_deq).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.995, cos
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    assert rel < 0.05, rel


def test_int8_trunk_end_to_end_cosine(monkeypatch):
    """Whole ResNeXt50: int8 fused trunk (interpret mode) vs the f32 conv
    path, with calibrated activation ranges — pooled-feature cosine must
    be ~1. Small images keep interpret-mode kernels fast; the math is
    size-independent."""
    from multimodal_baby_tpu.models.quant_calib import calibrate_backbone
    from multimodal_baby_tpu.models.vision_resnext import ResNeXt50

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(32, 64, 64, 3), jnp.float32)

    ref_mod = ResNeXt50(dtype=None, dense_groups=False, fused_trunk=False)
    variables = ref_mod.init(jax.random.PRNGKey(0), imgs, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    want = ref_mod.apply({"params": params, "batch_stats": stats},
                         imgs, train=False)["pooled"]

    scales = calibrate_backbone(params, stats, imgs)

    monkeypatch.setenv("MMB_FUSED_TRUNK", "1")
    monkeypatch.setenv("MMB_TRUNK_INT8", "1")
    q_mod = ResNeXt50(dtype=jnp.bfloat16, trunk_int8=True)
    got = q_mod.apply(
        {"params": params, "batch_stats": stats, "quant_scales": scales},
        imgs.astype(jnp.bfloat16), train=False)["pooled"]

    a = np.asarray(want)
    b = np.asarray(got, np.float32)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9)
    assert cos.min() > 0.99, cos.min()


def test_mixed_plan_trunk_end_to_end_cosine(monkeypatch):
    """Mixed-precision plan (bf16 layers 1-2, int8 layers 3-4 — the
    measured-best v5e mix): bf16 stages thread the activation-range
    chain, the boundary quantizes + regroups sublanes 16 -> 32, and the
    pooled features must stay ~parallel to the f32 conv path. Should be
    strictly closer to f32 than the all-int8 trunk (fewer quantized
    stages)."""
    from multimodal_baby_tpu.models.quant_calib import calibrate_backbone
    from multimodal_baby_tpu.models.vision_resnext import ResNeXt50

    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randn(32, 64, 64, 3), jnp.float32)

    ref_mod = ResNeXt50(dtype=None, dense_groups=False, fused_trunk=False)
    variables = ref_mod.init(jax.random.PRNGKey(0), imgs, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    want = ref_mod.apply({"params": params, "batch_stats": stats},
                         imgs, train=False)["pooled"]

    scales = calibrate_backbone(params, stats, imgs)

    monkeypatch.setenv("MMB_FUSED_TRUNK", "1")
    monkeypatch.setenv("MMB_TRUNK_INT8", "0,0,1,1")
    q_mod = ResNeXt50(dtype=jnp.bfloat16)
    got = q_mod.apply(
        {"params": params, "batch_stats": stats, "quant_scales": scales},
        imgs.astype(jnp.bfloat16), train=False)["pooled"]

    a = np.asarray(want)
    b = np.asarray(got, np.float32)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9)
    assert cos.min() > 0.99, cos.min()


def fold_t(params, stats):
    """Transport fold (int8 I/O, full-precision dots) with plausible
    random amax values; f32 compute so the kernel matches the f32 oracle
    exactly (on TPU the weights are bf16 — tested end-to-end below)."""
    from multimodal_baby_tpu.ops.quant import fold_block_params_t
    return fold_block_params_t(
        params, stats, in_amax=jnp.float32(2.0), out_amax=jnp.float32(2.5),
        compute_dtype=jnp.float32, groups=GROUPS)


@pytest.mark.parametrize("stride,has_ds", [(1, False), (2, True)])
def test_fused_block_transport_matches_oracle(stride, has_ds):
    """int8-TRANSPORT block (int8 activations over HBM, f32/bf16 dots)
    vs ops/quant.bottleneck_reference_t."""
    from multimodal_baby_tpu.ops.quant import bottleneck_reference_t

    rng = np.random.RandomState(4)
    B, H, W, cin, planes = 32, 8, 8, 256, 64
    params, stats = make_block(rng, cin, planes, has_ds)
    fw = fold_t(params, stats)
    assert fw["w1"].dtype == jnp.float32  # dots stay full precision

    x = jnp.asarray(rng.randint(0, 100, (B, H, W, cin)), jnp.int8)
    want = bottleneck_reference_t(x, fw, stride=stride)
    got = from_hwbc(fused_bottleneck_hwbc(
        to_hwbc(x, 32), fw, stride=stride))
    assert got.dtype == jnp.int8
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_fused_stage_transport_matches_oracle():
    rng = np.random.RandomState(5)
    B, H, W, cin, planes = 32, 8, 8, 256, 64
    fws, strides = [], []
    c = cin
    for j in range(3):
        params, stats = make_block(rng, c, planes, has_ds=(j == 0))
        fws.append(fold_t(params, stats))
        strides.append(2 if j == 0 else 1)
        c = 4 * planes
    x = jnp.asarray(rng.randint(0, 100, (B, H, W, cin)), jnp.int8)
    want = stage_reference(to_hwbc(x, 32), fws, strides)
    got = fused_stage_hwbc(to_hwbc(x, 32), fws, strides)
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_fused_stage_banded_transport_matches_oracle():
    """Banded whole-stage kernel in transport mode (int8 I/O at bsub=32,
    f32 dots, a3/ad folded into w3/wd, ai identity coefficient)."""
    from multimodal_baby_tpu.ops.bottleneck_hwbc import fused_stage_banded

    rng = np.random.RandomState(8)
    B, H, W, cin, planes = 32, 8, 8, 256, 64
    fws, strides = [], []
    c = cin
    for j in range(3):
        params, stats = make_block(rng, c, planes, has_ds=(j == 0))
        fws.append(fold_t(params, stats))
        strides.append(1)
        c = 4 * planes
    x = jnp.asarray(rng.randint(0, 100, (B, H, W, cin)), jnp.int8)
    want = stage_reference(to_hwbc(x, 32), fws, strides)
    got = fused_stage_banded(to_hwbc(x, 32), fws, strides, hh=4, R=4)
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_transport_trunk_end_to_end_cosine(monkeypatch):
    """Whole ResNeXt50 in all-transport mode ("t,t,t,t"): int8 HBM
    transport with bf16 dots must track the f32 conv path at least as
    closely as the all-int8 trunk (same activation grids, no dot/h1/h2
    quantization error)."""
    from multimodal_baby_tpu.models.quant_calib import calibrate_backbone
    from multimodal_baby_tpu.models.vision_resnext import ResNeXt50

    rng = np.random.RandomState(6)
    imgs = jnp.asarray(rng.randn(32, 64, 64, 3), jnp.float32)

    ref_mod = ResNeXt50(dtype=None, dense_groups=False, fused_trunk=False)
    variables = ref_mod.init(jax.random.PRNGKey(0), imgs, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    want = ref_mod.apply({"params": params, "batch_stats": stats},
                         imgs, train=False)["pooled"]

    scales = calibrate_backbone(params, stats, imgs)

    monkeypatch.setenv("MMB_FUSED_TRUNK", "1")
    monkeypatch.setenv("MMB_TRUNK_INT8", "t")
    t_mod = ResNeXt50(dtype=jnp.bfloat16)
    got = t_mod.apply(
        {"params": params, "batch_stats": stats, "quant_scales": scales},
        imgs.astype(jnp.bfloat16), train=False)["pooled"]

    a = np.asarray(want)
    b = np.asarray(got, np.float32)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9)
    assert cos.min() > 0.99, cos.min()


def test_mixed_transport_quant_plan_cosine(monkeypatch):
    """Transport layers 1-2 + full-int8 layers 3-4 ("t,t,1,1" — the
    intended production mix: DMA halving where the stage is
    bandwidth-bound, int8 MXU rate where it is weight-bound)."""
    from multimodal_baby_tpu.models.quant_calib import calibrate_backbone
    from multimodal_baby_tpu.models.vision_resnext import ResNeXt50

    rng = np.random.RandomState(7)
    imgs = jnp.asarray(rng.randn(32, 64, 64, 3), jnp.float32)

    ref_mod = ResNeXt50(dtype=None, dense_groups=False, fused_trunk=False)
    variables = ref_mod.init(jax.random.PRNGKey(0), imgs, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    want = ref_mod.apply({"params": params, "batch_stats": stats},
                         imgs, train=False)["pooled"]

    scales = calibrate_backbone(params, stats, imgs)

    monkeypatch.setenv("MMB_FUSED_TRUNK", "1")
    monkeypatch.setenv("MMB_TRUNK_INT8", "t,t,1,1")
    mod = ResNeXt50(dtype=jnp.bfloat16)
    got = mod.apply(
        {"params": params, "batch_stats": stats, "quant_scales": scales},
        imgs.astype(jnp.bfloat16), train=False)["pooled"]

    a = np.asarray(want)
    b = np.asarray(got, np.float32)
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9)
    assert cos.min() > 0.99, cos.min()


def test_int8_plan_validation():
    """Non-suffix plans and malformed plan strings are rejected."""
    from multimodal_baby_tpu.models.vision_resnext import ResNeXt50

    with pytest.raises(ValueError, match="suffix"):
        ResNeXt50(trunk_int8=(True, False, True, True))._int8_plan()
    with pytest.raises(ValueError, match="entries"):
        ResNeXt50(trunk_int8=(True,))._int8_plan()
    assert ResNeXt50(trunk_int8="0,0,1,1")._int8_plan() == (
        False, False, "q", "q")
    assert ResNeXt50(trunk_int8=True)._int8_plan() == ("q",) * 4
    assert ResNeXt50(trunk_int8="t,t,1,1")._int8_plan() == (
        "t", "t", "q", "q")
    assert ResNeXt50(trunk_int8="t")._int8_plan() == ("t",) * 4
    with pytest.raises(ValueError, match="suffix"):
        ResNeXt50(trunk_int8="t,0,1,1")._int8_plan()
    with pytest.raises(ValueError, match="0/1/t"):
        ResNeXt50(trunk_int8="0,0,x,1")._int8_plan()


# ---------------------------------------------------------------------------
# int8 ViT path (ops/quant.int8_dense + models/vision_vit.QuantizableDense)
# ---------------------------------------------------------------------------

def test_int8_dense_matches_f32():
    """Dynamic per-tensor activation + per-channel weight int8 matmul vs
    the f32 matmul: relative error bounded by the quantization grid."""
    from multimodal_baby_tpu.ops.quant import int8_dense

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 768), jnp.float32)
    w = jnp.asarray(rng.randn(768, 512) / np.sqrt(768), jnp.float32)
    b = jnp.asarray(rng.randn(512) * 0.1, jnp.float32)

    want = np.asarray(x @ w + b)
    got = np.asarray(int8_dense(x, w, b, out_dtype=jnp.float32))
    rel = np.abs(got - want).mean() / np.abs(want).mean()
    assert rel < 0.02, rel


def test_quantizable_dense_param_tree_and_f32_path():
    """QuantizableDense keeps nn.Dense's exact parameter tree (checkpoints
    interchangeable) and with int8=False reproduces nn.Dense bit-exactly."""
    import flax.linen as nn

    from multimodal_baby_tpu.models.vision_vit import QuantizableDense

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 64), jnp.float32)

    ref = nn.Dense(32, name="d")
    q = QuantizableDense(32, name="d", int8=False)
    vs = ref.init(jax.random.PRNGKey(0), x)
    vs_q = q.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vs) == jax.tree_util.tree_structure(
        vs_q)
    np.testing.assert_array_equal(np.asarray(ref.apply(vs, x)),
                                  np.asarray(q.apply(vs, x)))


def test_int8_vit_cosine():
    """Small ViT, int8 blocks vs f32 blocks on the same params: cls/patch
    outputs stay ~parallel (48 Denses quantize independently; per-channel
    weight scales keep error ~per-layer-bounded)."""
    from multimodal_baby_tpu.models.vision_vit import VisionTransformerDino

    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.randn(2, 56, 56, 3), jnp.float32)

    kw = dict(patch_size=14, embed_dim=96, depth=3, num_heads=4,
              base_img_size=56)
    ref = VisionTransformerDino(**kw)
    vs = ref.init(jax.random.PRNGKey(0), imgs)
    want = np.asarray(ref.apply(vs, imgs))

    q = VisionTransformerDino(**kw, int8=True)
    got = np.asarray(q.apply(vs, imgs), np.float32)

    cos = (want * got).sum(-1) / (
        np.linalg.norm(want, axis=-1) * np.linalg.norm(got, axis=-1) + 1e-9)
    assert cos.min() > 0.99, cos.min()


def test_vit_int8_requires_frozen_trunk(monkeypatch):
    """MMB_VIT_INT8=1 with finetune_cnn=True must be refused: the int8
    matmul has zero gradient (jnp.round), so finetuning would silently
    train nothing."""
    from multimodal_baby_tpu.core.config import ModelConfig, VisionConfig
    from multimodal_baby_tpu.models.vision import VisionEncoder

    monkeypatch.setenv("MMB_VIT_INT8", "1")
    cfg = ModelConfig(vision=VisionConfig(vit_dino=True, finetune_cnn=True))
    enc = VisionEncoder(cfg)
    imgs = jnp.zeros((1, 28, 28, 3), jnp.float32)
    with pytest.raises(ValueError, match="frozen"):
        enc.init(jax.random.PRNGKey(0), imgs)


def test_lnfold_vit_matches_plain():
    """LN-fold path (gamma/beta folded into qkv/fc1, pure-normalize LNs)
    vs the plain path on the SAME params: numerically equivalent up to
    f32 reassociation (the fold is exact algebra, not an approximation)."""
    from multimodal_baby_tpu.models.vision_vit import VisionTransformerDino

    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.randn(2, 56, 56, 3), jnp.float32)

    kw = dict(patch_size=14, embed_dim=96, depth=3, num_heads=4,
              base_img_size=56)
    ref = VisionTransformerDino(**kw)
    vs = ref.init(jax.random.PRNGKey(0), imgs)
    # make gamma/beta non-trivial so the fold actually moves them
    vs = jax.tree.map(lambda x: x, vs)
    import flax
    flat = flax.traverse_util.flatten_dict(vs["params"])
    for k in list(flat):
        if len(k) < 2 or not k[-2].startswith("norm"):
            continue
        if k[-1] == "scale":
            flat[k] = flat[k] * 1.3 + 0.1
        elif k[-1] == "bias":
            flat[k] = flat[k] + 0.05
    vs = {"params": flax.traverse_util.unflatten_dict(flat)}

    want = np.asarray(ref.apply(vs, imgs))
    folded = VisionTransformerDino(**kw, lnfold=True)
    # identical param trees: the fold declares norm params under the
    # same names via _LNParams
    got = np.asarray(folded.apply(vs, imgs))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_int8_vit_cosine_with_padseq(monkeypatch):
    """Token-axis tile padding (MMB_VIT_PADSEQ) must not change the int8
    path: int8_dense's dynamic activation amax is restricted to the real
    token rows (amax_rows), so pad rows — nonzero after block 0 via
    bias/LN-beta — cannot shift the per-tensor scale. Real-token outputs
    must match the UNPADDED int8 run exactly, and the cosine gate vs f32
    stays at the int8-alone level."""
    from multimodal_baby_tpu.models.vision_vit import VisionTransformerDino

    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.randn(2, 56, 56, 3), jnp.float32)

    kw = dict(patch_size=14, embed_dim=96, depth=3, num_heads=4,
              base_img_size=56)
    ref = VisionTransformerDino(**kw)
    vs = ref.init(jax.random.PRNGKey(0), imgs)
    monkeypatch.setenv("MMB_VIT_PADSEQ", "0")
    want = np.asarray(ref.apply(vs, imgs))

    q = VisionTransformerDino(**kw, int8=True)
    want_int8 = np.asarray(q.apply(vs, imgs), np.float32)

    monkeypatch.setenv("MMB_VIT_PADSEQ", "auto")
    got = np.asarray(q.apply(vs, imgs), np.float32)

    # padding must be invisible to the int8 computation (same scales,
    # masked attention): real-token outputs equal the unpadded int8 run
    np.testing.assert_allclose(got, want_int8, atol=1e-5, rtol=1e-5)

    cos = (want * got).sum(-1) / (
        np.linalg.norm(want, axis=-1) * np.linalg.norm(got, axis=-1) + 1e-9)
    assert cos.min() > 0.99, cos.min()
