"""Pallas kernels vs XLA references (interpreter mode on CPU; the same
kernels compile natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.models.losses import contrastive_loss_from_logits
from multimodal_baby_tpu.ops.infonce import fused_infonce
from multimodal_baby_tpu.ops.lstm import _scan_reference, lstm_fused


def xla_infonce(img, txt, nlt):
    logits = jnp.exp(nlt) * (img @ txt.T)
    return contrastive_loss_from_logits(logits, logits.T)[0]


@pytest.mark.parametrize("B,E", [(16, 32), (64, 128)])
def test_fused_infonce_forward_and_grads(B, E):
    rng = np.random.RandomState(B)
    img = jnp.asarray(rng.randn(B, E).astype(np.float32))
    txt = jnp.asarray(rng.randn(B, E).astype(np.float32))
    nlt = jnp.asarray(np.log(1 / 0.07), jnp.float32)

    np.testing.assert_allclose(
        float(fused_infonce(img, txt, nlt)),
        float(xla_infonce(img, txt, nlt)), rtol=1e-5)

    gf = jax.grad(fused_infonce, argnums=(0, 1, 2))(img, txt, nlt)
    gx = jax.grad(xla_infonce, argnums=(0, 1, 2))(img, txt, nlt)
    for name, a, b in zip(("dimg", "dtxt", "dnlt"), gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3,
            err_msg=name)


def test_lstm_fused_matches_scan():
    rng = np.random.RandomState(0)
    L, B, H = 9, 8, 16
    xp = jnp.asarray(rng.randn(L, B, 4 * H).astype(np.float32))
    lens = rng.randint(1, L + 1, B)
    mask = jnp.asarray(
        (np.arange(L)[:, None] < lens[None, :]).astype(np.float32))
    whh = jnp.asarray(rng.randn(H, 4 * H).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.randn(B, H).astype(np.float32) * 0.1)

    outs_p = lstm_fused(xp, mask, whh, h0, c0)
    outs_s = _scan_reference(xp, mask, whh, h0, c0)
    for a, b in zip(outs_p, outs_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def loss(impl):
        def f(xp, whh, h0, c0):
            o, h, c = impl(xp, mask, whh, h0, c0)
            return (o ** 2).sum() + (h * c).sum()
        return f

    gp = jax.grad(loss(lstm_fused), argnums=(0, 1, 2, 3))(xp, whh, h0, c0)
    gs = jax.grad(loss(_scan_reference), argnums=(0, 1, 2, 3))(
        xp, whh, h0, c0)
    for name, a, b in zip(("dxp", "dwhh", "dh0", "dc0"), gp, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=name)


def test_fused_attention_matches_xla():
    from multimodal_baby_tpu.ops.attention import (
        _xla_attention, fused_attention)
    rng = np.random.RandomState(0)
    BH, N, d = 6, 17, 8
    q = jnp.asarray(rng.randn(BH, N, d).astype(np.float32))
    k = jnp.asarray(rng.randn(BH, N, d).astype(np.float32))
    v = jnp.asarray(rng.randn(BH, N, d).astype(np.float32))
    scale = 1.0 / np.sqrt(d)
    out_f = fused_attention(q, k, v, scale)
    out_x = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=1e-5, rtol=1e-5)

    def loss(impl):
        return lambda q, k, v: (impl(q, k, v, scale) ** 2).sum()

    gf = jax.grad(loss(fused_attention), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss(_xla_attention), argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, err_msg=f"d{name}")


def test_conv_epilogue_matches_xla():
    from multimodal_baby_tpu.ops.conv_epilogue import (
        _xla_epilogue, conv1x1_bn_residual_relu)
    rng = np.random.RandomState(0)
    M, cin, cout = 64, 16, 32
    x = jnp.asarray(rng.randn(M, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(cin, cout).astype(np.float32) * 0.1)
    mul = jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5)
    add = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    res = jnp.asarray(rng.randn(M, cout).astype(np.float32))
    out_f = conv1x1_bn_residual_relu(x, w, mul, add, res)
    out_x = _xla_epilogue(x, w, mul, add, res)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=1e-5)
    assert float(jnp.min(out_f)) >= 0.0


# ---------------------------------------------------------------------------
# BN-folded bottleneck oracle (ops/bottleneck_hwbc.bottleneck_reference):
# the [B, H, W, C]-layout XLA reference every trunk-kernel variant is
# verified against must itself equal the flax BottleneckX module.
# ---------------------------------------------------------------------------

def _bottleneck_case(planes, H, cin, stride, has_ds, B=2, seed=0):
    import jax
    import jax.numpy as jnp
    from multimodal_baby_tpu.models.vision_resnext import BottleneckX
    from multimodal_baby_tpu.ops.bottleneck_hwbc import (
        bottleneck_reference, fold_block_params)

    m = BottleneckX(planes=planes, stride=stride, has_downsample=has_ds,
                    dtype=None)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, H, cin).astype(np.float32))
    v = m.init(jax.random.PRNGKey(planes), x, train=False)
    ref = m.apply(v, x, train=False)
    fw = fold_block_params(v["params"], v["batch_stats"], jnp.float32)
    scale = float(jnp.abs(ref).max())
    got_xla = bottleneck_reference(x, fw, stride=stride)
    assert float(jnp.abs(got_xla - ref).max()) / scale < 1e-5


def test_bottleneck_reference_matches_flax_block():
    """BN-folded reference == BottleneckX (grouped conv oracle),
    covering every packing regime: cg=4 (full-dense), cg=8, cg=32."""
    _bottleneck_case(64, 8, 256, 1, False)    # layer1 plain, nb=1
    _bottleneck_case(128, 8, 512, 1, False)   # layer2 plain, nb=2
    _bottleneck_case(512, 8, 2048, 1, False)  # layer4 plain, nb=8


def test_bottleneck_reference_downsample_and_stride():
    _bottleneck_case(64, 8, 64, 1, True)      # layer1 block0 (stride 1 ds)
    _bottleneck_case(128, 8, 256, 2, True)    # layer2 block0 (stride 2)
    _bottleneck_case(512, 8, 1024, 2, True)   # layer4 block0


def test_fused_infonce_metrics_match_reference():
    """The kernel's in-tile diagnostics equal the XLA metrics
    (contrastive_loss_from_logits) including nontrivial accuracies."""
    import jax
    import jax.numpy as jnp
    from multimodal_baby_tpu.models.losses import (
        contrastive_loss_from_logits)
    from multimodal_baby_tpu.ops.infonce import fused_infonce_with_metrics

    rng = np.random.RandomState(0)
    B, E = 16, 8
    base = rng.randn(B, E).astype(np.float32)
    img = jnp.asarray(base + 0.05 * rng.randn(B, E).astype(np.float32))
    txt = jnp.asarray(base)  # aligned pairs -> high accuracy
    nlt = jnp.asarray(1.5)
    loss, m = fused_infonce_with_metrics(img, txt, nlt)
    logits = jnp.exp(nlt) * (img @ txt.T)
    ref_loss, ref_m = contrastive_loss_from_logits(logits, logits.T)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    assert float(ref_m["image_accuracy"]) > 0.8  # the case is nontrivial
    for k in ref_m:
        np.testing.assert_allclose(float(m[k]), float(ref_m[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    # metrics don't break the gradient path
    g = jax.grad(lambda i: fused_infonce_with_metrics(i, txt, nlt)[0])(img)
    assert np.isfinite(np.asarray(g)).all()


def test_lstm_kernel_long_sequence_dispatch():
    """The recurrence kernel dispatches by sequence length (long-sequence
    kernel; the XLA scan wins at CVCL's L=25 — BENCH_NOTES scorecard)."""
    from multimodal_baby_tpu.models.layers import (
        FUSED_LSTM_MIN_LEN, _use_fused_lstm)
    # CPU backend -> always False, but the length gate is checked first
    assert not _use_fused_lstm((256, 25, 2048), 512)
    assert FUSED_LSTM_MIN_LEN > 25  # CVCL shapes stay on the scan


def test_fused_attention_kv_valid_masks_pad_keys():
    """kv_valid (MMB_VIT_PADSEQ support): pad key columns must be
    invisible — real-row outputs equal attention over the first kv_valid
    tokens alone, whatever garbage sits in the pad slots."""
    from multimodal_baby_tpu.ops.attention import fused_attention
    rng = np.random.RandomState(1)
    BH, N, d, valid = 4, 24, 8, 17
    q = jnp.asarray(rng.randn(BH, N, d).astype(np.float32))
    k = jnp.asarray(rng.randn(BH, N, d).astype(np.float32))
    v = jnp.asarray(rng.randn(BH, N, d).astype(np.float32))
    # poison the pad slots to prove they can't leak through
    k = k.at[:, valid:].set(1e3)
    v = v.at[:, valid:].set(-1e3)
    scale = 1.0 / np.sqrt(d)

    out = fused_attention(q, k, v, scale, valid)
    ref = fused_attention(q[:, :valid], k[:, :valid], v[:, :valid], scale)
    np.testing.assert_allclose(np.asarray(out[:, :valid]),
                               np.asarray(ref), atol=1e-5, rtol=1e-5)

    # backward: real-row cotangents produce the unpadded gradients
    def loss(q, k, v):
        return (fused_attention(q, k, v, scale, valid)[:, :valid] ** 2
                ).sum()

    def loss_ref(q, k, v):
        return (fused_attention(q[:, :valid], k[:, :valid],
                                v[:, :valid], scale) ** 2).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, err_msg=f"d{name}")


def test_fused_attention_pairs_matches_einsum_oracle():
    """Pair-packed layout-native attention (ops/attention.py): the +/-
    score-separation trick and the lane-masked value recombination must
    reproduce per-head softmax attention exactly (f32, interpret mode)."""
    from multimodal_baby_tpu.ops.attention import (
        _xla_attention_pairs, fused_attention_pairs)
    rng = np.random.RandomState(2)
    B, N, H, d = 2, 10, 4, 64
    C = H * d
    q, k, v = (jnp.asarray(rng.randn(B, N, C).astype(np.float32))
               for _ in range(3))
    scale = d ** -0.5
    out = fused_attention_pairs(q, k, v, H, scale)
    ref = _xla_attention_pairs(q, k, v, H, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # kv_valid: poisoned pad rows must be invisible to real queries
    valid = 7
    kp = k.at[:, valid:].set(1e3)
    vp = v.at[:, valid:].set(-1e3)
    out = fused_attention_pairs(q, kp, vp, H, scale, valid)
    ref = _xla_attention_pairs(q[:, :valid], k[:, :valid], v[:, :valid],
                               H, scale)
    np.testing.assert_allclose(np.asarray(out[:, :valid]), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # backward (rematerialized XLA VJP) against direct autodiff
    def loss(q, k, v):
        return (fused_attention_pairs(q, k, v, H, scale) ** 2).sum()

    def loss_ref(q, k, v):
        return (_xla_attention_pairs(q, k, v, H, scale) ** 2).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, err_msg=f"d{name}")


def test_fused_attention_pairs_vit_dispatch_parity():
    """MMB_FUSED_ATTN=pairs through the real ViT block: the gate only
    engages on TPU, so force the kernel path by calling it directly with
    the block's qkv layout and compare against the block's einsum path."""
    from multimodal_baby_tpu.ops.attention import (
        fused_attention_pairs, should_fuse_attention_pairs)
    assert should_fuse_attention_pairs(257, 12, 64)
    assert not should_fuse_attention_pairs(257, 12, 96)   # head_dim != 64
    assert not should_fuse_attention_pairs(257, 11, 64)   # odd head count
    rng = np.random.RandomState(3)
    B, N, H, d = 2, 9, 6, 64
    C = H * d
    qkv = jnp.asarray(rng.randn(B, N, 3 * C).astype(np.float32))
    scale = d ** -0.5
    # the ViT einsum path's math on the same qkv tensor
    r = qkv.reshape(B, N, 3, H, d)
    q5, k5, v5 = r[:, :, 0], r[:, :, 1], r[:, :, 2]
    attn = jnp.einsum("bqhd,bkhd->bhqk", q5, k5) * scale
    attn = jax.nn.softmax(attn, axis=-1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", attn, v5).reshape(B, N, C)
    out = fused_attention_pairs(qkv[:, :, :C], qkv[:, :, C:2 * C],
                                qkv[:, :, 2 * C:], H, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_qkv_attention_pairs_matches_oracle():
    """qkv-folded pair-packed attention (ops/attention.py): the in-kernel
    projection + attention must reproduce project-then-attend exactly
    (f32, interpret mode), including bias, kv_valid masking, and grads
    through the XLA-reference VJP."""
    from multimodal_baby_tpu.ops.attention import (
        _xla_qkv_attention_pairs, fused_qkv_attention_pairs,
        should_fuse_qkv_attention_pairs)
    assert should_fuse_qkv_attention_pairs(272, 12, 64)
    assert not should_fuse_qkv_attention_pairs(272, 12, 96)

    rng = np.random.RandomState(4)
    B, N, H, d = 2, 10, 4, 64
    C = H * d
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    w = jnp.asarray((rng.randn(C, 3 * C) / np.sqrt(C)).astype(np.float32))
    b = jnp.asarray(rng.randn(3 * C).astype(np.float32) * 0.1)
    scale = d ** -0.5

    out = fused_qkv_attention_pairs(x, w, b, H, scale)
    ref = _xla_qkv_attention_pairs(x, w, b, H, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # no-bias path
    out0 = fused_qkv_attention_pairs(x, w, None, H, scale)
    ref0 = _xla_qkv_attention_pairs(x, w, None, H, scale)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0),
                               atol=1e-5, rtol=1e-5)

    # kv_valid: poisoned pad tokens in x must be invisible to real queries
    valid = 7
    xp = x.at[:, valid:].set(1e3)
    out = fused_qkv_attention_pairs(xp, w, b, H, scale, valid)
    ref = _xla_qkv_attention_pairs(x[:, :valid], w, b, H, scale)
    np.testing.assert_allclose(np.asarray(out[:, :valid]),
                               np.asarray(ref), atol=1e-4, rtol=1e-4)

    # grads flow through the XLA-reference VJP for every operand
    def f(x, w, b):
        return (fused_qkv_attention_pairs(x, w, b, H, scale) ** 2).sum()

    def f_ref(x, w, b):
        return (_xla_qkv_attention_pairs(x, w, b, H, scale) ** 2).sum()

    gx, gw, gb = jax.grad(f, argnums=(0, 1, 2))(x, w, b)
    rx, rw, rb = jax.grad(f_ref, argnums=(0, 1, 2))(x, w, b)
    for g, r in ((gx, rx), (gw, rw), (gb, rb)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)


def test_qkv_fold_param_tree_matches_dense():
    """The fused-qkv branch declares the qkv params via _DenseParams: the
    tree must be byte-identical (names, shapes, dtypes, init) to the
    nn.Dense the unfused path creates, so checkpoints interchange."""
    import flax.linen as nn
    from multimodal_baby_tpu.models.vision_vit import _DenseParams

    C = 64
    dense = nn.Dense(3 * C)
    alias = _DenseParams(C, 3 * C, use_bias=True)
    k = jax.random.PRNGKey(0)
    pd = dense.init(k, jnp.zeros((1, C)))["params"]
    pa = alias.init(k)["params"]
    assert set(pd) == set(pa) == {"kernel", "bias"}
    for name in pd:
        assert pd[name].shape == pa[name].shape
        assert pd[name].dtype == pa[name].dtype
        # same init distribution and rng fold -> identical values
        np.testing.assert_array_equal(np.asarray(pd[name]),
                                      np.asarray(pa[name]))


def test_fused_mlp_matches_oracle():
    """Fused ViT MLP kernel (ops/vit_mlp.py): LN + fc1 + GELU + fc2 +
    residual in one program must reproduce the block math (f32,
    interpret mode) for every GELU form, and grads must flow through the
    XLA-reference VJP."""
    from multimodal_baby_tpu.ops.vit_mlp import (
        _xla_mlp, fused_mlp, should_fuse_mlp)
    assert should_fuse_mlp(272, 768, 3072)
    assert not should_fuse_mlp(272, 768, 3070)   # chunk misalignment

    rng = np.random.RandomState(5)
    B, N, C, F = 2, 10, 128, 512
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    gs = jnp.asarray(1.0 + 0.1 * rng.randn(C).astype(np.float32))
    gb = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    w1 = jnp.asarray((rng.randn(C, F) / np.sqrt(C)).astype(np.float32))
    b1 = jnp.asarray(0.1 * rng.randn(F).astype(np.float32))
    w2 = jnp.asarray((rng.randn(F, C) / np.sqrt(F)).astype(np.float32))
    b2 = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))

    for mode in ("erf", "tanh", "sigmoid"):
        out = fused_mlp(x, gs, gb, w1, b1, w2, b2, 1e-6, mode)
        ref = _xla_mlp(x, gs, gb, w1, b1, w2, b2, 1e-6, mode)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    # the erf form equals the flax block math it replaces
    import flax.linen as nn
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = jnp.square(x32).mean(-1, keepdims=True) - jnp.square(mu)
    xn = (x32 - mu) * jax.lax.rsqrt(var + 1e-6) * gs + gb
    ref_flax = x + (nn.gelu(xn @ w1 + b1, approximate=False) @ w2 + b2)
    out = fused_mlp(x, gs, gb, w1, b1, w2, b2, 1e-6, "erf")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_flax),
                               atol=2e-5, rtol=2e-5)

    def f(*a):
        return (fused_mlp(*a, 1e-6, "erf") ** 2).sum()

    def f_ref(*a):
        from multimodal_baby_tpu.ops.vit_mlp import _xla_mlp as m
        return (m(*a, eps=1e-6, gelu_mode="erf") ** 2).sum()

    gots = jax.grad(f, argnums=tuple(range(7)))(x, gs, gb, w1, b1, w2, b2)
    refs = jax.grad(f_ref, argnums=tuple(range(7)))(x, gs, gb, w1, b1,
                                                    w2, b2)
    for g, r in zip(gots, refs):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)


def test_erf_rational_matches_lax_erf():
    """The Mosaic-lowerable rational erf (A&S 7.1.26) used inside the
    fused-MLP kernel. Three measured claims the erf-faithful combo ladder
    rests on: (1) max |delta erf| <= 6e-7 on f32; (2) the kernel GELU's
    absolute error is <= 1e-6 everywhere; (3) bf16 GELU outputs are
    >= 99% bit-identical to the lax.erf form on the live range |h| <= 4
    and every live-range disagreement is exactly one bf16 ulp (the
    ~4e-7 f32 delta occasionally straddles a bf16 rounding boundary);
    larger disagreements are confined to the dead tail where
    |GELU(h)| < 2e-6 (catastrophic cancellation in 1+erf for h << 0
    turns absolute erf error into large *relative* error there, but
    those outputs are below one bf16 ulp of any O(1) activation)."""
    from multimodal_baby_tpu.ops.vit_mlp import _erf_rational_f32, _gelu_f32
    x = jnp.asarray(np.linspace(-12.0, 12.0, 200001, dtype=np.float32))
    got = np.asarray(_erf_rational_f32(x))
    ref = np.asarray(jax.lax.erf(x))
    assert np.max(np.abs(got - ref)) <= 6e-7

    h = jnp.asarray(np.linspace(-12.0, 12.0, 200001, dtype=np.float32))
    g_kern_f32 = np.asarray(_gelu_f32(h, "erf", in_kernel=True))
    g_ref_f32 = np.asarray(_gelu_f32(h, "erf", in_kernel=False))
    # tail delta is dominated by lax.erf's OWN f32 rounding (at h=+-12,
    # lax.erf gives 1+erf ~ 1.8e-7 where the true value is ~1e-32; the
    # kernel's erfc branch returns the exact 0 there)
    assert np.max(np.abs(g_kern_f32 - g_ref_f32)) <= 2.5e-6

    g_kern_bf = np.asarray(jnp.asarray(g_kern_f32).astype(jnp.bfloat16)
                           .astype(jnp.float32))
    g_ref_bf = np.asarray(jnp.asarray(g_ref_f32).astype(jnp.bfloat16)
                          .astype(jnp.float32))
    disagree = g_kern_bf != g_ref_bf
    live = np.abs(np.asarray(h)) <= 4.0
    agree_rate = 1.0 - float(np.sum(disagree & live)) / float(np.sum(live))
    assert agree_rate >= 0.99, agree_rate
    d_live = disagree & live
    rel = (np.abs(g_kern_bf[d_live] - g_ref_bf[d_live])
           / np.maximum(np.abs(g_ref_f32[d_live]), 1e-30))
    assert np.all(rel <= 2.0 ** -7), rel.max()       # one bf16 ulp
    # tail (h < -4) disagreements sit in the cancellation zone and can
    # exceed one ulp *relatively*, but only where the output itself is
    # numerically dead: |GELU(h)| < 2e-4 (GELU(-4) = -1.27e-4 bounds the
    # zone; the absolute delta is <= 2.5e-6 everywhere per above)
    tail = disagree & ~live
    assert np.all(np.abs(g_ref_f32[tail]) < 2e-4)


def test_fused_block_attention_matches_oracle():
    """Whole-attention-half kernel (ops/attention.py): LN + qkv +
    pair-packed attention + out-proj + residual in one program vs the
    same math in XLA ops, plus kv_valid and grads."""
    from multimodal_baby_tpu.ops.attention import (
        _xla_block_attention, fused_block_attention,
        should_fuse_block_attention)
    assert should_fuse_block_attention(272, 12, 64)

    rng = np.random.RandomState(6)
    B, N, H, d = 2, 10, 4, 64
    C = H * d
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    gs = jnp.asarray(1.0 + 0.1 * rng.randn(C).astype(np.float32))
    gb = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    wq = jnp.asarray((rng.randn(C, 3 * C) / np.sqrt(C)).astype(np.float32))
    bq = jnp.asarray(0.1 * rng.randn(3 * C).astype(np.float32))
    wp = jnp.asarray((rng.randn(C, C) / np.sqrt(C)).astype(np.float32))
    bp = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    scale = d ** -0.5

    args = (x, gs, gb, wq, bq, wp, bp)
    out = fused_block_attention(*args, H, scale)
    ref = _xla_block_attention(*args, num_heads=H, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # kv_valid: pad tokens must not contaminate real-token outputs
    valid = 7
    xp = x.at[:, valid:].set(1e3)
    out = fused_block_attention(xp, gs, gb, wq, bq, wp, bp, H, scale,
                                valid)
    ref = _xla_block_attention(x[:, :valid], gs, gb, wq, bq, wp, bp,
                               num_heads=H, scale=scale)
    np.testing.assert_allclose(np.asarray(out[:, :valid]),
                               np.asarray(ref), atol=1e-4, rtol=1e-4)

    def f(*a):
        return (fused_block_attention(*a, H, scale) ** 2).sum()

    def f_ref(*a):
        from multimodal_baby_tpu.ops.attention import _xla_block_attention
        return (_xla_block_attention(*a, num_heads=H,
                                     scale=scale) ** 2).sum()

    gots = jax.grad(f, argnums=tuple(range(7)))(*args)
    refs = jax.grad(f_ref, argnums=tuple(range(7)))(*args)
    for g, r in zip(gots, refs):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)


def test_block_attention_smax_and_bm_knobs(monkeypatch):
    """MMB_ATTN_SMAX=defer (divide after the value contraction) must
    stay within the kernel's bf16 envelope of the exact form, and
    MMB_VIT_BLOCK_BM>1 (several images per program) must be
    bit-identical to bm=1 — it only re-tiles the grid."""
    from multimodal_baby_tpu.ops.attention import fused_block_attention

    rng = np.random.RandomState(11)
    B, N, H, d = 4, 16, 4, 64
    C = H * d
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32)
                    ).astype(jnp.bfloat16)
    gs = jnp.asarray(1.0 + 0.1 * rng.randn(C).astype(np.float32))
    gb = jnp.asarray(0.1 * rng.randn(C).astype(np.float32))
    wq = jnp.asarray((rng.randn(C, 3 * C) / np.sqrt(C)
                      ).astype(np.float32)).astype(jnp.bfloat16)
    bq = jnp.asarray(0.1 * rng.randn(3 * C).astype(np.float32)
                     ).astype(jnp.bfloat16)
    wp = jnp.asarray((rng.randn(C, C) / np.sqrt(C)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    bp = jnp.asarray(0.1 * rng.randn(C).astype(np.float32)
                     ).astype(jnp.bfloat16)
    scale = d ** -0.5
    args = (x, gs, gb, wq, bq, wp, bp)

    monkeypatch.setenv("MMB_ATTN_SMAX", "")   # exact form, explicitly
    base = np.asarray(fused_block_attention(*args, H, scale, 14),
                      np.float32)

    monkeypatch.setenv("MMB_ATTN_SMAX", "defer")
    defer = np.asarray(fused_block_attention(*args, H, scale, 14),
                       np.float32)
    monkeypatch.setenv("MMB_ATTN_SMAX", "")
    rel = np.abs(defer - base).max() / np.abs(base).max()
    assert rel < 1e-2, rel

    monkeypatch.setenv("MMB_VIT_BLOCK_BM", "2")
    bm2 = np.asarray(fused_block_attention(*args, H, scale, 14),
                     np.float32)
    assert np.array_equal(bm2, base)
    # non-divisor bm falls back to 1
    monkeypatch.setenv("MMB_VIT_BLOCK_BM", "3")
    bm3 = np.asarray(fused_block_attention(*args, H, scale, 14),
                     np.float32)
    assert np.array_equal(bm3, base)


def test_block_attention_param_tree_matches_vit():
    """The fused-block branch's _AttnParams/_LNParams aliases must
    declare the exact param tree ViTBlock's unfused path creates."""
    from multimodal_baby_tpu.models.vision_vit import ViTBlock
    blk = ViTBlock(dim=128, num_heads=2)
    x = jnp.zeros((1, 9, 128))
    tree = jax.tree_util.tree_map(
        lambda a: (a.shape, str(a.dtype)),
        blk.init(jax.random.PRNGKey(0), x)["params"])
    # what the fused path consumes: norm1/{scale,bias},
    # attn/qkv/{kernel,bias}, attn/proj/{kernel,bias} + the MLP names
    assert set(tree) == {"norm1", "norm2", "attn", "fc1", "fc2"}
    assert set(tree["attn"]) == {"qkv", "proj"}
    assert tree["attn"]["qkv"]["kernel"] == ((128, 384), "float32")
    assert tree["attn"]["proj"]["kernel"] == ((128, 128), "float32")
    assert set(tree["norm1"]) == {"scale", "bias"}


def test_fused_vit_block_matches_oracle_and_composition():
    """Whole-ViT-block kernel (ops/vit_block.py): both halves in one
    program must (a) reproduce the composed XLA reference, (b) equal the
    block-attention kernel -> fused-MLP kernel composition BITWISE in
    bf16 (the kernel rounds the inter-half tensor through bf16 exactly
    like the two-kernel path's HBM write), (c) mask pad keys via
    kv_valid, and (d) flow grads through the XLA-reference VJP."""
    from multimodal_baby_tpu.ops.attention import fused_block_attention
    from multimodal_baby_tpu.ops.vit_block import (
        _xla_vit_block, fused_vit_block, should_fuse_vit_block)
    from multimodal_baby_tpu.ops.vit_mlp import fused_mlp
    assert should_fuse_vit_block(272, 12, 64, 3072)
    assert not should_fuse_vit_block(272, 12, 64, 3070)

    rng = np.random.RandomState(11)
    B, N, H, d, F = 2, 10, 2, 64, 512
    C = H * d
    scale = d ** -0.5

    def arr(*shape, s=1.0):
        return jnp.asarray((s * rng.randn(*shape)).astype(np.float32))

    x = arr(B, N, C)
    g1, gb1 = 1.0 + arr(C, s=0.1), arr(C, s=0.1)
    wq, bq = arr(C, 3 * C, s=C ** -0.5), arr(3 * C, s=0.1)
    wp, bp = arr(C, C, s=C ** -0.5), arr(C, s=0.1)
    g2, gb2 = 1.0 + arr(C, s=0.1), arr(C, s=0.1)
    w1, b1 = arr(C, F, s=C ** -0.5), arr(F, s=0.1)
    w2, b2 = arr(F, C, s=F ** -0.5), arr(C, s=0.1)
    args = (x, g1, gb1, wq, bq, wp, bp, g2, gb2, w1, b1, w2, b2)

    for mode in ("erf", "tanh"):
        out = fused_vit_block(*args, H, scale, None, 1e-6, mode)
        ref = _xla_vit_block(*args, num_heads=H, scale=scale,
                             gelu_mode=mode)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=3e-5)

    # (b) bf16 bit-equality with the two-kernel composition
    xb = x.astype(jnp.bfloat16)
    fused = fused_vit_block(xb, g1, gb1, wq, bq, wp, bp, g2, gb2, w1,
                            b1, w2, b2, H, scale)
    y = fused_block_attention(xb, g1, gb1, wq, bq, wp, bp, H, scale)
    composed = fused_mlp(y, g2, gb2, w1, b1, w2, b2, 1e-6, "erf")
    np.testing.assert_array_equal(
        np.asarray(fused).view(np.uint16),
        np.asarray(composed).view(np.uint16))

    # (c) kv_valid: pad tokens must not contaminate real-token outputs
    valid = 7
    xp = x.at[:, valid:].set(1e3)
    out = fused_vit_block(xp, *args[1:], H, scale, valid)
    ref = _xla_vit_block(x[:, :valid], *args[1:], num_heads=H,
                         scale=scale)
    np.testing.assert_allclose(np.asarray(out[:, :valid]),
                               np.asarray(ref), atol=1e-4, rtol=1e-4)

    # (d) grads vs the composed XLA reference
    def f(*a):
        return (fused_vit_block(*a, H, scale) ** 2).sum()

    def f_ref(*a):
        return (_xla_vit_block(*a, num_heads=H, scale=scale) ** 2).sum()

    gots = jax.grad(f, argnums=tuple(range(13)))(*args)
    refs = jax.grad(f_ref, argnums=tuple(range(13)))(*args)
    for g, r in zip(gots, refs):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)


def test_fused_vit_block_param_tree_matches_vit():
    """The MMB_VIT_BLOCK=1 dispatch consumes the exact param tree the
    unfused ViTBlock path creates (norm1/attn/norm2/fc1/fc2)."""
    import os
    from unittest import mock
    from multimodal_baby_tpu.models.vision_vit import ViTBlock
    blk = ViTBlock(dim=128, num_heads=2)
    x = jnp.zeros((1, 9, 128))
    base = blk.init(jax.random.PRNGKey(0), x)["params"]
    with mock.patch.dict(os.environ, {"MMB_VIT_BLOCK": "1"}):
        fused = blk.init(jax.random.PRNGKey(0), x)["params"]
    bt = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), base)
    ft = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), fused)
    assert bt == ft
