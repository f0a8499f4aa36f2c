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
