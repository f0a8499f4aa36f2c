"""On-device augmentation: matmul-form resample == direct bilinear
sampling; blur/no-blur distribution mechanics; normalization."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.core.constants import IMAGENET_MEAN, IMAGENET_STD
from multimodal_baby_tpu.data.augment import (
    _interp_matrices, augment_batch, normalize_image)


def bilinear_sample_reference(img, ys, xs):
    """Direct gather bilinear sampling at (ys, xs) grid (edge-clamped)."""
    H, W, C = img.shape
    ys = np.clip(ys, 0, H - 1)
    xs = np.clip(xs, 0, W - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def test_interp_matrix_matches_gather_bilinear():
    rng = np.random.RandomState(0)
    H = W = 48
    out = 16
    img = rng.randn(H, W, 3).astype(np.float32)
    ys = np.linspace(3.2, 40.7, out).astype(np.float32)
    xs = np.linspace(0.0, 47.0, out).astype(np.float32)

    ry = np.asarray(_interp_matrices(jnp.asarray(ys)[None], H))[0]
    cx = np.asarray(_interp_matrices(jnp.asarray(xs)[None], W))[0]
    got = np.einsum("qw,owc->oqc", cx,
                    np.einsum("oh,hwc->owc", ry, img))
    want = bilinear_sample_reference(img, ys, xs)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_augment_batch_properties():
    rng = np.random.RandomState(0)
    B = 8
    u8 = jnp.asarray(rng.randint(0, 256, (B, 64, 64, 3), np.uint8))
    out = augment_batch(jax.random.PRNGKey(0), u8, out_size=32,
                        augment=True)
    assert out.shape == (B, 32, 32, 3)
    assert out.dtype == jnp.float32
    # different keys give different augmentations
    out2 = augment_batch(jax.random.PRNGKey(1), u8, out_size=32,
                         augment=True)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 0.01
    # same key deterministic
    out3 = augment_batch(jax.random.PRNGKey(0), u8, out_size=32,
                         augment=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out3))


def test_no_augment_is_exact_normalize():
    rng = np.random.RandomState(1)
    u8 = rng.randint(0, 256, (2, 32, 32, 3), np.uint8)
    out = augment_batch(jax.random.PRNGKey(0), jnp.asarray(u8),
                        out_size=32, augment=False)
    want = (u8.astype(np.float32) / 255.0
            - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_normalize_image_float_passthrough():
    x = np.full((1, 4, 4, 3), 0.5, np.float32)
    out = np.asarray(normalize_image(jnp.asarray(x)))
    want = (0.5 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(out[0, 0, 0], want, atol=1e-6)


def test_augment_output_range_is_normalized():
    """Augmented uint8 input must land in normalized-image range (the /255
    must happen; regression for a scaling bug)."""
    rng = np.random.RandomState(2)
    u8 = jnp.asarray(rng.randint(0, 256, (4, 48, 48, 3), np.uint8))
    out = np.asarray(augment_batch(jax.random.PRNGKey(0), u8,
                                   out_size=32, augment=True))
    # ImageNet-normalized pixels live in roughly [-2.5, 2.8]
    assert out.min() > -3.0 and out.max() < 3.0


def test_blur_matrices_banded_equals_dense_formula():
    """The banded Toeplitz construction must reproduce the dense
    formulation (exp over [B, s, s], band-truncate, row-normalize,
    identity rows for the no-blur half) it replaced."""
    from multimodal_baby_tpu.data.augment import _blur_matrices

    def dense_formula(key_p, key_s, batch, size):
        sigmas = jax.random.uniform(key_s, (batch,), minval=0.1,
                                    maxval=2.0)
        do_blur = jax.random.bernoulli(key_p, 0.5, (batch,))
        grid = jnp.arange(size, dtype=jnp.float32)
        d = grid[None, :, None] - grid[None, None, :]
        g = jnp.exp(-0.5 * (d / sigmas[:, None, None]) ** 2)
        g = jnp.where(jnp.abs(d) > 6.0, 0.0, g)
        g = g / g.sum(-1, keepdims=True)
        eye = jnp.eye(size)[None]
        return jnp.where(do_blur[:, None, None], g, eye)

    for seed, size in [(0, 32), (1, 48), (2, 224)]:
        kp, ks = jax.random.split(jax.random.PRNGKey(seed))
        want = np.asarray(dense_formula(kp, ks, 8, size))
        got = np.asarray(_blur_matrices(kp, ks, 8, size))
        # same exp taps, different normalization-sum association
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=2e-6)
        # rows sum to 1 (incl. the edge-truncated first/last 6 rows)
        np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)
        # band structure: nothing beyond radius 6
        d = np.abs(np.arange(size)[:, None] - np.arange(size)[None, :])
        assert np.all(got[:, d > 6] == 0.0)


def test_csplit_matches_batched_einsum(monkeypatch):
    """MMB_AUG_CSPLIT=1 (per-channel resample matmuls, built to kill
    the channel-broadcast of the column matrix XLA materializes for the
    batched form — round-4 trace) must reproduce the default path.
    Same contraction order over the same bf16 operands; only the
    batching shape differs, so agreement is to bf16-accumulation noise."""
    key = jax.random.PRNGKey(7)
    imgs = jax.random.randint(
        jax.random.PRNGKey(3), (8, 64, 64, 3), 0, 256, dtype=jnp.int32
    ).astype(jnp.uint8)
    want = augment_batch(key, imgs, out_size=32, dtype=jnp.bfloat16)
    monkeypatch.setenv("MMB_AUG_CSPLIT", "1")
    jax.clear_caches()  # flag is read at trace time
    got = augment_batch(key, imgs, out_size=32, dtype=jnp.bfloat16)
    monkeypatch.delenv("MMB_AUG_CSPLIT")
    jax.clear_caches()
    assert got.shape == want.shape == (8, 32, 32, 3)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05, rtol=0.05)
