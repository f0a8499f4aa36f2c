"""Grouped 3x3 conv formulations A/B (VERDICT round-2 lever c).

The trunk's 32-group 3x3 convs (ResNeXt50 conv2, reference
multimodal/multimodal.py:88-104 frozen trunk) currently run either as
XLA's native grouped conv (feature_group_count=32) or, inside the fused
Pallas trunk, as nine accumulating K=128 dots over BLOCK-DIAGONAL packed
weights (8 groups x 16ch per 128-lane block — 8x the group FLOPs, but at
MXU peak). This probe measures the third formulation the round-2 verdict
asked for: groups as a BATCH dimension of one dot_general
(9 taps x batched [32, m, 16] @ [32, 16, 16] — exact group FLOPs, tiny
K=N=16 per batch element).

Shapes: layer-2 body block (width 512, 28x28) and layer-1 body block
(width 128, 56x56) at B=256.

Measurement per the verify-skill gotchas: 10 reps folded into one jit,
carry perturbs the small operand, burn-in fetch before timing.
"""
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, reps=10):
    run = jax.jit(functools.partial(fn, reps=reps))
    float(jnp.asarray(run(*args)).sum())          # compile + tunnel burn
    t0 = time.perf_counter()
    float(jnp.asarray(run(*args)).sum())
    return (time.perf_counter() - t0) / reps * 1e3


def make_case(B, HW, width, groups=32):
    cg = width // groups
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, HW, HW, width), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, cg, width) * 0.05, jnp.bfloat16)
    return x, w, cg


def conv_xla(x, w, *, reps):
    """XLA native grouped conv, SAME padding stride 1."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    def body(c, _):
        y = jax.lax.conv_general_dilated(
            x + c, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            feature_group_count=w.shape[3] // w.shape[2])
        return c + 1e-6, y.mean()
    _, ys = jax.lax.scan(body, jnp.bfloat16(0), None, length=reps)
    return ys


def conv_batched_dg(x, w, *, reps):
    """Groups as a batch dim: 9 taps x dot_general([32, m, 16],[32,16,16]).

    Exact group FLOPs (no block-diagonal 8x inflation); K=N=16 per batch
    element, so each MXU pass uses 16 of 128 lanes unless XLA's batched
    matmul tiler packs batch elements together.
    """
    B, H, W, width = x.shape
    cg = w.shape[2]
    G = width // cg
    # [3, 3, G, cg, cg]: per-tap per-group dense kernels
    wg = w.reshape(3, 3, cg, G, cg).transpose(0, 1, 3, 2, 4)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def one(xin):
        # [B,H,W,G,cg] -> [G, B*H*W, cg]
        xg = xin.reshape(B, H + 2, W + 2, G, cg)
        acc = None
        for dy in range(3):
            for dx in range(3):
                tap = jax.lax.dynamic_slice(
                    xg, (0, dy, dx, 0, 0), (B, H, W, G, cg))
                lhs = tap.reshape(B * H * W, G, cg).transpose(1, 0, 2)
                y = jax.lax.dot_general(
                    lhs, wg[dy, dx],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
        return acc.astype(x.dtype)

    def body(c, _):
        y = one(xp + c)
        return c + 1e-6, y.mean()
    _, ys = jax.lax.scan(body, jnp.bfloat16(0), None, length=reps)
    return ys


def conv_blockdiag_dg(x, w, *, reps):
    """Block-diagonal packing at the XLA level (the fused kernel's
    formulation, BS=128): 9 taps x dense [m, 128] @ [128, 128] per
    128-channel block — 8x group FLOPs at full MXU lanes."""
    B, H, W, width = x.shape
    cg = w.shape[2]
    G = width // cg
    BS = min(128, width)
    gpb = BS // cg
    nb = width // BS
    # dense per-block kernels [9, nb, 128, 128]
    # kernel w[ky, kx, cg, width] is column-grouped: group g = b*gpb + t
    # occupies block b's diagonal slot t. Reshape/broadcast algebra (no
    # gathers — the in-graph fold lesson from BENCH_NOTES).
    wg2 = w.astype(jnp.float32).reshape(3, 3, cg, nb, gpb, cg)
    eye = jnp.eye(gpb, dtype=jnp.float32)
    wd = jnp.einsum("st,yxcbto->yxbscto", eye, wg2).reshape(
        3, 3, nb, BS, BS).astype(jnp.bfloat16)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def one(xin):
        m = B * H * W
        acc = jnp.zeros((m, width), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = jax.lax.dynamic_slice(
                    xin, (0, dy, dx, 0), (B, H, W, width)).reshape(m, width)
                for b in range(nb):
                    y = jnp.dot(tap[:, b * BS:(b + 1) * BS], wd[dy, dx, b],
                                preferred_element_type=jnp.float32)
                    acc = acc.at[:, b * BS:(b + 1) * BS].add(y)
        return acc.astype(x.dtype)

    def body(c, _):
        y = one(xp + c)
        return c + 1e-6, y.mean()
    _, ys = jax.lax.scan(body, jnp.bfloat16(0), None, length=reps)
    return ys


def check_equiv(B=2, HW=8, width=64):
    x, w, _ = make_case(B, HW, width)
    a = jax.jit(functools.partial(conv_xla, reps=1))(x, w)
    b = jax.jit(functools.partial(conv_batched_dg, reps=1))(x, w)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0, atol=2e-2)
    print("equivalence ok (batched_dg == xla grouped conv)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    check_equiv()
    for name, (B, HW, width) in (
        ("layer1 body (56x56, width 128)", (256, 56, 128)),
        ("layer2 body (28x28, width 512)", (256, 28, 512)),
    ):
        x, w, cg = make_case(B, HW, width)
        t_xla = timed(conv_xla, x, w)
        t_bdg = timed(conv_batched_dg, x, w)
        t_blk = timed(conv_blockdiag_dg, x, w)
        print(f"{name}: xla grouped {t_xla:.2f} ms | "
              f"batched dot_general {t_bdg:.2f} ms | "
              f"block-diag dense {t_blk:.2f} ms")
