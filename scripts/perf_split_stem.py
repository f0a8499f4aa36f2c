"""Front-end lever probe: split-matrix augment -> free s2d -> 4x4 stem.

Round-3 found the s2d stem (7x7/s2 re-expressed as 4x4/s1 over 12
channels) LOSES ~2% end-to-end when fed by an explicit space-to-depth
transpose of the augment output (BENCH_NOTES "Space-to-depth stem:
negative result"). This probe separates the two suspects:

  A. the s2d *transpose* (XLA layout copy of the 224px tensor), vs
  B. the 4x4/s1 C_in=12 *conv lowering* itself.

The fix under test: the augment's final resample matmuls can emit the
s2d layout FOR FREE — slice the composed row/col matrices into even/odd
output taps (pure row slicing of [B, 224, in] matrices, no data
movement) and run 4 half-sized einsums producing x_ij [B, 112, 112, 3];
concatenating channel-wise gives exactly the (i, j, c) s2d channel
order with zero transposes. Same total FLOPs as the 2-einsum augment.

Timed at bench shapes (B=256, bf16, u8 256px frames):
  1. current augment (2 einsums) + current 7x7 stem chain  [baseline]
  2. pre-s2d input -> 4x4 conv chain (conv lowering alone)
  3. split augment (4 einsums + concat)     vs current augment
  4. split augment -> 4x4 stem chain, end to end from frames

Chains all end at the fused-trunk entry layout (bn+relu+maxpool+
to_hwbc) so the numbers are drop-in comparable.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_baby_tpu.core.constants import IMAGENET_MEAN, IMAGENET_STD
from multimodal_baby_tpu.data import augment as aug
from multimodal_baby_tpu.ops.bottleneck_hwbc import to_hwbc

B = int(os.environ.get("B", "256"))
IN = 256
OUT = 224


def timed(fn, *args, n=10, reps=3):
    @jax.jit
    def loop(*args):
        def body(c, k):
            out = fn(jax.random.fold_in(k, c), *args)
            s = jnp.asarray(out, jnp.float32).ravel()[0]
            return (c + 1), s
        _, outs = jax.lax.scan(body, jnp.int32(0),
                               jax.random.split(jax.random.PRNGKey(1), n))
        return outs
    out = loop(*args)
    _ = float(np.asarray(out)[-1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = loop(*args)
    _ = float(np.asarray(out)[-1])
    return (time.perf_counter() - t0) / (reps * n) * 1e3


def make_matrices(key, frames):
    """The augment's composed per-image resample matrices (blur folded),
    bf16 — identical math to augment_batch, factored out so both augment
    variants consume the same matrices."""
    Bn, H, W, _ = frames.shape
    k_crop, k_blur_p, k_blur_s, k_flip = jax.random.split(key, 4)
    boxes = jax.vmap(lambda k: aug._sample_crop_box(k, (H, W)))(
        jax.random.split(k_crop, Bn))
    y0, x0, h, w = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    o = jnp.arange(OUT, dtype=jnp.float32) + 0.5
    ys = y0[:, None] + o[None, :] * (h / OUT)[:, None] - 0.5
    xs = x0[:, None] + o[None, :] * (w / OUT)[:, None] - 0.5
    do_flip = jax.random.bernoulli(k_flip, 0.5, (Bn,))
    xs = jnp.where(do_flip[:, None], xs[:, ::-1], xs)
    ry = aug._interp_matrices(jnp.clip(ys, 0.0, H - 1.0), H)
    cx = aug._interp_matrices(jnp.clip(xs, 0.0, W - 1.0), W)
    gy = aug._blur_matrices(k_blur_p, k_blur_s, Bn, OUT)
    ry, cx, gy = (m.astype(jnp.bfloat16) for m in (ry, cx, gy))
    a_row = jnp.einsum("bpo,boh->bph", gy, ry)
    a_col = jnp.einsum("bsq,bqw->bsw", gy, cx)
    return a_row, a_col


def augment_current(a_row, a_col, frames):
    f = (frames.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
    x = jnp.einsum("bph,bhwc->bpwc", a_row, f)
    x = jnp.einsum("bsw,bpwc->bpsc", a_col, x)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.bfloat16)
    std = jnp.asarray(IMAGENET_STD, jnp.bfloat16)
    return (x - mean) / std


def augment_split(a_row, a_col, frames):
    """4 half-einsums -> s2d slots, channel-concat -> [B,112,112,12]."""
    f = (frames.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.bfloat16)
    std = jnp.asarray(IMAGENET_STD, jnp.bfloat16)
    rows = [jnp.einsum("bph,bhwc->bpwc", a_row[:, i::2], f)
            for i in range(2)]                       # 2 x [B,112,W,3]
    slots = []
    for i in range(2):
        for j in range(2):
            xij = jnp.einsum("bsw,bpwc->bpsc", a_col[:, j::2], rows[i])
            slots.append((xij - mean) / std)          # [B,112,112,3]
    return jnp.concatenate(slots, axis=-1)            # (i,j,c) order


def stem_chain_7x7(x, w7):
    y = jax.lax.conv_general_dilated(
        x, w7.astype(x.dtype), window_strides=(2, 2),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y, 0.0)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.optimization_barrier(y)
    return to_hwbc(y)


def w7_to_w4(w7):
    wp = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    return jnp.transpose(
        wp.reshape(4, 2, 4, 2, 3, 64), (0, 2, 1, 3, 4, 5)
    ).reshape(4, 4, 12, 64)


def stem_chain_4x4(x12, w4):
    y = jax.lax.conv_general_dilated(
        x12, w4.astype(x12.dtype), window_strides=(1, 1),
        padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(y, 0.0)
    y = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.optimization_barrier(y)
    return to_hwbc(y)


def main():
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randint(0, 256, (B, IN, IN, 3)), jnp.uint8)
    w7 = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.05, jnp.float32)
    a_row, a_col = jax.jit(make_matrices)(jax.random.PRNGKey(0), frames)
    a_row, a_col = jax.block_until_ready((a_row, a_col))
    x224 = jax.jit(augment_current)(a_row, a_col, frames)
    x12 = jax.jit(augment_split)(a_row, a_col, frames)
    x224, x12 = jax.block_until_ready((x224, x12))

    # correctness: split augment == s2d(current augment)
    b, h, w, c = x224.shape
    xs = np.asarray(x224, np.float32).reshape(b, h // 2, 2, w // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    err = np.abs(xs - np.asarray(x12, np.float32)).max()
    print(f"split-augment == s2d(current): max abs err {err:.5f}")
    # correctness: 4x4 chain == 7x7 chain
    w4 = w7_to_w4(w7)
    y7 = jax.jit(lambda x: stem_chain_7x7(x, w7))(x224)
    y4 = jax.jit(lambda x: stem_chain_4x4(x, w4))(x12)
    cerr = np.abs(np.asarray(y7, np.float32)
                  - np.asarray(y4, np.float32)).max()
    print(f"4x4 chain == 7x7 chain: max abs err {cerr:.5f}")

    # -- timings (perturb frames with the key so nothing hoists) --
    def perturb(k, f):
        return (f ^ jax.random.randint(
            k, (1, 1, 1, 3), 0, 2, jnp.uint8).astype(jnp.uint8))

    t_mat = timed(lambda k, f: make_matrices(k, perturb(k, f)), frames)
    print(f"matrices (sample+compose):            {t_mat:7.3f} ms")
    t_aug_cur = timed(
        lambda k, f: augment_current(a_row, a_col, perturb(k, f)), frames)
    t_aug_spl = timed(
        lambda k, f: augment_split(a_row, a_col, perturb(k, f)), frames)
    print(f"augment current (2 einsums):          {t_aug_cur:7.3f} ms")
    print(f"augment split (4 einsums + concat):   {t_aug_spl:7.3f} ms")

    t_stem7 = timed(
        lambda k, x: stem_chain_7x7(
            x + jax.random.uniform(k, (1,), jnp.bfloat16, 0, 1e-3), w7),
        x224)
    t_stem4 = timed(
        lambda k, x: stem_chain_4x4(
            x + jax.random.uniform(k, (1,), jnp.bfloat16, 0, 1e-3), w4),
        x12)
    print(f"stem chain 7x7/s2 (conv+pool+hwbc):   {t_stem7:7.3f} ms")
    print(f"stem chain 4x4/s1 on pre-s2d:         {t_stem4:7.3f} ms")

    t_e2e_cur = timed(
        lambda k, f: stem_chain_7x7(
            augment_current(a_row, a_col, perturb(k, f)), w7), frames)
    t_e2e_spl = timed(
        lambda k, f: stem_chain_4x4(
            augment_split(a_row, a_col, perturb(k, f)), w4), frames)
    print(f"front-end current (augment+7x7 chain):{t_e2e_cur:7.3f} ms")
    print(f"front-end split   (augment+4x4 chain):{t_e2e_spl:7.3f} ms")


if __name__ == "__main__":
    main()
