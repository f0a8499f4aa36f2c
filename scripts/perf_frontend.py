"""Front-end decomposition: augment matmuls vs stem conv/pool/layout.

BENCH_NOTES round-2 accounting attributes ~3.3 ms/step (B=256) to the
front-end (augment + stem + maxpool + one layout copy) but never split
it. This probe times, with carry-perturbed 10-step scans and host-fetch
timing:

  A. augment_batch (u8 -> bf16 normalized, full RRC+blur+flip)
  B. augment matrix CONSTRUCTION only (crop boxes -> composed a_row/a_col)
  C. stem conv + bn + relu + maxpool + to_hwbc (bf16)
  D. A with blur disabled (isolates the blur-matrix cost)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_baby_tpu.data import augment as aug

B = 256


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


def main():
    rng = np.random.RandomState(0)
    u8 = jnp.asarray(rng.randint(0, 256, (B, 224, 224, 3), np.uint8))

    # A: full augment
    def full_aug(key, u8):
        return aug.augment_batch(key, u8, augment=True, dtype=jnp.bfloat16)
    print(f"A  augment full        : {timed(full_aug, u8):7.3f} ms",
          flush=True)

    # B: matrix construction only
    def mats_only(key, u8):
        Bn, H, W, _ = u8.shape
        k_crop, k_bp, k_bs, k_flip = jax.random.split(key, 4)
        boxes = jax.vmap(lambda k: aug._sample_crop_box(k, (H, W)))(
            jax.random.split(k_crop, Bn))
        y0, x0, h, w = (boxes[:, i] for i in range(4))
        o = jnp.arange(224, dtype=jnp.float32) + 0.5
        ys = y0[:, None] + o[None, :] * (h / 224)[:, None] - 0.5
        xs = x0[:, None] + o[None, :] * (w / 224)[:, None] - 0.5
        ry = aug._interp_matrices(jnp.clip(ys, 0.0, H - 1.0), H)
        cx = aug._interp_matrices(jnp.clip(xs, 0.0, W - 1.0), W)
        gy = aug._blur_matrices(k_bp, k_bs, Bn, 224)
        a_row = jnp.einsum("bpo,boh->bph", gy, ry)
        a_col = jnp.einsum("bsq,bqw->bsw", gy, cx)
        return a_row[:, 0, 0] + a_col[:, 0, 0]
    print(f"B  matrix construction : {timed(mats_only, u8):7.3f} ms",
          flush=True)

    # C: stem + pool + to_hwbc on a pre-augmented tensor
    from multimodal_baby_tpu.ops.bottleneck_hwbc import to_hwbc
    import flax.linen as nn

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                        use_bias=False, name="conv1",
                        dtype=jnp.bfloat16)(x)
            mul = self.param("mul", nn.initializers.ones, (64,))
            add = self.param("add", nn.initializers.zeros, (64,))
            y = y * mul.astype(y.dtype) + add.astype(y.dtype)
            y = nn.relu(y)
            y = nn.max_pool(y, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
            y = jax.lax.optimization_barrier(y)
            return to_hwbc(y)

    stem = Stem()
    x_aug = full_aug(jax.random.PRNGKey(0), u8)
    sp = stem.init(jax.random.PRNGKey(0), x_aug)

    def stem_fn2(key, x):
        # perturb with a traced near-zero so the scan can't hoist
        eps = jax.random.uniform(key, (1,), jnp.float32) * 1e-8
        xx = x + eps.astype(x.dtype)
        return stem.apply(sp, xx)
    print(f"C  stem+pool+to_hwbc   : {timed(stem_fn2, x_aug):7.3f} ms",
          flush=True)

    # D: augment without blur compose (identity blur matrices)
    def no_blur(key, u8):
        Bn, H, W, _ = u8.shape
        k_crop, _, _, k_flip = jax.random.split(key, 4)
        boxes = jax.vmap(lambda k: aug._sample_crop_box(k, (H, W)))(
            jax.random.split(k_crop, Bn))
        y0, x0, h, w = (boxes[:, i] for i in range(4))
        o = jnp.arange(224, dtype=jnp.float32) + 0.5
        ys = y0[:, None] + o[None, :] * (h / 224)[:, None] - 0.5
        xs = x0[:, None] + o[None, :] * (w / 224)[:, None] - 0.5
        do_flip = jax.random.bernoulli(k_flip, 0.5, (Bn,))
        xs = jnp.where(do_flip[:, None], xs[:, ::-1], xs)
        a_row = aug._interp_matrices(jnp.clip(ys, 0.0, H - 1.0), H)
        a_col = aug._interp_matrices(jnp.clip(xs, 0.0, W - 1.0), W)
        f = (u8.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
        a_row = a_row.astype(jnp.bfloat16)
        a_col = a_col.astype(jnp.bfloat16)
        x = jnp.einsum("bph,bhwc->bpwc", a_row, f)
        x = jnp.einsum("bsw,bpwc->bpsc", a_col, x)
        return x
    print(f"D  augment, no blur    : {timed(no_blur, u8):7.3f} ms",
          flush=True)

    # E-H: stem-chain decomposition (round-3: where do C's ms live?)
    class ConvOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                        use_bias=False, name="conv1",
                        dtype=jnp.bfloat16)(x)
            mul = self.param("mul", nn.initializers.ones, (64,))
            add = self.param("add", nn.initializers.zeros, (64,))
            return nn.relu(y * mul.astype(y.dtype) + add.astype(y.dtype))

    conv = ConvOnly()
    cp = conv.init(jax.random.PRNGKey(0), x_aug)

    def conv_fn(key, x):
        eps = jax.random.uniform(key, (1,), jnp.float32) * 1e-8
        return conv.apply(cp, x + eps.astype(x.dtype))
    print(f"E  stem conv+bn+relu   : {timed(conv_fn, x_aug):7.3f} ms",
          flush=True)

    def conv_pool_fn(key, x):
        eps = jax.random.uniform(key, (1,), jnp.float32) * 1e-8
        y = conv.apply(cp, x + eps.astype(x.dtype))
        return nn.max_pool(y, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))
    print(f"F  conv+pool (no hwbc) : {timed(conv_pool_fn, x_aug):7.3f} ms",
          flush=True)

    y_conv = jax.jit(lambda x: conv.apply(cp, x))(x_aug)

    def pool_hwbc_fn(key, y):
        eps = jax.random.uniform(key, (1,), jnp.float32) * 1e-8
        z = nn.max_pool(y + eps.astype(y.dtype), (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        z = jax.lax.optimization_barrier(z)
        return to_hwbc(z)
    print(f"G  pool+to_hwbc only   : {timed(pool_hwbc_fn, y_conv):7.3f} ms",
          flush=True)

    class StemNoBar(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                        use_bias=False, name="conv1",
                        dtype=jnp.bfloat16)(x)
            mul = self.param("mul", nn.initializers.ones, (64,))
            add = self.param("add", nn.initializers.zeros, (64,))
            y = nn.relu(y * mul.astype(y.dtype) + add.astype(y.dtype))
            y = nn.max_pool(y, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
            return to_hwbc(y)   # no optimization_barrier

    snb = StemNoBar()
    snp = snb.init(jax.random.PRNGKey(0), x_aug)

    def stem_nobar_fn(key, x):
        eps = jax.random.uniform(key, (1,), jnp.float32) * 1e-8
        return snb.apply(snp, x + eps.astype(x.dtype))
    print(f"H  C without barrier   : {timed(stem_nobar_fn, x_aug):7.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
