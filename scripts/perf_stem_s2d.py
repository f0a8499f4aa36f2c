"""A/B the space-to-depth stem vs the plain 7x7 stride-2 conv, both
through bn+relu+maxpool+to_hwbc, at bench shapes (B=256 bf16). Also
re-times the full augment after the bf16-matrix change."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from multimodal_baby_tpu.data import augment as aug
from multimodal_baby_tpu.ops.bottleneck_hwbc import to_hwbc

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


class Stem(nn.Module):
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        if self.s2d:
            b, h, w, c = x.shape
            xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
            xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(
                b, h // 2, w // 2, 4 * c)
            w7 = self.param("w7", nn.initializers.lecun_normal(),
                            (7, 7, 3, 64))
            wp = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
            w4 = jnp.transpose(
                wp.reshape(4, 2, 4, 2, 3, 64), (0, 2, 1, 3, 4, 5)
            ).reshape(4, 4, 12, 64).astype(x.dtype)
            y = jax.lax.conv_general_dilated(
                xs, w4, window_strides=(1, 1), padding=((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
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


def main():
    rng = np.random.RandomState(0)
    u8 = jnp.asarray(rng.randint(0, 256, (B, 224, 224, 3), np.uint8))

    def full_aug(key, u8):
        return aug.augment_batch(key, u8, augment=True, dtype=jnp.bfloat16)
    print(f"augment full (bf16 mats): {timed(full_aug, u8):7.3f} ms",
          flush=True)

    x_aug = full_aug(jax.random.PRNGKey(0), u8)
    for s2d in (False, True):
        stem = Stem(s2d=s2d)
        sp = stem.init(jax.random.PRNGKey(0), x_aug)

        def stem_fn(key, x):
            eps = jax.random.uniform(key, (1,), jnp.float32) * 1e-8
            return stem.apply(sp, x + eps.astype(x.dtype))
        name = "s2d 4x4" if s2d else "plain 7x7"
        print(f"stem {name:9s} +pool+hwbc: {timed(stem_fn, x_aug):7.3f} ms",
              flush=True)

    # augment -> stem fused in one jit (what the bench step sees)
    for s2d in (False, True):
        stem = Stem(s2d=s2d)
        sp = stem.init(jax.random.PRNGKey(0), x_aug)

        def both(key, u8):
            x = aug.augment_batch(key, u8, augment=True,
                                  dtype=jnp.bfloat16)
            return stem.apply(sp, x)
        name = "s2d 4x4" if s2d else "plain 7x7"
        print(f"augment+stem {name:9s}  : {timed(both, u8):7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
