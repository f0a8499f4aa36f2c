"""Stem-conv formulation probe: does XLA lower the C_in=3 7x7/s2 conv
better when the input channel dim is padded to a friendlier K?

Variants (B=256, bf16, carry-perturbed 10-step scans, host-fetch timed):
  A. 7x7/s2 on [B,224,224,3]      (current; measured ~2.7 ms at B=256)
  B. 7x7/s2 on [B,224,224,8]      (input zero-padded, kernel zero-padded)
  C. 4x4/s1 on pre-s2d [.,.,12]   (s2d form, measured ~same as A)
  D. 4x4/s1 on pre-s2d pad 16     (K=256 exactly)
All compute the same stem output for the first 3 (12) channels.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 256


def timed(fn, *args, n=10, reps=3):
    @jax.jit
    def loop(*args):
        def body(c, k):
            eps = jax.random.uniform(k, (1,), jnp.float32) * 1e-8
            out = fn(args[0] + eps.astype(args[0].dtype), *args[1:])
            return c + 1, jnp.asarray(out, jnp.float32).ravel()[0]
        _, outs = jax.lax.scan(body, jnp.int32(0),
                               jax.random.split(jax.random.PRNGKey(1), n))
        return outs
    _ = float(np.asarray(loop(*args))[-1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = loop(*args)
    _ = float(np.asarray(out)[-1])
    return (time.perf_counter() - t0) / (reps * n) * 1e3


def conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((3, 3), (3, 3)) if stride == 2 else ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.RandomState(0)
    x3 = jnp.asarray(rng.randn(B, 224, 224, 3), jnp.bfloat16)
    w7 = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.05, jnp.bfloat16)

    print(f"A 7x7/s2 C=3 : {timed(lambda x: conv(x, w7, 2), x3):7.3f} ms",
          flush=True)

    x8 = jnp.pad(x3, ((0, 0),) * 3 + ((0, 5),))
    w8 = jnp.pad(w7, ((0, 0), (0, 0), (0, 5), (0, 0)))
    print(f"B 7x7/s2 C=8 : {timed(lambda x: conv(x, w8, 2), x8):7.3f} ms",
          flush=True)

    # s2d input + 4x4 kernel (models/vision_resnext._stem_from_s2d math)
    xs = x3.reshape(B, 112, 2, 112, 2, 3)
    xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(B, 112, 112, 12)
    wp = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w4 = jnp.transpose(wp.reshape(4, 2, 4, 2, 3, 64),
                       (0, 2, 1, 3, 4, 5)).reshape(4, 4, 12, 64)
    print(f"C 4x4/s1 C=12: {timed(lambda x: conv(x, w4, 1), xs):7.3f} ms",
          flush=True)

    xs16 = jnp.pad(xs, ((0, 0),) * 3 + ((0, 4),))
    w16 = jnp.pad(w4, ((0, 0), (0, 0), (0, 4), (0, 0)))
    print(f"D 4x4/s1 C=16: {timed(lambda x: conv(x, w16, 1), xs16):7.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
