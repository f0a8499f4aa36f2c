"""Does XLA (no Pallas) drive the int8 MXU mode at a compute-bound shape?

If yes, the frozen ViT trunk's Dense layers can run int8 via plain
lax.dot_general (quantize/dequantize in XLA) — no kernel work needed.
Marginal-cost method as in perf_int8_mxu.py: chained dots inside one jit,
carry-perturbed; per-dot cost = slope between REPS=16 and REPS=64.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

M, K, N = 2048, 2048, 2048


def run(in_dtype, reps):
    rng = np.random.RandomState(0)
    if in_dtype == jnp.int8:
        a = jnp.asarray(rng.randint(-63, 63, (M, K), np.int8))
        b = jnp.asarray(rng.randint(-63, 63, (K, N), np.int8))
        acc_dtype = jnp.int32
    else:
        a = jnp.asarray(rng.randn(M, K), np.float32).astype(in_dtype)
        b = jnp.asarray(rng.randn(K, N), np.float32).astype(in_dtype)
        acc_dtype = jnp.float32

    @jax.jit
    def loop(a, b):
        def body(c, _):
            if a.dtype == jnp.int8:
                ap = jnp.bitwise_xor(a, c.astype(jnp.int8))
            else:
                ap = a + c.astype(a.dtype)
            acc = jax.lax.dot_general(
                ap, b, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
            for _ in range(reps - 1):
                if a.dtype == jnp.int8:
                    a2 = jnp.clip((acc[:, :K] & 63).astype(jnp.int8) + ap,
                                  -127, 127)
                else:
                    a2 = ap + (acc[:, :K] * jnp.float32(1e-6)
                               ).astype(a.dtype)
                acc = jax.lax.dot_general(
                    a2, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype)
            s = acc[0, 0].astype(jnp.float32)
            return s * jnp.float32(1e-30), s
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return outs

    out = loop(a, b)
    _ = float(np.asarray(out)[-1])
    t0 = time.perf_counter()
    for _ in range(3):
        out = loop(a, b)
    _ = float(np.asarray(out)[-1])
    return (time.perf_counter() - t0) / 30


if __name__ == "__main__":
    for name, dt in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
        lo = run(dt, 16)
        hi = run(dt, 64)
        per_dot = (hi - lo) / 48
        print(f"XLA {name}: {per_dot*1e6:8.2f} us/dot  "
              f"{2*M*K*N/per_dot/1e12:6.1f} T/s", flush=True)
